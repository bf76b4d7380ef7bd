"""Reference-stack baseline: the same minibatch training step in PyTorch.

The reference (hieucnm/GNN-RecSys) is DGL 0.5 + PyTorch with eager per-op
execution; its non-CUDA mode runs on the host CPU (``main.py:34-39``).
This module re-implements the reference's minibatch step faithfully in
pure torch — including DGL's block construction (``sampling.py:156-194``):
per layer, frontier nodes are DEDUPLICATED and each unique node's
neighborhood is sampled and aggregated exactly once, as DGL's
MultiLayerNeighborSampler does when compacting message-flow graphs.  Then
`mean_nn` aggregation, cosine scoring against the negative pool,
false-negative masking, max-margin loss, backward, Adam.

It is deliberately GENEROUS to the baseline where emulation is ambiguous:
no graph-copy or H2D cost, fused MKL matmuls, all CPU cores.  The reported
``vs_baseline`` is therefore a lower bound on the real gap.
"""

from __future__ import annotations

import time
from typing import Dict, Tuple

import numpy as np
import torch
import torch.nn.functional as F


def _l2norm(x: torch.Tensor) -> torch.Tensor:
    """L2 row-norm with the reference's zero-guard (src/model.py:230-235)."""
    n = torch.linalg.vector_norm(x, dim=-1, keepdim=True)
    return x / torch.clamp(n, min=1e-12)


class TorchTreeModel(torch.nn.Module):
    """Hetero GraphSAGE (mean_nn) over DGL-style sampled blocks."""

    def __init__(self, ntypes, etypes, feat_dims, hidden, out, n_conv):
        super().__init__()
        self.etypes = etypes
        self.n_conv = n_conv
        self.embed = torch.nn.ModuleDict(
            {nt: torch.nn.Linear(feat_dims[nt], hidden) for nt in ntypes}
        )
        dims = [hidden] * n_conv + [out]
        self.pre, self.fc_self, self.fc_neigh = (
            torch.nn.ModuleDict(), torch.nn.ModuleDict(), torch.nn.ModuleDict()
        )
        for li in range(n_conv):
            for et in etypes:
                k = f"{li}_{'_'.join(et)}"
                self.pre[k] = torch.nn.Linear(dims[li], dims[li])  # mean_nn
                self.fc_self[k] = torch.nn.Linear(dims[li], dims[li + 1])
                self.fc_neigh[k] = torch.nn.Linear(dims[li], dims[li + 1])


def _build_blocks(seeds, in_etypes, nbr_np, mask_np, fanouts, rng):
    """DGL-style top-down block construction with unique frontiers.

    Returns ``levels``: list indexed by level 0..L, each a dict
      ntype -> unique global ids (np.ndarray)
    and ``plans``: list indexed by level 1..L (plans[l-1]) of dicts
      ntype -> {"self_pos", per-etype ("nbr_pos" [n,f], "nbr_mask" [n,f])}
    where positions index the level-(l-1) unique arrays.
    """
    n_levels = len(fanouts)
    levels = [None] * (n_levels + 1)
    levels[n_levels] = {
        nt: np.unique(np.asarray(ids)) for nt, ids in seeds.items()
    }
    raw_plans = [None] * n_levels
    for lvl in range(n_levels, 0, -1):
        fan = fanouts[lvl - 1]
        lower_pool: Dict[str, list] = {}
        plan = {}
        for nt, uids in levels[lvl].items():
            entry = {"ids": uids, "etypes": {}}
            lower_pool.setdefault(nt, []).append(uids)  # h_self chain
            for et in in_etypes[nt]:
                rows = nbr_np[et][uids]  # [n, K]
                msk = mask_np[et][uids]
                if fan == -1:  # full-neighbor mode (deterministic eval)
                    nbr_ids, nbr_msk = rows, msk
                else:
                    sel = rng.integers(0, rows.shape[1], size=(len(uids), fan))
                    nbr_ids = np.take_along_axis(rows, sel, axis=1)
                    nbr_msk = np.take_along_axis(msk, sel, axis=1)
                entry["etypes"][et] = (nbr_ids, nbr_msk)
                lower_pool.setdefault(et[0], []).append(nbr_ids.reshape(-1))
            plan[nt] = entry
        levels[lvl - 1] = {
            nt: np.unique(np.concatenate(arrs))
            for nt, arrs in lower_pool.items()
        }
        raw_plans[lvl - 1] = plan

    # Convert global ids -> positions in the lower level's unique arrays.
    plans = []
    for lvl in range(1, n_levels + 1):
        lower = levels[lvl - 1]
        plan_out = {}
        for nt, entry in raw_plans[lvl - 1].items():
            self_pos = np.searchsorted(lower[nt], entry["ids"])
            etype_out = {}
            for et, (nbr_ids, nbr_msk) in entry["etypes"].items():
                pos = np.searchsorted(lower[et[0]], nbr_ids.reshape(-1))
                etype_out[et] = (
                    pos.reshape(nbr_ids.shape), nbr_msk
                )
            plan_out[nt] = {"self_pos": self_pos, "etypes": etype_out}
        plans.append(plan_out)
    return levels, plans


def run_torch_baseline(
    feats: Dict[str, np.ndarray],
    nbr: Dict[Tuple[str, str, str], np.ndarray],
    nbr_mask: Dict[Tuple[str, str, str], np.ndarray],
    pos_pairs: Dict[Tuple[str, str, str], Tuple[np.ndarray, np.ndarray]],
    fanouts: Tuple[int, ...],
    hidden: int,
    out_dim: int,
    batch_per_etype: int,
    neg_sample_size: int,
    neg_pool_size: int,
    delta: float = 0.266,
    steps: int = 2,
    seed: int = 0,
) -> float:
    """Time the torch step; returns positive edges/s.

    feats: ntype -> [N, F] float32; nbr/nbr_mask: etype (dst-keyed) padded
    neighbor rows; pos_pairs: user-item etype -> (u, i) train edges.
    """
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    tf = {nt: torch.from_numpy(np.array(x)) for nt, x in feats.items()}
    nbr_np = {et: np.array(v) for et, v in nbr.items()}
    mask_np = {et: np.array(v) for et, v in nbr_mask.items()}
    train_etypes = list(pos_pairs.keys())
    ntypes = list(tf.keys())
    etypes = list(nbr_np.keys())
    in_etypes = {nt: [et for et in etypes if et[2] == nt] for nt in ntypes}
    feat_dims = {nt: tf[nt].shape[1] for nt in ntypes}
    model = TorchTreeModel(
        ntypes, etypes, feat_dims, hidden, out_dim, len(fanouts)
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    num_items = tf["item"].shape[0]
    user_item_rows = {  # user-keyed item rows for the false-negative mask
        et: nbr_np[(et[2], rev, et[0])]
        for et in train_etypes
        for rev in [
            {"buys": "bought-by", "clicks": "clicked-by"}.get(et[1], et[1])
        ]
        if (et[2], rev, et[0]) in nbr_np
    }

    def forward_blocks(seeds):
        levels, plans = _build_blocks(
            seeds, in_etypes, nbr_np, mask_np, fanouts, rng
        )
        h = {
            nt: model.embed[nt](tf[nt][torch.from_numpy(ids)])
            for nt, ids in levels[0].items()
        }
        for lvl in range(1, len(fanouts) + 1):
            h_next = {}
            for nt, entry in plans[lvl - 1].items():
                h_self = h[nt][torch.from_numpy(entry["self_pos"])]
                zs = []
                for et, (pos, msk) in entry["etypes"].items():
                    k = f"{lvl - 1}_{'_'.join(et)}"
                    n, f = pos.shape
                    h_nbr = h[et[0]][torch.from_numpy(pos.reshape(-1))]
                    h_nbr = F.relu(model.pre[k](h_nbr)).reshape(n, f, -1)
                    mm = torch.from_numpy(msk).to(torch.float32).unsqueeze(-1)
                    agg = (h_nbr * mm).sum(1) / torch.clamp(mm.sum(1), min=1.0)
                    z = F.relu(
                        model.fc_self[k](h_self) + model.fc_neigh[k](agg)
                    )
                    zs.append(_l2norm(z))
                h_next[nt] = torch.stack(zs, 0).sum(0)
            h = h_next
        # Map original (duplicated) seed ids onto the unique-level outputs.
        top = levels[len(fanouts)]
        return {
            nt: h[nt][torch.from_numpy(
                np.searchsorted(top[nt], np.asarray(seeds[nt]))
            )]
            for nt in seeds
        }

    def step():
        opt.zero_grad()
        pos_us, pos_is = [], []
        for et in train_etypes:
            u, i = pos_pairs[et]
            idx = rng.integers(0, len(u), size=batch_per_etype)
            pos_us.append(np.asarray(u)[idx])
            pos_is.append(np.asarray(i)[idx])
        pool = rng.integers(0, num_items, size=neg_pool_size)
        seeds = {
            "user": np.concatenate(pos_us),
            "item": np.concatenate(pos_is + [pool]),
        }
        out = forward_blocks(seeds)
        hu, hi = out["user"], out["item"]
        b = batch_per_etype
        pool_n = _l2norm(hi[len(train_etypes) * b:])
        losses = []
        for j, et in enumerate(train_etypes):
            ue, ie = hu[j * b:(j + 1) * b], hi[j * b:(j + 1) * b]
            pos_s = (_l2norm(ue) * _l2norm(ie)).sum(-1)
            neg_idx = rng.integers(0, neg_pool_size, size=(b, neg_sample_size))
            sm = _l2norm(ue) @ pool_n.T  # [B, P]
            neg_s = torch.gather(sm, 1, torch.from_numpy(neg_idx))
            # False-negative mask: padded-row membership u x sampled dst
            # (the reference queries has_edges_between, run.py:92-103).
            if et in user_item_rows:
                urows = torch.from_numpy(user_item_rows[et][pos_us[j]])
                neg_dst = torch.from_numpy(pool[neg_idx])
                fmask = (
                    (urows.unsqueeze(1) == neg_dst.unsqueeze(-1))
                    .any(-1)
                    .to(torch.float32)
                )
            else:
                fmask = torch.zeros(b, neg_sample_size)
            losses.append(
                F.relu(neg_s + delta - pos_s.unsqueeze(1) - fmask).reshape(-1)
            )
        loss = torch.cat(losses).mean()
        loss.backward()
        opt.step()
        return loss

    step()  # warmup (allocator, thread pool)
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return batch_per_etype * len(train_etypes) / dt


def train_torch_reference(
    feats: Dict[str, np.ndarray],
    nbr: Dict[Tuple[str, str, str], np.ndarray],
    nbr_mask: Dict[Tuple[str, str, str], np.ndarray],
    pos_pairs: Dict[Tuple[str, str, str], Tuple[np.ndarray, np.ndarray]],
    ground_truth: Tuple[np.ndarray, np.ndarray],
    already_bought: Tuple[np.ndarray, np.ndarray],
    fanouts: Tuple[int, ...],
    hidden: int,
    out_dim: int,
    batch_per_etype: int,
    neg_sample_size: int,
    neg_pool_size: int,
    delta: float = 0.266,
    epochs: int = 10,
    lr: float = 1e-3,
    k: int = 10,
    seed: int = 0,
) -> Tuple[float, list]:
    """FULL reference-stack training run + recall@k — the parity oracle.

    Trains the faithful torch re-implementation (same architecture family
    as the reference's mean_nn ConvModel: per-ntype embedding Linear, then
    per-etype pre-MLP/mean/fc_self+fc_neigh towers with L2 norm, cosine
    scoring, max-margin loss with false-negative masking, Adam) to
    convergence on the SAME arrays the TPU framework trains on, then
    computes recall@k with the reference's retrieval semantics
    (cosine vs full catalog, filter already-bought AFTER ranking,
    src/metrics.py:52-78).  Returns (recall, per-epoch mean losses).
    """
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    tf = {nt: torch.from_numpy(np.array(x)) for nt, x in feats.items()}
    nbr_np = {et: np.array(v) for et, v in nbr.items()}
    mask_np = {et: np.array(v) for et, v in nbr_mask.items()}
    train_etypes = list(pos_pairs.keys())
    ntypes = list(tf.keys())
    etypes = list(nbr_np.keys())
    in_etypes = {nt: [et for et in etypes if et[2] == nt] for nt in ntypes}
    feat_dims = {nt: tf[nt].shape[1] for nt in ntypes}
    model = TorchTreeModel(
        ntypes, etypes, feat_dims, hidden, out_dim, len(fanouts)
    )
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    num_items = tf["item"].shape[0]
    user_item_rows = {
        et: nbr_np[(et[2], rev, et[0])]
        for et in train_etypes
        for rev in [
            {"buys": "bought-by", "clicks": "clicked-by"}.get(et[1], et[1])
        ]
        if (et[2], rev, et[0]) in nbr_np
    }

    def forward_blocks(seeds, use_fanouts):
        levels, plans = _build_blocks(
            seeds, in_etypes, nbr_np, mask_np, use_fanouts, rng
        )
        h = {
            nt: model.embed[nt](tf[nt][torch.from_numpy(ids)])
            for nt, ids in levels[0].items()
        }
        for lvl in range(1, len(use_fanouts) + 1):
            h_next = {}
            for nt, entry in plans[lvl - 1].items():
                h_self = h[nt][torch.from_numpy(entry["self_pos"])]
                zs = []
                for et, (pos, msk) in entry["etypes"].items():
                    key = f"{lvl - 1}_{'_'.join(et)}"
                    n, f = pos.shape
                    h_nbr = h[et[0]][torch.from_numpy(pos.reshape(-1))]
                    h_nbr = F.relu(model.pre[key](h_nbr)).reshape(n, f, -1)
                    mm = torch.from_numpy(np.array(msk)).to(
                        torch.float32
                    ).unsqueeze(-1)
                    agg = (h_nbr * mm).sum(1) / torch.clamp(mm.sum(1), min=1.0)
                    z = F.relu(
                        model.fc_self[key](h_self) + model.fc_neigh[key](agg)
                    )
                    zs.append(_l2norm(z))
                h_next[nt] = torch.stack(zs, 0).sum(0)
            h = h_next
        top = levels[len(use_fanouts)]
        return {
            nt: h[nt][torch.from_numpy(
                np.searchsorted(top[nt], np.asarray(seeds[nt]))
            )]
            for nt in seeds
        }

    def step(batch_u, batch_i):
        opt.zero_grad()
        pool = rng.integers(0, num_items, size=neg_pool_size)
        seeds = {
            "user": np.concatenate([batch_u[et] for et in train_etypes]),
            "item": np.concatenate(
                [batch_i[et] for et in train_etypes] + [pool]
            ),
        }
        out = forward_blocks(seeds, fanouts)
        hu, hi = out["user"], out["item"]
        b = batch_per_etype
        pool_n = _l2norm(hi[len(train_etypes) * b:])
        losses = []
        for j, et in enumerate(train_etypes):
            ue, ie = hu[j * b:(j + 1) * b], hi[j * b:(j + 1) * b]
            pos_s = (_l2norm(ue) * _l2norm(ie)).sum(-1)
            neg_idx = rng.integers(0, neg_pool_size, size=(b, neg_sample_size))
            sm = _l2norm(ue) @ pool_n.T
            neg_s = torch.gather(sm, 1, torch.from_numpy(neg_idx))
            if et in user_item_rows:
                urows = torch.from_numpy(user_item_rows[et][batch_u[et]])
                neg_dst = torch.from_numpy(pool[neg_idx])
                fmask = (
                    (urows.unsqueeze(1) == neg_dst.unsqueeze(-1))
                    .any(-1)
                    .to(torch.float32)
                )
            else:
                fmask = torch.zeros(b, neg_sample_size)
            losses.append(
                F.relu(neg_s + delta - pos_s.unsqueeze(1) - fmask).reshape(-1)
            )
        loss = torch.cat(losses).mean()
        loss.backward()
        opt.step()
        return float(loss.detach())

    counts = {et: len(pos_pairs[et][0]) for et in train_etypes}
    steps_per_epoch = max(
        1, int(np.ceil(max(counts.values()) / batch_per_etype))
    )
    epoch_losses = []
    for _ in range(epochs):
        perms = {et: rng.permutation(counts[et]) for et in train_etypes}
        ls = []
        for t in range(steps_per_epoch):
            bu, bi = {}, {}
            for et in train_etypes:
                idx = perms[et][
                    (t * batch_per_etype
                     + np.arange(batch_per_etype)) % counts[et]
                ]
                bu[et] = np.asarray(pos_pairs[et][0])[idx]
                bi[et] = np.asarray(pos_pairs[et][1])[idx]
            ls.append(step(bu, bi))
        epoch_losses.append(float(np.mean(ls)))

    # Deterministic full-neighbor embeddings for every user and item.
    with torch.no_grad():
        full = tuple([-1] * len(fanouts))
        h = forward_blocks(
            {"user": np.arange(tf["user"].shape[0]),
             "item": np.arange(num_items)},
            full,
        )
        hu = _l2norm(h["user"]).numpy()
        hi = _l2norm(h["item"]).numpy()

    # Reference retrieval semantics: rank full catalog, drop bought, top-k.
    bought = {}
    for u, i in zip(np.asarray(already_bought[0]),
                    np.asarray(already_bought[1])):
        bought.setdefault(int(u), set()).add(int(i))
    gt = {}
    for u, i in zip(np.asarray(ground_truth[0]), np.asarray(ground_truth[1])):
        gt.setdefault(int(u), []).append(int(i))
    hits = total = 0
    for u, items in gt.items():
        order = np.argsort(-(hi @ hu[u]), kind="stable")
        banned = bought.get(u, set())
        recs = [i for i in order if i not in banned][:k]
        total += len(items)
        hits += sum(i in recs for i in items)
    return hits / max(total, 1), epoch_losses
