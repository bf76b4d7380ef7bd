"""Minibatch training loop over sampled neighbor trees.

TPU-native re-design of the reference's hot loop
(``/root/reference/src/train/run.py:11-308``): where the reference runs DGL
edge dataloaders in CPU worker processes, transfers blocks host->device per
batch, and queries the graph on the host for the false-negative mask, here
the entire step — neighbor sampling, negative sampling, false-negative
masking, forward, loss, optimizer update — is one jit-compiled function over
the device-resident graph; the host only slices shuffled edge arrays.

Semantics kept from the reference loop:
  * epoch 0 is a loss-report-only pass over at most 10 batches with no
    optimizer step (run.py:136-142);
  * a validation-loss pass per epoch over held-out edges, with
    neighborhoods sampled from the TRAIN graph (run.py:147-201 /
    sampling.py:196-207);
  * precision/recall/coverage on a cadence (``epoch % 10 == 1`` in the
    reference, run.py:205-277);
  * early stopping on validation loss with patience (run.py:285-291) and
    best-by-validation-recall tracking (run.py:275-277);
  * minibatch edges (and their reverses — reverse relations share edge
    ids by builder invariant) are excluded from sampled neighborhoods
    (sampling.py:181-194);
  * training positives can be recency-weighted in the loss.

Negative sampling: ``neg_mode='per_edge'`` draws ``neg_sample_size``
uniform destinations per positive and embeds each (exact reference
semantics, feasible on small graphs); ``neg_mode='shared_pool'`` draws one
uniform pool of ``neg_pool_size`` items per step and each positive scores
``neg_sample_size`` uniform picks from it — same marginal distribution,
O(pool) instead of O(B*S) embedding cost (the design the multi-chip path
shards).
"""

from __future__ import annotations

import functools
import dataclasses
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnn_recsys_tpu.graph.hetero import CanonicalEtype, HeteroGraph
from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.models.loss import max_margin_loss
from gnn_recsys_tpu.ops.membership import (
    build_padded_pair_set,
    pair_set_contains,
    pair_set_contains_pool,
)
from gnn_recsys_tpu.retrieval.metrics import get_metrics_at_k
from gnn_recsys_tpu.retrieval.recs import model_score_fn
from gnn_recsys_tpu.train.full_batch import TrainState, init_model

# Reference reverse-etype names (src/utils_data.py:96-99 reverse map and the
# graph schema at src/utils_data.py:205-238).
REVERSE_NAMES = {
    "buys": "bought-by",
    "bought-by": "buys",
    "clicks": "clicked-by",
    "clicked-by": "clicks",
    "practices": "practiced-by",
    "practiced-by": "practices",
    "utilized-for": "utilizes",
    "utilizes": "utilized-for",
    "belongs-to": "includes",
    "includes": "belongs-to",
}


@dataclasses.dataclass
class MinibatchConfig:
    """Searchable + fixed hyperparameters of the minibatch regime
    (reference defaults: main.py:485-511, src/utils_data.py:23-116)."""

    edge_batch_size: int = 2048
    fanouts: Tuple[int, ...] = (-1, -1)  # -1 = full padded neighbor row
    neg_sample_size: int = 63
    # 'shared_pool': S uniform picks per positive from one uniform pool
    #   (same marginal as the reference's per-edge corruption).
    # 'per_edge': exact reference semantics — S independent draws per
    #   positive (src/sampling.py:163-165); O(B*S) embedding cost.
    # 'dense_pool': every positive ranks the ENTIRE pool — one [B, P]
    #   matmul, no index gather in forward OR backward (the score pick
    #   and its scatter-transpose cost ~45 ms/step on v5e at the bench
    #   config); per-negative marginal unchanged, effective S = P.
    neg_mode: str = "shared_pool"
    neg_pool_size: int = 1024
    # Fused Pallas compare for the dense-pool false-negative mask
    # (ops/pallas/pool_mask.py).  A pallas_call is opaque to GSPMD
    # auto-partitioning, so train_minibatch(mesh=...) rejects the flag;
    # the shard_map steps (parallel/sharded.py) run it per device block
    # and are supported (equality test-gated on the virtual mesh).
    pool_mask_kernel: bool = False
    delta: float = 0.266
    # Training objective: 'max_margin' (the reference's hinge,
    # src/model.py:473-533 — the default) or 'sampled_softmax' (InfoNCE
    # over the negative pool — an extension; see models/loss.py).
    loss: str = "max_margin"
    softmax_tau: float = 0.1
    lr: float = 1e-3
    # 'const' (reference: fixed Adam lr, src/train/run.py) or 'cosine'
    # (decay to ~0 over the scheduled run — the standard long-run
    # schedule; curves on the hard benchmark keep rising past epoch 20
    # at const lr but oscillate, see docs/results/quality_hard_r3*).
    lr_schedule: str = "const"
    num_epochs: int = 50
    remove_false_negative: bool = True
    use_recency: bool = False
    exclude_batch_edges: bool = True
    # Unique-frontier blocks (DGL semantics) vs pure tree.  Measured on
    # v5e at the bench regime (B=2048, fanouts (8,4), hidden 256 bf16,
    # dense-pool step, honest chained-scan timing): tree 22.0 ms/step vs
    # dedup 76.9 — the MXU absorbs the duplicate FLOPs faster than the
    # frontier sort/unique costs, so tree is the default; dedup wins on
    # gather-bound/CPU backends (9x on the torch CPU baseline) and when
    # frontiers vastly exceed the node count.
    dedup: bool = False
    # Run epochs as jit'd lax.scan chunks over steps: per-epoch on-device
    # edge permutation, batch gather, step — a handful of dispatches and
    # one D2H loss pull per epoch instead of per-step host batch slicing +
    # transfers (per-step dispatch costs ~1 ms on a local chip and far more
    # on tunneled/remote transports).  Falls back to the host loop under a
    # mesh (the GSPMD path shards host batches explicitly).
    device_epoch: bool = True
    # Max scan steps per dispatch.  Bounds single-execution wall time (very
    # long device programs can trip transport/watchdog limits — observed on
    # tunneled v5e at ~123 heavy steps) while keeping per-dispatch overhead
    # amortized.  The per-epoch permutation is shared across chunks, so
    # chunking does not change which batches an epoch visits.
    epoch_chunk_steps: int = 16
    k: int = 10
    metrics_every: int = 10  # reference: epoch % 10 == 1
    patience: int = 3
    seed: int = 11
    # Embedding inference for the metrics cadence.  'full_graph' runs ONE
    # jit'd layer-wise pass over the whole device-resident graph — exactly
    # equal to the full-fanout sampled tree (tested in
    # tests/test_minibatch.py) at O(L*E) cost instead of re-expanding a
    # neighborhood tree per node chunk; it turns the eval pass from the
    # dominant wall-clock cost of a quality run into a sub-second step.
    # 'node_batches' keeps the reference's node-loader shape
    # (compute_embeddings_minibatch) for graphs whose full layer-wise
    # activations would not fit HBM.
    inference_mode: str = "full_graph"


class _EdgeStore:
    """Host-side per-etype COO copies for fast batch slicing."""

    def __init__(self, graph: HeteroGraph, etypes):
        self.src = {et: np.asarray(graph.rels[et].src) for et in etypes}
        self.dst = {et: np.asarray(graph.rels[et].dst) for et in etypes}
        self.recency = {
            et: np.asarray(graph.rels[et].edata["recency"])
            if "recency" in graph.rels[et].edata
            else np.ones_like(self.src[et], dtype=np.float32)
            for et in etypes
        }


def iter_edge_batches(
    rng: np.random.Generator,
    eids: Dict[CanonicalEtype, np.ndarray],
    batch_size: int,
    round_to: int = 1,
):
    """Proportional per-etype slices, shuffled each epoch, wrapping at the
    end so every batch has a static shape.  ``round_to`` rounds each
    per-etype slice up to a multiple (data-parallel shard divisibility)."""
    etypes = list(eids.keys())
    counts = {et: len(eids[et]) for et in etypes}
    total = sum(counts.values())
    per_et = {
        et: max(
            round_to,
            int(np.ceil(
                max(1, round(batch_size * counts[et] / max(total, 1)))
                / round_to
            )) * round_to,
        )
        for et in etypes
    }
    n_batches = max(1, int(np.ceil(total / batch_size)))
    perms = {et: rng.permutation(eids[et]) for et in etypes}
    for b in range(n_batches):
        batch = {}
        for et in etypes:
            n = per_et[et]
            idx = np.arange(b * n, (b + 1) * n) % max(counts[et], 1)
            batch[et] = perms[et][idx]
        yield batch


def make_minibatch_step(
    model: ConvModel,
    cfg: MinibatchConfig,
    train_etypes: Tuple[CanonicalEtype, ...],
    with_update: bool,
    with_exclusion: bool,
    has_reverse: Dict[CanonicalEtype, bool],
    jit: bool = True,
    feature_lookup=None,
    neighbor_sample=None,
) -> Callable:
    """Build the jit'd minibatch step.

    Signature:
      (state, graph, features, batch, edge_tables, rng) -> (state, loss)
    where batch maps etype -> dict with 'u' [B], 'i' [B], 'recency' [B] and
    (when with_exclusion) 'eids' [B] edge ids into the sampling graph.
    """
    if cfg.loss not in ("max_margin", "sampled_softmax"):
        raise KeyError(f"unknown loss {cfg.loss!r} "
                       "(expected 'max_margin' or 'sampled_softmax')")

    def step(state, graph, features, batch, edge_tables, rng):
        num_items = graph.num_nodes("item")
        r_pool, r_idx, r_tree, r_drop = jax.random.split(rng, 4)

        pairs = {et: (batch[et]["u"], batch[et]["i"]) for et in train_etypes}
        recency = {et: batch[et]["recency"] for et in train_etypes}
        exclude = None
        if with_exclusion:
            exclude = {}
            for et in train_etypes:
                sorted_eids = jnp.sort(batch[et]["eids"])
                exclude[et] = sorted_eids
                rev = (et[2], REVERSE_NAMES.get(et[1], et[1]), et[0])
                if has_reverse[et]:
                    exclude[rev] = sorted_eids

        if cfg.neg_mode in ("shared_pool", "dense_pool"):
            pool = jax.random.randint(
                r_pool, (cfg.neg_pool_size,), 0, num_items, dtype=jnp.int32
            )
        else:  # per_edge: the "pool" holds every independently drawn negative
            total = sum(int(pairs[et][0].shape[0]) for et in train_etypes)
            pool = jax.random.randint(
                r_pool,
                (total * cfg.neg_sample_size,),
                0,
                num_items,
                dtype=jnp.int32,
            )
        neg_idx = {}
        idx_keys = jax.random.split(r_idx, len(train_etypes))
        offset = 0
        for j, et in enumerate(train_etypes):
            b = int(pairs[et][0].shape[0])
            if cfg.neg_mode == "dense_pool":
                neg_idx[et] = None  # rank the whole pool
            elif cfg.neg_mode == "shared_pool":
                neg_idx[et] = jax.random.randint(
                    idx_keys[j], (b, cfg.neg_sample_size), 0,
                    cfg.neg_pool_size, dtype=jnp.int32,
                )
            else:
                neg_idx[et] = (
                    jnp.arange(b * cfg.neg_sample_size, dtype=jnp.int32)
                    .reshape(b, cfg.neg_sample_size)
                    + offset
                )
                offset += b * cfg.neg_sample_size

        def loss_fn(params):
            deterministic = not with_update
            pos_s, neg_s, neg_dst = model.apply(
                params,
                graph,
                features,
                pairs,
                pool,
                neg_idx,
                cfg.fanouts,
                r_tree,
                exclude_eids=exclude,
                deterministic=deterministic,
                dedup=cfg.dedup,
                feature_lookup=feature_lookup,
                neighbor_sample=neighbor_sample,
                method="minibatch_forward",
                rngs={} if deterministic else {"dropout": r_drop},
            )
            neg_mask = None
            if cfg.remove_false_negative:
                # The O(B*P*K) broadcast compare is near-optimal on the
                # VPU at these shapes (0.29 ms/step at bench config).
                # Negative result, measured: a sorted-pool binary search
                # (O(B*K*log P) probes) lowers jnp.searchsorted to a
                # sequential TPU while-loop whose per-iteration scalar
                # gathers cost ~4.4 ms/step — scalar gathers lose to
                # vectorized compares by ~10x per probe here.
                neg_mask = {}
                for et in train_etypes:
                    if cfg.neg_mode == "dense_pool":
                        # Every positive probes the SAME pool: rank-1
                        # probe matrix, no [B, P] neg_dst needed.
                        neg_mask[et] = jax.lax.stop_gradient(
                            pair_set_contains_pool(
                                edge_tables[et], pairs[et][0], pool,
                                use_kernel=cfg.pool_mask_kernel,
                            )
                        )
                    else:
                        neg_mask[et] = pair_set_contains(
                            edge_tables[et], pairs[et][0], neg_dst[et]
                        ).astype(jnp.float32)
            if cfg.loss == "sampled_softmax":
                from gnn_recsys_tpu.models.loss import sampled_softmax_loss

                return sampled_softmax_loss(
                    pos_s,
                    neg_s,
                    tau=cfg.softmax_tau,
                    negative_mask=neg_mask,
                    recency_scores=recency if cfg.use_recency else None,
                )
            return max_margin_loss(
                pos_s,
                neg_s,
                delta=cfg.delta,
                negative_mask=neg_mask,
                recency_scores=recency if cfg.use_recency else None,
            )

        if with_update:
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            state = state.apply_gradients(grads=grads)
        else:
            loss = loss_fn(state.params)
        return state, loss

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if with_update else ())


def _per_etype_batch_sizes(
    counts: Dict[CanonicalEtype, int], batch_size: int, round_to: int = 1
) -> Tuple[Dict[CanonicalEtype, int], int]:
    """Static per-etype slice widths + number of batches per epoch
    (the shape logic of :func:`iter_edge_batches`)."""
    total = sum(counts.values())
    per_et = {
        et: max(
            round_to,
            int(np.ceil(
                max(1, round(batch_size * counts[et] / max(total, 1)))
                / round_to
            )) * round_to,
        )
        for et in counts
    }
    n_batches = max(1, int(np.ceil(total / batch_size)))
    return per_et, n_batches


def make_epoch_fns(
    model: ConvModel,
    cfg: MinibatchConfig,
    train_etypes: Tuple[CanonicalEtype, ...],
    with_update: bool,
    with_exclusion: bool,
    has_reverse: Dict[CanonicalEtype, bool],
    counts: Dict[CanonicalEtype, int],
    mesh=None,
) -> Tuple[Callable, Callable]:
    """Device-resident epochs in bounded scan chunks.

    Returns ``(perm_fn, chunk_fn)``:
      perm_fn(eids, rng) -> perms             (one jit'd permutation/epoch)
      chunk_fn(state, graph, features, edge_tables, store, perms, t0, rng,
               n_steps*) -> (state, losses[n_steps])
    where ``store`` maps etype -> (src, dst, recency) DEVICE arrays indexed
    by edge id, ``perms`` are the epoch's shuffled candidate edge ids, and
    ``t0`` (a device scalar) is the global step offset of this chunk --
    slices wrap modulo the per-etype candidate count, exactly like
    :func:`iter_edge_batches`.  ``n_steps`` is static (one compile per
    distinct chunk length: the full chunk plus at most one remainder).

    The host loop's per-step work -- shuffling, slicing, H2D batch
    transfer, dispatch, loss pull -- all moves inside ``lax.scan``; the
    host touches the device a handful of times per epoch.  Step math is
    ``make_minibatch_step``'s.  Chunking bounds single-dispatch wall time
    (very long device programs can trip transport/watchdog limits).
    """
    step = make_minibatch_step(
        model, cfg, train_etypes, with_update=with_update,
        with_exclusion=with_exclusion, has_reverse=has_reverse, jit=False,
    )
    # Under a mesh the per-edge batch axis is sharded over 'data': slice
    # widths must divide the axis extent, and a sharding constraint on the
    # sliced batch tells GSPMD to distribute the sampled-tree work (the
    # rest of the step program is inferred from input placements — grads
    # all-reduce over 'data', row-sharded feature gathers become
    # collective lookups over 'model').
    data_extent = int(mesh.shape["data"]) if mesh is not None else 1
    per_et, _ = _per_etype_batch_sizes(
        counts, cfg.edge_batch_size, round_to=data_extent
    )
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        batch_sharding = NamedSharding(mesh, PartitionSpec("data"))

    @jax.jit
    def perm_fn(eids, rng):
        keys = jax.random.split(rng, max(len(train_etypes), 1))
        return {
            et: jax.random.permutation(keys[j], eids[et])
            for j, et in enumerate(train_etypes)
        }

    @functools.partial(
        jax.jit, static_argnames=("n_steps",),
        donate_argnums=(0,) if with_update else (),
    )
    def chunk_fn(state, graph, features, edge_tables, store, perms, t0,
                 rng, n_steps: int):
        def body(carry, i):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            t = t0 + i
            batch = {}
            for et in train_etypes:
                n = per_et[et]
                e_count = counts[et]
                pos = (t * n + jnp.arange(n, dtype=jnp.int32)) % e_count
                batch_eids = jnp.take(perms[et], pos, axis=0, mode="clip")
                src, dst, recency = store[et]
                d = {
                    "u": jnp.take(src, batch_eids, axis=0, mode="clip"),
                    "i": jnp.take(dst, batch_eids, axis=0, mode="clip"),
                    "recency": jnp.take(recency, batch_eids, axis=0,
                                        mode="clip"),
                }
                if with_exclusion:
                    d["eids"] = batch_eids
                if batch_sharding is not None:
                    d = {
                        k: jax.lax.with_sharding_constraint(v, batch_sharding)
                        for k, v in d.items()
                    }
                batch[et] = d
            state, loss = step(
                state, graph, features, batch, edge_tables, sub
            )
            return (state, rng), loss

        (state, rng), losses = jax.lax.scan(
            body, (state, rng), jnp.arange(n_steps, dtype=jnp.int32)
        )
        return state, losses

    return perm_fn, chunk_fn


def run_device_epoch(
    perm_fn: Callable,
    chunk_fn: Callable,
    state,
    graph,
    features,
    edge_tables,
    store,
    eids,
    rng,
    n_batches: int,
    chunk_steps: int,
):
    """Drive one epoch as ceil(n_batches / chunk_steps) chunk dispatches.

    The permutation is drawn once, so the chunks together visit exactly
    the batches a single-dispatch epoch would.  Returns
    (state, stacked device losses [n_batches])."""
    rng, pk = jax.random.split(rng)
    perms = perm_fn(eids, pk)
    chunk = max(1, min(chunk_steps, n_batches))
    losses = []
    t = 0
    while t < n_batches:
        n = min(chunk, n_batches - t)
        rng, sub = jax.random.split(rng)
        state, ls = chunk_fn(
            state, graph, features, edge_tables, store, perms,
            jnp.int32(t), sub, n_steps=n,
        )
        losses.append(ls)
        t += n
    return state, jnp.concatenate(losses)


def compute_embeddings_minibatch(
    model: ConvModel,
    params,
    graph: HeteroGraph,
    features: Dict[str, jax.Array],
    node_batch_size: int = 128,
    fanouts: Optional[Tuple[int, ...]] = None,
    ntypes: Optional[Tuple[str, ...]] = None,
) -> Dict[str, jax.Array]:
    """Batched node-loader embedding inference (reference ``get_embeddings``,
    src/train/run.py:311-349): preallocate per-ntype output tables, run the
    sampled-tree forward over node-id chunks, scatter rows by global id."""
    if fanouts is None:
        fanouts = tuple([-1] * model.num_conv_layers)

    @functools.partial(jax.jit, static_argnames=("ntype", "chunk", "n"))
    def run_all(params, rng, ntype: str, chunk: int, n: int):
        pad = (-n) % chunk
        ids = jnp.concatenate(
            [jnp.arange(n, dtype=jnp.int32), jnp.zeros(pad, jnp.int32)]
        ).reshape(-1, chunk)

        def one(chunk_ids):
            def fwd(mdl):
                return mdl.sampled_repr(
                    graph, features, {ntype: chunk_ids}, fanouts, rng,
                    deterministic=True,
                )

            return model.apply(params, method=fwd)[ntype]

        return jax.lax.map(one, ids).reshape(-1, model.out_dim)[:n]

    out = {}
    rng = jax.random.PRNGKey(0)
    for ntype in ntypes or graph.ntypes:
        n = graph.num_nodes(ntype)
        c = min(node_batch_size, n)
        out[ntype] = run_all(params, rng, ntype, c, n)
    return out


def infer_embeddings(
    model: ConvModel,
    params,
    graph: HeteroGraph,
    features: Dict[str, jax.Array],
    mode: str = "full_graph",
    node_batch_size: int = 128,
    ntypes: Optional[Tuple[str, ...]] = None,
    mesh=None,
) -> Dict[str, jax.Array]:
    """Embedding inference dispatcher shared by eval/serving call sites.

    ``mode='full_graph'`` runs one jit'd layer-wise pass over the whole
    device-resident graph — exactly equal to the full-fanout sampled tree
    (equivalence is test-gated) at O(L*E) total cost; ``'node_batches'``
    keeps the reference node-loader shape (src/train/run.py:311-349) for
    graphs whose layer-wise activations exceed HBM.

    ``mesh`` distributes the pass data-parallel over every device of the
    mesh (row-equal output; see
    :func:`gnn_recsys_tpu.retrieval.sharded.infer_embeddings_sharded`).
    """
    if mesh is not None:
        from gnn_recsys_tpu.retrieval.sharded import (
            infer_embeddings_sharded,
        )

        return infer_embeddings_sharded(
            model, params, graph, features, mesh,
            axis=tuple(a for a in ("data", "model") if a in mesh.shape),
            node_chunk=node_batch_size, ntypes=ntypes,
        )
    if mode == "full_graph":
        from gnn_recsys_tpu.train.full_batch import compute_embeddings

        return compute_embeddings(model, params, graph, features)
    if mode != "node_batches":
        raise ValueError(f"unknown inference mode {mode!r}")
    return compute_embeddings_minibatch(
        model, params, graph, features,
        node_batch_size=node_batch_size, ntypes=ntypes,
    )


def train_minibatch(
    model: ConvModel,
    train_graph: HeteroGraph,
    full_graph: HeteroGraph,
    features: Dict[str, jax.Array],
    train_eids: Dict[CanonicalEtype, np.ndarray],
    valid_eids: Optional[Dict[CanonicalEtype, np.ndarray]],
    cfg: MinibatchConfig,
    test_ground_truth: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    subtrain_ground_truth: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    already_bought: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    verbose: bool = False,
    state: Optional[TrainState] = None,
    host_edges: Optional[Dict] = None,
    profile_logdir: Optional[str] = None,
    mesh=None,
    row_shard_ntypes: Tuple[str, ...] = ("item",),
    start_epoch: int = 0,
):
    """Run the reference training regime end to end. Returns (state, history).

    ``train_eids`` index into ``train_graph`` relations; ``valid_eids``
    index into ``full_graph`` relations (held-out edges, removed from the
    train graph).  ``host_edges`` optionally supplies host-side numpy COO
    copies per etype (``{etype: (src, dst[, recency])}`` for the FULL
    graph) to avoid device->host pulls on slow transports.

    ``start_epoch`` with a restored ``state`` resumes mid-training
    EXACTLY: every RNG stream is derived per-epoch by ``fold_in`` (never
    threaded across epochs), so epochs ``[start_epoch, num_epochs)`` see
    the same randomness whether or not earlier epochs ran in this
    process.  (The reference's ``start_epoch`` is vestigial — no weight
    reload accompanies it, ``main.py:537``/``run.py:83``; here
    ``save_train_state``/``load_train_state`` round-trip params AND
    optimizer state.)
    """
    if state is None:
        params = init_model(model, train_graph, features, seed=cfg.seed)
        if cfg.lr_schedule == "cosine":
            total = sum(len(v) for v in train_eids.values())
            steps_per_epoch = max(
                1, int(np.ceil(total / cfg.edge_batch_size))
            )
            tx = optax.adam(optax.cosine_decay_schedule(
                cfg.lr, max(1, cfg.num_epochs * steps_per_epoch)
            ))
        elif cfg.lr_schedule == "const":
            tx = optax.adam(cfg.lr)
        else:
            raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=tx
        )
    train_etypes = tuple(train_eids.keys())
    has_reverse = {
        et: (et[2], REVERSE_NAMES.get(et[1], et[1]), et[0]) in train_graph.rels
        for et in train_etypes
    }
    valid_etypes = tuple(valid_eids.keys()) if valid_eids else ()
    # device_epoch runs under a mesh too: batches are sliced inside the
    # scan and constrained to the 'data' axis, so multi-chip training keeps
    # the few-dispatches-per-epoch shape instead of per-step host slicing.
    host_loop = not cfg.device_epoch
    if host_loop:
        train_step = make_minibatch_step(
            model, cfg, train_etypes, with_update=True,
            with_exclusion=cfg.exclude_batch_edges, has_reverse=has_reverse,
        )
        smoke_step = make_minibatch_step(
            model, cfg, train_etypes, with_update=False,
            with_exclusion=cfg.exclude_batch_edges, has_reverse=has_reverse,
        )
        valid_step = make_minibatch_step(
            model, cfg, valid_etypes, with_update=False,
            with_exclusion=False, has_reverse=has_reverse,
        )
        # Host-side COO copies: only the host loop slices them (a D2H pull
        # of the full edge arrays — skip entirely on the device path).
        train_store = _EdgeStore(train_graph, train_etypes)
        valid_store = _EdgeStore(full_graph, valid_etypes)

    # False negatives masked against the FULL (train+valid) edge set
    # (reference queries valid_graph, run.py:100).  ``host_edges`` avoids
    # device->host pulls on slow transports.
    num_users = full_graph.num_nodes("user")

    def _full_coo(et):
        if host_edges is not None and et in host_edges:
            return host_edges[et][0], host_edges[et][1]
        return (
            np.asarray(full_graph.rels[et].src),
            np.asarray(full_graph.rels[et].dst),
        )

    edge_tables = {
        et: build_padded_pair_set(*_full_coo(et), num_src=num_users)
        for et in set(train_etypes) | set(valid_etypes)
    }

    def make_batch(store: _EdgeStore, batch_np, with_eids: bool):
        out = {}
        for et, eids in batch_np.items():
            d = {
                "u": jnp.asarray(store.src[et][eids], jnp.int32),
                "i": jnp.asarray(store.dst[et][eids], jnp.int32),
                "recency": jnp.asarray(store.recency[et][eids], jnp.float32),
            }
            if with_eids:
                d["eids"] = jnp.asarray(eids, jnp.int32)
            out[et] = d
        return out

    from gnn_recsys_tpu.utils.profiling import ThroughputMeter, profiler_trace

    data_extent = 1
    if mesh is not None:
        from gnn_recsys_tpu.parallel.sharded import (
            shard_batch_dict,
            shard_inputs,
        )

        # The GSPMD path auto-partitions one jitted program; a
        # pallas_call inside it is opaque to the partitioner and would
        # fail or mis-partition at runtime.  (The shard_map steps in
        # parallel/sharded.py DO support the kernels: there each device
        # holds an explicit local block.)
        if getattr(model, "leaf_kernel", False) or cfg.pool_mask_kernel:
            raise ValueError(
                "Pallas kernel flags (ConvModel.leaf_kernel, "
                "MinibatchConfig.pool_mask_kernel) are not supported on "
                "the GSPMD mesh path: pallas_call is opaque to the "
                "auto-partitioner. Use make_shardmap_dp_step / "
                "make_shardmap_tp_dp_step (parallel/sharded.py), which "
                "run the kernels on per-device blocks, or disable the "
                "kernel flags."
            )
        data_extent = mesh.shape["data"]
        # Row-shard the selected feature tables over the 'model' axis when
        # present (embedding-table parallelism: GSPMD turns the tree's
        # feature gathers into collective row lookups — the BASELINE
        # north-star pattern); everything else replicated.
        state, train_graph, features, edge_tables = shard_inputs(
            mesh, state, train_graph, features, edge_tables,
            row_shard_ntypes=(
                row_shard_ntypes if "model" in mesh.shape else ()
            ),
        )

    # Fully device-resident epochs (one dispatch per epoch) when no mesh
    # is driving explicit host-side batch sharding.
    use_device_epoch = not host_loop

    def _dev_store(graph, etypes):
        return {
            et: (
                graph.rels[et].src,
                graph.rels[et].dst,
                graph.rels[et].edata["recency"]
                if "recency" in graph.rels[et].edata
                else jnp.ones(graph.rels[et].src.shape, jnp.float32),
            )
            for et in etypes
        }

    if use_device_epoch:
        def _repl(tree):
            if mesh is None:
                return tree
            from gnn_recsys_tpu.parallel.sharded import replicated

            return jax.tree.map(
                lambda x: jax.device_put(x, replicated(mesh)), tree
            )

        train_counts = {et: len(train_eids[et]) for et in train_etypes}
        train_per_et, train_nb = _per_etype_batch_sizes(
            train_counts, cfg.edge_batch_size, round_to=data_extent
        )
        smoke_nb = min(10, train_nb)  # epoch-0 smoke pass (run.py:136-142)
        train_perm_fn, train_chunk_fn = make_epoch_fns(
            model, cfg, train_etypes, with_update=True,
            with_exclusion=cfg.exclude_batch_edges, has_reverse=has_reverse,
            counts=train_counts, mesh=mesh,
        )
        smoke_perm_fn, smoke_chunk_fn = make_epoch_fns(
            model, cfg, train_etypes, with_update=False,
            with_exclusion=cfg.exclude_batch_edges, has_reverse=has_reverse,
            counts=train_counts, mesh=mesh,
        )
        train_store_dev = _repl(_dev_store(train_graph, train_etypes))
        train_eids_dev = _repl({
            et: jnp.asarray(train_eids[et], jnp.int32) for et in train_etypes
        })
        if valid_eids:
            valid_counts = {et: len(valid_eids[et]) for et in valid_etypes}
            valid_per_et, valid_nb = _per_etype_batch_sizes(
                valid_counts, cfg.edge_batch_size, round_to=data_extent
            )
            valid_perm_fn, valid_chunk_fn = make_epoch_fns(
                model, cfg, valid_etypes, with_update=False,
                with_exclusion=False, has_reverse=has_reverse,
                counts=valid_counts, mesh=mesh,
            )
            valid_store_dev = _repl(_dev_store(full_graph, valid_etypes))
            valid_eids_dev = _repl({
                et: jnp.asarray(valid_eids[et], jnp.int32)
                for et in valid_etypes
            })

    # Per-epoch RNG derivation (resume-exact): tag 0 = train stream,
    # tag 1 = valid stream; host batch permutations get a per-epoch
    # generator seeded by (seed, epoch).
    base_rng = jax.random.PRNGKey(cfg.seed)

    def _epoch_key(tag: int, epoch: int) -> jax.Array:
        return jax.random.fold_in(jax.random.fold_in(base_rng, tag), epoch)

    meter = ThroughputMeter()
    history = {
        "train_loss": [], "valid_loss": [], "recall": [], "precision": [],
        "coverage": [], "subtrain_recall": [], "epoch_time": [],
        "edges_per_s": [],
    }
    best_val, best_epoch, best_recall = np.inf, 0, -1.0
    trace_ctx = profiler_trace(profile_logdir)
    trace_ctx.__enter__()
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.perf_counter()
        meter.start()
        host_rng = np.random.default_rng((cfg.seed, epoch))
        if use_device_epoch:
            sub = _epoch_key(0, epoch)
            nb = smoke_nb if epoch == 0 else train_nb
            pf, cf = (
                (smoke_perm_fn, smoke_chunk_fn) if epoch == 0
                else (train_perm_fn, train_chunk_fn)
            )
            state, losses = run_device_epoch(
                pf, cf, state, train_graph, features, edge_tables,
                train_store_dev, train_eids_dev, sub, n_batches=nb,
                chunk_steps=cfg.epoch_chunk_steps,
            )
            epoch_edges = nb * sum(train_per_et.values())
        else:
            losses = []
            epoch_edges = 0
            for bi, batch_np in enumerate(
                iter_edge_batches(host_rng, train_eids, cfg.edge_batch_size,
                                  round_to=data_extent)
            ):
                if epoch == 0 and bi >= 10:
                    break  # epoch-0 smoke pass (run.py:136-142)
                batch = make_batch(train_store, batch_np, with_eids=True)
                if mesh is not None:
                    batch = shard_batch_dict(mesh, batch)
                sub = jax.random.fold_in(_epoch_key(0, epoch), bi)
                step = smoke_step if epoch == 0 else train_step
                state, loss = step(
                    state, train_graph, features, batch, edge_tables, sub
                )
                # Keep per-batch losses ON DEVICE: a D2H scalar pull per
                # batch costs a host sync (and is pathologically slow on
                # tunneled transports); one stacked pull per epoch is
                # equivalent.
                losses.append(loss)
                epoch_edges += sum(len(v) for v in batch_np.values())
            losses = jnp.stack(losses)
        # The D2H pull is the only HARD sync (block_until_ready can
        # under-wait on tunneled transports); pull BEFORE stopping the
        # meter so edges/s reflects completed device work.
        mean_loss = float(jnp.mean(losses))
        history["edges_per_s"].append(meter.stop(epoch_edges))
        history["train_loss"].append(mean_loss)

        val_loss = None
        if valid_eids:
            if use_device_epoch:
                sub = _epoch_key(1, epoch)
                # Held-out pairs scored over TRAIN-graph neighborhoods
                # (reference g_sampling, sampling.py:196-207).
                _, vlosses = run_device_epoch(
                    valid_perm_fn, valid_chunk_fn, state, train_graph,
                    features, edge_tables, valid_store_dev, valid_eids_dev,
                    sub, n_batches=valid_nb,
                    chunk_steps=cfg.epoch_chunk_steps,
                )
                val_loss = float(jnp.mean(vlosses))
            else:
                vlosses = []
                for vbi, batch_np in enumerate(iter_edge_batches(
                    host_rng, valid_eids, cfg.edge_batch_size,
                    round_to=data_extent,
                )):
                    batch = make_batch(valid_store, batch_np, with_eids=False)
                    if mesh is not None:
                        batch = shard_batch_dict(mesh, batch)
                    sub = jax.random.fold_in(_epoch_key(1, epoch), vbi)
                    # Held-out pairs scored over TRAIN-graph neighborhoods
                    # (reference g_sampling, sampling.py:196-207).
                    _, loss = valid_step(
                        state, train_graph, features, batch, edge_tables, sub
                    )
                    vlosses.append(loss)  # device scalar; pulled once below
                val_loss = float(jnp.mean(jnp.stack(vlosses)))
            history["valid_loss"].append(val_loss)

        history["epoch_time"].append(time.perf_counter() - t0)

        if (
            test_ground_truth is not None
            and cfg.metrics_every
            and epoch % cfg.metrics_every == 1
        ):
            h = infer_embeddings(
                model, state.params, train_graph, features,
                mode=cfg.inference_mode, ntypes=("user", "item"),
            )
            score_fn = model_score_fn(model.pred, state.params)
            precision, recall, coverage = get_metrics_at_k(
                h["user"], h["item"], test_ground_truth, already_bought,
                cfg.k, score_fn=score_fn,
            )
            history["recall"].append(recall)
            history["precision"].append(precision)
            history["coverage"].append(coverage)
            best_recall = max(best_recall, recall)
            # Train-set metrics on the subtrain user sample
            # (reference run.py:205-277 computes both).
            if subtrain_ground_truth is not None and len(
                subtrain_ground_truth[0]
            ):
                _, sub_recall, _ = get_metrics_at_k(
                    h["user"], h["item"], subtrain_ground_truth,
                    already_bought, cfg.k, score_fn=score_fn,
                )
                history["subtrain_recall"].append(sub_recall)
            if verbose:
                print(
                    f"epoch {epoch}: train_loss={history['train_loss'][-1]:.4f}"
                    f" val_loss={val_loss} recall@{cfg.k}={recall:.4f}"
                )
        elif verbose:
            print(
                f"epoch {epoch}: train_loss={history['train_loss'][-1]:.4f}"
                f" val_loss={val_loss}"
            )

        # Early stopping on validation loss (run.py:285-291).
        if val_loss is not None and epoch > 0:
            if val_loss < best_val:
                best_val, best_epoch = val_loss, epoch
            elif epoch - best_epoch >= cfg.patience:
                if verbose:
                    print(f"early stop at epoch {epoch}")
                break
    trace_ctx.__exit__(None, None, None)
    return state, history
