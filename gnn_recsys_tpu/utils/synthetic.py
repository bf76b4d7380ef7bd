"""Synthetic interaction graphs for tests and benchmarks.

Generates a clustered bipartite user-item graph (optionally with clicks and
a sport node type mirroring the reference's Decathlon schema,
``/root/reference/src/utils_data.py:204-238``): users and items belong to
latent groups, positive interactions are mostly within-group, and node
features are noisy group indicators — so a working GNN must beat a
popularity baseline on recall@k while a broken one cannot.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

from gnn_recsys_tpu.graph.hetero import HeteroGraph, build_hetero_graph


@dataclasses.dataclass
class SyntheticData:
    graph: HeteroGraph  # full graph (train + valid edges)
    train_graph: HeteroGraph  # graph with held-out edges removed
    # canonical etype -> (user ids, item ids) of training positive edges
    train_pairs: Dict[Tuple[str, str, str], Tuple[np.ndarray, np.ndarray]]
    test_ground_truth: Tuple[np.ndarray, np.ndarray]  # (users, items)
    num_users: int
    num_items: int
    num_groups: int
    # Ground-truth cluster assignments (for oracle baselines in benchmarks).
    user_group: Optional[np.ndarray] = None
    item_group: Optional[np.ndarray] = None
    # Hard-synthetic extras (make_hard_synthetic_data): the latent factors
    # that generated the interactions, for oracle-ceiling baselines.
    user_latent: Optional[np.ndarray] = None
    item_latent: Optional[np.ndarray] = None
    item_logpop: Optional[np.ndarray] = None


def make_synthetic_data(
    num_users: int = 200,
    num_items: int = 100,
    num_groups: int = 5,
    interactions_per_user: int = 12,
    test_per_user: int = 3,
    feat_dim: int = 8,
    in_group_prob: float = 0.9,
    with_clicks: bool = True,
    with_sports: bool = False,
    num_sports: int = 10,
    seed: int = 0,
    max_fanout: Optional[int] = None,
) -> SyntheticData:
    rng = np.random.default_rng(seed)
    user_group = rng.integers(0, num_groups, size=num_users)
    item_group = rng.integers(0, num_groups, size=num_items)
    # Per-group item pools, concatenated for vectorized gather.
    order = np.argsort(item_group, kind="stable")
    pool_concat = order.astype(np.int64)
    group_sizes = np.bincount(item_group, minlength=num_groups)
    group_offsets = np.concatenate([[0], np.cumsum(group_sizes)[:-1]])
    empty = group_sizes == 0  # fall back to uniform for empty groups

    def sample_items_for(users: np.ndarray) -> np.ndarray:
        """Vectorized: one clustered item draw per entry of ``users``."""
        g = user_group[users]
        in_group = (rng.random(users.shape[0]) < in_group_prob) & ~empty[g]
        within = (rng.random(users.shape[0]) * np.maximum(group_sizes[g], 1)
                  ).astype(np.int64)
        clustered = pool_concat[group_offsets[g] + within]
        uniform = rng.integers(0, num_items, size=users.shape[0])
        return np.where(in_group, clustered, uniform).astype(np.int32)

    buys_u = np.repeat(
        np.arange(num_users, dtype=np.int32), interactions_per_user
    )
    buys_i = sample_items_for(buys_u)
    test_u = np.repeat(np.arange(num_users, dtype=np.int32), test_per_user)
    test_i = sample_items_for(test_u)

    schema = {
        ("user", "buys", "item"): (buys_u, buys_i),
        ("item", "bought-by", "user"): (buys_i, buys_u),
    }
    train_pairs = {("user", "buys", "item"): (buys_u, buys_i)}
    if with_clicks:
        n_clicks = num_users * interactions_per_user
        clicks_u = rng.integers(0, num_users, size=n_clicks).astype(np.int32)
        clicks_i = sample_items_for(clicks_u)
        schema[("user", "clicks", "item")] = (clicks_u, clicks_i)
        schema[("item", "clicked-by", "user")] = (clicks_i, clicks_u)
        train_pairs[("user", "clicks", "item")] = (clicks_u, clicks_i)

    num_nodes = {"user": num_users, "item": num_items}
    if with_sports:
        num_nodes["sport"] = num_sports
        item_sport = rng.integers(0, num_sports, size=num_items).astype(np.int32)
        iid = np.arange(num_items, dtype=np.int32)
        schema[("item", "utilized-by", "sport")] = (iid, item_sport)
        schema[("sport", "utilizes", "item")] = (item_sport, iid)

    def noisy_onehot(groups: np.ndarray, dim: int) -> np.ndarray:
        base = np.zeros((len(groups), dim), dtype=np.float32)
        base[np.arange(len(groups)), groups % dim] = 1.0
        return base + rng.normal(0, 0.1, size=base.shape).astype(np.float32)

    ndata = {
        "user": {"features": noisy_onehot(user_group, feat_dim)},
        "item": {"features": noisy_onehot(item_group, feat_dim)},
    }
    if with_sports:
        sport_groups = np.arange(num_sports) % num_groups
        ndata["sport"] = {"features": noisy_onehot(sport_groups, feat_dim)}

    # Per-edge features: occurrence (counts) and recency (days).
    edata = {}
    for etype, (s, d) in schema.items():
        if etype[0] in ("user", "item") and etype[2] in ("user", "item"):
            edata[etype] = {
                "occurrence": rng.integers(1, 4, size=len(s)).astype(np.float32),
                "recency": rng.integers(1, 30, size=len(s)).astype(np.float32),
            }

    graph = build_hetero_graph(
        schema, num_nodes, edata=edata, ndata=ndata, max_fanout=max_fanout
    )
    # For the synthetic set, the train graph IS the full graph (test edges
    # were never added to it).
    return SyntheticData(
        graph=graph,
        train_graph=graph,
        train_pairs=train_pairs,
        test_ground_truth=(
            np.asarray(test_u, dtype=np.int32),
            np.asarray(test_i, dtype=np.int32),
        ),
        num_users=num_users,
        num_items=num_items,
        num_groups=num_groups,
        user_group=user_group,
        item_group=item_group,
    )


def make_hard_synthetic_data(
    num_users: int = 50_000,
    num_items: int = 15_000,
    latent_dim: int = 16,
    feat_dim: int = 8,
    interactions_per_user: int = 12,
    test_per_user: int = 2,
    beta: float = 6.0,
    pop_exponent: float = 0.9,
    pop_weight: float = 0.5,
    feat_noise: float = 1.5,
    with_clicks: bool = True,
    click_beta: float = 2.0,
    seed: int = 0,
    max_fanout: Optional[int] = None,
    user_chunk: int = 2048,
) -> SyntheticData:
    """A quality benchmark that can FAIL (round-2 verdict: the clustered
    generator saturates its group-oracle ceiling in ~1 epoch, so nothing
    separated training-regime choices).

    Interactions come from a latent-factor model with a Zipf popularity
    bias — the structure real recommenders face and the reference was
    built for:

      P(item i | user u) ∝ exp(beta * <z_u, z_i> + pop_weight * logpop_i)

    * ``z_u, z_i`` — unit Gaussian latents (``latent_dim`` ≫ what the
      features reveal); drawn WITHOUT replacement per user via Gumbel
      top-k, so train/test items are distinct.
    * ``logpop`` — Zipf(pop_exponent) item popularity: power-law item
      degrees (hub items), so popularity alone is a real but beatable
      baseline.
    * Node features are a LOW-RANK NOISY projection of the latents
      (``feat_dim`` < latent_dim, additive noise ``feat_noise``): features
      alone cannot recover the latent space — the model must integrate
      multi-hop collaborative structure, which is exactly what depth /
      aggregator / negative-sampling choices affect.
    * Clicks (optional) are the same process at a weaker ``click_beta``:
      a noisier version of the taste signal.

    The latent scorer ``beta * <z_u, z_i> + pop_weight*logpop`` is the
    generator-optimal ranking — its recall@k is the CEILING; the
    popularity-only ranking is the floor a trained model must beat.
    """
    rng = np.random.default_rng(seed)
    zu = rng.standard_normal((num_users, latent_dim)).astype(np.float32)
    zi = rng.standard_normal((num_items, latent_dim)).astype(np.float32)
    zu /= np.linalg.norm(zu, axis=1, keepdims=True)
    zi /= np.linalg.norm(zi, axis=1, keepdims=True)
    # Zipf popularity over a random item permutation.
    ranks = rng.permutation(num_items) + 1
    logpop = (-pop_exponent * np.log(ranks)).astype(np.float32)
    logpop -= logpop.max()

    def draw_for(users_lo, users_hi, n_draw, b):
        """Gumbel top-n_draw per user in [users_lo, users_hi)."""
        z = zu[users_lo:users_hi]
        logits = b * (z @ zi.T) + pop_weight * logpop[None, :]
        g = rng.gumbel(size=logits.shape).astype(np.float32)
        # argpartition then order the head: [C, n_draw] item ids.
        noisy = logits + g
        part = np.argpartition(-noisy, n_draw, axis=1)[:, :n_draw]
        return part.astype(np.int32)

    n_draw = interactions_per_user + test_per_user
    buys = np.empty((num_users, n_draw), dtype=np.int32)
    for lo in range(0, num_users, user_chunk):
        hi = min(lo + user_chunk, num_users)
        buys[lo:hi] = draw_for(lo, hi, n_draw, beta)
    # Random n_draw head is unordered; shuffle columns then split
    # train/test so the held-out items are an exchangeable sample.
    perm = rng.permuted(
        np.broadcast_to(np.arange(n_draw), (num_users, n_draw)), axis=1
    )
    buys = np.take_along_axis(buys, perm, axis=1)
    train_items = buys[:, :interactions_per_user]
    test_items = buys[:, interactions_per_user:]

    buys_u = np.repeat(
        np.arange(num_users, dtype=np.int32), interactions_per_user
    )
    buys_i = train_items.reshape(-1)
    test_u = np.repeat(np.arange(num_users, dtype=np.int32), test_per_user)
    test_i = test_items.reshape(-1)

    schema = {
        ("user", "buys", "item"): (buys_u, buys_i),
        ("item", "bought-by", "user"): (buys_i, buys_u),
    }
    train_pairs = {("user", "buys", "item"): (buys_u, buys_i)}
    if with_clicks:
        clicks = np.empty(
            (num_users, interactions_per_user), dtype=np.int32
        )
        for lo in range(0, num_users, user_chunk):
            hi = min(lo + user_chunk, num_users)
            clicks[lo:hi] = draw_for(
                lo, hi, interactions_per_user, click_beta
            )
        clicks_u = np.repeat(
            np.arange(num_users, dtype=np.int32), interactions_per_user
        )
        clicks_i = clicks.reshape(-1)
        schema[("user", "clicks", "item")] = (clicks_u, clicks_i)
        schema[("item", "clicked-by", "user")] = (clicks_i, clicks_u)
        train_pairs[("user", "clicks", "item")] = (clicks_u, clicks_i)

    proj_u = rng.standard_normal((latent_dim, feat_dim)).astype(np.float32)
    proj_i = rng.standard_normal((latent_dim, feat_dim)).astype(np.float32)
    ndata = {
        "user": {"features": zu @ proj_u + feat_noise * rng.standard_normal(
            (num_users, feat_dim)).astype(np.float32)},
        "item": {"features": zi @ proj_i + feat_noise * rng.standard_normal(
            (num_items, feat_dim)).astype(np.float32)},
    }
    edata = {}
    for etype, (s, d) in schema.items():
        edata[etype] = {
            "occurrence": np.ones(len(s), dtype=np.float32),
            "recency": rng.integers(1, 30, size=len(s)).astype(np.float32),
        }
    graph = build_hetero_graph(
        schema, {"user": num_users, "item": num_items},
        edata=edata, ndata=ndata, max_fanout=max_fanout,
    )
    return SyntheticData(
        graph=graph,
        train_graph=graph,  # test edges were never added
        train_pairs=train_pairs,
        test_ground_truth=(test_u, test_i),
        num_users=num_users,
        num_items=num_items,
        num_groups=0,
        user_latent=zu,
        item_latent=zi,
        item_logpop=logpop,
    )
