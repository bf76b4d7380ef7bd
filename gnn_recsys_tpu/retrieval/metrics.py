"""Ranking metrics: precision / recall / coverage @ k.

Vectorized re-implementation of the reference's dict-of-lists metrics
(``/root/reference/src/metrics.py:81-134``) with identical semantics:

  * precision = (# recommended entries present in the user's ground truth)
                / (total # recommended entries) — the reference divides by
                the sum of actual rec-list lengths (src/metrics.py:88-90),
                so -1 "no recommendation" sentinel slots are excluded from
                the denominator (see PARITY.md item 6)
  * recall    = (# ground-truth pairs whose item appears in that user's
                recommendations) / (total # ground-truth pairs)
  * coverage  = (# distinct recommended items) / catalog size

plus the negative-edge MRR heuristic (``src/metrics.py:137-157``).
Pair membership uses padded per-user rows
(:mod:`gnn_recsys_tpu.ops.membership`) — no Python dict scans.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gnn_recsys_tpu.ops.membership import (
    build_padded_pair_set,
    pair_set_contains,
)
from gnn_recsys_tpu.retrieval.recs import get_recs


def recs_to_metrics(
    recs: jax.Array,
    user_ids: jax.Array,
    gt_users: np.ndarray,
    gt_items: np.ndarray,
    num_items: int,
) -> Tuple[float, float, float]:
    """Compute (precision, recall, coverage).

    recs: [U, k] item ids; user_ids: [U] the user id of each row;
    gt_users/gt_items: [G] ground-truth pairs (possibly with duplicates,
    matching the reference's list-based counting).
    """
    recs = jnp.asarray(recs, dtype=jnp.int32)
    user_ids = jnp.asarray(user_ids, dtype=jnp.int32)
    gt_users_j = jnp.asarray(gt_users, dtype=jnp.int32)
    gt_items_j = jnp.asarray(gt_items, dtype=jnp.int32)
    u, k = recs.shape

    # Membership of each (user, rec) pair in the ground-truth pair set.
    num_users = int(jnp.max(user_ids)) + 1 if u else 1
    gt_set = build_padded_pair_set(
        gt_users, gt_items, num_src=max(num_users, int(np.max(gt_users)) + 1)
    )
    rec_hits = pair_set_contains(gt_set, user_ids, recs) & (recs >= 0)
    # Reference precision divides by the sum of ACTUAL rec-list lengths
    # (src/metrics.py:88-90) — -1 "no recommendation" sentinel slots (hub
    # users with fewer than k unbought items) don't count in the
    # denominator.
    num_recs = jnp.maximum(jnp.sum(recs >= 0), 1)
    precision = jnp.sum(rec_hits) / num_recs

    # For each ground-truth pair: is its item among that user's recs?
    # user id -> recs row index (user_ids need not be sorted).
    order = jnp.argsort(user_ids)
    sorted_uids = user_ids[order]
    pos = jnp.clip(
        jnp.searchsorted(sorted_uids, gt_users_j), 0, sorted_uids.shape[0] - 1
    )
    row = order[pos]
    known_user = sorted_uids[pos] == gt_users_j
    gt_in_recs = jnp.any(recs[row] == gt_items_j[:, None], axis=1)
    recall = jnp.sum(gt_in_recs & known_user) / gt_users_j.shape[0]

    # Skip the -1 "no recommendation" sentinel slots: scatter indexing
    # WRAPS negatives (-1 -> last item), so remap them to an
    # out-of-bounds index that mode='drop' discards.
    flat = recs.reshape(-1)
    covered = (
        jnp.zeros((num_items,), dtype=jnp.int32)
        .at[jnp.where(flat >= 0, flat, num_items)]
        .set(1, mode="drop")
    )
    coverage = jnp.sum(covered) / num_items
    return float(precision), float(recall), float(coverage)


def get_metrics_at_k(
    user_emb: jax.Array,
    item_emb: jax.Array,
    ground_truth: Tuple[np.ndarray, np.ndarray],
    already_bought: Optional[Tuple[np.ndarray, np.ndarray]],
    k: int,
    remove_already_bought: bool = True,
    score_fn=None,
    popularity: Optional[jax.Array] = None,
    weight_popularity: float = 1.0,
    backend: str = "auto",
    already_bought_cap: Optional[int] = None,
    mesh=None,
) -> Tuple[float, float, float]:
    """End-to-end metric computation (reference ``get_metrics_at_k``,
    src/metrics.py:110-134): recs for the unique ground-truth users, then
    precision/recall/coverage.

    backend: 'auto' routes cosine scoring through the fused Pallas MIPS
    kernel on real TPUs (~2x the XLA chunked matmul+top_k at catalog
    scale, exact-index tested) and falls back to 'xla' elsewhere or for
    custom ``score_fn``s (the MLP head).

    mesh: distribute retrieval with the catalog axis sharded over the
    mesh (retrieval/sharded.py) — same results, every chip scoring its
    catalog shard.

    already_bought_cap: bound on the padded already-bought row width.
    Uncapped (None, default) filtering is EXACT for every user — hub rows
    beyond ``recs.OVERFETCH_MAX_ROW`` route through the mask-then-rank
    path — but the membership table is O(num_users * max_degree) HBM,
    which a power-law catalog can blow up.  A cap keeps each user's
    ``cap`` MOST RECENT purchases (pairs arrive in interaction order and
    the packer keeps the last K — coo_to_padded_csc), so a capped hub
    user may be re-recommended items bought further back than their last
    ``cap`` purchases; all users at or under the cap stay exact.
    """
    if backend == "auto":
        dev = jax.devices()[0]
        on_tpu = "tpu" in (dev.platform + str(dev)).lower()
        backend = "pallas" if (score_fn is None and on_tpu) else "xla"
    gt_users, gt_items = ground_truth
    user_ids = jnp.asarray(np.unique(np.asarray(gt_users)), dtype=jnp.int32)
    num_items = item_emb.shape[0]
    already_table = None
    if already_bought is not None:
        # Rows must cover every QUERIED user id, not just users with bought
        # pairs — a too-small table would clip high ids onto the last row.
        n_src = user_emb.shape[0]
        if len(already_bought[0]):
            n_src = max(n_src, int(np.max(already_bought[0])) + 1)
        if user_ids.shape[0]:
            n_src = max(n_src, int(jnp.max(user_ids)) + 1)
        already_table = build_padded_pair_set(
            already_bought[0], already_bought[1], num_src=n_src,
            cap=already_bought_cap,
        )
    if mesh is not None:
        from gnn_recsys_tpu.retrieval.sharded import get_recs_sharded

        axis = "model" if mesh.shape.get("model", 1) > 1 else "data"
        recs = get_recs_sharded(
            mesh, user_emb, item_emb, user_ids, k,
            already_bought=already_table,
            remove_already_bought=remove_already_bought,
            score_fn=score_fn, popularity=popularity,
            weight_popularity=weight_popularity,
            backend="xla" if backend == "auto" else backend, axis=axis,
        )
    else:
        recs = get_recs(
            user_emb,
            item_emb,
            user_ids,
            k,
            already_bought=already_table,
            remove_already_bought=remove_already_bought,
            score_fn=score_fn,
            popularity=popularity,
            weight_popularity=weight_popularity,
            backend=backend,
        )
    return recs_to_metrics(recs, user_ids, gt_users, gt_items, num_items)


def mrr_neg_edges(
    pos_score: jax.Array,
    neg_score: jax.Array,
) -> jax.Array:
    """Mean reciprocal rank of each positive among its negatives
    (reference ``MRR_neg_edges``, src/metrics.py:137-157).

    pos_score: [B]; neg_score: [B, S].
    """
    rankings = jnp.sum(neg_score >= pos_score[:, None], axis=1) + 1
    return jnp.mean(1.0 / rankings)
