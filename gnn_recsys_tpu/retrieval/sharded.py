"""Catalog-sharded full-catalog retrieval and mesh-sharded embedding
inference — the serving-side parallelism the reference never had.

The reference's retrieval is a per-user Python loop over the whole catalog
on one device (``/root/reference/src/metrics.py:31-78``) and its embedding
inference a single-process node-loader pass (``src/train/run.py:311-349``).
At production catalog sizes the catalog axis is the long axis of serving —
SURVEY §7 step 8 names "sharded catalog axis in the MIPS scorer" as the
TPU-native plan.  This module implements it with ``shard_map``:

* :func:`get_recs_sharded` — item embeddings (and the popularity vector)
  row-sharded over a mesh axis; every device scores all queried users
  against its catalog shard, takes a local top-``fetch``, and an
  ``all_gather`` + global ``top_k`` merges the per-shard candidates.  Any
  element of the global top-``fetch`` is by definition inside its own
  shard's local top-``fetch``, so the merge is EXACT.  The popularity
  boost ``softmax(ratings) + w * pop`` (``src/metrics.py:69-72``)
  normalizes over the FULL catalog: the sharded path reconstructs the
  global softmax from per-shard statistics (``pmax`` of row maxima,
  ``psum`` of row exp-sums) before ranking, so boosted results are
  bit-comparable to the single-device path.  Already-bought filtering
  reuses the single-device routing: over-fetch + drop for bounded rows,
  in-shard mask-then-rank for power-law hub buyers.

* :func:`infer_embeddings_sharded` — the embedding-inference pass
  (full-fanout sampled trees, reference ``get_embeddings`` semantics)
  data-parallel over ALL mesh devices: node ids are sharded, each device
  embeds its chunk against the replicated graph, and the out-spec
  concatenates the full table.  Embarrassingly parallel — no collectives
  beyond the output concat.

Both are exact vs their single-device counterparts (asserted on the
virtual 8-device mesh in ``tests/test_sharded_serving.py``) and run the
same code path on real multi-chip meshes.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gnn_recsys_tpu.models.layers import l2_normalize
from gnn_recsys_tpu.ops.membership import PaddedPairSet
from gnn_recsys_tpu.retrieval.recs import (
    OVERFETCH_MAX_ROW,
    ScoreFn,
    _drop_bought,
    cosine_score_fn,
)


def _axes_size(mesh: Mesh, axes) -> int:
    if isinstance(axes, str):
        return mesh.shape[axes]
    size = 1
    for a in axes:
        size *= mesh.shape[a]
    return size


def shard_catalog(
    mesh: Mesh,
    item_emb: jax.Array,
    popularity: Optional[jax.Array] = None,
    axis="model",
) -> Tuple[jax.Array, Optional[jax.Array], int]:
    """Pad the catalog to the axis size and place it row-sharded.

    Returns ``(item_emb_sharded, popularity_sharded, num_items)`` —
    padded rows are excluded from ranking by the global-id validity mask
    inside :func:`get_recs_sharded`, so callers keep their true catalog
    size.
    """
    m = _axes_size(mesh, axis)
    num_items = item_emb.shape[0]
    pad = (-num_items) % m
    item_p = jnp.pad(item_emb, ((0, pad), (0, 0)))
    sh = NamedSharding(mesh, P(axis))
    item_p = jax.device_put(item_p, sh)
    pop_p = None
    if popularity is not None:
        pop_p = jax.device_put(jnp.pad(popularity, (0, pad)), sh)
    return item_p, pop_p, num_items


def get_recs_sharded(
    mesh: Mesh,
    user_emb: jax.Array,
    item_emb: jax.Array,
    user_ids: jax.Array,
    k: int,
    already_bought: Optional[PaddedPairSet] = None,
    remove_already_bought: bool = True,
    score_fn: Optional[ScoreFn] = None,
    popularity: Optional[jax.Array] = None,
    weight_popularity: float = 1.0,
    chunk_size: int = 128,
    backend: str = "xla",
    axis="model",
    num_items: Optional[int] = None,
) -> jax.Array:
    """Top-k recommendations with the catalog row-sharded over ``axis``.

    Same contract and results as :func:`gnn_recsys_tpu.retrieval.recs.
    get_recs` (the single-device path), with ``item_emb`` (and
    ``popularity``) sharded — pass arrays placed by :func:`shard_catalog`,
    or unplaced arrays (they are sharded here).  ``axis`` may be one mesh
    axis name or a tuple of axis names (the catalog shards over their
    product — e.g. ``('data', 'model')`` uses every device of a 2-D mesh).

    backend: 'xla', or 'pallas' to run the fused MIPS kernel per shard
        (unboosted cosine only: the boosted kernel normalizes softmax over
        its local catalog, which breaks the cross-shard merge — boosted
        and custom-``score_fn`` retrieval use the XLA path, which
        reconstructs the exact global softmax with ``pmax``/``psum``).
    num_items: true catalog size when ``item_emb`` is already padded +
        placed (as :func:`shard_catalog` returns); default
        ``item_emb.shape[0]``.
    """
    m = _axes_size(mesh, axis)
    if num_items is None:
        num_items = int(item_emb.shape[0])
    pad = (-item_emb.shape[0]) % m
    if pad:
        item_emb = jnp.pad(item_emb, ((0, pad), (0, 0)))
        if popularity is not None:
            popularity = jnp.pad(popularity, (0, pad))
    per = item_emb.shape[0] // m
    # Committed single-device inputs (e.g. serving from a loaded run)
    # must be re-placed on the mesh explicitly.
    axes_t = (axis,) if isinstance(axis, str) else tuple(axis)
    cat_sh = NamedSharding(mesh, P(axes_t))
    repl_sh = NamedSharding(mesh, P())
    item_emb = jax.device_put(item_emb, cat_sh)
    if popularity is not None:
        popularity = jax.device_put(popularity, cat_sh)
    user_emb = jax.device_put(user_emb, repl_sh)

    mask_rows = (
        already_bought is not None
        and remove_already_bought
        and already_bought.max_row > 0
    )
    hub_rows = mask_rows and already_bought.max_row > OVERFETCH_MAX_ROW
    if backend == "pallas" and (popularity is not None or score_fn is not None):
        raise ValueError(
            "sharded pallas backend supports unboosted cosine scoring only "
            "(global softmax / custom score functions route through the "
            "XLA path)"
        )
    if score_fn is None and backend != "pallas":
        score_fn = cosine_score_fn
    # Global fetch width (single-device semantics); each shard returns
    # its local top-min(fetch, per) and the merge keeps the global top.
    fetch = k if hub_rows else min(
        k + (already_bought.max_row if mask_rows else 0), num_items
    )
    fl = min(fetch, per)

    u = user_ids.shape[0]
    c = min(chunk_size, max(u, 1))
    upad = (-u) % c
    ids_padded = jnp.concatenate(
        [user_ids, jnp.zeros((upad,), dtype=user_ids.dtype)]
    )
    ids_chunks = ids_padded.reshape(-1, c)
    bought_rows = already_bought.rows if hub_rows else None

    axes = (axis,) if isinstance(axis, str) else tuple(axis)

    def my_offset():
        idx = jnp.int32(0)
        for a in axes:
            idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
        return idx * per

    def pmax(x):
        for a in axes:
            x = jax.lax.pmax(x, a)
        return x

    def psum(x):
        for a in axes:
            x = jax.lax.psum(x, a)
        return x

    def all_gather_cat(x):
        # -> leading axis m, preserving the axes-tuple order used by
        # my_offset (outermost axis first).
        for a in reversed(axes):
            x = jax.lax.all_gather(x, a, axis=0)
            x = x.reshape((-1,) + x.shape[2:]) if x.ndim > 3 else x
        return x.reshape((m,) + x.shape[x.ndim - 2:])

    # A tuple of axis names shards one dim over their product.
    spec_cat = P(axis if isinstance(axis, str) else tuple(axes))
    use_pop = popularity is not None

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),        # user_emb (replicated)
            spec_cat,   # item shard
            P(),        # user id chunks (replicated)
            spec_cat,   # popularity shard (zeros when unused)
            P(),        # bought rows (hub route; dummy otherwise)
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _sharded(user_emb, item_shard, ids_chunks, pop_shard, bought_rows):
        lo = my_offset()
        # Validity of this shard's rows against the true catalog size.
        valid = (lo + jnp.arange(per)) < num_items  # [per]

        if backend == "pallas":
            from gnn_recsys_tpu.ops.pallas.topk_mips import mips_topk

            dev = jax.devices()[0]
            interpret = "tpu" not in (dev.platform + str(dev)).lower()
            ue = l2_normalize(
                jnp.take(user_emb, ids_chunks.reshape(-1), axis=0)
            )
            ie = l2_normalize(item_shard)
            # Padded rows: zero-normalized to zero scores — push them
            # below any real cosine by masking the embedding row is not
            # possible post-normalize, so guard via the validity mask on
            # the merged values instead: recompute validity of indices.
            vals, idx = mips_topk(ue, ie, fl, interpret=interpret)
            vals = jnp.where(
                jnp.take(valid, idx, mode="clip"), vals, -jnp.inf
            )
            g_vals = all_gather_cat(vals)        # [m, U, fl]
            g_idx = all_gather_cat(idx + lo)     # [m, U, fl]
            cand_v = jnp.moveaxis(g_vals, 0, 1).reshape(vals.shape[0], -1)
            cand_i = jnp.moveaxis(g_idx, 0, 1).reshape(vals.shape[0], -1)
            top_v, pos = jax.lax.top_k(cand_v, fetch)
            out_idx = jnp.take_along_axis(cand_i, pos, axis=1)
            return out_idx.astype(jnp.int32), top_v

        def one_chunk(uids):
            ratings = score_fn(
                jnp.take(user_emb, uids, axis=0), item_shard
            )  # [C, per]
            ratings = jnp.where(valid[None, :], ratings, -jnp.inf)
            if use_pop:
                # Global softmax from shard statistics: max over the
                # full catalog via pmax, exp-sum via psum.
                gmax = pmax(jnp.max(ratings, axis=1))        # [C]
                ex = jnp.exp(ratings - gmax[:, None])
                ex = jnp.where(valid[None, :], ex, 0.0)
                gsum = psum(jnp.sum(ex, axis=1))             # [C]
                ratings = ex / gsum[:, None] + (
                    pop_shard[None, :] * weight_popularity
                )
                ratings = jnp.where(valid[None, :], ratings, -jnp.inf)
            if hub_rows:
                # In-shard mask-then-rank: scatter each user's bought
                # row (global ids) into the local column range.
                rows = jnp.take(bought_rows, uids, axis=0, mode="clip")
                loc = rows - lo
                ok = (rows >= 0) & (loc >= 0) & (loc < per)
                cols = jnp.where(ok, loc, per)
                bought = jnp.zeros((c, per + 1), dtype=bool)
                bought = bought.at[
                    jnp.arange(c)[:, None], cols
                ].set(True)[:, :per]
                ratings = jnp.where(bought, -jnp.inf, ratings)
            vals, idx = jax.lax.top_k(ratings, fl)
            return vals, idx + lo

        vals, idx = jax.lax.map(one_chunk, ids_chunks)  # [nc, C, fl]
        vals = vals.reshape(-1, fl)
        idx = idx.reshape(-1, fl)
        g_vals = all_gather_cat(vals)   # [m, U, fl]
        g_idx = all_gather_cat(idx)
        cand_v = jnp.moveaxis(g_vals, 0, 1).reshape(vals.shape[0], -1)
        cand_i = jnp.moveaxis(g_idx, 0, 1).reshape(vals.shape[0], -1)
        top_v, pos = jax.lax.top_k(cand_v, fetch)
        out_idx = jnp.take_along_axis(cand_i, pos, axis=1)
        return out_idx.astype(jnp.int32), top_v

    pop_arg = (
        popularity if use_pop
        else jnp.zeros((item_emb.shape[0],), jnp.float32)
    )
    bought_arg = jax.device_put(
        bought_rows if bought_rows is not None
        else jnp.zeros((1, 1), jnp.int32),
        repl_sh,
    )
    idx, vals = _sharded(user_emb, item_emb, ids_chunks, pop_arg, bought_arg)
    idx = idx[:u]
    vals = vals[:u]
    if hub_rows:
        # Trailing -inf slots = fewer than k unbought items exist: -1
        # sentinels, same contract as the single-device hub route.
        idx = jnp.where(jnp.isfinite(vals), idx, -1)
        return idx[:, :k]
    if not mask_rows:
        return idx[:, :k]
    return _drop_bought(idx, user_ids, already_bought, k)


def infer_embeddings_sharded(
    model,
    params,
    graph,
    features: Dict[str, jax.Array],
    mesh: Mesh,
    axis=("data", "model"),
    node_chunk: int = 128,
    fanouts: Optional[Tuple[int, ...]] = None,
    ntypes: Optional[Tuple[str, ...]] = None,
) -> Dict[str, jax.Array]:
    """Embedding inference data-parallel over ALL devices of the mesh.

    Node ids of each ntype are sharded over ``axis`` (default: the product
    of both mesh axes — serving uses every chip); each device runs the
    full-fanout sampled-tree forward (reference ``get_embeddings``
    semantics, ``src/train/run.py:311-349``) for its chunk against the
    replicated graph + params; the out-spec concatenates the full
    ``[num_nodes, out_dim]`` table, replicated row-equal to
    :func:`gnn_recsys_tpu.train.minibatch.infer_embeddings`.
    """
    if fanouts is None:
        fanouts = tuple([-1] * model.num_conv_layers)
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    m = _axes_size(mesh, axes)
    spec = P(tuple(axes))
    # Inputs may be committed to one device (e.g. params loaded from a
    # run dir); replicate them on the mesh explicitly — jit refuses to
    # reshard committed arrays across device sets.
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    graph = jax.tree.map(lambda x: jax.device_put(x, repl), graph)
    features = {nt: jax.device_put(x, repl) for nt, x in features.items()}

    @functools.partial(jax.jit, static_argnames=("ntype", "n", "chunk"))
    def run_ntype(params, rng, ntype: str, n: int, chunk: int):
        # Pad ids to devices x chunks of `chunk`.
        per = -(-n // m)                 # ids per device
        per = -(-per // chunk) * chunk   # round to chunk multiple
        ids = jnp.arange(m * per, dtype=jnp.int32).reshape(m, -1, chunk)
        ids = jnp.minimum(ids, n - 1)    # clamp padding to a real id

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), spec, P()),
            out_specs=spec,
            check_vma=False,
        )
        def _shard(params, graph, features, ids, rng):
            def one(chunk_ids):
                def fwd(mdl):
                    return mdl.sampled_repr(
                        graph, features, {ntype: chunk_ids}, fanouts, rng,
                        deterministic=True,
                    )

                return model.apply(params, method=fwd)[ntype]

            out = jax.lax.map(one, ids[0])  # [n_chunks, chunk, D]
            return out.reshape(1, -1, model.out_dim)

        out = _shard(params, graph, features, ids, rng)
        return out.reshape(-1, model.out_dim)[:n]

    rng = jax.random.PRNGKey(0)
    out = {}
    for ntype in ntypes or graph.ntypes:
        n = graph.num_nodes(ntype)
        out[ntype] = run_ntype(params, rng, ntype, n,
                               min(node_chunk, n))
    return out
