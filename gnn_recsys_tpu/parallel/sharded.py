"""Multi-chip training: sharded steps and row-sharded tables.

The reference is strictly single-process / single-GPU (SURVEY.md §2.3), so
this subsystem is new TPU-native design, not a port:

* ``make_gspmd_minibatch_step`` — the full minibatch training step jitted
  over a ``('data', 'model')`` mesh: edge batches sharded over ``data``
  (data parallelism, gradient all-reduce inserted by GSPMD), node feature
  tables optionally row-sharded over ``model`` (embedding-table
  parallelism — XLA turns the tree gathers into collective lookups), and
  parameters replicated.  Semantically identical to the single-device step
  (same program, same rng), which the test suite asserts exactly.

* ``make_shardmap_dp_step`` — an explicit-collective data-parallel step via
  ``shard_map``: each device samples trees for its batch shard against the
  replicated graph, computes local gradients, and ``psum``s them over the
  ``data`` axis before the optimizer update (every device applies the same
  update, keeping state replicated).  This is the building block the
  multi-host recipe composes over ICI/DCN.

* ``row_sharded_lookup`` — embedding-row exchange for tables sharded over
  the ``model`` axis inside ``shard_map``: each shard gathers the requested
  rows it owns (others contribute zeros) and a ``psum`` over the axis
  assembles full rows on every shard.  Each id lives on exactly one shard,
  so the sum IS the gather.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gnn_recsys_tpu.graph.hetero import CanonicalEtype
from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.train.minibatch import MinibatchConfig, make_minibatch_step


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data"):
    return NamedSharding(mesh, P(axis))


def row_sharded(mesh: Mesh, axis: str = "model"):
    return NamedSharding(mesh, P(axis))


def shard_inputs(
    mesh: Mesh,
    state,
    graph,
    features: Dict[str, jax.Array],
    edge_tables,
    row_shard_ntypes: Tuple[str, ...] = ("item",),
):
    """Place training inputs on the mesh: state/graph/tables replicated,
    selected node-feature tables row-sharded over the 'model' axis."""
    repl = replicated(mesh)
    rows = (
        row_sharded(mesh)
        if row_shard_ntypes and "model" in mesh.shape
        else repl
    )
    state = jax.device_put(state, repl)
    graph = jax.tree.map(lambda x: jax.device_put(x, repl), graph)
    features = {
        nt: jax.device_put(x, rows if nt in row_shard_ntypes else repl)
        for nt, x in features.items()
    }
    edge_tables = jax.tree.map(
        lambda x: jax.device_put(x, repl), edge_tables
    )
    return state, graph, features, edge_tables


def shard_batch_dict(mesh: Mesh, batch: Dict, axis: str = "data"):
    """Shard every per-edge array of a minibatch over the data axis.

    Per-etype batch sizes must divide the data-axis extent.
    """
    sh = batch_sharded(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def make_gspmd_minibatch_step(
    model: ConvModel,
    cfg: MinibatchConfig,
    train_etypes,
    mesh: Mesh,
    with_update: bool = True,
    with_exclusion: bool = True,
    has_reverse: Optional[Dict] = None,
) -> Callable:
    """The single-device minibatch step, GSPMD-distributed over the mesh.

    Same jaxpr as the single-device step — callers place inputs with
    :func:`shard_inputs` / :func:`shard_batch_dict` and XLA inserts the
    collectives (gradient all-reduce over 'data', row-lookup exchange over
    'model').  Outputs are replicated.
    """
    del mesh  # placement comes from the inputs; GSPMD infers the rest
    if has_reverse is None:
        has_reverse = {et: True for et in train_etypes}
    return make_minibatch_step(
        model, cfg, tuple(train_etypes), with_update=with_update,
        with_exclusion=with_exclusion, has_reverse=has_reverse,
    )


def make_shardmap_dp_step(
    model: ConvModel,
    cfg: MinibatchConfig,
    train_etypes,
    mesh: Mesh,
    axis: str = "data",
    has_reverse: Optional[Dict] = None,
) -> Callable:
    """Explicit-collective data-parallel train step.

    Inputs: state/graph/features/edge_tables replicated, batch sharded over
    ``axis`` (leading dim of every per-edge array).  Each device runs the
    full sampling+forward+loss on its shard with a device-distinct rng,
    then gradients/losses are ``pmean``-ed over the axis and the optimizer
    update applies identically everywhere.
    """
    if has_reverse is None:
        has_reverse = {et: True for et in train_etypes}
    # Reuse the single-device step body with update disabled; we take grads
    # here so we can insert the collective between grad and update.
    from gnn_recsys_tpu.models.loss import max_margin_loss  # noqa: F401

    eval_step = make_minibatch_step(
        model, cfg, tuple(train_etypes), with_update=False,
        with_exclusion=cfg.exclude_batch_edges, has_reverse=has_reverse,
        jit=False,
    )

    def local_loss(params, state, graph, features, batch, edge_tables, rng):
        st = state.replace(params=params)
        _, loss = eval_step(st, graph, features, batch, edge_tables, rng)
        return loss

    def step(state, graph, features, batch, edge_tables, rng):
        repl_specs = jax.tree.map(lambda _: P(), (state, graph, features,
                                                  edge_tables))
        batch_spec = jax.tree.map(lambda _: P(axis), batch)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(repl_specs[0], repl_specs[1], repl_specs[2],
                      batch_spec, repl_specs[3], P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def _sharded(state, graph, features, batch, edge_tables, rng):
            shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            loss, grads = jax.value_and_grad(local_loss)(
                state.params, state, graph, features, batch, edge_tables,
                shard_rng,
            )
            grads = jax.lax.pmean(grads, axis)
            loss = jax.lax.pmean(loss, axis)
            state = state.apply_gradients(grads=grads)
            return state, loss

        return _sharded(state, graph, features, batch, edge_tables, rng)

    return jax.jit(step)


def statistical_a2a_capacity(chunk: int, m: int, factor: float) -> int:
    """Per-peer a2a bucket capacity for near-uniform id frontiers.

    Mean per-peer load is ``chunk / m`` (bucket loads are
    Binomial(chunk, 1/m)); ``factor`` buys tail slack, rounded up to a
    multiple of 8 sublanes and clamped to the worst case ``chunk``.
    Shared by the production step builder and ``benchmarks/comm_bytes.py``
    so the measured and shipped sizing cannot drift.
    """
    import math

    return min(chunk, max(8, 8 * math.ceil(factor * chunk / (m * 8))))


def make_shardmap_tp_dp_step(
    model: ConvModel,
    cfg: MinibatchConfig,
    train_etypes,
    mesh: Mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    row_shard_ntypes: Tuple[str, ...] = ("item",),
    has_reverse: Optional[Dict] = None,
    a2a_capacity_factor: Optional[float] = None,
    hash_mix_logs: Optional[Dict[str, int]] = None,
    tp_transform: bool = True,
    graph_shard_etypes: Tuple[CanonicalEtype, ...] = (),
    adj_capacity: Optional[int] = None,
) -> Callable:
    """Explicit-collective 2-D step: data-parallel batches x row-sharded
    feature tables with ``all_to_all`` lookup exchange — the BASELINE
    north-star pattern (SURVEY §2.3), end-to-end in a training step.

    Inputs: state/graph/edge_tables replicated; ``row_shard_ntypes``
    feature tables sharded over ``model_axis`` (leading rows); batch
    sharded over ``data_axis``.  Inside ``shard_map`` each device runs the
    full sampled-tree forward for its data shard, but every RAW feature
    read of a sharded table routes through the model's ``feature_lookup``
    hook: the frontier ids are split across the model axis, each slice is
    resolved with :func:`row_sharded_lookup_a2a` (request bucketing →
    ``all_to_all`` → local gather → ``all_to_all`` back), and an
    ``all_gather`` over the model axis reassembles the full frontier.
    Gradients/losses ``pmean`` over BOTH axes (the model axis replicates
    the data shard's compute), so the optimizer update is identical on
    every device and the state stays replicated.

    The GSPMD path (:func:`make_gspmd_minibatch_step` + row-sharded
    placement) computes the same math with XLA-inferred collectives;
    ``tests/test_multichip.py`` asserts the two agree and
    ``benchmarks/comm_bytes.py`` compares their bytes on the wire.

    With ``a2a_capacity_factor`` set, the step returns
    ``(state, loss, dropped)`` — the global count of lookup ids that
    overflowed BOTH the statistical bucket capacity and the bounded
    overflow lane (their rows come back zero).  Callers must surface it
    (the production contract is ``dropped == 0``; sizing that drops is a
    config bug, not a silent quality tax).  Without a capacity factor the
    exchange is worst-case exact and the step returns ``(state, loss)``.

    ``hash_mix_logs`` maps ntypes whose tables were laid out by
    :func:`hash_shard_table` to their ``n2_log``: lookups mix ids first,
    which keeps per-peer bucket loads Binomial under popularity-skewed
    frontiers — the production default when a capacity factor is set
    (contiguous-range sharding sends every hot-head id to one shard).

    ``tp_transform`` (default on) is the TENSOR-PARALLEL leaf: when the
    model hands the lookup a per-row transform (leaf embed / composed
    embed+fc_preagg — see ``ConvModel.sampled_repr``), each model shard
    applies it to ITS slice of the resolved frontier before the
    reassembly ``all_gather`` — the exchange rides at hidden width
    instead of raw feature width (the wide-table full-step bytes lever
    identified in docs/results/comm_bytes_sweep_r5.txt) and the leaf
    matmul FLOPs shard over the model axis.  Per-row maps commute with
    reassembly, so the step is numerically identical either way.

    ``graph_shard_etypes`` is the sharded-CSR training path (SURVEY §2.3
    "sharded CSR"): those relations' per-destination adjacency tables
    arrive as an extra ``adj`` step input (:func:`shard_adjacency`,
    placed ``P(model_axis)`` — leading rows), the replicated graph can be
    :func:`strip_adjacency`-ed down to placeholders, and every tree
    expansion of a listed etype routes through
    :func:`sample_neighbors_sharded` (bit-identical to the replicated
    sampler under the same rng, exclusion included).  The step signature
    becomes ``(state, graph, features, batch, edge_tables, adj, rng)``.
    ``adj_capacity`` bounds the per-peer adjacency-row exchange buckets
    (None = worst-case exact).
    """
    if has_reverse is None:
        has_reverse = {et: True for et in train_etypes}
    m = mesh.shape[model_axis]
    with_drops = a2a_capacity_factor is not None
    shard_adj = tuple(graph_shard_etypes)

    def step(state, graph, features, batch, edge_tables, adj, rng):
        repl = jax.tree.map(lambda _: P(), (state, graph, edge_tables))
        feat_specs = {
            nt: P(model_axis) if nt in row_shard_ntypes else P()
            for nt in features
        }
        batch_spec = jax.tree.map(lambda _: P(data_axis), batch)
        adj_spec = jax.tree.map(lambda _: P(model_axis), adj)

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(repl[0], repl[1], feat_specs, batch_spec, repl[2],
                      adj_spec, P()),
            out_specs=(P(), P(), P()) if with_drops else (P(), P()),
            check_vma=False,
        )
        def _sharded(state, graph, features, batch, edge_tables, adj, rng):
            # Same rng per data shard ACROSS the model axis (the tree must
            # be identical for the a2a request sets to be consistent).
            shard_rng = jax.random.fold_in(
                rng, jax.lax.axis_index(data_axis)
            )

            def local_loss(params):
                # The drop accumulator lives inside the traced loss so
                # the per-lookup counts can flow out as grad aux.
                drops = []

                def feature_lookup(nt, flat_ids, row_transform=None):
                    if nt not in row_shard_ntypes:
                        rows = jnp.take(features[nt], flat_ids, axis=0)
                        if row_transform is not None:
                            rows = row_transform(rows)
                        return rows
                    if hash_mix_logs and nt in hash_mix_logs:
                        flat_ids = hash_mix_ids(
                            flat_ids, hash_mix_logs[nt]
                        )
                    # Split this data-shard's (model-axis-replicated)
                    # frontier across the model axis; resolve each slice
                    # with the a2a exchange; reassemble with all_gather.
                    b = flat_ids.shape[0]
                    pad = (-b) % m
                    ids_p = jnp.concatenate(
                        [flat_ids, jnp.zeros((pad,), flat_ids.dtype)]
                    )
                    chunk = ids_p.shape[0] // m
                    my = jax.lax.axis_index(model_axis)
                    mine = jax.lax.dynamic_slice_in_dim(
                        ids_p, my * chunk, chunk
                    )
                    # Tensor-parallel leaf placement: with a statistical
                    # capacity the transform runs AT THE OWNER inside the
                    # exchange
                    # (both the response a2a AND the reassembly
                    # all_gather ride at hidden width; FLOP overhead
                    # bounded by the capacity factor).  Without one the
                    # owner buffer is worst-case [m, chunk] — m x the
                    # rows — so transform the requester's chunk after the
                    # exchange instead (reassembly still narrows).
                    tp_here = row_transform is not None and tp_transform
                    if with_drops:
                        cap = statistical_a2a_capacity(
                            chunk, m, a2a_capacity_factor
                        )
                        rows, d = row_sharded_lookup_a2a(
                            features[nt], mine, axis=model_axis,
                            capacity=cap, return_dropped=True,
                            row_transform=(
                                row_transform if tp_here else None
                            ),
                        )
                        drops.append(d)
                    else:
                        rows = row_sharded_lookup_a2a(
                            features[nt], mine, axis=model_axis,
                        )
                    if tp_here and not with_drops:
                        # Requester-side transform of the [chunk, F]
                        # slice: reassembly at hidden width — per-row
                        # maps commute with the gather.
                        rows = row_transform(rows)
                    full = jax.lax.all_gather(
                        rows, model_axis, axis=0, tiled=True
                    )
                    full = full[:b]
                    if row_transform is not None and not tp_transform:
                        full = row_transform(full)
                    return full

                neighbor_sample = None
                if shard_adj:
                    def neighbor_sample(et, ids, fanout, rng, mode,
                                        with_eids, excl):
                        a = adj[et]
                        table_s = None
                        if excl is not None:
                            # excl arrives UNTRANSLATED (sorted batch
                            # edge ids): sign-mark this shard's rows.
                            table_s = exclusion_table_sharded(
                                a["nbr"], graph.rels[et].eid_pos, excl,
                                axis=model_axis,
                            )
                        return sample_neighbors_sharded(
                            a["nbr"], a["eid"], a["mask"], a["deg"],
                            ids, fanout, rng=rng, mode=mode,
                            axis=model_axis, capacity=adj_capacity,
                            with_eids=with_eids,
                            nbr_table_shard=table_s,
                        )

                    neighbor_sample.etypes = frozenset(shard_adj)

                eval_step = make_minibatch_step(
                    model, cfg, tuple(train_etypes), with_update=False,
                    with_exclusion=cfg.exclude_batch_edges,
                    has_reverse=has_reverse, jit=False,
                    feature_lookup=feature_lookup,
                    neighbor_sample=neighbor_sample,
                )
                st = state.replace(params=params)
                _, loss = eval_step(
                    st, graph, features, batch, edge_tables, shard_rng
                )
                dropped = (
                    functools.reduce(jnp.add, drops)
                    if drops else jnp.int32(0)
                )
                return loss, dropped

            (loss, dropped), grads = jax.value_and_grad(
                local_loss, has_aux=True
            )(state.params)
            grads = jax.lax.pmean(
                jax.lax.pmean(grads, data_axis), model_axis
            )
            loss = jax.lax.pmean(jax.lax.pmean(loss, data_axis), model_axis)
            new_state = state.apply_gradients(grads=grads)
            if with_drops:
                # Already psum'd over the model axis inside the lookup;
                # sum the per-data-shard counts for the global total.
                dropped = jax.lax.psum(dropped, data_axis)
                return new_state, loss, dropped
            return new_state, loss

        return _sharded(state, graph, features, batch, edge_tables, adj,
                        rng)

    if shard_adj:
        return jax.jit(step)
    # No sharded adjacency: keep the 6-arg signature.
    return jax.jit(
        lambda state, graph, features, batch, edge_tables, rng: step(
            state, graph, features, batch, edge_tables, {}, rng
        )
    )


_MIX_A = np.int64(0x9E3779B1)  # odd 32-bit golden-ratio multipliers
_MIX_B = np.int64(0x85EBCA77)


def hash_mix_ids(ids: jax.Array, n2_log: int) -> jax.Array:
    """Bijective murmur-style mix of ids within ``[0, 2**n2_log)``.

    xorshift (bijective) and odd-multiply mod ``2**k`` (bijective)
    rounds, so the map is a PERMUTATION of the padded id domain: every
    id keeps a unique slot, and the owner shard (the high bits of the
    mixed id under contiguous-range sharding) becomes pseudorandom
    regardless of the input id distribution.  This is what makes
    per-peer bucket loads Binomial for POPULARITY-SKEWED catalogs —
    contiguous-range sharding of raw ids sends every hot-head id to the
    same shard (the documented caveat of :func:`row_sharded_lookup_a2a`).
    """
    mask = jnp.uint32((1 << n2_log) - 1)
    s1 = max(1, n2_log // 2)
    v = ids.astype(jnp.uint32) & mask
    v = (v ^ (v >> s1)) & mask
    v = (v * jnp.uint32(_MIX_A)) & mask
    v = (v ^ (v >> s1)) & mask
    v = (v * jnp.uint32(_MIX_B)) & mask
    v = (v ^ (v >> s1)) & mask
    return v.astype(ids.dtype)


def hash_shard_table(table, m: int) -> Tuple[jax.Array, int]:
    """Lay a table out for hash-sharded row placement.

    Pads to the next power of two (>= ``m`` shards) and permutes rows so
    logical row ``i`` lives at physical slot ``hash_mix_ids(i)``; shard
    the result over the model axis and resolve lookups with
    :func:`row_sharded_lookup_a2a` on ``hash_mix_ids(ids, n2_log)``.
    Returns ``(padded_permuted_table, n2_log)``.

    Trade-off: the power-of-two pad costs up to 2x rows of zeros —
    hash-sharding is the right default when bucket-capacity sizing (a2a
    bytes) binds, contiguous sharding when HBM capacity binds.  Catalog
    tables padded to lane multiples anyway often land on a power of two.
    """
    n = int(table.shape[0])
    n2_log = max(int(np.ceil(np.log2(max(n, m, 2)))), 1)
    n2 = 1 << n2_log
    ids = np.arange(n, dtype=np.int64)
    mask = n2 - 1
    s1 = max(1, n2_log // 2)
    v = ids & mask
    v = (v ^ (v >> s1)) & mask
    v = (v * int(_MIX_A)) & mask
    v = (v ^ (v >> s1)) & mask
    v = (v * int(_MIX_B)) & mask
    v = (v ^ (v >> s1)) & mask
    out = np.zeros((n2,) + tuple(table.shape[1:]),
                   dtype=np.asarray(table).dtype)
    out[v] = np.asarray(table)
    return jnp.asarray(out), n2_log


def row_sharded_lookup_a2a(
    table_shard: jax.Array,
    ids_shard: jax.Array,
    axis: str = "model",
    capacity: Optional[int] = None,
    overflow_capacity: Optional[int] = None,
    return_dropped: bool = False,
    row_transform: Optional[Callable] = None,
):
    """All-to-all embedding-row exchange for SHARDED queries x SHARDED table.

    The BASELINE north-star lookup pattern: each device holds a slice of the
    id batch (``ids_shard`` [B/m]) and a contiguous row range of the table
    (``table_shard`` [N/m, D]).  Requests are bucketed by owner shard,
    exchanged with ``all_to_all`` over ICI, answered by a local gather, and
    routed back with a second ``all_to_all``.  Returns the [B/m, D] rows
    for this shard's ids.

    ``capacity`` sizes the per-peer request buckets.  ``None`` is the
    worst case (``B/m`` per peer — always exact, communication
    O(B/m * D * m)).  A STATISTICAL capacity ``c`` (e.g. ``2 * B/m^2`` for
    near-uniform ids: bucket loads are Binomial(B/m, 1/m), so a small
    multiple of the mean covers them with overwhelming probability) cuts
    the exchange to O(c * D * m); requests that overflow their bucket are
    resolved EXACTLY through a bounded overflow lane — an ``all_gather``
    of up to ``overflow_capacity`` (default ``capacity``) spilled ids per
    shard answered by a :func:`row_sharded_lookup` psum.  Only ids beyond
    BOTH budgets are dropped (rows come back zero); the psum'd drop count
    is returned when ``return_dropped`` so callers can assert it is 0
    after the step (the production contract: size capacity for
    ~zero-probability overflow, detect — don't silently corrupt — the
    pathological tail).  NOTE: contiguous-range sharding makes bucket
    loads track the id distribution; for popularity-skewed catalogs,
    permute ids (hash-shard) before sharding the table or size capacity
    for the skew.

    ``row_transform`` applies a per-row map AT THE OWNER SHARD, before
    the response ``all_to_all`` — the tensor-parallel leaf pushed one hop
    further: when the transform narrows rows (raw feat_dim -> hidden),
    the response leg rides at the narrow width.  Requested-but-dropped
    ids then come back as 0 POST-transform rows (not ``transform(0)``) —
    identical to the untransformed contract whenever ``dropped == 0``.
    FLOP note: the owner transforms its full [m, c] request buffer
    (including empty slots), i.e. ``m*c`` rows vs ``b`` at the
    requester; with a statistical capacity ``c ~ factor*b/m`` that is a
    bounded ``~factor`` x overhead — without one (worst-case ``c = b``)
    it is ``m`` x, so pair the transform with a capacity.
    """
    m = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    per_rows = table_shard.shape[0]
    b = ids_shard.shape[0]
    c = b if capacity is None else min(int(capacity), b)
    oc = c if overflow_capacity is None else min(int(overflow_capacity), b)

    owner = jnp.clip(ids_shard // per_rows, 0, m - 1)  # [B]
    # Stable-sort queries by owner; slot queries into per-owner buckets.
    order = jnp.argsort(owner, stable=True)
    sorted_ids = ids_shard[order]
    sorted_owner = owner[order]
    # position of each sorted query within its owner's bucket
    pos_in_bucket = jnp.arange(b) - jnp.searchsorted(
        sorted_owner, sorted_owner, side="left"
    )
    fits = pos_in_bucket < c
    send_ids = jnp.full((m, c), -1, dtype=ids_shard.dtype)
    # Overflow entries scatter to the out-of-bounds column c and are
    # dropped — they must NOT clobber the valid id living in slot c-1.
    send_ids = send_ids.at[
        sorted_owner, jnp.where(fits, pos_in_bucket, c)
    ].set(sorted_ids, mode="drop")

    # Exchange request buckets: recv[j] = the bucket peer j sent to me.
    recv_ids = jax.lax.all_to_all(send_ids, axis, 0, 0, tiled=False)

    # Answer: gather my rows for every valid request.
    local = recv_ids - my * per_rows
    valid = (recv_ids >= 0) & (local >= 0) & (local < per_rows)
    rows = jnp.take(table_shard, jnp.clip(local, 0, per_rows - 1), axis=0)
    if row_transform is not None:
        # Owner-side transform: responses ride at the transform's output
        # width.  Transform first, THEN zero invalid slots (the map need
        # not send 0 to 0 — relu(bias) at empty slots would otherwise
        # leak into the response).
        rows = row_transform(rows.reshape(m * c, -1)).reshape(m, c, -1)
    rows = jnp.where(valid[..., None], rows, 0)  # [m, c, D']
    d = rows.shape[-1]

    # Route responses back and un-bucket.
    resp = jax.lax.all_to_all(rows, axis, 0, 0, tiled=False)  # [m, c, D]
    gathered_sorted = resp[
        sorted_owner, jnp.minimum(pos_in_bucket, c - 1)
    ]  # [B, D]

    dropped = jnp.int32(0)
    if c < b:
        # Bounded overflow lane: pack this shard's spilled ids into a
        # static [oc] buffer, all_gather so every shard sees every spill
        # (row_sharded_lookup needs axis-replicated ids), answer with the
        # psum lookup, and slice back this shard's segment.
        ovf = ~fits
        rank = jnp.cumsum(ovf) - 1
        in_budget = ovf & (rank < oc)
        buf = jnp.zeros((oc,), ids_shard.dtype).at[
            jnp.where(in_budget, rank, oc)
        ].set(jnp.where(in_budget, sorted_ids, 0), mode="drop")
        all_ovf = jax.lax.all_gather(buf, axis, axis=0, tiled=True)
        ovf_rows = row_sharded_lookup(table_shard, all_ovf, axis,
                                      row_transform=row_transform)
        mine = jax.lax.dynamic_slice_in_dim(ovf_rows, my * oc, oc)
        gathered_sorted = jnp.where(
            ovf[:, None],
            jnp.take(mine, jnp.clip(rank, 0, oc - 1), axis=0),
            gathered_sorted,
        )
        gathered_sorted = jnp.where(
            (ovf & (rank >= oc))[:, None], 0, gathered_sorted
        )
        dropped = jax.lax.psum(
            jnp.sum(ovf & (rank >= oc)).astype(jnp.int32), axis
        )

    out = jnp.zeros((b, d), gathered_sorted.dtype).at[order].set(
        gathered_sorted
    )
    if return_dropped:
        return out, dropped
    return out


def shard_adjacency(graph, etypes, m: int) -> Dict:
    """Host-side prep for sharded-CSR training: pad each relation's
    per-destination tables to a multiple of ``m`` and bundle them for
    ``P(model)`` placement (leading-row sharding).

    Returns ``{etype: {"nbr", "eid", "mask", "deg"}}`` — pass as the
    ``adj`` input of a step built with ``graph_shard_etypes`` and place
    every leaf with ``NamedSharding(mesh, P('model'))``.
    """
    out = {}
    for et in etypes:
        nbr, eid, mask, deg, _ = pad_adjacency_tables(graph.rels[et], m)
        out[et] = {"nbr": nbr, "eid": eid, "mask": mask, "deg": deg}
    return out


def strip_adjacency(graph, etypes):
    """Drop the replicated per-destination adjacency of ``etypes`` from a
    graph whose expansions route through the sharded-CSR hook.

    The [N, K] nbr/nbr_eid/nbr_mask tables are the HBM term that stops
    replication scaling past ~10M users (docs/results/hbm_budget_r5.md);
    once they live sharded in ``adj`` (:func:`shard_adjacency`), the
    replicated copies shrink to 1-element placeholders.  COO ``src`` /
    ``dst`` / ``edata`` and ``eid_pos`` (all O(E)) stay — the step's
    batch slicing, loss weighting, and the hook's shard-local exclusion
    marking read them.
    """
    rels = dict(graph.rels)
    for et in etypes:
        r = rels[et]
        rels[et] = r.replace(
            nbr=jnp.full((1, 1), -1, jnp.int32),
            nbr_eid=jnp.zeros((1, 1), jnp.int32),
            nbr_mask=jnp.zeros((1, 1), dtype=bool),
            deg=jnp.zeros((1,), jnp.int32),
            nbr_feat=None,
        )
    return graph.replace(rels=rels)


def pad_adjacency_tables(rel, m: int):
    """Pad a Relation's per-destination row tables to a multiple of ``m``
    so they can be row-sharded over a ``model`` axis.

    Padding rows keep the Relation invariants: ``nbr=-1`` (the sampler
    derives degree from the -1 padding), ``mask=False``, ``deg=0``.
    Returns ``(nbr, nbr_eid, nbr_mask, deg, n_rows)`` host-shaped arrays
    ready for ``P(axis)`` placement.
    """
    n = int(rel.nbr.shape[0])
    pad = (-n) % m
    nbr = jnp.pad(rel.nbr, ((0, pad), (0, 0)), constant_values=-1)
    eid = jnp.pad(rel.nbr_eid, ((0, pad), (0, 0)))
    mask = jnp.pad(rel.nbr_mask, ((0, pad), (0, 0)))
    deg = jnp.pad(rel.deg, (0, pad))
    return nbr, eid, mask, deg, n


def exclusion_table_sharded(
    nbr_shard: jax.Array,
    eid_pos: jax.Array,
    eids: jax.Array,
    axis: str = "model",
) -> jax.Array:
    """Shard-local sign-marked exclusion table (``ops.sampling.
    exclusion_table`` semantics) for ROW-SHARDED adjacency.

    Each shard owns rows ``[my*per, (my+1)*per)`` of the padded table;
    the batch's excluded edges scatter their sign-mark only into the
    rows this shard owns (``eid_pos`` gives each edge's flat position in
    the GLOBAL padded table).  Concatenating the shards reproduces the
    replicated exclusion table exactly.
    """
    my = jax.lax.axis_index(axis)
    per, k = nbr_shard.shape
    base = my * per * k
    pos = jnp.take(eid_pos, eids.reshape(-1).astype(jnp.int32), axis=0)
    local = pos - base
    in_shard = (local >= 0) & (local < per * k)
    flat = nbr_shard.reshape(-1)
    vals = jnp.take(flat, jnp.where(in_shard, local, 0), axis=0)
    # Same sign-mark as ops.sampling.exclusion_table; edges owned by
    # other shards scatter out of bounds (dropped), so they can never
    # clobber a mark this shard wrote.
    marked = flat.at[jnp.where(in_shard, local, per * k)].set(
        vals | jnp.int32(-(2**31)), mode="drop"
    )
    return marked.reshape(per, k)


def sharded_neighbor_rows(
    nbr_shard: jax.Array,
    eid_shard: jax.Array,
    mask_shard: jax.Array,
    deg_shard: jax.Array,
    ids: jax.Array,
    axis: str = "model",
    capacity: Optional[int] = None,
    nbr_table_shard: Optional[jax.Array] = None,
):
    """Fetch a frontier's adjacency rows from ROW-SHARDED CSC tables.

    The first piece of the sharded-CSR sampling path (SURVEY §2.3
    "sharded CSR"): each device owns a contiguous row range of the
    per-destination tables (``[N/m, K]`` nbr / nbr_eid / nbr_mask +
    ``[N/m]`` deg) — the replicated-adjacency HBM term that binds at
    north-star node counts (see docs/results/hbm_budget_r5.md) — and a
    frontier's rows are resolved with the SAME bucketed ``all_to_all``
    machinery as feature rows.  All four tables ride ONE exchange (packed
    into a single int32 row of width 3K+1), not four.

    ids: [F] int32 destination ids, replicated across ``axis``.
    nbr_table_shard: optional per-step SIGN-MARKED table shard
        (:func:`exclusion_table_sharded`) — fetched in place of the plain
        ``nbr`` rows, so batch-edge exclusion rides the same exchange.
    Returns ``(nbr [F, K], eid [F, K], mask [F, K] bool, deg [F])``
    replicated across ``axis`` — the exact rows a replicated
    ``Relation`` would gather.
    """
    m = jax.lax.axis_size(axis)
    k = nbr_shard.shape[1]
    table = nbr_shard if nbr_table_shard is None else nbr_table_shard
    packed = jnp.concatenate(
        [
            table.astype(jnp.int32),
            eid_shard.astype(jnp.int32),
            mask_shard.astype(jnp.int32),
            deg_shard.astype(jnp.int32)[:, None],
        ],
        axis=1,
    )  # [N/m, 3K+1]
    f = ids.shape[0]
    pad = (-f) % m
    ids_p = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
    chunk = ids_p.shape[0] // m
    my = jax.lax.axis_index(axis)
    mine = jax.lax.dynamic_slice_in_dim(ids_p, my * chunk, chunk)
    rows = row_sharded_lookup_a2a(packed, mine, axis=axis,
                                  capacity=capacity)
    full = jax.lax.all_gather(rows, axis, axis=0, tiled=True)[:f]
    nbr = full[:, :k]
    eid = full[:, k:2 * k]
    mask = full[:, 2 * k:3 * k].astype(bool)
    deg = full[:, 3 * k]
    if nbr_table_shard is None:
        # Zero-filled (unowned/padding) rows must read as empty, not as
        # "neighbor 0": restore the -1 padding invariant from the mask.
        nbr = jnp.where(mask, nbr, -1)
    else:
        # Sign-marked tables carry the exclusion bit; only restore -1
        # where the slot is invalid AND unmarked (zero-filled padding).
        nbr = jnp.where(mask | (nbr < 0), nbr, -1)
    return nbr, eid, mask, deg


def sample_neighbors_sharded(
    nbr_shard: jax.Array,
    eid_shard: jax.Array,
    mask_shard: jax.Array,
    deg_shard: jax.Array,
    ids: jax.Array,
    fanout: int,
    rng: Optional[jax.Array] = None,
    mode: str = "uniform",
    axis: str = "model",
    capacity: Optional[int] = None,
    with_eids: bool = True,
    nbr_table_shard: Optional[jax.Array] = None,
):
    """``ops.sampling.sample_neighbors`` against ROW-SHARDED adjacency.

    Fetches the frontier's rows once via :func:`sharded_neighbor_rows`,
    then runs the UNCHANGED slot-select logic on the fetched view — so
    the sampled tree is bit-identical to the replicated-adjacency
    sampler under the same rng (test-gated), and every optimization of
    the local sampler (one-hot slot select, -1 degree derivation)
    carries over.  ``nbr_table_shard`` (a shard of
    :func:`exclusion_table_sharded`'s output) adds batch-edge exclusion
    with the same zero-marginal-cost semantics as the replicated
    ``exclusion_table`` path.
    """
    from gnn_recsys_tpu.graph.hetero import Relation
    from gnn_recsys_tpu.ops.sampling import sample_neighbors

    flat = ids.reshape(-1)
    nbr, eid, mask, deg = sharded_neighbor_rows(
        nbr_shard, eid_shard, mask_shard, deg_shard, flat,
        axis=axis, capacity=capacity, nbr_table_shard=nbr_table_shard,
    )
    view = Relation(
        src=jnp.zeros((1,), jnp.int32),
        dst=jnp.zeros((1,), jnp.int32),
        nbr=nbr, nbr_eid=eid, nbr_mask=mask, deg=deg, edata={},
    )
    pos = jnp.arange(flat.shape[0], dtype=jnp.int32).reshape(ids.shape)
    return sample_neighbors(
        view, pos, fanout, rng=rng, mode=mode, with_eids=with_eids,
        nbr_table=nbr if nbr_table_shard is not None else None,
    )


def row_sharded_lookup(table_shard: jax.Array, ids: jax.Array,
                       axis: str = "model",
                       row_transform: Optional[Callable] = None
                       ) -> jax.Array:
    """Gather rows of a row-sharded table inside ``shard_map``.

    table_shard: [N/m, D] — this device's contiguous rows; ids: [B] global
    row ids (replicated across the axis).  Returns [B, D] full rows on
    every shard: local gather where owned, zeros elsewhere, ``psum`` to
    assemble.  ``row_transform`` applies per-row at the owner before the
    psum (transform first, then zero unowned slots — each id is owned by
    exactly one shard, so the sum is still the transformed gather).
    """
    m = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    per = table_shard.shape[0]
    lo = my * per
    local = ids - lo
    owned = (local >= 0) & (local < per)
    safe = jnp.clip(local, 0, per - 1)
    rows = jnp.take(table_shard, safe, axis=0)
    if row_transform is not None:
        rows = row_transform(rows)
    rows = jnp.where(owned[:, None], rows, 0)
    return jax.lax.psum(rows, axis)
