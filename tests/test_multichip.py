"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Asserts (per SURVEY.md §4): the GSPMD-sharded train step equals the
single-device step exactly; the shard_map data-parallel step is
deterministic and trains; the row-sharded table lookup equals a plain
gather.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gnn_recsys_tpu.models.conv_model import ConvModel
from gnn_recsys_tpu.ops.membership import build_padded_pair_set
from gnn_recsys_tpu.parallel.mesh import make_mesh
from gnn_recsys_tpu.parallel.sharded import (
    make_gspmd_minibatch_step,
    make_shardmap_dp_step,
    row_sharded_lookup,
    shard_batch_dict,
    shard_inputs,
)
from gnn_recsys_tpu.train.full_batch import TrainState, init_model
from gnn_recsys_tpu.train.minibatch import (
    MinibatchConfig,
    make_minibatch_step,
)
from gnn_recsys_tpu.utils.synthetic import make_synthetic_data

ET = ("user", "buys", "item")
ETC = ("user", "clicks", "item")


@pytest.fixture(scope="module")
def world():
    data = make_synthetic_data(
        num_users=64, num_items=32, num_groups=4, interactions_per_user=8,
        with_clicks=True, seed=5,
    )
    g = data.graph
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 16), ("out", 8)),
        n_layers=3, aggregator_type="mean", pred="cos",
    )
    feats = {nt: g.ndata[nt]["features"] for nt in g.ntypes}
    params = init_model(model, g, feats, seed=0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-2)
    )
    cfg = MinibatchConfig(
        edge_batch_size=64, fanouts=(4, 4), neg_sample_size=8,
        neg_mode="shared_pool", neg_pool_size=16,
    )
    etypes = (ET, ETC)
    batch = {}
    for et in etypes:
        src = np.asarray(g.rels[et].src)[:32]
        dst = np.asarray(g.rels[et].dst)[:32]
        batch[et] = {
            "u": jnp.asarray(src, jnp.int32),
            "i": jnp.asarray(dst, jnp.int32),
            "recency": jnp.ones((32,), jnp.float32),
            "eids": jnp.arange(32, dtype=jnp.int32),
        }
    tables = {
        et: build_padded_pair_set(
            np.asarray(g.rels[et].src), np.asarray(g.rels[et].dst),
            num_src=g.num_nodes("user"),
        )
        for et in etypes
    }
    return data, g, model, feats, state, cfg, etypes, batch, tables


@pytest.mark.slow
def test_gspmd_step_equals_single_device(world):
    data, g, model, feats, state, cfg, etypes, batch, tables = world
    rng = jax.random.PRNGKey(7)

    single = make_minibatch_step(
        model, cfg, etypes, with_update=True, with_exclusion=True,
        has_reverse={et: True for et in etypes},
    )
    s1, loss1 = single(
        jax.tree.map(jnp.copy, state), g, feats, batch, tables, rng
    )

    mesh = make_mesh(8)  # (4, 2) data x model
    step = make_gspmd_minibatch_step(model, cfg, etypes, mesh)
    # the step donates the state; shard a fresh copy so the fixture survives
    st, gg, ff, tt = shard_inputs(
        mesh, jax.tree.map(jnp.copy, state), g, feats, tables
    )
    bb = shard_batch_dict(mesh, batch)
    s2, loss2 = step(st, gg, ff, bb, tt, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    flat1 = jax.tree.leaves(s1.params)
    flat2 = jax.tree.leaves(s2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_shardmap_dp_step_trains_and_is_deterministic(world):
    data, g, model, feats, state, cfg, etypes, batch, tables = world
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    step = make_shardmap_dp_step(model, cfg, etypes, mesh)
    rng = jax.random.PRNGKey(3)

    s_a, loss_a = step(jax.tree.map(jnp.copy, state), g, feats, batch,
                       tables, rng)
    s_b, loss_b = step(jax.tree.map(jnp.copy, state), g, feats, batch,
                       tables, rng)
    np.testing.assert_allclose(float(loss_a), float(loss_b))
    assert np.isfinite(float(loss_a))
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(s_a.params))
    )
    assert moved
    # several steps reduce the loss
    s, prev = s_a, float(loss_a)
    losses = [prev]
    for i in range(6):
        rng, sub = jax.random.split(rng)
        s, l = step(s, g, feats, batch, tables, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_row_sharded_lookup_equals_gather():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("model",))
    n, d = 64, 16
    table = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, d)).astype(np.float32)
    )
    ids = jnp.asarray([0, 5, 63, 17, 33, 8, 8, 40], jnp.int32)

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("model", None), P()),
        out_specs=P(),
        check_vma=False,
    )
    def lookup(table_shard, ids):
        return row_sharded_lookup(table_shard, ids, "model")

    got = lookup(table, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.take(table, ids, axis=0)),
        rtol=1e-6,
    )


def test_row_sharded_lookup_a2a_equals_gather():
    """Sharded-queries x sharded-table all_to_all exchange == plain gather."""
    from gnn_recsys_tpu.parallel.sharded import row_sharded_lookup_a2a

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("model",))
    n, d, b = 64, 16, 32  # 8 rows/shard, 4 ids/shard
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    # deliberately skewed: many ids hit shard 0
    ids = jnp.asarray(
        np.concatenate([rng.integers(0, 8, b // 2),
                        rng.integers(0, n, b - b // 2)]).astype(np.int32)
    )

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("model", None), P("model")),
        out_specs=P("model"),
        check_vma=False,
    )
    def lookup(table_shard, ids_shard):
        return row_sharded_lookup_a2a(table_shard, ids_shard, "model")

    got = lookup(table, ids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
    )


def test_row_sharded_lookup_a2a_statistical_capacity_exact():
    """Capacity-limited buckets + the overflow lane stay exact.

    Uniform ids with capacity ~2x the Binomial mean: occasional bucket
    overflows resolve through the bounded psum lane, dropped == 0, and
    rows equal the plain gather bit-for-bit.
    """
    from gnn_recsys_tpu.parallel.sharded import row_sharded_lookup_a2a

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("model",))
    n, d, b = 512, 16, 256  # 64 rows/shard, 32 ids/shard, mean load 4
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n, b).astype(np.int32))

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("model", None), P("model")),
        out_specs=(P("model"), P(None)),
        check_vma=False,
    )
    def lookup(table_shard, ids_shard):
        out, dropped = row_sharded_lookup_a2a(
            table_shard, ids_shard, "model", capacity=8,
            overflow_capacity=16, return_dropped=True,
        )
        return out, dropped[None]

    got, dropped = lookup(table, ids)
    assert int(dropped[0]) == 0
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
    )


def test_row_sharded_lookup_a2a_overflow_detected_not_corrupted():
    """Adversarial skew beyond both budgets: valid rows stay exact, only
    over-budget rows zero, and the drop counter reports them."""
    from gnn_recsys_tpu.parallel.sharded import row_sharded_lookup_a2a

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("model",))
    n, d, b = 64, 8, 64  # 8 ids/shard
    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    # EVERY id on shard 0: per-shard bucket load 8 >> capacity 2 + oc 2.
    ids = jnp.asarray(rng.integers(0, 8, b).astype(np.int32))

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("model", None), P("model")),
        out_specs=(P("model"), P(None)),
        check_vma=False,
    )
    def lookup(table_shard, ids_shard):
        out, dropped = row_sharded_lookup_a2a(
            table_shard, ids_shard, "model", capacity=2,
            overflow_capacity=2, return_dropped=True,
        )
        return out, dropped[None]

    got, dropped = lookup(table, ids)
    # 8 ids/shard, 2 via a2a + 2 via overflow -> 4 dropped per shard.
    assert int(dropped[0]) == 8 * 4
    want = np.asarray(jnp.take(table, ids, axis=0))
    got = np.asarray(got)
    # Each row is either exact or exactly zero (dropped), never garbage.
    exact = np.isclose(got, want, rtol=1e-6).all(axis=1)
    zero = (got == 0.0).all(axis=1)
    assert (exact | zero).all()
    assert int((~exact).sum()) == 8 * 4


@pytest.mark.slow
def test_train_minibatch_with_mesh(world):
    """End-to-end DP training through train_minibatch(mesh=...)."""
    from gnn_recsys_tpu.train.minibatch import train_minibatch

    data, g, model, feats, state, cfg, etypes, batch, tables = world
    train_eids = {et: np.arange(g.num_edges(et)) for et in etypes}
    mesh = make_mesh(8, data_axis=8, axis_names=("data",))
    import dataclasses
    cfg2 = dataclasses.replace(cfg, num_epochs=3, metrics_every=0,
                               patience=100)
    s, hist = train_minibatch(model, g, g, feats, train_eids, None, cfg2,
                              mesh=mesh)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0] * 1.5


@pytest.mark.slow
def test_train_minibatch_mesh_row_sharded_matches_replicated(world):
    """PRODUCTION table parallelism: device-epoch training on a 2D
    ('data','model') mesh with the item feature table row-sharded over
    'model' must produce the same training run as fully-replicated tables
    — sharding changes placement/collectives, never the math."""
    from gnn_recsys_tpu.train.minibatch import train_minibatch

    data, g, model, feats, state, cfg, etypes, batch, tables = world
    train_eids = {et: np.arange(g.num_edges(et)) for et in etypes}
    mesh = make_mesh(8)  # (4, 2) data x model
    import dataclasses
    cfg2 = dataclasses.replace(cfg, num_epochs=3, metrics_every=0,
                               patience=100, device_epoch=True)

    s_sh, hist_sh = train_minibatch(
        model, g, g, feats, train_eids, None, cfg2, mesh=mesh,
        row_shard_ntypes=("item",),
    )
    s_re, hist_re = train_minibatch(
        model, g, g, feats, train_eids, None, cfg2, mesh=mesh,
        row_shard_ntypes=(),
    )
    np.testing.assert_allclose(
        hist_sh["train_loss"], hist_re["train_loss"], rtol=1e-4, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(s_sh.params),
                    jax.tree.leaves(s_re.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    assert hist_sh["train_loss"][-1] < hist_sh["train_loss"][0] * 1.5


def test_tp_dp_a2a_step_matches_dp_step(world):
    """The explicit ('data','model') step whose sharded-table feature reads
    go through row_sharded_lookup_a2a must compute the same training step
    as the plain shard_map DP step with replicated tables (same per-data-
    shard rng): the a2a exchange is just a distributed gather."""
    from gnn_recsys_tpu.parallel.sharded import make_shardmap_tp_dp_step

    data, g, model, feats, state, cfg, etypes, batch, tables = world
    mesh = make_mesh(8, data_axis=4)  # (4, 2) data x model
    assert feats["item"].shape[0] % 2 == 0  # rows divide the model axis

    rng = jax.random.PRNGKey(3)
    dp = make_shardmap_dp_step(model, cfg, etypes, mesh, axis="data")
    st_dp, loss_dp = dp(state, g, feats, batch, tables, rng)

    tp = make_shardmap_tp_dp_step(
        model, cfg, etypes, mesh, row_shard_ntypes=("item",),
    )
    st_tp, loss_tp = tp(state, g, feats, batch, tables, rng)

    np.testing.assert_allclose(
        float(loss_dp), float(loss_tp), rtol=1e-6, atol=1e-7
    )
    for a, b in zip(jax.tree.leaves(st_dp.params),
                    jax.tree.leaves(st_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # And it actually trains: a second step lowers the loss.
    _, loss2 = tp(st_tp, g, feats, batch, tables,
                  jax.random.fold_in(rng, 1))
    assert np.isfinite(float(loss2))

    # Statistical-capacity bucketing (factor 2 + exact overflow lane)
    # must not change the math.
    tp_cap = make_shardmap_tp_dp_step(
        model, cfg, etypes, mesh, row_shard_ntypes=("item",),
        a2a_capacity_factor=2.0,
    )
    # With a capacity factor the step surfaces the drop counter — the
    # production contract is dropped == 0 (detect, don't silently
    # zero-fill).
    st_cap, loss_cap, dropped = tp_cap(state, g, feats, batch, tables, rng)
    assert int(dropped) == 0
    np.testing.assert_allclose(
        float(loss_dp), float(loss_cap), rtol=1e-6, atol=1e-7
    )
    for a, b in zip(jax.tree.leaves(st_dp.params),
                    jax.tree.leaves(st_cap.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_collective_bytes_parser():
    """benchmarks/comm_bytes.collective_bytes sums output bytes of
    collective ops from optimized HLO text."""
    import importlib.util as ilu
    import os

    spec = ilu.spec_from_file_location(
        "comm_bytes",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "benchmarks", "comm_bytes.py"),
    )
    mod = ilu.module_from_spec(spec)
    # Import only the parser (module import would re-init jax config);
    # execute the source up to main() by loading and reading the fn.
    src = open(spec.origin).read()
    ns = {"__file__": spec.origin}
    exec(compile(src.split("def main()")[0], spec.origin, "exec"), ns)
    cb = ns["collective_bytes"]
    hlo = "\n".join([
        "%ar = f32[8,16]{1,0} all-reduce(f32[8,16]{1,0} %x)",
        "%aa = (s32[4,8]{1,0}, bf16[2,4]{1,0}) all-to-all(%a, %b)",
        "%ag = bf16[64]{0} all-gather(bf16[8]{0} %y)",
        "%mm = f32[128,128]{1,0} dot(%p, %q)",  # not a collective
    ])
    got = cb(hlo)
    assert got["all-reduce"] == 8 * 16 * 4
    assert got["all-to-all"] == 4 * 8 * 4 + 2 * 4 * 2
    assert got["all-gather"] == 64 * 2
    assert got["collective-permute"] == 0


def test_shardmap_steps_run_pallas_kernels(world):
    """VERDICT r4 #4: the fused Pallas kernels (leaf_mean_nn +
    pool_membership_mask) are legal inside the shard_map steps — each
    device holds an explicit local block, unlike the GSPMD path where a
    pallas_call is opaque to the auto-partitioner.  The kernel step must
    equal the jnp step (kernels are exact, interpret mode on CPU)."""
    import dataclasses

    data, g, _, feats, _, _, etypes, batch, tables = world
    model_nokern = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 16), ("out", 8)),
        n_layers=3, aggregator_type="mean_nn", pred="cos",
    )
    model_kern = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 16), ("out", 8)),
        n_layers=3, aggregator_type="mean_nn", pred="cos",
        leaf_kernel=True,
    )
    params = init_model(model_nokern, g, feats, seed=0)
    import optax

    state = TrainState.create(
        apply_fn=model_nokern.apply, params=params, tx=optax.adam(1e-2)
    )
    cfg_nokern = MinibatchConfig(
        edge_batch_size=64, fanouts=(4, 4), neg_sample_size=16,
        neg_mode="dense_pool", neg_pool_size=16,
    )
    cfg_kern = dataclasses.replace(cfg_nokern, pool_mask_kernel=True)
    mesh = make_mesh(8, data_axis=4)
    rng = jax.random.PRNGKey(0)

    ref_step = make_shardmap_dp_step(model_nokern, cfg_nokern, etypes, mesh)
    st_ref, loss_ref = ref_step(state, g, feats, batch, tables, rng)

    kern_step = make_shardmap_dp_step(model_kern, cfg_kern, etypes, mesh)
    st_k, loss_k = kern_step(state, g, feats, batch, tables, rng)

    np.testing.assert_allclose(
        float(loss_ref), float(loss_k), rtol=1e-5, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(st_ref.params),
                    jax.tree.leaves(st_k.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_gspmd_mesh_path_rejects_pallas_kernels(world):
    """train_minibatch(mesh=...) must refuse the kernel flags with a clear
    error instead of failing deep inside the partitioner (ADVICE r4)."""
    import dataclasses

    from gnn_recsys_tpu.train.minibatch import train_minibatch

    data, g, _, feats, _, cfg, etypes, _, _ = world
    model_kern = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", 8), ("item", 8), ("hidden", 16), ("out", 8)),
        n_layers=3, aggregator_type="mean_nn", pred="cos",
        leaf_kernel=True,
    )
    mesh = make_mesh(8, data_axis=4)
    eids = {et: np.arange(32) for et in etypes}
    cfg2 = dataclasses.replace(cfg, num_epochs=1)
    with pytest.raises(ValueError, match="opaque to the auto-partitioner"):
        train_minibatch(model_kern, g, g, feats, eids, None, cfg2,
                        mesh=mesh)


def test_hash_sharded_lookup_zipf_zero_drops():
    """VERDICT r4 #7: contiguous-range sharding of a popularity-skewed id
    stream overloads the hot shard's buckets (drops at tight capacity);
    hash-sharded placement (bijective id mix + permuted table layout)
    makes bucket loads Binomial — zero drops at the same capacity — and
    stays exact."""
    from gnn_recsys_tpu.parallel.sharded import (
        hash_mix_ids,
        hash_shard_table,
        row_sharded_lookup_a2a,
        statistical_a2a_capacity,
    )

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("model",))
    m, n, d, b = 8, 1024, 16, 512  # 64 ids/shard
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    # Adversarial skew: 90% of lookups hit the first shard's id range
    # (the Zipf head of a popularity-sorted catalog).
    hot = rng.integers(0, n // m, int(b * 0.9))
    cold = rng.integers(0, n, b - hot.shape[0])
    ids = jnp.asarray(np.concatenate([hot, cold]).astype(np.int32))
    cap = statistical_a2a_capacity(b // m, m, 2.0)

    def run(table_arr, ids_arr):
        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P("model", None), P("model")),
            out_specs=(P("model"), P(None)),
            check_vma=False,
        )
        def f(t, i):
            r, dropped = row_sharded_lookup_a2a(
                t, i, "model", capacity=cap, return_dropped=True
            )
            return r, dropped[None]

        return f(table_arr, ids_arr)

    # Contiguous sharding: the hot shard's buckets + overflow lane
    # cannot absorb 90% of the stream.
    _, dropped_contig = run(table, ids)
    assert int(dropped_contig[0]) > 0

    # Hash-sharded: same capacity, zero drops, exact rows.
    hashed, n2_log = hash_shard_table(table, m)
    rows, dropped_hash = run(hashed, hash_mix_ids(ids, n2_log))
    assert int(dropped_hash[0]) == 0
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(jnp.take(table, ids, axis=0)),
        rtol=1e-6,
    )


def test_hash_mix_is_bijective():
    from gnn_recsys_tpu.parallel.sharded import hash_mix_ids

    for log in (4, 10, 17):
        ids = jnp.arange(1 << log, dtype=jnp.int32)
        mixed = np.asarray(hash_mix_ids(ids, log))
        assert np.unique(mixed).size == 1 << log
        assert mixed.min() >= 0 and mixed.max() < (1 << log)


def test_tp_dp_step_hash_sharded_tables(world):
    """The 2-D a2a step with hash-sharded item features equals the
    contiguous-sharded step (same math, permuted placement)."""
    from gnn_recsys_tpu.parallel.sharded import (
        hash_shard_table,
        make_shardmap_tp_dp_step,
    )

    data, g, model, feats, state, cfg, etypes, batch, tables = world
    mesh = make_mesh(8, data_axis=4)
    rng = jax.random.PRNGKey(3)

    tp = make_shardmap_tp_dp_step(
        model, cfg, etypes, mesh, row_shard_ntypes=("item",),
    )
    st_ref, loss_ref = tp(state, g, feats, batch, tables, rng)

    hashed, n2_log = hash_shard_table(feats["item"], 2)
    feats_h = dict(feats, item=hashed)
    tp_h = make_shardmap_tp_dp_step(
        model, cfg, etypes, mesh, row_shard_ntypes=("item",),
        a2a_capacity_factor=4.0, hash_mix_logs={"item": n2_log},
    )
    st_h, loss_h, dropped = tp_h(state, g, feats_h, batch, tables, rng)
    assert int(dropped) == 0
    np.testing.assert_allclose(
        float(loss_ref), float(loss_h), rtol=1e-6, atol=1e-7
    )
    for a, b in zip(jax.tree.leaves(st_ref.params),
                    jax.tree.leaves(st_h.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_adjacency_sampling_equals_replicated(world):
    """First sharded-CSR piece (SURVEY §2.3): adjacency rows sharded over
    'model', frontier expansions through the a2a machinery — the sampled
    neighbors/eids/masks must be BIT-IDENTICAL to the replicated-relation
    sampler under the same rng, in both uniform and full modes."""
    from gnn_recsys_tpu.ops.sampling import sample_neighbors
    from gnn_recsys_tpu.parallel.sharded import (
        pad_adjacency_tables,
        sample_neighbors_sharded,
    )

    data, g, _, _, _, _, _, _, _ = world
    rel = g.rels[ET]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("model",))
    nbr, eid, mask, deg, n = pad_adjacency_tables(rel, 8)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, n, 24).astype(np.int32)
    )
    rng = jax.random.PRNGKey(4)

    for mode in ("uniform", "full"):
        fanout = 3 if mode == "uniform" else rel.max_fanout
        ref = sample_neighbors(rel, ids, fanout, rng=rng, mode=mode)

        @jax.jit
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P("model"), P("model"), P("model"), P("model"),
                      P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        def run(nbr_s, eid_s, mask_s, deg_s, ids, rng):
            return sample_neighbors_sharded(
                nbr_s, eid_s, mask_s, deg_s, ids, fanout, rng=rng,
                mode=mode,
            )

        got = run(nbr, eid, mask, deg, ids, rng)
        for a, b, name in zip(got, ref, ("nbr", "eid", "mask")):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{mode}/{name}"
            )


def test_sharded_adjacency_sampling_with_exclusion(world):
    """Batch-edge exclusion on the sharded-adjacency path: the shard-local
    sign-marked table (exclusion_table_sharded) + the fetched view must
    reproduce the replicated exclusion_table sampler bit-for-bit."""
    from gnn_recsys_tpu.ops.sampling import exclusion_table, sample_neighbors
    from gnn_recsys_tpu.parallel.sharded import (
        exclusion_table_sharded,
        pad_adjacency_tables,
        sample_neighbors_sharded,
    )

    data, g, _, _, _, _, _, _, _ = world
    rel = g.rels[ET]
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("model",))
    nbr, eid, mask, deg, n = pad_adjacency_tables(rel, 8)
    rng_np = np.random.default_rng(1)
    ids = jnp.asarray(rng_np.integers(0, n, 24).astype(np.int32))
    excl_eids = jnp.asarray(
        rng_np.permutation(int(rel.src.shape[0]))[:40].astype(np.int32)
    )
    rng = jax.random.PRNGKey(9)
    fanout = 3

    marked_ref = exclusion_table(rel, excl_eids)
    ref = sample_neighbors(rel, ids, fanout, rng=rng, mode="uniform",
                           nbr_table=marked_ref)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("model"), P("model"), P("model"), P("model"),
                  P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(nbr_s, eid_s, mask_s, deg_s, eid_pos, excl, ids, rng):
        table_s = exclusion_table_sharded(nbr_s, eid_pos, excl)
        return sample_neighbors_sharded(
            nbr_s, eid_s, mask_s, deg_s, ids, fanout, rng=rng,
            mode="uniform", nbr_table_shard=table_s,
        )

    got = run(nbr, eid, mask, deg, rel.eid_pos, excl_eids, ids, rng)
    for a, b, name in zip(got, ref, ("nbr", "eid", "mask")):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def _all_gather_bytes(hlo_text: str) -> int:
    """Sum output bytes of all-gather ops in optimized HLO text."""
    import re

    dtype_bytes = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1}
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    total = 0
    for line in hlo_text.splitlines():
        m = re.search(r"=\s+(.*?)\s+all-gather\(", line)
        if not m:
            continue
        for dt, dims in shape_re.findall(m.group(1)):
            if dt not in dtype_bytes:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dtype_bytes[dt]
    return total


def test_tp_leaf_transform_equal_and_fewer_reassembly_bytes(world):
    """Tensor-parallel leaf (tp_transform): the a2a step applies the
    per-row leaf transform on each model shard BEFORE the reassembly
    all_gather.  Same math as transforming after reassembly, but the
    exchange rides at hidden width — in the wide-feature regime
    (feat_dim >> hidden) the compiled all_gather bytes must shrink."""
    from gnn_recsys_tpu.parallel.sharded import make_shardmap_tp_dp_step
    from gnn_recsys_tpu.train.minibatch import MinibatchConfig

    data, g, _, _, _, _, etypes, batch, tables = world
    feat_dim, hidden = 64, 8
    rng_np = np.random.default_rng(7)
    feats = {
        nt: jnp.asarray(
            rng_np.normal(size=(g.num_nodes(nt), feat_dim)), jnp.float32
        )
        for nt in g.ntypes
    }
    model = ConvModel(
        canonical_etypes=g.canonical_etypes,
        dims=(("user", feat_dim), ("item", feat_dim),
              ("hidden", hidden), ("out", hidden)),
        n_layers=3, aggregator_type="mean_nn", pred="cos",
    )
    params = init_model(model, g, feats, seed=0)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(1e-2)
    )
    cfg = MinibatchConfig(
        edge_batch_size=64, fanouts=(4, 4), neg_sample_size=8,
        neg_mode="shared_pool", neg_pool_size=16,
    )
    mesh = make_mesh(8, data_axis=4)
    rng = jax.random.PRNGKey(3)

    steps, compiled = {}, {}
    for flag in (True, False):
        tp = make_shardmap_tp_dp_step(
            model, cfg, etypes, mesh, row_shard_ntypes=("item",),
            tp_transform=flag,
        )
        compiled[flag] = tp.lower(
            state, g, feats, batch, tables, rng
        ).compile()
        steps[flag] = compiled[flag](state, g, feats, batch, tables, rng)

    (st_on, loss_on), (st_off, loss_off) = steps[True], steps[False]
    np.testing.assert_allclose(
        float(loss_on), float(loss_off), rtol=1e-6, atol=1e-7
    )
    for a, b in zip(jax.tree.leaves(st_on.params),
                    jax.tree.leaves(st_off.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    on = _all_gather_bytes(compiled[True].as_text())
    off = _all_gather_bytes(compiled[False].as_text())
    # Reassembly moves from feat_dim (64) to hidden (8) width; the other
    # all_gathers are unchanged, so a substantial shrink must show up.
    assert on < off, (on, off)
    assert on <= 0.5 * off, (on, off)


def test_graph_sharded_training_step_equals_replicated(world):
    """Sharded-CSR TRAINING (SURVEY §2.3 'sharded CSR', end-to-end): the
    2-D step with every relation's adjacency row-sharded over 'model'
    (replicated copies stripped to placeholders) must equal the
    replicated-adjacency a2a step — sampling, exclusion, loss, update."""
    from gnn_recsys_tpu.parallel.sharded import (
        make_shardmap_tp_dp_step,
        shard_adjacency,
        strip_adjacency,
    )

    data, g, model, feats, state, cfg, etypes, batch, tables = world
    mesh = make_mesh(8, data_axis=4)  # (4, 2) data x model
    rng = jax.random.PRNGKey(3)

    tp = make_shardmap_tp_dp_step(
        model, cfg, etypes, mesh, row_shard_ntypes=("item",),
    )
    st_ref, loss_ref = tp(state, g, feats, batch, tables, rng)

    all_ets = g.canonical_etypes
    adj = shard_adjacency(g, all_ets, 2)
    g_stripped = strip_adjacency(g, all_ets)
    # The stripped graph really lost its big tables.
    assert g_stripped.rels[ET].nbr.shape == (1, 1)
    assert g_stripped.rels[ET].eid_pos is not None

    gs = make_shardmap_tp_dp_step(
        model, cfg, etypes, mesh, row_shard_ntypes=("item",),
        graph_shard_etypes=all_ets,
    )
    st_gs, loss_gs = gs(state, g_stripped, feats, batch, tables, adj, rng)

    np.testing.assert_allclose(
        float(loss_ref), float(loss_gs), rtol=1e-6, atol=1e-7
    )
    for a, b in zip(jax.tree.leaves(st_ref.params),
                    jax.tree.leaves(st_gs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # And it trains standalone: second step produces a finite loss.
    _, loss2 = gs(st_gs, g_stripped, feats, batch, tables, adj,
                  jax.random.fold_in(rng, 1))
    assert np.isfinite(float(loss2))
