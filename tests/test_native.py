"""Native graph-packing core: parity with the numpy packer + speed sanity."""

import time

import numpy as np
import pytest

from gnn_recsys_tpu import native
from gnn_recsys_tpu.graph import hetero


def pack_with(native_on, *args, **kwargs):
    """Run coo_to_padded_csc with the native path forced on/off."""
    saved = (native._tried, native._lib)
    try:
        if native_on:
            native._tried = False
            native._lib = None
        else:
            native._tried, native._lib = True, None
        return hetero.coo_to_padded_csc(*args, **kwargs)
    finally:
        native._tried, native._lib = saved


@pytest.mark.skipif(not native.native_available(), reason="no g++ / .so")
@pytest.mark.parametrize("cap", [None, 4, 64])
def test_native_pack_matches_numpy(cap):
    rng = np.random.default_rng(0)
    e, num_dst = 20_000, 500
    src = rng.integers(0, 800, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    got = pack_with(True, src, dst, num_dst, max_fanout=cap)
    want = pack_with(False, src, dst, num_dst, max_fanout=cap)
    for g, w, name in zip(got, want, ("nbr", "eid", "mask", "deg")):
        np.testing.assert_array_equal(g, w, err_msg=name)


@pytest.mark.skipif(not native.native_available(), reason="no g++ / .so")
def test_native_max_degree():
    dst = np.asarray([0, 0, 0, 2, 2, 5], np.int32)
    assert native.csc_max_degree(dst, 6) == 3


@pytest.mark.skipif(not native.native_available(), reason="no g++ / .so")
def test_native_cuckoo_build_lookup_oracle():
    import jax.numpy as jnp

    from gnn_recsys_tpu.ops import edge_hash

    rng = np.random.default_rng(3)
    e = 50_000
    src = rng.integers(0, 2_000, e).astype(np.int32)
    dst = rng.integers(0, 1_000, e).astype(np.int32)
    # Heavy duplication: native dup-skip must keep the table compact.
    src = np.concatenate([src, src[: e // 2]])
    dst = np.concatenate([dst, dst[: e // 2]])

    table = edge_hash._build_edge_hash_native(src, dst, min_capacity=4)
    assert table is not None
    present = set(zip(src.tolist(), dst.tolist()))
    # Table sized from the DISTINCT count, not the raw stream length.
    assert table.capacity <= max(1 << (int(len(present) * 1.5)).bit_length(), 4)

    qu = rng.integers(0, 2_000, 20_000).astype(np.int32)
    qv = rng.integers(0, 1_000, 20_000).astype(np.int32)
    want = np.array([(a, b) in present for a, b in zip(qu, qv)])
    got = np.asarray(
        edge_hash.edge_hash_lookup(table, jnp.asarray(qu), jnp.asarray(qv))
    )
    np.testing.assert_array_equal(got, want)
    # All inserted pairs must be found.
    hits = np.asarray(
        edge_hash.edge_hash_lookup(table, jnp.asarray(src), jnp.asarray(dst))
    )
    assert hits.all()


@pytest.mark.skipif(not native.native_available(), reason="no g++ / .so")
def test_native_cuckoo_empty_and_tiny():
    import jax.numpy as jnp

    from gnn_recsys_tpu.ops.edge_hash import build_edge_hash, edge_hash_lookup

    t = build_edge_hash(np.array([], np.int32), np.array([], np.int32))
    assert not bool(
        edge_hash_lookup(t, jnp.asarray([0]), jnp.asarray([0]))[0]
    )
    t2 = build_edge_hash(np.array([7], np.int32), np.array([9], np.int32))
    assert bool(edge_hash_lookup(t2, jnp.asarray([7]), jnp.asarray([9]))[0])
    assert not bool(edge_hash_lookup(t2, jnp.asarray([9]), jnp.asarray([7]))[0])


@pytest.mark.skipif(not native.native_available(), reason="no g++ / .so")
def test_native_cuckoo_build_is_faster_at_scale():
    import os

    from gnn_recsys_tpu.ops import edge_hash

    rng = np.random.default_rng(4)
    e = 2_000_000
    src = rng.integers(0, 500_000, e).astype(np.int32)
    dst = rng.integers(0, 100_000, e).astype(np.int32)
    t0 = time.perf_counter()
    nt = edge_hash._build_edge_hash_native(src, dst, min_capacity=4)
    t_native = time.perf_counter() - t0
    assert nt is not None
    os.environ["GNN_RECSYS_TPU_NATIVE"] = "0"
    saved = (native._tried, native._lib)
    native._tried, native._lib = True, None
    try:
        t0 = time.perf_counter()
        edge_hash.build_edge_hash(src, dst)
        t_numpy = time.perf_counter() - t0
    finally:
        native._tried, native._lib = saved
        os.environ.pop("GNN_RECSYS_TPU_NATIVE", None)
    print(f"cuckoo native={t_native:.3f}s numpy={t_numpy:.3f}s")
    assert t_native < t_numpy, (t_native, t_numpy)


@pytest.mark.skipif(not native.native_available(), reason="no g++ / .so")
def test_native_pack_is_faster_at_scale():
    rng = np.random.default_rng(1)
    e, num_dst = 2_000_000, 100_000
    src = rng.integers(0, 200_000, e).astype(np.int32)
    dst = rng.integers(0, num_dst, e).astype(np.int32)
    t0 = time.perf_counter()
    pack_with(True, src, dst, num_dst, max_fanout=32)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    pack_with(False, src, dst, num_dst, max_fanout=32)
    t_numpy = time.perf_counter() - t0
    print(f"native={t_native:.3f}s numpy={t_numpy:.3f}s")
    # the native path should never be slower at this scale
    assert t_native < t_numpy, (t_native, t_numpy)


@pytest.mark.skipif(not native.native_available(), reason="no g++ / .so")
def test_native_pack_rejects_out_of_range_dst():
    """Out-of-range dst ids must raise, not write out of bounds: the C++
    packer indexes its output rows by dst unchecked."""
    src = np.asarray([0, 1], np.int32)
    dst = np.asarray([0, 7], np.int32)
    with pytest.raises(ValueError, match="out of range"):
        native.csc_pack(src, dst, num_dst=4, k=2)
    with pytest.raises(ValueError, match="out of range"):
        native.csc_pack(src, np.asarray([-1, 0], np.int32), num_dst=4, k=2)
