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
