"""Pallas gather+masked-mean kernel vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_recsys_tpu.ops.message import csc_gather_mean
from gnn_recsys_tpu.ops.pallas.gather_mean import gather_mean_pallas


@pytest.mark.parametrize("b,k,n,d", [(13, 8, 50, 16), (32, 16, 200, 32)])
def test_gather_mean_matches_xla(b, k, n, d):
    rng = np.random.default_rng(0)
    h = rng.normal(size=(n, d)).astype(np.float32)
    nbr = rng.integers(0, n, (b, k)).astype(np.int32)
    mask = rng.random((b, k)) < 0.7
    mask[0] = False  # a zero-degree row
    got = gather_mean_pallas(jnp.asarray(h), jnp.asarray(nbr),
                             jnp.asarray(mask), tile_rows=4, interpret=True)
    want = csc_gather_mean(jnp.asarray(h), jnp.asarray(nbr),
                           jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
