"""Real-TPU Mosaic compile + exactness gates for the Pallas kernels.

The CPU suite runs every kernel in interpret mode (tests/test_pallas_*);
these tests compile the ACTUAL Mosaic path on a real chip — the coverage
gap flagged by the round-3 review (exactness was asserted only inside
benchmarks/pallas_kernels.py, which CI never ran).

The suite-wide conftest pins JAX to a virtual CPU platform, so each test
shells out to a fresh interpreter that keeps the ambient TPU platform.
Skipped (not failed) when no TPU is attached — run with
``pytest -m tpu`` on a chip-connected host; the bench driver environment
satisfies that.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_tpu(code: str, timeout: int = 560) -> str:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
    if "PALLAS_AXON_POOL_IPS" in env:
        # The tunneled chip registers the experimental 'axon' platform,
        # but platform SELECTION still needs JAX_PLATFORMS (the ambient
        # default the suite conftest overwrote with 'cpu').  If the
        # tunnel is dead, jax.devices() raises and the probe skips.
        env["JAX_PLATFORMS"] = "axon"
    # PREPEND the repo — the ambient PYTHONPATH may carry the platform's
    # sitecustomize dir (clobbering it silently drops the TPU platform).
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, env.get("PYTHONPATH")) if p
    )
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, env=env,
    )
    if "NO_TPU" in res.stdout:
        pytest.skip("no TPU attached")
    assert res.returncode == 0, res.stdout + "\n" + res.stderr
    return res.stdout


PREAMBLE = """
import jax
# The tunneled chip registers as the experimental 'axon' platform but
# its devices report platform 'tpu'; accept either name.
try:
    devs = jax.devices()
except Exception:
    devs = []
if not any(d.platform in ("tpu", "axon") for d in devs):
    print("NO_TPU"); raise SystemExit(0)
# Oracle matmuls must not silently truncate to bf16 on the MXU.
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np
"""


@pytest.mark.tpu
@pytest.mark.slow
def test_leaf_mean_nn_mosaic_exact():
    out = _run_on_tpu(PREAMBLE + """
from gnn_recsys_tpu.ops.pallas.leaf_agg import (
    leaf_mean_nn, leaf_mean_nn_reference)
rng = np.random.default_rng(0)
k, p, f, h = 8, 1000, 8, 256
x = jnp.asarray(rng.normal(size=(k, p, f)), jnp.bfloat16)
mask = jnp.asarray(rng.random((p, k)) < 0.8, jnp.float32)
ms = mask / jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
w = jnp.asarray(rng.normal(size=(f, h)) * 0.3, jnp.bfloat16)
b = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.bfloat16)
out = jax.jit(lambda *a: leaf_mean_nn(*a, 512, False))(x, ms, w, b)
ref = leaf_mean_nn_reference(x, ms, w, b)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32))))
assert err < 1e-2, err  # bf16 I/O, f32 accumulation both sides

def loss(fn):
    def g(w, b):
        o = fn(x, ms, w, b)
        return jnp.sum(o.astype(jnp.float32) ** 2)
    return jax.jit(jax.grad(g, argnums=(0, 1)))
gw_k, gb_k = loss(lambda *a: leaf_mean_nn(*a, 512, False))(w, b)
gw_r, gb_r = loss(leaf_mean_nn_reference)(w, b)
for a, bb in ((gw_k, gw_r), (gb_k, gb_r)):
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                              - bb.astype(jnp.float32))))
    s = float(jnp.max(jnp.abs(bb.astype(jnp.float32)))) + 1e-6
    assert d / s < 0.05, (d, s)
print("LEAF_OK")
""")
    assert "LEAF_OK" in out


@pytest.mark.tpu
@pytest.mark.slow
def test_topk_mips_mosaic_exact():
    out = _run_on_tpu(PREAMBLE + """
from gnn_recsys_tpu.ops.pallas.topk_mips import mips_topk
rng = np.random.default_rng(1)
u = jnp.asarray(rng.normal(size=(256, 64)), jnp.float32)
it = jnp.asarray(rng.normal(size=(4096, 64)), jnp.float32)
vals, idx = jax.jit(lambda a, b: mips_topk(a, b, 10))(u, it)
sc = u @ it.T
rv, ri = jax.lax.top_k(sc, 10)
verr = float(jnp.max(jnp.abs(vals - rv)))
match = float(jnp.mean((idx == ri).astype(jnp.float32)))
assert verr < 1e-5, verr
assert match > 0.999, match
print("MIPS_OK")
""")
    assert "MIPS_OK" in out


@pytest.mark.tpu
@pytest.mark.slow
def test_gather_mean_mosaic_exact():
    out = _run_on_tpu(PREAMBLE + """
from gnn_recsys_tpu.ops.pallas.gather_mean import gather_mean_pallas
rng = np.random.default_rng(2)
n, b, k, d = 5000, 512, 8, 256
h = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
nbr = jnp.asarray(rng.integers(0, n, (b, k)), jnp.int32)
mask = jnp.asarray(rng.random((b, k)) < 0.8)
got = gather_mean_pallas(h, nbr, mask)
m = mask.astype(h.dtype)
msgs = jnp.take(h, nbr, axis=0)
want = jnp.sum(msgs * m[..., None], axis=1) / jnp.maximum(
    jnp.sum(m, axis=1), 1.0)[:, None]
err = float(jnp.max(jnp.abs(got - want)))
assert err < 1e-4, err
print("GM_OK")
""")
    assert "GM_OK" in out
