"""Test configuration: run everything on a virtual 8-device CPU platform.

The ambient environment force-registers a TPU platform via sitecustomize and
overrides JAX_PLATFORMS, so we override back through jax.config — tests must
be runnable anywhere, fast, and exercise the virtual 8-device mesh used by
the multi-chip sharding tests (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Validate semantics in full f32: JAX's default matmul precision truncates
# inputs to bf16, which breaks comparisons against numpy oracles.
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()
