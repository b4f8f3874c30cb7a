"""Test harness: run everything on a virtual 8-device CPU mesh with x64.

The driver benches on a real TPU chip; tests validate numerics (float64 on
CPU against oracles) and multi-device sharding (8 virtual CPU devices).
"""

import os

# NOTE: the JAX_PLATFORMS env var is ignored in this environment (the axon
# TPU plugin wins); jax.config.update is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the fast tier's wall time is dominated by
# CPU compiles of the larger jitted programs (extract/step/solver graphs);
# caching them across runs cuts warm reruns far below the 5-minute target
# so pre-commit validation is always affordable. Cold runs are unchanged.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), os.pardir, ".jax_test_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001 - older jax without the knobs
    pass
