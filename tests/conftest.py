"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise the real kernels (jit-compiled XLA paths) on CPU, with 8
virtual devices so the multi-chip sharding paths compile and run without TPU
hardware.  Benchmarks (bench.py) run on the real chip.

The environment may preset ``JAX_PLATFORMS`` to a TPU platform and pytest
plugins may import jax before this file runs, so we use ``jax.config``
(effective until the backend is first used) rather than environment variables.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)

# Persistent compilation cache: repeated suite runs skip XLA compiles
# (keyed by HLO hash; safe across code changes).  ~2 weak host cores make
# compile time a real fraction of the 40-minute suite.
jax.config.update(
    "jax_compilation_cache_dir", "/tmp/sycl_points_tpu_test_xla_cache"
)
