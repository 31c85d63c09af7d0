"""Persistent XLA compilation cache for deployment entry points.

Per-instance ``jax.jit`` objects retrace per process, so every fresh
pipeline/server pays full XLA compiles (30-60 s for the fused frame
programs on the dev tunnel; the r4 paced-serving runs burned their warmup
budget on exactly this).  JAX's persistent compilation cache skips the XLA
compile step across processes AND across pipeline instances — measured on
the axon TPU runtime: 2.2 s -> 0.59 s for a cold toy program; the large
odometry programs amortize far more.

Opt-in by the entry points (bench/queue/server/driver), not on library
import: the cache dir choice belongs to the app.  Disable with
``SYCL_POINTS_CACHE=0``.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "SYCL_POINTS_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "sycl_points_tpu", "xla"),
)

_enabled = False


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable the JAX persistent compilation cache (idempotent).

    CPU-backend only by default: on the axon TPU tunnel, SERIALIZING the
    large fused odometry executables into the cache measured pathologically
    slow (bench.py 2 min -> 700 s+ timeout), while on CPU the cache cuts
    repeated suite/compile costs cleanly.  Force-enable on any backend with
    ``SYCL_POINTS_CACHE=1``; disable entirely with ``SYCL_POINTS_CACHE=0``.

    Returns the cache dir, or None when not enabled.
    """
    global _enabled
    force = os.environ.get("SYCL_POINTS_CACHE", "")
    if force == "0":
        return None
    cache_dir = path or _DEFAULT_DIR
    if _enabled:
        return cache_dir
    try:
        import jax

        if force != "1" and jax.default_backend() != "cpu":
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default min-compile-time (1 s) keeps trivial programs out; the
        # fused frame/growth programs are all far above it
        _enabled = True
        return cache_dir
    except Exception:
        return None
