"""Run any repo script on the CPU backend (diagnostics / correctness work).

``JAX_PLATFORMS=cpu`` via the environment is ignored by this runtime outside
pytest (the axon plugin registers first); ``jax.config.update`` before first
backend use is the reliable switch — same mechanism as tests/conftest.py.

Usage: python scripts/cpu_run.py <script.py> [args ...]
"""

import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()

sys.argv = sys.argv[1:]
sys.path.insert(0, os.path.dirname(os.path.abspath(sys.argv[0])))
runpy.run_path(sys.argv[0], run_name="__main__")
