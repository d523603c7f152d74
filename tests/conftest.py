"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's plan: the CPU backend is the reference oracle;
sharding tests use 8 virtual CPU devices.

NOTE: in this environment the axon TPU plugin ignores the
JAX_PLATFORMS env var, so the platform must be forced through
jax.config BEFORE any backend is initialized.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/aten_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
