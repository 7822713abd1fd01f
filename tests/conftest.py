"""Test harness: run everything on an 8-device virtual CPU mesh.

This mirrors the multi-device test strategy called for in SURVEY.md §4: the reference has
no software tests; we unit-test pure functions against formulas and validate sharding on
`xla_force_host_platform_device_count` virtual devices.
"""
import os
import sys

# Force CPU: the environment pins JAX_PLATFORMS=axon (one tunneled TPU chip) via a
# sitecustomize on PYTHONPATH that imports jax at interpreter start — so setting
# os.environ["JAX_PLATFORMS"] here is too late (the plugin is already registered
# and the env var was read at import; every dispatch would cross the TPU relay at
# ~32 ms/op). jax.config.update works as long as no backend has initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"  # for subprocesses spawned by tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("MDV2_PALLAS_INTERPRET", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
assert len(jax.devices()) >= 8, jax.devices()
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compile cache: the quick tier is dominated by serial CPU
# compiles of the tiny models (e.g. the pipeline fixture's ~3 min init); with a
# warm cache the same run completes in a fraction of the time. Keyed by HLO +
# compile flags, so code changes only re-pay for the programs they touch.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jaxcache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
