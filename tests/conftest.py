"""Test configuration: run on a virtual 8-device CPU mesh.

Must set platform flags before jax initializes its backends.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: session env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config API
# wins, so force the CPU backend here (tests must not run over the TPU
# tunnel).  An 8-device virtual CPU mesh exercises the sharded paths.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import zlib  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _deterministic_global_rng(request):
    """Reseed the shared inits RNG per test from the test name, so results
    never depend on which other tests ran first (collection order)."""
    from yalla_tpu import inits
    inits.set_seed(zlib.crc32(request.node.nodeid.encode()))
