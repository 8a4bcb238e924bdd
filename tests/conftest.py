"""Test config: force a virtual 8-device CPU mesh.

Env vars must be set before jax initializes its backends; under the axon
image a sitecustomize pre-registers the TPU backend and forces
JAX_PLATFORMS=axon, so the env-var route is not enough — we also override
the platform through jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The production default (BUAS_SHADOW_NATURAL=2) routes occlusion waves
# through the grouped kernel, which is very slow under interpret mode on
# CPU (measured: fast suite 9:44 -> 28:41).  Tests default to the ladder
# route; test_dispatch_shadow_natural_parity monkeypatches all three
# modes explicitly, so coverage of the natural routes is unchanged.
os.environ.setdefault("BUAS_SHADOW_NATURAL", "0")
os.environ.setdefault("BUAS_OCC_LADDER_GROUPED", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache for the suite (round-4 verdict item 8: the
# fast suite's wall clock is dominated by re-COMPILING the same oracle and
# kernel programs every run — batch-size experiments moved nothing).  The
# cache survives across runs and rounds; the first run pays full compiles,
# routine runs load executables from disk.  Kept separate from the TPU
# bench cache (.jax_cache) so neither pollutes the other's eviction.
if os.environ.get("BUAS_TEST_NO_CACHE") != "1":
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_cpu")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def nprng():
    return np.random.RandomState(1234)


def pytest_collection_modifyitems(config, items):
    """Tests marked `slow_convergence` only run when BUAS_SLOW_TESTS=1
    (high-spp statistical bounds; minutes of runtime, meant for TPU or
    nightly runs)."""
    if os.environ.get("BUAS_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="set BUAS_SLOW_TESTS=1 to run")
    for item in items:
        if "slow_convergence" in item.keywords:
            item.add_marker(skip)
