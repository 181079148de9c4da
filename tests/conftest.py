"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding tests run against xla_force_host_platform_device_count=8
(the driver validates the real multi-chip path separately via
__graft_entry__.dryrun_multichip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# sitecustomize (axon) may import jax before this conftest, freezing the
# platform from the env; override via config so tests run on the virtual
# CPU mesh regardless
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeated test runs skip XLA recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_hisat2_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def small_index():
    """A ~20 kb random single-sequence index shared across tests."""
    from hisat2_tpu.index.builder import build_fm_index
    r = np.random.default_rng(1234)
    seq = r.integers(0, 4, 20000).astype(np.uint8)
    return build_fm_index([("chr_t", seq)]), seq


@pytest.fixture(scope="session")
def multi_index():
    """Two sequences with embedded N runs (fragment handling)."""
    from hisat2_tpu.index.builder import build_fm_index
    r = np.random.default_rng(99)
    s1 = r.integers(0, 4, 5000).astype(np.uint8)
    s1[1000:1100] = 4  # N run
    s2 = r.integers(0, 4, 3000).astype(np.uint8)
    s2[0:7] = 4        # leading Ns
    return build_fm_index([("c1", s1), ("c2", s2)]), [s1, s2]
