"""Test harness: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4: multi-host tests on a simulated
mesh).

The container pins JAX_PLATFORMS=axon via sitecustomize, so the env var
alone is not enough — we must flip the config knob after importing jax.
Set MMT_TEST_TPU=1 to run the suite against the real chip instead.
"""

import os

if os.environ.get("MMT_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_max_isa" not in flags:
        # the fleet's VMs advertise AVX512/AMX the LLVM JIT miscompiles
        # against (XLA:CPU segfaults intermittently while compiling large
        # programs); AVX2 codegen is reliable and plenty for tests
        flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
    os.environ["XLA_FLAGS"] = flags
    import jax

    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_SAMPLE = pathlib.Path("/root/reference/kitti_sample")


@pytest.fixture(scope="session")
def kitti_sample_dir():
    if not REFERENCE_SAMPLE.exists():
        pytest.skip("kitti_sample fixture not available")
    return REFERENCE_SAMPLE


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    With 120+ tests compiling hundreds of distinct XLA:CPU programs in one
    process, the accumulated live-executable state deterministically
    segfaults the ~114th test's compile (LLVM JIT arena exhaustion; the
    crash needs the long prefix — any suffix subset passes).  Bounding the
    live set per module removes the crash; the persistent on-disk cache
    keeps re-loads cheap."""
    yield
    import jax

    jax.clear_caches()
