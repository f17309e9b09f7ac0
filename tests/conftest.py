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
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
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
