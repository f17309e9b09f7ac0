"""Multi-host scaffolding (parallel/multihost.py): hybrid mesh layout,
host-major pair-batch sharding, and the full tracker running on it.

Single-process here (the virtual CPU pool), but the code paths are the
ones a real pod run takes: the same ("host", "pair") axis names, the same
PartitionSpecs, the same global_pair_batch assembly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimot_track_tpu.parallel import multihost


def test_initialize_single_process_noop():
    # single process, no coordinator configured: must be a no-op, not a hang
    assert multihost.initialize() is False
    assert multihost.initialize() is False  # idempotent


def test_make_process_mesh_shapes():
    mesh = multihost.make_process_mesh()
    assert mesh.axis_names == ("host", "pair")
    assert mesh.shape["host"] == 1
    assert mesh.shape["pair"] == len(jax.devices())

    mesh2 = multihost.make_process_mesh(emulate_hosts=2)
    assert mesh2.shape["host"] == 2
    assert mesh2.shape["pair"] == len(jax.devices()) // 2


def test_pair_batch_spec_ranks():
    assert multihost.pair_batch_spec(1) == P(("host", "pair"))
    assert multihost.pair_batch_spec(3) == P(("host", "pair"), None, None)


def test_global_pair_batch_sharding_and_values():
    n = len(jax.devices())
    mesh = multihost.make_process_mesh(emulate_hosts=2 if n % 2 == 0 else 1)
    tree = {
        "a": np.arange(n * 3, dtype=np.float32).reshape(n, 3),
        "b": np.arange(n, dtype=np.int32),
    }
    out = multihost.global_pair_batch(mesh, tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
    np.testing.assert_array_equal(np.asarray(out["b"]), tree["b"])
    assert out["a"].sharding.is_equivalent_to(
        NamedSharding(mesh, multihost.pair_batch_spec(2)), 2
    )
    # each device holds exactly B/n rows
    assert out["a"].addressable_shards[0].data.shape == (n // len(mesh.devices.flat), 3)


@pytest.mark.slow
def test_full_tracker_on_hybrid_mesh():
    """The driver-dryrun path: complete tracker, pair-sharded, 8 devices."""
    import __graft_entry__ as entrymod

    n = len(jax.devices())
    entrymod.dryrun_multichip(n)
