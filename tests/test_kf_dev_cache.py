"""KeyframeStore device-array cache + structural-version semantics.

The serving-path optimization (upload each keyframe's payload once,
stack on device; rebuild descriptor stacks only when frame MEMBERSHIP
changes) must never serve stale device data: lifecycle bit flips go
through fresh mask uploads, pose corrections reassign kf.Xw (new array
identity -> new upload), and cached host arrays are retained so id()
cannot be recycled under a live cache entry."""

import numpy as np
import jax.numpy as jnp

from multimot_track_tpu.pipeline.keyframes import Keyframe, KeyframeStore


def _kf(i, n=32, seed=0):
    r = np.random.RandomState(seed + i)
    return Keyframe(
        index=i,
        Tcw=np.eye(4, dtype=np.float32),
        uv=r.rand(n, 2).astype(np.float32) * 100,
        desc=(r.randint(0, 2, (n, 256)) * 2 - 1).astype(np.int8),
        valid=np.ones(n, bool),
        Xw=r.rand(n, 3).astype(np.float32),
    )


def test_struct_version_gates_stack_rebuild():
    s = KeyframeStore(min_gap=1)
    for i in range(3):
        s.maybe_add(_kf(i))
    stack1 = s._stacked_descriptors()
    assert stack1 is not None
    # lifecycle mutation (a fuse/cull bit flip) bumps _version only:
    # the stack object must be REUSED, not rebuilt/re-uploaded
    s.frames[0].live = s.frames[0].live & False
    s._version += 1
    stack2 = s._stacked_descriptors()
    assert stack2 is stack1
    # membership change rebuilds
    s.maybe_add(_kf(3))
    stack3 = s._stacked_descriptors()
    assert stack3 is not stack1
    assert stack3[0].shape[0] == 4  # K_pad for K=4


def test_dev_cache_tracks_reassignment():
    s = KeyframeStore(min_gap=1)
    kf = _kf(0)
    d1 = s._dev(kf.Xw)
    assert s._dev(kf.Xw) is d1            # cached
    kf.Xw = kf.Xw + 1.0                   # correct_poses-style reassignment
    d2 = s._dev(kf.Xw)
    assert d2 is not d1
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1) + 1.0)


def test_local_map_sees_lifecycle_flips():
    s = KeyframeStore(min_gap=1)
    for i in range(3):
        s.maybe_add(_kf(i))
    _, _, valid1 = s.local_map(n_kf=3)
    n1 = int(jnp.sum(valid1))
    # cull every point of the newest keyframe; the local map must react
    # even though the cached device desc/Xw payloads are reused
    s.frames[-1].live = np.zeros_like(s.frames[-1].live)
    s._version += 1
    _, _, valid2 = s.local_map(n_kf=3)
    n2 = int(jnp.sum(valid2))
    assert n2 == n1 - int(s.frames[-1].valid.sum())
