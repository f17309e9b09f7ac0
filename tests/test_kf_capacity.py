"""Keyframe-store capacity: skeleton eviction preserves loop anchors.

VERDICT r4 missing #3: a FIFO store silently evicts the revisit anchor of
any loop longer than ~min_gap*capacity frames, making closure structurally
impossible; the reference's Map is unbounded (/root/reference/src/Map.cc,
include/Map.h:43-90).  `KeyframeStore._evict_skeleton` bounds memory while
keeping a coarse temporal skeleton of old keyframes, so the anchor of an
arbitrarily long loop survives.
"""

import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.pipeline import keyframes

from test_loop_closing import make_kf


def _fill(store, n, step=3):
    kfs = [make_kf(i * step, seed=i) for i in range(n)]
    for kf in kfs:
        assert store.maybe_add(kf)
    return kfs


def test_skeleton_keeps_origin_and_recent():
    store = keyframes.KeyframeStore(capacity=12, min_gap=1)
    _fill(store, 40)
    idx = [kf.index for kf in store.frames]
    assert len(store.frames) == 12
    assert idx == sorted(idx)
    # the map origin is never evicted
    assert idx[0] == 0
    # the newest quarter (live local-map window) is never evicted: the
    # tail must be the most recent consecutive captures
    tail = max(2, store.capacity // 4)
    assert idx[-tail:] == [(40 - tail + k) * 3 for k in range(tail)]
    # coverage stays roughly uniform: no gap wider than ~1/4 of the span
    gaps = np.diff(idx)
    assert gaps.max() <= (idx[-1] - idx[0]) / 4 + 1, idx


def test_loop_anchor_survives_beyond_capacity():
    """A loop spanning >> min_gap*capacity frames: FIFO eviction loses the
    anchor (detection structurally impossible); skeleton eviction keeps it
    and place recognition still returns it."""
    store = keyframes.KeyframeStore(capacity=12, min_gap=1)
    kfs = _fill(store, 40)  # span 120 frames >> 12*1
    anchor = kfs[0]
    assert any(kf is anchor for kf in store.frames)
    cand = store.detect_loop(jnp.asarray(anchor.desc), jnp.asarray(anchor.valid))
    assert cand is not None and store.frames[cand] is anchor

    # control: the same fill under FIFO eviction loses the anchor
    fifo = keyframes.KeyframeStore(capacity=12, min_gap=1)
    fifo._evict_skeleton = lambda: fifo.frames.pop(0)
    for i in range(40):
        fifo.maybe_add(make_kf(i * 3, seed=i))
    assert fifo.frames[0].index == (40 - 12) * 3
    cand = fifo.detect_loop(jnp.asarray(anchor.desc), jnp.asarray(anchor.valid))
    assert cand is None or fifo.frames[cand].index != 0


def test_eviction_bumps_versions_and_caches():
    """Mid-list eviction must invalidate the descriptor-stack cache (it is
    keyed on membership) and keep local_map serving the newest frames."""
    store = keyframes.KeyframeStore(capacity=8, min_gap=1)
    _fill(store, 8)
    stack0 = store._stacked_descriptors()
    v0 = store._struct_version
    store.maybe_add(make_kf(99, seed=99))
    assert store._struct_version > v0
    stack1 = store._stacked_descriptors()
    assert stack1 is not stack0
    Xw, desc, valid = store.local_map(n_kf=3)
    assert Xw.shape[0] == 3 * store.frames[0].Xw.shape[0]
    # newest keyframe's points are in the local map
    assert store.frames[-1].index == 99
