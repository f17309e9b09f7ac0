"""Place recognition at DBoW2 scale: the store dispatches retrieval to
the BoW two-stage path above ``bow_threshold`` keyframes
(KeyFrameDatabase::DetectLoopCandidates over an inverted index,
src/KeyFrameDatabase.cc; ops/bow is the dense-tensor counterpart)."""

import time

import numpy as np
import pytest

from multimot_track_tpu.pipeline.keyframes import Keyframe, KeyframeStore

N_KP = 256
RNG = np.random.default_rng(11)


def _kf(index, desc):
    return Keyframe(
        index=index,
        Tcw=np.eye(4, dtype=np.float32),
        uv=RNG.uniform(0, 400, (N_KP, 2)).astype(np.float32),
        desc=desc,
        valid=np.ones(N_KP, bool),
        Xw=RNG.normal(size=(N_KP, 3)).astype(np.float32),
    )


def _desc():
    return np.where(RNG.random((N_KP, 256)) < 0.5, 1, -1).astype(np.int8)


@pytest.mark.slow
def test_bow_retrieval_at_500_keyframes():
    import jax.numpy as jnp

    store = KeyframeStore(capacity=1024, min_gap=1)
    target_idx = 137
    descs = [_desc() for _ in range(520)]
    for i, d in enumerate(descs):
        store.maybe_add(_kf(i, d))
    assert len(store.frames) == 520
    assert len(store.frames) > store.bow_threshold

    # query = noisy revisit of keyframe 137 (10% descriptor bits flipped)
    q = descs[target_idx].copy()
    flip = RNG.random(q.shape) < 0.05
    q = np.where(flip, -q, q).astype(np.int8)

    t0 = time.perf_counter()
    scores = store.similarity_scores(
        jnp.asarray(q), jnp.asarray(np.ones(N_KP, bool)), exclude_last=2
    )
    dt = time.perf_counter() - t0

    assert scores.shape[0] == 518
    assert int(np.argmax(scores)) == target_idx
    assert scores[target_idx] > 100          # exact match-count confirms
    # two-stage: exact scoring ran only on the shortlist
    assert (scores > 0).sum() <= store.bow_shortlist
    # and the whole query is sub-second even on CPU (520 exact matmuls
    # would be two orders slower) — generous bound for CI noise
    assert dt < 30.0, dt

    # detect_loop consumes the same path
    cand = store.detect_loop(jnp.asarray(q), jnp.asarray(np.ones(N_KP, bool)),
                             min_matches=40)
    assert cand == target_idx
