"""BoW vocabulary training + retrieval (KeyFrameDatabase-at-scale role)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.ops import bow

RNG = np.random.default_rng(71)


def make_scene_descriptors(n_scenes=6, per_scene=128, flip=0.05):
    """Each 'scene' is a prototype set of descriptors; observations are
    noisy copies (bit flips)."""
    protos = [RNG.choice([-1, 1], size=(per_scene, 256)).astype(np.int8) for _ in range(n_scenes)]

    def observe(k):
        d = protos[k].copy()
        mask = RNG.random(d.shape) < flip
        d[mask] *= -1
        return d

    return protos, observe


def test_vocab_and_retrieval():
    protos, observe = make_scene_descriptors()
    train = np.concatenate([observe(k) for k in range(6)])
    voc = bow.train_vocabulary(
        jax.random.PRNGKey(0), jnp.asarray(train), jnp.ones(len(train), bool)
    )
    valid = jnp.ones(128, bool)
    db = jnp.stack([bow.signature(voc, jnp.asarray(observe(k)), valid) for k in range(6)])
    # query each scene with a fresh noisy observation: argmax must match
    hits = 0
    for k in range(6):
        q = bow.signature(voc, jnp.asarray(observe(k)), valid)
        scores = np.asarray(bow.retrieve(q, db))
        hits += int(scores.argmax() == k)
    assert hits >= 5, hits


def test_signature_normalised():
    desc = jnp.asarray(RNG.choice([-1, 1], size=(64, 256)).astype(np.int8))
    voc = bow.train_vocabulary(jax.random.PRNGKey(1), desc, jnp.ones(64, bool), n_words=32)
    s = bow.signature(voc, desc, jnp.ones(64, bool))
    assert abs(float(jnp.linalg.norm(s)) - 1.0) < 1e-5
