"""Learn the rBRIEF pattern on kitti_sample patches and A/B it against the
random-Gaussian pattern (VERDICT r2 #9).

Metric: descriptor matching between consecutive frames, judged by the
dataset's GT dense flow — a match is CORRECT when the matched position
lands within 3 px of the flow-displaced keypoint.  Writes
multimot_track_tpu/frontend/brief_pattern_learned.npy when the learned
pattern wins on both precision and correct-match count.

Run on CPU: python tools/learn_brief.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.frontend import fast, orb
from multimot_track_tpu.io.native_loader import get_sequence
from multimot_track_tpu.ops import matching


def match_quality(frames, pattern=None, n_kp=1024, tol=3.0):
    """(precision, n_correct) over all consecutive pairs."""
    correct = total = 0
    for f0, f1 in zip(frames[:-1], frames[1:]):
        g0, g1 = jnp.asarray(f0.gray), jnp.asarray(f1.gray)
        kp0 = fast.detect_pyramid(g0, n_levels=4, n_total=n_kp)
        kp1 = fast.detect_pyramid(g1, n_levels=4, n_total=n_kp)
        b0, b1 = orb.gaussian_blur(g0), orb.gaussian_blur(g1)
        a0 = orb.compute_orientations(b0, kp0.uv)
        a1 = orb.compute_orientations(b1, kp1.uv)
        d0 = orb.brief_descriptors(b0, kp0.uv, a0, pattern=pattern)
        d1 = orb.brief_descriptors(b1, kp1.uv, a1, pattern=pattern)
        res = matching.match_descriptors(d0, d1, kp0.valid, kp1.valid)
        uv0 = np.asarray(kp0.uv)
        uv1m = np.asarray(kp1.uv)[np.asarray(res.idx)]
        ok = np.asarray(res.valid)
        # GT correspondence from the dataset flow at the keypoint
        xi = np.clip(np.round(uv0[:, 0]).astype(int), 0, f0.flow.shape[1] - 1)
        yi = np.clip(np.round(uv0[:, 1]).astype(int), 0, f0.flow.shape[0] - 1)
        uv_gt = uv0 + f0.flow[yi, xi]
        err = np.linalg.norm(uv1m - uv_gt, axis=1)
        correct += int((ok & (err < tol)).sum())
        total += int(ok.sum())
    return correct / max(total, 1), correct


def main():
    seq = get_sequence("/root/reference/kitti_sample")
    frames = [seq.load_frame(i) for i in range(len(seq))]
    grays = [f.gray for f in frames]

    rand_pat = orb._random_pairs(1234, orb.N_BITS)
    p_rand, n_rand = match_quality(frames, pattern=rand_pat)
    print(f"random pattern : precision {p_rand:.4f}  correct {n_rand}")

    learned = orb.learn_brief_pattern(grays)
    p_l, n_l = match_quality(frames, pattern=learned)
    print(f"learned pattern: precision {p_l:.4f}  correct {n_l}")

    out = pathlib.Path(orb.__file__).with_name("brief_pattern_learned.npy")
    if p_l >= p_rand and n_l >= n_rand:
        np.save(out, learned.astype(np.float32))
        print(f"ADOPTED -> {out}")
    else:
        print("learned pattern did NOT win; keeping the random table")


if __name__ == "__main__":
    main()
