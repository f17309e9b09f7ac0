"""Evaluation-formula tests vs hand-computed values (parity-critical)."""

import jax.numpy as jnp
import numpy as np

from multimot_track_tpu.eval import metrics
from multimot_track_tpu.geometry import se3


def test_camera_rpe_zero_when_exact():
    T_rel = np.asarray(se3.exp_se3(jnp.asarray([0.01, 0.0, 0.0, 0.2, 0.0, 1.0], jnp.float32)))
    Tcw_last = np.eye(4, dtype=np.float32)
    Tcw_cur = (T_rel @ Tcw_last).astype(np.float32)
    r = metrics.camera_rpe(
        jnp.asarray(Tcw_cur), jnp.asarray(Tcw_last),
        jnp.asarray(Tcw_cur), jnp.asarray(Tcw_last),
    )
    assert float(r.t_abs) < 1e-6
    assert float(r.r_abs) < 1e-3


def test_camera_rpe_known_offset():
    # estimated relative motion off by exactly 10 cm in z, gt |t| = 2 m
    Tcw_last = np.eye(4, dtype=np.float32)
    T_gt = np.eye(4, dtype=np.float32); T_gt[2, 3] = 2.0
    T_est = np.eye(4, dtype=np.float32); T_est[2, 3] = 2.1
    r = metrics.camera_rpe(
        jnp.asarray(T_est), jnp.asarray(Tcw_last),
        jnp.asarray(T_gt), jnp.asarray(Tcw_last),
    )
    assert abs(float(r.t_abs) - 0.1) < 1e-5
    assert abs(float(r.t_rel) - 0.05) < 1e-5   # 0.1 / 2.0


def test_object_speed_translation_only():
    # pure translation: speed = |t| regardless of centroid
    H = np.eye(4, dtype=np.float32); H[0, 3] = 1.5
    m = metrics.object_motion_error(
        jnp.asarray(H), jnp.asarray(H),
        jnp.asarray([5.0, 0.0, 10.0]),
        jnp.asarray([0.0, 0.0, 10.0]), jnp.asarray([1.5, 0.0, 10.0]),
    )
    assert abs(float(m.speed_est) - 1.5 * 36.0) < 1e-3   # km/h at 10 Hz
    assert abs(float(m.speed_gt) - 1.5 * 36.0) < 1e-3
    assert float(m.t_abs) < 1e-6


def test_object_speed_rotation_term():
    # rotating motion: speed uses t - (I - R) c_pre (Tracking.cc:2186)
    th = 0.1
    H = np.eye(4, dtype=np.float32)
    H[:3, :3] = np.asarray(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
    )
    c = np.asarray([3.0, 0.0, 8.0], np.float32)
    expect = H[:3, 3] - (np.eye(3) - H[:3, :3]) @ c
    m = metrics.object_motion_error(
        jnp.asarray(H), jnp.asarray(H), jnp.asarray(c),
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 0.0]),
    )
    assert abs(float(m.speed_est) - np.linalg.norm(expect) * 36.0) < 1e-3


def test_seg_confusion():
    pred = jnp.asarray([1, 1, 0, 0, -1, 2, -2, 0])
    sem = jnp.asarray([1, 2, 1, 0, 1, 2, 1, 0])
    gt_dyn = jnp.asarray([1, 0])
    gt_valid = jnp.asarray([True, False])
    valid = jnp.asarray([True] * 7 + [False])
    c = metrics.segmentation_confusion(pred, sem, gt_dyn, gt_valid, valid)
    # GT-dynamic = sem==1 & valid: indices 0,2,4,6 -> tot 4
    assert int(c.tot) == 4
    # predicted dynamic but not GT-dynamic: indices 1,5 -> fp 2
    assert int(c.fp) == 2
    # predicted static but GT-dynamic: index 2 -> fn 1
    assert int(c.fn) == 1
    # undetected GT-dynamic: indices 4 (-1), 6 (-2) -> nd 2
    assert int(c.nd) == 2


def test_flow_histogram_bins():
    err = jnp.asarray([0.1, 0.6, 9.5, 20.0])
    h = np.asarray(metrics.flow_error_histogram(err, jnp.ones(4, bool)))
    assert h[0] == 1    # [0, 0.5)
    assert h[1] == 1    # [0.5, 1.0)
    assert h[18] == 1   # [9, 10)
    assert h[19] == 1   # [10, inf)
    assert h.sum() == 4


def test_ate_zero_for_identical():
    import numpy as np
    from multimot_track_tpu.eval.metrics import absolute_trajectory_error
    T = np.stack([np.eye(4, dtype=np.float32) for _ in range(5)])
    for i in range(5):
        T[i][2, 3] = i * 1.0
    rmse, err = absolute_trajectory_error(jnp.asarray(T), jnp.asarray(T))
    assert float(rmse) < 1e-5


def test_ate_alignment_removes_global_offset():
    import numpy as np
    from multimot_track_tpu.eval.metrics import absolute_trajectory_error
    from multimot_track_tpu.geometry import se3 as s3
    gt = np.stack([np.eye(4, dtype=np.float32) for _ in range(6)])
    for i in range(6):
        gt[i][0, 3] = 0.5 * i
    G = np.asarray(s3.exp_se3(jnp.asarray([0.1, 0.2, -0.1, 3.0, 1.0, -2.0], jnp.float32)))
    est = np.einsum("ij,njk->nik", G, gt)
    rmse, _ = absolute_trajectory_error(jnp.asarray(est), jnp.asarray(gt))
    assert float(rmse) < 1e-3  # pure rigid offset must vanish under alignment
