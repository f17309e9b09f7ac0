"""EuRoC ASL loader + lens undistortion + mono driver on an EuRoC layout.

Fixture: kitti_sample re-written in authentic EuRoC form (mav0/cam0/data
PNGs named by nanosecond stamp, data.csv, sensor.yaml with intrinsics /
distortion / T_BS, state_groundtruth_estimate0/data.csv with body poses) —
the reference's mono_euroc driver consumes hand-written timestamp lists
and a static YAML instead (Examples/Monocular/mono_euroc.cc:37-115).
"""

import numpy as np
import pytest
from PIL import Image

from multimot_track_tpu.geometry import camera as cam_g


def _rot_to_quat(R):
    t = np.trace(R)
    qw = np.sqrt(max(1 + t, 1e-12)) / 2
    qx = (R[2, 1] - R[1, 2]) / (4 * qw)
    qy = (R[0, 2] - R[2, 0]) / (4 * qw)
    qz = (R[1, 0] - R[0, 1]) / (4 * qw)
    return qw, qx, qy, qz


def build_euroc_fixture(src, dst, dist=(0.0, 0.0, 0.0, 0.0)):
    """kitti_sample -> EuRoC ASL layout. T_BS is a nontrivial rigid offset
    so the GT bridging (T_WC = T_WB @ T_BS) is actually exercised."""
    import pathlib

    src = pathlib.Path(src)
    cam = pathlib.Path(dst) / "mav0" / "cam0"
    gtd = pathlib.Path(dst) / "mav0" / "state_groundtruth_estimate0"
    (cam / "data").mkdir(parents=True)
    gtd.mkdir(parents=True)

    poses = {}
    for line in (src / "pose_gt.txt").read_text().splitlines():
        p = line.split()
        if p:
            poses[int(float(p[0]))] = np.asarray(
                [float(x) for x in p[1:]], np.float32
            ).reshape(4, 4)

    # body<-camera extrinsic: 90deg yaw + offset
    T_BS = np.eye(4, dtype=np.float32)
    T_BS[:3, :3] = np.asarray([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    T_BS[:3, 3] = (0.1, -0.02, 0.03)

    cam_rows = ["#timestamp [ns],filename"]
    gt_rows = ["#timestamp, p_RS_R_x [m], ..."]
    for i in range(5):
        ns = 1403636579763555584 + i * 50_000_000
        img = np.asarray(Image.open(src / "image" / f"{i:06d}.png"))
        if img.ndim == 3:
            img = (img @ np.asarray([0.299, 0.587, 0.114])).astype(np.uint8)
        Image.fromarray(img).save(cam / "data" / f"{ns}.png")
        cam_rows.append(f"{ns},{ns}.png")
        T_WC = poses[i]
        T_WB = T_WC @ np.linalg.inv(T_BS)  # so that T_WB @ T_BS == T_WC
        qw, qx, qy, qz = _rot_to_quat(T_WB[:3, :3])
        # GT clock offset 3 ms: exercises nearest association
        gt_rows.append(
            f"{ns + 3_000_000},{T_WB[0, 3]},{T_WB[1, 3]},{T_WB[2, 3]},"
            f"{qw},{qx},{qy},{qz},0,0,0,0,0,0,0,0,0"
        )
    (cam / "data.csv").write_text("\n".join(cam_rows) + "\n")
    (gtd / "data.csv").write_text("\n".join(gt_rows) + "\n")

    k1, k2, p1, p2 = dist
    (cam / "sensor.yaml").write_text(
        "sensor_type: camera\n"
        "rate_hz: 20\n"
        "T_BS:\n"
        "  cols: 4\n  rows: 4\n"
        "  data: ["
        + ", ".join(str(float(v)) for v in T_BS.reshape(-1))
        + "]\n"
        "camera_model: pinhole\n"
        "intrinsics: [721.5377, 721.5377, 609.5593, 172.854]\n"
        "distortion_model: radial-tangential\n"
        f"distortion_coefficients: [{k1}, {k2}, {p1}, {p2}]\n"
    )
    return T_BS


def test_euroc_loader(kitti_sample_dir, tmp_path):
    from multimot_track_tpu.io.euroc import EurocSequence
    from multimot_track_tpu.io.kitti import KittiSequence

    T_BS = build_euroc_fixture(kitti_sample_dir, tmp_path)
    seq = EurocSequence(tmp_path)
    assert len(seq) == 5
    np.testing.assert_allclose(seq.T_BS, T_BS, atol=1e-6)

    cfg = seq.camera_config()
    assert cfg.fx == pytest.approx(721.5377)
    assert cfg.fps == 20.0
    assert not cfg.has_distortion

    ref = KittiSequence(kitti_sample_dir)
    for i in (0, 4):
        fd = seq.load_frame(i)
        rd = ref.load_frame(i)
        assert fd.gray.shape == rd.gray.shape
        assert fd.pose_gt is not None
        # T_WB @ T_BS must reproduce the original camera-to-world pose
        np.testing.assert_allclose(fd.pose_gt, rd.pose_gt, atol=1e-4)
    assert abs(seq.load_frame(1).timestamp - seq.load_frame(0).timestamp - 0.05) < 1e-9


def test_undistort_points_roundtrip():
    import jax.numpy as jnp

    fx, fy, cx, cy = 458.654, 457.296, 367.215, 248.375
    k = (-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05)
    rng = np.random.default_rng(0)
    uv_true = rng.uniform([40, 40], [712, 440], (500, 2)).astype(np.float32)
    xy = jnp.stack([(uv_true[:, 0] - cx) / fx, (uv_true[:, 1] - cy) / fy], -1)
    xyd = cam_g.distort_normalized(xy, *k)
    uv_d = jnp.stack([xyd[:, 0] * fx + cx, xyd[:, 1] * fy + cy], -1)
    uv_rec = cam_g.undistort_points(uv_d, fx, fy, cx, cy, *k)
    assert float(jnp.abs(uv_rec - uv_true).max()) < 0.01  # px

    # zero coefficients = identity
    uv_id = cam_g.undistort_points(uv_true, fx, fy, cx, cy, 0.0, 0.0, 0.0, 0.0)
    assert float(jnp.abs(uv_id - uv_true).max()) < 1e-3


@pytest.mark.slow
def test_mono_euroc_cli(kitti_sample_dir, tmp_path, capsys):
    """End-to-end: cli --euroc initializes and reports Sim3 ATE."""
    import json

    from multimot_track_tpu import cli

    build_euroc_fixture(kitti_sample_dir, tmp_path / "seq")
    out = tmp_path / "out"
    rc = cli.main([str(tmp_path / "seq"), "--euroc", "--cpu", "--out", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    assert (out / "mono_trajectory.txt").exists()
    summary = json.loads(text[text.index("summary:") + len("summary:"):])
    assert summary["initialized"] is True
    assert summary["ego_ate_sim3_rmse_m"] < 0.6  # up-to-scale, 5 frames, ~4.9 m path


def test_mono_frontend_undistorts_when_configured(kitti_sample_dir, tmp_path):
    """With nonzero distortion in sensor.yaml the mono frontend returns
    undistorted keypoint coordinates (reference mvKeys/mvKeysUn split)."""
    import dataclasses

    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io.euroc import EurocSequence
    from multimot_track_tpu.pipeline.mono import MonoTracker

    build_euroc_fixture(
        kitti_sample_dir, tmp_path, dist=(-0.28, 0.07, 0.0, 0.0)
    )
    seq = EurocSequence(tmp_path)
    cfg = seq.camera_config()
    assert cfg.has_distortion
    gray = seq.load_frame(0).gray

    tr_dist = MonoTracker(dataclasses.replace(DEFAULT_CONFIG, camera=cfg), n_kp=256)
    tr_pin = MonoTracker(
        dataclasses.replace(
            DEFAULT_CONFIG,
            camera=dataclasses.replace(cfg, k1=0.0, k2=0.0, p1=0.0, p2=0.0),
        ),
        n_kp=256,
    )
    uv_d, _, valid = tr_dist._frontend(gray)
    uv_p, _, _ = tr_pin._frontend(gray)
    # identical detections, shifted coordinates; shift grows off-center
    d = np.linalg.norm(uv_d - uv_p, axis=1)[valid]
    r = np.linalg.norm(uv_p[valid] - [cfg.cx, cfg.cy], axis=1)
    assert d.max() > 1.0                      # strong lens: real shifts
    assert d[np.argmin(r)] < d[np.argmax(r)]  # monotone-ish with radius
