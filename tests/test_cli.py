"""CLI smoke test — the rgbd_mmt-equivalent user surface."""

import json
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_cli_end_to_end(kitti_sample_dir, tmp_path):
    out = tmp_path / "out"
    r = subprocess.run(
        [
            sys.executable, "-m", "multimot_track_tpu.cli",
            str(kitti_sample_dir), "--cpu", "--frames", "3",
            "--out", str(out), "--viz",
        ],
        capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "cam RPE" in r.stdout
    assert "obj label=" in r.stdout
    assert (out / "camera_pose.txt").exists()
    assert (out / "object_motion.txt").exists()
    assert (out / "traj.png").exists()
    # summary json parses
    summary = r.stdout.split("summary:", 1)[1].rsplit("results written", 1)[0]
    s = json.loads(summary)
    assert s["n_frames"] == 3


@pytest.mark.slow
def test_cli_mono(kitti_sample_dir, tmp_path):
    """--mono drives MonoTracker end-to-end (mono_kitti driver role)."""
    out = tmp_path / "mono"
    r = subprocess.run(
        [
            sys.executable, "-m", "multimot_track_tpu.cli",
            str(kitti_sample_dir), "--mono", "--cpu", "--out", str(out),
        ],
        capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[track]" in r.stdout
    assert (out / "mono_trajectory.txt").exists()
    s = json.loads(r.stdout.split("summary:", 1)[1])
    assert s["initialized"] is True
    # up-to-scale trajectory lands within decimetres of GT over ~5 m
    assert s["ego_ate_sim3_rmse_m"] < 0.3


@pytest.mark.slow
def test_cli_stereo_images_only(tmp_path):
    """--stereo on an images-only sequence (no depth/, no flow/, no
    semantic/): dense disparity + estimated flow on device, mask-free.
    The stereo CLI path had no end-to-end coverage before."""
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    H, W = 96, 320
    (tmp_path / "image_2").mkdir()
    (tmp_path / "image_3").mkdir()
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    k = np.ones(3) / 3
    for ax in (0, 1):
        base = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), ax, base)
    for i in range(3):
        left = np.roll(base, 2 * i, axis=1).astype(np.uint8)   # ego slide
        right = np.roll(left, -8, axis=1)
        Image.fromarray(left).save(tmp_path / "image_2" / f"{i:06d}.png")
        Image.fromarray(right).save(tmp_path / "image_3" / f"{i:06d}.png")
    r = subprocess.run(
        [
            sys.executable, "-m", "multimot_track_tpu.cli",
            str(tmp_path), "--cpu", "--stereo", "--discover-objects",
            "--quad-stereo", "--frames", "3",
        ],
        capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"n_frames": 3' in r.stdout
    # the quad gate ran and verified correspondences in all four views
    s = json.loads(r.stdout.split("summary:", 1)[1])
    assert s["n_quad_matched"] > 0, s


@pytest.mark.slow
def test_cli_tum(kitti_sample_dir, tmp_path):
    """--tum drives a TUM-format download end to end (the reference's
    rgbd_tum driver cannot read these at all)."""
    from test_tum import build_tum_fixture

    seq = build_tum_fixture(kitti_sample_dir, tmp_path / "tum")
    r = subprocess.run(
        [
            sys.executable, "-m", "multimot_track_tpu.cli",
            str(seq), "--cpu", "--tum", "--frames", "3",
        ],
        capture_output=True, text=True, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"n_frames": 3' in r.stdout
