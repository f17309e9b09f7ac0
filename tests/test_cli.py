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
