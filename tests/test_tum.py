"""TUM RGB-D loader: association, depth bridging, GT quaternions, tracking.

Fixture: kitti_sample re-written in authentic TUM layout (rgb.txt /
depth.txt on *offset clocks* to exercise association, metric uint16 depth,
quaternion groundtruth.txt) — no flow, no masks, like a real TUM download.
"""

import numpy as np
import pytest
from PIL import Image

from multimot_track_tpu.geometry import se3

BF = 387.5744


def build_tum_fixture(src, dst):
    """Write a 5-frame TUM-format sequence derived from kitti_sample
    (shared with the CLI end-to-end test)."""
    import pathlib

    src = pathlib.Path(src)
    dst = pathlib.Path(dst)
    (dst / "rgb").mkdir(parents=True)
    (dst / "depth").mkdir()

    poses = {}
    for line in (src / "pose_gt.txt").read_text().splitlines():
        p = line.split()
        if p:
            poses[int(float(p[0]))] = np.asarray([float(x) for x in p[1:]], np.float32).reshape(4, 4)

    rgb_rows, dep_rows, gt_rows = [], [], []
    for i in range(5):
        t = 1305031102.0 + 0.1 * i
        img = np.asarray(Image.open(src / "image" / f"{i:06d}.png"))
        Image.fromarray(img).save(dst / "rgb" / f"{t:.6f}.png")
        rgb_rows.append(f"{t:.6f} rgb/{t:.6f}.png")
        # kitti disparity png -> metric z -> TUM-style uint16 (factor 500)
        dpng = np.asarray(Image.open(src / "depth" / f"{i:06d}.png")).astype(np.float64)
        z = np.where(dpng > 0, BF / np.maximum(dpng / 256.0, 1e-9), 0.0)
        tum16 = np.clip(z * 500.0, 0, 65535).astype(np.uint16)
        td = t + 0.007  # depth clock offset: exercises nearest association
        Image.fromarray(tum16).save(dst / "depth" / f"{td:.6f}.png")
        dep_rows.append(f"{td:.6f} depth/{td:.6f}.png")
        # pose -> TUM quaternion row (camera-to-world)
        T = poses[i]
        q = _rot_to_quat(T[:3, :3])
        tg = t - 0.004
        gt_rows.append(
            f"{tg:.6f} {T[0,3]} {T[1,3]} {T[2,3]} {q[0]} {q[1]} {q[2]} {q[3]}"
        )
    (dst / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_rows) + "\n")
    (dst / "depth.txt").write_text("# depth\n" + "\n".join(dep_rows) + "\n")
    (dst / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_rows) + "\n")
    return dst


@pytest.fixture(scope="module")
def tum_dir(tmp_path_factory, kitti_sample_dir):
    return build_tum_fixture(kitti_sample_dir, tmp_path_factory.mktemp("tum_seq"))


def _rot_to_quat(R):
    """R -> (qx, qy, qz, qw)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = [0.0, 0.0, 0.0, 0.0]
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        qx, qy, qz, qw = q
    return qx, qy, qz, qw


def test_loader_association_and_depth(tum_dir, kitti_sample_dir):
    from multimot_track_tpu.io.tum import TumRGBDSequence
    from multimot_track_tpu.io.kitti import KittiSequence

    seq = TumRGBDSequence(tum_dir, bf=BF, depth_map_factor=500.0,
                          estimate_flow=False)
    ref = KittiSequence(kitti_sample_dir, estimate_flow=False)
    assert len(seq) == 5
    fd = seq.load_frame(0)
    rf = ref.load_frame(0)
    assert fd.gray.shape == rf.gray.shape
    # depth bridge: equivalent-disparity png must reproduce the kitti
    # disparity values where depth is valid (quantisation of the uint16
    # round-trip bounds the error)
    valid = (rf.depth_raw > 256) & (fd.depth_raw > 0)   # disparity > 1 px
    rel = np.abs(fd.depth_raw[valid] - rf.depth_raw[valid]) / rf.depth_raw[valid]
    assert np.median(rel) < 0.01
    # GT pose: quaternion round trip vs the 4x4 on disk
    assert np.allclose(fd.pose_gt, rf.pose_gt, atol=1e-5)


def test_tum_ego_tracking(tum_dir):
    """Full system on the TUM-format sequence: flow estimated on device,
    no masks, objects discovered — the self-contained path the reference
    lacks (its driver aborts without .flo and semantic/)."""
    import dataclasses

    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io.tum import TumRGBDSequence
    from multimot_track_tpu.pipeline.system import MultiMotSystem

    seq = TumRGBDSequence(tum_dir, bf=BF, depth_map_factor=500.0)
    cam = dataclasses.replace(
        DEFAULT_CONFIG.camera, bf=BF  # fixture images are kitti intrinsics
    )
    cfg = dataclasses.replace(DEFAULT_CONFIG, camera=cam)
    sys_ = MultiMotSystem(cfg, discover_objects=True)
    for i in range(3):
        sys_.track_rgbd(seq.load_frame(i))
    s = sys_.summary()
    assert s["n_frames"] == 3
    # estimated flow is coarser than the bundled .flo; require sane ego
    assert s["cam_t_rpe_rel_mean"] < 0.15, s
    assert np.isfinite(s["ego_ate_rmse_m"])
    assert seq.n_flow_estimated >= 2
