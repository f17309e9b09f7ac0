"""Mask-free tracking: no semantic/ directory at all — instance masks are
synthesized from motion segmentation inside the live system
(pipeline/motion_seg + MultiMotSystem(discover_objects=True)).

The reference driver aborts without mask files (rgbd_tum.cc:316); its
dormant gco path was meant to lift that requirement (SURVEY.md §2.1)."""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.kitti import KittiSequence
from multimot_track_tpu.pipeline.system import MultiMotSystem


@pytest.fixture(scope="module")
def maskless_dir(tmp_path_factory, kitti_sample_dir):
    import pathlib

    src = pathlib.Path(kitti_sample_dir)
    dst = tmp_path_factory.mktemp("seq") / "nomask"
    dst.mkdir()
    for d in ("image", "depth", "flow"):
        (dst / d).symlink_to(src / d)
    for f in ("pose_gt.txt", "object_pose.txt", "times.txt"):
        (dst / f).symlink_to(src / f)
    return dst


@pytest.mark.slow
def test_maskless_tracking_finds_the_van(maskless_dir):
    cfg = DEFAULT_CONFIG.replace(
        backend=dataclasses.replace(DEFAULT_CONFIG.backend, window_refine=False)
    )
    seq = KittiSequence(maskless_dir)
    s = MultiMotSystem(cfg, discover_objects=True)
    for i in range(len(seq)):
        s.track_rgbd(seq.load_frame(i))
    # ego stays tracked without any masks
    cam = np.asarray(s.map.cam_rpe_rel)[:, 0]
    assert np.mean(cam) < 0.10, cam
    # the moving van is discovered, tracked with one persistent identity,
    # and its speed estimate is in the right range
    recs = [o for o in s.map.obj_records if o.has_gt]
    assert len(recs) >= 2, s.map.obj_records
    assert len({o.track_id for o in recs}) == 1
    for o in recs:
        assert abs(o.speed_est - o.speed_gt) < 10.0, (o.speed_est, o.speed_gt)
