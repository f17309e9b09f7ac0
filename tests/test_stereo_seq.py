"""Stereo sequence adapter: synthetic image_2/image_3 pair -> RGB-D pipeline."""

import numpy as np
import pytest
from PIL import Image

from multimot_track_tpu.config import CameraConfig
from multimot_track_tpu.io.stereo_seq import StereoKittiSequence

CAM = CameraConfig()


@pytest.fixture
def stereo_dir(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 96, 320
    (tmp_path / "image_2").mkdir()
    (tmp_path / "image_3").mkdir()
    # textured scene at constant disparity 8 (depth = bf/8)
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    k = np.ones(3) / 3
    for ax in (0, 1):
        base = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), ax, base)
    left = base.astype(np.uint8)
    right = np.roll(base, -8, axis=1).astype(np.uint8)
    for i in range(2):
        Image.fromarray(left).save(tmp_path / "image_2" / f"{i:06d}.png")
        Image.fromarray(right).save(tmp_path / "image_3" / f"{i:06d}.png")
    return tmp_path


def test_stereo_sequence_produces_depth(stereo_dir):
    seq = StereoKittiSequence(stereo_dir, max_disp=32)
    assert len(seq) == 2
    fd = seq.load_frame(0)
    assert fd.gray.shape == (96, 320)
    # disparity*256 encoding: interior pixels near 8*256
    enc = fd.depth_raw[20:-20, 40:-40]
    valid = enc[enc > 0]
    assert valid.size > 0.5 * enc.size
    assert abs(np.median(valid) / 256.0 - 8.0) < 1.0
    # flows/masks/poses default cleanly when absent
    assert fd.flow.shape == (96, 320, 2)
    assert fd.sem_mask.max() == 0
    np.testing.assert_allclose(fd.pose_gt, np.eye(4))
