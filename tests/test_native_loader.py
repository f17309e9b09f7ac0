import numpy as np
import pytest

from multimot_track_tpu.io import native_loader
from multimot_track_tpu.io.kitti import KittiSequence


@pytest.fixture(scope="module")
def native_seq(kitti_sample_dir):
    if not native_loader.build_native():
        pytest.skip("native loader build unavailable")
    seq = native_loader.NativeKittiSequence(kitti_sample_dir)
    yield seq
    seq.close()


def test_native_matches_python(native_seq, kitti_sample_dir):
    py = KittiSequence(kitti_sample_dir)
    for i in (0, 2):
        a = native_seq.load_frame(i)
        b = py.load_frame(i)
        np.testing.assert_allclose(a.gray, b.gray, atol=0.51)
        np.testing.assert_array_equal(a.depth_raw, b.depth_raw)
        np.testing.assert_array_equal(a.flow, b.flow)
        np.testing.assert_array_equal(a.sem_mask, b.sem_mask)
        np.testing.assert_array_equal(a.obj_ids_gt, b.obj_ids_gt)


def test_get_sequence_fallback(kitti_sample_dir):
    seq = native_loader.get_sequence(kitti_sample_dir)
    assert len(seq) == 5
    fr = seq.load_frame(0)
    assert fr.gray.shape == (375, 1242)
    if hasattr(seq, "close"):
        seq.close()


def test_native_estimates_missing_flow(tmp_path, kitti_sample_dir):
    """A flow-less sequence through the NATIVE loader must estimate flow
    on device like the Python loader (the C path zero-fills missing .flo,
    which silently killed every correspondence in the CLI — regression)."""
    from multimot_track_tpu.io.synth import build

    dst = tmp_path / "noflo"
    build(kitti_sample_dir, dst, order=[0, 1, 2])
    seq = native_loader.get_sequence(dst)
    fd = seq.load_frame(0)
    assert np.abs(fd.flow).max() > 1.0, "flow was not estimated"
    ref = KittiSequence(dst).load_frame(0)
    # native C gray differs from the PIL path at float-rounding level;
    # in ambiguous (textureless/occluded) regions that flips the block
    # match — ~0.5% of pixels.  Everywhere else the flows agree.
    d = np.abs(fd.flow - ref.flow).max(axis=-1)
    assert (d < 0.1).mean() > 0.99, (d < 0.1).mean()
    # last frame has no successor: zeros, like the Python loader
    assert np.abs(seq.load_frame(2).flow).max() == 0.0
