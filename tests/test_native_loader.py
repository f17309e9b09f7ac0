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
