from multimot_track_tpu.io import flowio, kitti  # noqa: F401
