from multimot_track_tpu.ops import matching  # noqa: F401
