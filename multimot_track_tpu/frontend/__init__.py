from multimot_track_tpu.frontend import fast, sampling  # noqa: F401
