from multimot_track_tpu.pipeline import frames, tracker, system  # noqa: F401
