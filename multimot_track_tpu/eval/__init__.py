from multimot_track_tpu.eval import metrics  # noqa: F401
