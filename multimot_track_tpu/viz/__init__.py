from multimot_track_tpu.viz import render  # noqa: F401
