from multimot_track_tpu.utils import profiling  # noqa: F401
