from multimot_track_tpu.solvers import flow_ba, ransac  # noqa: F401
