from multimot_track_tpu.parallel import mesh, pairwise, dist_ba  # noqa: F401
