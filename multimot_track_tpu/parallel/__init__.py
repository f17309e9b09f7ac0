from multimot_track_tpu.parallel import (  # noqa: F401
    mesh,
    pairwise,
    dist_ba,
    dist_window_ba,
)
