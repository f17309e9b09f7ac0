"""k_obj_solve demotion path under dense traffic (VERDICT r4 weak #4).

The default solve batch caps the per-frame vmapped object ensemble at
``k_obj_solve`` labels; with more concurrent movers the beyond-top-K
labels are demoted to inactive for that frame (tracker.py
``active &= solved``).  The reference solves every detected object
(src/Tracking.cc:1658-2253), so the cap must degrade GRACEFULLY: demoted
movers produce no record that frame (a coverage gap) but re-acquire under
the SAME semantic label, and the ego solve is untouched.

Fixture: io/synth.make_junction_frames — 8 distinct-label movers, >=6
concurrently visible nearly every frame.  tools/measure_kobj_ab.py runs
the same A/B at full scale and publishes KOBJ_AB.json.
"""

import dataclasses

import numpy as np
import pytest

from multimot_track_tpu.config import DEFAULT_CONFIG
from multimot_track_tpu.io.synth import (
    SYNTH_CAM, make_junction_frames, synth_camera_config,
)
from multimot_track_tpu.pipeline.system import MultiMotSystem

CFG = dataclasses.replace(
    DEFAULT_CONFIG,
    camera=synth_camera_config(),
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=4096,
        k_obj_max=8,
    ),
    solver=dataclasses.replace(
        DEFAULT_CONFIG.solver, ransac_iters=200, cam_lm_iters=60,
        obj_lm_iters=100,
    ),
)


@pytest.fixture(scope="module")
def junction():
    return make_junction_frames(n_frames=30, cam=dict(SYNTH_CAM))


def _run(frames, k_solve):
    cfg = dataclasses.replace(
        CFG, padding=dataclasses.replace(CFG.padding, k_obj_solve=k_solve)
    )
    sys_ = MultiMotSystem(cfg)
    for fd in frames:
        sys_.track_rgbd(fd)
    return sys_


@pytest.fixture(scope="module")
def run_k4(junction):
    return _run(junction, 4)


@pytest.fixture(scope="module")
def run_k8(junction):
    return _run(junction, 8)


def _by_label(sys_):
    by = {}
    for r in sys_.map.obj_records:
        if r.has_gt:
            by.setdefault(int(r.sem_label), []).append(r)
    return by


@pytest.mark.slow
def test_full_batch_tracks_dense_traffic(run_k8):
    """k_obj_solve=8 on 8 concurrent movers: at least 6 distinct labels
    produce sustained, accurate estimates."""
    by = _by_label(run_k8)
    sustained = [l for l, rs in by.items() if len(rs) >= 5]
    assert len(sustained) >= 6, sorted((l, len(rs)) for l, rs in by.items())
    med = np.nanmedian(
        [r.t_rpe_centred for l in sustained for r in by[l]]
    )
    assert med < 0.30, med


@pytest.mark.slow
def test_demotion_is_graceful(run_k4, run_k8, junction):
    """k_obj_solve=4 under 6+ concurrent movers: the ego solve is
    untouched, every record stays finite, demoted labels show coverage
    gaps rather than corrupt estimates, and re-acquisition keeps the
    same semantic label (no ID churn)."""
    s4, s8 = run_k4.summary(), run_k8.summary()
    # ego is independent of the object solve batch
    assert abs(s4["cam_t_rpe_rel_mean"] - s8["cam_t_rpe_rel_mean"]) < 5e-3
    by4, by8 = _by_label(run_k4), _by_label(run_k8)
    # the cap drops records, never labels entirely: every label that k=8
    # tracks sustainedly is still re-acquired under k=4 with the same id
    sustained8 = {l for l, rs in by8.items() if len(rs) >= 8}
    missing = sustained8 - set(by4)
    assert not missing, (sorted(missing), sorted(by4))
    # fewer total records under the cap (the demotion dropouts exist...)
    n4 = sum(len(rs) for rs in by4.values())
    n8 = sum(len(rs) for rs in by8.values())
    assert n4 < n8, (n4, n8)
    # ... and all surviving estimates are finite and sane
    for rs in by4.values():
        for r in rs:
            assert np.isfinite(r.t_rpe_rel)
    # per-label coverage gaps appear under the cap for at least one label
    def gaps(rs):
        got = sorted(int(r.frame) for r in rs)
        return (got[-1] - got[0] + 1) - len(got) if got else 0
    assert sum(gaps(rs) for rs in by4.values()) > sum(
        gaps(rs) for rs in by8.values()
    ) or n8 - n4 > 10, "expected demotion dropouts under k_obj_solve=4"
