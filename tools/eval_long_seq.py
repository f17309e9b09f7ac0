"""Long multi-scene evaluation at KITTI resolution (reference scale).

The reference driver tracks arbitrary-length KITTI sequences
(/root/reference/Examples/RGB-D/rgbd_tum.cc:115-189); kitti_sample is 5
frames.  This harness drives the FULL live system over two analytic
scenes from io/synth rendered at EXACTLY the kitti03.yaml camera
(1242x375, fx 721.5377) so the device programs compiled for kitti_sample
are reused:

  circuit : one full 360-deg lap + 12%% overlap (genuine revisit ->
            loop closure + post-loop global BA), 7 movers
  avenue  : 180 m with S-curves, lead/oncoming/crossing traffic,
            9 movers

and writes LONGSEQ.json + LONGSEQ.md (PARITY-style table).  Ground truth
is exact (analytic renderer), so the numbers measure the SYSTEM, not the
data.

Usage:  python tools/eval_long_seq.py [--frames 220] [--quick]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run_scene(name, frames, cfg):
    from multimot_track_tpu.pipeline.system import MultiMotSystem

    sys_ = MultiMotSystem(cfg)
    t0 = time.perf_counter()
    for fd in frames:
        sys_.track_rgbd(fd)
    wall = time.perf_counter() - t0
    s = sys_.summary()
    recs = [r for r in sys_.map.obj_records if r.has_gt]
    by_sem = {}
    for r in recs:
        by_sem.setdefault(int(r.sem_label), []).append(r)
    per_obj = {
        k: {
            "n": len(rs),
            # nan-aware: a non-finite metric record (tracked but
            # unevaluable, e.g. a degenerate GT pair) must not poison the
            # scene aggregate — its count is reported instead
            "n_nonfinite": int(sum(
                not np.isfinite(r.t_rpe_centred) for r in rs
            )),
            "t_rpe_med": float(np.nanmedian([r.t_rpe_rel for r in rs])),
            # lever-free translation error (eval/metrics.py t_rel_centred):
            # the E-metric above couples rotation error through the
            # |world origin - object| distance on long trajectories
            "t_rpe_centred_med": float(
                np.nanmedian([r.t_rpe_centred for r in rs])
            ),
            "r_rpe_med": float(np.nanmedian([r.r_rpe_rel for r in rs])),
            "speed_err_med": float(np.median(
                [r.speed_err_rel for r in rs if np.isfinite(r.speed_err_rel)]
                or [np.nan]
            )),
        }
        for k, rs in sorted(by_sem.items())
    }
    out = {
        "scene": name,
        "n_frames": s["n_frames"],
        "wall_s": round(wall, 1),
        "fps": round(s["n_frames"] / wall, 2),
        "cam_t_rpe_rel_mean": s["cam_t_rpe_rel_mean"],
        "cam_r_rpe_rel_mean": s["cam_r_rpe_rel_mean"],
        "ego_ate_rmse_m": s["ego_ate_rmse_m"],
        "ego_ate_rmse_raw_m": s["ego_ate_rmse_raw_m"],
        "n_loop_closures": s["n_loop_closures"],
        "n_obj_estimates": s["n_obj_estimates"],
        "obj_t_rpe_rel_mean": s["obj_t_rpe_rel_mean"],
        "obj_t_rpe_centred_med": float(
            np.nanmedian([r.t_rpe_centred for r in recs]) if recs else np.nan
        ),
        "obj_speed_err_rel_mean": s["obj_speed_err_rel_mean"],
        "n_distinct_movers": len(by_sem),
        # host-loop stage breakdown (VERDICT r4 #7: explains where the
        # long-scene wall time goes — loop ladder vs BA vs record)
        "stages": sys_.stage_report(),
        "per_object": per_obj,
    }
    return out


def _scale_series(poses, frames, skip=4):
    """Per-pair est/gt translation ratio (the monocular scale)."""
    ratios = []
    for i in range(skip, len(poses)):
        Twc_a = np.linalg.inv(poses[i - 1])
        Twc_b = np.linalg.inv(poses[i])
        est = np.linalg.norm(Twc_b[:3, 3] - Twc_a[:3, 3])
        gt = np.linalg.norm(
            frames[i].pose_gt[:3, 3] - frames[i - 1].pose_gt[:3, 3]
        )
        if gt > 1e-6 and est > 1e-9:
            ratios.append(est / gt)
    return np.asarray(ratios)


def _scale_drift(r):
    head = np.median(r[: max(5, len(r) // 5)])
    tail = np.median(r[-max(5, len(r) // 5):])
    return float(abs(np.log(tail / head)))


def run_mono_scene(name, frames, cfg, enable_backend):
    """Mono-at-scale row (VERDICT r4 #6): MonoTracker over the scene's
    gray stream, reporting Sim3-aligned ATE + scale drift with/without
    the backend ladder (reference anchor:
    /root/reference/Examples/Monocular/mono_kitti.cc)."""
    import jax.numpy as jnp

    from multimot_track_tpu.eval.metrics import absolute_trajectory_error
    from multimot_track_tpu.pipeline.mono import MonoTracker

    tr = MonoTracker(cfg, n_kp=768, enable_backend=enable_backend,
                     keyframe_gap=3)
    t0 = time.perf_counter()
    for fd in frames:
        tr.track(fd.gray)
    wall = time.perf_counter() - t0
    est = np.stack([np.linalg.inv(T) for T in tr.poses]).astype(np.float32)
    gt = np.stack([fd.pose_gt for fd in frames]).astype(np.float32)
    ate, _ = absolute_trajectory_error(
        jnp.asarray(est), jnp.asarray(gt), with_scale=True
    )
    ratios = _scale_series(tr.poses, frames)
    return {
        "scene": name,
        "mode": "mono+backend" if enable_backend else "mono-vo",
        "n_frames": len(frames),
        "wall_s": round(wall, 1),
        "fps": round(len(frames) / wall, 2),
        "ate_sim3_m": round(float(ate), 3),
        "scale_drift_log": round(_scale_drift(ratios), 4)
        if ratios.size > 20 else None,
        "n_scale_pairs": int(ratios.size),
        "n_loop_closures": len(getattr(tr, "loop_events", [])),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=220)
    ap.add_argument("--quick", action="store_true",
                    help="48 frames at 640x384 (CPU-sized sanity run)")
    ap.add_argument("--noise", action="store_true",
                    help="also run each scene on degraded inputs (the "
                    "reference's depth-noise model src/Frame.cc:1089 + its "
                    "1/35 flow-outlier injector src/Frame.cc:276-301 + mask "
                    "erosion + sensor gray noise); GT stays exact")
    ap.add_argument("--mono", action="store_true",
                    help="also run MonoTracker (VO-only and full backend) "
                    "over each scene's gray stream: Sim3 ATE + scale drift")
    ap.add_argument("--out", default="LONGSEQ")
    args = ap.parse_args()
    mono_rows = []

    import dataclasses

    from multimot_track_tpu.config import DEFAULT_CONFIG
    from multimot_track_tpu.io import synth

    if args.quick:
        cam = dict(synth.SYNTH_CAM)
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, camera=synth.synth_camera_config(),
            padding=dataclasses.replace(
                DEFAULT_CONFIG.padding, n_static_max=1024, n_obj_pts_max=4096
            ),
        )
        n = 48
    else:
        cam = dict(synth.KITTI_SYNTH_CAM)
        cfg = DEFAULT_CONFIG      # camera == kitti03.yaml == KITTI_SYNTH_CAM
        n = args.frames

    root = pathlib.Path(__file__).resolve().parent.parent
    results = []
    for name, mk in (
        ("circuit", lambda tex="default": synth.make_circuit_frames(
            n_frames=n, cam=dict(cam), texture=tex)),
        ("avenue", lambda tex="default": synth.make_avenue_frames(
            n_frames=int(n * 1.09), cam=dict(cam), texture=tex)),
    ):
        print(f"[eval_long_seq] rendering {name} ...", flush=True)
        t0 = time.perf_counter()
        frames = mk()
        print(f"  rendered {len(frames)} frames in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        variants = [(name, frames)]
        if args.noise:
            variants.append((
                f"{name}-noisy",
                synth.degrade_frames(frames, seed=11, bf=cam["bf"]),
            ))
        for vname, vframes in variants:
            r = run_scene(vname, vframes, cfg)
            print("  " + json.dumps(
                {k: v for k, v in r.items()
                 if k not in ("per_object", "stages")}
            ), flush=True)
            print("  stages: " + json.dumps({
                k: v["total_s"] for k, v in r["stages"].items()
            }), flush=True)
            results.append(r)
            _write_outputs(root, args, results, mono_rows)
        if args.mono:
            # descriptor-based mono needs locally distinctive texture
            # (io/synth._texture_distinct); same geometry + exact GT
            mono_frames = mk("distinct")
            for backend in (False, True):
                m = run_mono_scene(name, mono_frames, cfg, backend)
                print("  " + json.dumps(m), flush=True)
                mono_rows.append(m)
                _write_outputs(root, args, results, mono_rows)

    print(f"[eval_long_seq] wrote {args.out}.json / {args.out}.md")


def _write_outputs(root, args, results, mono_rows):
    """(Re)write the JSON + MD artifacts from results-so-far — called
    after every completed variant so a killed run still leaves a
    consistent partial artifact."""
    (root / f"{args.out}.json").write_text(json.dumps(results, indent=1))

    lines = [
        "# LONGSEQ — long multi-scene evaluation (exact-GT analytic scenes, "
        "KITTI camera)",
        "",
        "Generated by `tools/eval_long_seq.py`.  Scenes: `io/synth.make_circuit_frames`",
        "(full 360-deg lap + revisit, 7 movers) and `make_avenue_frames` (180 m,",
        "S-curves, 10 mover lifespans sharing 5 semantic labels, <=6 concurrent —",
        "label reuse means two concurrent same-label movers would merge into one",
        "slot, so spawns are staggered), rendered at the kitti03.yaml camera.  GT",
        "is exact, so these numbers measure the system; the reference can only be",
        "run on kitti_sample (5 frames) because it hard-requires precomputed",
        ".flo/mask files (rgbd_tum.cc:316) this framework synthesizes on device.",
        "",
        "`-noisy` rows are the SAME scenes under the reference's own input",
        "corruption (depth sigma = z^2/(725*0.5)*0.15, src/Frame.cc:1089; 1/35",
        "flow outliers at sigma 4 px, src/Frame.cc:276-301; 2 px mask erosion;",
        "sigma-2 gray sensor noise) measured against the same exact GT.",
        "",
        "| scene | frames | loop closures | ego t-RPE | ego ATE (m) | movers "
        "| obj t-RPE centred (med) | speed err mean | fps (this host) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['scene']} | {r['n_frames']} | {r['n_loop_closures']} | "
            f"{r['cam_t_rpe_rel_mean']*100:.2f}% | {r['ego_ate_rmse_m']:.3f} | "
            f"{r['n_distinct_movers']} | {r['obj_t_rpe_centred_med']*100:.2f}% | "
            f"{r['obj_speed_err_rel_mean']*100:.2f}% | {r['fps']} |"
        )
    if mono_rows:
        lines += [
            "",
            "## Monocular at scale (gray stream only, up-to-scale)",
            "",
            "`MonoTracker` over the same scenes' gray frames "
            "(mono_kitti.cc role): Sim3-aligned ATE and scale drift "
            "|log(late/early scale)|, VO-only vs full backend "
            "(keyframes + local map + fix_scale=False loop closing).",
            "",
            "| scene | mode | frames | ATE Sim3 (m) | scale drift (log) "
            "| loop closures | fps |",
            "|---|---|---|---|---|---|---|",
        ]
        for m in mono_rows:
            lines.append(
                f"| {m['scene']} | {m['mode']} | {m['n_frames']} | "
                f"{m['ate_sim3_m']} | {m['scale_drift_log']} | "
                f"{m['n_loop_closures']} | {m['fps']} |"
            )
        (root / f"{args.out}_mono.json").write_text(
            json.dumps(mono_rows, indent=1)
        )
    lines += [
        "",
        "## Host-loop stage breakdown (seconds total per scene)",
        "",
        "| scene | " + " | ".join(
            k for k in results[0]["stages"]
        ) + " |",
        "|---" * (1 + len(results[0]["stages"])) + "|",
    ]
    for r in results:
        lines.append(
            f"| {r['scene']} | " + " | ".join(
                str(r["stages"].get(k, {}).get("total_s", "-"))
                for k in results[0]["stages"]
            ) + " |"
        )
    lines += ["", "Per-object medians live in LONGSEQ.json."]
    (root / f"{args.out}.md").write_text("\n".join(lines) + "\n")

if __name__ == "__main__":
    main()
