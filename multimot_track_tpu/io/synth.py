"""Synthetic sequence construction (test/dev fixtures).

The reference has no test assets beyond kitti_sample (SURVEY.md §4);
loop-closing needs a revisit, so we synthesize one: play a sequence
forward then reversed — the tail revisits the head exactly.  No flow
files are written; the loader's on-device dense-flow fallback covers
every pair, exercising the self-contained path.

``make_multimover_frames`` renders a fully-synthetic multi-object scene
(kitti_sample has ONE ground-truth mover; the reference's label-switch
tables handle ~12, src/Tracking.cc:704-748): textured ground+wall
background, K planar movers with exact analytic depth / dense flow /
instance masks / GT ego and object poses — crossing paths, an occlusion,
and birth/death included.  This is the multi-object stress fixture."""

from __future__ import annotations

import dataclasses
import pathlib
import shutil

import numpy as np


def build(src, dst, include_objects: bool = False, order=None):
    """``order`` — explicit source-frame index sequence; default is one
    forward + one reversed pass.  Longer shuttle patterns (fwd-rev-fwd-…)
    make marathon fixtures with repeated revisits."""
    src = pathlib.Path(src)
    dst = pathlib.Path(dst)
    if dst.exists():
        shutil.rmtree(dst)
    (dst / "image").mkdir(parents=True)
    (dst / "depth").mkdir()
    (dst / "semantic").mkdir()

    n = len(list((src / "image").glob("*.png")))
    if order is None:
        order = list(range(n)) + list(range(n - 2, -1, -1))

    for out_i, in_i in enumerate(order):
        for sub, ext in (("image", "png"), ("depth", "png"), ("semantic", "txt")):
            s = src / sub / f"{in_i:06d}.{ext}"
            d = dst / sub / f"{out_i:06d}.{ext}"
            try:
                d.symlink_to(s)
            except OSError:
                shutil.copy(s, d)

    poses = {}
    for line in (src / "pose_gt.txt").read_text().splitlines():
        parts = line.split()
        if parts:
            poses[int(float(parts[0]))] = parts[1:]
    with open(dst / "pose_gt.txt", "w") as f:
        for out_i, in_i in enumerate(order):
            if in_i in poses:
                f.write(f"{out_i} " + " ".join(poses[in_i]) + "\n")

    with open(dst / "times.txt", "w") as f:
        for out_i in range(len(order)):
            f.write(f"{out_i * 0.1:.6e}\n")

    if include_objects and (src / "object_pose.txt").exists():
        rows = {}
        for line in (src / "object_pose.txt").read_text().splitlines():
            parts = line.split()
            if parts:
                rows.setdefault(int(float(parts[0])), []).append(parts[1:])
        with open(dst / "object_pose.txt", "w") as f:
            for out_i, in_i in enumerate(order):
                for r in rows.get(in_i, []):
                    f.write(f"{out_i} " + " ".join(r) + "\n")
    return len(order)



# ---------------------------------------------------------------------------
# Multi-object analytic scene renderer

SYNTH_CAM = dict(fx=460.0, fy=460.0, cx=320.0, cy=192.0, bf=138.0,
                 width=640, height=384, fps=10.0)


def synth_camera_config():
    from multimot_track_tpu.config import CameraConfig

    return CameraConfig(**SYNTH_CAM)


def _texture(a, b, seed):
    """Deterministic viewpoint-consistent texture over surface coords
    (a, b): multi-frequency sinusoids + a per-cell pseudo-random level —
    enough gradient structure for FAST/ZNCC everywhere."""
    s = float(seed)
    cell = np.sin(np.floor(a * 2.1) * 12.9898 + np.floor(b * 2.1) * 78.233 + s) * 43758.5453
    cell = cell - np.floor(cell)
    v = (
        0.35 * np.sin(a * 7.3 + s) * np.cos(b * 9.1 - s)
        + 0.25 * np.sin(a * 23.7 - b * 17.3 + 2 * s)
        + 0.4 * (cell - 0.5)
    )
    return np.clip(127.0 + 110.0 * v, 5, 250)


@dataclasses.dataclass
class Mover:
    """A textured planar quad, fronto-parallel in world, moving rigidly.

    ``centre(t)`` -> (3,) world position of the quad centre at frame t;
    the quad's local x/y axes stay world-aligned (pure translation is
    what the scene-flow classifier keys on, src/Tracking.cc:1463)."""

    centre: callable
    half_w: float
    half_h: float
    seed: int

    def L_world(self, t: float) -> np.ndarray:
        T = np.eye(4, dtype=np.float64)
        T[:3, 3] = self.centre(t)
        return T


def _render_frame(cam, Twc, movers, t):
    """Analytic z-buffer render.  Returns (gray, depth_m, label, info)
    where info[y, x] = (surface id, local a, local b) for flow lookup."""
    W, H = cam["width"], cam["height"]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    # ray in world coords
    d_cam = np.stack([(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, np.float64)], -1)
    R, c0 = Twc[:3, :3], Twc[:3, 3]
    d_w = d_cam @ R.T
    o_w = c0

    GROUND_Y, WALL_Z = 1.5, 40.0
    # ground plane y = GROUND_Y (y grows downward)
    with np.errstate(divide="ignore", invalid="ignore"):
        t_g = (GROUND_Y - o_w[1]) / d_w[..., 1]
    t_g = np.where((t_g > 0.5) & np.isfinite(t_g), t_g, np.inf)
    # back wall z = WALL_Z
    t_w = (WALL_Z - o_w[2]) / d_w[..., 2]
    t_w = np.where((t_w > 0.5) & np.isfinite(t_w), t_w, np.inf)
    t_bg = np.minimum(t_g, t_w)
    is_ground = t_g <= t_w
    X_bg = o_w + t_bg[..., None] * d_w
    a_bg = np.where(is_ground, X_bg[..., 0], X_bg[..., 0])
    b_bg = np.where(is_ground, X_bg[..., 2], X_bg[..., 1] * 3.0)
    gray = np.where(
        is_ground, _texture(a_bg, b_bg, 11), _texture(a_bg, b_bg, 29)
    )
    t_buf = t_bg.copy()
    label = np.zeros((H, W), np.int32)
    a_loc = a_bg.copy()
    b_loc = b_bg.copy()

    for k, mv in enumerate(movers, start=1):
        cen = mv.centre(t)
        tq = (cen[2] - o_w[2]) / d_w[..., 2]          # quad plane z = cen_z
        Xq = o_w + tq[..., None] * d_w
        a = Xq[..., 0] - cen[0]
        b = Xq[..., 1] - cen[1]
        hit = (
            (tq > 0.5) & (tq < t_buf)
            & (np.abs(a) < mv.half_w) & (np.abs(b) < mv.half_h)
        )
        t_buf = np.where(hit, tq, t_buf)
        label = np.where(hit, k, label)
        a_loc = np.where(hit, a, a_loc)
        b_loc = np.where(hit, b, b_loc)
        gray = np.where(hit, _texture(a * 9.0, b * 9.0, 100 + mv.seed), gray)

    # depth = z-coordinate in CAMERA frame (t_buf is distance along d_w
    # whose camera-frame z-component is 1, so depth == t_buf exactly)
    depth_m = t_buf
    return gray, depth_m, label, (a_loc, b_loc)


def make_multimover_frames(movers=None, n_frames: int = 8, cam=None,
                           ego_step: float = 0.3):
    """Render a multi-mover sequence; returns (frames, camera_config).

    frames are io.kitti.FrameData records (in-memory, no disk) with exact
    analytic depth, dense forward flow, instance masks, GT ego pose and
    GT camera-frame object poses."""
    from multimot_track_tpu.io.kitti import FrameData

    cam = dict(SYNTH_CAM) if cam is None else cam
    W, H = cam["width"], cam["height"]
    fx, fy, cx, cy, bf = cam["fx"], cam["fy"], cam["cx"], cam["cy"], cam["bf"]
    if movers is None:
        movers = default_movers()

    def Twc_at(t):
        T = np.eye(4, dtype=np.float64)
        T[2, 3] = ego_step * t       # forward along +z
        return T

    rendered = [
        _render_frame(cam, Twc_at(t), movers, t) for t in range(n_frames)
    ]
    frames = []
    for t in range(n_frames):
        gray, depth_m, label, (a_loc, b_loc) = rendered[t]
        Twc = Twc_at(t)
        # dense forward flow t -> t+1 from the exact surface correspondence
        flow = np.zeros((H, W, 2), np.float32)
        if t + 1 < n_frames:
            us, vs = np.meshgrid(np.arange(W), np.arange(H))
            d_cam = np.stack(
                [(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, np.float64)], -1
            )
            X_cam = d_cam * depth_m[..., None]
            R, c0 = Twc[:3, :3], Twc[:3, 3]
            X_w = X_cam @ R.T + c0
            X_w1 = X_w.copy()
            for k, mv in enumerate(movers, start=1):
                step = mv.centre(t + 1) - mv.centre(t)   # pure translation
                X_w1 = np.where((label == k)[..., None], X_w + step, X_w1)
            Twc1 = Twc_at(t + 1)
            Tcw1 = np.linalg.inv(Twc1)
            X_c1 = X_w1 @ Tcw1[:3, :3].T + Tcw1[:3, 3]
            u1 = fx * X_c1[..., 0] / X_c1[..., 2] + cx
            v1 = fy * X_c1[..., 1] / X_c1[..., 2] + cy
            flow = np.stack([u1 - us, v1 - vs], -1).astype(np.float32)

        ids, Ls, bbs = [], [], []
        for k, mv in enumerate(movers, start=1):
            m = label == k
            if m.sum() == 0:
                continue
            L_cam = np.linalg.inv(Twc) @ mv.L_world(t)   # camera-frame pose
            ids.append(k)
            Ls.append(L_cam.astype(np.float32))
            xs_k = np.where(m.any(0))[0]
            ys_k = np.where(m.any(1))[0]
            bbs.append([xs_k.min(), ys_k.min(), xs_k.max(), ys_k.max()])
        frames.append(
            FrameData(
                index=t,
                gray=gray.astype(np.float32),
                depth_raw=(bf * 256.0 / np.maximum(depth_m, 0.5)).astype(np.float32),
                flow=flow,
                sem_mask=label,
                pose_gt=Twc.astype(np.float32),
                obj_ids_gt=np.asarray(ids, np.int32),
                obj_poses_gt=(
                    np.stack(Ls) if Ls else np.zeros((0, 4, 4), np.float32)
                ),
                obj_bboxes_gt=(
                    np.asarray(bbs, np.float32) if bbs else np.zeros((0, 4), np.float32)
                ),
                timestamp=t * 0.1,
            )
        )
    return frames


def default_movers():
    """Six movers: crossing pair, an occlusion, birth, death, slow lane."""
    return [
        # 1: crosses left -> right at z=9 (crosses mover 2's path)
        Mover(lambda t: np.array([-4.0 + 0.9 * t, 0.2, 9.0]), 1.1, 0.8, 1),
        # 2: crosses right -> left at z=13 (occluded by 1 mid-sequence)
        Mover(lambda t: np.array([4.0 - 0.9 * t, 0.1, 13.0]), 1.2, 0.9, 2),
        # 3: drives away in the right lane
        Mover(lambda t: np.array([2.5, 0.3, 6.0 + 0.8 * t]), 1.0, 0.7, 3),
        # 4: birth — enters the view from the left around frame 3
        Mover(lambda t: np.array([-11.0 + 1.4 * t, 0.0, 10.0]), 1.0, 0.8, 4),
        # 5: death — exits right around frame 4
        Mover(lambda t: np.array([3.0 + 1.1 * t, -0.2, 8.0]), 0.9, 0.7, 5),
        # 6: slow mover in the left lane toward the camera
        Mover(lambda t: np.array([-2.6, 0.4, 16.0 - 0.6 * t]), 1.1, 0.8, 6),
    ]
