"""ctypes binding for the native prefetching sequence loader.

``NativeKittiSequence`` mirrors :class:`multimot_track_tpu.io.kitti.
KittiSequence` (same ``load_frame`` -> ``FrameData`` contract) but decodes
PNG/.flo/mask files on C++ worker threads ahead of the consumer, so the
host loop never blocks on IO (the reference does all of this synchronously
on the tracking thread, Examples/RGB-D/rgbd_tum.cc:115-189).

Falls back transparently: ``get_sequence(root)`` returns the native loader
when the shared library builds, else the pure-Python one.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

from multimot_track_tpu.io import kitti

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB = _NATIVE_DIR / "libmmt_loader.so"


def build_native(force: bool = False) -> bool:
    """Compile the loader (once); returns availability."""
    if _LIB.exists() and not force:
        return True
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR), "libmmt_loader.so"],
            check=True,
            capture_output=True,
        )
        return _LIB.exists()
    except Exception:
        return False


class NativeKittiSequence(kitti.KittiSequence):
    """Drop-in KittiSequence with native threaded decode + prefetch."""

    def __init__(self, root, max_label: int = 4, n_threads: int = 2,
                 prefetch_depth: int = 4, cache_cap: int = 8):
        super().__init__(root, max_label=max_label)
        if not build_native():
            raise RuntimeError("native loader unavailable (build failed)")
        self._dll = ctypes.CDLL(str(_LIB))
        self._dll.mmt_open.restype = ctypes.c_void_p
        self._dll.mmt_open.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 4
        self._dll.mmt_get.restype = ctypes.c_int
        self._dll.mmt_get.argtypes = [ctypes.c_void_p, ctypes.c_int] + [
            ctypes.c_void_p
        ] * 4
        self._dll.mmt_dims.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        self._dll.mmt_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
        self._dll.mmt_close.argtypes = [ctypes.c_void_p]
        self._h = self._dll.mmt_open(
            str(root).encode(), self.n_frames, max_label, n_threads, cache_cap
        )
        if not self._h:
            raise RuntimeError(f"native loader failed to open {root}")
        H = ctypes.c_int()
        W = ctypes.c_int()
        self._dll.mmt_dims(self._h, ctypes.byref(H), ctypes.byref(W))
        self.H, self.W = H.value, W.value
        self._prefetch_depth = prefetch_depth

    def load_frame(self, i: int) -> kitti.FrameData:
        H, W = self.H, self.W
        gray = np.empty((H, W), np.float32)
        depth = np.empty((H, W), np.float32)
        flow = np.empty((H, W, 2), np.float32)
        sem = np.empty((H, W), np.int32)
        self._dll.mmt_prefetch(self._h, i + 1, self._prefetch_depth)
        ok = self._dll.mmt_get(
            self._h, i,
            gray.ctypes.data_as(ctypes.c_void_p),
            depth.ctypes.data_as(ctypes.c_void_p),
            flow.ctypes.data_as(ctypes.c_void_p),
            sem.ctypes.data_as(ctypes.c_void_p),
        )
        if not ok:
            raise IOError(f"native decode failed for frame {i}")
        # the C loader zero-fills missing .flo files; route through the
        # parent's fallback so a flow-less sequence gets on-device flow
        # estimation exactly like the Python loader (a zero flow field
        # silently kills every correspondence and the tracker goes LOST)
        if not self.frame_paths(i)["flow"].exists():
            flow = self._flow_or_estimate(i, gray)
        rows = self.obj_rows.get(i, [])
        obj_ids = np.asarray([int(r[1]) for r in rows], np.int32)
        obj_poses = (
            np.stack([kitti.obj_pose_row_to_T(r) for r in rows])
            if rows
            else np.zeros((0, 4, 4), np.float32)
        )
        obj_boxes = (
            np.stack([r[2:6] for r in rows]).astype(np.float32)
            if rows
            else np.zeros((0, 4), np.float32)
        )
        return kitti.FrameData(
            index=i,
            timestamp=self.timestamps[i] if i < len(self.timestamps) else float(i),
            gray=gray,
            depth_raw=depth,
            flow=flow,
            sem_mask=sem,
            pose_gt=self.poses_gt.get(i, np.eye(4, dtype=np.float32)),
            obj_ids_gt=obj_ids,
            obj_poses_gt=obj_poses,
            obj_bboxes_gt=obj_boxes,
        )

    def close(self):
        if getattr(self, "_h", None):
            self._dll.mmt_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def get_sequence(root, **kw) -> kitti.KittiSequence:
    """Native loader when available, Python fallback otherwise."""
    try:
        return NativeKittiSequence(root, **kw)
    except Exception:
        return kitti.KittiSequence(root)
