"""multimot_track_tpu — a TPU-native multi-motion visual odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
MultMotTracking reference system (IROS 2020 "Robust Ego and Object 6-DoF
Motion Estimation and Tracking"): per-frame ego SE(3) pose, per-object rigid
SE(3) motions of dynamic objects, sparse scene flow, motion segmentation and
online ground-truth evaluation — expressed as batched, statically-shaped,
jit-compiled device programs instead of a threaded C++/g2o pipeline.

Layer map (bottom-up):
  geometry/  pure-jnp SE(3) + pinhole camera math
  io/        dataset loaders (KITTI-format images, .flo flow, masks, poses)
  frontend/  feature sampling (FAST corners, dense object grids, flow shift)
  solvers/   batched LM flow-BA (Schur-reduced), Horn/PnP RANSAC
  pipeline/  per-frame-pair tracking step, object association, system facade
  parallel/  device-mesh sharding of frame-pair batches + windowed BA
  eval/      relative-pose-error / speed / segmentation metrics
"""

import jax as _jax

# Geometry/solver math is precision-sensitive (chi2 gates at 0.04 px^2,
# SURVEY.md §7 "Hard parts"); TPU matmuls default to bf16 which is not
# enough.  Make full-f32 the package default; throughput-bound kernels
# opt back into lower precision explicitly via ``precision=`` arguments.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: this environment compiles XLA programs
# remotely (~minutes each); caching executables on disk makes every
# subsequent process start warm.
import os as _os


def _host_fingerprint() -> str:
    """CPU-feature fingerprint for the cache path.  XLA:CPU AOT
    executables are machine-feature-specific, and this fleet is
    heterogeneous — loading an executable cached by a host with
    different features SIGSEGVs inside cpu_aot_loader (observed).
    Partitioning the cache per feature set makes stale entries
    unreachable instead of fatal."""
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:10]
    except Exception:
        pass
    return "generic"


_cache_dir = _os.path.join(
    _os.environ.get("MMT_JAX_CACHE", "/tmp/mmt_jax_cache"), _host_fingerprint()
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimisation, never a requirement
    pass

__version__ = "0.1.0"
