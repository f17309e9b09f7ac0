"""Multi-label motion segmentation — the gco graph-cut subsystem, TPU-style.

The reference ships (dormant) a full alpha-expansion MRF pipeline over
dynamic points (src/Tracking.cc:4445-4836 + src/gco):

  data term        D(i, l) = lambda * min(reproj_err(i | motion_l), cap)
                   with lambda = 80, cap = 16 (``DataEnergy``)
  smoothness       Potts, beta = 1, neighbor weight 100 * exp(-d / 49)
                   over a Delaunay adjacency (``SmoothnessEnergy``/``Delaunay``)
  hypotheses       PnP on 4-point minimal sets drawn from 6 nearest
                   neighbours (``GetMSS``/``GetModel``)

True max-flow alpha-expansion is inherently sequential; per SURVEY.md §7
("Graph-cut exactness") the TPU design solves the same energy with a
batched mean-field relaxation + ICM polish — dense linear algebra over a
k-NN graph, judged by end-metric (energy/segmentation) parity rather than
expansion-step parity.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from multimot_track_tpu.geometry import camera
from multimot_track_tpu.solvers import horn

LAMBDA = 80.0        # data-term scale (Tracking.cc DataEnergy)
COST_CAP = 16.0      # reprojection-error cap
SMOOTH_SCALE = 100.0  # neighbor weight = 100 * exp(-d / 49)
SMOOTH_DECAY = 49.0


class SegGraph(NamedTuple):
    nbr_idx: jnp.ndarray   # (N, K) neighbor indices
    nbr_w: jnp.ndarray     # (N, K) smoothness weights
    valid: jnp.ndarray     # (N,)


def build_knn_graph(uv: jnp.ndarray, valid: jnp.ndarray, k: int = 6) -> SegGraph:
    """k-NN adjacency in image space (stand-in for the Delaunay adjacency;
    same weight law)."""
    d2 = jnp.sum((uv[:, None, :] - uv[None, :, :]) ** 2, axis=-1)
    big = jnp.float32(1e12)
    N = uv.shape[0]
    eye = jnp.eye(N, dtype=bool)
    d2 = jnp.where(valid[None, :] & ~eye, d2, big)
    d2 = jnp.where(valid[:, None], d2, big)
    neg = -d2
    top, idx = jax.lax.top_k(neg, k)
    dist = jnp.sqrt(jnp.maximum(-top, 0.0))
    w = SMOOTH_SCALE * jnp.exp(-dist / SMOOTH_DECAY)
    w = jnp.where((-top) < big * 0.5, w, 0.0)
    return SegGraph(nbr_idx=idx.astype(jnp.int32), nbr_w=w, valid=valid)


def sample_motion_hypotheses(
    key: jax.Array,
    graph: SegGraph,
    Xw_last: jnp.ndarray,   # (N, 3) last-frame points (world)
    xyz_cur: jnp.ndarray,   # (N, 3) current-frame points (camera)
    n_hyp: int = 32,
    mss_size: int = 4,
) -> jnp.ndarray:
    """Minimal-sample-set hypotheses: pick a seed point, take ``mss_size``
    of its nearest neighbours (GetMSS), fit a rigid motion (GetModel's PnP
    replaced by Horn 3D-3D, same role).  Returns (n_hyp, 4, 4)."""
    N = graph.nbr_idx.shape[0]
    vf = graph.valid.astype(jnp.float32)
    p = vf / jnp.maximum(jnp.sum(vf), 1.0)
    seeds = jax.random.choice(key, N, shape=(n_hyp,), p=p)
    k = graph.nbr_idx.shape[1]
    take = min(mss_size - 1, k)  # static: shapes must not trace
    nbrs = graph.nbr_idx[seeds][:, :take]                  # (n_hyp, take)
    members = jnp.concatenate([seeds[:, None], nbrs], axis=1)  # (n_hyp, mss)
    src = Xw_last[members]
    dst = xyz_cur[members]
    return horn.rigid_align(src, dst)


def dedupe_hypotheses(T_hyp: jnp.ndarray, rot_tol: float = 0.01, t_tol: float = 0.05):
    """Mask near-identical motion hypotheses (keep the first of each group).

    Duplicate hypotheses split one rigid region across several labels and
    leave parallel label updates free to oscillate; alpha-expansion is
    immune because it sweeps labels sequentially.  Returns a (L,) bool mask
    of representatives.
    """
    L = T_hyp.shape[0]
    rel = jnp.einsum("aij,bjk->abik", T_hyp, jnp.linalg.inv(T_hyp))
    t = jnp.linalg.norm(rel[..., :3, 3], axis=-1)
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    ang = jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))
    same = (t < t_tol) & (ang < rot_tol)
    earlier = jnp.tril(same, k=-1)                 # same as an earlier hypothesis
    return ~jnp.any(earlier, axis=1)


def data_costs(
    T_hyp: jnp.ndarray,     # (L, 4, 4) motion hypotheses (world -> cur cam)
    Xw_last: jnp.ndarray,   # (N, 3)
    uv_cur: jnp.ndarray,    # (N, 2)
    fx, fy, cx, cy,
) -> jnp.ndarray:
    """(N, L) capped, scaled reprojection costs (DataEnergy semantics)."""
    y = jnp.einsum("lij,nj->lni", T_hyp[:, :3, :3], Xw_last) + T_hyp[:, None, :3, 3]
    uv_hat = camera.project(y, fx, fy, cx, cy)
    err = jnp.linalg.norm(uv_hat - uv_cur[None], axis=-1)   # (L, N)
    return (LAMBDA * jnp.minimum(err, COST_CAP)).T          # (N, L)


def total_energy(labels, D, graph: SegGraph) -> jnp.ndarray:
    """E = sum_i D(i, l_i) + sum_edges w_ij [l_i != l_j] (Potts beta=1)."""
    data = jnp.sum(jnp.where(graph.valid, jnp.take_along_axis(D, labels[:, None], 1)[:, 0], 0.0))
    nl = labels[graph.nbr_idx]                               # (N, K)
    diff = (nl != labels[:, None]) & graph.valid[:, None] & graph.valid[graph.nbr_idx]
    smooth = 0.5 * jnp.sum(jnp.where(diff, graph.nbr_w, 0.0))
    return data + smooth


@functools.partial(jax.jit, static_argnames=("n_mf_iters", "n_icm_iters"))
def segment(
    D: jnp.ndarray,          # (N, L) data costs
    graph: SegGraph,
    n_mf_iters: int = 20,
    n_icm_iters: int = 5,
    temperature: float = 20.0,
):
    """Mean-field relaxation annealed to hard labels, ICM-polished.

    Returns (labels (N,), energy ()).
    """
    N, L = D.shape

    def gather_q(q):
        return q[graph.nbr_idx]                              # (N, K, L)

    def mf_step(i, q):
        temp = temperature * (0.5 ** (i.astype(jnp.float32) / 5.0))
        qn = gather_q(q)
        # expected Potts penalty for assigning label l at i
        pen = jnp.einsum("nk,nkl->nl", graph.nbr_w, 1.0 - qn)
        logits = -(D + pen) / jnp.maximum(temp, 1e-3)
        # damped update: parallel mean-field on a graph oscillates undamped
        return 0.5 * q + 0.5 * jax.nn.softmax(logits, axis=-1)

    q0 = jax.nn.softmax(-D / temperature, axis=-1)
    q = jax.lax.fori_loop(0, n_mf_iters, mf_step, q0)
    labels = jnp.argmax(q, axis=-1).astype(jnp.int32)

    def icm_step(_, labels):
        onehot = jax.nn.one_hot(labels, L)
        nb = onehot[graph.nbr_idx]                           # (N, K, L)
        pen = jnp.einsum("nk,nkl->nl", graph.nbr_w, 1.0 - nb)
        return jnp.argmin(D + pen, axis=-1).astype(jnp.int32)

    labels = jax.lax.fori_loop(0, n_icm_iters, icm_step, labels)
    return labels, total_energy(labels, D, graph)
