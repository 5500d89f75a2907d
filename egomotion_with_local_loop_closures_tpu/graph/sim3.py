"""Sim(3) pose-graph refinement: joint rotation+translation+scale GN.

The reference's global back-end only averages rotations (translations and
scales pass through untouched — ``perform_rotation_averaging_transition1.m
:79-82``), and its only Sim(3) notion is the scale-only
``calculateSim3poseOtherWrtThis`` (``src/Frame.cpp:419-439``) used to map
depth between keyframes.  Per-keyframe scale drift is tracked through
``rescaleFactor`` / ``GLOABL_DEPTH_SCALE`` but never optimized.  This
module supplies the missing piece (the BASELINE north-star "BA iters/s"
metric): a Sim(3) pose graph over the keyframes of a batch window, with
odometry edges carrying the per-keyframe rescale factor as a log-scale
measurement and loop-closure edges from the rematch alignments, solved by
damped Gauss-Newton.

TPU-native design: Sim(3) exp/log are CLOSED FORM (Rodrigues rotation +
the W = C I + A [w]x + B [w]x^2 left-Jacobian-like integral with exact
small-angle/small-scale Taylor limits, validated against matrix expm in
tests/test_sim3.py) — branch-free jnp.where selects, differentiable, and
O(1) per element, so they batch under vmap without the O(n^3)
iterated-squaring cost of expm.  ``refine`` here is the DENSE reference
solver: residual Jacobians from ``jax.jacfwd`` through the whole graph,
one GN iteration = a (7E x 7(N-1)) normal-equation solve — fine for
window-sized graphs and the golden baseline for the scalable engine.
The production solver is ``graph/ba.py``: analytic per-edge Jacobians,
matrix-free block-sparse normal equations, preconditioned CG, and
edge-sharded ``psum`` for multi-chip — O(E) per iteration instead of
O(E N^2).  Everything is jitted with static iteration counts."""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.geom import lie


# --------------------------------------------------------------- Sim(3) ops

def hat_sim3(xi: jnp.ndarray) -> jnp.ndarray:
    """7-vector [w(3) v(3) s] -> 4x4 algebra element
    [[hat(w)+sI, v], [0, 0]]."""
    w, v, s = xi[:3], xi[3:6], xi[6]
    top = jnp.concatenate(
        [lie.hat_so3(w) + s * jnp.eye(3), v[:, None]], axis=1)
    return jnp.concatenate([top, jnp.zeros((1, 4))], axis=0)


_SMALL_T2 = 1e-4      # theta^2 Taylor switch (matches geom.lie)
_SMALL_S = 1e-3       # |sigma| Taylor switch


def _w_coeffs(theta2: jnp.ndarray, s: jnp.ndarray):
    """Closed-form coefficients of W = ∫_0^1 e^{sτ} exp([w]x τ) dτ
    = C I + A [w]x + B [w]x^2 (the Sim(3) 'V' matrix; cf. Strasdat's
    Sophus), with exact Taylor limits at θ -> 0 and s -> 0, branch-free.

    All four regimes are computed with guarded denominators and selected
    with jnp.where, so the function is differentiable and vmap-friendly.
    """
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    scale = jnp.exp(s)
    t_small = theta2 < _SMALL_T2
    s_small = jnp.abs(s) < _SMALL_S

    t2g = jnp.where(t_small, 1.0, theta2)       # guarded theta^2
    tg = jnp.sqrt(t2g)
    sg = jnp.where(s_small, 1.0, s)             # guarded sigma

    # C = (e^s - 1)/s;    s->0: 1 + s/2 + s^2/6
    C = jnp.where(s_small, 1.0 + s / 2.0 + s * s / 6.0,
                  (scale - 1.0) / sg)

    a = scale * jnp.sin(tg)
    b = scale * jnp.cos(tg)
    s2t2 = sg * sg + t2g

    # A: s->0: (1-cos θ)/θ^2          (θ->0: 1/2 - θ^2/24)
    #    else: (a s + (1-b) θ)/(θ (s^2+θ^2))
    #          (θ->0: (e^s (s-1) + 1)/s^2)
    A_s0 = jnp.where(t_small, 0.5 - theta2 / 24.0,
                     (1.0 - jnp.cos(tg)) / t2g)
    A_t0 = (scale * (sg - 1.0) + 1.0) / (sg * sg)
    A_gen = (a * sg + (1.0 - b) * tg) / (tg * s2t2)
    A = jnp.where(s_small, A_s0, jnp.where(t_small, A_t0, A_gen))

    # B: s->0: (θ - sin θ)/θ^3        (θ->0: 1/6 - θ^2/120)
    #    else: (C - ((b-1) s + a θ)/(s^2+θ^2)) / θ^2
    #          (θ->0: (e^s (s^2-2s+2) - 2)/(2 s^3))
    B_s0 = jnp.where(t_small, 1.0 / 6.0 - theta2 / 120.0,
                     (tg - jnp.sin(tg)) / (t2g * tg))
    B_t0 = (scale * (sg * sg - 2.0 * sg + 2.0) - 2.0) / (2.0 * sg ** 3)
    B_gen = (C - ((b - 1.0) * sg + a * tg) / s2t2) / t2g
    B = jnp.where(s_small, B_s0, jnp.where(t_small, B_t0, B_gen))
    return A, B, C


def _w_matrix(w: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """W = ∫_0^1 e^{sτ} exp(hat(w) τ) dτ in closed form (batchable over
    leading dims; validated against the augmented expm identity)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C = _w_coeffs(theta2, s)
    W = lie.hat_so3(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=W.dtype), W.shape)
    return (C[..., None, None] * eye + A[..., None, None] * W
            + B[..., None, None] * W2)


def _inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate/det) — batchable, no pivoting;
    W is always well-conditioned (it -> I as the transform -> identity)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A_ = e * i - f * h
    B_ = -(d * i - f * g)
    C_ = d * h - e * g
    det = a * A_ + b * B_ + c * C_
    det = jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack([
        jnp.stack([A_, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B_, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C_, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]


def exp_sim3(xi: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) exponential: (..., 7) [w v s] -> 4x4 [[e^s R, Wv], [0, 1]],
    closed form (equals expm of hat_sim3; tests assert)."""
    w, v, s = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = lie.exp_so3(w)
    W = _w_matrix(w, s)
    t = jnp.einsum("...ij,...j->...i", W, v)
    top = jnp.concatenate(
        [jnp.exp(s)[..., None, None] * R, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def log_sim3(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of exp_sim3 for T = [[e^s R, t], [0, 1]] (batchable)."""
    A = T[..., :3, :3]
    t = T[..., :3, 3]
    # det(e^s R) = e^{3s}
    s = jnp.log(jnp.linalg.det(A)) / 3.0
    R = A * jnp.exp(-s)[..., None, None]
    w = lie.log_so3(R)
    v = jnp.einsum("...ij,...j->...i", _inv3(_w_matrix(w, s)), t)
    return jnp.concatenate([w, v, s[..., None]], axis=-1)


def inv_sim3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form Sim(3) matrix inverse: [[A, t],[0,1]]^-1 =
    [[A^-1, -A^-1 t],[0,1]] with A^-1 = e^-s R^T computed by adjugate
    (batchable)."""
    A = T[..., :3, :3]
    Ainv = _inv3(A)
    t = -jnp.einsum("...ij,...j->...i", Ainv, T[..., :3, 3])
    top = jnp.concatenate([Ainv, t[..., :, None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_to_sim3(xi6: jnp.ndarray, log_scale=0.0) -> jnp.ndarray:
    """Lift an se(3) twist [w v] to a 7-vector with the given log-scale."""
    return jnp.concatenate([jnp.asarray(xi6),
                            jnp.asarray([log_scale], jnp.float32)])


# -------------------------------------------------------------- pose graph

class Sim3Graph(NamedTuple):
    """Edge list: measurement Z_ij ~ X_i^-1 X_j (j in frame i)."""
    nodes: jnp.ndarray     # (N, 7) initial world 7-vectors
    edges: jnp.ndarray     # (E, 2) int32 [i, j]
    meas: jnp.ndarray      # (E, 7) measured relative 7-vectors
    weights: jnp.ndarray   # (E,) per-edge weight (e.g. 1, or loop conf.)


def _edge_residual(xi_i, xi_j, meas7):
    """r = log( X_j X_i^-1 Z^-1 ), 7-dim — zero when X_j = Z X_i, the
    pipeline's left-composition convention (lie.compose: world =
    pose_wrt_kf ∘ kf_world, Frame.cpp:503-530)."""
    Z = exp_sim3(meas7)
    Xi = exp_sim3(xi_i)
    Xj = exp_sim3(xi_j)
    return log_sim3(Xj @ inv_sim3(Xi) @ inv_sim3(Z))


_batch_residual = jax.vmap(_edge_residual, in_axes=(0, 0, 0))


def residuals(nodes: jnp.ndarray, edges: jnp.ndarray,
              meas: jnp.ndarray) -> jnp.ndarray:
    return _batch_residual(nodes[edges[:, 0]], nodes[edges[:, 1]], meas)


@functools.partial(jax.jit, static_argnames=("num_iters",))
def refine(graph: Sim3Graph, num_iters: int = 10,
           huber_delta: float = 0.05,
           damping: float = 1e-6) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton on the Sim(3) pose graph.

    Node 0 is the gauge anchor (fixed, like the identity-prepended first
    pose of the MATLAB batch driver, ``small_batch_rotavg.m:35``).
    Returns (refined (N,7) nodes, (num_iters,) residual RMS history)."""
    N = graph.nodes.shape[0]
    E = graph.edges.shape[0]

    def flat_residuals(free_flat):
        nodes = jnp.concatenate(
            [graph.nodes[:1], free_flat.reshape(N - 1, 7)], axis=0)
        r = residuals(nodes, graph.edges, graph.meas)   # (E, 7)
        return r.reshape(-1)

    def step(free_flat, _):
        r = flat_residuals(free_flat)
        J = jax.jacfwd(flat_residuals)(free_flat)       # (7E, 7(N-1))
        # Huber + per-edge weights on whole-edge residual norms
        rn = jnp.linalg.norm(r.reshape(E, 7), axis=1)
        hub = jnp.where(rn <= huber_delta, 1.0,
                        huber_delta / jnp.maximum(rn, 1e-12))
        w = jnp.repeat(graph.weights * hub, 7)
        JtW = J.T * w[None, :]
        H = JtW @ J + damping * jnp.eye(J.shape[1])
        g = JtW @ r
        delta = jnp.linalg.solve(H, g)
        rms = jnp.sqrt(jnp.mean(w * r * r))
        return free_flat - delta, rms

    free0 = graph.nodes[1:].reshape(-1)
    free, hist = jax.lax.scan(step, free0, None, length=num_iters)
    out = jnp.concatenate([graph.nodes[:1], free.reshape(N - 1, 7)], axis=0)
    return out, hist


# ------------------------------------------------------------- construction

def graph_from_trajectory(kf_world_poses: np.ndarray,
                          kf_rescales: np.ndarray,
                          loop_edges=None) -> Sim3Graph:
    """Build a window pose graph from pipeline outputs.

    - nodes: keyframe world se(3) poses lifted to Sim(3); node k's
      log-scale is the accumulated log rescale (GLOABL_DEPTH_SCALE chain,
      ExternVariable.h:229).
    - odometry edges k -> k+1 with the measured relative pose and the
      keyframe's rescale factor as relative log-scale;
    - loop edges (frame_i_idx, frame_j_idx, rel_pose6) with weight 1.
    """
    P = np.asarray(kf_world_poses, np.float32)
    n = P.shape[0]
    rs = np.log(np.maximum(np.asarray(kf_rescales, np.float32), 1e-12))
    cum = np.concatenate([[0.0], np.cumsum(rs)[:-1]]).astype(np.float32)
    nodes = np.concatenate([P, cum[:, None]], axis=1)

    ei, meas, wts = [], [], []
    for k in range(n - 1):
        rel = np.asarray(lie.relative(jnp.asarray(P[k + 1]),
                                      jnp.asarray(P[k])), np.float32)
        ei.append([k, k + 1])
        meas.append(np.concatenate([rel, [rs[k]]]))
        wts.append(1.0)
    for (i, j, rel6) in (loop_edges or []):
        ei.append([i, j])
        meas.append(np.concatenate(
            [np.asarray(rel6, np.float32), [0.0]]))
        wts.append(1.0)
    return Sim3Graph(nodes=jnp.asarray(nodes),
                     edges=jnp.asarray(np.asarray(ei, np.int32)),
                     meas=jnp.asarray(np.asarray(meas, np.float32)),
                     weights=jnp.asarray(np.asarray(wts, np.float32)))
