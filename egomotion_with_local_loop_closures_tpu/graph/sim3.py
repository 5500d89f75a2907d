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

TPU-native design: Sim(3) exp/log avoid hand-derived series — ``exp`` is
the matrix exponential of the 4x4 algebra element [[hat(w)+sI, v],[0,0]],
and ``log``'s translation block uses the augmented-matrix identity
expm([[M, I],[0, 0]]) = [[e^M, ∫e^{Mτ}dτ],[0, I]] to get the W matrix,
so both are closed-form, branch-free, and differentiable; residual
Jacobians come from ``jax.jacfwd`` through the whole Lie composition, and
one GN iteration is a dense (7E x 7(N-1)) normal-equation solve — ideal
MXU work for window-sized graphs.  Everything is jitted with static
iteration counts (no data-dependent control flow)."""

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


def exp_sim3(xi: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) exponential: 4x4 [[e^s R, Wv], [0, 1]]."""
    return jax.scipy.linalg.expm(hat_sim3(xi))


def _w_matrix(w: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """W = ∫_0^1 e^{sτ} exp(hat(w) τ) dτ via the augmented expm identity
    (closed-form, branch-free, works at θ -> 0 and s -> 0)."""
    M = lie.hat_so3(w) + s * jnp.eye(3)
    aug = jnp.zeros((6, 6)).at[:3, :3].set(M).at[:3, 3:].set(jnp.eye(3))
    return jax.scipy.linalg.expm(aug)[:3, 3:]


def log_sim3(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of exp_sim3 for T = [[e^s R, t], [0, 1]]."""
    A = T[:3, :3]
    t = T[:3, 3]
    # det(e^s R) = e^{3s}
    s = jnp.log(jnp.linalg.det(A)) / 3.0
    R = A * jnp.exp(-s)
    w = lie.log_so3(R)
    v = jnp.linalg.solve(_w_matrix(w, s), t)
    return jnp.concatenate([w, v, s[None]])


def inv_sim3(T: jnp.ndarray) -> jnp.ndarray:
    A = T[:3, :3]
    Ainv = jnp.linalg.inv(A)
    out = jnp.eye(4)
    out = out.at[:3, :3].set(Ainv)
    out = out.at[:3, 3].set(-Ainv @ T[:3, 3])
    return out


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
