"""Robust SO(3) rotation averaging (Chatterjee-Govindu), native JAX.

Absorbs the reference's MATLAB back-end
(``matlab_scripts/SO3GraphAveraging/``):

- :func:`spanning_tree_init` — quaternion spanning-tree initialization
  (RobustMeanSO3Graph.m:88-118 / BoxMedianSO3Graph.m:79-114).
- :func:`l1_init` — the L1 bootstrap.  The MATLAB solves
  min ||A dw - B||_1 per axis with a primal-dual interior-point LP
  (l1decode_pd, BoxMedianSO3Graph.m:168-170, 245-359); here the same L1
  objective is minimized by IRLS (weights 1/max(|r|, eps)) — an
  LP-free formulation that vectorizes on TPU and converges to the same
  minimizer for these small graphs (deviation documented; validated by
  the RandomSO3Graph outlier harness in tests).
- :func:`irls_refine` — the sigma-weighted IRLS refinement, numerically
  identical to RobustMeanSO3Graph.m:130-191 (weights
  sigma / (||e||^2 + sigma^2), tolerance 1e-3 on the mean update norm).
- :func:`average_so3_graph` — the AverageSO3Graph.m:57-94 pipeline:
  restrict to the largest connected component, rotation-sanity check +
  SO(3) re-projection of the input edges (det / SVD, :80-91), L1 init,
  IRLS refine.

Graph convention matches the MATLAB exactly: edge p relates nodes
``i = I[0, p]`` -> ``j = I[1, p]`` with ``R_ij = R_j R_i^{-1}``
(camera-centered, RobustMeanSO3Graph.m "IMPORTANT NOTES").

All solvers operate on dense normal equations — the reference's batches
are tens of nodes (small_batch_rotavg.m batch_size 4-10 keyframes), far
below any sparse-solver crossover; one (N-1)x(N-1) solve per iteration
maps straight onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.geom import lie


def largest_connected_component(I: np.ndarray, n: int) -> np.ndarray:
    """Node mask of the largest connected component (AverageSO3Graph.m:62-65
    uses graphconncomp).  Host-side union-find; graphs are tiny."""
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i, j in I.T:
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[ri] = rj
    roots = np.asarray([find(i) for i in range(n)])
    vals, counts = np.unique(roots, return_counts=True)
    return roots == vals[np.argmax(counts)]


def spanning_tree_init(QQ: np.ndarray, I: np.ndarray, n: int) -> np.ndarray:
    """Quaternion init by walking edges until all nodes are reached
    (RobustMeanSO3Graph.m:88-118).  QQ: (m, 4) relative quats (scalar
    first), I: (2, m) int edges i->j.  Returns (n, 4)."""
    Q = np.tile(np.asarray([1.0, 0.0, 0.0, 0.0]), (n, 1))
    have = np.zeros(n, bool)
    have[0] = True
    qq = np.asarray(QQ)

    def mul(a, b):
        # plain-numpy Hamilton product: this walk is inherently
        # sequential host code, and an eager device quat_mul costs a
        # synchronous tunnel round-trip per edge (BASELINE.md perf notes)
        w1, x1, y1, z1 = a
        w2, x2, y2, z2 = b
        return np.asarray([w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                           w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                           w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                           w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])

    while not have.all():
        progressed = False
        for p in range(I.shape[1]):
            i, j = int(I[0, p]), int(I[1, p])
            if have[i] and not have[j]:
                # Qj = Qij * Qi
                Q[j] = mul(np.asarray(qq[p]), Q[i])
                have[j] = True
                progressed = True
            elif have[j] and not have[i]:
                # Qi = conj(Qij) * Qj
                cj = np.asarray(qq[p]) * np.asarray([1.0, -1.0, -1.0, -1.0])
                # MATLAB uses scalar -w0 form: (-w0, v) == conj up to sign
                Q[i] = mul(cj, Q[j])
                have[i] = True
                progressed = True
        if not progressed:
            break  # disconnected: caller restricts to a component first
    return Q


def _residual_tangent(QQ: jnp.ndarray, Q: jnp.ndarray, I: jnp.ndarray
                      ) -> jnp.ndarray:
    """B = log(Qj^-1 Qij Qi) in the atan2 form of
    RobustMeanSO3Graph.m:140-161; (m, 3)."""
    qi = Q[I[0]]
    qj = Q[I[1]]
    w = lie.quat_mul(QQ, qi)
    w = lie.quat_mul(lie.quat_conj(qj), w)
    s2 = jnp.linalg.norm(w[:, 1:], axis=1)
    theta = 2.0 * jnp.arctan2(s2, w[:, 0])
    theta = jnp.where(theta >= jnp.pi, theta - 2 * jnp.pi, theta)
    theta = jnp.where(theta < -jnp.pi, theta + 2 * jnp.pi, theta)
    B = w[:, 1:] * (theta / jnp.where(s2 > 1e-12, s2, 1.0))[:, None]
    return jnp.where(s2[:, None] > 1e-12, B, 0.0)


def _incidence(I: jnp.ndarray, n: int) -> jnp.ndarray:
    """Dense A (m, n-1): row p has -1 at i-1, +1 at j-1 (node 0 fixed);
    RobustMeanSO3Graph.m:121-127."""
    m = I.shape[1]
    A = jnp.zeros((m, n - 1))
    rows = jnp.arange(m)
    A = A.at[rows, I[0] - 1].add(jnp.where(I[0] > 0, -1.0, 0.0))
    A = A.at[rows, I[1] - 1].add(jnp.where(I[1] > 0, 1.0, 0.0))
    return A


def _apply_update(Q: jnp.ndarray, dW: jnp.ndarray) -> jnp.ndarray:
    """Q <- Q * exp(dW) quaternion-compose (RobustMeanSO3Graph.m:173-183)."""
    W = lie.exp_quat(dW)
    return lie.quat_mul(Q, W)


def _solve_weighted(A: jnp.ndarray, B: jnp.ndarray, w: jnp.ndarray
                    ) -> jnp.ndarray:
    """argmin_X ||diag(w)(A X - B)||_2 via normal equations on the MXU."""
    Aw = A * w[:, None]
    G = Aw.T @ Aw + 1e-9 * jnp.eye(A.shape[1])
    rhs = Aw.T @ (B * w[:, None])
    return jnp.linalg.solve(G, rhs)


def irls_refine(QQ: jnp.ndarray, I: jnp.ndarray, n: int, Q0: jnp.ndarray,
                sigma_deg: float = 5.0, max_iters: int = 100,
                tol: float = 1e-3,
                n_real: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Chatterjee-Govindu IRLS (RobustMeanSO3Graph.m:130-191).

    ``n`` may include zero-degree PADDING nodes (their incidence columns
    are all-zero, so the damped normal equations pin their updates to 0
    and they stay at Q0); ``n_real``, when given, keeps the convergence
    score divided by the true node count so padding cannot perturb the
    iteration-for-iteration numerics (RobustMeanSO3Graph.m:171)."""
    sigma = sigma_deg * jnp.pi / 180.0
    A = _incidence(I, n)
    m = I.shape[1]
    n_score = n if n_real is None else n_real

    def cond(carry):
        Q, w, score, it = carry
        return (score > tol) & (it < max_iters)

    def body(carry):
        Q, weights, _, it = carry
        B = _residual_tangent(QQ, Q, I)
        X = _solve_weighted(A, B, weights)          # (n-1, 3)
        E = A @ X - B
        new_w = sigma / (jnp.sum(E * E, axis=1) + sigma * sigma)
        dW = jnp.concatenate([jnp.zeros((1, 3)), X], axis=0)
        score = jnp.sum(jnp.linalg.norm(X, axis=1)) / n_score
        Q = _apply_update(Q, dW)
        return Q, new_w, score, it + 1

    init = (Q0, jnp.ones((m,)), jnp.asarray(jnp.inf), jnp.asarray(0))
    Q, _, _, _ = jax.lax.while_loop(cond, body, init)
    return Q


def l1_init(QQ: jnp.ndarray, I: jnp.ndarray, n: int, Q0: jnp.ndarray,
            max_iters: int = 10, inner_iters: int = 8) -> jnp.ndarray:
    """L1 rotation averaging by IRLS-L1 (replaces BoxMedianSO3Graph's
    interior-point l1decode_pd; same objective min ||A dw - B||_1 per
    axis, weights 1/max(|r|, eps) refreshed ``inner_iters`` times per
    outer relinearization)."""
    A = _incidence(I, n)
    eps = 1e-5

    def outer(Q, _):
        B = _residual_tangent(QQ, Q, I)

        def inner(X, _):
            R = A @ X - B
            Xs = []
            for axis in range(3):
                w = 1.0 / jnp.sqrt(jnp.abs(R[:, axis]) + eps)
                Xs.append(_solve_weighted(A, B[:, axis:axis + 1], w))
            return jnp.concatenate(Xs, axis=1), None

        X0 = jnp.zeros((n - 1, 3))
        X, _ = jax.lax.scan(inner, X0, None, length=inner_iters)
        dW = jnp.concatenate([jnp.zeros((1, 3)), X], axis=0)
        return _apply_update(Q, dW), None

    Q, _ = jax.lax.scan(outer, Q0, None, length=max_iters)
    return Q


_l1_init_jit = jax.jit(l1_init,
                       static_argnames=("n", "max_iters", "inner_iters"))
_irls_refine_jit = jax.jit(
    irls_refine, static_argnames=("n", "sigma_deg", "max_iters", "tol"))


def average_so3_graph(RR: np.ndarray, I: np.ndarray,
                      sigma_deg: float = 5.0,
                      l1_iters: int = 10, irls_iters: int = 100,
                      tol: float = 1e-3) -> np.ndarray:
    """Full AverageSO3Graph pipeline.  RR: (m, 3, 3) relative rotations
    R_ij = R_j R_i^T; I: (2, m) 0-based edges.  Returns (n, 3, 3) absolute
    rotations (identity for nodes outside the largest component)."""
    I = np.asarray(I, dtype=np.int64)
    n = int(I.max()) + 1
    keep = largest_connected_component(I, n)
    remap = -np.ones(n, np.int64)
    remap[keep] = np.arange(keep.sum())
    edge_keep = keep[I[0]] & keep[I[1]]
    I_sub = remap[I[:, edge_keep]]
    RR_sub = np.asarray(RR[edge_keep], np.float64)

    # rotation-sanity projection (AverageSO3Graph.m:80-91): input edges
    # that arrive from text files (batch_edges_from_files) can
    # de-orthonormalize through float round-trips.  Improper rotations
    # (det <= 0) are an error; singular values off 1 by >= 0.1 are an
    # error, >= 0.01 a warning; every matrix is re-projected onto SO(3)
    # via U * round(S) * V' exactly as the MATLAB does.  Host-side
    # batched SVD — the batches are tens of edges.
    dets = np.linalg.det(RR_sub)
    if (dets <= 0).any():
        p = int(np.argmax(dets <= 0))
        raise ValueError(f"det(RR[{p}])={dets[p]:.6f} <= 0: "
                         "improper input rotation")
    U, S, Vt = np.linalg.svd(RR_sub)
    if (np.abs(S - 1.0) >= 0.1).any():
        p = int(np.argmax((np.abs(S - 1.0) >= 0.1).any(axis=1)))
        raise ValueError(f"svd(RR[{p}]) singular values {S[p]} too far "
                         "from 1: not a rotation")
    if (np.abs(S - 1.0) >= 0.01).any():
        import warnings
        warnings.warn("rotation-averaging input rotations required "
                      "SO(3) re-projection (singular values off 1 by "
                      ">= 0.01)")
    RR_sub = np.einsum("nij,nj,njk->nik", U, np.round(S), Vt)

    QQ = np.asarray(lie.quat_from_matrix(jnp.asarray(RR_sub)))
    n_keep = int(keep.sum())
    Q0 = spanning_tree_init(QQ, I_sub, n_keep)

    # pad BOTH the edge list and the node set to power-of-2 buckets
    # (min 16): padding edges are (0, 0) identity self-edges (all-zero
    # incidence rows, vanishing residuals); padding nodes are zero-degree
    # identity nodes (all-zero incidence columns, pinned by the damped
    # normal equations).  Neither contributes to any solve, but the
    # padded shapes recur across batches, so the JITTED solvers (below)
    # compile once per bucket instead of retracing + recompiling the
    # while_loop/scan programs on EVERY rotation-averaging call (the
    # dominant cost of LC mode before round 4).  Round 5 added the NODE
    # bucket: the bootstrap batch (11 KF nodes) and steady batches
    # (5 KF nodes) previously compiled separate solver variants per node
    # count; both now share n=16, roughly halving the RA-solver share of
    # LC warmup.  n_real keeps the IRLS convergence score exact.
    m = I_sub.shape[1]
    mp = 16
    while mp < m:
        mp *= 2
    if mp != m:
        I_sub = np.concatenate(
            [I_sub, np.zeros((2, mp - m), np.int64)], axis=1)
        QQ = np.concatenate(
            [QQ, np.tile(np.asarray([[1.0, 0, 0, 0]], QQ.dtype),
                         (mp - m, 1))], axis=0)
    np_ = 16
    while np_ < n_keep:
        np_ *= 2
    if np_ != n_keep:
        Q0 = np.concatenate(
            [Q0, np.tile(np.asarray([[1.0, 0, 0, 0]], Q0.dtype),
                         (np_ - n_keep, 1))], axis=0)

    QQj = jnp.asarray(QQ)
    Ij = jnp.asarray(I_sub)
    Q = _l1_init_jit(QQj, Ij, np_, jnp.asarray(Q0),
                     max_iters=l1_iters)
    Q = _irls_refine_jit(QQj, Ij, np_, Q, sigma_deg=sigma_deg,
                         max_iters=irls_iters, tol=tol,
                         n_real=jnp.asarray(n_keep, jnp.float32))
    R_sub = np.asarray(lie.matrix_from_quat(Q))[:n_keep]
    out = np.tile(np.eye(3), (n, 1, 1))
    out[keep] = R_sub
    return out


def random_so3_graph(n: int, completeness: float = 0.5,
                     sigma: float = 0.1, num_outliers: int = 0,
                     seed: int = 0) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Synthetic test graph, port of RandomSO3Graph.m: ground-truth
    rotations, edges with Lie-algebra Gaussian noise, plus uniformly random
    outlier edges.  Returns (R_gt (n,3,3), RR (m,3,3), I (2,m))."""
    rng = np.random.default_rng(seed)
    w_gt = rng.normal(size=(n, 3)) * 0.8
    R_gt = np.asarray(lie.exp_so3(jnp.asarray(w_gt)))
    edges = [(i, i + 1) for i in range(n - 1)]   # ensure connectivity
    for i in range(n):
        for j in range(i + 2, n):
            if rng.uniform() < completeness:
                edges.append((i, j))
    I = np.asarray(edges).T
    m = I.shape[1]
    noise = np.asarray(lie.exp_so3(jnp.asarray(
        rng.normal(size=(m, 3)) * sigma)))
    RR = np.einsum("mab,mbc,mdc->mad", noise, R_gt[I[1]], R_gt[I[0]])
    if num_outliers:
        idx = rng.choice(m, size=min(num_outliers, m), replace=False)
        w_out = rng.uniform(-np.pi, np.pi, size=(len(idx), 3))
        RR[idx] = np.asarray(lie.exp_so3(jnp.asarray(w_out)))
    return R_gt, RR, I
