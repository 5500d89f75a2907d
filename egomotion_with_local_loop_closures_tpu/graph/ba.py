"""Distributed Sim(3) bundle adjustment: analytic per-edge Jacobians,
block-sparse normal equations, preconditioned CG, edge-sharded psum.

This is the scalable production solver behind the BASELINE north-star
"BA iters/s" metric.  The reference has no analog — its back-end averages
rotations only, in MATLAB, with a dense sparse-LSQ solve per IRLS
iteration (``matlab_scripts/SO3GraphAveraging/RobustMeanSO3Graph.m:165``)
and passes translations/scales through untouched
(``perform_rotation_averaging_transition1.m:79-82``).  ``graph/sim3.py``'s
``refine`` (the dense golden solver, used here in the equality tests)
builds the FULL (7E x 7(N-1)) Jacobian by ``jacfwd`` per GN step — O(E N)
memory and O(E N^2) flops, fine for 10-node windows, hopeless beyond.

TPU-native design, per damped-GN iteration (all O(E + N)):

1. residuals r_e = log( X_j X_i^-1 Z_e^-1 ) and the two 7x7 per-edge
   Jacobian blocks d r_e / d eps_i, d r_e / d eps_j (left perturbations
   exp(eps) X), computed ANALYTICALLY per edge: ``jax.jacfwd`` of the
   closed-form 14 -> 7 edge map, vmapped over edges — constant cost per
   edge, no graph-sized intermediate (the closed-form exp/log of
   graph/sim3.py make this chain cheap and exact; no expm).
2. Huber + per-edge weights on whole-edge residual norms (same robust
   rule as sim3.refine).
3. The normal equations (H + lambda I) dx = -g are never materialized:
   CG runs matrix-free, each matvec = gather node blocks per edge ->
   per-edge (7x7)@(7) products -> segment_sum scatter-add back to nodes.
   Preconditioner = inverted per-node 7x7 diagonal blocks (block-Jacobi).
4. Gauge: node 0 is frozen by projecting its tangent components out of
   gradient, matvec, and preconditioner (the identity-prepended anchor of
   the MATLAB batch driver, ``small_batch_rotavg.m:35``).

Multi-chip: ``refine_sharded`` runs the same iteration under
``jax.shard_map`` with the EDGE arrays sharded over a mesh axis and node
state replicated: residual/Jacobian work is local to each shard, and the
(N, 7) gradient / CG-matvec / preconditioner contributions are reduced
with ``jax.lax.psum`` over ICI — the SURVEY §2.3 "host-host psum of
normal-equation blocks" deliverable.  Edge count is padded to the shard
multiple with zero-weight self-edges (exactly zero contribution).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from egomotion_with_local_loop_closures_tpu.graph import sim3
from egomotion_with_local_loop_closures_tpu.graph.sim3 import Sim3Graph


class BAResult(NamedTuple):
    nodes: jnp.ndarray        # (N, 7) refined world 7-vectors
    rms_history: jnp.ndarray  # (num_iters,) weighted residual RMS


def _edge_map(eps_i: jnp.ndarray, eps_j: jnp.ndarray,
              xi_i: jnp.ndarray, xi_j: jnp.ndarray,
              meas7: jnp.ndarray) -> jnp.ndarray:
    """r(eps) = log( exp(eps_j) X_j (exp(eps_i) X_i)^-1 Z^-1 ): the edge
    residual under left perturbations — the 14 -> 7 map whose Jacobian at
    eps = 0 gives the two analytic 7x7 blocks."""
    Xi = sim3.exp_sim3(xi_i)
    Xj = sim3.exp_sim3(xi_j)
    Zinv = sim3.inv_sim3(sim3.exp_sim3(meas7))
    M = (sim3.exp_sim3(eps_j) @ Xj @ sim3.inv_sim3(Xi)
         @ sim3.inv_sim3(sim3.exp_sim3(eps_i)) @ Zinv)
    return sim3.log_sim3(M)


def _edge_residual_jacobians(xi_i, xi_j, meas7):
    """Per-edge (r (7,), J_i (7,7), J_j (7,7)) — constant cost, closed
    form end to end."""
    z = jnp.zeros(7, xi_i.dtype)
    r = _edge_map(z, z, xi_i, xi_j, meas7)
    Ji = jax.jacfwd(lambda e: _edge_map(e, z, xi_i, xi_j, meas7))(z)
    Jj = jax.jacfwd(lambda e: _edge_map(z, e, xi_i, xi_j, meas7))(z)
    return r, Ji, Jj


_batch_rj = jax.vmap(_edge_residual_jacobians, in_axes=(0, 0, 0))


def _linearize(nodes, edges, meas, weights, huber_delta):
    """Residuals, Jacobian blocks and robust weights for all edges."""
    r, Ji, Jj = _batch_rj(nodes[edges[:, 0]], nodes[edges[:, 1]], meas)
    rn = jnp.linalg.norm(r, axis=1)
    hub = jnp.where(rn <= huber_delta, 1.0,
                    huber_delta / jnp.maximum(rn, 1e-12))
    w = weights * hub                               # (E,)
    return r, Ji, Jj, w


def _gauge(vec_n7: jnp.ndarray) -> jnp.ndarray:
    """Project out node 0's tangent (gauge anchor)."""
    return vec_n7.at[0].set(0.0)


def _assemble_grad_diag(r, Ji, Jj, w, ei, ej, N):
    """g = sum_e J^T w r scattered per node; D = per-node 7x7 diagonal
    blocks of J^T w J (for block-Jacobi preconditioning)."""
    gi = jnp.einsum("eab,ea->eb", Ji, r) * w[:, None]       # (E, 7)
    gj = jnp.einsum("eab,ea->eb", Jj, r) * w[:, None]
    g = jnp.zeros((N, 7), r.dtype).at[ei].add(gi).at[ej].add(gj)
    Di = jnp.einsum("eab,eac->ebc", Ji, Ji) * w[:, None, None]
    Dj = jnp.einsum("eab,eac->ebc", Jj, Jj) * w[:, None, None]
    D = jnp.zeros((N, 7, 7), r.dtype).at[ei].add(Di).at[ej].add(Dj)
    return g, D


def _matvec(v, Ji, Jj, w, ei, ej, N, damping):
    """(J^T W J + damping I) v, matrix-free: one gather + per-edge 7x7
    products + one scatter-add."""
    u = (jnp.einsum("eab,eb->ea", Ji, v[ei])
         + jnp.einsum("eab,eb->ea", Jj, v[ej])) * w[:, None]  # (E, 7)
    out = jnp.zeros((N, 7), v.dtype)
    out = out.at[ei].add(jnp.einsum("eab,ea->eb", Ji, u))
    out = out.at[ej].add(jnp.einsum("eab,ea->eb", Jj, u))
    return _gauge(out + damping * v)


def _pcg(matvec, g, Dinv, num_iters):
    """Preconditioned conjugate gradient for H dx = g (fixed trip count,
    lax.scan).  Dinv applies the block-Jacobi preconditioner."""
    def apply_pre(x):
        return _gauge(jnp.einsum("nab,nb->na", Dinv, x))

    x0 = jnp.zeros_like(g)
    r0 = g                                   # residual of H x = g at x=0
    z0 = apply_pre(r0)
    p0 = z0

    def step(carry, _):
        x, r, z, p, rz = carry
        Hp = matvec(p)
        pHp = jnp.sum(p * Hp)
        alpha = rz / jnp.where(jnp.abs(pHp) > 1e-20, pHp, 1e-20)
        x = x + alpha * p
        r = r - alpha * Hp
        z = apply_pre(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
        p = z + beta * p
        return (x, r, z, p, rz_new), None

    rz = jnp.sum(r0 * z0)
    (x, *_), _ = jax.lax.scan(step, (x0, r0, z0, p0, rz), None,
                              length=num_iters)
    return x


def _retract(nodes: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Apply the GN step on the manifold: the Jacobians are w.r.t. LEFT
    perturbations exp(eps) X, so the update is X <- exp(-dx) X (node 0's
    dx is zero by the gauge projection)."""
    return sim3.log_sim3(sim3.exp_sim3(-dx) @ sim3.exp_sim3(nodes))


def _block_inv(D, damping):
    """Invert per-node (7x7) diagonal blocks + damping (batched solve)."""
    N = D.shape[0]
    eye = jnp.eye(7, dtype=D.dtype)
    Dd = D + damping * eye[None]
    # gauge node: identity block (its tangent is projected out anyway)
    Dd = Dd.at[0].set(eye)
    return jnp.linalg.solve(Dd, jnp.broadcast_to(eye[None], (N, 7, 7)))


@functools.partial(jax.jit, static_argnames=("num_iters", "cg_iters"))
def refine(graph: Sim3Graph, num_iters: int = 10, cg_iters: int = 25,
           huber_delta: float = 0.05, damping: float = 1e-6) -> BAResult:
    """Damped Gauss-Newton with matrix-free PCG — single device.

    Same problem and robust weighting as ``sim3.refine`` (tests assert the
    two agree on window graphs); cost per iteration O(E + N) instead of a
    dense (7(N-1))^2 solve."""
    N = graph.nodes.shape[0]
    ei, ej = graph.edges[:, 0], graph.edges[:, 1]

    def step(nodes, _):
        r, Ji, Jj, w = _linearize(nodes, graph.edges, graph.meas,
                                  graph.weights, huber_delta)
        g, D = _assemble_grad_diag(r, Ji, Jj, w, ei, ej, N)
        g = _gauge(g)
        Dinv = _block_inv(D, damping)
        mv = lambda v: _matvec(v, Ji, Jj, w, ei, ej, N, damping)
        dx = _pcg(mv, g, Dinv, cg_iters)
        rms = jnp.sqrt(jnp.mean(w[:, None] * r * r))
        return _retract(nodes, dx), rms

    nodes, hist = jax.lax.scan(step, graph.nodes, None, length=num_iters)
    return BAResult(nodes=nodes, rms_history=hist)


def pad_edges(graph: Sim3Graph, multiple: int) -> Sim3Graph:
    """Pad the edge list to a multiple with zero-weight identity
    self-edges on node 0 (their residual is log(X0 X0^-1 I) = 0 and the
    weight kills any numeric residue)."""
    E = graph.edges.shape[0]
    Ep = ((E + multiple - 1) // multiple) * multiple
    pad = Ep - E
    if pad == 0:
        return graph
    edges = jnp.concatenate(
        [graph.edges, jnp.zeros((pad, 2), graph.edges.dtype)], axis=0)
    meas = jnp.concatenate(
        [graph.meas, jnp.zeros((pad, 7), graph.meas.dtype)], axis=0)
    weights = jnp.concatenate(
        [graph.weights, jnp.zeros((pad,), graph.weights.dtype)], axis=0)
    return Sim3Graph(nodes=graph.nodes, edges=edges, meas=meas,
                     weights=weights)


def refine_sharded(graph: Sim3Graph, mesh: Mesh, axis: str = "edge",
                   num_iters: int = 10, cg_iters: int = 25,
                   huber_delta: float = 0.05,
                   damping: float = 1e-6) -> BAResult:
    """Edge-sharded distributed BA: each device linearizes ITS edge shard
    and every (N, 7)/(N, 7, 7) reduction — gradient, preconditioner
    blocks, and each CG matvec — is a ``psum`` over the mesh axis.  Node
    state is replicated (N is tiny next to E in SLAM graphs; the edge
    work is the O(E) term being distributed).

    Equality with the single-device ``refine`` is exact up to float
    reduction order (tests assert to fp32 tolerance)."""
    graph = pad_edges(graph, int(mesh.shape[axis]))
    N = graph.nodes.shape[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()))
    def run(nodes0, edges, meas, weights):
        ei, ej = edges[:, 0], edges[:, 1]

        def step(nodes, _):
            r, Ji, Jj, w = _linearize(nodes, edges, meas, weights,
                                      huber_delta)
            g, D = _assemble_grad_diag(r, Ji, Jj, w, ei, ej, N)
            g = jax.lax.psum(g, axis)
            D = jax.lax.psum(D, axis)
            g = _gauge(g)
            Dinv = _block_inv(D, damping)

            def mv(v):
                local = _matvec(v, Ji, Jj, w, ei, ej, N, 0.0)
                return _gauge(jax.lax.psum(local, axis) + damping * v)

            dx = _pcg(mv, g, Dinv, cg_iters)
            wsum = jax.lax.psum(jnp.sum(w[:, None] * r * r), axis)
            cnt = jax.lax.psum(jnp.asarray(r.size, jnp.float32), axis)
            rms = jnp.sqrt(wsum / cnt)
            return _retract(nodes, dx), rms

        nodes, hist = jax.lax.scan(step, nodes0, None, length=num_iters)
        return nodes, hist

    nodes, hist = run(graph.nodes, graph.edges, graph.meas, graph.weights)
    return BAResult(nodes=nodes, rms_history=hist)
