"""Distributed Sim(3) BA: matrix-free PCG solver vs the dense golden
solver, and the edge-sharded psum version vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from egomotion_with_local_loop_closures_tpu.graph import ba, sim3


def _noisy_graph(rng, n_nodes=12, extra_edges=10, noise=0.02,
                 outliers=0):
    """Ground-truth chain + random loop edges, Lie-noise on measurements
    (the RandomSO3Graph-style harness, lifted to Sim(3))."""
    gt = [np.zeros(7, np.float32)]
    for _ in range(n_nodes - 1):
        step = rng.normal(size=7).astype(np.float32) * \
            np.asarray([0.1, 0.1, 0.1, 0.3, 0.3, 0.3, 0.05], np.float32)
        Tn = sim3.exp_sim3(jnp.asarray(step)) @ sim3.exp_sim3(
            jnp.asarray(gt[-1]))
        gt.append(np.asarray(sim3.log_sim3(Tn)))
    gt = np.stack(gt)

    edges, meas = [], []
    for k in range(n_nodes - 1):
        edges.append([k, k + 1])
    for _ in range(extra_edges):
        i, j = rng.choice(n_nodes, 2, replace=False)
        edges.append([min(i, j), max(i, j)])
    for (i, j) in edges:
        Z = sim3.exp_sim3(jnp.asarray(gt[j])) @ sim3.inv_sim3(
            sim3.exp_sim3(jnp.asarray(gt[i])))
        z = np.array(sim3.log_sim3(Z))
        z += rng.normal(size=7).astype(np.float32) * noise
        meas.append(z)
    meas = np.stack(meas)
    # corrupt only redundant (non-chain) edges: an outlier on a bridge
    # edge is unrecoverable by ANY robust loss (no alternative path)
    for k in range(min(outliers, extra_edges)):
        meas[n_nodes - 1 + k] += rng.normal(size=7) * 1.0

    # perturbed initialization
    init = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.05
    init[0] = gt[0]
    return sim3.Sim3Graph(
        nodes=jnp.asarray(init),
        edges=jnp.asarray(np.asarray(edges, np.int32)),
        meas=jnp.asarray(meas.astype(np.float32)),
        weights=jnp.ones((len(meas),), jnp.float32)), gt


def _node_err(nodes, gt):
    """Max Frobenius distance between node transforms (gauge-consistent:
    both anchored at node 0)."""
    Ta = np.asarray(sim3.exp_sim3(jnp.asarray(nodes)))
    Tb = np.asarray(sim3.exp_sim3(jnp.asarray(gt)))
    return float(np.abs(Ta - Tb).max())


def test_ba_converges_and_matches_dense_solver():
    rng = np.random.default_rng(0)
    graph, gt = _noisy_graph(rng, n_nodes=10, extra_edges=8, noise=0.01)
    dense = sim3.refine(graph, num_iters=12)[0]
    sparse = ba.refine(graph, num_iters=12, cg_iters=40).nodes
    # both reach the same optimum (different parameterizations en route)
    assert _node_err(sparse, dense) < 5e-3
    # and both actually reduced the error vs the perturbed init
    assert _node_err(sparse, gt) < _node_err(np.asarray(graph.nodes), gt)


def test_ba_residual_decreases():
    rng = np.random.default_rng(1)
    graph, _ = _noisy_graph(rng, n_nodes=16, extra_edges=14, noise=0.02)
    out = ba.refine(graph, num_iters=8, cg_iters=30)
    hist = np.asarray(out.rms_history)
    assert hist[-1] < 0.5 * hist[0]


def test_ba_robust_to_outlier_edges():
    """Huber weighting must (a) keep matching the dense golden solver in
    the presence of outlier edges and (b) beat the purely quadratic loss
    (huber_delta -> inf disables the robustifier)."""
    rng = np.random.default_rng(2)
    graph, gt = _noisy_graph(rng, n_nodes=12, extra_edges=12, noise=0.005,
                             outliers=3)
    robust = ba.refine(graph, num_iters=15, cg_iters=40).nodes
    dense = sim3.refine(graph, num_iters=15)[0]
    assert _node_err(robust, dense) < 5e-3
    quad = ba.refine(graph, num_iters=15, cg_iters=40,
                     huber_delta=1e6).nodes
    assert _node_err(robust, gt) < 0.7 * _node_err(quad, gt)


def test_sharded_ba_matches_single_device():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs the virtual multi-device CPU mesh")
    mesh = Mesh(np.asarray(devs[:4]).reshape(4), ("edge",))
    rng = np.random.default_rng(3)
    graph, _ = _noisy_graph(rng, n_nodes=14, extra_edges=11, noise=0.02)
    single = ba.refine(graph, num_iters=6, cg_iters=25).nodes
    shard = ba.refine_sharded(graph, mesh, num_iters=6, cg_iters=25).nodes
    np.testing.assert_allclose(np.asarray(shard), np.asarray(single),
                               atol=2e-3)


def test_pad_edges_zero_contribution():
    rng = np.random.default_rng(4)
    graph, _ = _noisy_graph(rng, n_nodes=8, extra_edges=5, noise=0.02)
    padded = ba.pad_edges(graph, 8)
    assert padded.edges.shape[0] % 8 == 0
    a = ba.refine(graph, num_iters=5, cg_iters=25).nodes
    b = ba.refine(padded, num_iters=5, cg_iters=25).nodes
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
