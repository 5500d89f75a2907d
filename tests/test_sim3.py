"""Sim(3) Lie-op and pose-graph refinement tests (graph/sim3.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.graph import sim3


def _rand7(key, rot=0.3, trans=0.5, scale=0.2):
    kw, kv, ks = jax.random.split(key, 3)
    return jnp.concatenate([
        rot * jax.random.normal(kw, (3,)),
        trans * jax.random.normal(kv, (3,)),
        scale * jax.random.normal(ks, (1,))])


def test_exp_log_roundtrip():
    for i in range(5):
        xi = _rand7(jax.random.PRNGKey(i))
        T = sim3.exp_sim3(xi)
        back = sim3.log_sim3(T)
        np.testing.assert_allclose(np.asarray(back), np.asarray(xi),
                                   rtol=1e-4, atol=1e-5)


def test_exp_structure_and_identity():
    xi = _rand7(jax.random.PRNGKey(0))
    T = sim3.exp_sim3(xi)
    s = float(xi[6])
    A = np.asarray(T[:3, :3])
    # det(e^s R) = e^{3s}
    np.testing.assert_allclose(np.linalg.det(A), np.exp(3 * s), rtol=1e-4)
    R = A * np.exp(-s)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sim3.exp_sim3(jnp.zeros(7))),
                               np.eye(4), atol=1e-6)
    # zero-scale case reduces to SE(3)
    xi6 = jnp.asarray([0.1, -0.2, 0.05, 0.3, 0.1, -0.4])
    np.testing.assert_allclose(
        np.asarray(sim3.exp_sim3(sim3.se3_to_sim3(xi6))),
        np.asarray(lie.exp_se3(xi6)), rtol=1e-5, atol=1e-6)


def test_inv_sim3():
    xi = _rand7(jax.random.PRNGKey(3))
    T = sim3.exp_sim3(xi)
    np.testing.assert_allclose(np.asarray(sim3.inv_sim3(T) @ T), np.eye(4),
                               atol=1e-5)


def test_noiseless_graph_zero_residual():
    key = jax.random.PRNGKey(7)
    n = 8
    nodes = jnp.stack([_rand7(jax.random.fold_in(key, i), rot=0.2,
                              trans=0.3, scale=0.1) for i in range(n)])
    edges, meas = [], []
    for k in range(n - 1):
        Z = sim3.exp_sim3(nodes[k + 1]) @ sim3.inv_sim3(
            sim3.exp_sim3(nodes[k]))
        edges.append([k, k + 1])
        meas.append(sim3.log_sim3(Z))
    g = sim3.Sim3Graph(nodes=nodes,
                       edges=jnp.asarray(edges, jnp.int32),
                       meas=jnp.stack(meas),
                       weights=jnp.ones(n - 1))
    r = sim3.residuals(g.nodes, g.edges, g.meas)
    assert float(jnp.abs(r).max()) < 1e-4


def test_refine_recovers_noisy_graph():
    """Perturbed initialization + redundant edges (odometry + skip-2 loop
    edges): GN must pull nodes back near ground truth up to gauge."""
    key = jax.random.PRNGKey(11)
    n = 10
    gt = jnp.stack([_rand7(jax.random.fold_in(key, i), rot=0.25,
                           trans=0.4, scale=0.1) for i in range(n)])
    edges, meas = [], []
    for k in range(n - 1):
        Z = sim3.exp_sim3(gt[k + 1]) @ sim3.inv_sim3(sim3.exp_sim3(gt[k]))
        edges.append([k, k + 1])
        meas.append(sim3.log_sim3(Z))
    for k in range(n - 2):
        Z = sim3.exp_sim3(gt[k + 2]) @ sim3.inv_sim3(sim3.exp_sim3(gt[k]))
        edges.append([k, k + 2])
        meas.append(sim3.log_sim3(Z))
    noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 99), gt.shape)
    init = gt + noise.at[0].set(0.0)      # anchor stays at ground truth
    g = sim3.Sim3Graph(nodes=init,
                       edges=jnp.asarray(edges, jnp.int32),
                       meas=jnp.stack(meas),
                       weights=jnp.ones(len(edges)))
    out, hist = sim3.refine(g, num_iters=8)
    err0 = float(jnp.abs(init - gt).max())
    err1 = float(jnp.abs(out - gt).max())
    assert err1 < 0.02, f"refined error {err1} (init {err0})"
    assert float(hist[-1]) < float(hist[0])


def test_graph_from_trajectory_consistent():
    """A graph built from a clean trajectory with unit rescales has ~zero
    residuals (construction convention check)."""
    poses = np.asarray([[0.02 * k, -0.01 * k, 0.0, 0.1 * k, 0.0, 0.05 * k]
                        for k in range(6)], np.float32)
    g = sim3.graph_from_trajectory(poses, np.ones(6))
    r = sim3.residuals(g.nodes, g.edges, g.meas)
    assert float(jnp.abs(r).max()) < 1e-3


def test_closed_form_exp_matches_expm():
    """The closed-form exp_sim3 (Rodrigues + W-coefficient integral) must
    equal the matrix exponential of the algebra element across all Taylor
    regimes: generic, theta->0, s->0, both->0, and large values."""
    import jax.scipy.linalg as jsl
    rng = np.random.default_rng(7)
    cases = [rng.normal(size=7) * 0.5 for _ in range(8)]
    cases += [np.array([1e-6, -2e-6, 1e-6, 0.3, -0.2, 0.1, 0.4]),   # th->0
              np.array([0.4, -0.3, 0.2, 0.3, -0.2, 0.1, 1e-7]),     # s->0
              np.array([1e-7, 0, 0, 0.3, -0.2, 0.1, 1e-8]),         # both
              np.array([0, 0, 0, 0, 0, 0, 0.0]),                    # id
              np.array([2.0, -1.5, 1.0, 0.8, -0.5, 0.3, 0.9])]      # large
    for c in cases:
        xi = jnp.asarray(c, jnp.float32)
        ours = np.asarray(sim3.exp_sim3(xi))
        ref = np.asarray(jsl.expm(sim3.hat_sim3(xi)))
        np.testing.assert_allclose(ours, ref, atol=5e-5,
                                   err_msg=f"case {c}")
        # and log inverts it
        back = np.asarray(sim3.log_sim3(jnp.asarray(ref)))
        np.testing.assert_allclose(back, c.astype(np.float32), atol=5e-4,
                                   err_msg=f"log case {c}")
