"""Unit tests for geom.lie against dense matrix expm/logm ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egomotion_with_local_loop_closures_tpu.geom import lie


def _hat4(xi):
    w1, w2, w3, v1, v2, v3 = xi
    return np.array(
        [[0, -w3, w2, v1],
         [w3, 0, -w1, v2],
         [-w2, w1, 0, v3],
         [0, 0, 0, 0]], dtype=np.float64)


def _rand_twists(n, scale_w=0.5, scale_v=1.0, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, 3)) * scale_w
    v = rng.normal(size=(n, 3)) * scale_v
    return np.concatenate([w, v], axis=1).astype(np.float32)


def test_exp_se3_matches_matrix_expm():
    xis = _rand_twists(32)
    ours = np.asarray(lie.exp_se3(jnp.asarray(xis)))
    for xi, T in zip(xis, ours):
        ref = jax.scipy.linalg.expm(jnp.asarray(_hat4(xi), dtype=jnp.float64))
        np.testing.assert_allclose(T, np.asarray(ref), atol=1e-5)


def test_exp_se3_tiny_angle():
    xis = _rand_twists(8, scale_w=1e-6)
    ours = np.asarray(lie.exp_se3(jnp.asarray(xis)))
    for xi, T in zip(xis, ours):
        ref = jax.scipy.linalg.expm(jnp.asarray(_hat4(xi), dtype=jnp.float64))
        np.testing.assert_allclose(T, np.asarray(ref), atol=1e-6)


def test_log_exp_roundtrip():
    xis = jnp.asarray(_rand_twists(64))
    back = lie.log_se3(lie.exp_se3(xis))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xis), atol=2e-5)


def test_log_exp_roundtrip_large_angle():
    xis = jnp.asarray(_rand_twists(16, scale_w=1.0))
    back = lie.log_se3(lie.exp_se3(xis))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xis), atol=1e-4)


def test_compose_matches_reference_semantics():
    # concatenateRelativePose: dest = log(exp(a) @ exp(b))  (Frame.cpp:503-530)
    a, b = jnp.asarray(_rand_twists(2, seed=1))
    got = lie.compose(a, b)
    want = lie.log_se3(lie.exp_se3(a) @ lie.exp_se3(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_relative_roundtrip():
    # relative(a, b) composed back with b must reproduce a's world pose.
    a, b = jnp.asarray(_rand_twists(2, seed=2))
    rel = lie.relative(a, b)
    recon = lie.compose(rel, b)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(a), atol=2e-5)


def test_inverse_is_negation():
    xis = jnp.asarray(_rand_twists(8, seed=3))
    Ts = lie.exp_se3(xis)
    inv = lie.exp_se3(lie.inverse(xis))
    prod = Ts @ inv
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), prod.shape)
    np.testing.assert_allclose(np.asarray(prod), eye, atol=1e-5)


def test_inv_se3_matrix():
    xis = jnp.asarray(_rand_twists(8, seed=4))
    Ts = lie.exp_se3(xis)
    prod = Ts @ lie.inv_se3_matrix(Ts)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), prod.shape)
    np.testing.assert_allclose(np.asarray(prod), eye, atol=1e-5)


def test_quat_roundtrip():
    ws = jnp.asarray(_rand_twists(32, scale_w=1.2)[:, :3])
    R = lie.exp_so3(ws)
    q = lie.quat_from_matrix(R)
    R2 = lie.matrix_from_quat(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # log returns the principal axis-angle; compare as rotations so inputs
    # with |w| > pi (mapped to the equivalent short rotation) also pass.
    w2 = lie.log_quat(q)
    R3 = lie.exp_so3(w2)
    np.testing.assert_allclose(np.asarray(R3), np.asarray(R), atol=1e-5)
    norms = np.linalg.norm(np.asarray(ws), axis=-1)
    principal = norms < np.pi - 1e-3
    np.testing.assert_allclose(np.asarray(w2)[principal], np.asarray(ws)[principal],
                               atol=1e-4)


def test_quat_mul_matches_matrix_product():
    wa, wb = jnp.asarray(_rand_twists(2, seed=5)[:, :3])
    qa, qb = lie.exp_quat(wa), lie.exp_quat(wb)
    Rab = lie.matrix_from_quat(lie.quat_mul(qa, qb))
    want = lie.exp_so3(wa) @ lie.exp_so3(wb)
    np.testing.assert_allclose(np.asarray(Rab), np.asarray(want), atol=1e-5)


def test_rotation_angle_deg():
    w = jnp.asarray([0.1, 0.0, 0.0])
    Ra = lie.exp_so3(jnp.zeros(3))
    Rb = lie.exp_so3(w)
    ang = lie.rotation_angle_deg(Ra, Rb)
    np.testing.assert_allclose(float(ang), np.degrees(0.1), atol=1e-4)


def test_view_vector_identity():
    v = lie.view_vector(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(v), [0.0, 0.0, 1.0], atol=1e-7)


def test_vmap_and_jit():
    xis = jnp.asarray(_rand_twists(16, seed=6))
    f = jax.jit(jax.vmap(lambda x: lie.log_se3(lie.exp_se3(x))))
    np.testing.assert_allclose(np.asarray(f(xis)), np.asarray(xis), atol=2e-5)
