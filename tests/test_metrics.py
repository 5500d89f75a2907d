"""Accuracy-metric tests: CompareRotations port, ATE, and the
reprojection-error validation harness (the Tests.h analog,
src/Tests.h:21-206)."""

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.utils import metrics


def test_compare_rotations_zero_for_identical():
    w = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)) * 0.3,
                    jnp.float32)
    R = lie.exp_so3(w)
    out = metrics.compare_rotations(R, R)
    assert float(out["mean_deg"]) < 1e-3
    assert float(out["max_deg"]) < 1e-2


def test_compare_rotations_alignment_invariance():
    """A global change of world frame (right-composition R_i -> R_i @ g)
    must not change the metric: CompareRotations.m:4-17 anchors both sets
    at their first element via R2*R2(1)'*R1(1), which cancels exactly a
    right-multiplied gauge."""
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(6, 3)) * 0.2, jnp.float32)
    R1 = lie.exp_so3(w)
    noise = lie.exp_so3(jnp.asarray(rng.normal(size=(6, 3)) * 0.01,
                                    jnp.float32))
    R2 = noise @ R1
    g = lie.exp_so3(jnp.asarray([0.4, -0.2, 0.1], jnp.float32))
    out_a = metrics.compare_rotations(R1, R2)
    out_b = metrics.compare_rotations(R1, R2 @ g[None])
    assert abs(float(out_a["rms_deg"]) - float(out_b["rms_deg"])) < 0.05


def test_ate_rmse_zero_and_scale_aligned():
    rng = np.random.default_rng(2)
    poses = jnp.asarray(rng.normal(size=(8, 6)) * 0.1, jnp.float32)
    assert float(metrics.ate_rmse(poses, poses)) < 1e-4
    # pure scale difference on translations is absorbed by Umeyama
    scaled = poses.at[:, 3:].multiply(2.0)
    assert float(metrics.ate_rmse(scaled, poses, align_scale=True)) < 1e-3


def test_reprojection_error_zero_for_true_pose():
    depth = jnp.full((24, 32), 2.0)
    true_pose = jnp.asarray([0.01, -0.004, 0.002, 0.03, 0.01, -0.02],
                            jnp.float32)
    out = metrics.reprojection_error(true_pose, depth, true_pose,
                                     30.0, 30.0, 16.0, 12.0)
    assert float(out["mean_px"]) < 1e-4
    assert int(out["num_points"]) == 24 * 32


def test_reprojection_error_monotone_in_pose_error():
    depth = jnp.full((24, 32), 2.0)
    true_pose = jnp.zeros(6)
    small = jnp.asarray([0.001, 0, 0, 0.002, 0, 0], jnp.float32)
    big = jnp.asarray([0.01, 0, 0, 0.02, 0, 0], jnp.float32)
    e_small = float(metrics.reprojection_error(
        small, depth, true_pose, 30.0, 30.0, 16.0, 12.0)["mean_px"])
    e_big = float(metrics.reprojection_error(
        big, depth, true_pose, 30.0, 30.0, 16.0, 12.0)["mean_px"])
    assert 0 < e_small < e_big


def test_reprojection_error_respects_masks():
    depth = jnp.full((24, 32), 2.0).at[0, 0].set(0.0)   # invalid pixel
    gmask = jnp.zeros((24, 32), bool).at[5:10, 5:10].set(True)
    out = metrics.reprojection_error(jnp.zeros(6), depth, jnp.zeros(6),
                                     30.0, 30.0, 16.0, 12.0,
                                     grad_mask=gmask)
    assert int(out["num_points"]) == 25
