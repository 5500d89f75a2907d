"""Rotation-averaging tests using the RandomSO3Graph harness the reference
ships for its MATLAB solver (SO3GraphAveraging/Example1.m pattern)."""

import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.graph import batch, rotation_averaging as ra
from egomotion_with_local_loop_closures_tpu.utils import metrics


def _errors(R_gt, R_est):
    return metrics.compare_rotations(jnp.asarray(R_est, dtype=jnp.float32),
                                     jnp.asarray(R_gt, dtype=jnp.float32))


def test_noise_only_graph():
    R_gt, RR, I = ra.random_so3_graph(30, completeness=0.4, sigma=0.02,
                                      seed=0)
    R = ra.average_so3_graph(RR, I)
    e = _errors(R_gt, R)
    # edge noise sigma = 0.02 rad = 1.15 deg; errors are measured anchored
    # at node 0 (CompareRotations.m semantics), so ~noise level is optimal
    assert float(e["mean_deg"]) < 1.2, dict(e)
    # must beat the raw spanning-tree chain by a wide margin
    QQ = np.asarray(lie.quat_from_matrix(jnp.asarray(RR, dtype=jnp.float32)))
    Q0 = ra.spanning_tree_init(QQ, I, 30)
    R0 = np.asarray(lie.matrix_from_quat(jnp.asarray(Q0, dtype=jnp.float32)))
    e0 = _errors(R_gt, R0)
    assert float(e["mean_deg"]) < 0.3 * float(e0["mean_deg"])


def test_outlier_robustness():
    # 25% outlier edges: L1 init + IRLS must still recover the graph
    R_gt, RR, I = ra.random_so3_graph(40, completeness=0.5, sigma=0.05,
                                      num_outliers=I_count(40, 0.5) // 4,
                                      seed=1)
    R = ra.average_so3_graph(RR, I)
    e = _errors(R_gt, R)
    assert float(e["median_deg"]) < 2.0, dict(e)


def I_count(n, completeness):
    # approximate edge count of random_so3_graph for outlier sizing
    return int((n - 1) + completeness * n * (n - 1) / 2 * 0.9)


def test_spanning_tree_exact_on_noiseless():
    R_gt, RR, I = ra.random_so3_graph(15, completeness=0.3, sigma=0.0, seed=2)
    QQ = np.asarray(lie.quat_from_matrix(jnp.asarray(RR, dtype=jnp.float32)))
    Q0 = ra.spanning_tree_init(QQ, I, 15)
    R0 = np.asarray(lie.matrix_from_quat(jnp.asarray(Q0, dtype=jnp.float32)))
    e = _errors(R_gt, R0)
    # float32 quaternion chains accumulate ~0.03 deg
    assert float(e["max_deg"]) < 0.1, dict(e)


def test_disconnected_component_handling():
    R_gt, RR, I = ra.random_so3_graph(10, completeness=0.3, sigma=0.01, seed=3)
    # add two isolated nodes connected only to each other
    I2 = np.concatenate([I, [[10], [11]]], axis=1)
    RR2 = np.concatenate([RR, np.eye(3)[None]], axis=0)
    R = ra.average_so3_graph(RR2, I2)
    assert R.shape == (12, 3, 3)
    e = _errors(R_gt, R[:10])
    assert float(e["mean_deg"]) < 1.0


def test_perform_rotation_averaging_corrects_drifted_rotation():
    """Synthetic ELLC batch: 3 keyframes (1, 9, 17) + per-frame world
    poses; keyframe 17's odometry rotation is perturbed, but a loop edge
    17->1 carries the true relative rotation.  RA must pull KF 17 back."""
    rng = np.random.default_rng(0)
    kf_ids = [1, 9, 17]
    # ground-truth world poses (rotation-only for clarity)
    w_gt = {1: np.zeros(3), 9: np.asarray([0.05, 0.02, -0.03]),
            17: np.asarray([0.1, -0.04, 0.06])}

    def rel(a, b):
        # pose of a w.r.t. b from world rotations
        return np.asarray(lie.relative(
            jnp.asarray(np.concatenate([w_gt[a], np.zeros(3)]),
                        dtype=jnp.float32),
            jnp.asarray(np.concatenate([w_gt[b], np.zeros(3)]),
                        dtype=jnp.float32)))

    drift = np.asarray([0.04, 0.03, -0.05, 0, 0, 0], np.float32)
    e_9_1 = rel(9, 1)
    e_17_9 = np.asarray(lie.compose(jnp.asarray(drift),
                                    jnp.asarray(rel(17, 9))))
    odometry = np.zeros((2, 8))
    odometry[0] = [9, 1, *e_9_1]
    odometry[1] = [17, 9, *e_17_9]
    # loop edge with the true relative pose 17 w.r.t. 1
    extra = np.zeros((1, 8))
    extra[0] = [17, 1, *rel(17, 1)]
    # world poses (w.r.t. transition frame 1): identity, KF9 true, KF17
    # drifted (odometry-composed)
    w17_drift = np.asarray(lie.compose(jnp.asarray(e_17_9),
                                       jnp.asarray(rel(9, 1))))
    pose_abs = np.zeros((3, 8))
    pose_abs[0] = [1, 1, 0, 0, 0, 0, 0, 0]
    pose_abs[1] = [9, 1, *e_9_1]
    pose_abs[2] = [17, 1, *w17_drift]

    out = batch.perform_rotation_averaging(odometry, extra, pose_abs,
                                           transition_id=1)
    # corrected rotation of KF 17 must be much closer to truth than drift
    R_true = np.asarray(lie.exp_so3(jnp.asarray(w_gt[17], dtype=jnp.float32)))
    R_drift = np.asarray(lie.exp_so3(jnp.asarray(
        w17_drift[:3], dtype=jnp.float32)))
    R_corr = np.asarray(lie.exp_so3(jnp.asarray(
        out[2, 1:4], dtype=jnp.float32)))
    err_drift = float(lie.rotation_angle_deg(jnp.asarray(R_drift),
                                             jnp.asarray(R_true)))
    err_corr = float(lie.rotation_angle_deg(jnp.asarray(R_corr),
                                            jnp.asarray(R_true)))
    assert err_corr < err_drift / 2, (err_corr, err_drift)
    # translations preserved from the input world poses
    np.testing.assert_allclose(out[1, 4:7], pose_abs[1, 5:8], atol=1e-6)
