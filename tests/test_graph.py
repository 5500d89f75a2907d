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


def test_rotation_sanity_projection():
    """AverageSO3Graph.m:80-91: de-orthonormalized input rotations (e.g.
    float text round-trips on the file-fed path) are re-projected onto
    SO(3) via U*round(S)*V'; improper or badly-scaled inputs raise."""
    import pytest
    R_gt, RR, I = ra.random_so3_graph(12, completeness=0.5, sigma=0.01,
                                      seed=5)
    # perturb every edge off the manifold by ~0.5% (below the warning
    # threshold): the solver must still recover the graph because the
    # inputs are re-projected before averaging
    rng = np.random.default_rng(0)
    RR_bad = RR * (1.0 + 0.005 * rng.standard_normal((len(RR), 1, 1)))
    RR_bad += 0.003 * rng.standard_normal(RR.shape)
    R = ra.average_so3_graph(RR_bad, I)
    # outputs are proper rotations
    RtR = np.einsum("nji,njk->nik", R, R)
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (len(R), 1, 1)),
                               atol=1e-4)
    e = _errors(R_gt, R)
    assert float(e["mean_deg"]) < 2.0, dict(e)

    # improper rotation (negative determinant) is an error, as in the
    # reference (error('det(RR...')), not silently averaged
    RR_neg = RR.copy()
    RR_neg[3] = -RR_neg[3]
    with pytest.raises(ValueError, match="det"):
        ra.average_so3_graph(RR_neg, I)
    # singular values far from 1 are an error
    RR_scaled = RR.copy()
    RR_scaled[2] = 1.5 * RR_scaled[2]
    with pytest.raises(ValueError, match="singular"):
        ra.average_so3_graph(RR_scaled, I)


def test_perform_rotation_averaging_corrects_drifted_rotation():
    """Synthetic ELLC bootstrap batch under the reference keyframe-id
    convention (transition frame 1, keyframes at 8, 16 — main.cpp:404's
    frame_counter %% 8 rule): keyframe 16's odometry rotation is
    perturbed, but a loop edge 16->1 carries the true relative rotation.
    RA must pull KF 16 back."""
    # ground-truth world poses (rotation-only for clarity)
    w_gt = {1: np.zeros(3), 8: np.asarray([0.05, 0.02, -0.03]),
            16: np.asarray([0.1, -0.04, 0.06])}

    def rel(a, b):
        # pose of a w.r.t. b from world rotations
        return np.asarray(lie.relative(
            jnp.asarray(np.concatenate([w_gt[a], np.zeros(3)]),
                        dtype=jnp.float32),
            jnp.asarray(np.concatenate([w_gt[b], np.zeros(3)]),
                        dtype=jnp.float32)))

    drift = np.asarray([0.04, 0.03, -0.05, 0, 0, 0], np.float32)
    e_8_1 = rel(8, 1)
    e_16_8 = np.asarray(lie.compose(jnp.asarray(drift),
                                    jnp.asarray(rel(16, 8))))
    # first-interval KF edge has gap 7 (8-1) but later batches' gap-8
    # filter keys on frame-kf >= kf_interval; emulate the bootstrap batch
    # by passing the KF edges directly with gap >= 8 semantics disabled
    # for the first edge via an explicit 8-gap row (16, 8)
    odometry = np.zeros((2, 8))
    odometry[0] = [8, 1, *e_8_1]
    odometry[1] = [16, 8, *e_16_8]
    # loop edge with the true relative pose 16 w.r.t. 1
    extra = np.zeros((1, 8))
    extra[0] = [16, 1, *rel(16, 1)]
    # world poses (w.r.t. transition frame 1): identity, KF8 true, KF16
    # drifted (odometry-composed)
    w16_drift = np.asarray(lie.compose(jnp.asarray(e_16_8),
                                       jnp.asarray(rel(8, 1))))
    pose_abs = np.zeros((3, 8))
    pose_abs[0] = [1, 1, 0, 0, 0, 0, 0, 0]
    pose_abs[1] = [8, 1, *e_8_1]
    pose_abs[2] = [16, 1, *w16_drift]

    out = batch.perform_rotation_averaging(odometry, extra, pose_abs,
                                           transition_id=1)
    # corrected rotation of KF 16 must be much closer to truth than drift
    R_true = np.asarray(lie.exp_so3(jnp.asarray(w_gt[16], dtype=jnp.float32)))
    R_drift = np.asarray(lie.exp_so3(jnp.asarray(
        w16_drift[:3], dtype=jnp.float32)))
    R_corr = np.asarray(lie.exp_so3(jnp.asarray(
        out[2, 1:4], dtype=jnp.float32)))
    err_drift = float(lie.rotation_angle_deg(jnp.asarray(R_drift),
                                             jnp.asarray(R_true)))
    err_corr = float(lie.rotation_angle_deg(jnp.asarray(R_corr),
                                            jnp.asarray(R_true)))
    assert err_corr < err_drift / 2, (err_corr, err_drift)
    # translations preserved from the input world poses — this is the
    # regression line for the bootstrap keyframe-selection bug: with the
    # steady-state-only mask ((id - 1) %% 8 == 0) keyframes 8 and 16 are
    # NOT selected and their translations come back as zeros
    np.testing.assert_allclose(out[1, 4:7], pose_abs[1, 5:8], atol=1e-6)
    np.testing.assert_allclose(out[2, 4:7], pose_abs[2, 5:8], atol=1e-6)


def test_bootstrap_batch_keyframe_translations_survive():
    """Full bootstrap-shaped batch: transition 1, per-frame pose rows
    2..24, keyframes at 8/16/24, NON-zero translations everywhere.  Every
    keyframe row of the RA output must keep its original translation and
    every non-KF row must be a finite re-concatenation (no zeroed poses).
    Mirrors perform_rotation_averaging_transition1.m:39-41 is_bootstrap."""
    rng = np.random.default_rng(7)
    K = 8
    ids = np.arange(2, 25)              # frames 2..24 (KFs 8, 16, 24)
    # smooth synthetic world trajectory w.r.t. frame 1
    world = {1: np.zeros(6, np.float32)}
    for f in ids:
        w = np.zeros(6, np.float32)
        w[:3] = 0.01 * (f - 1) * np.asarray([1.0, -0.5, 0.3])
        w[3:] = 0.05 * (f - 1) * np.asarray([0.2, 1.0, -0.4])
        world[int(f)] = w

    def rel(a, b):
        return np.asarray(lie.relative(jnp.asarray(world[a]),
                                       jnp.asarray(world[b])))

    pose_abs = np.zeros((1 + len(ids), 8))
    pose_abs[0] = [1, 1, 0, 0, 0, 0, 0, 0]
    odometry = np.zeros((len(ids), 8))
    kf = 1
    for i, f in enumerate(ids):
        f = int(f)
        pose_abs[1 + i] = [f, 1, *world[f]]
        odometry[i] = [f, kf, *rel(f, kf)]
        if f % K == 0:
            kf = f

    # a loop edge 24->1 connects the transition frame into the KF chain
    # (the bootstrap's first KF edge (8, 1) has gap 7 and is filtered by
    # the >= kf_interval rule — transition1.m:24 "does not take 1 as kf";
    # in production the bootstrap batch runs with loop closures ON)
    extra = np.zeros((1, 8))
    extra[0] = [24, 1, *rel(24, 1)]
    out = batch.perform_rotation_averaging(odometry, extra, pose_abs,
                                           transition_id=1, kf_interval=K)
    by_id = {int(r[0]): r for r in out}
    for f in (8, 16, 24):
        np.testing.assert_allclose(
            by_id[f][4:7], world[f][3:6], atol=1e-5,
            err_msg=f"keyframe {f} translation not preserved through RA")
        # noise-free odometry: rotations must round-trip too
        np.testing.assert_allclose(by_id[f][1:4], world[f][:3], atol=1e-4)
    assert np.isfinite(out).all()
    # non-KF rows re-concatenate onto their keyframe: frame 20 rides KF 16
    np.testing.assert_allclose(by_id[20][1:7], world[20], atol=1e-4)
