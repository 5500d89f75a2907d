"""Trajectory and rotation-graph accuracy metrics.

Ports the reference's in-pipeline accuracy reporting:
``matlab_scripts/SO3GraphAveraging/CompareRotations.m`` (mean/median/RMS
angular error in degrees between two rotation sets, after aligning the
first pair) and adds the standard ATE-RMSE used for the HUJI EgoSeg
benchmark targets (BASELINE.md).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.geom import lie


def compare_rotations(R1: jnp.ndarray, R2: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Angular errors (deg) between rotation sets (N,3,3) after anchoring
    both to their first element, as CompareRotations.m:4-17 does via
    ``R2*R2(1)'*R1(1)``."""
    # align: R2_aligned = R2 @ R2[0]^T @ R1[0]
    align = jnp.swapaxes(R2[0], -1, -2) @ R1[0]
    R2a = R2 @ align
    e = lie.rotation_angle_deg(R1, R2a)
    return {
        "mean_deg": jnp.mean(e),
        "median_deg": jnp.median(e),
        "rms_deg": jnp.sqrt(jnp.mean(e * e)),
        "max_deg": jnp.max(e),
    }


def ate_rmse(poses_est: jnp.ndarray, poses_gt: jnp.ndarray,
             align_scale: bool = True) -> jnp.ndarray:
    """Absolute trajectory error (RMSE of camera-center distances) after
    similarity alignment (Umeyama).  Poses are (N, 6) twists in the
    pipeline's poseWrtWorld convention (world -> camera); camera centers
    are ``-R^T t``."""
    def centers(poses):
        T = lie.exp_se3(poses)
        R, t = T[..., :3, :3], T[..., :3, 3]
        return -jnp.einsum("nji,nj->ni", R, t)

    X = centers(poses_est)   # (N, 3)
    Y = centers(poses_gt)
    mx, my = X.mean(0), Y.mean(0)
    Xc, Yc = X - mx, Y - my
    # Umeyama: find s, R, t minimizing ||Y - (s R X + t)||
    cov = Yc.T @ Xc / X.shape[0]
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, d]))
    R = U @ D @ Vt
    if align_scale:
        var_x = jnp.mean(jnp.sum(Xc * Xc, axis=1))
        s = jnp.sum(S * jnp.diag(D)) / jnp.maximum(var_x, 1e-12)
    else:
        s = 1.0
    X_aligned = s * Xc @ R.T + my
    err = jnp.linalg.norm(X_aligned - Y, axis=1)
    return jnp.sqrt(jnp.mean(err * err))


def reprojection_error(pose_est: jnp.ndarray,
                       depth_ref: jnp.ndarray,
                       pose_true: jnp.ndarray,
                       fx: float, fy: float, cx: float, cy: float,
                       grad_mask: jnp.ndarray | None = None
                       ) -> Dict[str, jnp.ndarray]:
    """Pose-accuracy check by dense point reprojection — the TPU-native
    analog of the reference's (dead-code) validation helper
    ``Tests::calculateReprojectionError`` (``src/Tests.h:21-206``).

    The reference matches SURF keypoints between two frames and reports
    per-match and summed pixel reprojection error of the GN-estimated
    pose.  Here ground truth replaces feature matching: every reference
    pixel with known depth is back-projected, transformed by the
    *estimated* relative pose and by the *true* relative pose, projected
    into the second view, and the pixel displacement between the two
    projections is reported (mean / median / max / sum over valid
    pixels).  ``grad_mask`` optionally restricts to high-gradient pixels,
    mirroring the keypoint-like selection of the original.
    """
    H, W = depth_ref.shape
    from egomotion_with_local_loop_closures_tpu.geom import camera

    x, y = camera.pixel_grid(H, W, dtype=depth_ref.dtype)
    valid = depth_ref > 0
    if grad_mask is not None:
        valid = valid & grad_mask
    P = camera.backproject(x, y, jnp.where(valid, depth_ref, 1.0),
                           fx, fy, cx, cy)

    def proj(pose):
        T = lie.exp_se3(pose)
        Pt = jnp.einsum("ij,hwj->hwi", T[:3, :3], P) + T[:3, 3]
        u, v, z = camera.project(Pt, fx, fy, cx, cy, eps=1e-10)
        return u, v, z

    ue, ve, ze = proj(pose_est)
    ut, vt, zt = proj(pose_true)
    ok = valid & (ze > 1e-6) & (zt > 1e-6)
    d = jnp.sqrt((ue - ut) ** 2 + (ve - vt) ** 2)
    d = jnp.where(ok, d, jnp.nan)
    n = jnp.maximum(jnp.sum(ok), 1)
    return {
        "mean_px": jnp.nansum(d) / n,
        "median_px": jnp.nanmedian(d),
        "max_px": jnp.nanmax(jnp.where(ok, d, -jnp.inf)),
        "sum_px": jnp.nansum(d),
        "num_points": jnp.sum(ok),
    }
