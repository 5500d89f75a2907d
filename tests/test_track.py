"""Gauss-Newton direct alignment tests on analytically rendered scenes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.image import pyramid
from egomotion_with_local_loop_closures_tpu.track import alignment
from egomotion_with_local_loop_closures_tpu.utils import synthetic

CFG = ELLCConfig(rows=96, cols=128, fx=110.0, fy=110.0, cx=64.0, cy=48.0)


def _render_pair(pose_cur, seed=0):
    scene = synthetic.make_room_scene(seed=seed)
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    img0, depth0 = synthetic.render(scene, jnp.zeros(6), CFG.rows, CFG.cols,
                                    fx, fy, cx, cy)
    img1, _ = synthetic.render(scene, pose_cur, CFG.rows, CFG.cols,
                               fx, fy, cx, cy)
    var0 = jnp.full(CFG.shape, 0.001)
    kf = alignment.make_keyframe_levels(img0, depth0, var0, CFG)
    cur = alignment.make_current_levels(pyramid.build_pyramid(img1, CFG.num_levels))
    return kf, cur


def _pose_err(a, b):
    """Rotation error (deg) + translation error between twists."""
    Ta, Tb = lie.exp_se3(a), lie.exp_se3(b)
    rot = float(lie.rotation_angle_deg(Ta[:3, :3], Tb[:3, :3]))
    tr = float(jnp.linalg.norm(Ta[:3, 3] - Tb[:3, 3]))
    return rot, tr


def test_align_recovers_known_motion():
    true = jnp.asarray([0.006, -0.004, 0.003, 0.015, -0.01, 0.008])
    kf, cur = _render_pair(true)
    pose, diag = alignment.align(kf, cur, jnp.zeros(6), CFG)
    rot, tr = _pose_err(pose, true)
    assert rot < 0.1, f"rotation error {rot} deg"
    assert tr < 2e-3, f"translation error {tr}"
    assert float(diag.valid_fraction) > 0.9


def test_align_zero_motion_stays_put():
    kf, cur = _render_pair(jnp.zeros(6))
    pose, diag = alignment.align(kf, cur, jnp.zeros(6), CFG)
    assert float(jnp.abs(pose).max()) < 1e-4
    # converged almost immediately at the finest level
    assert int(diag.iters_used[0]) <= 2


def test_align_larger_motion_coarse_to_fine():
    true = jnp.asarray([0.02, 0.015, -0.01, 0.05, 0.03, -0.02])
    kf, cur = _render_pair(true, seed=1)
    pose, _ = alignment.align(kf, cur, jnp.zeros(6), CFG)
    rot, tr = _pose_err(pose, true)
    assert rot < 0.3, f"rotation error {rot} deg"
    assert tr < 8e-3, f"translation error {tr}"


def test_align_warm_start_converges_faster():
    true = jnp.asarray([0.02, 0.015, -0.01, 0.05, 0.03, -0.02])
    kf, cur = _render_pair(true, seed=2)
    pose_ws, diag_ws = alignment.align(kf, cur, true, CFG)
    rot, tr = _pose_err(pose_ws, true)
    assert rot < 0.05 and tr < 1e-3
    # warm start must not be worse than the iteration budget and should
    # converge (weighted_pose < 1 at the finest level => early-out fired
    # or the final update was already insignificant)
    assert float(diag_ws.weighted_pose) < 1.5


def test_align_jit_and_vmap_batch():
    # batched alignment of several frames against one keyframe -- the
    # KF-interval parallelization axis (SURVEY.md §2.3)
    trues = jnp.asarray([
        [0.004, -0.002, 0.001, 0.01, 0.005, -0.004],
        [0.008, -0.004, 0.002, 0.02, 0.010, -0.008],
    ])
    scene = synthetic.make_room_scene(seed=3)
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    img0, depth0 = synthetic.render(scene, jnp.zeros(6), CFG.rows, CFG.cols,
                                    fx, fy, cx, cy)
    kf = alignment.make_keyframe_levels(img0, depth0,
                                        jnp.full(CFG.shape, 0.001), CFG)
    imgs = [synthetic.render(scene, t, CFG.rows, CFG.cols, fx, fy, cx, cy)[0]
            for t in trues]
    curs = [alignment.make_current_levels(
        pyramid.build_pyramid(i, CFG.num_levels)) for i in imgs]
    cur_batch = jax.tree.map(lambda *xs: jnp.stack(xs), *curs)

    f = jax.jit(jax.vmap(
        lambda c, p0: alignment.align(kf, c, p0, CFG)[0],
        in_axes=(0, 0)))
    poses = f(cur_batch, jnp.zeros((2, 6)))
    for p, t in zip(poses, trues):
        rot, tr = _pose_err(p, t)
        assert rot < 0.1 and tr < 3e-3


def test_masked_pixels_do_not_contribute():
    true = jnp.asarray([0.003, 0.002, -0.001, 0.01, -0.005, 0.004])
    kf, cur = _render_pair(true, seed=4)
    # zero out half the depth map; alignment should still work off the rest
    masked_depth = kf[0].depth.at[:, : CFG.cols // 2].set(0.0)
    kf0 = alignment.KeyframeLevel(kf[0].image, masked_depth, kf[0].var)
    from egomotion_with_local_loop_closures_tpu.depth import fusion
    depths, vars_ = fusion.build_depth_var_pyramid(
        masked_depth, jnp.where(masked_depth > 0, kf[0].var, -1.0),
        CFG.num_levels)
    kf_m = tuple(alignment.KeyframeLevel(k.image, d, v)
                 for k, d, v in zip(kf, depths, vars_))
    pose, diag = alignment.align(kf_m, cur, jnp.zeros(6), CFG)
    rot, tr = _pose_err(pose, true)
    assert rot < 0.2 and tr < 6e-3
    assert float(diag.valid_fraction) < 0.6


def test_depth_var_pyramid_fusion():
    from egomotion_with_local_loop_closures_tpu.depth import fusion
    depth = jnp.asarray([[2.0, 2.0], [0.0, 4.0]])
    var = jnp.asarray([[0.1, 0.1], [-1.0, 0.2]])
    d, v = fusion.fuse_level(depth, var)
    # ivar = [10, 10, 0, 5]; idepth weighted = 10*0.5 + 10*0.5 + 5*0.25
    ivar_sum = 25.0
    idepth_sum = 11.25
    np.testing.assert_allclose(float(d[0, 0]), ivar_sum / idepth_sum, rtol=1e-6)
    np.testing.assert_allclose(float(v[0, 0]), 3 / ivar_sum, rtol=1e-6)
    # all-invalid cell
    d2, v2 = fusion.fuse_level(jnp.zeros((2, 2)), jnp.full((2, 2), -1.0))
    assert float(d2[0, 0]) == 0.0 and float(v2[0, 0]) == -1.0


def test_window_warp_gather_fallback_on_high_parallax():
    """When the displacement field spreads beyond the shift-and-blend
    window (oow_fraction > cfg.warp_oow_fallback), the linearization must
    fall back to the exact gather warp inside the same program
    (alignment._gn_quantities lax.cond) — censoring otherwise starves
    the GN on large-motion revisit trajectories (round-5 battery)."""
    from egomotion_with_local_loop_closures_tpu.runtime import pipeline

    cfg = CFG
    # a large in-plane rotation: the flow field varies across the image
    # (magnitude ~ omega * radius, direction tangential), so no global
    # integer shift can absorb it and the window censors heavily
    pose_big = jnp.asarray([0.0, 0.0, 0.25, 0.0, 0.0, 0.0], jnp.float32)
    kf, cur = _render_pair(pose_big)
    intr = cfg.level_intrinsics(0)
    # the window linearization at the true pose censors > the threshold
    *_, oow = alignment._gn_quantities(kf[0], cur[0], pose_big, intr, cfg,
                                       window=cfg.warp_window[0])
    assert float(oow) > cfg.warp_oow_fallback, float(oow)
    # oow_fraction is surfaced per frame, and the host-side wrapper
    # redispatches the interval with the gather-warp program: its output
    # must equal the pure-gather config's output on this interval
    scene = synthetic.make_room_scene(seed=0)
    fx, fy, cx, cy = cfg.level_intrinsics(0)
    K = cfg.keyframe_interval
    imgs = [synthetic.render(scene,
                             jnp.asarray([0.0, 0.0, 0.09 * i, 0.0, 0.0, 0.0]),
                             cfg.rows, cfg.cols, fx, fy, cx, cy)[0]
            for i in range(K + 1)]
    state0 = pipeline.init_pipeline(imgs[0], jax.random.PRNGKey(0), cfg)
    chunk = jnp.stack(imgs[1:])
    _, outs_w, _ = pipeline.process_interval(state0, chunk, cfg)
    assert float(np.max(np.asarray(outs_w.oow_fraction))) \
        > cfg.warp_oow_fallback
    _, outs_fb, _ = pipeline.process_interval_with_fallback(state0, chunk,
                                                            cfg)
    _, outs_g, _ = pipeline.process_interval(
        state0, chunk, cfg.replace(use_window_warp=False))
    np.testing.assert_allclose(np.asarray(outs_fb.pose_wrt_world),
                               np.asarray(outs_g.pose_wrt_world))
    # and the gather redo tracks the fast rotation far better than the
    # censored window pass
    gt_last = jnp.asarray([0.0, 0.0, 0.09 * K, 0.0, 0.0, 0.0])
    rot_fb, _ = _pose_err(jnp.asarray(outs_fb.pose_wrt_world[-1]), gt_last)
    assert rot_fb < 1.0, rot_fb
