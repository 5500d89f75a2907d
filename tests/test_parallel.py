"""Sharding tests on the virtual 8-device CPU mesh: pixel-sharded GN must
match the single-device linearization; multi-video batching must advance
independent streams identically to serial runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.parallel import mesh as mesh_mod
from egomotion_with_local_loop_closures_tpu.parallel import sharded
from egomotion_with_local_loop_closures_tpu.runtime import pipeline
from egomotion_with_local_loop_closures_tpu.track import alignment
from egomotion_with_local_loop_closures_tpu.utils import synthetic

CFG = ELLCConfig(rows=96, cols=128, fx=110.0, fy=110.0, cx=64.0, cy=48.0)


def _pair(seed=0):
    scene = synthetic.make_room_scene(seed=11, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    img0, depth0 = synthetic.render(scene, jnp.zeros(6), CFG.rows, CFG.cols,
                                    fx, fy, cx, cy)
    pose = jnp.asarray([0.004, -0.002, 0.001, 0.02, 0.01, -0.005])
    img1, _ = synthetic.render(scene, pose, CFG.rows, CFG.cols,
                               fx, fy, cx, cy)
    kf = alignment.make_keyframe_levels(img0, depth0,
                                        jnp.full(CFG.shape, 1e-3), CFG)
    from egomotion_with_local_loop_closures_tpu.image import pyramid
    cur = alignment.make_current_levels(
        pyramid.build_pyramid(img1, CFG.num_levels))
    return kf, cur, pose


def test_pixel_sharded_gn_matches_single_device():
    m = mesh_mod.make_mesh(video=1, pixel=4)
    kf, cur, pose = _pair()
    H_sh, g_sh = sharded.sharded_gn_quantities(kf[0], cur[0],
                                               jnp.zeros(6), 0, CFG, m)
    H_ref, g_ref, _, _, _ = alignment._gn_quantities(
        kf[0], cur[0], jnp.zeros(6), CFG.level_intrinsics(0), CFG)
    np.testing.assert_allclose(np.asarray(H_sh), np.asarray(H_ref),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=2e-3, atol=1.0)


def test_pixel_sharded_gn_step_converges():
    m = mesh_mod.make_mesh(video=1, pixel=8)
    kf, cur, true_pose = _pair()
    # jit once: un-jitted, each eager call re-stages the shard_map and
    # pays a full XLA compile (this one test used to take 20 minutes)
    step = jax.jit(lambda k, c, p: sharded.sharded_gn_step(
        k, c, p, 0, CFG, m))
    pose = jnp.zeros(6)
    for _ in range(10):
        pose = step(kf[0], cur[0], pose)
    from egomotion_with_local_loop_closures_tpu.geom import lie
    ang = float(lie.rotation_angle_deg(lie.exp_se3(pose)[:3, :3],
                                       lie.exp_se3(true_pose)[:3, :3]))
    assert ang < 0.2, f"sharded GN rotation error {ang}"


def test_batched_videos_match_serial():
    V = 4
    m = mesh_mod.make_mesh(video=V, pixel=1)
    scenes = [synthetic.make_room_scene(seed=s, depth=1.25, half_width=1.7,
                                        half_height=1.15) for s in range(V)]
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    K = CFG.keyframe_interval

    all_imgs = []
    for v in range(V):
        gt = synthetic.trajectory(K + 1, seed=v, rot_step=0.0015,
                                  trans_step=0.02)
        imgs = [synthetic.render(scenes[v], p, CFG.rows, CFG.cols,
                                 fx, fy, cx, cy)[0] for p in gt]
        all_imgs.append(jnp.stack(imgs))
    batch = jnp.stack(all_imgs)      # (V, K+1, H, W)

    keys = jax.random.split(jax.random.PRNGKey(0), V)
    states = sharded.batched_init(batch[:, 0], keys, CFG, m)
    states2, outs = sharded.batched_process_interval(
        states, batch[:, 1:], CFG, m)

    # serial comparison for video 2
    s = pipeline.init_pipeline(batch[2, 0], keys[2], CFG)
    s, outs_ref, _ = pipeline.process_interval(s, batch[2, 1:], CFG)
    # vmap batches the einsum reductions differently; float32
    # reassociation amplified through the depth-filter feedback gives
    # ~1e-4-level pose differences over an 8-frame interval
    np.testing.assert_allclose(np.asarray(outs.pose_wrt_world[2]),
                               np.asarray(outs_ref.pose_wrt_world),
                               atol=2e-3)
    # outputs sharded over the video axis
    assert len(outs.pose_wrt_world.sharding.device_set) == V
