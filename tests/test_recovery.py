"""Connection-recovery + rotation-trigger tests (FLAG_RESTORE_CONNECTION,
GlobalOptimize.cpp:717-943 / main.cpp:252-324; triggerRotation,
GlobalOptimize.cpp:671-714)."""

import numpy as np
import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth import state as dstate
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.loop import closure, recovery
from egomotion_with_local_loop_closures_tpu.runtime import pipeline, runner
from egomotion_with_local_loop_closures_tpu.utils import synthetic

CFG = ELLCConfig(rows=96, cols=128, fx=110.0, fy=110.0, cx=64.0, cy=48.0,
                 restore_connection=True)


def test_trigger_hysteresis():
    c = closure.LoopCloser(CFG.replace(use_loop_closure_trigger=True))
    # camera center aligned with view vector -> angle 0: stays off
    assert not c.update_trigger(jnp.asarray([0., 0., 0., 0., 0., -1.]))
    # sideways center -> 90 deg > TRIGGER_ON=20: latches on
    assert c.update_trigger(jnp.asarray([0., 0., 0., 0.5, 0., 0.]))
    # intermediate angle: stays on (hysteresis; 20 > angle > 1)
    T = lie.exp_se3(jnp.asarray([0., 0., 0., 0.05, 0., -1.]))
    assert c.update_trigger(jnp.asarray([0., 0., 0., 0.05, 0., -1.]))
    # back to aligned (< TRIGGER_OFF=1 deg): unlatches
    assert not c.update_trigger(jnp.asarray([0., 0., 0., 0., 0., -1.]))


def test_trigger_angle_matches_reference_formula():
    # R = I, t = [1,0,0]: center = -t, view = e_z -> 90 deg (with 180/3.14)
    ang = float(closure.trigger_angle_deg(
        jnp.asarray([0., 0., 0., 1., 0., 0.])))
    np.testing.assert_allclose(ang, (np.pi / 2) * 180.0 / 3.14, rtol=1e-5)


def _scene_and_images():
    scene = synthetic.make_room_scene(seed=3, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    fx, fy, cx, cy = CFG.level_intrinsics(0)

    def render(pose):
        return synthetic.render(scene, jnp.asarray(pose, jnp.float32),
                                CFG.rows, CFG.cols, fx, fy, cx, cy)[0]
    return render


def test_check_connection_threshold():
    assert recovery.check_connection(0.0, CFG)
    assert not recovery.check_connection(5.0, CFG)


def test_find_connection_relocalizes():
    """Push one keyframe interval into the window, then re-localize a
    nearby stray frame against it: the propagated depth map must revive
    occupancy and the recovered pose must be close to ground truth."""
    render = _scene_and_images()
    imgs = [render([0, 0, 0, 0.004 * i, 0, 0])
            for i in range(CFG.keyframe_interval + 1)]

    state = pipeline.init_pipeline(imgs[0], jax.random.PRNGKey(0), CFG)
    for img in imgs[1:-1]:
        state, _ = pipeline.track_refine_step(state, img, CFG)
    state, _, snapshot = pipeline.keyframe_step(state, imgs[-1], CFG)
    assert snapshot is not None, "restore_connection must produce snapshots"

    closer = closure.LoopCloser(CFG)
    closer.push_keyframe(1, snapshot.image, snapshot.kf_levels,
                         snapshot.weight_levels, snapshot.world_pose,
                         jnp.zeros(6), float(snapshot.rescale),
                         float(snapshot.seeds),
                         depth_state=snapshot.depth_state, match=False)

    # stray frame near the snapshotted keyframe's viewpoint (id gap > 8)
    stray_pose = np.asarray(snapshot.world_pose).copy()
    stray_pose[3] += 0.01
    stray_img = render(stray_pose)
    rec = recovery.find_connection(closer, 30, stray_img, CFG)
    assert rec is not None, "re-localization failed"
    assert rec.matched_kf_id == 1
    assert rec.seeds > CFG.min_seeds_for_connection_lost
    rel_gt = lie.relative(jnp.asarray(stray_pose), snapshot.world_pose)
    d = np.asarray(rec.pose_wrt_matched) - np.asarray(rel_gt)
    assert np.abs(d[:3]).max() < 0.02, f"recovered rotation off: {d}"


def test_find_connection_respects_id_gap():
    render = _scene_and_images()
    img = render([0, 0, 0, 0, 0, 0])
    state = pipeline.init_pipeline(img, jax.random.PRNGKey(0), CFG)
    snap = pipeline.finalize_snapshot(state)
    closer = closure.LoopCloser(CFG)
    closer.push_keyframe(25, snap.image, snap.kf_levels, snap.weight_levels,
                         snap.world_pose, jnp.zeros(6), 1.0, 50.0,
                         depth_state=snap.depth_state, match=False)
    # gap 30-25 = 5 <= MIN_MATCH_DIFFERENCE=8: candidate must be skipped
    assert recovery.find_connection(closer, 30, img, CFG) is None


def test_runner_recovery_mode_runs(tmp_path):
    """End-to-end: run_sequence with restore_connection stays healthy on a
    normal sequence (never loses connection, outputs every frame)."""
    render = _scene_and_images()
    n = 2 * CFG.keyframe_interval + 2
    imgs = [np.asarray(render([0, 0, 0, 0.004 * i, 0, 0]))
            for i in range(n)]
    res = runner.run_sequence(iter(imgs), CFG, out_dir=str(tmp_path))
    assert res.extra["dropped_frames"] == []
    assert res.extra["recoveries"] == []
    assert len(res.frame_ids) == n - 1
    assert (res.seeds > 0).all()
