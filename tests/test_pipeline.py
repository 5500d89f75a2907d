"""End-to-end pipeline tests: interval-scanned tracking + keyframing on a
synthetic sequence with ground truth."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.runtime import io as ellc_io
from egomotion_with_local_loop_closures_tpu.runtime import pipeline, runner
from egomotion_with_local_loop_closures_tpu.utils import metrics, synthetic

CFG = ELLCConfig(rows=96, cols=128, fx=110.0, fy=110.0, cx=64.0, cy=48.0)


def _make_sequence(n, seed=4):
    scene = synthetic.make_room_scene(seed=11, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    gt = synthetic.trajectory(n, seed=seed, rot_step=0.0015, trans_step=0.02)
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    imgs = [synthetic.render(scene, p, CFG.rows, CFG.cols, fx, fy, cx, cy)[0]
            for p in gt]
    return imgs, gt


def test_run_sequence_end_to_end(tmp_path):
    imgs, gt = _make_sequence(17)
    res = runner.run_sequence(iter([np.asarray(i) for i in imgs]), CFG,
                              out_dir=str(tmp_path))
    assert len(res.frame_ids) == 16           # frames 2..17 tracked
    assert res.frame_ids[0] == 2
    # keyframes on ids divisible by 8 (the reference's frame_counter % 8
    # rule, main.cpp:404): frames 2-8 track KF 1, 9-16 KF 8, 17 KF 16
    assert list(np.unique(res.kf_ids)) == [1, 8, 16]
    # In pure GN mode the bootstrap error (tracking against random depth in
    # interval 1) persists in the world-pose chain — the reference relies
    # on rotation averaging to remove it.  What must be accurate by the end
    # of the run is the RELATIVE motion: compare frame 16 w.r.t. frame 10
    # against ground truth.
    j_a = list(res.frame_ids).index(10)
    j_b = list(res.frame_ids).index(16)
    rel_est = lie.relative(jnp.asarray(res.world_poses[j_b]),
                           jnp.asarray(res.world_poses[j_a]))
    rel_gt = lie.relative(gt[15], gt[9])
    ang = float(lie.rotation_angle_deg(lie.exp_se3(rel_est)[:3, :3],
                                       lie.exp_se3(rel_gt)[:3, :3]))
    # interval 2: depth is still converging; by interval 4 errors fall
    # below 0.5 deg (see test_trajectory_ate_on_longer_run)
    assert ang < 1.5, f"relative rotation error over frames 10-16: {ang}"
    # output files in reference format
    poses = ellc_io.read_pose_file(os.path.join(tmp_path, "poses_orig.txt"))
    assert poses.shape == (16, 10)
    matches = ellc_io.read_pose_file(os.path.join(tmp_path,
                                                  "matchframes.txt"))
    assert matches.shape[1] == 13            # 3 trailing zeros
    assert list(matches[:, 0]) == [8.0, 16.0]
    assert list(matches[:, 1]) == [1.0, 8.0]
    # seeds stay healthy after keyframe propagation
    assert res.seeds[-1] > 20.0


def test_interval_scan_matches_per_frame_steps():
    """process_interval (one fused scan) must equal running the per-frame
    jitted steps sequentially."""
    imgs, _ = _make_sequence(9, seed=6)
    key = jax.random.PRNGKey(0)
    s0 = pipeline.init_pipeline(imgs[0], key, CFG)

    s_scan, outs, _ = pipeline.process_interval(
        s0, jnp.stack(imgs[1:9]), CFG)

    s_seq = s0
    seq_worlds = []
    for i in range(1, 8):
        s_seq, o = pipeline.track_refine_step(s_seq, imgs[i], CFG)
        seq_worlds.append(np.asarray(o.pose_wrt_world))
    s_seq, o, _ = pipeline.keyframe_step(s_seq, imgs[8], CFG)
    seq_worlds.append(np.asarray(o.pose_wrt_world))

    # XLA fuses the scan differently from the per-frame jits; float32
    # reassociation gives ~1e-5 per-iteration pose differences, and the
    # depth filter's hard thresholds (argmin step choice, EKF gates) let
    # those flip isolated pixels whose depth feeds later frames' GN —
    # over 8 chained frames the divergence is chaotic, not linear.
    # Observed worst case across seeds: 2.1e-4 on one translation
    # component (round 3); bound 5e-4 keeps real regressions (1e-3+)
    # detectable without flaking on reassociation noise.
    np.testing.assert_allclose(np.asarray(outs.pose_wrt_world),
                               np.stack(seq_worlds), atol=5e-4)
    np.testing.assert_allclose(np.asarray(s_scan.kf.world_pose),
                               np.asarray(s_seq.kf.world_pose), atol=5e-4)
    # hard thresholds in the depth filter (argmin step choice, gates) let
    # ~1e-5 pose differences flip isolated pixels; require statistical
    # equality instead of exactness
    d_scan = np.asarray(s_scan.depth.idepth)
    d_seq = np.asarray(s_seq.depth.idepth)
    diff = np.abs(d_scan - d_seq)
    assert float(np.median(diff)) < 2e-3
    assert float((diff > 0.01).mean()) < 0.05


def test_trajectory_ate_on_longer_run(tmp_path):
    imgs, gt = _make_sequence(33)
    res = runner.run_sequence(iter([np.asarray(i) for i in imgs]), CFG,
                              out_dir=None)
    est = jnp.asarray(res.world_poses)
    gt_used = jnp.asarray(np.stack([np.asarray(gt[i - 1])
                                    for i in res.frame_ids]))
    ate = float(metrics.ate_rmse(est, gt_used))
    # scene scale ~1.25; bootstrap noise dominates early frames.  The
    # similarity-aligned ATE must stay well under 10% of scene scale.
    assert ate < 0.12, f"ATE {ate}"


def test_process_intervals_matches_sequential_intervals():
    """process_intervals (N intervals in one dispatch) must equal calling
    process_interval N times."""
    imgs, _ = _make_sequence(17, seed=6)
    s0 = pipeline.init_pipeline(imgs[0], jax.random.PRNGKey(0), CFG)
    K = CFG.keyframe_interval

    stacked = jnp.stack(imgs[1:1 + 2 * K]).reshape(2, K, CFG.rows, CFG.cols)
    s_multi, outs, snaps = pipeline.process_intervals(s0, stacked, CFG)
    assert snaps is None                       # no loop window by default
    assert outs.pose_wrt_world.shape == (2, K, 6)

    s_seq = s0
    seq_outs = []
    for i in range(2):
        s_seq, o, _ = pipeline.process_interval(
            s_seq, stacked[i], CFG)
        seq_outs.append(np.asarray(o.pose_wrt_world))
    np.testing.assert_allclose(np.asarray(outs.pose_wrt_world),
                               np.stack(seq_outs), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s_multi.kf.world_pose),
                               np.asarray(s_seq.kf.world_pose), atol=2e-4)


def test_runner_chunked_dispatch_matches_per_interval(tmp_path):
    """run_sequence with intervals_per_dispatch > 1 writes the same poses
    as the per-interval path (including a sub-interval tail)."""
    imgs, _ = _make_sequence(21, seed=3)
    src = [np.asarray(i) for i in imgs]
    r1 = runner.run_sequence(iter(src), CFG, out_dir=str(tmp_path / "a"),
                             intervals_per_dispatch=1)
    r4 = runner.run_sequence(iter(src), CFG, out_dir=str(tmp_path / "b"),
                             intervals_per_dispatch=4)
    assert list(r1.frame_ids) == list(r4.frame_ids)
    assert list(r1.kf_ids) == list(r4.kf_ids)
    np.testing.assert_allclose(r1.world_poses, r4.world_poses, atol=2e-4)
    p1 = ellc_io.read_pose_file(os.path.join(tmp_path, "a",
                                             "poses_orig.txt"))
    p4 = ellc_io.read_pose_file(os.path.join(tmp_path, "b",
                                             "poses_orig.txt"))
    assert p1.shape == p4.shape
    m1 = ellc_io.read_pose_file(os.path.join(tmp_path, "a",
                                             "matchframes.txt"))
    m4 = ellc_io.read_pose_file(os.path.join(tmp_path, "b",
                                             "matchframes.txt"))
    assert list(m1[:, 0]) == list(m4[:, 0])


def test_global_scale_accumulates():
    imgs, _ = _make_sequence(9, seed=6)
    s0 = pipeline.init_pipeline(imgs[0], jax.random.PRNGKey(0), CFG)
    s1, _, _ = pipeline.process_interval(s0, jnp.stack(imgs[1:9]), CFG)
    assert abs(float(s1.global_scale) - 1.0) < 0.3
    assert float(s1.kf.rescale) != 1.0


def test_masked_interval_matches_unmasked():
    """The masked single-program interval (all-valid, kf_valid=True) must
    be numerically identical to the unmasked variant, and the masked
    bootstrap interval (leading dummy frame) must match tracking the K-1
    real frames directly (process_interval docstring, LC warmup design)."""
    K = CFG.keyframe_interval
    imgs, _ = _make_sequence(K + 1)
    state0 = pipeline.init_pipeline(imgs[0], jax.random.PRNGKey(0), CFG)

    chunk = jnp.stack(imgs[1:1 + K])
    s_ref, o_ref, _ = pipeline.process_interval(state0, chunk, CFG)
    s_m, o_m, _ = pipeline.process_interval(
        state0, chunk, CFG, valid=jnp.ones(K, bool),
        kf_valid=jnp.asarray(True))
    # the masked program is a DIFFERENT XLA program (lax.cond wrappers
    # change fusion); bitwise equality is not guaranteed — what must hold
    # is semantic equality: poses within float-noise, states matching on
    # virtually all elements (discrete stereo decisions may flip on a
    # handful of knife-edge pixels under ~1e-5 pose noise)
    np.testing.assert_allclose(np.asarray(o_ref.pose_wrt_world),
                               np.asarray(o_m.pose_wrt_world), atol=1e-3)
    for a, b in zip(jax.tree.leaves(s_ref), jax.tree.leaves(s_m)):
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, atol=1e-2, rtol=1e-2)
        assert close.mean() > 0.99, (a.shape, close.mean())

    # bootstrap shape: K-1 real frames with one leading dummy
    real = imgs[1:K]                      # K-1 frames
    padded = jnp.concatenate([jnp.zeros_like(chunk[:1]),
                              jnp.stack(real)], axis=0)
    v = jnp.asarray([False] + [True] * (K - 1))
    s_b, o_b, _ = pipeline.process_interval(state0, padded, CFG, valid=v,
                                            kf_valid=jnp.asarray(True))
    # reference: per-frame steps + keyframe step
    st = state0
    outs = []
    for im in real[:-1]:
        st, o = pipeline.track_refine_step(st, im, CFG)
        outs.append(o)
    st, o_kf, _ = pipeline.keyframe_step(st, real[-1], CFG)
    np.testing.assert_allclose(np.asarray(o_b.pose_wrt_world[-1]),
                               np.asarray(o_kf.pose_wrt_world), atol=1e-3)
    for j, o in enumerate(outs):
        np.testing.assert_allclose(np.asarray(o_b.pose_wrt_world[1 + j]),
                                   np.asarray(o.pose_wrt_world), atol=1e-3)
    # dummy slot 0 output is zeros; state matches the per-frame chain
    assert float(jnp.abs(o_b.pose_wrt_world[0]).max()) == 0.0
    for a, b in zip(jax.tree.leaves(s_b), jax.tree.leaves(st)):
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, atol=1e-2, rtol=1e-2)
        assert close.mean() > 0.99, (a.shape, close.mean())


def test_masked_tail_matches_per_frame_tracking():
    """kf_valid=False with r < K valid frames = plain track+refine on
    each real frame, no keyframe swap (the LC tail path)."""
    K = CFG.keyframe_interval
    r = 3
    imgs, _ = _make_sequence(1 + r)
    state0 = pipeline.init_pipeline(imgs[0], jax.random.PRNGKey(0), CFG)
    padded = jnp.concatenate(
        [jnp.stack(imgs[1:1 + r]),
         jnp.zeros((K - r, CFG.rows, CFG.cols), jnp.float32)], axis=0)
    v = jnp.asarray([True] * r + [False] * (K - r))
    s_t, o_t, _ = pipeline.process_interval(state0, padded, CFG, valid=v,
                                            kf_valid=jnp.asarray(False))
    st = state0
    for j, im in enumerate(imgs[1:1 + r]):
        st, o = pipeline.track_refine_step(st, im, CFG)
        np.testing.assert_allclose(np.asarray(o_t.pose_wrt_world[j]),
                                   np.asarray(o.pose_wrt_world), atol=1e-3)
    for a, b in zip(jax.tree.leaves(s_t), jax.tree.leaves(st)):
        a, b = np.asarray(a), np.asarray(b)
        close = np.isclose(a, b, atol=1e-2, rtol=1e-2)
        assert close.mean() > 0.99, (a.shape, close.mean())
