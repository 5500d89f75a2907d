"""End-to-end test of the alternating GN <-> rotation-averaging mode
(the in-process ELLC_LC.sh replacement)."""

import numpy as np
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.runtime import ellc_lc
from egomotion_with_local_loop_closures_tpu.utils import synthetic

CFG = ELLCConfig(rows=96, cols=128, fx=110.0, fy=110.0, cx=64.0, cy=48.0,
                 ra_batch_size_bootstrap=2, ra_batch_size=2)


def _sequence(n=41, seed=4):
    scene = synthetic.make_room_scene(seed=11, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    gt = synthetic.trajectory(n, seed=seed, rot_step=0.0015, trans_step=0.02)
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    imgs = [np.asarray(synthetic.render(scene, p, CFG.rows, CFG.cols,
                                        fx, fy, cx, cy)[0]) for p in gt]
    return imgs, gt


def test_ellc_lc_runs_batches_and_corrects(tmp_path):
    imgs, gt = _sequence()
    res = ellc_lc.run_ellc_lc(iter(imgs), CFG, out_dir=str(tmp_path),
                              max_frames=len(imgs))
    assert res.num_batches >= 2
    assert len(res.frame_ids) == len(res.world_poses)
    # corrected poses exist for every batch frame (16 per batch + 1
    # transition row per batch)
    assert len(res.frame_ids) >= 32
    # every corrected pose is finite
    assert np.isfinite(res.world_poses).all()

    # rotation accuracy of the corrected trajectory vs ground truth at the
    # last batch's frames.  This synthetic trajectory has no true revisits:
    # incidental histogram matches on the repeating room texture can insert
    # noisy loop edges, and with only ~2 odometry edges per (tiny, test-
    # sized) batch the robust averaging cannot always reject them — the
    # reference behaves identically (its gates are KL + view angle only).
    # The contract tested: correction stays finite and within a few degrees
    # of the raw odometry's accuracy.
    ids = list(res.frame_ids)
    f_b = int(res.frame_ids[-1])
    f_a = f_b - 8
    # unconditional: if the id bookkeeping ever drops f_a the test must
    # FAIL, not silently skip the accuracy check
    assert f_a in ids, f"frame {f_a} missing from corrected ids {ids}"

    def rel_err(poses, ids_):
        pa = jnp.asarray(poses[ids_.index(f_a)])
        pb = jnp.asarray(poses[ids_.index(f_b)])
        rel_est = lie.relative(pb, pa)
        rel_gt = lie.relative(gt[f_b - 1], gt[f_a - 1])
        return float(lie.rotation_angle_deg(
            lie.exp_se3(rel_est)[:3, :3], lie.exp_se3(rel_gt)[:3, :3]))
    ang = rel_err(res.world_poses, ids)
    assert ang < 2.0, f"corrected relative rotation error {ang}"

    # output file written
    import os
    assert os.path.exists(os.path.join(tmp_path, "poses_corrected.txt"))


def test_ellc_lc_with_sim3_refinement(tmp_path):
    """cfg.do_sim3_refine adds a final Sim(3) pass over the keyframe
    subgraph; on a consistent trajectory it must stay close to the
    RA-corrected output and produce poses_sim3.txt."""
    import os
    imgs, gt = _sequence(n=33)
    cfg = CFG.replace(do_sim3_refine=True, sim3_iters=4)
    res = ellc_lc.run_ellc_lc(iter(imgs), cfg, out_dir=str(tmp_path),
                              max_frames=len(imgs))
    assert res.sim3_world_poses is not None
    assert res.sim3_world_poses.shape == res.world_poses.shape
    # refinement of a consistent graph should not blow the trajectory up
    d = np.abs(res.sim3_world_poses - res.world_poses)
    assert float(d[:, :3].max()) < 0.2, f"sim3 diverged: {d.max(axis=0)}"
    assert os.path.getsize(os.path.join(tmp_path, "poses_sim3.txt")) > 0


def test_ellc_lc_tracks_tail_frames():
    """End-of-stream frames that don't fill a keyframe interval must
    still get pose rows (the reference tracks every frame,
    main.cpp:199-505); previously they were dropped."""
    imgs, gt = _sequence(n=38)       # 37 tracked: 2 batches of 16 + 5 tail
    res = ellc_lc.run_ellc_lc(iter(imgs), CFG, max_frames=len(imgs))
    ids = set(int(i) for i in res.frame_ids)
    # every frame after the first must have a corrected pose row
    missing = [f for f in range(2, len(imgs) + 1) if f not in ids]
    assert not missing, f"frames without pose rows: {missing}"
    assert np.isfinite(res.world_poses).all()
