"""Trajectory-accuracy evaluation on a ground-truth synthetic sequence.

Tracks a long random-walk trajectory through the textured room and
reports, against the analytic ground truth:

- ATE-RMSE (Umeyama-aligned camera-center RMSE) of the plain GN
  trajectory (poses_orig analog),
- rotation error stats (CompareRotations port) for GN, and
- the same after the alternating GN<->rotation-averaging LC pipeline
  (and its Sim(3) refinement when enabled).

Usage:  python tools/accuracy_eval.py [N_FRAMES]
Env:    EVAL_PLATFORM=cpu to force CPU; default uses the session device.
"""
import os
import sys
import time

import jax

if os.environ.get("EVAL_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["EVAL_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.runtime import ellc_lc, runner
from egomotion_with_local_loop_closures_tpu.utils import metrics, synthetic


def rot_stats(est: np.ndarray, gt: np.ndarray):
    R1 = lie.exp_so3(jnp.asarray(gt[:, :3]))
    R2 = lie.exp_so3(jnp.asarray(est[:, :3]))
    return {k: float(v) for k, v in metrics.compare_rotations(R1, R2).items()}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 129
    cfg = ELLCConfig()
    fx, fy, cx, cy = cfg.level_intrinsics(0)
    scene = synthetic.make_room_scene(seed=0, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    gt = synthetic.trajectory(n, seed=3, rot_step=0.002, trans_step=0.018)
    render = jax.jit(lambda p: synthetic.render(
        scene, p, cfg.rows, cfg.cols, fx, fy, cx, cy)[0])
    frames = [np.asarray(render(p)) for p in gt]
    gt = np.asarray(gt)

    # --- plain GN mode ---
    t0 = time.time()
    res = runner.run_sequence(iter(frames), cfg)
    gn_dt = time.time() - t0
    est = res.world_poses
    gt_m = gt[res.frame_ids - 1]     # frame i tracked against gt index i-1
    ate = float(metrics.ate_rmse(jnp.asarray(est), jnp.asarray(gt_m)))
    rs = rot_stats(est, gt_m)
    print(f"GN mode     ({len(est)} frames, {gn_dt:.1f}s): "
          f"ATE-RMSE {ate:.4f} (scale-aligned, scene units ~1m), "
          f"rot mean {rs['mean_deg']:.3f} deg / rms {rs['rms_deg']:.3f} deg")

    # --- LC mode (GN <-> RA alternation) ---
    t0 = time.time()
    lc = ellc_lc.run_ellc_lc(iter(frames), cfg)
    lc_dt = time.time() - t0
    gt_lc = gt[lc.frame_ids - 1]
    ate_raw = float(metrics.ate_rmse(jnp.asarray(lc.raw_world_poses),
                                     jnp.asarray(gt_lc)))
    ate_lc = float(metrics.ate_rmse(jnp.asarray(lc.world_poses),
                                    jnp.asarray(gt_lc)))
    rs_raw = rot_stats(lc.raw_world_poses, gt_lc)
    rs_lc = rot_stats(lc.world_poses, gt_lc)
    print(f"LC raw      ({len(lc.frame_ids)} frames, {lc_dt:.1f}s, "
          f"{lc.num_loop_edges} loop edges, {lc.num_batches} batches): "
          f"ATE-RMSE {ate_raw:.4f}, rot rms {rs_raw['rms_deg']:.3f} deg")
    print(f"LC after RA: ATE-RMSE {ate_lc:.4f}, "
          f"rot mean {rs_lc['mean_deg']:.3f} / rms {rs_lc['rms_deg']:.3f} deg")
    if lc.sim3_world_poses is not None:
        ate_s3 = float(metrics.ate_rmse(jnp.asarray(lc.sim3_world_poses),
                                        jnp.asarray(gt_lc)))
        rs_s3 = rot_stats(lc.sim3_world_poses, gt_lc)
        print(f"LC + Sim(3): ATE-RMSE {ate_s3:.4f}, "
              f"rot rms {rs_s3['rms_deg']:.3f} deg")


if __name__ == "__main__":
    main()
