"""Benchmark: tracked frames/s on one chip at the reference resolution.

Prints exactly one JSON line:
  {"metric": "tracked_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": R}

The workload is the full per-frame pipeline at the reference's working
resolution (480x270, ExternVariable.h:50-51): multi-scale GN tracking +
epipolar depth observation + regularization + depth-image rebuild, with a
keyframe propagation every 8 frames — i.e. the steady-state cost of
``main.cpp``'s frame loop, measured over whole keyframe intervals.

Baseline: the reference repo publishes no benchmark numbers
(BASELINE.md); its design point is real-time egocentric video at 30 fps
at 480x270 on a multicore CPU (README.md:18; HUJI EgoSeg videos are
30 fps).  vs_baseline is therefore measured against 30 frames/s and
recorded as a proxy until a reference CPU build exists to measure.
"""

import json
import os
import sys
import time

BASELINE_FPS = 30.0


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
    from egomotion_with_local_loop_closures_tpu.runtime import pipeline
    from egomotion_with_local_loop_closures_tpu.utils import synthetic

    cfg = ELLCConfig()
    K = cfg.keyframe_interval
    fx, fy, cx, cy = cfg.level_intrinsics(0)
    scene = synthetic.make_room_scene(seed=0, depth=1.25, half_width=1.7,
                                      half_height=1.15)

    n_intervals = int(os.environ.get("BENCH_INTERVALS", "8"))
    poses = synthetic.trajectory(1 + 2 * K * n_intervals, seed=0,
                                 rot_step=0.0015, trans_step=0.02)
    render = jax.jit(lambda p: synthetic.render(
        scene, p, cfg.rows, cfg.cols, fx, fy, cx, cy)[0])
    frames = jnp.stack([render(p) for p in poses])

    state = pipeline.init_pipeline(frames[0], jax.random.PRNGKey(0), cfg)

    # warmup: compile + one chunk (runner dispatches whole multi-interval
    # chunks via process_intervals, runner.py)
    chunk = frames[1:1 + K * n_intervals].reshape(
        n_intervals, K, cfg.rows, cfg.cols)
    state, outs, _ = pipeline.process_intervals(state, chunk, cfg)
    jax.block_until_ready(outs.pose_wrt_world)

    lo = 1 + K * n_intervals
    chunk2 = frames[lo:lo + K * n_intervals]
    n_frames = chunk2.shape[0] - chunk2.shape[0] % K
    chunk2 = chunk2[:n_frames].reshape(-1, K, cfg.rows, cfg.cols)

    t0 = time.perf_counter()
    state, outs, _ = pipeline.process_intervals(state, chunk2, cfg)
    jax.block_until_ready(outs.pose_wrt_world)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    print(json.dumps({
        "metric": "tracked_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
