"""Multi-video batched throughput on one chip: vmap the full pipeline
interval over V synthetic videos and report aggregate frames/s per V.

The single-video pipeline is latency-bound (the frame chain is
sequential, SURVEY.md "hard parts" (e)); batching independent videos is
the TPU-native way to fill the chip (SURVEY.md §2.3 "sequence scaling")
and the honest bridge from single-chip numbers to the multi-chip
BASELINE.json configs (each chip runs V videos, chips scale linearly —
steady-state tracking has no cross-video communication).

Honesty (BASELINE.md perf notes): scalar read before timing forces the
tunnel runtime synchronous; real output bytes are read INSIDE the timed
region each pass.

Usage: python tools/bench_batched.py          (sweeps V in 1 2 4 8)
Env:   BENCH_VIDEOS="1 2 4"  BENCH_INTERVALS=4  BENCH_PASSES=3
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

_ = float(jnp.asarray(1.0) + 1.0)         # honest sync mode

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig  # noqa
from egomotion_with_local_loop_closures_tpu.runtime import pipeline  # noqa
from egomotion_with_local_loop_closures_tpu.utils import synthetic  # noqa


def main():
    cfg = ELLCConfig()
    K = cfg.keyframe_interval
    v_list = [int(v) for v in os.environ.get(
        "BENCH_VIDEOS", "1 2 4 8").split()]
    n_intervals = int(os.environ.get("BENCH_INTERVALS", "4"))
    passes = int(os.environ.get("BENCH_PASSES", "3"))
    fx, fy, cx, cy = cfg.level_intrinsics(0)
    scene = synthetic.make_room_scene(seed=0, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    render = jax.jit(lambda p: synthetic.render(
        scene, p, cfg.rows, cfg.cols, fx, fy, cx, cy)[0])

    V_max = max(v_list)
    vids = []
    for v in range(V_max):
        poses = synthetic.trajectory(1 + K * (n_intervals + 1), seed=v,
                                     rot_step=0.0015, trans_step=0.02)
        vids.append(jnp.stack([render(p) for p in poses]))
    batch_all = jnp.stack(vids)          # (V_max, N, H, W)
    _ = float(batch_all[0, 0, 0, 0])     # materialize before timing

    init = jax.jit(jax.vmap(lambda im, k: pipeline.init_pipeline(im, k, cfg)))
    step = jax.jit(jax.vmap(lambda s, ims: pipeline.process_interval(
        s, ims, cfg)[:2]))

    from egomotion_with_local_loop_closures_tpu.utils import footprint

    rows = []
    for V in v_list:
        # account BEFORE launching: the round-4 V=4 run killed the TPU
        # worker process outright; XLA's memory analysis of the compiled
        # program + the device byte limit turn that into a clean skip
        try:
            fp = footprint.check_fits(V, cfg)
            print(f"# {fp.describe()}", flush=True)
        except MemoryError as e:
            rows.append({"videos": V, "error": str(e)})
            print(json.dumps(rows[-1]), flush=True)
            continue
        batch = batch_all[:V]
        keys = jax.random.split(jax.random.PRNGKey(0), V)
        states0 = init(batch[:, 0], keys)
        # warmup/compile
        states, outs = step(states0, batch[:, 1:1 + K])
        _ = np.asarray(outs.pose_wrt_world)      # real read
        t0 = time.perf_counter()
        n_frames = 0
        for _p in range(passes):
            states = states0
            for i in range(n_intervals):
                lo = 1 + K * i
                states, outs = step(states, batch[:, lo:lo + K])
                n_frames += K * V
            _ = np.asarray(outs.pose_wrt_world)  # read inside timed region
        dt = time.perf_counter() - t0
        rows.append({"videos": V,
                     "aggregate_fps": round(n_frames / dt, 1),
                     "per_video_fps": round(n_frames / dt / V, 1),
                     "ms_per_interval": round(
                         dt / (passes * n_intervals) * 1e3, 2)})
        print(json.dumps(rows[-1]), flush=True)
    return 0


if __name__ == "__main__":
    main()
