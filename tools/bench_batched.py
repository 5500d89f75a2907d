"""Multi-video batched throughput on one chip: vmap the full pipeline
interval over V synthetic videos and report frames/s (aggregate).

The single-video pipeline is latency-bound (sequential frame chain);
batching independent videos is the TPU-native way to fill the chip
(SURVEY.md §2.3 "sequence scaling").
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.runtime import pipeline
from egomotion_with_local_loop_closures_tpu.utils import synthetic


def main():
    cfg = ELLCConfig()
    K = cfg.keyframe_interval
    V = int(os.environ.get("BENCH_VIDEOS", "8"))
    n_intervals = int(os.environ.get("BENCH_INTERVALS", "4"))
    fx, fy, cx, cy = cfg.level_intrinsics(0)
    scene = synthetic.make_room_scene(seed=0, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    render = jax.jit(lambda p: synthetic.render(
        scene, p, cfg.rows, cfg.cols, fx, fy, cx, cy)[0])

    vids = []
    for v in range(V):
        poses = synthetic.trajectory(1 + K * (n_intervals + 1), seed=v,
                                     rot_step=0.0015, trans_step=0.02)
        vids.append(jnp.stack([render(p) for p in poses]))
    batch = jnp.stack(vids)          # (V, N, H, W)

    init = jax.jit(jax.vmap(lambda im, k: pipeline.init_pipeline(im, k, cfg)),
                   static_argnums=())
    keys = jax.random.split(jax.random.PRNGKey(0), V)
    states = init(batch[:, 0], keys)

    step = jax.jit(jax.vmap(lambda s, ims: pipeline.process_interval(
        s, ims, cfg)[:2]))

    # warmup/compile
    states, outs = step(states, batch[:, 1:1 + K])
    jax.block_until_ready(outs.pose_wrt_world)

    t0 = time.perf_counter()
    n_frames = 0
    for i in range(n_intervals):
        lo = 1 + K * (i + 1)
        states, outs = step(states, batch[:, lo:lo + K])
        n_frames += K * V
    jax.block_until_ready(outs.pose_wrt_world)
    dt = time.perf_counter() - t0
    print(f"videos={V}: {n_frames / dt:.1f} frames/s aggregate "
          f"({n_frames / dt / V:.1f} per video), "
          f"{dt / n_intervals * 1e3:.2f} ms/interval")


if __name__ == "__main__":
    main()
