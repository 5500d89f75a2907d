"""Sweep stereo pool configurations and time the FUSED per-interval
dispatch (pipeline.process_interval) — the quantity bench.py measures.
Standalone component timings carry ~1.5 ms dispatch each and miss XLA's
cross-step fusion, so capacity tuning must be validated on the fused
step.  Usage: python tools/probe_interval_sweep.py"""
import time

import jax
import jax.numpy as jnp
import numpy as np

_ = float(jnp.asarray(1.0) + 1.0)

import functools  # noqa

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig  # noqa
from egomotion_with_local_loop_closures_tpu.runtime import pipeline  # noqa
from egomotion_with_local_loop_closures_tpu.utils import synthetic  # noqa

base = ELLCConfig()
fx, fy, cx, cy = base.level_intrinsics(0)
scene = synthetic.make_room_scene(seed=0, depth=1.25, half_width=1.7,
                                  half_height=1.15)
poses = synthetic.trajectory(2 * base.keyframe_interval + 1, seed=0,
                             rot_step=0.0015, trans_step=0.02)
render = jax.jit(lambda p: synthetic.render(
    scene, p, base.rows, base.cols, fx, fy, cx, cy)[0])
frames = jnp.stack([render(p) for p in poses])
_ = float(frames[0, 0, 0])

K = base.keyframe_interval


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_at(st, buf, i, cfg):
    imgs = jax.lax.dynamic_slice_in_dim(buf, i, cfg.keyframe_interval)
    return pipeline.process_interval(st, imgs, cfg)


def bench(tag, cfg, reps=6):
    state0 = pipeline.init_pipeline(frames[0], jax.random.PRNGKey(0), cfg)
    st, outs, _ = step_at(state0, frames, jnp.int32(1), cfg)
    _ = np.asarray(outs.pose_wrt_world)
    t0 = time.perf_counter()
    for _r in range(reps):
        st, outs, _ = step_at(state0, frames, jnp.int32(1), cfg)
        _ = np.asarray(outs.pose_wrt_world)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:46s} {dt * 1e3 / K:7.2f} ms/frame "
          f"({K / dt:6.1f} f/s single-interval)", flush=True)


bench("default (long 0.22 / short 0.05@16)", base)
bench("no-op stereo (caps ~0: dense-part floor)",
      base.replace(stereo_compact_frac=0.002, stereo_short_frac=0.002))
bench("long cap 0.14", base.replace(stereo_compact_frac=0.14))
bench("long cap 0.30", base.replace(stereo_compact_frac=0.30))
bench("single pool 0.22 (short disabled)",
      base.replace(stereo_short_steps=0))
bench("round-3 layout (single pool 0.4)",
      base.replace(stereo_short_steps=0, stereo_compact_frac=0.4))
