"""Component-wise timing on TPU — all device arrays passed as explicit
jit arguments (captured device arrays poison the tunnel's async path).

Honest-mode: the tunnel runtime defers execution (block_until_ready
returns early) until the process performs one device->host read
(BASELINE.md perf notes), so force that read before any timing."""
import time
import jax, jax.numpy as jnp

_ = float(jnp.asarray(1.0) + 1.0)   # force honest synchronous mode

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.runtime import pipeline
from egomotion_with_local_loop_closures_tpu.utils import synthetic
from egomotion_with_local_loop_closures_tpu.depth import stereo, propagate, state as dstate, fusion
from egomotion_with_local_loop_closures_tpu.track import alignment
from egomotion_with_local_loop_closures_tpu.image import pyramid

cfg = ELLCConfig()
fx, fy, cx, cy = cfg.level_intrinsics(0)
scene = synthetic.make_room_scene(seed=0, depth=1.25, half_width=1.7,
                                  half_height=1.15)
img0, _ = synthetic.render(scene, jnp.zeros(6), cfg.rows, cfg.cols,
                           fx, fy, cx, cy)
pose1 = jnp.asarray([0.001, 0., 0., 0.01, 0., 0.])
img1, _ = synthetic.render(scene, pose1, cfg.rows, cfg.cols, fx, fy, cx, cy)

state = pipeline.init_pipeline(img0, jax.random.PRNGKey(0), cfg)
jax.block_until_ready(state)


def bench(name, fn, *args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:35s} {dt*1e3:9.2f} ms   (compile {compile_t:.1f}s)",
          flush=True)
    return out


kf = state.kf
kf_levels = pipeline._kf_levels(kf)
cur = alignment.make_current_levels(pyramid.build_pyramid(img1, cfg.num_levels))

align_j = jax.jit(lambda k, c, p: alignment.align(k, c, p, cfg, cfg.max_iters))
bench("align (full 4-level GN)", align_j, kf_levels, cur, jnp.zeros(6))

obs_j = jax.jit(lambda st, k, im, p: stereo.observe(
    st, k.images[0], k.gradx, k.grady, k.maxgrad, im, p, cfg))
out = bench("stereo.observe", obs_j, state.depth, kf, img1, pose1)

reg_j = jax.jit(lambda st, mg: propagate.do_regularization(st, mg, cfg))
st2 = bench("do_regularization", reg_j, out.state, kf.maxgrad)

tdi_j = jax.jit(lambda st: dstate.to_depth_image(st, cfg))
_, d0, v0 = bench("to_depth_image", tdi_j, st2)

fus_j = jax.jit(lambda d, v: fusion.build_depth_var_pyramid(d, v, cfg.num_levels))
bench("build_depth_var_pyramid", fus_j, d0, v0)

prop_j = jax.jit(lambda st, k, im, p: propagate.propagate(
    st, k.images[0], im, k.maxgrad, p, cfg))
bench("propagate (KF swap)", prop_j, st2, kf, img1, pose1)

step_j = jax.jit(lambda s, i: pipeline.track_refine_step(s, i, cfg))
bench("track_refine_step (whole)", step_j, state, img1)

kfstep_j = jax.jit(lambda s, i: pipeline.keyframe_step(s, i, cfg))
bench("keyframe_step (whole)", kfstep_j, state, img1)
