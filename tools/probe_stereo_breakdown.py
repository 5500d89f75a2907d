"""Micro-profile of stereo.observe internals on the chip: which part of
the two-tier kernel costs what (dense setup, step counting, descriptor,
pool building, the walks themselves, EKF tail).  Guides capacity/layout
tuning — the walk used to dominate; after compaction the dense
elementwise passes and the pooling machinery are candidates."""
import time

import jax
import jax.numpy as jnp

_ = float(jnp.asarray(1.0) + 1.0)

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig  # noqa
from egomotion_with_local_loop_closures_tpu.depth import state as dstate  # noqa
from egomotion_with_local_loop_closures_tpu.depth import stereo  # noqa
from egomotion_with_local_loop_closures_tpu.geom import camera, lie  # noqa
from egomotion_with_local_loop_closures_tpu.image import interp  # noqa
from egomotion_with_local_loop_closures_tpu.runtime import pipeline  # noqa
from egomotion_with_local_loop_closures_tpu.utils import synthetic  # noqa

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

H, W = cfg.rows, cfg.cols
HW = H * W
st = state.depth
kf = state.kf


def bench(name, fn, *args, reps=10):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt * 1e3:8.2f} ms", flush=True)
    return out


x, y = camera.pixel_grid(H, W)
T = lie.exp_se3(pose1)
t_kf_from_cur = -T[:3, :3].T @ T[:3, 3]
epxn, epyn, epl_ok = stereo.epl_direction(kf.images[0], t_kf_from_cur, cfg)
sv = jnp.sqrt(jnp.maximum(st.var_smoothed, 0.0))
min_id = jnp.where(st.valid, jnp.clip(
    st.idepth_smoothed - sv * 2.0, 0.0, None), 0.0)
prior = jnp.where(st.valid, st.idepth_smoothed, 1.0)
max_id = jnp.where(st.valid, jnp.minimum(
    st.idepth_smoothed + sv * 2.0, 20.0), 20.0)

bench("epl_direction (dense)", lambda im: stereo.epl_direction(
    im, t_kf_from_cur, cfg), kf.images[0])

seg = bench("segment_setup (dense)",
            lambda: stereo._segment_setup(x, y, epxn, epyn, min_id, prior,
                                          max_id, pose1, H, W, cfg))

bench("count_steps (dense, 36 planes)",
      lambda s: stereo.count_steps(s, cfg.stereo_max_steps), seg)

bench("kf_descriptor (dense, 4 window samples)",
      lambda: stereo._kf_descriptor(kf.images[0], epxn, epyn, seg.rescale,
                                    H, W))

bench("pack_quad_u8", lambda im: interp.pack_quad_u8(im), img1)

perm = stereo._interleave_perm(HW)
run = (kf.maxgrad >= cfg.min_abs_grad_create) & epl_ok
ok = run & (seg.code == 0)
bench("mask permute x3 (ravel[perm])",
      lambda a, b, c: (a.ravel()[perm], b.ravel()[perm], c.ravel()[perm]),
      ok, st.valid, run)

cap = int(round(cfg.stereo_compact_frac * HW))
bench("nonzero(size=cap) x2",
      lambda m: (jnp.nonzero(m.ravel()[perm], size=cap, fill_value=HW)[0],
                 jnp.nonzero(~m.ravel()[perm], size=cap, fill_value=HW)[0]),
      ok)

packed = interp.pack_quad_u8(img1)
real = stereo._kf_descriptor(kf.images[0], epxn, epyn, seg.rescale, H, W)


def walk_pool(cap_frac, steps):
    capn = int(round(cap_frac * HW))
    gi = jnp.arange(capn, dtype=jnp.int32) % HW

    def f(real, epxn, epyn, mini, pri, maxi, gx, gy, packed):
        def g(a):
            return jnp.take(a.reshape(a.shape[:-2] + (HW,)), gi, axis=-1)
        xc = (gi % W).astype(jnp.float32)
        yc = (gi // W).astype(jnp.float32)
        s = stereo._segment_setup(xc, yc, g(epxn), g(epyn), g(mini),
                                  g(pri), g(maxi), pose1, H, W, cfg)
        return stereo._walk(xc, yc, g(real), g(epxn), g(epyn),
                            g(gx), g(gy), s, packed, pose1, steps,
                            H, W, cfg)
    return f


bench(f"long pool walk (cap {cfg.stereo_compact_frac}, S=36)",
      walk_pool(cfg.stereo_compact_frac, cfg.stereo_max_steps),
      real, epxn, epyn, min_id, prior, max_id, kf.gradx, kf.grady, packed)
bench(f"short pool walk (cap {cfg.stereo_short_frac}, "
      f"S={cfg.stereo_short_steps})",
      walk_pool(cfg.stereo_short_frac, cfg.stereo_short_steps),
      real, epxn, epyn, min_id, prior, max_id, kf.gradx, kf.grady, packed)

bench("observe (whole)", lambda s, im, p: stereo.observe(
    s, kf.images[0], kf.gradx, kf.grady, kf.maxgrad, im, p, cfg),
    st, img1, pose1)
