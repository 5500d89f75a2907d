"""Measure the line-stereo workload statistics that size the compacted
kernel: what fraction of pixels actually run stereo per frame, and how
many epipolar steps each running pixel needs (DepthPropagation.cpp walks
a data-dependent count; the dense kernel pays stereo_max_steps for all).

Run on the parity input (reference_build/run/frames_480x270.npz).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth import state as dstate
from egomotion_with_local_loop_closures_tpu.geom import camera, lie
from egomotion_with_local_loop_closures_tpu.runtime import pipeline
from egomotion_with_local_loop_closures_tpu.depth import stereo

_ = float(jnp.asarray(1.0) + 1.0)

cfg = ELLCConfig()
frames = np.load("reference_build/run/frames_480x270.npz")["frames"]
n = int(sys.argv[1]) if len(sys.argv) > 1 else 49

state = pipeline.init_pipeline(jnp.asarray(frames[0]), jax.random.PRNGKey(0),
                               cfg)


@jax.jit
def probe(state, image):
    kf = state.kf
    H, W = kf.images[0].shape
    x, y = camera.pixel_grid(H, W)
    b = cfg.border
    active = (x >= b) & (x < W - b) & (y >= b) & (y < H - b)
    st = state.depth
    has_hyp = st.valid
    kill = active & has_hyp & (kf.maxgrad < cfg.min_abs_grad_decrease)
    skip = (kf.maxgrad < cfg.min_abs_grad_create) | \
        (st.blacklisted < cfg.min_blacklist)
    do_pixel = active & ~kill & ~skip

    pose = state.prev_wrt_kf
    T = lie.exp_se3(pose)
    t_kf_from_cur = -T[:3, :3].T @ T[:3, 3]
    epxn, epyn, epl_ok = stereo.epl_direction(kf.images[0], t_kf_from_cur,
                                              cfg)
    run = do_pixel & epl_ok

    # epipolar length each running pixel actually needs (the clamped /
    # cropped length of doLineStereo, :397-553) -- recompute the key
    # quantities the way line_stereo does
    sv = jnp.sqrt(jnp.maximum(st.var_smoothed, 0.0))
    upd_min = jnp.clip(st.idepth_smoothed - sv * cfg.stereo_epl_var_fac,
                       0.0, None)
    upd_max = jnp.minimum(st.idepth_smoothed + sv * cfg.stereo_epl_var_fac,
                          1.0 / cfg.min_depth)
    min_id = jnp.where(has_hyp, upd_min, 0.0)
    max_id = jnp.where(has_hyp, upd_max, 1.0 / cfg.min_depth)

    K = camera.intrinsics_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    R, t = T[:3, :3], T[:3, 3]
    KR, Kt = K @ R, K @ t
    kx = (x - cfg.cx) / cfg.fx
    ky = (y - cfg.cy) / cfg.fy
    pinf = jnp.stack([KR[0, 0] * kx + KR[0, 1] * ky + KR[0, 2],
                      KR[1, 0] * kx + KR[1, 1] * ky + KR[1, 2],
                      KR[2, 0] * kx + KR[2, 1] * ky + KR[2, 2]], axis=0)
    pclose = pinf + Kt[:, None, None] * max_id
    pclose = pclose / jnp.where(jnp.abs(pclose[2]) > 1e-12, pclose[2], 1e-12)
    pfar = pinf + Kt[:, None, None] * min_id
    pfar = pfar / jnp.where(jnp.abs(pfar[2]) > 1e-12, pfar[2], 1e-12)
    epl_len = jnp.sqrt((pclose[0] - pfar[0]) ** 2 + (pclose[1] - pfar[1]) ** 2)
    epl_len = jnp.minimum(epl_len, cfg.max_epl_length_crop)
    epl_len = jnp.maximum(epl_len, cfg.min_epl_length_crop)

    return (run, has_hyp & run, epl_len)


hist = np.zeros(64)
runs, upds = [], []
for i in range(1, n + 1):
    run, upd, epl = probe(state, jnp.asarray(frames[i]))
    run_np = np.asarray(run)
    runs.append(run_np.mean())
    upds.append(np.asarray(upd).mean())
    lens = np.asarray(epl)[run_np]
    h, _ = np.histogram(lens, bins=64, range=(0, 32))
    hist += h
    if i % cfg.keyframe_interval == 0:
        state, _, _ = pipeline.keyframe_step(state, jnp.asarray(frames[i]),
                                             cfg)
    else:
        state, _ = pipeline.track_refine_step(state, jnp.asarray(frames[i]),
                                              cfg)

runs = np.asarray(runs)
print(f"frames probed: {n}")
print(f"run fraction: mean {runs.mean():.3f}  max {runs.max():.3f} "
      f"(of {frames[0].size} px)")
print(f"update(has-prior) fraction: mean {np.mean(upds):.3f}")
cum = np.cumsum(hist) / hist.sum()
for q in (0.5, 0.8, 0.9, 0.95, 0.99, 1.0):
    k = np.searchsorted(cum, q)
    print(f"epl_len p{int(q*100)}: {k * 0.5:.1f} px")
