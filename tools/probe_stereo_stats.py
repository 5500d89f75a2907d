"""Measure the line-stereo workload statistics that size the compacted
two-tier kernel (depth/stereo.py):

  * run fraction    — pixels passing the observation gates
    (DepthPropagation.cpp:224-235) + EPL pre-check per frame;
  * ok fraction     — of those, pixels passing the segment pre-checks
    (codes -1/-4 never claim pool capacity);
  * step histogram  — EXACT per-pixel walk length (stereo.count_steps,
    the data-dependent count the reference walks,
    DepthPropagation.cpp:628), which sizes stereo_short_steps and the
    short/long pool capacities.

Input: an npz with a ``frames`` array (default the parity input
reference_build/run/frames_480x270.npz; any sequence works).

Usage: python tools/probe_stereo_stats.py [npz] [n_frames]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import camera, lie
from egomotion_with_local_loop_closures_tpu.runtime import pipeline
from egomotion_with_local_loop_closures_tpu.depth import stereo

_ = float(jnp.asarray(1.0) + 1.0)

cfg = ELLCConfig()
path = sys.argv[1] if len(sys.argv) > 1 else \
    "reference_build/run/frames_480x270.npz"
frames = np.load(path)["frames"]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 49

state = pipeline.init_pipeline(jnp.asarray(frames[0]), jax.random.PRNGKey(0),
                               cfg)

S = cfg.stereo_max_steps


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

    # exactly the search band observe() uses (create vs update)
    sv = jnp.sqrt(jnp.maximum(st.var_smoothed, 0.0))
    upd_min = jnp.clip(st.idepth_smoothed - sv * cfg.stereo_epl_var_fac,
                       0.0, None)
    upd_max = jnp.minimum(st.idepth_smoothed + sv * cfg.stereo_epl_var_fac,
                          1.0 / cfg.min_depth)
    min_id = jnp.where(has_hyp, upd_min, 0.0)
    prior = jnp.where(has_hyp, st.idepth_smoothed, 1.0)
    max_id = jnp.where(has_hyp, upd_max, 1.0 / cfg.min_depth)

    seg = stereo._segment_setup(x, y, epxn, epyn, min_id, prior, max_id,
                                pose, H, W, cfg)
    ok = run & (seg.code == 0)
    nsteps = stereo.count_steps(seg, S)
    hist = jnp.zeros(S + 1, jnp.int32).at[
        jnp.where(ok, nsteps, S)].add(ok.astype(jnp.int32))
    return (jnp.mean(run.astype(jnp.float32)),
            jnp.mean(ok.astype(jnp.float32)),
            jnp.mean((ok & has_hyp).astype(jnp.float32)),
            hist)


runs, oks, upds = [], [], []
hist = np.zeros(S + 1)
for i in range(1, n + 1):
    r, o, u, h = probe(state, jnp.asarray(frames[i]))
    runs.append(float(r)); oks.append(float(o)); upds.append(float(u))
    hist += np.asarray(h)
    if (i + 1) % cfg.keyframe_interval == 0:   # frame_id = i + 1
        state, _, _ = pipeline.keyframe_step(state, jnp.asarray(frames[i]),
                                             cfg)
    else:
        state, _ = pipeline.track_refine_step(state, jnp.asarray(frames[i]),
                                              cfg)

runs, oks = np.asarray(runs), np.asarray(oks)
print(f"frames probed: {n}  (S = {S})")
print(f"run  fraction (gates+EPL):  mean {runs.mean():.3f}"
      f"  max {runs.max():.3f}")
print(f"ok   fraction (+prechecks): mean {oks.mean():.3f}"
      f"  max {oks.max():.3f}")
print(f"update(has-prior) fraction: mean {np.mean(upds):.3f}")
cum = np.cumsum(hist) / hist.sum()
for q in (0.5, 0.7, 0.8, 0.9, 0.95, 0.99, 1.0):
    k = int(np.searchsorted(cum, q))
    print(f"steps p{int(q * 100)}: {k}")
for s_short in (8, 10, 12, 16, 20):
    frac_short = hist[:s_short + 1].sum() / hist.sum()
    # lookup model: short pixels walk s_short+4 planes, long walk S+4
    mean_ok = oks.mean()
    lk = mean_ok * (frac_short * (s_short + 4)
                    + (1 - frac_short) * (S + 4))
    print(f"S_short={s_short:3d}: short frac of ok px {frac_short:.3f}, "
          f"walk lookups/px {lk:.2f} (dense-S equivalent "
          f"{mean_ok * (S + 4):.2f})")
