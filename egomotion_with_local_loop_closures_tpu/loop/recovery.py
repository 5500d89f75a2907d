"""Connection recovery: re-localize against the loop window when the
depth map dies.

TPU-native rewrite of the reference's FLAG_RESTORE_CONNECTION mechanism
(``src/GlobalOptimize.cpp:717-943`` consumed in ``src/main.cpp:252-324``):

- ``check_connection``: tracking is declared *lost* when depth-map seed
  occupancy drops to <= MIN_SEEDS_FOR_CONNECTION_LOST (=0%)
  (checkConnection, GlobalOptimize.cpp:934-943).
- ``find_connection``: the current ("stray") frame is matched against the
  keyframe window.  Stray frames bypass the KL-divergence and view-angle
  gates — only the frame-id gap applies (findMatch with strayFlag,
  GlobalOptimize.cpp:344-412: ``matchValue<=THRESHOLD || strayFlag``).
  For each candidate, newest -> oldest: the stray frame's pose is
  re-estimated against the candidate keyframe's depth map with the
  constant-weight aligner from a zero initialization
  (GlobalOptimize.cpp:855-868), the candidate's hypothesis state is
  propagated into the stray frame (temp_depthMap->createKeyFrame,
  GlobalOptimize.cpp:895), and the seed check re-runs.  The first
  candidate whose propagated map has seeds above the threshold wins; its
  propagated depth map and the re-estimated world pose seed a brand-new
  keyframe (main.cpp:262-315).  If no candidate survives, the frame is
  dropped (main.cpp:317-323).

The reference runs this with deep copies and an imperative retry loop;
here each candidate trial is a pure function of (window entry, stray
image), so ALL trials run as one vmapped dispatch (align + propagate +
regularize + renormalize + seed count per candidate) and the reference's
order-dependent first-hit choice (newest first) is a host-side argmax
over the returned seed percentages — identical selection, one kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth import propagate
from egomotion_with_local_loop_closures_tpu.depth import state as dstate
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.image import pyramid
from egomotion_with_local_loop_closures_tpu.loop.closure import LoopCloser
from egomotion_with_local_loop_closures_tpu.track import alignment


class Recovery(NamedTuple):
    """A successful re-localization: everything needed to rebuild the
    pipeline state around the stray frame as the new keyframe."""
    matched_kf_id: int
    pose_wrt_matched: jnp.ndarray   # (6,) stray frame w.r.t. matched KF
    world_pose: jnp.ndarray         # (6,) stray frame w.r.t. world
    depth_state: dstate.DepthMapState  # propagated + renormalized map
    rescale: jnp.ndarray            # makeInvDepthOne factor
    seeds: float                    # occupancy % after propagation


def check_connection(seeds_percent: float, cfg: ELLCConfig) -> bool:
    """True when tracking is lost (checkConnection,
    GlobalOptimize.cpp:934-943)."""
    return seeds_percent <= cfg.min_seeds_for_connection_lost


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batched_trials(kf_levels, weight_levels, depth_states, kf_images,
                    image: jnp.ndarray, cfg: ELLCConfig):
    """One vmapped dispatch over all candidate trials: const-weight
    re-alignment from zero init (GlobalOptimize.cpp:850-868), propagation
    of the candidate's hypotheses into the stray frame, createKeyFrame
    finalization (DepthPropagation.cpp:1758-1794) and the seed count."""
    cur_levels = alignment.make_current_levels(
        pyramid.build_pyramid(image, cfg.num_levels))
    gx, gy = pyramid.gradients(image)
    maxgrad = pyramid.max_abs_gradient(gx, gy)

    def trial(kf_lv, w_lv, dstate_e, kf_img):
        pose, _ = alignment.align_const_weight(
            kf_lv, w_lv, cur_levels, jnp.zeros(6), cfg)
        st = propagate.propagate(dstate_e, kf_img, image, maxgrad, pose, cfg)
        st = propagate.regularize(st, cfg, remove_occlusions=True)
        st = propagate.do_regularization(st, maxgrad, cfg)
        st, rescale = dstate.make_idepth_one(st)
        return pose, st, rescale, dstate.seeds_percent(st)

    return jax.vmap(trial)(kf_levels, weight_levels, depth_states, kf_images)


def find_connection(closer: LoopCloser, frame_id: int,
                    image: jnp.ndarray, cfg: ELLCConfig
                    ) -> Optional[Recovery]:
    """Trial every eligible window candidate in one batched dispatch and
    return the NEWEST one whose propagated depth map revives tracking
    (the reference's first-hit walk, GlobalOptimize.cpp:774-932), or
    None."""
    cands = [i for i in range(len(closer.entries) - 1, -1, -1)
             if frame_id - closer.entries[i].frame_id
             > cfg.min_match_difference
             and closer.entries[i].depth_state is not None]
    if not cands:
        return None

    # pad to ONE bucket size (20 = the window cap) so the batched trial
    # jit — full depth propagation per candidate, the heaviest recovery
    # program — compiles exactly one variant (see LoopCloser._pad_bucket
    # for the compile-vs-compute accounting; recovery fires only on
    # tracking loss, so the padded compute is irrelevant)
    B = 20
    padded = cands + [cands[0]] * (B - len(cands))
    ents = [closer.entries[i] for i in padded]
    # keyframe pyramids/weights live in the closer's device ring buffers
    # (closure.LoopCloser docstring); gather the candidate rows — a rare
    # path (tracking loss), so per-leaf eager gathers are fine
    slot_idx = jnp.asarray([e.slot for e in ents], jnp.int32)
    kf_stack = jax.tree.map(lambda a: a[slot_idx], closer.buf_kf)
    w_stack = jax.tree.map(lambda a: a[slot_idx], closer.buf_w)
    d_stack = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[e.depth_state for e in ents])
    img_stack = kf_stack[0].image

    poses, states, rescales, seeds = _batched_trials(
        kf_stack, w_stack, d_stack, img_stack, image, cfg)
    seeds = np.asarray(seeds)

    for k, i in enumerate(cands):          # newest -> oldest first hit
        if check_connection(float(seeds[k]), cfg):
            continue        # still lost; try the next candidate (:902-907)
        e = closer.entries[i]
        st = jax.tree.map(lambda a, k=k: a[k], states)
        pose = poses[k]
        world = lie.compose(pose, e.world_pose)
        return Recovery(matched_kf_id=e.frame_id,
                        pose_wrt_matched=pose, world_pose=world,
                        depth_state=st, rescale=rescales[k],
                        seeds=float(seeds[k]))
    return None
