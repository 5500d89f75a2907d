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
image), so trials are independent and could be vmapped over the whole
window at once — the sequential newest-first walk is kept because the
reference's first-hit semantics are order-dependent.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

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


def find_connection(closer: LoopCloser, frame_id: int,
                    image: jnp.ndarray, cfg: ELLCConfig
                    ) -> Optional[Recovery]:
    """Walk the window newest -> oldest and return the first candidate
    whose propagated depth map revives tracking, or None."""
    cur_levels = alignment.make_current_levels(
        pyramid.build_pyramid(image, cfg.num_levels))
    gx, gy = pyramid.gradients(image)
    maxgrad = pyramid.max_abs_gradient(gx, gy)

    for i in range(len(closer.entries) - 1, -1, -1):
        e = closer.entries[i]
        if frame_id - e.frame_id <= cfg.min_match_difference:
            continue
        if e.depth_state is None:
            continue
        # re-estimate pose from zero init (initial_pose = 0,
        # GlobalOptimize.cpp:850-868) with the const-weight aligner
        pose, _ = alignment.align_const_weight_jit(
            e.kf_levels, e.weight_levels, cur_levels, jnp.zeros(6), cfg)
        # propagate the candidate's hypotheses into the stray frame and
        # finalize it like createKeyFrame (DepthPropagation.cpp:1758-1794)
        st = propagate.propagate(e.depth_state, e.kf_levels[0].image,
                                 image, maxgrad, pose, cfg)
        st = propagate.regularize(st, cfg, remove_occlusions=True)
        st = propagate.do_regularization(st, maxgrad, cfg)
        st, rescale = dstate.make_idepth_one(st)
        seeds = float(dstate.seeds_percent(st))
        if check_connection(seeds, cfg):
            continue        # still lost; try the next candidate (:902-907)
        world = lie.compose(pose, e.world_pose)
        return Recovery(matched_kf_id=e.frame_id,
                        pose_wrt_matched=pose, world_pose=world,
                        depth_state=st, rescale=rescale, seeds=seeds)
    return None
