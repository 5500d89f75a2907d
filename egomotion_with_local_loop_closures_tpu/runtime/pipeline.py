"""The frame-loop pipeline: tracking + depth refinement + keyframing.

TPU-native replacement for the reference's driver (``src/main.cpp:199-505``).
Where the reference processes one frame at a time on the host with mutable
``frame``/``depthMap`` objects, here the pipeline state is a pytree of
device arrays and each 8-frame keyframe interval executes as a single
jitted ``lax.scan`` (track -> observe -> regularize per frame) followed by
a jitted keyframe-propagation step — one XLA dispatch per interval instead
of dozens of host round-trips per frame.

Scale convention: each keyframe's depth map is normalized to mean inverse
depth 1 (``makeInvDepthOne``), so tracked translations are in the drifting
per-keyframe scale, exactly like the reference; ``rescale`` per keyframe
and the accumulated ``global_scale`` reproduce ``rescaleFactor`` and
``GLOABL_DEPTH_SCALE`` (main.cpp:373, ExternVariable.h:229).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth import (fusion, propagate,
                                                          state as dstate,
                                                          stereo)
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.image import pyramid
from egomotion_with_local_loop_closures_tpu.track import alignment


class Keyframe(NamedTuple):
    """Device-resident keyframe: cached image pyramid + gradient data and
    the per-level depth/var pyramids consumed by the tracker."""
    images: Tuple[jnp.ndarray, ...]    # image pyramid, level 0..L-1
    depths: Tuple[jnp.ndarray, ...]    # depth pyramid (0 = invalid)
    vars_: Tuple[jnp.ndarray, ...]     # variance pyramid (-1 = invalid)
    gradx: jnp.ndarray                 # level-0 gradients (depth filter)
    grady: jnp.ndarray
    maxgrad: jnp.ndarray               # 3x3-dilated max gradient, level 0
    world_pose: jnp.ndarray            # (6,) poseWrtWorld of this KF
    rescale: jnp.ndarray               # scalar rescaleFactor
    # accumulated GN weights per level for loop-closure const-weight
    # alignment (saveWeights, PixelWisePyramid.cpp:544-551); zeros-shaped
    # always, only filled when cfg.do_loop_closure
    weight_acc: Tuple[jnp.ndarray, ...]
    weight_count: jnp.ndarray          # scalar


class KeyframeSnapshot(NamedTuple):
    """A finalized keyframe as pushed to the loop-closure window
    (globalOptimize::pushToArray deep copy, GlobalOptimize.cpp:178-223)."""
    image: jnp.ndarray
    kf_levels: Tuple[alignment.KeyframeLevel, ...]
    weight_levels: Tuple[jnp.ndarray, ...]   # averaged (finaliseWeights)
    world_pose: jnp.ndarray
    rescale: jnp.ndarray
    seeds: jnp.ndarray
    depth_state: dstate.DepthMapState        # hypothesis state (LoopFrame.h:33)


class PipelineState(NamedTuple):
    kf: Keyframe
    depth: dstate.DepthMapState
    prev_wrt_kf: jnp.ndarray      # (6,) pose of frame t-1 w.r.t. the KF
    global_scale: jnp.ndarray     # scalar GLOABL_DEPTH_SCALE


class FrameOutput(NamedTuple):
    """Per-frame results mirroring a poses_orig.txt line (README.md:83-88)."""
    pose_wrt_kf: jnp.ndarray      # (6,)
    pose_wrt_world: jnp.ndarray   # (6,)
    rescale: jnp.ndarray          # keyframe rescaleFactor
    seeds: jnp.ndarray            # depth occupancy %
    weighted_pose: jnp.ndarray
    valid_fraction: jnp.ndarray
    # censored-by-window fraction of the finest level (AlignDiagnostics.
    # oow_fraction); drivers redispatch the interval with the gather-warp
    # program when it exceeds cfg.warp_oow_fallback (host-side fallback)
    oow_fraction: jnp.ndarray



def _needs_window(cfg: ELLCConfig) -> bool:
    """Keyframe snapshots + accumulated GN weights are needed whenever the
    loop window is in play: for loop-closure edges (FLAG_DO_LOOP_CLOSURE)
    or for connection recovery (FLAG_RESTORE_CONNECTION), both of which
    re-localize with the constant-weight aligner."""
    return cfg.do_loop_closure or cfg.restore_connection

def _kf_levels(kf: Keyframe) -> Tuple[alignment.KeyframeLevel, ...]:
    return tuple(alignment.KeyframeLevel(i, d, v)
                 for i, d, v in zip(kf.images, kf.depths, kf.vars_))


def _refresh_kf_depth(kf: Keyframe, st: dstate.DepthMapState,
                      cfg: ELLCConfig) -> Tuple[Keyframe, dstate.DepthMapState]:
    """updateDepthImage: state -> level-0 maps -> fused pyramids."""
    st, depth0, var0 = dstate.to_depth_image(st, cfg)
    depths, vars_ = fusion.build_depth_var_pyramid(depth0, var0,
                                                   cfg.num_levels)
    return kf._replace(depths=tuple(depths), vars_=tuple(vars_)), st


def make_keyframe(image: jnp.ndarray, st: dstate.DepthMapState,
                  world_pose: jnp.ndarray, rescale: jnp.ndarray,
                  cfg: ELLCConfig) -> Tuple[Keyframe, dstate.DepthMapState]:
    gx, gy = pyramid.gradients(image)
    mg = pyramid.max_abs_gradient(gx, gy)
    imgs = tuple(pyramid.build_pyramid(image, cfg.num_levels))
    # explicit dtypes everywhere: a weak-typed scalar here would give the
    # initial PipelineState a different jit signature than the steady-state
    # one, silently recompiling every step-function twice (~25 s each)
    # weight_acc only exists when the loop window / recovery can consume
    # it (saveWeights, PixelWisePyramid.cpp:544-551); in plain GN mode the
    # empty tuple saves a full image-pyramid's worth of HBM per video
    # state AND removes the matching vmapped temporaries (VERDICT r4 #4)
    kf = Keyframe(images=imgs,
                  depths=(), vars_=(), gradx=gx, grady=gy, maxgrad=mg,
                  world_pose=jnp.asarray(world_pose, jnp.float32),
                  rescale=jnp.asarray(rescale, jnp.float32),
                  weight_acc=(tuple(jnp.zeros_like(i) for i in imgs)
                              if _needs_window(cfg) else ()),
                  weight_count=jnp.asarray(0.0, jnp.float32))
    return _refresh_kf_depth(kf, st, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_pipeline(first_image: jnp.ndarray, key: jax.Array,
                  cfg: ELLCConfig) -> PipelineState:
    """Frame 1: random depth init on the first keyframe
    (main.cpp:228-236, DepthPropagation.cpp:83-184)."""
    gx, gy = pyramid.gradients(first_image)
    mg = pyramid.max_abs_gradient(gx, gy)
    st = dstate.initialize_random(key, mg, cfg)
    st = propagate.regularize(st, cfg)
    kf, st = make_keyframe(first_image, st, jnp.zeros(6, jnp.float32),
                           jnp.asarray(1.0, jnp.float32), cfg)
    return PipelineState(kf=kf, depth=st,
                         prev_wrt_kf=jnp.zeros(6, jnp.float32),
                         global_scale=jnp.asarray(1.0, jnp.float32))


def init_from_depth(first_image: jnp.ndarray, depth: jnp.ndarray,
                    var: jnp.ndarray, world_pose: jnp.ndarray,
                    cfg: ELLCConfig) -> PipelineState:
    """Start from a saved depth map (FLAG_REPLICATE_NEW_DEPTH replay path,
    DepthPropagation.cpp:90-137)."""
    st = dstate.from_depth(depth, var)
    kf, st = make_keyframe(first_image, st, world_pose,
                           jnp.asarray(1.0, jnp.float32), cfg)
    return PipelineState(kf=kf, depth=st,
                         prev_wrt_kf=jnp.zeros(6, jnp.float32),
                         global_scale=jnp.asarray(1.0, jnp.float32))


def _track(state: PipelineState, image: jnp.ndarray, cfg: ELLCConfig,
           max_iters: Tuple[int, ...],
           init_rotation: Optional[jnp.ndarray] = None):
    """GetImagePoseEstimate: init from the previous frame's pose (constant
    position model, ImageFunc.cpp:97-108) or from an RA-provided world
    rotation with translation from t-1 (ImageFunc.cpp:109-138)."""
    pose0 = state.prev_wrt_kf
    if init_rotation is not None:
        rot_wrt_kf = lie.relative(init_rotation, state.kf.world_pose)
        pose0 = jnp.concatenate([rot_wrt_kf[:3], pose0[3:]])
    cur = alignment.make_current_levels(
        pyramid.build_pyramid(image, cfg.num_levels))
    pose, diag = alignment.align(_kf_levels(state.kf), cur, pose0, cfg,
                                 max_iters)
    return pose, diag


def _accumulate_weights(kf: Keyframe, image: jnp.ndarray,
                        pose: jnp.ndarray, cfg: ELLCConfig) -> Keyframe:
    """Accumulate the per-level GN weight images at the tracked pose
    (saveWeights with useAverageWeights=true, PixelWisePyramid.cpp:544-551;
    the reference saves at the last iteration of each level — here all
    levels are evaluated at the final pose, a strictly tighter estimate)."""
    cur = alignment.make_current_levels(
        pyramid.build_pyramid(image, cfg.num_levels))
    kf_levels = _kf_levels(kf)
    acc = tuple(
        a + alignment.weight_image(kf_levels[l], cur[l], pose, l, cfg)
        for l, a in enumerate(kf.weight_acc))
    return kf._replace(weight_acc=acc, weight_count=kf.weight_count + 1.0)


def finalize_snapshot(state: PipelineState) -> KeyframeSnapshot:
    """Average the accumulated weights (finaliseWeights, Frame.cpp:678-695)
    and package the active keyframe for the loop-closure window."""
    kf = state.kf
    n = jnp.maximum(kf.weight_count, 1.0)
    weights = tuple(a / n for a in kf.weight_acc)
    return KeyframeSnapshot(image=kf.images[0], kf_levels=_kf_levels(kf),
                            weight_levels=weights,
                            world_pose=kf.world_pose, rescale=kf.rescale,
                            seeds=dstate.seeds_percent(state.depth),
                            depth_state=state.depth)


def _frame_output(state: PipelineState, pose: jnp.ndarray, diag
                  ) -> FrameOutput:
    world = lie.compose(pose, state.kf.world_pose)
    return FrameOutput(pose_wrt_kf=pose, pose_wrt_world=world,
                       rescale=state.kf.rescale,
                       seeds=dstate.seeds_percent(state.depth),
                       weighted_pose=diag.weighted_pose,
                       valid_fraction=diag.valid_fraction,
                       oow_fraction=diag.oow_fraction)


@functools.partial(jax.jit, static_argnames=("cfg", "replay"))
def track_refine_step(state: PipelineState, image: jnp.ndarray,
                      cfg: ELLCConfig, replay: bool = False,
                      init_rotation: Optional[jnp.ndarray] = None
                      ) -> Tuple[PipelineState, FrameOutput]:
    """One non-keyframe frame: track, then refine the KF depth map
    (main.cpp:330, 499-502)."""
    iters = cfg.max_iters_replay if replay else cfg.max_iters
    pose, diag = _track(state, image, cfg, iters, init_rotation)
    kf = state.kf
    if _needs_window(cfg):
        kf = _accumulate_weights(kf, image, pose, cfg)
    out = stereo.observe(state.depth, kf.images[0], kf.gradx,
                         kf.grady, kf.maxgrad, image, pose, cfg)
    st = propagate.do_regularization(out.state, kf.maxgrad, cfg)
    kf, st = _refresh_kf_depth(kf, st, cfg)
    new_state = PipelineState(kf=kf, depth=st, prev_wrt_kf=pose,
                              global_scale=state.global_scale)
    return new_state, _frame_output(new_state, pose, diag)


@functools.partial(jax.jit, static_argnames=("cfg", "replay"))
def keyframe_step(state: PipelineState, image: jnp.ndarray,
                  cfg: ELLCConfig, replay: bool = False,
                  init_rotation: Optional[jnp.ndarray] = None
                  ) -> Tuple[PipelineState, FrameOutput]:
    """Keyframe propagation (main.cpp:404-495 + createKeyFrame,
    DepthPropagation.cpp:1758-1794): track the new frame, finalize the old
    KF's map, reproject it into the new KF, regularize, renormalize scale,
    and swap keyframes."""
    iters = cfg.max_iters_replay if replay else cfg.max_iters
    pose, diag = _track(state, image, cfg, iters, init_rotation)
    kf_old = state.kf
    if _needs_window(cfg):
        kf_old = _accumulate_weights(kf_old, image, pose, cfg)

    # finaliseKeyframe on the old KF (already regularized last frame; the
    # reference runs doRegularization once more, main.cpp:436)
    st = propagate.do_regularization(state.depth, kf_old.maxgrad, cfg)
    kf_old, st_final = _refresh_kf_depth(kf_old, st, cfg)
    snapshot = finalize_snapshot(
        PipelineState(kf=kf_old, depth=st_final,
                      prev_wrt_kf=pose, global_scale=state.global_scale)) \
        if _needs_window(cfg) else None
    st = st_final

    gx, gy = pyramid.gradients(image)
    mg = pyramid.max_abs_gradient(gx, gy)
    st = propagate.propagate(st, kf_old.images[0], image, mg, pose, cfg)
    st = propagate.regularize(st, cfg, remove_occlusions=True)
    st = propagate.do_regularization(st, mg, cfg)
    st, rescale = dstate.make_idepth_one(st)

    new_world = lie.compose(pose, kf_old.world_pose)
    kf, st = make_keyframe(image, st, new_world, rescale, cfg)
    new_state = PipelineState(kf=kf, depth=st, prev_wrt_kf=jnp.zeros(6),
                              global_scale=state.global_scale * rescale)
    # the output line reports the OLD keyframe association (the frame was
    # tracked against it) — main.cpp writes the pose before createKeyFrame
    out = FrameOutput(pose_wrt_kf=pose,
                      pose_wrt_world=new_world,
                      rescale=kf_old.rescale,
                      seeds=dstate.seeds_percent(st),
                      weighted_pose=diag.weighted_pose,
                      valid_fraction=diag.valid_fraction,
                      oow_fraction=diag.oow_fraction)
    return new_state, out, snapshot


@functools.partial(jax.jit, static_argnames=("cfg", "replay"))
def process_interval(state: PipelineState, images: jnp.ndarray,
                     cfg: ELLCConfig, replay: bool = False,
                     init_rotations: Optional[jnp.ndarray] = None,
                     valid: Optional[jnp.ndarray] = None,
                     kf_valid: Optional[jnp.ndarray] = None
                     ) -> Tuple[PipelineState, FrameOutput]:
    """One full keyframe interval in a single XLA computation: scan
    track+refine over the first K-1 frames, then the keyframe step on the
    last.  ``images`` has shape (K, H, W) with K = cfg.keyframe_interval.
    ``init_rotations`` (K, 6), if given, provides per-frame world-pose
    initializations whose rotation seeds the tracker (the RA-replay path,
    FLAG_INITIALIZE_NONZERO_POSE, ImageFunc.cpp:109-138).

    ``valid`` (K,) bool + ``kf_valid`` scalar bool, when given, make this
    ONE compiled program serve every interval shape LC mode encounters —
    dummy-masked frames are skipped via lax.cond (state passes through,
    outputs are zeros the host drops):

    - bootstrap's odd K-1 first interval  -> valid=[F, T...T], kf_valid=T
    - end-of-stream tails (r < K frames)  -> valid=[T×r, F...],  kf_valid=F
      (the last real frame runs the plain track+refine step, no keyframe
      swap — tail frames never become keyframes, PARITY.md)
    - whole dummy intervals (chunk pad)   -> valid=all F, kf_valid=F

    Each distinct (replay, has-rotations, has-mask) combination is its
    own jit variant; LC mode uses exactly two (track: mask, no rots;
    replay: mask + rots), which is what keeps its warmup bounded."""
    has_mask = valid is not None
    if kf_valid is None:
        kf_valid = jnp.asarray(True)

    def step(st, img, rot, v):
        def live(st):
            return track_refine_step(st, img, cfg, replay,
                                     init_rotation=rot)
        def dead(st):
            return st, jax.tree.map(
                jnp.zeros_like, jax.eval_shape(live, st)[1])
        if not has_mask:
            return live(st)
        return jax.lax.cond(v, live, dead, st)

    if init_rotations is None:
        def body(st, xs):
            img, v = xs
            st, out = step(st, img, None, v)
            return st, out
        vs = valid[:-1] if has_mask else jnp.ones(images.shape[0] - 1, bool)
        state, outs = jax.lax.scan(body, state, (images[:-1], vs))
        rot_last = None
    else:
        def body(st, xs):
            img, rot, v = xs
            st, out = step(st, img, rot, v)
            return st, out
        vs = valid[:-1] if has_mask else jnp.ones(images.shape[0] - 1, bool)
        state, outs = jax.lax.scan(
            body, state, (images[:-1], init_rotations[:-1], vs))
        rot_last = init_rotations[-1]

    if not has_mask:
        state, kf_out, snapshot = keyframe_step(state, images[-1], cfg,
                                                replay,
                                                init_rotation=rot_last)
    else:
        def kf_branch(st):
            return keyframe_step(st, images[-1], cfg, replay,
                                 init_rotation=rot_last)

        def track_branch(st):
            # last frame is a real tail frame (valid) or dummy, but not a
            # keyframe: plain track+refine, snapshot shape filled with the
            # (unconsumed) current-state snapshot
            st2, out = step(st, images[-1], rot_last, valid[-1])
            snap = (finalize_snapshot(st2) if _needs_window(cfg) else None)
            return st2, out, snap

        state, kf_out, snapshot = jax.lax.cond(kf_valid, kf_branch,
                                               track_branch, state)
    all_outs = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b[None]], axis=0), outs, kf_out)
    return state, all_outs, snapshot


@functools.partial(jax.jit, static_argnames=("cfg", "replay"))
def process_intervals(state: PipelineState, images: jnp.ndarray,
                      cfg: ELLCConfig, replay: bool = False,
                      init_rotations: Optional[jnp.ndarray] = None,
                      valid: Optional[jnp.ndarray] = None,
                      kf_valid: Optional[jnp.ndarray] = None
                      ) -> Tuple[PipelineState, FrameOutput]:
    """Scan N whole keyframe intervals in ONE XLA dispatch.

    ``images`` has shape (N, K, H, W).  The per-dispatch overhead of the
    host->device tunnel (~0.1 ms, see BASELINE.md) dominates a single
    interval at this resolution, so batching intervals into one scan is
    the main single-video throughput lever.  Outputs come back stacked
    (N, K, ...); keyframe snapshots (the loop-closure window feed) are
    stacked per interval when the window is enabled.

    ``init_rotations`` (N, K, 6) provides per-frame RA world-rotation
    initializations — the LC replay phase (closer=None, so no window
    feed is needed between intervals) batches its whole batch replay
    into this one dispatch.
    """
    if valid is None:
        if init_rotations is None:
            def body_plain(st, imgs):
                st, outs, snapshot = process_interval(st, imgs, cfg, replay)
                return st, (outs, snapshot)
            state, (outs, snapshots) = jax.lax.scan(body_plain, state,
                                                    images)
        else:
            def body(st, xs):
                imgs, rots = xs
                st, outs, snapshot = process_interval(st, imgs, cfg, replay,
                                                      init_rotations=rots)
                return st, (outs, snapshot)
            state, (outs, snapshots) = jax.lax.scan(
                body, state, (images, init_rotations))
        return state, outs, snapshots

    # masked variant: ONE compiled program per (replay, has-rots) combo
    # covers every chunk LC mode dispatches (see process_interval)
    if init_rotations is None:
        def body_m(st, xs):
            imgs, v, kv = xs
            st, outs, snapshot = process_interval(st, imgs, cfg, replay,
                                                  valid=v, kf_valid=kv)
            return st, (outs, snapshot)
        state, (outs, snapshots) = jax.lax.scan(
            body_m, state, (images, valid, kf_valid))
    else:
        def body_mr(st, xs):
            imgs, rots, v, kv = xs
            st, outs, snapshot = process_interval(st, imgs, cfg, replay,
                                                  init_rotations=rots,
                                                  valid=v, kf_valid=kv)
            return st, (outs, snapshot)
        state, (outs, snapshots) = jax.lax.scan(
            body_mr, state, (images, init_rotations, valid, kf_valid))
    return state, outs, snapshots


def _needs_gather_redo(outs: FrameOutput, cfg: ELLCConfig) -> bool:
    """Host check: is any frame of the dispatched block STARVED by window
    censoring?  Trigger = high censored fraction AND low surviving valid
    fraction on the SAME frame.  Censoring alone is routine and harmless
    (the base parity sequence spends 36% of frames above 5% oow with
    healthy valid fractions and identical trajectories under either
    warp, BASELINE.md round 4); what kills tracking on revisit
    trajectories is censoring that leaves the GN with almost no pixels
    (measured: fatal frames run oow 0.5-0.86 with valid 0.01-0.05).
    Reads two small device scalars per frame — a sync the drivers pay
    anyway when they materialize the block's outputs."""
    import numpy as np
    oow = np.asarray(outs.oow_fraction)
    valid = np.asarray(outs.valid_fraction)
    return bool(np.any((oow > cfg.warp_oow_fallback)
                       & (valid < cfg.warp_valid_floor)))


def process_interval_with_fallback(state: PipelineState,
                                   images: jnp.ndarray, cfg: ELLCConfig,
                                   replay: bool = False,
                                   init_rotations=None, valid=None,
                                   kf_valid=None):
    """process_interval + the HOST-side high-parallax fallback.

    The shift-and-blend window warp censors pixels whose displacement
    spreads beyond the window; on large-motion revisit trajectories the
    censoring starves the GN and kills tracking (round-5 battery:
    survival 63 vs the reference's 419 frames).  Any in-jit ``lax.cond``
    fallback measured 3-4x slower END TO END (control flow in the hot
    scan breaks XLA fusion — both per-iteration and per-frame variants,
    BASELINE.md round 5), so the decision lives here: run the fast
    window program, read the per-frame censored fraction, and when any
    frame exceeds ``cfg.warp_oow_fallback`` redispatch the SAME interval
    from the SAME input state with the gather-warp program
    (``use_window_warp=False`` — a separate jit variant, lazily compiled
    the first time a sequence actually needs it).  Ordinary sequences
    never pay anything; extreme intervals cost one extra dispatch."""
    out = process_interval(state, images, cfg, replay,
                           init_rotations=init_rotations, valid=valid,
                           kf_valid=kf_valid)
    if not cfg.use_window_warp or cfg.warp_oow_fallback >= 1.0:
        return out
    if not _needs_gather_redo(out[1], cfg):
        return out
    return process_interval(state, images, cfg.replace(use_window_warp=False),
                            replay, init_rotations=init_rotations,
                            valid=valid, kf_valid=kf_valid)


def process_intervals_with_fallback(state: PipelineState,
                                    images: jnp.ndarray, cfg: ELLCConfig,
                                    replay: bool = False,
                                    init_rotations=None, valid=None,
                                    kf_valid=None):
    """Chunked variant of process_interval_with_fallback: the redo
    granularity is the whole chunk (rare; see that docstring)."""
    out = process_intervals(state, images, cfg, replay,
                            init_rotations=init_rotations, valid=valid,
                            kf_valid=kf_valid)
    if not cfg.use_window_warp or cfg.warp_oow_fallback >= 1.0:
        return out
    if not _needs_gather_redo(out[1], cfg):
        return out
    return process_intervals(state, images,
                             cfg.replace(use_window_warp=False), replay,
                             init_rotations=init_rotations, valid=valid,
                             kf_valid=kf_valid)
