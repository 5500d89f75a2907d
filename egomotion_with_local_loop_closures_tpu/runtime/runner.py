"""Sequence runner: drives the pipeline over a frame source and writes the
reference-format output files.

This is the equivalent of running the reference binary in its default mode
(``ELLC`` without LC, ``src/main.cpp:76-79``): per-frame world poses go to
``poses_orig.txt`` and per-keyframe odometry edges to ``matchframes.txt``.
The alternating GN/RA mode with loop closures lives in
``runtime/ellc_lc.py`` (the in-process replacement for ``bin/ELLC_LC.sh``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.runtime import io as ellc_io
from egomotion_with_local_loop_closures_tpu.runtime import pipeline


def undistort_source(frames: Iterable[np.ndarray], cfg: ELLCConfig
                     ) -> Iterable[np.ndarray]:
    """Wrap a frame source with per-frame undistortion when
    ``cfg.do_undistortion`` is set (cv::undistort on every decoded frame,
    Frame.cpp:86-96; model constants EV:62)."""
    if not cfg.do_undistortion:
        return frames
    from egomotion_with_local_loop_closures_tpu.geom import camera

    f = jax.jit(lambda im: camera.undistort_image(
        im, cfg.fx, cfg.fy, cfg.cx, cfg.cy, cfg.distortion))
    return (f(jnp.asarray(np.asarray(im))) for im in frames)


@dataclass
class RunResult:
    world_poses: np.ndarray        # (N, 6) poseWrtWorld per tracked frame
    frame_ids: np.ndarray          # (N,)
    kf_ids: np.ndarray             # (N,)
    rescales: np.ndarray           # (N,)
    seeds: np.ndarray              # (N,)
    extra: dict = field(default_factory=dict)


def run_sequence(frames: Iterable[np.ndarray], cfg: ELLCConfig,
                 out_dir: Optional[str] = None,
                 seed: int = 0,
                 max_frames: Optional[int] = None,
                 checkpoint_dir: Optional[str] = None,
                 checkpoint_every: int = 4,
                 resume: bool = False,
                 intervals_per_dispatch: int = 4) -> RunResult:
    """Track a full sequence with keyframing every ``cfg.keyframe_interval``
    frames.  ``frames`` yields (H, W) float32 grayscale images in [0, 255].

    Frames are buffered per keyframe interval and each interval executes
    as one jitted scan (pipeline.process_interval).  Without loop
    closures, up to ``intervals_per_dispatch`` whole intervals are
    buffered and scanned in a single dispatch
    (pipeline.process_intervals) to amortize host->device latency; with
    loop closures the window must be fed between intervals, so dispatch
    stays per-interval.

    With ``checkpoint_dir``, the pipeline state is snapshotted every
    ``checkpoint_every`` keyframe intervals; ``resume=True`` restores the
    newest snapshot and fast-forwards the frame source to it — the
    TPU-native analog of the reference's batch restart (the video is
    skipped to BATCH_START_ID, main.cpp:156-166; the loop window starts
    empty after restart, as in the reference's process relaunch).
    """
    it = iter(undistort_source(frames, cfg))
    first = jnp.asarray(next(it))
    state = pipeline.init_pipeline(first, jax.random.PRNGKey(seed), cfg)

    ckpt_mgr = None
    resume_meta = None
    if checkpoint_dir is not None:
        from egomotion_with_local_loop_closures_tpu.runtime import checkpoint
        ckpt_mgr = checkpoint.CheckpointManager(checkpoint_dir)
        if resume and ckpt_mgr.latest_step() is not None:
            template = checkpoint.template_pipeline_state(cfg)
            state, resume_meta = ckpt_mgr.restore(template)
            state = jax.tree.map(jnp.asarray, state)
            for _ in range(int(resume_meta["frame_id"]) - 1):
                next(it)       # fast-forward (main.cpp:156-166)

    if cfg.restore_connection:
        # connection recovery needs a per-frame seed check before tracking
        # (main.cpp:252-324), so run frame-at-a-time instead of scanning
        # whole keyframe intervals
        return _run_with_recovery(it, state, cfg, out_dir, max_frames)

    pose_w = ellc_io.PoseWriter(os.path.join(out_dir, "poses_orig.txt")) \
        if out_dir else None
    match_w = ellc_io.PoseWriter(os.path.join(out_dir, "matchframes.txt"),
                                 kind="match") if out_dir else None
    loop_w = None
    closer = None
    if cfg.do_loop_closure:
        from egomotion_with_local_loop_closures_tpu.loop import closure
        closer = closure.LoopCloser(cfg)
        if out_dir:
            loop_w = ellc_io.PoseWriter(
                os.path.join(out_dir, "matchframes_globalopt.txt"),
                kind="match")

    ids: List[int] = []
    kfids: List[int] = []
    poses: List[np.ndarray] = []
    rescales: List[float] = []
    seeds_l: List[float] = []

    frame_id = 1      # reference frame ids start at 1 (Frame.cpp:37)
    kf_id = 1
    if resume_meta is not None:
        frame_id = int(resume_meta["frame_id"])
        kf_id = int(resume_meta["kf_id"])
    limit = max_frames if max_frames is not None else cfg.max_frames
    intervals_done = 0

    K = cfg.keyframe_interval
    # loop closures consume a snapshot between intervals; keep those
    # dispatches per-interval so the window is fed in order
    ipd = 1 if closer is not None else max(1, intervals_per_dispatch)

    buf: List[np.ndarray] = []
    done = False
    while not done:
        # Keyframe ids follow the reference's frame_counter % K == 0 rule
        # (main.cpp:404): the FIRST interval tracks only K-1 frames
        # (frames 2..K against keyframe 1), so keyframes land on ids
        # K, 2K, 3K... exactly like the reference — comparison tools need
        # no id remapping.  A resumed run starts at a keyframe, so only a
        # fresh start (frame_id == 1) shortens the first chunk.
        first = frame_id == 1
        want = (K - 1) if first else K * ipd
        buf.clear()
        while len(buf) < want:
            try:
                buf.append(np.asarray(next(it)))
            except StopIteration:
                done = True
                break
            if frame_id + len(buf) - 1 >= limit:
                done = True
                break
        if not buf:
            break

        if first:
            n_full = 1 if len(buf) == K - 1 else 0
            tail = [] if n_full else buf
            full_upto = n_full * (K - 1)
        else:
            n_full = len(buf) // K
            tail = buf[n_full * K:]
            full_upto = n_full * K
        outs = None
        snapshot = None
        if n_full == 1:
            # one interval (the only dispatch shape when the loop window
            # is active, and always for the K-1-frame first interval)
            state, outs, snapshot = pipeline.process_interval_with_fallback(
                state, jnp.asarray(np.stack(buf[:full_upto])), cfg)
            outs = jax.tree.map(np.asarray, outs)
            if closer is not None and snapshot is not None:
                # push the finalized OLD keyframe (pushToArray,
                # main.cpp:452-465) and emit any loop-closure edges
                old_kf_frame_id = kf_id
                edges = closer.push_keyframe(
                    old_kf_frame_id, snapshot.image, snapshot.kf_levels,
                    snapshot.weight_levels, snapshot.world_pose,
                    jnp.zeros(6), float(snapshot.rescale),
                    float(snapshot.seeds),
                    depth_state=snapshot.depth_state)
                if loop_w:
                    for e in edges:
                        loop_w.write(e.frame_id, e.matched_kf_id,
                                     e.pose_wrt_matched, e.rescale, e.seeds,
                                     extras=(e.match_value, e.rms_error,
                                             e.view_angle))
        elif n_full > 1:
            stacked = jnp.asarray(np.stack(buf[:n_full * K])).reshape(
                n_full, K, *buf[0].shape)
            state, outs, _ = pipeline.process_intervals_with_fallback(
                state, stacked, cfg)
            outs = jax.tree.map(
                lambda a: np.asarray(a).reshape(n_full * K, *a.shape[2:]),
                outs)
        def emit(block_outs, n, kf_eligible):
            nonlocal frame_id, kf_id
            for j in range(n):
                frame_id += 1
                ids.append(frame_id)
                kfids.append(kf_id)
                poses.append(block_outs.pose_wrt_world[j])
                rescales.append(float(block_outs.rescale[j]))
                seeds_l.append(float(block_outs.seeds[j]))
                if pose_w:
                    pose_w.write(frame_id, kf_id,
                                 block_outs.pose_wrt_world[j],
                                 block_outs.rescale[j], block_outs.seeds[j])
                # keyframes fall on ids divisible by K (main.cpp:404)
                is_kf = kf_eligible and frame_id % K == 0
                if match_w and is_kf:
                    match_w.write(frame_id, kf_id, block_outs.pose_wrt_kf[j],
                                  block_outs.rescale[j], block_outs.seeds[j])
                if is_kf:
                    kf_id = frame_id

        if outs is not None:
            emit(outs, full_upto, kf_eligible=True)

        # checkpoints are INTERVAL-ALIGNED: saved before any sub-interval
        # tail processing, so a resumed run restarts exactly at a
        # keyframe boundary and replays the remaining intervals with the
        # same dispatch structure as an uninterrupted run (the
        # reference's batch restart is likewise keyframe-aligned,
        # main.cpp:156-166)
        if n_full:
            prev_done = intervals_done
            intervals_done += n_full
            if ckpt_mgr is not None and \
                    intervals_done // checkpoint_every > \
                    prev_done // checkpoint_every:
                ckpt_mgr.save(frame_id, state,
                              meta={"frame_id": frame_id, "kf_id": kf_id})

        if tail:
            # tail shorter than an interval: per-frame steps, no final KF
            outs_list = []
            for img in tail:
                state, o = pipeline.track_refine_step(state, jnp.asarray(img),
                                                      cfg)
                outs_list.append(jax.tree.map(np.asarray, o))
            tail_outs = jax.tree.map(lambda *xs: np.stack(xs), *outs_list)
            emit(tail_outs, len(tail), kf_eligible=False)

    if pose_w:
        pose_w.close()
    if match_w:
        match_w.close()
    if loop_w:
        loop_w.close()

    extra = {}
    if closer is not None:
        extra["loop_edges"] = closer.edges
    return RunResult(world_poses=np.asarray(poses),
                     frame_ids=np.asarray(ids, dtype=np.int64),
                     kf_ids=np.asarray(kfids, dtype=np.int64),
                     rescales=np.asarray(rescales),
                     seeds=np.asarray(seeds_l),
                     extra=extra)


def _run_with_recovery(it, state: "pipeline.PipelineState", cfg: ELLCConfig,
                       out_dir: Optional[str],
                       max_frames: Optional[int]) -> RunResult:
    """Per-frame driver with FLAG_RESTORE_CONNECTION semantics
    (main.cpp:199-505 with the :252-324 recovery block active).

    Before tracking each frame the depth map's occupancy is checked; on
    loss the frame is re-localized against the loop window
    (loop.recovery.find_connection) and, on success, adopted as a brand
    new keyframe carrying the matched candidate's propagated depth map.
    Frames that can't be re-localized are dropped without a pose line
    (main.cpp:317-323)."""
    from egomotion_with_local_loop_closures_tpu.depth import state as dstate
    from egomotion_with_local_loop_closures_tpu.loop import closure, recovery

    closer = closure.LoopCloser(cfg)
    pose_w = ellc_io.PoseWriter(os.path.join(out_dir, "poses_orig.txt")) \
        if out_dir else None
    match_w = ellc_io.PoseWriter(os.path.join(out_dir, "matchframes.txt"),
                                 kind="match") if out_dir else None
    loop_w = ellc_io.PoseWriter(
        os.path.join(out_dir, "matchframes_globalopt.txt"),
        kind="match") if (out_dir and cfg.do_loop_closure) else None

    ids: List[int] = []
    kfids: List[int] = []
    poses: List[np.ndarray] = []
    rescales: List[float] = []
    seeds_l: List[float] = []
    recoveries: List[dict] = []
    dropped: List[int] = []

    frame_id = 1
    kf_id = 1
    limit = max_frames if max_frames is not None else cfg.max_frames

    for img in it:
        if frame_id >= limit:
            break
        frame_id += 1
        image = jnp.asarray(img)

        seeds_now = float(dstate.seeds_percent(state.depth))
        if recovery.check_connection(seeds_now, cfg):
            rec = recovery.find_connection(closer, frame_id, image, cfg)
            if rec is None:
                dropped.append(frame_id)     # connection still lost
                continue
            # adopt: the stray frame becomes the new keyframe with the
            # propagated depth map (main.cpp:262-315)
            kf, st = pipeline.make_keyframe(image, rec.depth_state,
                                            rec.world_pose, rec.rescale, cfg)
            state = pipeline.PipelineState(
                kf=kf, depth=st, prev_wrt_kf=jnp.zeros(6),
                global_scale=state.global_scale * rec.rescale)
            recoveries.append({"frame_id": frame_id,
                               "matched_kf_id": rec.matched_kf_id,
                               "seeds": rec.seeds})
            ids.append(frame_id)
            kfids.append(kf_id)
            poses.append(np.asarray(rec.world_pose))
            rescales.append(float(rec.rescale))
            seeds_l.append(rec.seeds)
            if pose_w:
                pose_w.write(frame_id, kf_id, np.asarray(rec.world_pose),
                             float(rec.rescale), rec.seeds)
            kf_id = frame_id
            continue

        # keyframe propagation on frame ids divisible by K, exactly the
        # reference's frame_counter % KEYFRAME_PROPAGATE_INTERVAL == 0
        # rule (main.cpp:404) — it keeps ticking through recoveries
        if frame_id % cfg.keyframe_interval == 0:
            state, out, snapshot = pipeline.keyframe_step(state, image, cfg)
            out = jax.tree.map(np.asarray, out)
            if snapshot is not None:
                # snapshot into the window even when edge emission is off —
                # recovery needs candidates (the reference's loopFrameArray
                # is filled whenever loop-closure machinery is active)
                edges = closer.push_keyframe(
                    kf_id, snapshot.image, snapshot.kf_levels,
                    snapshot.weight_levels, snapshot.world_pose,
                    jnp.zeros(6), float(snapshot.rescale),
                    float(snapshot.seeds), depth_state=snapshot.depth_state,
                    match=cfg.do_loop_closure)
                if loop_w:
                    for e in edges:
                        loop_w.write(e.frame_id, e.matched_kf_id,
                                     e.pose_wrt_matched, e.rescale, e.seeds,
                                     extras=(e.match_value, e.rms_error,
                                             e.view_angle))
            if match_w:
                match_w.write(frame_id, kf_id, out.pose_wrt_kf,
                              out.rescale, out.seeds)
            is_kf = True
        else:
            state, out = pipeline.track_refine_step(state, image, cfg)
            out = jax.tree.map(np.asarray, out)
            is_kf = False

        ids.append(frame_id)
        kfids.append(kf_id)
        poses.append(out.pose_wrt_world)
        rescales.append(float(out.rescale))
        seeds_l.append(float(out.seeds))
        if pose_w:
            pose_w.write(frame_id, kf_id, out.pose_wrt_world,
                         out.rescale, out.seeds)
        if is_kf:
            kf_id = frame_id

    for w in (pose_w, match_w, loop_w):
        if w:
            w.close()
    return RunResult(world_poses=np.asarray(poses),
                     frame_ids=np.asarray(ids, dtype=np.int64),
                     kf_ids=np.asarray(kfids, dtype=np.int64),
                     rescales=np.asarray(rescales),
                     seeds=np.asarray(seeds_l),
                     extra={"loop_edges": closer.edges,
                            "recoveries": recoveries,
                            "dropped_frames": dropped})
