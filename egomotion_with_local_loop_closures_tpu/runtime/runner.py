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
                 max_frames: Optional[int] = None) -> RunResult:
    """Track a full sequence with keyframing every ``cfg.keyframe_interval``
    frames.  ``frames`` yields (H, W) float32 grayscale images in [0, 255].

    Frames are buffered per keyframe interval and each interval executes
    as one jitted scan (pipeline.process_interval).
    """
    it = iter(frames)
    first = jnp.asarray(next(it))
    state = pipeline.init_pipeline(first, jax.random.PRNGKey(seed), cfg)

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
    limit = max_frames if max_frames is not None else cfg.max_frames

    buf: List[np.ndarray] = []
    done = False
    while not done:
        buf.clear()
        while len(buf) < cfg.keyframe_interval:
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
        if len(buf) == cfg.keyframe_interval:
            state, outs, snapshot = pipeline.process_interval(
                state, jnp.asarray(np.stack(buf)), cfg)
            outs = jax.tree.map(np.asarray, outs)
            n = len(buf)
            if closer is not None and snapshot is not None:
                # push the finalized OLD keyframe (pushToArray,
                # main.cpp:452-465) and emit any loop-closure edges
                old_kf_frame_id = kf_id
                edges = closer.push_keyframe(
                    old_kf_frame_id, snapshot.image, snapshot.kf_levels,
                    snapshot.weight_levels, snapshot.world_pose,
                    jnp.zeros(6), float(snapshot.rescale),
                    float(snapshot.seeds))
                if loop_w:
                    for e in edges:
                        loop_w.write(e.frame_id, e.matched_kf_id,
                                     e.pose_wrt_matched, e.rescale, e.seeds,
                                     extras=(e.match_value, e.rms_error,
                                             e.view_angle))
        else:
            # tail shorter than an interval: per-frame steps, no final KF
            outs_list = []
            for img in buf:
                state, o = pipeline.track_refine_step(state, jnp.asarray(img),
                                                      cfg)
                outs_list.append(jax.tree.map(np.asarray, o))
            outs = jax.tree.map(lambda *xs: np.stack(xs), *outs_list)
            n = len(buf)

        for j in range(n):
            frame_id += 1
            ids.append(frame_id)
            kfids.append(kf_id)
            poses.append(outs.pose_wrt_world[j])
            rescales.append(float(outs.rescale[j]))
            seeds_l.append(float(outs.seeds[j]))
            if pose_w:
                pose_w.write(frame_id, kf_id, outs.pose_wrt_world[j],
                             outs.rescale[j], outs.seeds[j])
            is_kf = (len(buf) == cfg.keyframe_interval and j == n - 1)
            if match_w and is_kf:
                match_w.write(frame_id, kf_id, outs.pose_wrt_kf[j],
                              outs.rescale[j], outs.seeds[j])
            if is_kf:
                kf_id = frame_id

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
