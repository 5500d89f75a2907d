"""ELLC-LC mode: alternating Gauss-Newton tracking and rotation averaging.

In-process replacement for the reference's outer orchestration
(``bin/ELLC_LC.sh`` + the ``ToggleFlags.h`` batch state machine +
``matlab_scripts/small_batch_rotavg{,_bootstrap}.m``).  The reference
alternates by *restarting the C++ binary* with a new ``config.txt``,
passing state through text files (saved depth mats, ``so3poses7.txt``,
``World_pose.mat``); here the whole cycle runs in one process with state
kept in device memory:

  bootstrap: GN-track batch 1 (bootstrap size) with loop closures on,
             keeping the batch's frames + the transition keyframe's depth
  repeat:    1. rotation-average the last batch's keyframe rotations using
                odometry + loop-closure edges (graph.batch)
             2. replay the batch: re-track from the saved transition depth
                with RA-corrected rotations as initialization and the
                replay iteration schedule {5,1,1,1} (ToggleFlags.h:34-38)
             3. GN-track the next batch with loop closures on
             4. accumulate corrected world poses (World_pose.mat analog)

Scale handling matches the reference: RA corrects only rotations; the
odometry translations (in drifting per-keyframe scale) are preserved
(perform_rotation_averaging_transition1.m:79-82).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.graph import batch as graph_batch
from egomotion_with_local_loop_closures_tpu.loop import closure
from egomotion_with_local_loop_closures_tpu.runtime import io as ellc_io
from egomotion_with_local_loop_closures_tpu.runtime import pipeline


@jax.jit
def _compose_batch(poses: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """world_i = pose_i o base for a whole batch in ONE dispatch.

    The World_pose accumulation (small_batch_rotavg.m:43-50) touches
    every pose row; eagerly composing row by row costs a synchronous
    tunnel round-trip per Lie op (~tens of ms, BASELINE.md perf notes) —
    hundreds of seconds over a long run."""
    return jax.vmap(lambda p: lie.compose(p, base))(poses)


@dataclasses.dataclass
class BatchRecord:
    """Everything remembered about one GN batch for RA + replay."""
    start_frame_id: int                 # transition frame (a keyframe)
    frames: List[np.ndarray]            # the batch's images, in order
    pose_rows: List[List[float]]        # frame_id, kf_id, pose6 (world)
    odometry_rows: List[List[float]]    # frame_id, kf_id, pose6 (wrt KF)
    loop_rows: List[List[float]]        # loop edges, same layout
    start_image: jnp.ndarray            # transition KF image
    start_depth: jnp.ndarray            # its refined depth map
    start_var: jnp.ndarray


@dataclasses.dataclass
class LCResult:
    world_poses: np.ndarray             # (N, 6) final corrected world poses
    frame_ids: np.ndarray
    raw_world_poses: np.ndarray         # pre-RA (GN-only) world poses
    num_batches: int
    num_loop_edges: int
    # Sim(3)-refined world poses (cfg.do_sim3_refine), else None
    sim3_world_poses: Optional[np.ndarray] = None


def _track_batch(state: pipeline.PipelineState,
                 frames: List[np.ndarray], start_frame_id: int,
                 cfg: ELLCConfig, closer: Optional[closure.LoopCloser],
                 replay: bool = False,
                 init_rotations: Optional[np.ndarray] = None,
                 base_world: Optional[np.ndarray] = None,
                 stats: Optional[dict] = None
                 ) -> Tuple[pipeline.PipelineState, BatchRecord]:
    """Track ``len(frames)`` frames (a whole batch) interval by interval,
    starting from ``state`` whose keyframe is frame ``start_frame_id``.
    Returns the new state and the batch record.  ``frames`` excludes the
    keyframe itself.  ``base_world`` anchors the loop window's poses in
    the global corrected frame so matches work across batch rebasements.

    Keyframe ids follow the reference's frame_counter % K == 0 rule
    (main.cpp:404): a batch starting at frame 1 tracks K-1 frames in its
    first interval (keyframes land at K, 2K, ...); batches starting at a
    keyframe track full K-frame intervals.
    """
    K = cfg.keyframe_interval
    first = start_frame_id == 1
    assert (len(frames) + (1 if first else 0)) % K == 0
    if base_world is None:
        base_world = np.zeros(6, np.float32)
    from egomotion_with_local_loop_closures_tpu.depth import state as dstate
    _, depth0, var0 = dstate.to_depth_image(state.depth, cfg)
    rec = BatchRecord(start_frame_id=start_frame_id, frames=list(frames),
                      pose_rows=[], odometry_rows=[], loop_rows=[],
                      start_image=state.kf.images[0],
                      start_depth=depth0, start_var=var0)
    import time as _time

    def _mark(phase, t0):
        if stats is not None:
            stats[phase] = stats.get(phase, 0.0) + (_time.perf_counter()
                                                    - t0)
        return _time.perf_counter()

    kf_id = start_frame_id
    fid = start_frame_id
    H, W = frames[0].shape

    def _masked_interval_inputs(chunk_frames, lead_dummy):
        """(K, H, W) images + (K,) valid for one interval whose first
        ``lead_dummy`` slots are cond-skipped padding (the bootstrap's
        odd K-1 first interval, process_interval docstring)."""
        imgs = np.zeros((K, H, W), np.float32)
        imgs[lead_dummy:] = np.stack(chunk_frames)
        v = np.zeros(K, bool)
        v[lead_dummy:] = True
        return imgs, v

    if closer is None:
        # no loop window to feed between intervals (the replay phase):
        # dispatch the whole batch as fixed chunks of CH=4 masked
        # intervals — ONE compiled program (replay + rots + mask) covers
        # the odd bootstrap interval (leading dummy frame) and the
        # remainder (trailing dummy intervals) alike; outputs stay on
        # device until one final sync
        t0 = _time.perf_counter()
        CH = 4
        lead = 1 if first else 0
        n_int = (len(frames) + lead) // K
        n_chunks = -(-n_int // CH)
        imgs = np.zeros((n_chunks * CH, K, H, W), np.float32)
        v = np.zeros((n_chunks * CH, K), bool)
        kv = np.zeros(n_chunks * CH, bool)
        rots = np.zeros((n_chunks * CH, K, 6), np.float32)
        flat = np.stack(frames)
        imgs.reshape(-1, H, W)[lead:lead + len(frames)] = flat
        v.reshape(-1)[lead:lead + len(frames)] = True
        kv[:n_int] = True
        if init_rotations is not None:
            rots.reshape(-1, 6)[lead:lead + len(frames)] = init_rotations
        blocks = []
        for c in range(n_chunks):
            state, outs, _ = pipeline.process_intervals_with_fallback(
                state, jnp.asarray(imgs[c * CH:(c + 1) * CH]), cfg,
                replay=replay,
                init_rotations=jnp.asarray(rots[c * CH:(c + 1) * CH]),
                valid=jnp.asarray(v[c * CH:(c + 1) * CH]),
                kf_valid=jnp.asarray(kv[c * CH:(c + 1) * CH]))
            blocks.append(outs)           # device-resident until the end
        outs = jax.tree.map(
            lambda *xs: np.concatenate([np.asarray(x).reshape(
                -1, *x.shape[2:]) for x in xs], axis=0), *blocks)
        _mark("interval", t0)
        rows = np.nonzero(v.reshape(-1))[0]    # row index of every frame
        for r in rows:
            fid += 1
            rec.pose_rows.append([fid, kf_id, *outs.pose_wrt_world[r]])
            rec.odometry_rows.append([fid, kf_id, *outs.pose_wrt_kf[r]])
            if (fid - start_frame_id + lead) % K == 0:
                kf_id = fid
        return state, rec

    b = 0
    while b < len(frames):
        size = (K - 1) if (first and b == 0) else K
        t0 = _time.perf_counter()
        imgs, v = _masked_interval_inputs(frames[b:b + size], K - size)
        rots = np.zeros((K, 6), np.float32)
        if init_rotations is not None:
            rots[K - size:] = init_rotations[b:b + size]
        state, outs, snapshot = pipeline.process_interval_with_fallback(
            state, jnp.asarray(imgs), cfg, replay=replay,
            init_rotations=jnp.asarray(rots) if init_rotations is not None
            else None,
            valid=jnp.asarray(v), kf_valid=jnp.asarray(True))
        outs = jax.tree.map(np.asarray, outs)
        t0 = _mark("interval", t0)
        if snapshot is not None:
            # one jitted dispatch; an eager compose is a ~50-op chain of
            # synchronous tunnel round-trips (~1-2 s per interval)
            world_global = _compose_batch(
                snapshot.world_pose[None], jnp.asarray(base_world))[0]
            edges = closer.push_keyframe(
                kf_id, snapshot.image, snapshot.kf_levels,
                snapshot.weight_levels, world_global,
                jnp.zeros(6), float(snapshot.rescale),
                float(snapshot.seeds))
            for e in edges:
                rec.loop_rows.append([e.frame_id, e.matched_kf_id,
                                      *e.pose_wrt_matched])
            t0 = _mark("window", t0)
        for j in range(K - size, K):
            fid += 1
            rec.pose_rows.append([fid, kf_id, *outs.pose_wrt_world[j]])
            rec.odometry_rows.append([fid, kf_id, *outs.pose_wrt_kf[j]])
        kf_id = fid
        b += size
    return state, rec


def _track_tail(state: pipeline.PipelineState, frames: List[np.ndarray],
                frame_id0: int, base_world: np.ndarray, cfg: ELLCConfig
                ) -> List[Tuple[int, np.ndarray]]:
    """Track r < K end-of-stream frames in ONE masked interval dispatch
    (kf_valid=False: plain track+refine on each, no keyframe swap) and
    return their (frame_id, corrected world pose) rows.  Reuses the LC
    track program — a per-frame eager loop would compile an extra
    standalone step program and pay a dispatch+sync per frame."""
    K = cfg.keyframe_interval
    r = len(frames)
    assert 0 < r < K, r
    H, W = frames[0].shape
    imgs = np.zeros((K, H, W), np.float32)
    imgs[:r] = np.stack(frames)
    v = np.zeros(K, bool)
    v[:r] = True
    _, outs, _ = pipeline.process_interval_with_fallback(
        state, jnp.asarray(imgs), cfg, valid=jnp.asarray(v),
        kf_valid=jnp.asarray(False))
    world = np.asarray(_compose_batch(outs.pose_wrt_world[:r],
                                      jnp.asarray(base_world)))
    return [(frame_id0 + 1 + i, world[i]) for i in range(r)]


def _rotation_average_batch(rec: BatchRecord, cfg: ELLCConfig
                            ) -> np.ndarray:
    """Run RA over a batch record; returns (M, 7) corrected poses
    (frame_id, pose6) w.r.t. the batch's transition frame."""
    tf = rec.start_frame_id
    pose_abs = np.zeros((1 + len(rec.pose_rows), 8))
    pose_abs[0] = [tf, tf, 0, 0, 0, 0, 0, 0]
    for i, row in enumerate(rec.pose_rows):
        pose_abs[1 + i] = [row[0], tf, *row[2:8]]
    odometry = np.asarray(rec.odometry_rows, dtype=np.float64)
    extra = np.asarray(rec.loop_rows, dtype=np.float64) \
        if rec.loop_rows else None
    return graph_batch.perform_rotation_averaging(
        odometry, extra, pose_abs, transition_id=tf,
        kf_interval=cfg.keyframe_interval, sigma_deg=cfg.ra_sigma_deg)


def run_ellc_lc(frames: Iterable[np.ndarray], cfg: ELLCConfig,
                out_dir: Optional[str] = None, seed: int = 0,
                max_frames: Optional[int] = None,
                stats: Optional[dict] = None) -> LCResult:
    """The full alternating pipeline on a frame stream.

    ``stats``, when given, accumulates wall-clock seconds per phase
    (track / ra / replay / tail / sim3) for throughput attribution
    (tools/bench_lc.py --phases)."""
    import time as _time

    def _mark(phase, t0):
        if stats is not None:
            stats[phase] = stats.get(phase, 0.0) + (_time.perf_counter()
                                                    - t0)
        return _time.perf_counter()

    from egomotion_with_local_loop_closures_tpu.runtime import runner
    cfg = cfg.replace(do_loop_closure=True)
    it = iter(runner.undistort_source(frames, cfg))
    first = jnp.asarray(np.asarray(next(it)))
    state = pipeline.init_pipeline(first, jax.random.PRNGKey(seed), cfg)
    closer = closure.LoopCloser(cfg)

    K = cfg.keyframe_interval
    limit = max_frames if max_frames is not None else cfg.max_frames

    corrected: List[Tuple[int, np.ndarray]] = []   # World_pose analog
    raw: List[Tuple[int, np.ndarray]] = []
    base_world = np.zeros(6, np.float32)   # corrected world pose of the
    # current transition frame
    frame_id = 1
    num_batches = 0
    batch_no = 0
    done = False

    while not done and frame_id < limit:
        batch_props = (cfg.ra_batch_size_bootstrap if batch_no == 0
                       else cfg.ra_batch_size)
        # the bootstrap batch starts at frame 1 whose first interval is
        # K-1 frames (keyframes at K, 2K, ... — main.cpp:404 rule), so it
        # consumes one frame less than batch_props * K
        first = frame_id == 1
        want = batch_props * K - (1 if first else 0)
        buf: List[np.ndarray] = []
        while len(buf) < want and frame_id + len(buf) < limit:
            try:
                buf.append(np.asarray(next(it)))
            except StopIteration:
                done = True
                break
        if first:
            usable = max(((len(buf) + 1) // K) * K - 1, 0)
        else:
            usable = (len(buf) // K) * K
        extra_frames = buf[usable:]
        buf = buf[:usable]
        if usable == 0:
            # stream ended with less than one interval: one masked tail
            # dispatch (kf_valid=False — tail frames never become
            # keyframes, PARITY.md), no batch / RA
            done = True
            for fid_w in _track_tail(state, extra_frames, frame_id,
                                     base_world, cfg):
                raw.append(fid_w)
                corrected.append(fid_w)
            frame_id += len(extra_frames)
            break

        start_id = frame_id
        t0 = _time.perf_counter()
        state, rec = _track_batch(state, buf, start_id, cfg, closer,
                                  base_world=base_world, stats=stats)
        t0 = _mark("track", t0)
        frame_id += len(buf)
        num_batches += 1

        raw_rows = np.asarray([row[2:8] for row in rec.pose_rows],
                              np.float32)
        raw_world = np.asarray(_compose_batch(jnp.asarray(raw_rows),
                                              jnp.asarray(base_world)))
        for row, w in zip(rec.pose_rows, raw_world):
            raw.append((int(row[0]), w))

        # --- rotation averaging over this batch ---
        t0 = _time.perf_counter()
        out = _rotation_average_batch(rec, cfg)
        # accumulate corrected world poses: rows are w.r.t. the transition
        # frame; compose onto the corrected base (small_batch_rotavg.m:43-50)
        end_world = None
        end_fid = start_id + len(buf)     # the batch's last keyframe
        cor_world = np.asarray(_compose_batch(
            jnp.asarray(np.asarray(out[:, 1:7], np.float32)),
            jnp.asarray(base_world)))
        for r, w in zip(out, cor_world):
            # skip the batch's transition anchor row (identity w.r.t.
            # itself): it was already emitted as the PREVIOUS batch's
            # end keyframe (same pose), and frame 1 never gets a pose
            # line in the reference either (main.cpp writes from frame
            # 2 on) — keeps frame_ids duplicate-free
            if int(r[0]) != start_id:
                corrected.append((int(r[0]), w))
            if int(r[0]) == end_fid:
                end_world = w
        # the next batch chains from the corrected end-of-batch KEYFRAME
        # pose — looked up by frame id rather than trusting row order
        # (len(buf) is a multiple of K, so end_fid is a keyframe)
        assert end_world is not None, \
            f"RA output is missing the transition keyframe {end_fid}"
        t0 = _mark("ra", t0)

        # --- replay the batch from the saved transition depth with the
        # corrected rotations as initialization ---
        if not done and frame_id < limit:
            replay_state = pipeline.init_from_depth(
                rec.start_image, rec.start_depth, rec.start_var,
                jnp.zeros(6), cfg)
            init_rots = np.zeros((len(buf), 6), np.float32)
            by_id = {int(r[0]): r[1:7] for r in out}
            for i in range(len(buf)):
                fid = start_id + 1 + i
                init_rots[i] = by_id.get(fid, np.zeros(6))
            state, rec_replay = _track_batch(
                state=replay_state, frames=buf, start_frame_id=start_id,
                cfg=cfg, closer=None, replay=True,
                init_rotations=init_rots, stats=stats)
            # the replayed final state seeds the next batch; the next
            # batch's poses chain from the corrected end-of-batch pose
            base_world = end_world
            # reset relative bookkeeping: new transition frame is the
            # batch's last keyframe, whose corrected world pose is
            # base_world; the pipeline state's kf.world_pose is relative
            # to the replay origin — rebase it to zero
            state = state._replace(
                kf=state.kf._replace(world_pose=jnp.zeros(6)))
            t0 = _mark("replay", t0)

        batch_no += 1
        if len(extra_frames):
            # end-of-stream frames that don't fill an interval: one
            # masked tail dispatch against the final keyframe (no new
            # KF, no RA — the reference's last partial batch also ends
            # un-averaged when the stream stops, main.cpp:199-505) so
            # every input frame gets a pose line
            done = True
            for fid_w in _track_tail(state, extra_frames, frame_id,
                                     base_world, cfg):
                raw.append(fid_w)
                corrected.append(fid_w)
            frame_id += len(extra_frames)

    if out_dir:
        with ellc_io.PoseWriter(os.path.join(out_dir, "poses_corrected.txt")) \
                as w:
            for fid, p in corrected:
                w.write(fid, 0, p, 1.0, 0.0)

    ids = np.asarray([f for f, _ in corrected], np.int64)
    ps = np.asarray([p for _, p in corrected])
    raw_ps = np.asarray([p for _, p in raw])

    sim3_ps = None
    if cfg.do_sim3_refine and len(ids) > cfg.keyframe_interval:
        t0 = _time.perf_counter()
        sim3_ps = _sim3_refine_trajectory(ids, ps, closer.edges, cfg)
        _mark("sim3", t0)
        if out_dir and sim3_ps is not None:
            with ellc_io.PoseWriter(
                    os.path.join(out_dir, "poses_sim3.txt")) as w:
                for fid, p in zip(ids, sim3_ps):
                    w.write(int(fid), 0, p, 1.0, 0.0)

    return LCResult(world_poses=ps, frame_ids=ids, raw_world_poses=raw_ps,
                    num_batches=num_batches,
                    num_loop_edges=len(closer.edges),
                    sim3_world_poses=sim3_ps)


def _sim3_refine_trajectory(ids: np.ndarray, poses: np.ndarray,
                            loop_edges, cfg: ELLCConfig
                            ) -> Optional[np.ndarray]:
    """Final global optimization: Sim(3) GN over the keyframe subgraph
    (odometry chain + loop-closure edges), then re-attach the non-keyframe
    poses rigidly to their keyframes — the joint
    rotation+translation(+scale) step the reference's rotation-only
    back-end lacks.  Solver: ``graph/ba.py``'s O(E + N) matrix-free PCG
    (the production path; at the reference's 32,500-frame cap the KF
    graph is ~4,000 nodes, far beyond the dense ``sim3.refine``, which
    stays as the test golden the BA solver is equality-tested against)."""
    from egomotion_with_local_loop_closures_tpu.graph import ba, sim3

    # keyframes fall on ids divisible by K (main.cpp:404 convention)
    kf_mask = ids % cfg.keyframe_interval == 0
    kf_idx = np.nonzero(kf_mask)[0]
    if len(kf_idx) < 3:
        return None
    kf_ids = ids[kf_idx]
    id2node = {int(f): k for k, f in enumerate(kf_ids)}

    lc = []
    for e in loop_edges:
        i = id2node.get(int(e.matched_kf_id))
        j = id2node.get(int(e.frame_id))
        if i is None or j is None:
            continue
        # edge measurement: X_j = rel * X_i with rel = pose of frame j
        # w.r.t. matched keyframe i
        lc.append((i, j, np.asarray(e.pose_wrt_matched, np.float32)))

    g = sim3.graph_from_trajectory(poses[kf_idx], np.ones(len(kf_idx)),
                                   loop_edges=lc)
    result = ba.refine(g, num_iters=cfg.sim3_iters)
    refined = np.asarray(result.nodes)

    out = np.array(poses, np.float32)
    for k, fidx in enumerate(kf_idx):
        out[fidx] = refined[k, :6]
    # non-KF frames ride rigidly on their preceding keyframe — all of
    # them in ONE batched dispatch (per-frame eager Lie chains cost a
    # tunnel round-trip per op; see _compose_batch)
    anchor = np.full(len(ids), -1, np.int64)
    last_kf = -1
    for i in range(len(ids)):
        if kf_mask[i]:
            last_kf = i
        anchor[i] = last_kf
    ride = np.nonzero(~kf_mask & (anchor >= 0))[0]
    if len(ride):
        rel_comp = jax.jit(jax.vmap(
            lambda p, pk, ok: lie.compose(lie.relative(p, pk), ok)))
        out[ride] = np.asarray(rel_comp(
            jnp.asarray(poses[ride]),
            jnp.asarray(poses[anchor[ride]]),
            jnp.asarray(out[anchor[ride]])))
    return out
