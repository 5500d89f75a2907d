"""Local loop closure: sliding keyframe window, matching, rematch edges.

TPU-native rewrite of ``globalOptimize``
(``src/GlobalOptimize.cpp``, ``src/LoopFrame.h``).  The reference keeps a
43-slot circular array of deep-copied keyframes (+ depth maps) and runs
histogram matching and inverse-compositional re-alignment on one
background boost thread, joined at the next keyframe push
(GlobalOptimize.cpp:151-272).  Here the window is a host-side list of
immutable device pytrees (JAX arrays are persistent — "deep copy" is a
reference), KL divergences and view angles for the WHOLE window are one
batched computation, and each accepted match runs the batched
constant-weight aligner.  The asynchrony disappears: the tracking
pipeline and the rematch alignment are just two XLA computations the
scheduler can overlap.

Matching rules (GlobalOptimize.cpp:274-416):
- candidate window = up to the last MAX_LOOP_ARRAY_LENGTH (=20) pushed
  keyframes, walked newest -> oldest;
- frame-id gap > MIN_MATCH_DIFFERENCE (=8);
- KL(old_hist || cur_hist) <= MATCH_THRESHOLD (=0.1);
- relative view angle <= MAX_REL_VIEW_ANGLE (=10 deg), computed between
  the third rotation rows of the two world poses, with the reference's
  degree conversion 180/3.14 (GlobalOptimize.cpp:432) replicated;
- a matched frame's pose is re-estimated against the matched keyframe's
  depth map but then RESTORED — matches only produce graph edges
  (GlobalOptimize.cpp:589-606).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.image import pyramid
from egomotion_with_local_loop_closures_tpu.loop import histogram
from egomotion_with_local_loop_closures_tpu.track import alignment


class LoopEntry(NamedTuple):
    """Host-side metadata for one keyframe in the window (LoopFrame.h:24-37).

    The image-sized payload (keyframe pyramid, weights, histogram, world
    pose) lives in the LoopCloser's device-resident RING BUFFERS, indexed
    by ``slot`` — round 4 stored per-entry arrays here and re-stacked them
    with ``jnp.stack`` on every matching push, which on the TPU tunnel
    costs ~0.5 s per full-resolution stack (~16 stacks per push ≈ 42% of
    LC-mode wall time).  A push is now ONE jitted dynamic-update dispatch
    and the rematch gathers candidates inside its own jit."""
    frame_id: int
    slot: int                    # row in the ring buffers
    world_pose: jnp.ndarray      # (6,) device ref (recovery / metadata)
    origin_pose: jnp.ndarray     # (6,)
    rescale: float
    seeds: float
    # full hypothesis state of the keyframe's depth map, kept for
    # connection recovery (LoopFrame.h:33 this_currentDepthMap); None when
    # the pipeline runs without FLAG_RESTORE_CONNECTION to save memory
    depth_state: object = None


class LoopEdge(NamedTuple):
    """An extra pose-graph edge written to matchframes_globalopt.txt
    (GlobalOptimize.cpp:574-582)."""
    frame_id: int
    matched_kf_id: int
    pose_wrt_matched: np.ndarray   # (6,)
    rescale: float
    seeds: float
    match_value: float
    rms_error: float
    view_angle: float


def view_angle_deg(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """Relative view angle between world poses, reference semantics
    (GlobalOptimize.cpp:419-452, incl. the 180/3.14 conversion)."""
    va = lie.view_vector(pose_a)
    vb = lie.view_vector(pose_b)
    c = jnp.sum(va * vb, axis=-1) / (
        jnp.linalg.norm(va, axis=-1) * jnp.linalg.norm(vb, axis=-1) + 1e-12)
    return jnp.arccos(jnp.clip(c, -1.0, 1.0)) * 180.0 / 3.14


def trigger_angle_deg(world_pose: jnp.ndarray) -> jnp.ndarray:
    """Angle between the camera center (-R^T t) and the viewing direction
    (third row of R) of a world pose — the loop-closure trigger statistic
    (triggerRotation, GlobalOptimize.cpp:675-683, incl. 180/3.14)."""
    T = lie.exp_se3(jnp.asarray(world_pose))
    R, t = T[:3, :3], T[:3, 3]
    center = -R.T @ t
    view = R[2, :]
    c = jnp.dot(center, view) / (
        jnp.linalg.norm(center) * jnp.linalg.norm(view) + 1e-12)
    return jnp.arccos(jnp.clip(c, -1.0, 1.0)) * 180.0 / 3.14


@functools.partial(jax.jit, static_argnames=("bins",))
def _hist_jit(image: jnp.ndarray, bins: int) -> jnp.ndarray:
    return histogram.image_histogram(image, bins)


@functools.partial(jax.jit, static_argnames=("num_levels",))
def _cur_levels_jit(image: jnp.ndarray, num_levels: int):
    return alignment.make_current_levels(
        pyramid.build_pyramid(image, num_levels))


@jax.jit
def _gate_stats(hists: jnp.ndarray, entry_hist: jnp.ndarray,
                poses: jnp.ndarray, entry_pose: jnp.ndarray):
    """All window-gate statistics in ONE dispatch: KL divergences
    (GlobalOptimize.cpp:344-358), relative view angles (:419-452), and
    the per-entry rematch initial poses (current world relative to each
    window keyframe's world, ImageFunc.cpp:97-108).

    Eager per-candidate evaluation of these quantities costs a
    synchronous tunnel round-trip PER OP (~tens of ms each, BASELINE.md
    perf notes) — ~70 chained Lie ops per candidate made every keyframe
    push cost ~18 s; one fused dispatch makes it milliseconds."""
    kls = histogram.kl_divergence_batched(hists, entry_hist)
    angles = view_angle_deg(poses, jnp.broadcast_to(entry_pose, poses.shape))
    rels = jax.vmap(lambda p: lie.relative(entry_pose, p))(poses)
    return kls, angles, rels


# one dispatch per trigger evaluation instead of ~30 eager tunnel
# round-trips (~3.3 s eager vs ~28 ms jitted, measured round 5)
_trigger_angle_jit = jax.jit(trigger_angle_deg)


@functools.partial(jax.jit, donate_argnums=(0,))
def _window_insert(buf, slot: jnp.ndarray, new):
    """Write one keyframe's payload into ring-buffer row ``slot`` in a
    single donated dispatch (the buffers update in place on device)."""
    return jax.tree.map(lambda b, n: b.at[slot].set(n), buf, new)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _rematch_from_window(buf_kf, buf_w, rels: jnp.ndarray,
                         slot_idx: jnp.ndarray, cur_levels,
                         cfg: ELLCConfig):
    """Gather the padded candidate rows from the ring buffers and run the
    batched constant-weight rematch — candidate selection AND alignment
    fused into one dispatch (two compiled variants: B=4, B=20)."""
    kf_stack = jax.tree.map(lambda a: a[slot_idx], buf_kf)
    w_stack = jax.tree.map(lambda a: a[slot_idx], buf_w)
    pose0s = rels[slot_idx]
    return jax.vmap(
        lambda k, w, p: alignment.align_const_weight(k, w, cur_levels, p,
                                                     cfg))(
        kf_stack, w_stack, pose0s)


def rms_rotation_error(pose_a, pose_b) -> float:
    """The reference's 'rms_error': euclidean distance of the rotation
    components of the two world twists (GlobalOptimize.cpp:421)."""
    d = np.asarray(pose_a[:3]) - np.asarray(pose_b[:3])
    return float(np.sqrt(np.sum(d * d)))


@dataclasses.dataclass
class LoopCloser:
    """Sliding-window loop-closure detector + rematcher.

    The window's image-sized payload lives in device-resident ring
    buffers (``buf_kf``/``buf_w``/``buf_hist``/``buf_pose``, each with a
    leading ``cfg.loop_window`` axis); ``entries`` holds only host
    metadata + the slot assignment.  Push = one donated
    dynamic-update dispatch; gates = one batched dispatch over all
    slots; rematch = one gather+align dispatch (see _window_insert /
    _gate_stats / _rematch_from_window)."""
    cfg: ELLCConfig
    entries: List[LoopEntry] = dataclasses.field(default_factory=list)
    edges: List[LoopEdge] = dataclasses.field(default_factory=list)
    buf_kf: object = None        # stacked KeyframeLevel pytree
    buf_w: object = None         # stacked weight pyramids
    buf_hist: object = None      # (W, bins)
    buf_pose: object = None      # (W, 6)
    # detectedShortLoopClosure hysteresis latch (GlobalOptimize.cpp:33,
    # :690-704); starts False and is forced True when the trigger is off
    trigger_active: bool = False

    def update_trigger(self, world_pose) -> bool:
        """triggerRotation (GlobalOptimize.cpp:671-714): turn matching ON
        when the center/view angle exceeds trigger_loop_closure_on, OFF
        again once it falls below trigger_loop_closure_off."""
        theta = float(_trigger_angle_jit(jnp.asarray(world_pose)))
        if not self.trigger_active and theta > self.cfg.trigger_loop_closure_on:
            self.trigger_active = True
        elif self.trigger_active and theta < self.cfg.trigger_loop_closure_off:
            self.trigger_active = False
        return self.trigger_active

    def _assign_slot(self) -> int:
        """Ring-buffer slot for a new entry: the evicted entry's row when
        the window is full, else the next free row."""
        if len(self.entries) >= self.cfg.loop_window:
            return self.entries.pop(0).slot
        return len(self.entries)

    def push_keyframe(self, frame_id: int, image: jnp.ndarray,
                      kf_levels: Tuple[alignment.KeyframeLevel, ...],
                      weight_levels: Tuple[jnp.ndarray, ...],
                      world_pose: jnp.ndarray, origin_pose: jnp.ndarray,
                      rescale: float, seeds: float,
                      depth_state=None, match: bool = True) -> List[LoopEdge]:
        """pushToArray + findMatchParallel (GlobalOptimize.cpp:151-272,
        454-646): snapshot the keyframe, then match it against the window
        and emit edges for every accepted match.  With
        cfg.use_loop_closure_trigger, matching only runs while the
        rotation trigger is latched on (GlobalOptimize.cpp:225-237)."""
        cfg = self.cfg
        hist = _hist_jit(image, cfg.histogram_bins)
        world_pose = jnp.asarray(world_pose)
        do_match = match and (self.update_trigger(world_pose)
                              if cfg.use_loop_closure_trigger else True)
        new_edges = (self._find_matches(frame_id, hist, world_pose, image)
                     if do_match else [])
        # insert AFTER matching: the window never contains the new entry
        slot = self._assign_slot()
        if self.buf_kf is None:
            W = cfg.loop_window
            zeros = lambda t: jax.tree.map(     # noqa: E731
                lambda a: jnp.zeros((W,) + a.shape, a.dtype), t)
            self.buf_kf = zeros(kf_levels)
            self.buf_w = zeros(weight_levels)
            self.buf_hist = zeros(hist)
            self.buf_pose = zeros(world_pose)
        buf = _window_insert(
            (self.buf_kf, self.buf_w, self.buf_hist, self.buf_pose),
            jnp.asarray(slot, jnp.int32),
            (kf_levels, weight_levels, hist, world_pose))
        self.buf_kf, self.buf_w, self.buf_hist, self.buf_pose = buf
        self.entries.append(LoopEntry(
            frame_id=frame_id, slot=slot, world_pose=world_pose,
            origin_pose=jnp.asarray(origin_pose),
            rescale=float(rescale), seeds=float(seeds),
            depth_state=depth_state))
        self.edges.extend(new_edges)
        return new_edges

    def _candidates(self, frame_id: int, entry_hist, entry_pose):
        """Window indices passing all gates, walked newest -> oldest, plus
        the batched gate statistics (KL, view angle) for edge metadata.

        The gates run as ONE batched computation over the whole ring
        buffer (stale slots masked by the entries list); the walk itself
        (ordering + the min_wait_count cooldown, GlobalOptimize.cpp:
        464-474) is host-side bookkeeping over the resulting booleans."""
        cfg = self.cfg
        if not self.entries:
            return [], None, None, None
        # KL(old || current): old histogram is p (GlobalOptimize.cpp:348)
        kls_d, angles_d, rels = _gate_stats(self.buf_hist, entry_hist,
                                            self.buf_pose, entry_pose)
        kls_s = np.asarray(kls_d)
        angles_s = np.asarray(angles_d)
        slots = [e.slot for e in self.entries]
        kls = kls_s[slots]          # window order (oldest -> newest)
        angles = angles_s[slots]
        out = []
        wait = 0
        for i in range(len(self.entries) - 1, -1, -1):
            # cooldown decrements once per walked slot (GO.cpp:469-473)
            if wait != 0:
                wait -= 1
                continue
            e = self.entries[i]
            if frame_id - e.frame_id <= cfg.min_match_difference:
                continue
            if kls[i] > cfg.match_threshold:
                continue
            if angles[i] > cfg.max_rel_view_angle:
                continue
            out.append(i)
            wait = cfg.min_wait_count       # GO.cpp:536
        return out, kls, angles, rels

    @staticmethod
    def _pad_bucket(n: int) -> int:
        """Pad the candidate batch to ONE size — the window cap (20,
        EV:161 MAX_LOOP_ARRAY_LENGTH) — so the batched rematch compiles
        exactly one jit variant.  Round 4 used buckets {4, 20}; round 5
        dropped the 4-bucket: the second compile of the heaviest program
        in the repo (4-level batched alignment at full resolution,
        ~60-100 s) costs more warmup than the ~50 ms/push of extra
        batched compute it saved over an entire run (LC warmup budget:
        VERDICT r4 #3, <300 s)."""
        return 20

    def _find_matches(self, frame_id: int, entry_hist, entry_pose,
                      image: jnp.ndarray) -> List[LoopEdge]:
        cfg = self.cfg
        cands, kls, angles, rels = self._candidates(frame_id, entry_hist,
                                                    entry_pose)
        if not cands:
            return []
        cur_levels = _cur_levels_jit(image, cfg.num_levels)
        # ONE fused dispatch for every accepted candidate: gather the
        # candidates' ring-buffer rows and their initial poses (current
        # world relative to the matched KF's world, ImageFunc.cpp:97-108
        # with tminus1 = the frame itself) inside the jit, padded to a
        # size bucket by repeating the first candidate
        B = self._pad_bucket(len(cands))
        padded = cands + [cands[0]] * (B - len(cands))
        slot_idx = jnp.asarray([self.entries[i].slot for i in padded],
                               jnp.int32)
        poses, _ = _rematch_from_window(self.buf_kf, self.buf_w, rels,
                                        slot_idx, cur_levels, cfg)
        poses = np.asarray(poses)
        edges = []
        for k, i in enumerate(cands):
            e = self.entries[i]
            edges.append(LoopEdge(
                frame_id=frame_id, matched_kf_id=e.frame_id,
                pose_wrt_matched=poses[k],
                rescale=e.rescale, seeds=e.seeds,
                match_value=float(kls[i]),
                rms_error=rms_rotation_error(entry_pose, e.world_pose),
                view_angle=float(angles[i])))
        return edges
