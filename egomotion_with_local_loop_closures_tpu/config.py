"""Typed configuration for the ELLC-TPU pipeline.

Replaces the reference's three-tier flag system (compile-time constants in
``src/ExternVariable.h:36-229``, mutable globals in ``src/main.cpp:34-60``
flipped by ``src/ToggleFlags.h``, and the 3-integer ``config.txt``) with one
frozen dataclass.  The dataclass is hashable, so it can be passed as a
static argument to ``jax.jit``-compiled functions; all numeric values keep
the reference defaults so a run is comparable to the reference pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ELLCConfig:
    """All tunables of the ELLC pipeline.

    Field-by-field provenance is given against
    ``/root/reference/src/ExternVariable.h`` (``EV``).
    """

    # --- image geometry (EV:39-59) -------------------------------------
    rows: int = 270                  # EV:51  ORIG_ROWS  (1080/4)
    cols: int = 480                  # EV:50  ORIG_COLS  (1920/4)
    fx: float = 1642.405612 / 4.0    # EV:53  ORIG_FX
    fy: float = 1636.148027 / 4.0    # EV:54  ORIG_FY
    cx: float = 480 / 2.0            # EV:58  ORIG_CX = cols/2
    cy: float = 270 / 2.0            # EV:59  ORIG_CY = rows/2
    num_levels: int = 4              # EV:40  MAX_PYRAMID_LEVEL

    # --- undistortion (EV:61-62) ---------------------------------------
    do_undistortion: bool = False    # EV:61 (default true in ref; our
                                     # synthetic data is pinhole-perfect)
    distortion: Tuple[float, float, float, float, float] = (
        -0.288283, 0.146546, 0.003800, -0.001690, -0.132134)  # EV:62

    # --- keyframing ------------------------------------------------------
    keyframe_interval: int = 8       # EV:39  KEYFRAME_PROPAGATE_INTERVAL

    # --- Gauss-Newton tracking (EV:76-79,148-149; main.cpp:34) ----------
    max_iters: Tuple[int, int, int, int] = (4, 7, 9, 12)
    # index 0 = finest level.  Replay-mode iters (ToggleFlags.h:34-38):
    max_iters_replay: Tuple[int, int, int, int] = (5, 1, 1, 1)
    termination_weights: Tuple[float, ...] = (
        1e5, 1e5, 1e5, 1e4, 1e4, 1e4)  # EV:76 util::weight
    huber_d: float = 3.0             # EV:149 HUBER_D
    camera_pixel_noise_2: float = 16.0  # EV:148 CAMERA_PIXEL_NOISE_2

    # --- TPU warp strategy (no reference analog; see BASELINE.md perf
    # notes).  XLA gather costs ~8 ns/lookup on TPU, so the tracker's
    # bilinear warps use the shift-and-blend WindowSampler
    # (image/interp.py): exact bilinear within a +-D pixel window around
    # the mean displacement, out-of-window pixels masked from the GN
    # reductions.  Index = pyramid level (0 finest).  The rematch windows
    # are wider: loop-closure candidates start from pose-restored
    # initializations whose residual displacement can be larger.
    use_window_warp: bool = True
    warp_window: Tuple[int, int, int, int] = (3, 3, 4, 8)
    warp_window_rematch: Tuple[int, int, int, int] = (6, 6, 8, 16)
    # HOST-side high-parallax fallback (pipeline._needs_gather_redo /
    # process_interval_with_fallback): when a frame has more than
    # warp_oow_fallback of its valid template censored by the window
    # AND fewer than warp_valid_floor of all pixels surviving into the
    # GN, the driver redispatches the interval with the gather-warp jit
    # variant.  Censoring alone is routine (36% of base-parity frames
    # exceed 5% oow harmlessly); the AND with the valid floor targets
    # actual starvation (round-5 revisit battery: survival 63 -> 420
    # frames; fatal frames measured oow 0.5-0.86 with valid 0.01-0.05).
    # Any in-jit lax.cond formulation of this fallback costs 3-4x
    # END-TO-END (control flow in the hot scan breaks XLA fusion).
    warp_oow_fallback: float = 0.25
    warp_valid_floor: float = 0.10

    # --- depth-map random init (EV:81-88) -------------------------------
    min_abs_grad_create: float = 1.0     # EV:81
    min_abs_grad_decrease: float = 5.0   # EV:82
    min_blacklist: int = -1              # EV:83
    var_random_init: float = 0.125       # EV:88 VAR_RANDOM_INIT_INITIAL
    # "jax": idepth ~ U[0.5, 1.5] from the supplied PRNG key.
    # "glibc": bit-exact replica of the reference's bootstrap — the
    # unseeded glibc rand() stream (seed 1) consumed in raster order
    # over gradient-gated interior pixels, value
    # 0.5f + (rand() % 100001) / 1e5f (DepthPropagation.cpp:160; no
    # srand call exists in src/, so the stream is deterministic).  Used
    # by tools/parity_eval.py to start from EXACTLY the reference's
    # initial depth map (utils/glibc_rand.py).
    bootstrap_rng: str = "jax"

    # --- epipolar line selection (EV:92-94) -----------------------------
    min_epl_grad_squared: float = 4.0    # EV:92 (2^2)
    min_epl_length_squared: float = 1.0  # EV:93
    min_epl_angle_squared: float = 0.09  # EV:94 (0.3^2)

    # --- line stereo (EV:98-117) ----------------------------------------
    min_depth: float = 0.05              # EV:98
    max_epl_length_crop: float = 30.0    # EV:101
    min_epl_length_crop: float = 3.0     # EV:102
    gradient_sample_dist: float = 1.0    # EV:105
    sample_point_to_border: float = 7.0  # EV:108
    max_error_stereo: float = 1300.0     # EV:111
    min_distance_error_stereo: float = 1.5  # EV:112
    stereo_epl_var_fac: float = 2.0      # EV:115
    division_eps: float = 1e-10          # EV:117
    # Fixed trip count for the vectorized epipolar walk.  The reference
    # walks a data-dependent number of steps bounded by MAX_EPL_LENGTH_CROP
    # plus one-sample extensions on both ends (DepthPropagation.cpp:479-505
    # and :628); 34 covers 30 + 2 + padding at GRADIENT_SAMPLE_DIST=1.
    stereo_max_steps: int = 36
    # --- TPU stereo layout (no reference analog; BASELINE.md perf notes).
    # The epipolar walk is gather-bound (~7.2 ns/lookup for any gather
    # formulation, tools/probe_gather.py), and only ~26% of pixels pass
    # the observation gates on average, so the walk runs compacted: the
    # gated pixels are packed to a fixed capacity of
    # stereo_compact_frac * H * W slots (0 = dense golden path).  Frames
    # whose gated-pixel count exceeds the capacity drop the excess
    # uniformly over the image (they retry next frame; count surfaced in
    # ObserveResult.num_overflow).  stereo_pack_u8 fetches the whole 2x2
    # bilinear corner block in ONE 8-bit-quantized gather instead of two
    # 16-bit-pair gathers: 2x fewer lookups, <=0.5 intensity quantization
    # (vs camera pixel noise sigma=4).
    # Both defaults validated end-to-end on the 519-frame identical-input
    # parity run vs the reference binary (BASELINE.md parity table):
    # RPE-8f max 3.3 deg, sim3 ATE 0.044 — better than the dense u16 run.
    #
    # Round-4 two-tier walk: the dense (gather-free) segment setup now
    # runs first, pixels failing its pre-checks never claim capacity, and
    # the survivors are split by a conservative walk-length bound
    # (walk_len / gradient_sample_dist + 2, an upper bound on the exact
    # stereo.count_steps — equality-safe, validated against count_steps
    # in tests) into a SHORT pool walking stereo_short_steps samples (capacity
    # stereo_short_frac * H * W — converged seeds, whose mu +- 2 sigma
    # prior bound shortens the segment, DepthPropagation.cpp:434-486) and
    # a LONG pool walking the full stereo_max_steps (capacity
    # stereo_compact_frac * H * W).  stereo_short_steps = 0 disables the
    # split (one full-length pool).  Capacities are sized from measured
    # workload statistics (tools/probe_stereo_stats.py on the 519-frame
    # parity sequence: pre-check pass rate mean 0.193 / max 0.577
    # (bootstrap frames), existing-seed update pixels mean 0.034 and
    # always short (sigma-bounded segments), create attempts ~0.16 and
    # full-length); overflow is dropped uniformly + surfaced, priority
    # (update) pixels claim capacity first, and the drop point among
    # create attempts is rotated per frame (stereo._pool_indices rot),
    # so under sustained overflow a different create subset runs each
    # frame instead of the fixed interleave starving the same tail.
    # Fused-interval cost is LINEAR in total pool capacity (~0.8 ms per
    # plane-fraction of H*W, tools/probe_interval_sweep.py), so the
    # capacities below budget lookups: the short tier (cap 0.04, 20
    # planes) absorbs the sigma-bounded update pixels (measured mean
    # 0.034) and the full-length tier (cap 0.14, 40 planes) serves
    # create attempts (measured mean ~0.16; bootstrap frames demand up
    # to 0.58 and overflow — the per-frame drop rotation cycles which
    # creates are dropped so every gated pixel gets a turn within a few
    # frames, trading a few frames of depth-map convergence lag for
    # ~35% less walk cost; parity vs the reference binary re-validated
    # in BASELINE.md after this retuning).
    stereo_compact_frac: float = 0.14
    stereo_short_steps: int = 16
    stereo_short_frac: float = 0.04
    stereo_pack_u8: bool = True

    # --- depth filter / EKF (EV:120-143) --------------------------------
    camera_pixel_noise: float = 16.0     # EV:120 (4*4)
    validity_counter_initial_observe: float = 5.0  # EV:122
    succ_var_inc_fac: float = 1.01       # EV:124
    fail_var_inc_fac: float = 1.1        # EV:125
    max_var: float = 0.25                # EV:126 (0.5^2)
    diff_fac_observe: float = 1.0        # EV:130
    diff_fac_prop_merge: float = 1.0     # EV:131
    validity_counter_max: float = 5.0    # EV:133
    validity_counter_max_variable: float = 250.0  # EV:134
    validity_counter_dec: float = 5.0    # EV:135
    validity_counter_inc: float = 5.0    # EV:136
    max_diff_constant: float = 1600.0    # EV:85 (40^2)
    max_diff_grad_mult: float = 0.25     # EV:86 (0.5^2)
    # The reference's fillDepthHoles validity score is a per-ROW prefix-sum
    # difference, not a 5x5 box sum: buildValIntegralBuffer
    # (DepthPropagation.cpp:1414-1429) resets its accumulator every row,
    # dropping the column pass LSD-SLAM's buildRegIntegralBuffer performs.
    # False (default) replicates the reference; True restores the
    # LSD-SLAM-correct 2D box sum.
    lsd_correct_hole_fill: bool = False
    val_sum_min_for_create: float = 30.0     # EV:141
    val_sum_min_for_unblacklist: float = 100.0  # EV:142
    val_sum_min_for_keep: float = 24.0       # EV:143
    reg_dist_var: float = 0.075 * 0.075      # EV:145
    diff_fac_smoothing: float = 1.0          # EV:146

    # --- active-region borders (EV:156-159) -----------------------------
    border: int = 3                      # EV:156-159 YMIN/XMIN = 3

    # --- loop closure (EV:161-171) --------------------------------------
    # (EV:162's MAX_LOOP_CLOSURE_ARRAY_SIZE=43 is the reference's physical
    # circular-buffer allocation headroom; the window here is a plain list
    # capped at loop_window, so no analogous field exists)
    loop_window: int = 20                # EV:161 MAX_LOOP_ARRAY_LENGTH
    match_threshold: float = 0.1         # EV:163 KL-divergence gate
    min_match_difference: int = 8        # EV:164 (= keyframe_interval)
    max_rel_view_angle: float = 10.0     # EV:165 degrees
    min_seeds_for_connection_lost: float = 0.0  # EV:171
    histogram_bins: int = 256            # GlobalOptimize.cpp:23-25
    # Connection recovery (FLAG_RESTORE_CONNECTION, EV:176; consumed in
    # main.cpp:252-324): when the depth map's seed occupancy drops to
    # <= min_seeds_for_connection_lost, search the loop window for a
    # re-localization target and adopt its propagated depth map.
    restore_connection: bool = False
    # Cooldown between accepted matches within one window walk: after a
    # match, the next min_wait_count candidate slots are skipped
    # (waitFrameCount, GlobalOptimize.cpp:464-474,536; EV:166 = 0, i.e.
    # inert by default)
    min_wait_count: int = 0              # EV:166 MIN_WAIT_COUNT
    # Rotation trigger for loop-closure matching (triggerRotation,
    # GlobalOptimize.cpp:671-714; FLAG_USE_LOOP_CLOSURE_TRIGGER): matching
    # runs only while the angle between the camera center and the view
    # vector exceeds the ON threshold, with hysteresis.
    use_loop_closure_trigger: bool = False
    trigger_loop_closure_on: float = 20.0   # EV:168 degrees
    trigger_loop_closure_off: float = 1.0   # EV:169 degrees

    # --- rotation averaging (matlab_scripts) ----------------------------
    ra_batch_size: int = 4               # small_batch_rotavg.m:26
    ra_batch_size_bootstrap: int = 10    # small_batch_rotavg_bootstrap.m:27
    ra_sigma_deg: float = 5.0            # RobustMeanSO3Graph.m (SIGMA)
    ra_irls_max_iters: int = 100         # RobustMeanSO3Graph.m
    ra_irls_tol: float = 1e-3            # RobustMeanSO3Graph.m
    ra_l1_max_iters: int = 10            # AverageSO3Graph.m:57
    # Final Sim(3) pose-graph refinement over the keyframe trajectory
    # (graph/sim3.py) after the GN/RA alternation — joint
    # rotation+translation+scale, which the reference never optimizes
    # (RA corrects rotations only, perform_rotation_averaging_transition1
    # .m:79-82).  Off by default for reference-faithful output.
    do_sim3_refine: bool = False
    sim3_iters: int = 8

    # --- runtime ---------------------------------------------------------
    max_frames: int = 32500              # main.cpp:174-175
    dtype: str = "float32"
    # Run fillDepthHoles+regularizeDepthMap as one fused VMEM-resident
    # Pallas kernel (ops/reg_kernel.py).  Off by default: identical math,
    # enable on TPU for guaranteed single-pass fusion.
    use_pallas_reg: bool = False
    # Loop-closure mode: accumulate per-keyframe average GN weights during
    # tracking (saveWeights/finaliseWeights, PixelWisePyramid.cpp:544-551,
    # Frame.cpp:678-695) for constant-weight rematch alignment, and emit
    # pose-graph edges.  Mirrors FLAG_DO_LOOP_CLOSURE +
    # FLAG_DO_CONST_WEIGHT_POSE_ESTIMATION (ToggleFlags.h:53-60).
    do_loop_closure: bool = False

    # ------------------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        return (self.rows, self.cols)

    def level_shape(self, level: int) -> Tuple[int, int]:
        """Pyramid shape at ``level`` (floor division, Frame.cpp:287-293)."""
        return (self.rows >> level, self.cols >> level)

    def level_intrinsics(self, level: int) -> Tuple[float, float, float, float]:
        """Per-level (fx, fy, cx, cy); mirrors UserDefinedFunc.cpp:33-49."""
        s = float(2 ** level)
        return (self.fx / s, self.fy / s, self.cx / s, self.cy / s)

    def replace(self, **kw) -> "ELLCConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = ELLCConfig()

# A small configuration for fast tests: quarter-size images with intrinsics
# scaled to match, everything else at reference defaults.
TEST_CONFIG = ELLCConfig(
    rows=96,
    cols=128,
    fx=120.0,
    fy=120.0,
    cx=64.0,
    cy=48.0,
    stereo_max_steps=36,
)
