"""Multi-scale Gauss-Newton direct image alignment (the tracking core).

TPU-native rewrite of the reference's pose estimator
(``src/PixelWisePyramid.cpp:58-491``, orchestrated by
``src/ImageFunc.cpp:49-315``).  The reference stripes image rows over 3
boost threads, each accumulating a partial 6x6 Hessian and 6-vector that
are summed at join; here the whole image is one dense masked computation
— warp, residual, Huber/variance weights, and the J^T W J / J^T W r
reductions are fused einsums the TPU executes in a single pass.  The
per-level iteration loop is a ``lax.scan`` with a freeze mask replicating
the reference's ``weightedPose < 1`` early-out (ImageFunc.cpp:251-252);
the coarse-to-fine level loop is unrolled (4 levels, distinct shapes).

Numerics follow the reference exactly:
- Jacobian evaluated at the *template* pixel with gradients sampled from
  the current image at the warped point (PixelWisePyramid.cpp:289-320).
- Residual = warped(current) - keyframe, hence the negated step
  (PixelWisePyramid.cpp:466-467).
- Weight = Huber(delta=3 on the sqrt(w_p)-normalized residual) x
  1/(CAMERA_PIXEL_NOISE_2 + sigma_d^2 (dr/dd)^2)
  (PixelWisePyramid.cpp:341-358).
- Pose update: xi <- log(exp(-H^-1 g) exp(xi)) (left-compose,
  PixelWisePyramid.cpp:460-491); termination metric sum|delta * w_term|
  with w_term = util::weight (ExternVariable.h:76).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import camera, lie, linear
from egomotion_with_local_loop_closures_tpu.image import interp, pyramid


class KeyframeLevel(NamedTuple):
    """Per-level keyframe data consumed by the aligner."""
    image: jnp.ndarray   # (H, W) float32, 0..255
    depth: jnp.ndarray   # (H, W) depth, 0 where invalid
    var: jnp.ndarray     # (H, W) inverse-depth variance, -1 where invalid


class CurrentLevel(NamedTuple):
    """Per-level current-frame data: image + its gradients."""
    image: jnp.ndarray
    gradx: jnp.ndarray
    grady: jnp.ndarray


class AlignDiagnostics(NamedTuple):
    weighted_pose: jnp.ndarray   # termination metric after the last iter
    iters_used: jnp.ndarray      # per level, number of applied updates
    final_energy: jnp.ndarray    # sum of weighted squared residuals (finest)
    valid_fraction: jnp.ndarray  # fraction of template pixels used (finest)
    # fraction of depth-valid template pixels censored by the window-warp
    # sampler at the final pose (in-image but displaced farther than the
    # window from the mean shift) — 0 on the plain gather path.  Surfaced
    # so window-induced pixel loss is observable per frame (ADVICE r2).
    oow_fraction: jnp.ndarray


def make_keyframe_levels(image: jnp.ndarray, depth0: jnp.ndarray,
                         var0: jnp.ndarray, cfg: ELLCConfig
                         ) -> Tuple[KeyframeLevel, ...]:
    """Build the full keyframe pyramid: Gaussian image pyramid plus the
    inverse-variance-fused depth/var pyramid (DepthPropagation.cpp:1637-1719)."""
    from egomotion_with_local_loop_closures_tpu.depth import fusion

    imgs = pyramid.build_pyramid(image, cfg.num_levels)
    depths, vars_ = fusion.build_depth_var_pyramid(depth0, var0, cfg.num_levels)
    return tuple(KeyframeLevel(i, d, v)
                 for i, d, v in zip(imgs, depths, vars_))


def make_current_levels(images: Sequence[jnp.ndarray]) -> Tuple[CurrentLevel, ...]:
    """Gradients per pyramid level (frame::updationOnPyrChange,
    Frame.cpp:316-327 recomputes them per level)."""
    out = []
    for img in images:
        gx, gy = pyramid.gradients(img)
        out.append(CurrentLevel(img, gx, gy))
    return tuple(out)


def _gn_quantities(kf: KeyframeLevel, cur: CurrentLevel, pose: jnp.ndarray,
                   intr: Tuple[float, float, float, float],
                   cfg: ELLCConfig, y_offset=0, window: int | None = None):
    """One linearization: returns (H 6x6, g 6, energy, valid_count).

    ``y_offset`` shifts the pixel-grid row coordinates — used when the
    keyframe template is row-sharded across devices (parallel.sharded):
    each shard linearizes its rows and the 6x6/6 blocks are psummed.

    ``window``: when set, the three warp samples (intensity + gradients)
    use the shift-and-blend WindowSampler (pure VPU, no gather — see
    image/interp.py) with this half-width; pixels whose displacement
    exceeds the window are masked out of the reductions.  When None, the
    plain XLA-gather bilinear path is used (the sharded row-offset path
    keeps this, and CPU golden tests can compare both).
    """
    fx, fy, cx, cy = intr
    Hh, Ww = kf.image.shape
    x, y = camera.pixel_grid(Hh, Ww, dtype=kf.image.dtype)
    y = y + y_offset

    mask = kf.depth > 0.0

    T = lie.exp_se3(pose)
    P = camera.backproject(x, y, kf.depth, fx, fy, cx, cy)
    Pt = jnp.einsum("ij,hwj->hwi", T[:3, :3], P) + T[:3, 3]
    wx, wy, wz = camera.project(Pt, fx, fy, cx, cy, eps=1e-10)

    if window is None:
        warped, in_bounds = interp.bilinear(cur.image, wx, wy)
        gradx = interp.bilinear_fill(cur.gradx, wx, wy)
        grady = interp.bilinear_fill(cur.grady, wx, wy)
        oow = jnp.asarray(0.0, kf.image.dtype)
    else:
        sampler = interp.make_window_sampler(
            wx, wy, window, Hh, Ww, valid=mask)
        warped = interp.window_sample(sampler, cur.image)
        gradx = interp.window_sample(sampler, cur.gradx)
        grady = interp.window_sample(sampler, cur.grady)
        in_bounds = sampler.in_bounds & sampler.in_window
        censored = mask & sampler.in_bounds & ~sampler.in_window
        oow = jnp.sum(censored.astype(jnp.float32)) / jnp.maximum(
            jnp.sum(mask.astype(jnp.float32)), 1.0)

    # steepest descent rows (PixelWisePyramid.cpp:296-320), evaluated at
    # the template pixel (u, v) = (x-cx, y-cy) and template depth d
    u = x - cx
    v = y - cy
    d = jnp.where(mask, kf.depth, 1.0)   # guarded; masked out below
    inv_d = 1.0 / d
    sd0 = gradx * (-(v * u) / fy) + grady * (-(fy + (v * v) / fy))
    sd1 = gradx * (fx + (u * u) / fx) + grady * ((v * u) / fx)
    sd2 = gradx * (-(fx * v) / fy) + grady * ((fy * u) / fx)
    sd3 = gradx * (fx * inv_d)
    sd4 = grady * (fy * inv_d)
    sd5 = gradx * (-u * inv_d) + grady * (-v * inv_d)
    J = jnp.stack([sd0, sd1, sd2, sd3, sd4, sd5], axis=-1)  # (H, W, 6)

    residual = jnp.where(in_bounds, warped - kf.image, 0.0)

    # variance-propagated weights (PixelWisePyramid.cpp:341-358)
    px, py, pz = Pt[..., 0], Pt[..., 1], Pt[..., 2]
    tx, ty, tz = T[0, 3], T[1, 3], T[2, 3]
    gxs = fx * gradx
    gys = fy * grady
    pz2d = jnp.where(mask, pz * pz * inv_d, 1.0)
    g0 = (tx * pz - tz * px) / pz2d
    g1 = (ty * pz - tz * py) / pz2d
    drpdd = gxs * g0 + gys * g1
    s = jnp.maximum(kf.var, 0.0)
    w_p = 1.0 / (cfg.camera_pixel_noise_2 + s * drpdd * drpdd)
    weighted_rp = jnp.abs(residual * jnp.sqrt(w_p))
    half_huber = cfg.huber_d / 2.0
    wh = jnp.where(weighted_rp < half_huber, 1.0,
                   half_huber / jnp.maximum(weighted_rp, 1e-12))
    weight = jnp.where(mask & in_bounds, wh * w_p, 0.0)

    Hmat = jnp.einsum("hwi,hwj,hw->ij", J, J, weight)
    g = jnp.einsum("hwi,hw->i", J, residual * weight)
    energy = jnp.sum(weight * residual * residual)
    valid = jnp.sum((mask & in_bounds).astype(jnp.float32))
    return Hmat, g, energy, valid, oow


def weight_image(kf: KeyframeLevel, cur: CurrentLevel, pose: jnp.ndarray,
                 level: int, cfg: ELLCConfig) -> jnp.ndarray:
    """The per-template-pixel GN weight image at a given pose — what the
    reference saves at the final iteration of each level for later
    constant-weight (inverse-compositional) alignment
    (PixelWisePyramid::saveWeights, PixelWisePyramid.cpp:544-551)."""
    fx, fy, cx, cy = cfg.level_intrinsics(level)
    Hh, Ww = kf.image.shape
    x, y = camera.pixel_grid(Hh, Ww, dtype=kf.image.dtype)
    mask = kf.depth > 0.0
    T = lie.exp_se3(pose)
    P = camera.backproject(x, y, kf.depth, fx, fy, cx, cy)
    Pt = jnp.einsum("ij,hwj->hwi", T[:3, :3], P) + T[:3, 3]
    wx, wy, _ = camera.project(Pt, fx, fy, cx, cy)
    if cfg.use_window_warp:
        sampler = interp.make_window_sampler(
            wx, wy, cfg.warp_window[level], Hh, Ww, valid=mask)
        warped = interp.window_sample(sampler, cur.image)
        gradx = interp.window_sample(sampler, cur.gradx)
        grady = interp.window_sample(sampler, cur.grady)
        in_bounds = sampler.in_bounds & sampler.in_window
    else:
        warped, in_bounds = interp.bilinear(cur.image, wx, wy)
        gradx = interp.bilinear_fill(cur.gradx, wx, wy)
        grady = interp.bilinear_fill(cur.grady, wx, wy)
    residual = jnp.where(in_bounds, warped - kf.image, 0.0)
    px, py, pz = Pt[..., 0], Pt[..., 1], Pt[..., 2]
    inv_d = 1.0 / jnp.where(mask, kf.depth, 1.0)
    pz2d = jnp.where(mask, pz * pz * inv_d, 1.0)
    g0 = (T[0, 3] * pz - T[2, 3] * px) / pz2d
    g1 = (T[1, 3] * pz - T[2, 3] * py) / pz2d
    drpdd = fx * gradx * g0 + fy * grady * g1
    s = jnp.maximum(kf.var, 0.0)
    w_p = 1.0 / (cfg.camera_pixel_noise_2 + s * drpdd * drpdd)
    weighted_rp = jnp.abs(residual * jnp.sqrt(w_p))
    half_huber = cfg.huber_d / 2.0
    wh = jnp.where(weighted_rp < half_huber, 1.0,
                   half_huber / jnp.maximum(weighted_rp, 1e-12))
    return jnp.where(mask & in_bounds, wh * w_p, 0.0)


def _template_jacobian(kf: KeyframeLevel, level: int, cfg: ELLCConfig
                       ) -> jnp.ndarray:
    """Steepest-descent rows from the TEMPLATE (keyframe) gradients and
    depth — the inverse-compositional precomputation
    (PixelWisePyramid::precomputePixelWiseInvCompositional,
    PixelWisePyramid.cpp:561-680)."""
    fx, fy, cx, cy = cfg.level_intrinsics(level)
    Hh, Ww = kf.image.shape
    x, y = camera.pixel_grid(Hh, Ww, dtype=kf.image.dtype)
    mask = kf.depth > 0.0
    gradx, grady = pyramid.gradients(kf.image)
    u = x - cx
    v = y - cy
    inv_d = 1.0 / jnp.where(mask, kf.depth, 1.0)
    sd0 = gradx * (-(v * u) / fy) + grady * (-(fy + (v * v) / fy))
    sd1 = gradx * (fx + (u * u) / fx) + grady * ((v * u) / fx)
    sd2 = gradx * (-(fx * v) / fy) + grady * ((fy * u) / fx)
    sd3 = gradx * (fx * inv_d)
    sd4 = grady * (fy * inv_d)
    sd5 = gradx * (-u * inv_d) + grady * (-v * inv_d)
    J = jnp.stack([sd0, sd1, sd2, sd3, sd4, sd5], axis=-1)
    return jnp.where(mask[..., None], J, 0.0)


def gn_level_const_weight(kf: KeyframeLevel, weights: jnp.ndarray,
                          cur: CurrentLevel, pose0: jnp.ndarray,
                          level: int, cfg: ELLCConfig, num_iters: int):
    """Inverse-compositional constant-weight GN at one level, used for
    loop-closure rematches (PixelWisePyramid.cpp:917-974): J and the 6x6
    Hessian are precomputed from the template with fixed saved weights;
    each iteration only warps and reduces J^T w r."""
    intr_unused = cfg.level_intrinsics(level)
    del intr_unused
    fx, fy, cx, cy = cfg.level_intrinsics(level)
    term_w = jnp.asarray(cfg.termination_weights, dtype=pose0.dtype)
    J = _template_jacobian(kf, level, cfg)
    Hmat = jnp.einsum("hwi,hwj,hw->ij", J, J, weights)
    Hinv_ok = jnp.all(jnp.isfinite(Hmat))
    Hh, Ww = kf.image.shape
    x, y = camera.pixel_grid(Hh, Ww, dtype=kf.image.dtype)
    mask = kf.depth > 0.0

    window = cfg.warp_window_rematch[level] if cfg.use_window_warp else None

    def body(carry, _):
        pose, done, wp_last, iters = carry
        T = lie.exp_se3(pose)
        P = camera.backproject(x, y, kf.depth, fx, fy, cx, cy)
        Pt = jnp.einsum("ij,hwj->hwi", T[:3, :3], P) + T[:3, 3]
        wx, wy, _ = camera.project(Pt, fx, fy, cx, cy)
        if window is not None:
            sampler = interp.make_window_sampler(wx, wy, window, Hh, Ww,
                                                 valid=mask)
            warped = interp.window_sample(sampler, cur.image)
            in_bounds = sampler.in_bounds & sampler.in_window
        else:
            warped, in_bounds = interp.bilinear(cur.image, wx, wy)
        residual = jnp.where(in_bounds & mask, warped - kf.image, 0.0)
        g = jnp.einsum("hwi,hw->i", J, residual * weights)
        delta = -linear.solve_spd(
            Hmat + 1e-12 * jnp.eye(6, dtype=Hmat.dtype), g)
        # see gn_level: zero the update on singular/near-singular systems
        # (OpenCV inv() semantics, PixelWisePyramid.cpp:939)
        ok = (jnp.all(jnp.isfinite(delta)) & Hinv_ok
              & (jnp.max(jnp.abs(delta)) < 1e3))
        delta = jnp.where(ok, delta, 0.0)
        new_pose = lie.compose(delta, pose)
        wp = jnp.sum(jnp.abs(delta * term_w))
        pose = jnp.where(done, pose, new_pose)
        wp_last = jnp.where(done, wp_last, wp)
        iters = iters + jnp.where(done, 0, 1)
        done = done | (wp < 1.0) | (~ok)
        return (pose, done, wp_last, iters), None

    init = (pose0, jnp.asarray(False), jnp.asarray(jnp.inf, pose0.dtype),
            jnp.asarray(0, jnp.int32))
    (pose, _, wp, iters), _ = jax.lax.scan(body, init, None, length=num_iters)
    return pose, wp, iters


def align_const_weight(kf_levels: Tuple[KeyframeLevel, ...],
                       weight_levels: Tuple[jnp.ndarray, ...],
                       cur_levels: Tuple[CurrentLevel, ...],
                       pose0: jnp.ndarray,
                       cfg: ELLCConfig,
                       max_iters: Tuple[int, ...] | None = None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Coarse-to-fine constant-weight alignment (loop-closure rematch
    path of GetImagePoseEstimate, ImageFunc.cpp:241-243)."""
    if max_iters is None:
        max_iters = cfg.max_iters
    pose = pose0
    wp = jnp.asarray(jnp.inf)
    for level in range(cfg.num_levels - 1, -1, -1):
        pose, wp, _ = gn_level_const_weight(
            kf_levels[level], weight_levels[level], cur_levels[level],
            pose, level, cfg, int(max_iters[level]))
    return pose, wp


def gn_level(kf: KeyframeLevel, cur: CurrentLevel, pose0: jnp.ndarray,
             level: int, cfg: ELLCConfig, num_iters: int,
             use_window: bool = True):
    """Run ``num_iters`` GN updates at one level with the reference's
    early-out-as-freeze-mask.  Returns (pose, weighted_pose, iters_used,
    stats) where stats = (energy, valid_count, oow) from the last LIVE
    linearization.

    Converged iterations SKIP the linearization entirely via ``lax.cond``
    — the reference breaks its iteration loop on weightedPose < 1
    (ImageFunc.cpp:251-252); the round-4 formulation froze the carry but
    still paid the full dense linearization for every budgeted iteration
    (the dominant part of the 11.5 ms/frame dense floor, BASELINE.md).
    On TPU ``cond`` with a traced predicate executes one branch; under
    vmap (multi-video batching) it lowers to select = the old behaviour,
    so this is never a pessimization."""
    intr = cfg.level_intrinsics(level)
    term_w = jnp.asarray(cfg.termination_weights, dtype=pose0.dtype)
    window = (cfg.warp_window[level]
              if (cfg.use_window_warp and use_window) else None)

    def live(pose, done, wp_last, iters, stats):
        Hmat, g, energy, valid, oow = _gn_quantities(kf, cur, pose, intr,
                                                     cfg, window=window)
        delta = -linear.solve_spd(
            Hmat + 1e-12 * jnp.eye(6, dtype=Hmat.dtype), g)
        # near-singular systems yield finite-but-astronomical deltas that
        # overflow exp_se3; OpenCV's Mat::inv() (used by the reference,
        # PixelWisePyramid.cpp:451) returns a ZERO matrix for singular
        # input, so the reference degrades to a zero update — replicate
        ok = jnp.all(jnp.isfinite(delta)) & (jnp.max(jnp.abs(delta)) < 1e3)
        delta = jnp.where(ok, delta, 0.0)
        new_pose = lie.compose(delta, pose)
        wp = jnp.sum(jnp.abs(delta * term_w))
        # freeze once converged (ImageFunc.cpp:251-252) or on solver
        # failure; the converged update itself is still applied
        return (new_pose, (wp < 1.0) | (~ok), wp, iters + 1,
                (energy, valid, oow))

    def body(carry, _):
        # freeze-mask, NOT lax.cond: a per-iteration cond in this hot
        # scan breaks XLA fusion and measured 4x slower end-to-end on
        # TPU (67 -> 15.5 f/s driver bench, round 5) — far more than the
        # linearization it skips ever saves.  Converged iterations pay
        # the full dense pass and discard it via where(), exactly the
        # round-4 formulation.
        pose, done, wp_last, iters, stats = carry
        new_pose, new_done, wp, new_iters, new_stats = live(
            pose, done, wp_last, iters, stats)
        carry = (jnp.where(done, pose, new_pose),
                 done | new_done,
                 jnp.where(done, wp_last, wp),
                 jnp.where(done, iters, new_iters),
                 jax.tree.map(lambda o, n: jnp.where(done, o, n),
                              stats, new_stats))
        return carry, None

    f32 = pose0.dtype
    init = (pose0, jnp.asarray(False), jnp.asarray(jnp.inf, f32),
            jnp.asarray(0, jnp.int32),
            (jnp.asarray(0.0, f32), jnp.asarray(0.0, f32),
             jnp.asarray(0.0, f32)))
    (pose, _, wp, iters, stats), _ = jax.lax.scan(body, init, None,
                                                  length=num_iters)
    return pose, wp, iters, stats


def align(kf_levels: Tuple[KeyframeLevel, ...],
          cur_levels: Tuple[CurrentLevel, ...],
          pose0: jnp.ndarray,
          cfg: ELLCConfig,
          max_iters: Tuple[int, ...] | None = None
          ) -> Tuple[jnp.ndarray, AlignDiagnostics]:
    """Coarse-to-fine alignment of the current frame against the keyframe.

    ``pose0`` is the initial guess of the current frame w.r.t. the keyframe
    (se(3) twist); returns the refined pose and diagnostics.  Mirrors the
    pyramid loop of GetImagePoseEstimate (ImageFunc.cpp:150-299).

    Diagnostics (energy / valid_fraction / oow_fraction) come from the
    finest level's LAST live linearization — evaluated at the pose before
    its final update, one GN step stale.  The round-4 version spent a
    full extra level-0 linearization (~1.5 ms/frame) to evaluate them at
    the exact final pose; the statistics differ by <1% over ~10^5 pixels
    and are purely observational (FrameOutput diagnostics).

    High-parallax fallback lives at the HOST level, not here: any
    in-jit ``lax.cond`` on the censoring fraction measured 3-4x slower
    end-to-end (both the per-iteration and the per-frame variant, round
    5 — control flow in the hot path breaks XLA fusion/pipelining).
    Instead ``diag.oow_fraction`` is surfaced through FrameOutput and
    the DRIVERS redispatch an interval whose censoring exceeds
    ``cfg.warp_oow_fallback`` with the gather-warp program
    (``use_window_warp=False`` — a separate, lazily-compiled jit
    variant): zero cost on ordinary frames, one extra interval on
    extreme ones (runtime/pipeline.process_interval_with_fallback)."""
    if max_iters is None:
        max_iters = cfg.max_iters
    pose = pose0
    wps = []
    iters_used = []
    stats0 = None
    for level in range(cfg.num_levels - 1, -1, -1):
        pose, wp, it, stats = gn_level(kf_levels[level], cur_levels[level],
                                       pose, level, cfg,
                                       int(max_iters[level]))
        wps.append(wp)
        iters_used.append(it)
        if level == 0:
            stats0 = stats
    energy, valid, oow = stats0
    total = kf_levels[0].image.size
    diag = AlignDiagnostics(
        weighted_pose=wps[-1],
        iters_used=jnp.stack(iters_used[::-1]),
        final_energy=energy,
        valid_fraction=valid / total,
        oow_fraction=oow,
    )
    return pose, diag


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters"))
def align_jit(kf_levels, cur_levels, pose0, cfg: ELLCConfig,
              max_iters: Tuple[int, ...] | None = None):
    return align(kf_levels, cur_levels, pose0, cfg, max_iters)


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters"))
def align_const_weight_jit(kf_levels, weight_levels, cur_levels, pose0,
                           cfg: ELLCConfig,
                           max_iters: Tuple[int, ...] | None = None):
    """Jitted constant-weight rematch alignment: one dispatch per
    candidate instead of hundreds of eager ops (used by the loop-closure
    window walk and connection recovery)."""
    return align_const_weight(kf_levels, weight_levels, cur_levels, pose0,
                              cfg, max_iters)


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters"))
def align_const_weight_batch_jit(kf_levels, weight_levels, cur_levels,
                                 pose0s, cfg: ELLCConfig,
                                 max_iters: Tuple[int, ...] | None = None):
    """All rematch candidates in ONE dispatch: vmap of the constant-weight
    aligner over stacked keyframe templates/weights/initial poses, the
    current frame shared.  This is the TPU replacement for the reference's
    single background thread aligning window candidates one after another
    (findMatchParallel, GlobalOptimize.cpp:454-646): identical per-level
    shapes across the window make the candidates a clean batch axis.

    ``kf_levels``/``weight_levels`` are the per-entry tuples stacked along
    a new leading axis (jax.tree.map(jnp.stack, ...)); ``pose0s`` is
    (B, 6).  Returns (poses (B, 6), weighted_pose (B,))."""
    return jax.vmap(
        lambda k, w, p: align_const_weight(k, w, cur_levels, p, cfg,
                                           max_iters),
        in_axes=(0, 0, 0))(kf_levels, weight_levels, pose0s)
