"""Epipolar line-stereo depth observation as one dense fixed-shape kernel.

TPU-native rewrite of the reference's hottest code path:
``depthMap::observeDepthRow`` / ``observeDepthCreate`` /
``observeDepthUpdate`` / ``makeAndCheckEPL`` / ``doLineStereo``
(``src/DepthPropagation.cpp:191-999``).  The reference walks a
data-dependent number of steps along each pixel's epipolar segment on 3
CPU threads; here every pixel's search is a fixed ``S``-step vectorized
scan (steps past the segment end masked off): 5-tap SSD via sampled
points, masked argmin, subpixel parabola, and the LSD-SLAM
geometric+photometric variance model, followed by the per-pixel EKF
create/update rules as dense selects.

The sampling walk is gather-bound (~7.2 ns/lookup on this chip for ANY
gather formulation — tools/probe_gather.py), so the kernel runs in one of
two layouts chosen by ``cfg.stereo_compact_frac``:

  * dense: every (H, W) pixel walks all S steps (golden path, used by the
    equality tests);
  * compacted: only the pixels that actually pass the observation gates
    (typically ~26% of the image; DepthPropagation.cpp:224-235 gates) are
    packed into a fixed-capacity index vector with ``jnp.nonzero`` and
    ONLY those walk the epipolar segment — the gather count drops by the
    same factor.  A fixed pseudo-random permutation interleaves the scan
    order so that, on the rare frames where more pixels pass the gates
    than the capacity holds, the overflow drop is spatially uniform
    instead of censoring the bottom of the image (the reference processes
    every pixel every frame; dropped pixels here simply retry next frame,
    and the drop count is surfaced in ObserveResult.num_overflow).

Sampling fetches both x-interpolation neighbours per 32-bit word
(interp.pack_pairs_u16, 2 gathers per sample) or the whole 2x2 corner
block 8-bit-quantized (interp.pack_quad_u8, 1 gather per sample) when
``cfg.stereo_pack_u8`` is set.

Error codes match the reference (DepthPropagation.cpp:395-396):
  0 success, -1 out-of-bounds, -2 not-found/ambiguous/negative-depth,
  -3 error too big, -4 invalid epipolar geometry, -5 epl pre-check failed,
  -6 inconsistent with prior.

Pose convention: ``pose_cur_wrt_kf`` maps keyframe coords to current-frame
coords (P_cur = exp(xi) P_kf).  The reference's Sim3 re-scale of this
transform (Frame.cpp:419-439, set in updateKeyFrame) is immediately
overwritten by the plain SE3 recompute in observeDepthRowParallel
(DepthPropagation.cpp:1935) before any stereo runs, so only the SE3 form
is ever used here — matching actual reference behaviour.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth.state import DepthMapState
from egomotion_with_local_loop_closures_tpu.geom import camera, lie
from egomotion_with_local_loop_closures_tpu.image import interp


class StereoResult(NamedTuple):
    code: jnp.ndarray       # int32 error code (0 = success)
    idepth: jnp.ndarray     # triangulated inverse depth (KF frame)
    var: jnp.ndarray        # observation variance
    err: jnp.ndarray        # best SSD error


def _set_code(code: jnp.ndarray, cond: jnp.ndarray, val: int) -> jnp.ndarray:
    """First failure wins: only overwrite where still 0."""
    return jnp.where((code == 0) & cond, jnp.int32(val), code)


def epl_direction(kf_image: jnp.ndarray, t_kf_from_cur: jnp.ndarray,
                  cfg: ELLCConfig
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Normalized epipolar direction per KF pixel + pass mask.

    Mirrors makeAndCheckEPL (DepthPropagation.cpp:311-384).  ``t_kf_from_cur``
    is the translation of T_{kf<-cur} (reference: SE3poseOtherWrtThis_t with
    this=current, other=keyframe).  The gradient used here is the *raw*
    central difference without the 0.5 factor (DepthPropagation.cpp:347-348).
    """
    H, W = kf_image.shape
    x, y = camera.pixel_grid(H, W)
    epx = -cfg.fx * t_kf_from_cur[0] + t_kf_from_cur[2] * (x - cfg.cx)
    epy = -cfg.fy * t_kf_from_cur[1] + t_kf_from_cur[2] * (y - cfg.cy)
    ok = ~jnp.isnan(epx + epy)
    len2 = epx * epx + epy * epy
    ok &= len2 >= cfg.min_epl_length_squared
    # raw +-1 differences (no 0.5), zero at borders (gated out anyway)
    gx = jnp.zeros_like(kf_image).at[:, 1:-1].set(
        kf_image[:, 2:] - kf_image[:, :-2])
    gy = jnp.zeros_like(kf_image).at[1:-1, :].set(
        kf_image[2:, :] - kf_image[:-2, :])
    dot = gx * epx + gy * epy
    grad2 = dot * dot / jnp.where(len2 > 0, len2, 1.0)
    ok &= grad2 >= cfg.min_epl_grad_squared
    g2 = gx * gx + gy * gy
    ok &= grad2 / jnp.where(g2 > 0, g2, 1e-12) >= cfg.min_epl_angle_squared
    fac = cfg.gradient_sample_dist / jnp.sqrt(jnp.where(len2 > 0, len2, 1.0))
    return epx * fac, epy * fac, ok


def _pose_blocks(pose_cur_wrt_kf: jnp.ndarray, cfg: ELLCConfig):
    T = lie.exp_se3(pose_cur_wrt_kf)
    R, t = T[:3, :3], T[:3, 3]                    # cur <- kf
    K = camera.intrinsics_matrix(cfg.fx, cfg.fy, cfg.cx, cfg.cy)
    return R, t, K @ R, K @ t


def _pinf_rescale(x, y, prior_idepth, KR, Kt, cfg):
    """The infinity point of each pixel's ray in the current image and
    the reference's 'rescale' (doLineStereo :401-405)."""
    kx = (x - cfg.cx) / cfg.fx
    ky = (y - cfg.cy) / cfg.fy
    pinf = jnp.stack([KR[0, 0] * kx + KR[0, 1] * ky + KR[0, 2],
                      KR[1, 0] * kx + KR[1, 1] * ky + KR[1, 2],
                      KR[2, 0] * kx + KR[2, 1] * ky + KR[2, 2]], axis=0)
    prior_safe = jnp.where(jnp.abs(prior_idepth) > 1e-12, prior_idepth,
                           1e-12)
    preal_z = pinf[2] / prior_safe + Kt[2]
    rescale = preal_z * prior_idepth              # (:405)
    return kx, ky, pinf, rescale


def _sample(cur_packed: jnp.ndarray, sx, sy, u8: bool):
    if u8:
        return interp.bilinear_quad_fill(cur_packed, sx, sy)
    return interp.bilinear_packed_fill(cur_packed, sx, sy)


class SegmentSetup(NamedTuple):
    """The gather-free part of doLineStereo: per-pixel epipolar segment
    endpoints, step increment and pre-check error code — everything up to
    (but not including) the sampling walk (DepthPropagation.cpp:397-553).
    All fields share the per-pixel shape P.  Elementwise only, so it can
    be evaluated densely over the whole image to decide WHICH pixels need
    the (gather-bound) walk and how many steps each needs, then
    re-evaluated bit-identically on the compacted pixel subset."""
    code: jnp.ndarray
    pfar_x: jnp.ndarray
    pfar_y: jnp.ndarray
    incx: jnp.ndarray
    incy: jnp.ndarray
    pclose_x: jnp.ndarray
    pclose_y: jnp.ndarray
    rescale: jnp.ndarray
    walk_len: jnp.ndarray   # |pclose - pfar| after all clamps (pixels)


def _segment_setup(x, y, epxn, epyn,
                   min_idepth, prior_idepth, max_idepth,
                   pose_cur_wrt_kf, H: int, W: int,
                   cfg: ELLCConfig) -> SegmentSetup:
    """Segment construction + pre-checks of doLineStereo
    (DepthPropagation.cpp:397-553)."""
    P = x.shape

    _, _, KR, Kt = _pose_blocks(pose_cur_wrt_kf, cfg)
    code = jnp.zeros(P, jnp.int32)

    kx, ky, pinf, rescale = _pinf_rescale(x, y, prior_idepth, KR, Kt, cfg)

    first_x = x - 2.0 * epxn * rescale
    first_y = y - 2.0 * epyn * rescale
    last_x = x + 2.0 * epxn * rescale
    last_y = y + 2.0 * epyn * rescale
    oob = ((first_x <= 0) | (first_x >= W - 2) | (first_y <= 0)
           | (first_y >= H - 2) | (last_x <= 0) | (last_x >= W - 2)
           | (last_y <= 0) | (last_y >= H - 2))
    code = _set_code(code, oob, -1)               # (:414-421)
    code = _set_code(code, ~((rescale > 0.7) & (rescale < 1.4)), -1)  # (:424)

    # close / far endpoints in the current image (:438-458)
    kt = Kt.reshape((3,) + (1,) * len(P))
    pclose = pinf + kt * max_idepth
    fix = pclose[2] < 0.001
    max_id2 = jnp.where(fix, (0.001 - pinf[2]) / jnp.where(
        jnp.abs(Kt[2]) > 1e-12, Kt[2], 1e-12), max_idepth)
    pclose = pinf + kt * max_id2
    pclose_z = jnp.where(jnp.abs(pclose[2]) > 1e-12, pclose[2], 1e-12)
    pclose = pclose / pclose_z

    pfar = pinf + kt * min_idepth
    code = _set_code(code, (pfar[2] < 0.001) | (max_id2 < min_idepth), -1)
    pfar_z = jnp.where(jnp.abs(pfar[2]) > 1e-12, pfar[2], 1e-12)
    pfar = pfar / pfar_z

    code = _set_code(code, jnp.isnan(pfar[0] + pclose[0]), -4)   # (:462)

    incx = pclose[0] - pfar[0]
    incy = pclose[1] - pfar[1]
    epl_len = jnp.sqrt(incx * incx + incy * incy)
    code = _set_code(code, ~(epl_len > 0) | jnp.isinf(epl_len), -4)  # (:472)

    # crop to MAX_EPL_LENGTH_CROP (:479-483)
    crop = epl_len > cfg.max_epl_length_crop
    safe_len = jnp.where(epl_len > 0, epl_len, 1.0)
    pclose_x = jnp.where(crop,
                         pfar[0] + incx * cfg.max_epl_length_crop / safe_len,
                         pclose[0])
    pclose_y = jnp.where(crop,
                         pfar[1] + incy * cfg.max_epl_length_crop / safe_len,
                         pclose[1])
    incx = incx * cfg.gradient_sample_dist / safe_len
    incy = incy * cfg.gradient_sample_dist / safe_len

    pfar_x = pfar[0] - incx
    pfar_y = pfar[1] - incy
    pclose_x = pclose_x + incx
    pclose_y = pclose_y + incy

    # pad to MIN_EPL_LENGTH_CROP (:497-505)
    pad = jnp.where(epl_len < cfg.min_epl_length_crop,
                    (cfg.min_epl_length_crop - epl_len) / 2.0, 0.0)
    pfar_x = pfar_x - incx * pad
    pfar_y = pfar_y - incy * pad
    pclose_x = pclose_x + incx * pad
    pclose_y = pclose_y + incy * pad

    # far point outside image -> skip (:508-516)
    b = cfg.sample_point_to_border
    code = _set_code(code, (pfar_x <= b) | (pfar_x >= W - b)
                     | (pfar_y <= b) | (pfar_y >= H - b), -1)

    # near point outside -> clamp along the line, in the reference's exact
    # order: x-low / x-high then y-low / y-high on updated values (:519-549)
    lo_x = pclose_x <= b
    hi_x = pclose_x >= W - b
    inc_safe_x = jnp.where(jnp.abs(incx) > 1e-12, incx, 1e-12)
    add_x = jnp.where(lo_x, (b - pclose_x) / inc_safe_x,
                      jnp.where(hi_x, (W - b - pclose_x) / inc_safe_x, 0.0))
    pclose_x = pclose_x + add_x * incx
    pclose_y = pclose_y + add_x * incy
    lo_y = pclose_y <= b
    hi_y = pclose_y >= H - b
    inc_safe_y = jnp.where(jnp.abs(incy) > 1e-12, incy, 1e-12)
    add_y = jnp.where(lo_y, (b - pclose_y) / inc_safe_y,
                      jnp.where(hi_y, (H - b - pclose_y) / inc_safe_y, 0.0))
    pclose_x = pclose_x + add_y * incx
    pclose_y = pclose_y + add_y * incy
    fincx = pclose_x - pfar_x
    fincy = pclose_y - pfar_y
    new_len = jnp.sqrt(fincx * fincx + fincy * fincy)
    still_out = ((pclose_x <= b) | (pclose_x >= W - b)
                 | (pclose_y <= b) | (pclose_y >= H - b))
    clamped = lo_x | hi_x | lo_y | hi_y
    code = _set_code(code, clamped & (still_out | (new_len < 8.0)), -1)

    return SegmentSetup(code=code, pfar_x=pfar_x, pfar_y=pfar_y,
                        incx=incx, incy=incy,
                        pclose_x=pclose_x, pclose_y=pclose_y,
                        rescale=rescale, walk_len=new_len)


def _step_cond(seg: SegmentSetup, S: int):
    """The walk's continuation condition for steps 0..S-1 (the while-loop
    test at DepthPropagation.cpp:628), shape (S,) + P.  Elementwise."""
    P = seg.pfar_x.shape
    ks = jnp.arange(S, dtype=seg.pfar_x.dtype).reshape((S,) + (1,) * len(P))
    posx = seg.pfar_x[None] + ks * seg.incx[None]
    posy = seg.pfar_y[None] + ks * seg.incy[None]
    cond = (((seg.incx[None] < 0) == (posx > seg.pclose_x[None]))
            & ((seg.incy[None] < 0) == (posy > seg.pclose_y[None])))
    return cond.at[0].set(True)


def count_steps(seg: SegmentSetup, S: int) -> jnp.ndarray:
    """Exact number of walk steps each pixel takes (= leading run of True
    in the cumulative step condition).  Computed with the same float ops
    as the walk itself, so a pool sized by ``count_steps(seg, S) <= S'``
    is guaranteed to reproduce the full-S walk bit-for-bit."""
    valid = jnp.cumprod(_step_cond(seg, S).astype(jnp.int32), axis=0)
    return jnp.sum(valid, axis=0)


def _walk(x, y, real, epxn, epyn, gix, giy,
          seg: SegmentSetup, cur_packed, pose_cur_wrt_kf,
          S: int, H: int, W: int, cfg: ELLCConfig) -> StereoResult:
    """The sampling walk + subpixel + triangulation + variance model of
    doLineStereo (DepthPropagation.cpp:611-885) over a fixed trip count
    ``S``.  Per-pixel inputs share an arbitrary leading shape P (the full
    (H, W) grid on the dense path, a compacted (CAP,) vector otherwise);
    ``real`` is the 5-tap KF descriptor with shape (5,) + P;
    ``cur_packed`` stays the full (H, W) packed current image.  Results
    are exact for every pixel whose step count is <= S (count_steps)."""
    fx, fy, cx, cy = cfg.fx, cfg.fy, cfg.cx, cfg.cy
    eps = cfg.division_eps
    P = x.shape
    R, t, _, _ = _pose_blocks(pose_cur_wrt_kf, cfg)
    kx = (x - cx) / fx
    ky = (y - cy) / fy
    code = seg.code
    pfar_x, pfar_y = seg.pfar_x, seg.pfar_y
    incx, incy = seg.incx, seg.incy
    pclose_x, pclose_y = seg.pclose_x, seg.pclose_y
    rescale = seg.rescale

    # ---- fixed-trip epipolar walk (:611-710) ----
    # sample current image at pFar + o*inc for o in [-2, S+1]
    offs = jnp.arange(-2, S + 2, dtype=x.dtype)             # (S+4,)
    offs = offs.reshape((S + 4,) + (1,) * len(P))
    sx = pfar_x[None] + offs * incx[None]                    # (S+4,) + P
    sy = pfar_y[None] + offs * incy[None]
    # NaN coords (failed pixels) would poison gather indices: zero them.
    bad = code != 0
    sx = jnp.where(bad[None], 0.0, sx)
    sy = jnp.where(bad[None], 0.0, sy)
    # one un-batched sampling call over all (S+4,)+P coords: XLA's gather
    # batching rule (under vmap) emits a ~200x slower kernel on TPU, so
    # sample all epipolar steps in a single call — through the packed
    # current image (2 gathers per sample u16-pairs, 1 with u8-quads)
    samples = _sample(cur_packed, sx, sy, cfg.stereo_pack_u8)

    # residuals per step k (0..S-1): e_j(k) = samples[k+2+j] - real[2+j]
    # with j in {-2..2}; ee = sum_j e_j^2
    e = jnp.stack([samples[j:j + S] - real[j][None] for j in range(5)],
                  axis=0)                                    # (5, S) + P
    ee = jnp.sum(e * e, axis=0)                              # (S,) + P
    # cross-correlation with previous step for subpixel (:670,684)
    ecorr = jnp.sum(e[:, 1:] * e[:, :-1], axis=0)            # (S-1,) + P
    ecorr = jnp.concatenate(
        [jnp.full((1,) + P, jnp.nan, ee.dtype), ecorr],
        axis=0)                          # ecorr[k] = sum e(k) e(k-1)

    # step validity: the while-loop condition (:628), cumulative
    cond = _step_cond(seg, S)
    step_valid = jnp.cumprod(cond.astype(jnp.int32), axis=0).astype(bool)

    ee_masked = jnp.where(step_valid, ee, jnp.inf)
    kbest = jnp.argmin(ee_masked, axis=0)                    # P
    best = jnp.take_along_axis(ee_masked, kbest[None], axis=0)[0]
    # second best among k != kbest
    karange = jnp.arange(S).reshape((S,) + (1,) * len(P))
    ee2 = jnp.where(karange == kbest[None], jnp.inf, ee_masked)
    ksecond = jnp.argmin(ee2, axis=0)
    second = jnp.take_along_axis(ee2, ksecond[None], axis=0)[0]

    num_steps = jnp.sum(step_valid, axis=0)
    err_pre = jnp.where(kbest >= 1,
                        jnp.take_along_axis(
                            ee, jnp.maximum(kbest - 1, 0)[None],
                            axis=0)[0], -1.0)
    has_post = (kbest + 1) < num_steps
    err_post = jnp.where(has_post,
                         jnp.take_along_axis(
                             ee, jnp.minimum(kbest + 1, S - 1)[None],
                             axis=0)[0], -1.0)
    diff_pre = jnp.take_along_axis(ecorr, kbest[None], axis=0)[0]
    diff_post = jnp.take_along_axis(ecorr, jnp.minimum(kbest + 1, S - 1)[None],
                                    axis=0)[0]

    code = _set_code(code, best > 4.0 * cfg.max_error_stereo, -3)   # (:713)
    ambiguous = ((jnp.abs(kbest - ksecond) > 1)
                 & (cfg.min_distance_error_stereo * best > second))
    code = _set_code(code, ambiguous, -2)                           # (:721)

    # ---- subpixel refinement (:727-803) ----
    grad_pre_pre = -(err_pre - diff_pre)
    grad_pre_this = best - diff_pre
    grad_post_this = -(best - diff_post)
    grad_post_post = err_post - diff_post
    has_both = (err_pre >= 0) & (err_post >= 0)
    zc_pre = (grad_pre_pre < 0) ^ (grad_pre_this < 0)
    zc_post = (grad_post_post < 0) ^ (grad_post_this < 0)
    interp_pre = has_both & zc_pre & ~zc_post
    interp_post = has_both & ~zc_pre & zc_post
    d_pre = grad_pre_this / jnp.where(
        jnp.abs(grad_pre_this - grad_pre_pre) > 1e-12,
        grad_pre_this - grad_pre_pre, 1e-12)
    d_post = grad_post_this / jnp.where(
        jnp.abs(grad_post_this - grad_post_post) > 1e-12,
        grad_post_this - grad_post_post, 1e-12)
    best_x = pfar_x + kbest.astype(x.dtype) * incx
    best_y = pfar_y + kbest.astype(x.dtype) * incy
    best_x = jnp.where(interp_pre, best_x - d_pre * incx,
                       jnp.where(interp_post, best_x + d_post * incx, best_x))
    best_y = jnp.where(interp_pre, best_y - d_pre * incy,
                       jnp.where(interp_post, best_y + d_post * incy, best_y))
    best = jnp.where(
        interp_pre,
        best - 2.0 * d_pre * grad_pre_this
        - (grad_pre_pre - grad_pre_this) * d_pre * d_pre,
        jnp.where(
            interp_post,
            best + 2.0 * d_post * grad_post_this
            + (grad_post_post - grad_post_this) * d_post * d_post,
            best))
    did_subpixel = interp_pre | interp_post

    # ---- gradient along line + final error check (:806-821) ----
    sample_dist = cfg.gradient_sample_dist * rescale
    g_along = ((real[4] - real[3]) ** 2 + (real[3] - real[2]) ** 2
               + (real[2] - real[1]) ** 2 + (real[1] - real[0]) ** 2)
    g_along = g_along / jnp.where(jnp.abs(sample_dist) > 1e-12,
                                  sample_dist * sample_dist, 1e-12)
    code = _set_code(
        code, best > cfg.max_error_stereo + jnp.sqrt(
            jnp.maximum(g_along, 0.0)) * 20.0, -3)

    # ---- triangulation (:824-853) ----
    # KinvP dotted with rows of R (cur <- kf); t likewise
    dot0 = R[0, 0] * kx + R[0, 1] * ky + R[0, 2]
    dot1 = R[1, 0] * kx + R[1, 1] * ky + R[1, 2]
    dot2 = R[2, 0] * kx + R[2, 1] * ky + R[2, 2]
    use_x = incx * incx > incy * incy
    old_x = best_x / fx - cx / fx
    old_y = best_y / fy - cy / fy
    nom_x = old_x * t[2] - t[0]
    nom_y = old_y * t[2] - t[1]
    nom = jnp.where(use_x, nom_x, nom_y)
    nom_safe = jnp.where(jnp.abs(nom) > 1e-12, nom, 1e-12)
    idepth_x = (dot0 - old_x * dot2) / nom_safe
    idepth_y = (dot1 - old_y * dot2) / nom_safe
    idepth = jnp.where(use_x, idepth_x, idepth_y)
    # NOTE: the reference uses ORIG_FX_INV in BOTH branches (:839 and :851,
    # the y-branch arguably should use 1/fy); replicated as-is for parity.
    alpha_x = incx * (1.0 / fx) * (dot0 * t[2] - dot2 * t[0]) / (
        nom_safe * nom_safe)
    alpha_y = incy * (1.0 / fx) * (dot1 * t[2] - dot2 * t[1]) / (
        nom_safe * nom_safe)
    alpha = jnp.where(use_x, alpha_x, alpha_y)
    code = _set_code(code, idepth < 0, -2)                          # (:856)

    # ---- variance model (:861-878) ----
    photo = 4.0 * cfg.camera_pixel_noise / (g_along + eps)
    track_fac = 0.25
    geo_den = gix * epxn + giy * epyn + eps
    geo = track_fac * track_fac * (gix * gix + giy * giy) / (
        geo_den * geo_den)
    disc = jnp.where(did_subpixel, 0.05, 0.5) * sample_dist * sample_dist
    var = alpha * alpha * (disc + geo + photo)

    return StereoResult(code=code, idepth=idepth, var=var, err=best)


def _kf_descriptor(kf_image: jnp.ndarray, epxn, epyn, rescale,
                   H: int, W: int) -> jnp.ndarray:
    """5-tap descriptor from the KF image (:432-436).  Tap displacements
    are bounded by 2*|epl_step|*rescale <= 2.8 px (rescale is gated to
    (0.7, 1.4)), so the taps use the gather-free WindowSampler (D=4,
    zero global shift); the centre tap is the image itself."""
    x, y = camera.pixel_grid(H, W)
    zero = jnp.int32(0)

    def kf_sample(j):
        s = interp.make_window_sampler(x + j * epxn * rescale,
                                       y + j * epyn * rescale,
                                       4, H, W, shift_y=zero, shift_x=zero)
        return interp.window_sample(s, kf_image)
    return jnp.stack([kf_sample(-2.0), kf_sample(-1.0), kf_image,
                      kf_sample(1.0), kf_sample(2.0)],
                     axis=0)                      # (5, H, W) m2..p2


def line_stereo(kf_image: jnp.ndarray,
                kf_gradx: jnp.ndarray, kf_grady: jnp.ndarray,
                cur_packed: jnp.ndarray,
                epxn: jnp.ndarray, epyn: jnp.ndarray,
                min_idepth: jnp.ndarray, prior_idepth: jnp.ndarray,
                max_idepth: jnp.ndarray,
                pose_cur_wrt_kf: jnp.ndarray,
                cfg: ELLCConfig) -> StereoResult:
    """Dense doLineStereo (DepthPropagation.cpp:397-885) for every pixel.

    All inputs are (H, W) except the pose; ``cur_packed`` is the current
    image packed by interp.pack_pairs_u16 (or pack_quad_u8 when
    cfg.stereo_pack_u8).  Gating is the caller's job — every pixel is
    computed and failures are reported via ``code``.
    """
    H, W = kf_image.shape
    x, y = camera.pixel_grid(H, W)
    seg = _segment_setup(x, y, epxn, epyn, min_idepth, prior_idepth,
                         max_idepth, pose_cur_wrt_kf, H, W, cfg)
    real = _kf_descriptor(kf_image, epxn, epyn, seg.rescale, H, W)
    return _walk(x, y, real, epxn, epyn, kf_gradx, kf_grady, seg,
                 cur_packed, pose_cur_wrt_kf, cfg.stereo_max_steps,
                 H, W, cfg)


def _interleave_perm(n: int) -> jnp.ndarray:
    """A fixed golden-ratio stride permutation of range(n): consecutive
    scan positions land ~0.618*n apart, so truncating the compacted index
    list drops pixels uniformly over the image instead of censoring the
    last rows."""
    import numpy as np
    stride = int(round(n * 0.6180339887498949))
    while np.gcd(stride, n) != 1:
        stride += 1
    return jnp.asarray((np.arange(n, dtype=np.int64) * stride) % n,
                       jnp.int32)


def _pool_indices(mask_p: jnp.ndarray, prio_p: jnp.ndarray | None,
                  cap: int, perm: jnp.ndarray, HW: int,
                  rot: jnp.ndarray | None = None):
    """Pack the True positions of ``mask_p`` (a permuted flat mask) into
    ``cap`` slots.  ``prio_p`` pixels claim capacity FIRST (the caller
    passes existing-hypothesis pixels, whose EKF update decays validity
    when skipped), so overflow only ever drops create attempts.  Returns
    (flat pixel indices with HW marking empty slots, overflow count).

    ``rot`` (int32 scalar) rotates the create ranks circularly so that
    under SUSTAINED overflow (bootstrap frames demand ~0.58 of the image
    vs cap 0.18) a DIFFERENT subset of create attempts is dropped each
    frame — without it the fixed golden-ratio permutation starves the
    same trailing pixels every frame and depth bootstrap converges only
    via winners migrating to the priority tier.  When everything fits
    the rotation merely permutes slot assignment (the pooled SET is
    unchanged), so compact-vs-dense equality is unaffected.

    Layout: each selected pixel computes its own pool slot with cumsums
    (priority pixels rank first, others after all priority ones) and
    scatters its pixel id there — one pass over HW + one cap-sized
    scatter, several times cheaper than jnp.nonzero(size=cap) per class
    (measured in tools/probe_stereo_breakdown.py)."""
    n = jnp.sum(mask_p)
    overflow = jnp.maximum(n - cap, 0)
    if prio_p is None:
        rank = jnp.cumsum(mask_p.astype(jnp.int32)) - 1
        if rot is not None:
            nn = jnp.maximum(n, 1).astype(jnp.int32)
            rank = (rank + rot % nn) % nn
        slot = jnp.where(mask_p, rank, cap)
    else:
        mp = mask_p & prio_p
        mc = mask_p & ~prio_p
        n_p = jnp.sum(mp)
        rank_p = jnp.cumsum(mp.astype(jnp.int32)) - 1
        rank_c = jnp.cumsum(mc.astype(jnp.int32)) - 1
        if rot is not None:
            n_c = jnp.maximum(jnp.sum(mc), 1).astype(jnp.int32)
            rank_c = (rank_c + rot % n_c) % n_c
        slot = jnp.where(mp, rank_p, jnp.where(mc, n_p + rank_c, cap))
    slot = jnp.minimum(slot, cap)                    # overflow -> drop slot
    pool = jnp.full((cap + 1,), HW, jnp.int32).at[slot].set(perm)
    return pool[:cap], overflow


def line_stereo_compact(run: jnp.ndarray,
                        kf_image: jnp.ndarray,
                        kf_gradx: jnp.ndarray, kf_grady: jnp.ndarray,
                        cur_packed: jnp.ndarray,
                        epxn: jnp.ndarray, epyn: jnp.ndarray,
                        min_idepth: jnp.ndarray, prior_idepth: jnp.ndarray,
                        max_idepth: jnp.ndarray,
                        pose_cur_wrt_kf: jnp.ndarray,
                        cfg: ELLCConfig,
                        priority: jnp.ndarray | None = None,
                        rot: jnp.ndarray | None = None
                        ) -> Tuple[StereoResult, jnp.ndarray]:
    """Seed-compacted doLineStereo: only pixels with ``run`` True walk the
    epipolar segment.  Returns (dense StereoResult, overflow count).

    The walk is gather-bound (~7.2 ns/lookup, tools/probe_gather.py), so
    the kernel spends its gathers only where they can matter:

    1. the gather-free segment setup runs DENSELY first; pixels that fail
       its pre-checks (codes -1/-4 — OOB, bad geometry) never enter a
       pool.  Their pre-check codes are reported from the dense plane at
       zero gather cost (observe()'s EKF treats -1/-4 exactly like
       unprocessed pixels, so capacity is not spent on them);
    2. the surviving pixels are split by a CONSERVATIVE walk-length
       bound, walk_len / gradient_sample_dist + 2 >= the exact step
       count (stereo.count_steps computes the exact count and validates
       the bound in tests; the reference's own mu +- 2 sigma prior bound
       shortens converged seeds' segments, DepthPropagation.cpp:434-486)
       into a SHORT pool walking only cfg.stereo_short_steps samples and
       a LONG pool walking the full cfg.stereo_max_steps; converged
       seeds dominate in steady state, cutting the per-frame lookup
       count ~2-3x versus a single full-length pool.

    Pixels dropped by pool capacity report code -5 / zeros — the
    caller's gating ignores them and they retry on later frames (the
    drop count is returned; the golden-ratio interleave spreads drops
    uniformly over the image and ``rot`` cycles WHICH creates are
    dropped under sustained overflow, see _pool_indices).  ``priority``
    pixels claim capacity first within each pool.  Wherever ``run`` holds and capacity suffices the
    result is IDENTICAL to line_stereo: the walk is elementwise per
    pixel, the pooled segment setup is recomputed bit-identically from
    the gathered inputs, and a short-pool pixel's full-S walk is
    provably equal to its short walk because every step beyond
    count_steps is masked out of the argmin (tests assert equality).
    """
    H, W = kf_image.shape
    HW = H * W
    S = cfg.stereo_max_steps
    S_short = cfg.stereo_short_steps
    cap_long = int(round(cfg.stereo_compact_frac * HW))
    cap_short = int(round(cfg.stereo_short_frac * HW))

    x, y = camera.pixel_grid(H, W)
    seg_d = _segment_setup(x, y, epxn, epyn, min_idepth, prior_idepth,
                           max_idepth, pose_cur_wrt_kf, H, W, cfg)
    real = _kf_descriptor(kf_image, epxn, epyn, seg_d.rescale, H, W)

    ok = run & (seg_d.code == 0)
    perm = _interleave_perm(HW)

    # pack (ok, short-tier, priority) into ONE flag plane so the permuted
    # reorder costs a single HW gather instead of three (measured in
    # tools/probe_stereo_breakdown.py)
    if S_short > 0:
        # conservative walk-length bound: the walk takes at most
        # walk_len / gradient_sample_dist + 2 steps (|inc| == gsd; +1 for
        # the fencepost, +1 for float fuzz), so "bound <= S_short" pixels
        # provably reproduce their full-S walk in the short tier
        short_d = seg_d.walk_len / cfg.gradient_sample_dist + 2.0 <= S_short
    else:
        short_d = jnp.zeros((H, W), bool)
    flags = (ok.astype(jnp.int32) | (short_d.astype(jnp.int32) << 1))
    if priority is not None:
        flags = flags | (priority.astype(jnp.int32) << 2)
    flags_p = flags.ravel()[perm]
    ok_p = (flags_p & 1) != 0
    short_p = (flags_p & 2) != 0
    prio_p = ((flags_p & 4) != 0) if priority is not None else None

    def run_pool(mask_p, cap, steps):
        idx, overflow = _pool_indices(mask_p, prio_p, cap, perm, HW, rot)
        gi = jnp.minimum(idx, HW - 1)

        def g(a):
            return jnp.take(a.reshape(a.shape[:-2] + (HW,)), gi, axis=-1)

        xc = (gi % W).astype(x.dtype)
        yc = (gi // W).astype(x.dtype)
        # recompute the segment setup on the pooled pixels from the
        # gathered raw inputs: same ops on bit-identical values, so the
        # pooled walk reproduces the dense walk exactly
        seg = _segment_setup(xc, yc, g(epxn), g(epyn), g(min_idepth),
                             g(prior_idepth), g(max_idepth),
                             pose_cur_wrt_kf, H, W, cfg)
        res = _walk(xc, yc, g(real), g(epxn), g(epyn),
                    g(kf_gradx), g(kf_grady), seg, cur_packed,
                    pose_cur_wrt_kf, steps, H, W, cfg)
        return idx, res, overflow

    if S_short > 0:
        idx_s, res_s, ovf_s = run_pool(ok_p & short_p, cap_short, S_short)
        idx_l, res_l, ovf_l = run_pool(ok_p & ~short_p, cap_long, S)
        idx = jnp.concatenate([idx_s, idx_l])
        res = StereoResult(*[jnp.concatenate([a, b])
                             for a, b in zip(res_s, res_l)])
        overflow = ovf_s + ovf_l
    else:
        idx, res, overflow = run_pool(ok_p, cap_long, S)

    def scatter(v, default_plane, dtype):
        out = default_plane.astype(dtype).ravel()
        return out.at[idx].set(v.astype(dtype), mode="drop").reshape(H, W)

    # pre-check failures (codes -1/-4) come from the dense setup plane;
    # un-run and capacity-dropped pixels report -5
    code_bg = jnp.where(run & (seg_d.code != 0), seg_d.code,
                        jnp.int32(-5))
    zeros = jnp.zeros((H, W), jnp.float32)
    dense = StereoResult(
        code=scatter(res.code, code_bg, jnp.int32),
        idepth=scatter(res.idepth, zeros, jnp.float32),
        var=scatter(res.var, zeros, jnp.float32),
        err=scatter(res.err, zeros, jnp.float32))
    return dense, overflow


class ObserveResult(NamedTuple):
    state: DepthMapState
    num_created: jnp.ndarray
    num_updated: jnp.ndarray
    num_overflow: jnp.ndarray


def observe(state: DepthMapState,
            kf_image: jnp.ndarray, kf_gradx: jnp.ndarray,
            kf_grady: jnp.ndarray, kf_maxgrad: jnp.ndarray,
            cur_image: jnp.ndarray,
            pose_cur_wrt_kf: jnp.ndarray,
            cfg: ELLCConfig) -> ObserveResult:
    """One depth-refinement pass of the current frame against the keyframe.

    Dense rewrite of observeDepthRow + create/update
    (DepthPropagation.cpp:191-999): per-pixel gradient gates, epipolar
    pre-check, one shared line-stereo kernel (create pixels use prior 1 and
    the full idepth range; update pixels use the +-2 sigma band), then the
    EKF fuse / variance-inflate / blacklist bookkeeping as dense selects.
    """
    H, W = kf_image.shape
    bcol = cfg.border
    x, y = camera.pixel_grid(H, W)
    active = ((x >= bcol) & (x < W - bcol) & (y >= bcol) & (y < H - bcol))

    has_hyp = state.valid
    # gate 1: valid but too-low gradient -> invalidate (:224-229)
    kill = active & has_hyp & (kf_maxgrad < cfg.min_abs_grad_decrease)
    valid = state.valid & ~kill
    # gate 2: skip entirely (:231-235)
    skip = (kf_maxgrad < cfg.min_abs_grad_create) | \
        (state.blacklisted < cfg.min_blacklist)
    do_pixel = active & ~kill & ~skip

    T = lie.exp_se3(pose_cur_wrt_kf)
    t_kf_from_cur = -T[:3, :3].T @ T[:3, 3]
    epxn, epyn, epl_ok = epl_direction(kf_image, t_kf_from_cur, cfg)
    run = do_pixel & epl_ok

    # stereo search band (create: :279-282; update: :898-904)
    sv = jnp.sqrt(jnp.maximum(state.var_smoothed, 0.0))
    upd_min = jnp.clip(state.idepth_smoothed - sv * cfg.stereo_epl_var_fac,
                       0.0, None)
    upd_max = jnp.minimum(state.idepth_smoothed + sv * cfg.stereo_epl_var_fac,
                          1.0 / cfg.min_depth)
    min_id = jnp.where(has_hyp, upd_min, 0.0)
    prior = jnp.where(has_hyp, state.idepth_smoothed, 1.0)
    max_id = jnp.where(has_hyp, upd_max, 1.0 / cfg.min_depth)

    packed = interp.pack_quad_u8(cur_image) if cfg.stereo_pack_u8 \
        else interp.pack_pairs_u16(cur_image)
    if cfg.stereo_compact_frac > 0.0:
        # per-frame drop rotation: any scalar that changes between
        # consecutive observes of an evolving depth map works; the
        # validity-counter sum changes on every create/update/decay
        # (and when it does NOT change, the map is static and rotating
        # drops would gain nothing anyway)
        rot = (jnp.sum(state.validity)
               + jnp.sum(state.valid)).astype(jnp.int32)
        res, overflow = line_stereo_compact(
            run, kf_image, kf_gradx, kf_grady, packed,
            epxn, epyn, min_id, prior, max_id, pose_cur_wrt_kf, cfg,
            priority=has_hyp, rot=rot)
    else:
        res = line_stereo(kf_image, kf_gradx, kf_grady, packed,
                          epxn, epyn, min_id, prior, max_id,
                          pose_cur_wrt_kf, cfg)
        overflow = jnp.asarray(0, jnp.int32)

    # ---------------- CREATE path (:267-308) ----------------
    create_px = run & ~has_hyp
    create_blacklist = create_px & ((res.code == -3) | (res.code == -2))
    create_ok = create_px & (res.code == 0) & (res.var <= cfg.max_var)
    new_idepth_c = jnp.where(jnp.abs(res.idepth) < 1e-10,
                             jnp.where(res.idepth < 0, -1e-10, 1e-10),
                             res.idepth)

    # ---------------- UPDATE path (:888-999) ----------------
    upd_px = run & has_hyp
    diff = res.idepth - state.idepth_smoothed
    code = res.code
    u_notfound = upd_px & (code == -2)
    inconsistent = upd_px & (code == 0) & (
        cfg.diff_fac_observe * diff * diff > res.var + state.var_smoothed)
    u_success = upd_px & (code == 0) & ~inconsistent

    # -2: validity -= DEC (clamp 0), var *= FAIL; var>MAX -> invalid,
    #     blacklist-- (:925-939)
    validity = state.validity
    var = state.var
    blk = state.blacklisted
    validity = jnp.where(u_notfound,
                         jnp.maximum(validity - cfg.validity_counter_dec, 0.0),
                         validity)
    var = jnp.where(u_notfound, var * cfg.fail_var_inc_fac, var)
    nf_kill = u_notfound & (var > cfg.max_var)
    valid = valid & ~nf_kill
    blk = jnp.where(nf_kill, blk - 1, blk)

    # inconsistent: var *= FAIL; var>MAX -> invalid (:956-962)
    var = jnp.where(inconsistent, var * cfg.fail_var_inc_fac, var)
    inc_kill = inconsistent & (var > cfg.max_var)
    valid = valid & ~inc_kill

    # success: textbook EKF fuse (:966-996)
    id_var = state.var * cfg.succ_var_inc_fac
    w = res.var / (res.var + id_var)
    fused = (1.0 - w) * res.idepth + w * state.idepth
    fused = jnp.where(jnp.abs(fused) < 1e-10,
                      jnp.where(fused < 0, -1e-10, 1e-10), fused)
    id_var_post = id_var * w
    new_idepth = jnp.where(u_success, fused, state.idepth)
    var = jnp.where(u_success & (id_var_post < var), id_var_post, var)
    validity = jnp.where(u_success, validity + cfg.validity_counter_inc,
                         validity)
    vmax = cfg.validity_counter_max + kf_maxgrad * \
        cfg.validity_counter_max_variable / 255.0
    validity = jnp.where(u_success & (validity > vmax), vmax, validity)

    # apply CREATE
    new_idepth = jnp.where(create_ok, new_idepth_c, new_idepth)
    var = jnp.where(create_ok, res.var, var)
    smoothed_i = jnp.where(create_ok, -1.0, state.idepth_smoothed)
    smoothed_v = jnp.where(create_ok, -1.0, state.var_smoothed)
    validity = jnp.where(create_ok, cfg.validity_counter_initial_observe,
                         validity)
    valid = valid | create_ok
    blk = jnp.where(create_blacklist & ~create_ok, blk - 1, blk)
    blk = jnp.where(create_ok, 0, blk)

    out = DepthMapState(idepth=new_idepth, var=var,
                        idepth_smoothed=smoothed_i, var_smoothed=smoothed_v,
                        validity=validity, blacklisted=blk, valid=valid)
    return ObserveResult(state=out,
                         num_created=jnp.sum(create_ok),
                         num_updated=jnp.sum(u_success),
                         num_overflow=overflow)
