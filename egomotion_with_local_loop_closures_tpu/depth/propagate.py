"""Keyframe depth propagation, hole filling, and regularization.

Dense rewrites of the remaining ``depthMap`` machinery
(``src/DepthPropagation.cpp``):

- :func:`propagate` — ``propagateDepth`` (:1003-1157): reproject every
  hypothesis of the old keyframe into the new one with variance inflation
  and occlusion-aware EKF merging.  The reference scatters sequentially in
  raster order with order-dependent merges; here the scatter is formulated
  order-independently: per target cell the *nearest* (max inverse-depth)
  candidate wins occlusion conflicts, and all candidates statistically
  compatible with the winner are fused by inverse variance — which equals
  the reference's pairwise EKF chain whenever merges happen (pairwise
  inverse-variance fusion is associative), and resolves conflicts
  deterministically instead of raster-order-dependently (documented
  deviation).
- :func:`fill_holes` — ``fillDepthHoles``/``buildValIntegralBuffer``
  (:1317-1432), including the reference's row-prefix-difference validity
  score (which is *not* a 2D box sum — replicated faithfully).
- :func:`regularize` — ``regularizeDepthMap`` (:1436-1543): 5x5
  inverse-variance smoothing with statistical-compatibility gating,
  occlusion voting, and the validity-sum keep threshold.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth.state import DepthMapState
from egomotion_with_local_loop_closures_tpu.geom import camera, lie
from egomotion_with_local_loop_closures_tpu.image import interp


def propagate(state: DepthMapState,
              old_kf_image: jnp.ndarray,
              new_kf_image: jnp.ndarray,
              new_kf_maxgrad: jnp.ndarray,
              pose_new_wrt_old: jnp.ndarray,
              cfg: ELLCConfig) -> DepthMapState:
    """Propagate hypotheses from the old KF into the new KF's pixel grid.

    ``pose_new_wrt_old``: P_new = exp(xi) P_old (the new keyframe's
    poseWrtOrigin at propagation time, reference DepthPropagation.cpp:1020
    via calculateSE3poseOtherWrtThis -> SE3poseThisWrtOther = T_{new<-old}).
    """
    H, W = old_kf_image.shape
    fx, fy, cx, cy = cfg.fx, cfg.fy, cfg.cx, cfg.cy
    T = lie.exp_se3(pose_new_wrt_old)          # new <- old
    R, t = T[:3, :3], T[:3, 3]

    x, y = camera.pixel_grid(H, W)
    src_valid = state.valid
    ids = jnp.where(jnp.abs(state.idepth_smoothed) > 1e-12,
                    state.idepth_smoothed, 1e-12)
    # pn = R * Kinv p / idepth_smoothed + t   (:1047)
    rx = (x - cx) / fx
    ry = (y - cy) / fy
    px = (R[0, 0] * rx + R[0, 1] * ry + R[0, 2]) / ids + t[0]
    py = (R[1, 0] * rx + R[1, 1] * ry + R[1, 2]) / ids + t[1]
    pz = (R[2, 0] * rx + R[2, 1] * ry + R[2, 2]) / ids + t[2]
    pz_safe = jnp.where(jnp.abs(pz) > 1e-12, pz, 1e-12)
    new_idepth = 1.0 / pz_safe
    u = px * new_idepth * fx + cx
    v = py * new_idepth * fy + cy

    in_img = (u > 2.1) & (v > 2.1) & (u < W - 3.1) & (v < H - 3.1)  # (:1059)
    tx = (u + 0.5).astype(jnp.int32)
    ty = (v + 0.5).astype(jnp.int32)
    tx = jnp.clip(tx, 0, W - 1)
    ty = jnp.clip(ty, 0, H - 1)
    tgt = ty * W + tx

    # photometric consistency: NOTE the reference samples the new KF's
    # max-gradient at the *source* pixel (x, y), not at (u, v)
    # (DepthPropagation.cpp:1066) — replicated for parity.
    dest_grad = new_kf_maxgrad
    dest_color = interp.bilinear_fill(new_kf_image, u, v)
    residual = dest_color - old_kf_image
    photo_ok = (residual * residual /
                (cfg.max_diff_constant
                 + cfg.max_diff_grad_mult * dest_grad * dest_grad) <= 1.0)
    grad_ok = dest_grad >= cfg.min_abs_grad_decrease

    cand = src_valid & in_img & photo_ok & grad_ok

    # variance inflation: idepth_ratio^4 (:1082-1086).  The reference
    # multiplies the ratio by source->invDepth (not variance) — replicated.
    ratio = new_idepth / ids
    ratio4 = (ratio * ratio) * (ratio * ratio)
    new_var = ratio4 * state.idepth

    flat_id = jnp.where(cand, new_idepth, -jnp.inf).ravel()
    flat_tgt = tgt.ravel()
    N = H * W

    # winner per target: max new inverse depth (nearest point)
    winner = jnp.full((N,), -jnp.inf).at[flat_tgt].max(flat_id)
    win_var_num = jnp.zeros((N,)).at[flat_tgt].max(
        jnp.where(flat_id == winner[flat_tgt], new_var.ravel(), -jnp.inf))
    # compatibility with the winner (DIFF_FAC_PROP_MERGE gate, :1092-1094)
    w_id = winner[flat_tgt]
    w_var = win_var_num[flat_tgt]
    diff = w_id - flat_id
    compat = cand.ravel() & (cfg.diff_fac_prop_merge * diff * diff
                             <= new_var.ravel() + w_var)

    cvar = jnp.where(jnp.abs(new_var.ravel()) > 1e-12, new_var.ravel(), 1e-12)
    ivar = jnp.where(compat, 1.0 / cvar, 0.0)
    safe_id = jnp.where(compat, flat_id, 0.0)   # flat_id is -inf off-mask
    sum_ivar = jnp.zeros((N,)).at[flat_tgt].add(ivar)
    sum_id = jnp.zeros((N,)).at[flat_tgt].add(ivar * safe_id)
    sum_validity = jnp.zeros((N,)).at[flat_tgt].add(
        jnp.where(compat, state.validity.ravel(), 0.0))
    count = jnp.zeros((N,)).at[flat_tgt].add(compat.astype(jnp.float32))

    has = count > 0
    merged_id = jnp.where(has, sum_id / jnp.where(has, sum_ivar, 1.0), 0.0)
    merged_var = jnp.where(has, 1.0 / jnp.where(has, sum_ivar, 1.0), 0.0)
    merged_validity = jnp.minimum(
        sum_validity,
        cfg.validity_counter_max + cfg.validity_counter_max_variable)

    shp = (H, W)
    return DepthMapState(
        idepth=merged_id.reshape(shp),
        var=merged_var.reshape(shp),
        idepth_smoothed=jnp.full(shp, -1.0),
        var_smoothed=jnp.full(shp, -1.0),
        validity=merged_validity.reshape(shp),
        blacklisted=jnp.zeros(shp, jnp.int32),
        valid=has.reshape(shp))


def _shift(a: jnp.ndarray, dy: int, dx: int, fill=0.0) -> jnp.ndarray:
    """a shifted so that out[y, x] = a[y+dy, x+dx], edge-filled.

    Implemented with lax.pad + lax.slice only (no scatter/gather), so the
    same code runs unchanged inside the Pallas kernel (ops/reg_kernel.py)."""
    H, W = a.shape
    pt, pb = max(0, -dy), max(0, dy)
    pl, pr = max(0, -dx), max(0, dx)
    pa = jax.lax.pad(a, jnp.asarray(fill, a.dtype),
                     ((pt, pb, 0), (pl, pr, 0)))
    return jax.lax.slice(pa, (pt + dy, pl + dx), (pt + dy + H, pl + dx + W))


def _region_mask(H: int, W: int, y0: int, y1: int, x0: int, x1: int
                 ) -> jnp.ndarray:
    """Interior-region mask via iota comparisons (Pallas-safe; TPU needs
    >=2D iota)."""
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)


def fill_holes(state: DepthMapState, kf_maxgrad: jnp.ndarray,
               cfg: ELLCConfig) -> DepthMapState:
    """Create hypotheses in high-validity holes (fillDepthHoles,
    DepthPropagation.cpp:1317-1432).

    The reference's ``validityIntegralBuffer`` is a per-row prefix sum
    (reset each row, :1414-1429), so its "val" score is
    rowsum(y+2, x-2..x+2) - rowsum(y-3, x-2..x+2), NOT a 5x5 box sum —
    replicated faithfully.  Division-by-zero fills (val passes but no
    valid 5x5 neighbour) are skipped instead of writing NaN (documented
    deviation from :1379 which would produce NaN).
    """
    acc = (jnp.zeros(state.valid.shape), jnp.zeros(state.valid.shape),
           jnp.zeros(state.valid.shape))
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            acc = fill_tap(
                _shift(state.valid.astype(jnp.float32), dy, dx),
                _shift(state.var, dy, dx, fill=1.0),
                _shift(state.idepth, dy, dx), acc)
    return fill_finish(state, fill_val(state, cfg), acc, kf_maxgrad, cfg)


def fill_val(state: DepthMapState, cfg: ELLCConfig) -> jnp.ndarray:
    """The reference reads its prefix buffer at offsets +2+2W, +2-3W,
    -3+2W, -3-3W (:1351); the resulting window sums are computed here
    directly as shifted adds (identical inside the interior region the
    cond mask restricts to; cumsum is not lowerable in Pallas TPU)."""
    v_row = jnp.where(state.valid, state.validity, 0.0)
    win5 = sum(_shift(v_row, 0, dx) for dx in range(-2, 3))
    if cfg.lsd_correct_hole_fill:
        # true 5x5 box sum (LSD-SLAM's buildRegIntegralBuffer semantics)
        return sum(_shift(win5, dy, 0) for dy in range(-2, 3))
    # per-row prefix buffer reset each row (:1414-1429): "val" is
    # rowsum(y+2, x-2..x+2) - rowsum(y-3, x-2..x+2), NOT a box sum
    return _shift(win5, 2, 0) - _shift(win5, -3, 0)


def fill_tap(sv, svar, sid, acc):
    """One 5x5 tap of the inverse-variance mean (:1361-1377); shared by
    the unrolled XLA loop above and the Pallas sweep (ops/reg_kernel.py)."""
    sum_iv, sum_id, num = acc
    iv = jnp.where(sv > 0, 1.0 / jnp.where(jnp.abs(svar) > 1e-12,
                                           svar, 1e-12), 0.0)
    return (sum_iv + iv, sum_id + iv * sid, num + sv)


def fill_finish(state: DepthMapState, val, acc, kf_maxgrad,
                cfg: ELLCConfig) -> DepthMapState:
    """Gate + write-back of fillDepthHoles (:1340-1359, :1379-1393)."""
    H, W = state.valid.shape
    sum_iv, sum_id, num = acc
    region = _region_mask(H, W, 3, H - 3, 3, W - 2)
    cond = (region & ~state.valid & (kf_maxgrad >= cfg.min_abs_grad_decrease)
            & (((state.blacklisted >= cfg.min_blacklist)
                & (val > cfg.val_sum_min_for_create))
               | (val > cfg.val_sum_min_for_unblacklist))
            & (num > 0))
    fill_id = sum_id / jnp.where(sum_iv > 0, sum_iv, 1.0)
    fill_id = jnp.where(jnp.abs(fill_id) < 1e-10,
                        jnp.where(fill_id < 0, -1e-10, 1e-10), fill_id)

    return DepthMapState(
        idepth=jnp.where(cond, fill_id, state.idepth),
        var=jnp.where(cond, cfg.var_random_init, state.var),
        idepth_smoothed=jnp.where(cond, -1.0, state.idepth_smoothed),
        var_smoothed=jnp.where(cond, -1.0, state.var_smoothed),
        validity=jnp.where(cond, 0.0, state.validity),
        blacklisted=jnp.where(cond, 0, state.blacklisted),
        valid=state.valid | cond)


def regularize(state: DepthMapState, cfg: ELLCConfig,
               remove_occlusions: bool = False) -> DepthMapState:
    """5x5 inverse-variance smoothing (regularizeDepthMap,
    DepthPropagation.cpp:1436-1543), reading a snapshot and writing
    smoothed values; drops pixels with low neighbourhood validity and,
    optionally, occluded pixels."""
    H, W = state.valid.shape
    z = jnp.zeros((H, W))
    acc = (z, z, z, z, z)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            acc = reg_tap(
                state,
                _shift(state.valid.astype(jnp.float32), dy, dx),
                _shift(state.idepth, dy, dx),
                _shift(state.var, dy, dx, fill=1.0),
                _shift(state.validity, dy, dx),
                jnp.float32(dy * dy + dx * dx), acc, cfg)
    return reg_finish(state, acc, cfg, remove_occlusions)


def reg_tap(state: DepthMapState, svf, sid, svar, svalc, dist2, acc,
            cfg: ELLCConfig):
    """One 5x5 tap of regularizeDepthMap's inverse-variance smoothing
    (:1460-1500); shared by the unrolled XLA loop above and the Pallas
    sweep (ops/reg_kernel.py).  ``dist2`` is (dy^2 + dx^2) as f32."""
    sum_w, sum_id, val_sum, n_occ, n_not = acc
    sv = svf > 0
    diff = sid - state.idepth
    compat = (cfg.diff_fac_smoothing * diff * diff
              <= svar + state.var)
    use = sv & compat
    n_occ = n_occ + jnp.where(sv & ~compat & (sid > state.idepth), 1.0, 0.0)
    n_not = n_not + jnp.where(use, 1.0, 0.0)
    dist_fac = dist2 * jnp.float32(cfg.reg_dist_var)
    iv = jnp.where(use, 1.0 / (jnp.maximum(svar, 0.0) + dist_fac), 0.0)
    return (sum_w + iv, sum_id + iv * sid,
            val_sum + jnp.where(use, svalc, 0.0), n_occ, n_not)


def reg_finish(state: DepthMapState, acc, cfg: ELLCConfig,
               remove_occlusions: bool) -> DepthMapState:
    """Drop gates + smoothed write-back of regularizeDepthMap
    (:1502-1543)."""
    H, W = state.valid.shape
    sum_w, sum_id, val_sum, n_occ, n_not = acc
    region = _region_mask(H, W, 3, H - 3, 2, W - 2)
    touched = region & state.valid

    drop_val = touched & (val_sum < cfg.val_sum_min_for_keep)
    drop_occ = touched & (n_occ > n_not) if remove_occlusions else \
        jnp.zeros((H, W), bool)
    dropped = drop_val | drop_occ

    smooth = sum_id / jnp.where(sum_w > 0, sum_w, 1.0)
    smooth = jnp.where(jnp.abs(smooth) < 1e-10,
                       jnp.where(smooth < 0, -1e-10, 1e-10), smooth)
    write = touched & ~dropped

    return DepthMapState(
        idepth=state.idepth,
        var=state.var,
        idepth_smoothed=jnp.where(write, smooth, state.idepth_smoothed),
        var_smoothed=jnp.where(write,
                               1.0 / jnp.where(sum_w > 0, sum_w, 1.0),
                               state.var_smoothed),
        validity=state.validity,
        blacklisted=jnp.where(drop_val, state.blacklisted - 1,
                              state.blacklisted),
        valid=state.valid & ~dropped)


def do_regularization(state: DepthMapState, kf_maxgrad: jnp.ndarray,
                      cfg: ELLCConfig,
                      remove_occlusions: bool = False) -> DepthMapState:
    """fillDepthHoles + regularizeDepthMap (doRegularization,
    DepthPropagation.cpp:1627-1635).

    With ``cfg.use_pallas_reg`` both passes run as one fused
    VMEM-resident Pallas kernel (ops/reg_kernel.py) whose body calls
    exactly these functions — same math, guaranteed fusion."""
    if cfg.use_pallas_reg:
        from egomotion_with_local_loop_closures_tpu.ops import reg_kernel
        return reg_kernel.do_regularization_pallas(state, kf_maxgrad, cfg,
                                                   remove_occlusions)
    state = fill_holes(state, kf_maxgrad, cfg)
    return regularize(state, cfg, remove_occlusions)
