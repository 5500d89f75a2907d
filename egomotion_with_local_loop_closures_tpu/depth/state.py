"""Dense depth-hypothesis state (structure-of-arrays over the pixel grid).

Replaces the reference's statically allocated array of per-pixel
``depthhypothesis`` structs (``src/DepthHypothesis.h:14-40``,
``src/DepthPropagation.h:43-45``) with a pytree of (H, W) arrays — the
natural TPU layout: every depth-filter stage becomes dense vector math
with validity masks instead of per-pixel branchy loops.

Fields mirror the struct: inverse depth + variance, their regularized
("smoothed") versions (-1 where not yet computed), a validity counter, a
blacklist counter, and the valid flag.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig


class DepthMapState(NamedTuple):
    idepth: jnp.ndarray           # (H, W) float32 inverse depth
    var: jnp.ndarray              # (H, W) float32 variance
    idepth_smoothed: jnp.ndarray  # (H, W) float32, -1 where unset
    var_smoothed: jnp.ndarray     # (H, W) float32, -1 where unset
    validity: jnp.ndarray         # (H, W) float32 validity counter
    blacklisted: jnp.ndarray      # (H, W) int32
    valid: jnp.ndarray            # (H, W) bool


def empty(shape: Tuple[int, int]) -> DepthMapState:
    H, W = shape
    f = jnp.zeros((H, W), jnp.float32)
    return DepthMapState(
        idepth=f, var=f, idepth_smoothed=f - 1.0, var_smoothed=f - 1.0,
        validity=f, blacklisted=jnp.zeros((H, W), jnp.int32),
        valid=jnp.zeros((H, W), bool))


def initialize_random(key: jax.Array, max_grad: jnp.ndarray,
                      cfg: ELLCConfig) -> DepthMapState:
    """Gradient-gated random init: invDepth ~ U[0.5, 1.5], var = 0.125,
    validity 20, borders excluded.  Mirrors depthMap::initializeRandomly
    (DepthPropagation.cpp:83-184, random branch).

    With ``cfg.bootstrap_rng == "glibc"`` the draws replicate the
    reference bit for bit: the unseeded glibc ``rand()`` stream consumed
    in raster order over the gated pixels (the k-th gated pixel in
    row-major order takes the k-th draw — exactly the scan order of the
    reference's x/y loops, DepthPropagation.cpp:104-160); ``key`` is
    ignored on that path."""
    H, W = max_grad.shape
    interior = jnp.zeros((H, W), bool).at[1:H - 1, 1:W - 1].set(True)
    valid = interior & (max_grad > cfg.min_abs_grad_create)
    if cfg.bootstrap_rng == "glibc":
        from egomotion_with_local_loop_closures_tpu.utils import glibc_rand
        vals = jnp.asarray(glibc_rand.glibc_unit_floats(H * W))
        gate = valid.ravel()
        rank = jnp.cumsum(gate.astype(jnp.int32)) - 1
        u = vals[jnp.clip(rank, 0, H * W - 1)].reshape(H, W)
    else:
        u = jax.random.uniform(key, (H, W))
    idepth = 0.5 + 1.0 * u
    # explicit float32 (not weak-typed) so the init state has the same jit
    # signature as every steady-state DepthMapState (a weak-typed leaf
    # forces a full second compile of each step function)
    var = jnp.full((H, W), cfg.var_random_init, jnp.float32)
    return DepthMapState(
        idepth=jnp.where(valid, idepth, 0.0),
        var=jnp.where(valid, var, 0.0),
        idepth_smoothed=jnp.where(valid, idepth, -1.0),
        var_smoothed=jnp.where(valid, var, -1.0),
        validity=jnp.where(valid, jnp.float32(20.0), jnp.float32(0.0)),
        blacklisted=jnp.zeros((H, W), jnp.int32),
        valid=valid)


def from_depth(depth: jnp.ndarray, var: jnp.ndarray) -> DepthMapState:
    """Initialize from a saved depth/variance map (the reference's
    FLAG_REPLICATE_NEW_DEPTH path, DepthPropagation.cpp:114-137)."""
    H, W = depth.shape
    interior = jnp.zeros((H, W), bool).at[1:H - 1, 1:W - 1].set(True)
    valid = interior & (depth > 0.0)
    idepth = jnp.where(valid, 1.0 / jnp.where(depth > 0, depth, 1.0), 0.0)
    return DepthMapState(
        idepth=idepth,
        var=jnp.where(valid, jnp.asarray(var, jnp.float32), 0.0),
        idepth_smoothed=jnp.where(valid, idepth, -1.0),
        var_smoothed=jnp.where(valid, jnp.asarray(var, jnp.float32), -1.0),
        validity=jnp.where(valid, jnp.float32(20.0), jnp.float32(0.0)),
        blacklisted=jnp.zeros((H, W), jnp.int32),
        valid=valid)


def to_depth_image(state: DepthMapState, cfg: ELLCConfig
                   ) -> Tuple[DepthMapState, jnp.ndarray, jnp.ndarray]:
    """Produce the (depth, var) level-0 maps consumed by the tracker and
    invalidate the 3-pixel border, mirroring depthMap::updateDepthImage
    (DepthPropagation.cpp:1254-1308): depth = 1/idepth_smoothed where the
    hypothesis is valid and idepth_smoothed >= -0.05, else 0 / -1."""
    H, W = state.valid.shape
    b = cfg.border
    interior = jnp.zeros((H, W), bool).at[b:H - b, b:W - b].set(True)
    valid = state.valid & interior
    state = state._replace(valid=valid)
    usable = valid & (state.idepth_smoothed >= -0.05)
    denom = jnp.where(jnp.abs(state.idepth_smoothed) > 1e-12,
                      state.idepth_smoothed, 1e-12)
    depth = jnp.where(usable, 1.0 / denom, 0.0)
    var = jnp.where(usable, state.var_smoothed, -1.0)
    return state, depth, var


def seeds_percent(state: DepthMapState) -> jnp.ndarray:
    """Depth-map occupancy in percent (DepthPropagation.cpp:1804-1830)."""
    return 100.0 * jnp.mean(state.valid.astype(jnp.float32))


def make_idepth_one(state: DepthMapState) -> Tuple[DepthMapState, jnp.ndarray]:
    """Normalize mean smoothed inverse depth to 1; returns (state, rescale).
    Mirrors depthMap::makeInvDepthOne (DepthPropagation.cpp:1546-1587)."""
    v = state.valid
    num = jnp.sum(v.astype(jnp.float32))
    s = jnp.sum(jnp.where(v, state.idepth_smoothed, 0.0))
    rescale = jnp.where(jnp.abs(s) > 1e-12, num / s, 1.0)
    r2 = rescale * rescale
    return state._replace(
        idepth=jnp.where(v, state.idepth * rescale, state.idepth),
        idepth_smoothed=jnp.where(v, state.idepth_smoothed * rescale,
                                  state.idepth_smoothed),
        var=jnp.where(v, state.var * r2, state.var),
        var_smoothed=jnp.where(v, state.var_smoothed * r2,
                               state.var_smoothed),
    ), rescale
