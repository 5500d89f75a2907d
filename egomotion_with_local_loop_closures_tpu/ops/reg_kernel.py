"""Fused depth-map regularization as a single Pallas TPU kernel.

``doRegularization`` in the reference is two full passes over the
hypothesis arrays — ``fillDepthHoles`` (windowed validity score + 5x5
inverse-variance fill, ``src/DepthPropagation.cpp:1317-1432``) followed by
``regularizeDepthMap`` (5x5 inverse-variance smoothing + outlier removal,
``:1436-1543``) — each reading/writing the 480x270 buffers from memory.

The XLA version (``depth/propagate.py``) expresses the same math as ~50
shifted-array passes that XLA fuses opportunistically; this kernel makes
the fusion *guaranteed*: all seven hypothesis planes plus the max-gradient
plane are loaded into VMEM once (8 x 270x480 fp32 = 4.1 MiB, comfortably
inside the ~16 MiB budget), both passes run back-to-back on the VPU with
every intermediate staying on-chip, and the seven result planes are
written out once.

Per-tap math and the gate/write-back tails are the *same functions* the
XLA path uses (``propagate.fill_tap`` / ``fill_finish`` / ``reg_tap`` /
``reg_finish``), so the two implementations cannot drift apart; only the
5x5 sweep plumbing differs.  The XLA path unrolls the 25 taps with static
shifts; Mosaic's chipless AOT helper on the tunnel toolchain crashes on
that much unrolled code (25-tap unroll fails, 9-tap compiles), so the
kernel sweeps the window with a nested ``fori_loop`` that carries the
shifted planes and re-shifts them by one row/column per iteration —
constant shift amounts only, which Mosaic lowers fine (dynamic
``cumsum`` / ``dynamic_slice`` / unaligned ``pl.dslice`` all fail to
lower on this toolchain).

On non-TPU backends the kernel runs in interpreter mode (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:                                  # pltpu import fails on some backends
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:                     # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth.state import DepthMapState


def _sweep25(planes, fills, tap, acc):
    """Accumulate ``tap(i, j, shifted_planes, acc)`` over the 5x5 window
    (dy, dx) = (i-2, j-2), i row-major like the reference's loops.

    The planes are carried through the loops and re-shifted by a constant
    one row (outer) / one column (inner) per iteration.  Each shift
    truncates one frame edge, so the planes are first padded by radius 4
    (the maximum +/-2 excursion in each dimension keeps every data cell
    inside the padded frame); the tap then reads the *static* central
    H x W slice, which equals ``_shift(p, dy, dx, fill)`` of the original
    plane for the cumulative (dy, dx) — including the edge-fill semantics,
    since out-of-range cells read the fill-valued padding.
    """
    from egomotion_with_local_loop_closures_tpu.depth.propagate import _shift

    R = 4
    H, W = planes[0].shape

    def shift_all(ps, dy, dx):
        return tuple(_shift(p, dy, dx, fill=f) for p, f in zip(ps, fills))

    def center(p):
        return jax.lax.slice(p, (R, R), (R + H, R + W))

    def outer(i, carry):
        acc, pd = carry
        def inner(j, c2):
            a2, ps = c2
            a2 = tap(i, j, tuple(center(p) for p in ps), a2)
            return a2, shift_all(ps, 0, 1)
        acc, _ = jax.lax.fori_loop(0, 5, inner, (acc, shift_all(pd, 0, -2)))
        return acc, shift_all(pd, 1, 0)

    padded = tuple(
        jax.lax.pad(p, jnp.asarray(f, p.dtype), ((R, R, 0), (R, R, 0)))
        for p, f in zip(planes, fills))
    acc, _ = jax.lax.fori_loop(0, 5, outer, (acc, shift_all(padded, -2, 0)))
    return acc


def _kernel(cfg: ELLCConfig, remove_occlusions: bool,
            id_ref, var_ref, ids_ref, vars_ref, val_ref, bl_ref,
            valid_ref, mg_ref,
            o_id, o_var, o_ids, o_vars, o_val, o_bl, o_valid):
    # late import: propagate imports this module for dispatch
    from egomotion_with_local_loop_closures_tpu.depth import propagate

    H, W = id_ref.shape
    z = jnp.zeros((H, W))
    st = DepthMapState(
        idepth=id_ref[:], var=var_ref[:],
        idepth_smoothed=ids_ref[:], var_smoothed=vars_ref[:],
        validity=val_ref[:], blacklisted=bl_ref[:],
        valid=valid_ref[:] > 0.0)

    # --- fillDepthHoles ---
    def ftap(i, j, ps, acc):
        del i, j
        return propagate.fill_tap(ps[0], ps[1], ps[2], acc)
    accf = _sweep25(
        (st.valid.astype(jnp.float32), st.var, st.idepth),
        (0.0, 1.0, 0.0), ftap, (z, z, z))
    st = propagate.fill_finish(st, propagate.fill_val(st, cfg), accf,
                               mg_ref[:], cfg)

    # --- regularizeDepthMap (on the post-fill snapshot) ---
    def rtap(i, j, ps, acc):
        dist2 = ((i - 2) * (i - 2) + (j - 2) * (j - 2)).astype(jnp.float32)
        return propagate.reg_tap(st, ps[0], ps[1], ps[2], ps[3],
                                 dist2, acc, cfg)
    accr = _sweep25(
        (st.valid.astype(jnp.float32), st.idepth, st.var, st.validity),
        (0.0, 0.0, 1.0, 0.0), rtap, (z, z, z, z, z))
    st = propagate.reg_finish(st, accr, cfg, remove_occlusions)

    o_id[:] = st.idepth
    o_var[:] = st.var
    o_ids[:] = st.idepth_smoothed
    o_vars[:] = st.var_smoothed
    o_val[:] = st.validity
    o_bl[:] = st.blacklisted
    o_valid[:] = st.valid.astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "remove_occlusions", "interpret"))
def do_regularization_pallas(state: DepthMapState, kf_maxgrad: jnp.ndarray,
                             cfg: ELLCConfig,
                             remove_occlusions: bool = False,
                             interpret: bool | None = None) -> DepthMapState:
    """fillDepthHoles + regularizeDepthMap fused into one VMEM-resident
    Pallas kernel (see module docstring)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = state.valid.shape
    f32 = functools.partial(jax.ShapeDtypeStruct, (H, W))
    out_shape = (f32(jnp.float32),) * 5 + (f32(jnp.int32), f32(jnp.float32))
    if _HAS_PLTPU and not interpret:
        specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
        out_specs = tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 7)
    else:
        specs = [pl.BlockSpec()] * 8
        out_specs = tuple([pl.BlockSpec()] * 7)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        # live set (inputs + post-fill snapshot + shifted carries + five
        # accumulators + outputs) peaks at ~17.4 MiB, just over the 16 MiB
        # default scoped-vmem limit; the physical VMEM budget is larger
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg, remove_occlusions),
        out_shape=out_shape,
        in_specs=specs,
        out_specs=out_specs,
        interpret=interpret,
        **kwargs,
    )(state.idepth, state.var, state.idepth_smoothed, state.var_smoothed,
      state.validity, state.blacklisted,
      state.valid.astype(jnp.float32), kf_maxgrad)
    return DepthMapState(
        idepth=outs[0], var=outs[1], idepth_smoothed=outs[2],
        var_smoothed=outs[3], validity=outs[4], blacklisted=outs[5],
        valid=outs[6] > 0.0)
