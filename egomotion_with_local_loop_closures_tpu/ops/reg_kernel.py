"""Fused depth-map regularization as a single Pallas TPU kernel.

``doRegularization`` in the reference is two full passes over the
hypothesis arrays — ``fillDepthHoles`` (integral-image validity + 5x5
inverse-variance fill, ``src/DepthPropagation.cpp:1317-1432``) followed by
``regularizeDepthMap`` (5x5 inverse-variance smoothing + outlier removal,
``:1436-1543``) — each reading/writing the 480x270 buffers from memory.

The XLA version (``depth/propagate.py``) expresses the same math as ~50
shifted-array passes that XLA fuses opportunistically; this kernel makes
the fusion *guaranteed*: all seven hypothesis planes plus the max-gradient
plane are loaded into VMEM once (8 x 270x480 fp32 = 4.1 MiB, comfortably
inside the ~16 MiB budget), both passes run back-to-back on the VPU with
every intermediate staying on-chip, and the seven result planes are
written out once.  HBM traffic drops from tens of plane-sized
round-trips to the 15 unavoidable ones.

The kernel body *calls the exact same pure functions* as the XLA path
(``fill_holes`` / ``regularize``), so the two implementations cannot
drift apart — the Pallas path is a scheduling statement, not a second
copy of the math.  On non-TPU backends the kernel runs in interpreter
mode (tests) and ``cfg.use_pallas_reg`` defaults to off.
"""

from __future__ import annotations

import functools
from typing import Tuple

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


def _kernel(cfg: ELLCConfig, remove_occlusions: bool,
            id_ref, var_ref, ids_ref, vars_ref, val_ref, bl_ref,
            valid_ref, mg_ref,
            o_id, o_var, o_ids, o_vars, o_val, o_bl, o_valid):
    # late import: propagate imports this module for dispatch
    from egomotion_with_local_loop_closures_tpu.depth import propagate

    st = DepthMapState(
        idepth=id_ref[:], var=var_ref[:],
        idepth_smoothed=ids_ref[:], var_smoothed=vars_ref[:],
        validity=val_ref[:], blacklisted=bl_ref[:],
        valid=valid_ref[:] > 0.0)
    st = propagate.fill_holes(st, mg_ref[:], cfg)
    st = propagate.regularize(st, cfg, remove_occlusions=remove_occlusions)
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
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg, remove_occlusions),
        out_shape=out_shape,
        in_specs=specs,
        out_specs=out_specs,
        interpret=interpret,
    )(state.idepth, state.var, state.idepth_smoothed, state.var_smoothed,
      state.validity, state.blacklisted,
      state.valid.astype(jnp.float32), kf_maxgrad)
    return DepthMapState(
        idepth=outs[0], var=outs[1], idepth_smoothed=outs[2],
        var_smoothed=outs[3], validity=outs[4], blacklisted=outs[5],
        valid=outs[6] > 0.0)
