"""HBM footprint accounting for the batched-video pipeline.

Round-4 verdict #4: V=4 on one chip killed the TPU worker process with no
explanation.  The fix is to *account* — XLA's compiled-executable memory
analysis gives exact argument/output/temp byte counts for the vmapped
interval program, and the device reports its byte limit — and refuse to
launch a configuration that cannot fit, with a clean "requires X, have Y"
error instead of a dead worker.

Used by tools/bench_batched.py and available to any embedding runtime.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def tree_bytes(tree) -> int:
    """Total bytes of the array leaves of a pytree (device-resident)."""
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree.leaves(tree)
               if hasattr(x, "shape") and hasattr(x, "dtype"))


def device_bytes_limit(device=None) -> Optional[int]:
    """The device's HBM byte limit, when the runtime reports it."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")


@dataclasses.dataclass
class IntervalFootprint:
    """Memory requirement of ONE vmapped process_interval dispatch at
    batch size V, from XLA's own memory analysis of the compiled
    executable (not an estimate)."""
    videos: int
    argument_bytes: int        # pipeline states + image batch
    output_bytes: int          # new states + per-frame outputs
    temp_bytes: int            # XLA scratch for the whole scanned interval
    state_bytes: int           # persistent per-V pipeline state alone
    device_limit: Optional[int]

    @property
    def peak_bytes(self) -> int:
        # arguments and outputs are live simultaneously with temps in the
        # worst case (donation is not used for the vmapped bench path)
        return self.argument_bytes + self.output_bytes + self.temp_bytes

    @property
    def fits(self) -> Optional[bool]:
        if self.device_limit is None:
            return None
        return self.peak_bytes <= self.device_limit

    def describe(self) -> str:
        gb = 1024 ** 3
        lim = (f"{self.device_limit / gb:.2f} GiB"
               if self.device_limit else "unknown")
        return (f"V={self.videos}: args {self.argument_bytes / gb:.3f} + "
                f"out {self.output_bytes / gb:.3f} + "
                f"temp {self.temp_bytes / gb:.3f} = "
                f"{self.peak_bytes / gb:.3f} GiB peak "
                f"(state {self.state_bytes / gb:.3f} GiB); "
                f"device limit {lim}")


def interval_footprint(videos: int, cfg, device=None) -> IntervalFootprint:
    """Compile (without executing) the vmapped V-video interval step and
    read XLA's memory analysis.  Costs one AOT compile (~20-40 s cold,
    cached per (V, cfg) afterwards)."""
    from egomotion_with_local_loop_closures_tpu.runtime import pipeline

    K = cfg.keyframe_interval
    img = jax.ShapeDtypeStruct((cfg.rows, cfg.cols), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    state_shape = jax.eval_shape(
        lambda im, k: pipeline.init_pipeline(im, k, cfg), img, key)
    vstate = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct((videos,) + s.shape, s.dtype),
        state_shape)
    vimgs = jax.ShapeDtypeStruct((videos, K, cfg.rows, cfg.cols),
                                 jnp.float32)
    step = jax.jit(jax.vmap(
        lambda s, ims: pipeline.process_interval(s, ims, cfg)[:2]))
    compiled = step.lower(vstate, vimgs).compile()
    try:
        ma = compiled.memory_analysis()
        arg_b = int(ma.argument_size_in_bytes)
        out_b = int(ma.output_size_in_bytes)
        tmp_b = int(ma.temp_size_in_bytes)
    except Exception:
        # backend without memory analysis (e.g. CPU): fall back to
        # shape-derived argument/output sizes, temp unknown
        arg_b = tree_bytes(vstate) + tree_bytes(vimgs)
        out_b = arg_b
        tmp_b = 0
    return IntervalFootprint(
        videos=videos, argument_bytes=arg_b, output_bytes=out_b,
        temp_bytes=tmp_b, state_bytes=tree_bytes(vstate),
        device_limit=device_bytes_limit(device))


def check_fits(videos: int, cfg, device=None) -> IntervalFootprint:
    """Raise a clean, actionable error when the V-video interval step
    cannot fit on the device, instead of crashing the TPU worker."""
    fp = interval_footprint(videos, cfg, device)
    if fp.fits is False:
        raise MemoryError(
            f"batched pipeline does not fit on this chip: {fp.describe()}."
            f" Reduce the video batch (V) or shard videos over more chips"
            f" (the data-parallel 'video' mesh axis, parallel/sharded.py).")
    return fp
