"""Sharded execution paths: pixel-sharded Gauss-Newton and multi-video
batched pipeline steps.

The reference's concurrency is 3 boost threads striping image rows with
per-thread 6x6 Hessian partials summed at join
(``src/PixelWisePyramid.cpp:416-455``) and 3 threads over depth rows
(``src/DepthPropagation.cpp:1932-1958``).  The TPU-native equivalents:

- :func:`sharded_gn_step` — the keyframe template row-sharded over the
  ``pixel`` mesh axis via ``shard_map``; each device linearizes its rows
  and the (6,6)/(6,) blocks are ``psum``-reduced over ICI.  The current
  image is replicated (warps gather arbitrary coordinates).
- :func:`batched_process_interval` — ``vmap`` of the full pipeline
  interval over a leading video axis, sharded with NamedSharding so each
  device (row of the mesh) advances its own video stream: the scaling
  axis for multi-video throughput (BASELINE configs 4-5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import lie, linear
from egomotion_with_local_loop_closures_tpu.runtime import pipeline
from egomotion_with_local_loop_closures_tpu.track import alignment


def sharded_gn_quantities(kf: alignment.KeyframeLevel,
                          cur: alignment.CurrentLevel,
                          pose: jnp.ndarray, level: int,
                          cfg: ELLCConfig, mesh: Mesh):
    """One GN linearization with the template row-sharded on the ``pixel``
    axis; returns replicated (H 6x6, g 6)."""
    intr = cfg.level_intrinsics(level)
    n_shards = mesh.shape["pixel"]
    rows = kf.image.shape[0]
    rows_pad = ((rows + n_shards - 1) // n_shards) * n_shards
    pad = rows_pad - rows

    def pad_rows(a):
        return jnp.pad(a, ((0, pad), (0, 0)))

    kf_p = alignment.KeyframeLevel(pad_rows(kf.image), pad_rows(kf.depth),
                                   pad_rows(kf.var))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("pixel", None), P("pixel", None), P("pixel", None),
                  P(), P(), P(), P()),
        out_specs=(P(), P()))
    def f(kf_img, kf_depth, kf_var, cur_img, cur_gx, cur_gy, pose_):
        shard = jax.lax.axis_index("pixel")
        y0 = shard * (rows_pad // n_shards)
        kf_local = alignment.KeyframeLevel(kf_img, kf_depth, kf_var)
        cur_full = alignment.CurrentLevel(cur_img, cur_gx, cur_gy)
        H, g, _, _, _ = alignment._gn_quantities(
            kf_local, cur_full, pose_, intr, cfg, y_offset=y0)
        return (jax.lax.psum(H, "pixel"), jax.lax.psum(g, "pixel"))

    return f(kf_p.image, kf_p.depth, kf_p.var,
             cur.image, cur.gradx, cur.grady, pose)


def sharded_gn_step(kf: alignment.KeyframeLevel,
                    cur: alignment.CurrentLevel,
                    pose: jnp.ndarray, level: int,
                    cfg: ELLCConfig, mesh: Mesh) -> jnp.ndarray:
    """One pixel-sharded GN pose update (solve + left-compose)."""
    H, g = sharded_gn_quantities(kf, cur, pose, level, cfg, mesh)
    delta = -linear.solve_spd(H + 1e-12 * jnp.eye(6, dtype=H.dtype), g)
    ok = jnp.all(jnp.isfinite(delta)) & (jnp.max(jnp.abs(delta)) < 1e3)
    delta = jnp.where(ok, delta, 0.0)
    return lie.compose(delta, pose)


def batched_init(images: jnp.ndarray, keys: jax.Array, cfg: ELLCConfig,
                 mesh: Mesh):
    """Initialize a batch of pipelines, one video per mesh ``video`` row."""
    sh = NamedSharding(mesh, P("video"))
    images = jax.device_put(images, NamedSharding(
        mesh, P("video", None, None)))
    f = jax.jit(jax.vmap(lambda im, k: pipeline.init_pipeline(im, k, cfg)),
                out_shardings=sh)
    return f(images, keys)


def batched_process_interval(states, images: jnp.ndarray, cfg: ELLCConfig,
                             mesh: Mesh):
    """Advance every video stream by one keyframe interval.

    ``states``: pytree with leading video axis; ``images``: (V, K, H, W).
    Each video's interval runs entirely on its own device slice; there is
    no cross-video communication — linear scaling over the ``video`` axis.
    """
    sh = NamedSharding(mesh, P("video"))

    def one(s, im):
        s2, outs, _ = pipeline.process_interval(s, im, cfg)
        return s2, outs

    f = jax.jit(jax.vmap(one), out_shardings=(sh, sh))
    images = jax.device_put(images, NamedSharding(
        mesh, P("video", None, None, None)))
    return f(states, images)
