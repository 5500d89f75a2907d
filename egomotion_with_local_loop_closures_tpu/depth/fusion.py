"""Depth/variance pyramid fusion.

Rewrites ``depthMap::buildInvVarDepth`` (``src/DepthPropagation.cpp:
1637-1719``): each coarse cell fuses its 2x2 children by inverse variance
in *inverse-depth* space.  Valid children have var > 0; with no valid
child the cell gets depth 0 / var -1.

Per reference formulas, with ivar_i = 1/var_i over valid children:
    depth_dest = sum(ivar) / sum(ivar / depth)     (= 1/weighted-mean(idepth))
    var_dest   = num_valid / sum(ivar)
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def fuse_level(depth: jnp.ndarray, var: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fusion step: (H, W) -> (H//2, W//2)."""
    H, W = depth.shape
    H2, W2 = H // 2, W // 2
    d = depth[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2)
    v = var[: H2 * 2, : W2 * 2].reshape(H2, 2, W2, 2)
    valid = v > 0.0
    ivar = jnp.where(valid, 1.0 / jnp.where(valid, v, 1.0), 0.0)
    # guard 1/depth for invalid children (their ivar is 0 anyway)
    inv_d = jnp.where(valid, 1.0 / jnp.where(jnp.abs(d) > 1e-12, d, 1e-12), 0.0)
    ivar_sum = ivar.sum(axis=(1, 3))
    idepth_sum = (ivar * inv_d).sum(axis=(1, 3))
    num = valid.sum(axis=(1, 3)).astype(depth.dtype)
    any_valid = num > 0
    depth_out = jnp.where(any_valid,
                          ivar_sum / jnp.where(any_valid, idepth_sum, 1.0),
                          0.0)
    var_out = jnp.where(any_valid,
                        num / jnp.where(any_valid, ivar_sum, 1.0),
                        -1.0)
    return depth_out, var_out


def build_depth_var_pyramid(depth0: jnp.ndarray, var0: jnp.ndarray,
                            num_levels: int
                            ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Full pyramid [level0..levelN-1]; level 0 is passed through."""
    depths, vars_ = [depth0], [var0]
    for _ in range(num_levels - 1):
        d, v = fuse_level(depths[-1], vars_[-1])
        depths.append(d)
        vars_.append(v)
    return depths, vars_
