"""Dense bilinear sampling with the reference's out-of-bounds semantics.

The reference samples images per pixel with ``frame::getInterpolatedElement``
(``src/Frame.h:181-394``): each of the four corners that falls outside the
image contributes intensity 0, and a sampled point is flagged out-of-bounds
(value -1) only when *all four* corners are outside.  Gradients use the same
zero-fill rule without the -1 flag.

Here the same semantics are expressed as dense gathers over whole
coordinate grids so XLA vectorizes them; returns an explicit validity mask
instead of the -1 sentinel (callers combine masks instead of branching).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample ``img`` (H, W) at float coords ``x``, ``y`` (any shape).

    Returns ``(value, in_bounds)`` where out-of-image corners contribute 0
    (Frame.h:211-263) and ``in_bounds`` is False only when all four corners
    are outside (Frame.h:267-270, the -1 sentinel).
    """
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    # The reference computes ceil(x): for integral x, ceil == floor.
    x1i = jnp.ceil(x).astype(jnp.int32)
    y1i = jnp.ceil(y).astype(jnp.int32)

    def corner(xi, yi):
        ok = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(ok, v, 0.0), ok

    v00, m00 = corner(x0i, y0i)
    v01, m01 = corner(x1i, y0i)
    v10, m10 = corner(x0i, y1i)
    v11, m11 = corner(x1i, y1i)

    top = (1.0 - wx) * v00 + wx * v01
    bottom = (1.0 - wx) * v10 + wx * v11
    value = (1.0 - wy) * top + wy * bottom
    in_bounds = m00 | m01 | m10 | m11
    return value, in_bounds


def bilinear_fill(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                  ) -> jnp.ndarray:
    """Bilinear sample with zero-fill, no validity mask (gradient variant,
    Frame.h:283-394)."""
    v, _ = bilinear(img, x, y)
    return v
