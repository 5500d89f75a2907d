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

from typing import NamedTuple, Tuple

import jax
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


PACK_SCALE = 64.0


def pack_pairs_u16(img: jnp.ndarray) -> jnp.ndarray:
    """Pack horizontally adjacent pixel pairs (img[y,x], img[y,x+1]) into
    one uint32 word as 16-bit fixed point (x64 scale).

    TPU rationale: XLA gather costs ~7-8 ns per fetched element regardless
    of width (BASELINE.md perf notes), so fetching both x-interpolation
    neighbours in ONE 32-bit word halves the dominant cost of the
    epipolar line-stereo sampling.  Precision: exact for integer-valued
    images (raw uint8 video); for non-integer intensities (undistorted /
    resized / pyramid-averaged frames) the quantization error is at most
    1/128 per corner — three orders of magnitude below the pipeline's
    camera_pixel_noise (sigma = 4 intensity units, EV:148), but NOT below
    fp32 ulp, so bit-exactness against the unpacked path only holds for
    integer inputs.
    """
    q = jnp.clip(jnp.round(img * PACK_SCALE), 0.0, 65535.0).astype(jnp.uint32)
    nxt = jnp.pad(q[:, 1:], ((0, 0), (0, 1)))
    return q | (nxt << 16)


def bilinear_packed_fill(packed: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                         ) -> jnp.ndarray:
    """Bilinear sample from a pack_pairs_u16 image with the reference's
    zero-fill rule (corners outside the image contribute 0, Frame.h:211-263).
    Two gathers instead of four."""
    H, W = packed.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0r = x0.astype(jnp.int32)            # may be out of range
    y0r = y0.astype(jnp.int32)
    x0i = jnp.clip(x0r, 0, W - 1)
    y0i = jnp.clip(y0r, 0, H - 1)
    y1i = jnp.clip(y0r + 1, 0, H - 1)     # exact row for the y1 corner
    flat = packed.ravel()
    top = jnp.take(flat, y0i * W + x0i)
    bot = jnp.take(flat, y1i * W + x0i)

    inv = jnp.float32(1.0 / PACK_SCALE)

    def unpack(w):
        lo = (w & jnp.uint32(0xFFFF)).astype(jnp.float32) * inv
        hi = (w >> 16).astype(jnp.float32) * inv
        return lo, hi

    t_lo, t_hi = unpack(top)
    b_lo, b_hi = unpack(bot)
    # the fetched word covers columns (x0i, x0i+1); when x0 < 0 the x1
    # corner (= x0+1 = 0) is the LO half of the clipped word
    x_under = x0r < 0
    v00, v01 = t_lo, jnp.where(x_under, t_lo, t_hi)
    v10, v11 = b_lo, jnp.where(x_under, b_lo, b_hi)
    # per-corner zero-fill from the UNclipped coordinates; x1 = ceil(x)
    # (== x0 for integral coords, where wx = 0 makes the x1 term vanish)
    x1 = jnp.ceil(x)
    y1 = jnp.ceil(y)
    x0_in = (x0 >= 0) & (x0 <= W - 1)
    x1_in = (x1 >= 0) & (x1 <= W - 1)
    y0_in = (y0 >= 0) & (y0 <= H - 1)
    y1_in = (y1 >= 0) & (y1 <= H - 1)
    v00 = jnp.where(x0_in & y0_in, v00, 0.0)
    v01 = jnp.where(x1_in & y0_in, v01, 0.0)
    v10 = jnp.where(x0_in & y1_in, v10, 0.0)
    v11 = jnp.where(x1_in & y1_in, v11, 0.0)
    top_v = (1.0 - wx) * v00 + wx * v01
    bot_v = (1.0 - wx) * v10 + wx * v11
    return (1.0 - wy) * top_v + wy * bot_v


def pack_quad_u8(img: jnp.ndarray) -> jnp.ndarray:
    """Pack the full 2x2 bilinear corner block (img[y,x], img[y,x+1],
    img[y+1,x], img[y+1,x+1]) into ONE uint32 word as four rounded 8-bit
    intensities — a single gather then fetches everything a bilinear
    sample needs (2x fewer lookups than pack_pairs_u16's two words).

    Precision: intensities are 0..255 so 8 bits loses only sub-integer
    detail; each corner is off by at most 0.5 intensity, i.e. the
    interpolated sample by at most 0.5 — still an order of magnitude
    below camera_pixel_noise (sigma = 4, EV:148) but large enough that a
    caller wanting bit-parity with the float path must use
    pack_pairs_u16.  Gate with cfg.stereo_pack_u8.
    """
    q = jnp.clip(jnp.round(img), 0.0, 255.0).astype(jnp.uint32)
    qx = jnp.pad(q[:, 1:], ((0, 0), (0, 1)))
    qy = jnp.pad(q[1:, :], ((0, 1), (0, 0)))
    qxy = jnp.pad(q[1:, 1:], ((0, 1), (0, 1)))
    return q | (qx << 8) | (qy << 16) | (qxy << 24)


def bilinear_quad_fill(packed: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                       ) -> jnp.ndarray:
    """Bilinear sample from a pack_quad_u8 image with the reference's
    zero-fill rule (corners outside the image contribute 0,
    Frame.h:211-263).  ONE gather per sample."""
    H, W = packed.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0r = x0.astype(jnp.int32)
    y0r = y0.astype(jnp.int32)
    x0i = jnp.clip(x0r, 0, W - 1)
    y0i = jnp.clip(y0r, 0, H - 1)
    word = jnp.take(packed.ravel(), y0i * W + x0i)

    m = jnp.uint32(0xFF)
    v00 = (word & m).astype(jnp.float32)
    v01 = ((word >> 8) & m).astype(jnp.float32)
    v10 = ((word >> 16) & m).astype(jnp.float32)
    v11 = (word >> 24).astype(jnp.float32)
    # when x0 < 0 the fetched word's columns are (0, 1): the x1 corner
    # (= x0+1 = 0) is the LO half; same for y under-range
    x_under = x0r < 0
    y_under = y0r < 0
    v01 = jnp.where(x_under, v00, v01)
    v11 = jnp.where(x_under, v10, v11)
    v10 = jnp.where(y_under, v00, v10)
    v11 = jnp.where(y_under, v01, v11)
    # per-corner zero-fill from the UNclipped coordinates; x1 = ceil(x)
    x1 = jnp.ceil(x)
    y1 = jnp.ceil(y)
    x0_in = (x0 >= 0) & (x0 <= W - 1)
    x1_in = (x1 >= 0) & (x1 <= W - 1)
    y0_in = (y0 >= 0) & (y0 <= H - 1)
    y1_in = (y1 >= 0) & (y1 <= H - 1)
    v00 = jnp.where(x0_in & y0_in, v00, 0.0)
    v01 = jnp.where(x1_in & y0_in, v01, 0.0)
    v10 = jnp.where(x0_in & y1_in, v10, 0.0)
    v11 = jnp.where(x1_in & y1_in, v11, 0.0)
    top_v = (1.0 - wx) * v00 + wx * v01
    bot_v = (1.0 - wx) * v10 + wx * v11
    return (1.0 - wy) * top_v + wy * bot_v


class WindowSampler(NamedTuple):
    """Precomputed separable shift-and-blend coefficients for sampling one
    or more images at the same (x, y) coordinate field.

    TPU rationale: XLA lowers an arbitrary 2D gather to ~8 ns/lookup on
    this chip (BASELINE.md perf notes) — 4-corner bilinear warping of a
    (270, 480) field costs ~5 ms per image.  When the displacement field
    (x - grid, y - grid) is bounded by a small window ``D`` around a
    global integer shift, the exact same bilinear result is a sum of
    statically-shifted image views weighted by per-pixel indicator
    coefficients — pure VPU element-wise work, ~50x faster.  A traced
    global integer shift (handled with jnp.roll) extends the reach to
    large common-mode motion (camera pans) without growing ``D``.

    The coefficients are separable: cy[dy] (vertical lerp indicator) and
    cx[dx] (horizontal), so sampling costs (2D+2)^2 fused multiply-adds
    per pixel per image, with the coefficient planes shared across all
    images sampled at the same coordinates (intensity + gradients).

    Out-of-bounds semantics match ``bilinear`` (reference
    Frame.h:211-270): corners outside the image contribute 0;
    ``in_bounds`` is True when any corner is inside.  Pixels whose
    displacement falls outside the window are additionally reported in
    ``in_window`` — callers mask them out of reductions (the GN simply
    uses fewer pixels; only extreme, coarse-level motion is affected and
    the coarse levels use wide windows).
    """
    cy: jnp.ndarray         # (2D+2, H, W) vertical coefficients
    cx: jnp.ndarray         # (2D+2, H, W) horizontal coefficients
    in_bounds: jnp.ndarray  # (H, W) any-corner-inside (reference -1 rule)
    in_window: jnp.ndarray  # (H, W) displacement within the window
    shift_y: jnp.ndarray    # () int32 global shift
    shift_x: jnp.ndarray    # () int32
    D: int


def make_window_sampler(x: jnp.ndarray, y: jnp.ndarray, D: int,
                        H: int, W: int,
                        shift_y: jnp.ndarray | None = None,
                        shift_x: jnp.ndarray | None = None,
                        valid: jnp.ndarray | None = None) -> WindowSampler:
    """Build sampling coefficients for coords (x, y) over an (H, W) image.

    ``shift_y/x``: traced global integer shifts; if None they are chosen
    as the rounded mean displacement over ``valid`` (or all) pixels.
    """
    dt = x.dtype
    gx = jnp.arange(W, dtype=dt)[None, :]
    gy = jnp.arange(H, dtype=dt)[:, None]
    if shift_x is None:
        if valid is None:
            valid = jnp.ones(x.shape, bool)
        n = jnp.maximum(jnp.sum(valid), 1.0)
        shift_x = jnp.round(jnp.sum(jnp.where(valid, x - gx, 0.0)) / n
                            ).astype(jnp.int32)
        shift_y = jnp.round(jnp.sum(jnp.where(valid, y - gy, 0.0)) / n
                            ).astype(jnp.int32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    # the reference computes ceil for the far corner: equal to floor for
    # integral coords (matching ``bilinear`` exactly)
    x1 = jnp.ceil(x)
    y1 = jnp.ceil(y)
    sxf = shift_x.astype(dt)
    syf = shift_y.astype(dt)
    # integer-valued float window displacements of each corner
    dx0 = x0 - gx - sxf
    dx1 = x1 - gx - sxf
    dy0 = y0 - gy - syf
    dy1 = y1 - gy - syf

    # separable per-corner in-image checks: corner (r, c) is inside iff
    # r-inside AND c-inside, so the reference's zero-fill rule factors
    # into the 1D coefficients below
    x0_in = (x0 >= 0) & (x0 <= W - 1)
    x1_in = (x1 >= 0) & (x1 <= W - 1)
    y0_in = (y0 >= 0) & (y0 <= H - 1)
    y1_in = (y1 >= 0) & (y1 <= H - 1)
    in_bounds = (x0_in | x1_in) & (y0_in | y1_in)

    # readability through the rolled view: an in-image corner must also
    # lie within [0, H) of the shifted origin or its static shifted slice
    # would read wrapped content
    read_y0 = (y0 - syf >= 0) & (y0 - syf <= H - 1)
    read_y1 = (y1 - syf >= 0) & (y1 - syf <= H - 1)
    read_x0 = (x0 - sxf >= 0) & (x0 - sxf <= W - 1)
    read_x1 = (x1 - sxf >= 0) & (x1 - sxf <= W - 1)

    in_window = ((dx0 >= -D) & (dx1 <= D + 1) & (dy0 >= -D) & (dy1 <= D + 1)
                 & (read_x0 | ~x0_in) & (read_x1 | ~x1_in)
                 & (read_y0 | ~y0_in) & (read_y1 | ~y1_in))

    cy = []
    cx = []
    for d in range(-D, D + 2):
        # out-of-image corners get coefficient 0 (they must contribute
        # nothing, and the rolled/padded read could alias wrapped content)
        cy.append(jnp.where((dy0 == d) & y0_in & read_y0, 1.0 - wy, 0.0)
                  + jnp.where((dy1 == d) & y1_in & read_y1, wy, 0.0))
        cx.append(jnp.where((dx0 == d) & x0_in & read_x0, 1.0 - wx, 0.0)
                  + jnp.where((dx1 == d) & x1_in & read_x1, wx, 0.0))
    cy = jnp.stack(cy)
    cx = jnp.stack(cx)
    return WindowSampler(cy=cy, cx=cx, in_bounds=in_bounds,
                         in_window=in_window, shift_y=shift_y,
                         shift_x=shift_x, D=D)


def window_sample(sampler: WindowSampler, img: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at the sampler's coordinates (zero-fill OOB).

    Values are exact bilinear samples wherever ``in_window`` holds;
    elsewhere 0.  Cost: (2D+2)^2 fused multiply-adds per pixel.
    """
    H, W = img.shape
    D = sampler.D
    rolled = jnp.roll(img, (-sampler.shift_y, -sampler.shift_x), (0, 1))
    # zero-fill beyond the image so static shifted views read zeros where
    # a corner is out of range (combined with per-corner ok masks above)
    padded = jnp.pad(rolled, D + 1)
    out = jnp.zeros((H, W), img.dtype)
    for iy, dy in enumerate(range(-D, D + 2)):
        rows = jax.lax.dynamic_slice(
            padded, (D + 1 + dy, 0), (H, W + 2 * D + 2))
        hacc = jnp.zeros((H, W), img.dtype)
        for ix, dx in enumerate(range(-D, D + 2)):
            sh = jax.lax.slice(rows, (0, D + 1 + dx), (H, D + 1 + dx + W))
            hacc = hacc + sampler.cx[ix] * sh
        out = out + sampler.cy[iy] * hacc
    return out
