"""Image pyramids, gradients, and the dilated max-gradient map.

Replaces ``frame::constructImagePyramids`` / ``calculateGradient`` /
``buildMaxGradients`` (``src/Frame.cpp:170-285, 618-674``) with dense XLA
ops.  The reference uses OpenCV ``pyrDown`` (5-tap Gaussian blur then 2x
decimation); we do the same with the standard [1 4 6 4 1]/16 kernel and
floor-halved output shapes (the reference's consumers index with
``rows >> level`` — ``Frame.cpp:287-293`` — so the floor convention is the
one actually used downstream).

Images are float32 in [0, 255] throughout: the reference mixes uint8
storage with float arithmetic, and all its thresholds (HUBER_D,
MAX_ERROR_STEREO, histogram bins, ...) assume the 0-255 intensity scale.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

import jax.numpy as jnp

# Plain Python floats, NOT a module-level jnp array: a device array closed
# over by a jitted function becomes a captured device-buffer constant in
# the executable, which knocks the TPU-tunnel runtime out of its async
# dispatch fast path for the whole process (~240 ms/dispatch measured).
# Host constants (python/numpy) are inlined as HLO literals and are safe.
_G5 = tuple(np.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0)


def _sep_blur5(img: jnp.ndarray) -> jnp.ndarray:
    """Separable 5-tap Gaussian blur with edge replication (OpenCV
    BORDER_REFLECT_101 is close; replicate is within a hair at borders and
    border pixels are masked out of every downstream consumer anyway)."""
    k = tuple(jnp.asarray(v, img.dtype) for v in _G5)
    p = jnp.pad(img, ((2, 2), (0, 0)), mode="edge")
    img = (k[0] * p[:-4] + k[1] * p[1:-3] + k[2] * p[2:-2]
           + k[3] * p[3:-1] + k[4] * p[4:])
    p = jnp.pad(img, ((0, 0), (2, 2)), mode="edge")
    img = (k[0] * p[:, :-4] + k[1] * p[:, 1:-3] + k[2] * p[:, 2:-2]
           + k[3] * p[:, 3:-1] + k[4] * p[:, 4:])
    return img


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """One pyramid level: Gaussian blur + 2x decimation, floor shapes."""
    H, W = img.shape
    return _sep_blur5(img)[: (H // 2) * 2 : 2, : (W // 2) * 2 : 2]


def build_pyramid(img: jnp.ndarray, num_levels: int) -> List[jnp.ndarray]:
    """Image pyramid [level0 .. levelN-1]; mirrors Frame.cpp:170-182."""
    out = [img]
    for _ in range(num_levels - 1):
        out.append(pyr_down(out[-1]))
    return out


def gradients(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradients, one-sided at borders.

    Matches frame::calculateGradient exactly (Frame.cpp:185-285): interior
    0.5*(I[x+1]-I[x-1]); first/last row or column use one-sided differences
    *without* the 0.5 factor.
    """
    gx_int = 0.5 * (img[:, 2:] - img[:, :-2])
    gx = jnp.concatenate(
        [(img[:, 1:2] - img[:, 0:1]), gx_int, (img[:, -1:] - img[:, -2:-1])],
        axis=1)
    gy_int = 0.5 * (img[2:, :] - img[:-2, :])
    gy = jnp.concatenate(
        [(img[1:2, :] - img[0:1, :]), gy_int, (img[-1:, :] - img[-2:-1, :])],
        axis=0)
    return gx, gy


def max_abs_gradient(gx: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude dilated by a 3x3 max over the interior.

    Mirrors frame::buildMaxGradients (Frame.cpp:618-674): borders keep the
    raw magnitude (the smear passes only write rows/cols 1..n-2).
    """
    mag = jnp.sqrt(gx * gx + gy * gy)
    # vertical 3-max into interior rows
    vert = jnp.maximum(jnp.maximum(mag[:-2, :], mag[1:-1, :]), mag[2:, :])
    tmp = mag.at[1:-1, :].set(vert)
    # horizontal 3-max of tmp into interior cols (reads tmp, like the ref's
    # two-buffer pass)
    horiz = jnp.maximum(jnp.maximum(tmp[:, :-2], tmp[:, 1:-1]), tmp[:, 2:])
    out = mag.at[1:-1, 1:-1].set(horiz[1:-1, :])
    return out


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """BGR/RGB uint8-scale -> gray float32, OpenCV CV_BGR2GRAY weights
    (Frame.cpp:83).  Accepts (H, W, 3) in RGB channel order."""
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=jnp.float32)
    return jnp.tensordot(rgb.astype(jnp.float32), w, axes=([-1], [0]))


def resize_quarter(img: jnp.ndarray) -> jnp.ndarray:
    """4x area downsample (the reference resizes 1920x1080 -> 480x270 with
    cv::resize INTER_LINEAR at scale 0.25; 4x4 box averaging matches the
    anti-aliased behaviour used for this exact integer factor)."""
    H, W = img.shape
    H4, W4 = (H // 4) * 4, (W // 4) * 4
    v = img[:H4, :W4].reshape(H4 // 4, 4, W4 // 4, 4)
    return v.mean(axis=(1, 3))
