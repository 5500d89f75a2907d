"""Pinhole camera model: projection, backprojection, undistortion.

Mirrors the reference's camera handling: global K / K^-1 set up in
``src/EigenInitialization.cpp:20-34``, per-level intrinsics
``GetIntrinsic(level) = orig / 2**level`` (``src/UserDefinedFunc.cpp:33-49``),
and the OpenCV 5-parameter radial/tangential distortion model used by
``cv::undistort`` in ``src/Frame.cpp:86-96``.

All functions are shape-polymorphic over leading batch dims and dense over
pixel grids — no per-pixel host loops.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def intrinsics_matrix(fx: float, fy: float, cx: float, cy: float,
                      dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]],
                       dtype=dtype)


def backproject(x: jnp.ndarray, y: jnp.ndarray, depth: jnp.ndarray,
                fx: float, fy: float, cx: float, cy: float) -> jnp.ndarray:
    """Pixel (x, y) + depth -> 3D point (..., 3) in the camera frame.

    Matches the per-pixel backprojection of PixelWisePyramid.cpp:236-238.
    """
    X = (x - cx) * depth / fx
    Y = (y - cy) * depth / fy
    return jnp.stack([X, Y, depth], axis=-1)


def project(p: jnp.ndarray, fx: float, fy: float, cx: float, cy: float,
            eps: float = 1e-10) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """3D point (..., 3) -> pixel (x, y) and the (unzeroed) depth.

    The depth guard replicates the UNZERO macro (ExternVariable.h:232): a
    depth in (-eps, eps) is clamped away from zero keeping its sign.
    """
    z = p[..., 2]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    x = p[..., 0] / z * fx + cx
    y = p[..., 1] / z * fy + cy
    return x, y, z


def pixel_grid(rows: int, cols: int, dtype=jnp.float32
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (x, y) coordinate grids of shape (rows, cols)."""
    y = jnp.arange(rows, dtype=dtype)[:, None] * jnp.ones((1, cols), dtype)
    x = jnp.ones((rows, 1), dtype) * jnp.arange(cols, dtype=dtype)[None, :]
    return x, y


def distort_normalized(xn: jnp.ndarray, yn: jnp.ndarray,
                       dist: Tuple[float, float, float, float, float]
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the OpenCV 5-parameter model (k1, k2, p1, p2, k3) to normalized
    coordinates.  Used to build the undistortion remap (ideal -> distorted)."""
    k1, k2, p1, p2, k3 = dist
    r2 = xn * xn + yn * yn
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = xn * radial + 2.0 * p1 * xn * yn + p2 * (r2 + 2.0 * xn * xn)
    yd = yn * radial + p1 * (r2 + 2.0 * yn * yn) + 2.0 * p2 * xn * yn
    return xd, yd


def undistort_map(rows: int, cols: int,
                  fx: float, fy: float, cx: float, cy: float,
                  dist: Tuple[float, float, float, float, float]
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Source sampling coordinates (x_src, y_src) for an undistorted output
    grid; sample the raw image at these with bilinear interpolation.

    Equivalent to cv::initUndistortRectifyMap with newK == K
    (Frame.cpp:86-96 uses getOptimalNewCameraMatrix(alpha=0); we keep K
    itself, which only changes the crop margin, not the geometry).
    """
    x, y = pixel_grid(rows, cols)
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    xd, yd = distort_normalized(xn, yn, dist)
    return xd * fx + cx, yd * fy + cy


def undistort_image(image: jnp.ndarray,
                    fx: float, fy: float, cx: float, cy: float,
                    dist: Tuple[float, float, float, float, float]
                    ) -> jnp.ndarray:
    """Undistort an image by bilinear resampling at the distorted source
    coordinates (cv::undistort, Frame.cpp:86-96).  Out-of-image samples
    fill with 0, matching cv::remap's default border."""
    from egomotion_with_local_loop_closures_tpu.image import interp

    H, W = image.shape
    xs, ys = undistort_map(H, W, fx, fy, cx, cy, dist)
    return interp.bilinear_fill(image, xs, ys)
