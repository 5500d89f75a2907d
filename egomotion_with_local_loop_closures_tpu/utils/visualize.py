"""Visualization / debug rendering: the DisplayFunc + displayColourDepthMap
analog.

The reference renders (a) JET-colormapped depth overlays
(``src/DepthPropagation.cpp:1160-1250`` displayColourDepthMap), (b)
residual / warped / weight debug views (``src/DisplayFunc.cpp:34-557``),
and (c) MATLAB trajectory plots (``matlab_scripts/VisualizeTrajectory.m``).
All of it is imshow/imwrite on the host; here the same views are produced
as numpy arrays (device compute stays in JAX; only the final uint8 images
cross to the host) and written as image files.

The depth colormap replicates the reference exactly: ``uint8(depth*100)``
clamped at 255, JET applied, and invalid pixels — the ones landing on
JET(0), i.e. ``uint8(depth*100)==0`` — replaced by the grayscale keyframe
image (DepthPropagation.cpp:1176-1219)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.geom import camera, lie
from egomotion_with_local_loop_closures_tpu.image import interp


# ------------------------------------------------------------------ colormap

def jet_colormap(u8: np.ndarray) -> np.ndarray:
    """JET lookup for uint8 input, (..., ) -> (..., 3) RGB uint8.

    Uses the classic piecewise-linear jet ramp (the same curve OpenCV's
    COLORMAP_JET interpolates, DepthPropagation.cpp:1189)."""
    x = np.asarray(u8, np.float32) / 255.0

    def ramp(c):
        return np.clip(1.5 - np.abs(4.0 * x - c), 0.0, 1.0)

    r, g, b = ramp(3.0), ramp(2.0), ramp(1.0)
    return (np.stack([r, g, b], axis=-1) * 255.0 + 0.5).astype(np.uint8)


def colour_depth_map(depth: np.ndarray, gray_image: np.ndarray) -> np.ndarray:
    """displayColourDepthMap (DepthPropagation.cpp:1160-1250): depth scaled
    by 100 into uint8, JET colormap, invalid (bucket-0) pixels replaced by
    the grayscale keyframe image.  Returns (H, W, 3) RGB uint8."""
    d = np.asarray(depth, np.float32)
    u8 = np.minimum(d * 100.0, 255.0).astype(np.uint8)
    rgb = jet_colormap(u8)
    g = np.clip(np.asarray(gray_image, np.float32), 0, 255).astype(np.uint8)
    invalid = u8 == 0
    rgb[invalid] = np.stack([g, g, g], axis=-1)[invalid]
    return rgb


def normalize_view(img: np.ndarray, symmetric: bool = False) -> np.ndarray:
    """Scale an arbitrary float image into uint8 for display (the
    reference's convertTo(…, 255/max) pattern, DisplayFunc.cpp)."""
    a = np.asarray(img, np.float32)
    if symmetric:
        m = max(float(np.abs(a).max()), 1e-12)
        return ((a / m) * 127.5 + 127.5).astype(np.uint8)
    lo, hi = float(a.min()), float(a.max())
    return ((a - lo) / max(hi - lo, 1e-12) * 255.0).astype(np.uint8)


# ---------------------------------------------------------------- debug views

def alignment_views(kf_image: jnp.ndarray, kf_depth: jnp.ndarray,
                    cur_image: jnp.ndarray, pose: jnp.ndarray,
                    cfg: ELLCConfig, level: int = 0):
    """Warped / residual / mask debug views at one pyramid level — the
    DisplayFunc ``displayResidualImage`` / ``displayWarpedImage`` analog
    (DisplayFunc.cpp:34-557).  Returns dict of numpy float arrays."""
    fx, fy, cx, cy = cfg.level_intrinsics(level)
    H, W = kf_image.shape
    x, y = camera.pixel_grid(H, W)
    mask = kf_depth > 0.0
    T = lie.exp_se3(jnp.asarray(pose))
    P = camera.backproject(x, y, kf_depth, fx, fy, cx, cy)
    Pt = jnp.einsum("ij,hwj->hwi", T[:3, :3], P) + T[:3, 3]
    wx, wy, _ = camera.project(Pt, fx, fy, cx, cy)
    warped, in_bounds = interp.bilinear(jnp.asarray(cur_image), wx, wy)
    valid = mask & in_bounds
    residual = jnp.where(valid, warped - kf_image, 0.0)
    return {
        "warped": np.asarray(jnp.where(valid, warped, -1.0)),
        "residual": np.asarray(residual),
        "valid_mask": np.asarray(valid),
    }


# -------------------------------------------------------------------- output

def save_image(path: str, img: np.ndarray) -> None:
    """Write a (H, W) grayscale or (H, W, 3) RGB uint8 image."""
    from PIL import Image

    a = np.asarray(img)
    if a.dtype != np.uint8:
        a = normalize_view(a)
    Image.fromarray(a).save(path)


def plot_trajectory(world_poses: np.ndarray, path: str,
                    gt_poses: Optional[np.ndarray] = None,
                    quiver_every: int = 8) -> None:
    """Trajectory top-down plot: camera centers (-R^T t) plus viewing
    directions — VisualizeTrajectory.m's expm -> scatter/quiver, rendered
    with matplotlib instead of MATLAB."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def centers_views(poses):
        C, V = [], []
        for p in np.asarray(poses):
            T = np.asarray(lie.exp_se3(jnp.asarray(p, jnp.float32)))
            R, t = T[:3, :3], T[:3, 3]
            C.append(-R.T @ t)
            V.append(R[2, :])
        return np.asarray(C), np.asarray(V)

    fig, ax = plt.subplots(figsize=(7, 6))
    C, V = centers_views(world_poses)
    ax.plot(C[:, 0], C[:, 2], "-", lw=1.2, label="estimate")
    ax.quiver(C[::quiver_every, 0], C[::quiver_every, 2],
              V[::quiver_every, 0], V[::quiver_every, 2],
              width=0.003, scale=25, alpha=0.6)
    if gt_poses is not None:
        G, _ = centers_views(gt_poses)
        ax.plot(G[:, 0], G[:, 2], "--", lw=1.0, label="ground truth")
    ax.set_xlabel("x")
    ax.set_ylabel("z")
    ax.set_aspect("equal", adjustable="datalim")
    ax.legend(loc="best")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def dump_frame_debug(out_prefix: str, kf_image, kf_depth, cur_image,
                     pose, cfg: ELLCConfig) -> None:
    """One-call debug dump: depth overlay + warped + residual PNGs — what
    FLAG_DISPLAY_* imshow windows show in the reference, as files."""
    save_image(out_prefix + "_depth.png",
               colour_depth_map(np.asarray(kf_depth), np.asarray(kf_image)))
    views = alignment_views(jnp.asarray(kf_image), jnp.asarray(kf_depth),
                            jnp.asarray(cur_image), pose, cfg)
    save_image(out_prefix + "_warped.png", normalize_view(views["warped"]))
    save_image(out_prefix + "_residual.png",
               normalize_view(views["residual"], symmetric=True))
