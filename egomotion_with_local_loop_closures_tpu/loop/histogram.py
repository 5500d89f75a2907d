"""Intensity histograms + KL-divergence comparison for loop detection.

Mirrors ``globalOptimize::calculateImageHistogram`` /
``compareImageHistogram`` (``src/GlobalOptimize.cpp:40-122``): a 256-bin
histogram over [0, 256) normalized to sum 1, compared with OpenCV's
``CV_COMP_KL_DIV`` semantics (bins where p == 0 contribute 0; q == 0 is
clamped to 1e-10).
"""

from __future__ import annotations

import jax.numpy as jnp


def image_histogram(image: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Normalized intensity histogram of a [0, 255] float image."""
    idx = jnp.clip(image.astype(jnp.int32), 0, bins - 1).ravel()
    h = jnp.zeros((bins,), jnp.float32).at[idx].add(1.0)
    return h / jnp.maximum(h.sum(), 1.0)


def kl_divergence(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """OpenCV CV_COMP_KL_DIV: sum_i p_i log(p_i / max(q_i, 1e-10)),
    skipping bins with p_i == 0.  Supports batched inputs (leading dims)."""
    q_safe = jnp.maximum(q, 1e-10)
    terms = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0) / q_safe),
                      0.0)
    return jnp.sum(terms, axis=-1)


def kl_divergence_batched(ps: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """KL(p_i || q) for a stack of p histograms (N, B) against one q."""
    return kl_divergence(ps, q[None, :])
