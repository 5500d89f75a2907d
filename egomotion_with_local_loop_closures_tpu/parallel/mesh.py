"""Device-mesh construction helpers.

The framework's parallel axes (SURVEY.md §2.3 mapping):

- ``video``: data parallelism over independent video streams — the
  throughput axis; each device (group) runs the full pipeline on its own
  sequence, no cross-device communication in steady state.
- ``pixel``: tensor-style parallelism *within* one frame's Gauss-Newton
  linearization — the keyframe template is row-sharded and the 6x6
  Hessian / 6-vector blocks are ``psum``-reduced over ICI, replacing the
  reference's 3-thread row striping (PixelWisePyramid.cpp:416-455).
- ``window``: batch parallelism over loop-closure rematch candidates.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(video: int = 1, pixel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A (video, pixel) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = video * pixel
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(video, pixel)
    return Mesh(arr, ("video", "pixel"))


def video_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (video-batch) axis."""
    return NamedSharding(mesh, P("video"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
