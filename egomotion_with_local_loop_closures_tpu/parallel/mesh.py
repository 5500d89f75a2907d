"""Device-mesh construction helpers.

The framework's parallel axes (SURVEY.md §2.3 mapping):

- ``video``: data parallelism over independent video streams — the
  throughput axis; each device (group) runs the full pipeline on its own
  sequence, no cross-device communication in steady state.
- ``pixel``: tensor-style parallelism *within* one frame's Gauss-Newton
  linearization — the keyframe template is row-sharded and the 6x6
  Hessian / 6-vector blocks are ``psum``-reduced over ICI, replacing the
  reference's 3-thread row striping (PixelWisePyramid.cpp:416-455).
Loop-closure rematch candidates are batched with plain ``vmap`` inside a
device (loop/closure.py dispatches the whole window as one batched
alignment) — they do not get a mesh axis of their own.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bootstrap the multi-host runtime (``jax.distributed.initialize``).

    The reference's only "multi-host" mechanism is its filesystem pipeline
    — text files plus process restart (``bin/ELLC_LC.sh:4-19``); here
    hosts join one JAX runtime so every mesh helper below can span
    processes and the collectives ride ICI/DCN instead of the disk.

    Parameters default to the ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` environment variables
    (the standard cluster-launcher contract); call with explicit values
    in tests.  Safe to call once per process, before any backend use.
    After it returns, ``jax.devices()`` spans ALL hosts while
    ``jax.local_devices()`` stays host-local.
    """
    import os
    kw = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def make_mesh(video: int = 1, pixel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A (video, pixel) mesh over the available devices.

    In a multi-process runtime (after :func:`initialize_multihost`),
    ``jax.devices()`` enumerates the devices of every host in process
    order, so the video axis naturally spans hosts (each host feeds its
    local video shards) while the pixel axis should stay within a host's
    devices for ICI-speed psums."""
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
