"""ELLC-TPU: a TPU-native egocentric visual-odometry framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
"Computing Egomotion with Local Loop Closures for Egocentric Videos"
(WACV 2017): LSD-SLAM-style semi-dense direct tracking, per-keyframe
inverse-depth filtering, local loop closures over a sliding keyframe
window, and robust L1-IRLS rotation averaging — redesigned for TPU:
dense masked array kernels instead of per-pixel branchy loops, fixed
shapes, `lax.scan` control flow, `vmap` batching, and `shard_map`
distribution over device meshes.

Subpackages
-----------
- ``geom``:    se(3)/SO(3) Lie ops and the pinhole camera model.
- ``image``:   image pyramids, gradients, bilinear sampling.
- ``track``:   multi-scale Gauss-Newton direct image alignment.
- ``depth``:   inverse-depth filter (epipolar stereo, EKF, propagation).
- ``loop``:    local loop-closure detection + rematch alignment.
- ``graph``:   pose graph + robust SO(3) rotation averaging.
- ``runtime``: the frame-loop pipeline driver, config, IO, checkpoints.
- ``parallel``: mesh/sharding utilities for multi-chip execution.
- ``ops``:     Pallas TPU kernels for the hot paths.
- ``utils``:   metrics, synthetic-scene generation, profiling.
"""

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig

__version__ = "0.1.0"

__all__ = ["ELLCConfig", "__version__"]
