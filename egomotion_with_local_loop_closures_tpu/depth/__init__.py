from egomotion_with_local_loop_closures_tpu.depth import (
    fusion,
    propagate,
    state,
    stereo,
)

__all__ = ["fusion", "propagate", "state", "stereo"]
