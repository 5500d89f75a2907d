from egomotion_with_local_loop_closures_tpu.graph import batch, rotation_averaging

__all__ = ["rotation_averaging", "batch"]
