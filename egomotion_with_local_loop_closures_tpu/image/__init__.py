from egomotion_with_local_loop_closures_tpu.image import interp, pyramid

__all__ = ["interp", "pyramid"]
