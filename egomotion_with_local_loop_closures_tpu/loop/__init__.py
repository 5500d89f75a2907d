from egomotion_with_local_loop_closures_tpu.loop import closure, histogram

__all__ = ["closure", "histogram"]
