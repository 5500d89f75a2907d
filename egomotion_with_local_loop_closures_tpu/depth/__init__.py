from egomotion_with_local_loop_closures_tpu.depth import fusion

__all__ = ["fusion"]
