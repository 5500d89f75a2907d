from egomotion_with_local_loop_closures_tpu.geom import camera, lie, linear

__all__ = ["lie", "camera", "linear"]
