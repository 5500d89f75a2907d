from egomotion_with_local_loop_closures_tpu.track import alignment

__all__ = ["alignment"]
