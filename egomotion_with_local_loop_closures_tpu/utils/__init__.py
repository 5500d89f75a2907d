from egomotion_with_local_loop_closures_tpu.utils import metrics, synthetic

__all__ = ["synthetic", "metrics"]
