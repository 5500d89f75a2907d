from egomotion_with_local_loop_closures_tpu.parallel import mesh, sharded

__all__ = ["mesh", "sharded"]
