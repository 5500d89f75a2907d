from egomotion_with_local_loop_closures_tpu.runtime import io, pipeline, runner

__all__ = ["pipeline", "io", "runner"]
