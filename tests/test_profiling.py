"""Profiling/metrics utilities tests (utils/profiling.py)."""

import time

import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.utils import profiling


def test_stopwatch():
    sw = profiling.Stopwatch()
    sw.start()
    time.sleep(0.01)
    assert sw.stop_ms() >= 9.0


def test_stage_timer_aggregates_and_syncs():
    t = profiling.StageTimer()
    for _ in range(3):
        with t.stage("mul") as out:
            out.append(jnp.ones((64, 64)) * 2.0)
    s = t.stats["mul"]
    assert s.count == 3 and s.total_s > 0
    assert "mul" in t.report()


def test_meters():
    m = profiling.Meters()
    m.frames += 16
    m.keyframes += 2
    d = m.as_dict()
    assert d["frames"] == 16 and d["fps"] > 0 and d["fps_per_chip"] > 0


def test_trace_noop():
    with profiling.trace(None):
        pass
