"""Timing / tracing / observability.

The reference's instrumentation is ``util::measureTime`` — a gettimeofday
stopwatch wrapped around pose estimation and loop-closure matching
(``src/ExternVariable.h:238-266``, ``src/ImageFunc.cpp:52-53``,
``src/GlobalOptimize.cpp:157-170,254-258``) — plus printf counters.  Here
the same stopwatch exists (`Stopwatch`), but the first-class tool is a
stage profiler that understands JAX's async dispatch: naive wall-clock
around a jitted call measures dispatch, not compute, so `StageTimer`
block-untils on the stage's outputs before stopping the clock, and
`trace` wraps ``jax.profiler`` for XLA-level traces viewable in
TensorBoard/Perfetto.  `Meters` aggregates the frames/s(/chip) counters
the BASELINE metrics ask for."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, List, Optional

import jax


class Stopwatch:
    """util::measureTime (ExternVariable.h:238-266): start/stop in ms."""

    def __init__(self):
        self._t0 = 0.0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float) -> None:
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)

    @property
    def mean_s(self) -> float:
        return self.total_s / max(self.count, 1)


@dataclass
class StageTimer:
    """Per-stage wall-clock aggregation with correct async semantics:
    ``stage(...)`` is a context manager; pass the stage's device outputs
    to ``sync`` (or let the context call ``block_until_ready`` on the
    value you register) so the measured time covers the actual compute."""

    stats: Dict[str, StageStats] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None) -> Iterator[List[Any]]:
        out: List[Any] = []
        t0 = time.perf_counter()
        try:
            yield out
        finally:
            for v in (list(out) + ([sync] if sync is not None else [])):
                try:
                    jax.block_until_ready(v)
                except Exception:
                    pass
            self.stats.setdefault(name, StageStats()).add(
                time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stats.items(),
                              key=lambda kv: -kv[1].total_s):
            lines.append(f"{name:<28s} n={s.count:5d}  "
                         f"mean={s.mean_s * 1e3:8.2f}ms  "
                         f"total={s.total_s:7.2f}s")
        return "\n".join(lines)


@dataclass
class Meters:
    """Throughput counters for the BASELINE metrics (frames/s/chip)."""
    frames: int = 0
    keyframes: int = 0
    loop_edges: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def frames_per_second(self) -> float:
        return self.frames / max(time.perf_counter() - self._t0, 1e-9)

    def frames_per_second_per_chip(self) -> float:
        return self.frames_per_second() / max(jax.local_device_count(), 1)

    def as_dict(self) -> Dict[str, float]:
        return {"frames": self.frames, "keyframes": self.keyframes,
                "loop_edges": self.loop_edges,
                "fps": self.frames_per_second(),
                "fps_per_chip": self.frames_per_second_per_chip()}


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """XLA-level profiler trace (jax.profiler) when ``log_dir`` is given;
    no-op otherwise.  View with TensorBoard or Perfetto."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
