"""Benchmark the production LC mode (GN <-> rotation-averaging) end-to-end.

The reference's production configuration is the ``bin/ELLC_LC.sh`` loop:
GN-track a batch, MATLAB-average its keyframe rotations, re-track the
batch from saved depth with corrected rotation inits ({5,1,1,1} iters,
ToggleFlags.h:34-46), repeat.  ``runtime/ellc_lc.run_ellc_lc`` is the
in-process equivalent; this bench reports its sustained frames/s over a
sequence — including the replay double-tracking, the RA solves, the loop
window pushes, and the final Sim(3) BA when enabled — next to the plain
GN rate on the same frames, so the LC-mode overhead is a measured number
rather than a guess.

Honesty (BASELINE.md perf notes): a device->host scalar read forces the
tunnel runtime synchronous before timing; pass 1 warms every jit variant
(GN + replay + RA + rematch shapes), pass 2 is timed.

Usage: python tools/bench_lc.py [frames.npz] [n_frames]
       (default: the parity input; falls back to .bench_frames.npz)
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_ = float(jnp.asarray(1.0) + 1.0)       # honest sync mode

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig  # noqa
from egomotion_with_local_loop_closures_tpu.runtime import ellc_lc, runner  # noqa


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default = os.path.join(repo, "reference_build/run/frames_480x270.npz")
    fallback = os.path.join(repo, ".bench_frames.npz")
    path = sys.argv[1] if len(sys.argv) > 1 else (
        default if os.path.exists(default) else fallback)
    frames = np.load(path)["frames"]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else len(frames)
    frames = frames[:n]
    cfg = ELLCConfig()

    # --- plain GN reference point on the same frames ---
    t0 = time.perf_counter()
    res_gn = runner.run_sequence(iter(frames), cfg)
    warm_gn = time.perf_counter() - t0
    t0 = time.perf_counter()
    res_gn = runner.run_sequence(iter(frames), cfg)
    dt_gn = time.perf_counter() - t0
    fps_gn = len(res_gn.frame_ids) / dt_gn

    # --- LC mode (pass 1 compiles, pass 2 timed) ---
    t0 = time.perf_counter()
    res = ellc_lc.run_ellc_lc(iter(frames), cfg)
    warm_lc = time.perf_counter() - t0
    stats = {}
    t0 = time.perf_counter()
    res = ellc_lc.run_ellc_lc(iter(frames), cfg, stats=stats)
    dt_lc = time.perf_counter() - t0
    fps_lc = len(res.frame_ids) / dt_lc

    print(json.dumps({
        "metric": "lc_mode_frames_per_s",
        "value": round(fps_lc, 2), "unit": "frames/s",
        "frames": int(len(res.frame_ids)),
        "batches": res.num_batches,
        "loop_edges": res.num_loop_edges,
        "gn_mode_fps_same_frames": round(fps_gn, 2),
        "lc_overhead_factor": round(fps_gn / fps_lc, 2),
        "warmup_s": {"gn": round(warm_gn, 1), "lc": round(warm_lc, 1)},
        "phase_s": {k: round(v, 2) for k, v in sorted(stats.items())},
        "note": "LC tracks every batch twice (GN + {5,1,1,1} replay, "
                "ToggleFlags.h:34-46) plus RA + loop-window pushes",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
