"""Benchmark: tracked frames/s on one chip at the reference resolution.

Prints exactly one JSON line:
  {"metric": "tracked_frames_per_s", "value": N, "unit": "frames/s",
   "vs_baseline": R}

The workload is the full per-frame pipeline at the reference's working
resolution (480x270, ExternVariable.h:50-51): multi-scale GN tracking +
epipolar depth observation + regularization + depth-image rebuild, with a
keyframe propagation every 8 frames — i.e. the steady-state cost of
``main.cpp``'s frame loop, dispatched the way the production runner
dispatches it (one jitted scan per keyframe interval).

Measurement honesty (hard-won, round 2): on the TPU-tunnel runtime,
``jax.block_until_ready`` does NOT wait for real execution until the
process has performed at least one device->host *read*; before that,
dispatches are deferred and timings are fiction (BASELINE.md "perf
notes").  This bench therefore (a) forces the runtime into honest
synchronous mode with a scalar read before any timing, and (b) reads real
output bytes inside the timed region, so the reported frames/s is the
true sustained rate a consumer of the poses would see.  Frame rendering
happens in a subprocess that writes an npz cache so render dispatches
can't pollute the measured process.

Baseline: the measured speed of the reference C++ binary (built via
reference_build/build_reference.sh, timed by tools/bench_reference.py on
this machine's CPU over the same synthetic sequence).  Override with
BASELINE_FPS env var.  See BASELINE.md "Measured" for provenance.
"""

import json
import os
import subprocess
import sys
import time

# Measured reference throughput (frames/s) of the unmodified ELLC C++
# binary in default GN mode on this machine (see BASELINE.md).  Falls back
# to the 30 fps real-time design point if the measured row is absent.
_DEFAULT_BASELINE = 30.0
_MEASURED_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "reference_build", "reference_fps.json")

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_frames.npz")
N_FRAMES = 129           # 16 keyframe intervals + the init frame


def _baseline_fps() -> float:
    if os.environ.get("BASELINE_FPS"):
        return float(os.environ["BASELINE_FPS"])
    try:
        with open(_MEASURED_FILE) as f:
            return float(json.load(f)["reference_fps"])
    except (OSError, KeyError, ValueError):
        return _DEFAULT_BASELINE


def _render_frames() -> None:
    """Subprocess entry: render the synthetic sequence and cache it."""
    import jax
    import numpy as np

    from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
    from egomotion_with_local_loop_closures_tpu.utils import synthetic

    cfg = ELLCConfig()
    fx, fy, cx, cy = cfg.level_intrinsics(0)
    scene = synthetic.make_room_scene(seed=0, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    poses = synthetic.trajectory(N_FRAMES, seed=0, rot_step=0.0015,
                                 trans_step=0.02)
    render = jax.jit(lambda p: synthetic.render(
        scene, p, cfg.rows, cfg.cols, fx, fy, cx, cy)[0])
    frames = np.stack([np.asarray(render(p)) for p in poses])
    np.savez(CACHE + ".tmp.npz", frames=frames)
    os.replace(CACHE + ".tmp.npz", CACHE)


def main() -> int:
    if "--render-only" in sys.argv:
        _render_frames()
        return 0

    if not os.path.exists(CACHE):
        env = dict(os.environ)
        env.setdefault("PYTHONPATH",
                       os.path.dirname(os.path.abspath(__file__)))
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--render-only"], check=True, env=env)

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
    from egomotion_with_local_loop_closures_tpu.runtime import pipeline

    # force the tunnel runtime into honest synchronous execution BEFORE
    # any timing: without a device->host read, block_until_ready returns
    # without waiting for real execution (BASELINE.md perf notes)
    _ = float(jnp.asarray(1.0) + 1.0)

    cfg = ELLCConfig()
    K = cfg.keyframe_interval
    frames_np = np.load(CACHE)["frames"]
    frames = jnp.asarray(frames_np)
    n_intervals = (frames_np.shape[0] - 1) // K

    state0 = pipeline.init_pipeline(frames[0], jax.random.PRNGKey(0), cfg)

    # production dispatch shape: one jitted step per interval, slicing the
    # device-resident clip in-jit (no per-interval host uploads)
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step_at(st, buf, i, cfg):
        imgs = jax.lax.dynamic_slice_in_dim(buf, i, cfg.keyframe_interval)
        return pipeline.process_interval(st, imgs, cfg)

    st, outs, _ = step_at(state0, frames, jnp.int32(1), cfg)
    _ = np.asarray(outs.pose_wrt_world)      # real read: warmup + sync

    passes = int(os.environ.get("BENCH_PASSES", "2"))
    n_frames = 0
    t0 = time.perf_counter()
    for _ in range(passes):
        # restart from the init state each pass so every timed interval
        # exercises steady-state tracking (replaying frame 1 against
        # end-of-sequence state would spend the pass in the recovery
        # regime; compute is fixed-shape either way, but steady state is
        # the honest workload)
        st = state0
        for i in range(n_intervals):
            st, outs, _ = step_at(st, frames, jnp.int32(1 + i * K), cfg)
            n_frames += K
    # read real bytes so deferred execution cannot fake the clock
    _ = np.asarray(outs.pose_wrt_world)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    baseline = _baseline_fps()
    print(json.dumps({
        "metric": "tracked_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3),
        # provenance: the baseline is the unmodified 6-thread reference
        # C++ binary measured on THIS machine's 2 vCPUs (thread-starved;
        # see reference_build/reference_fps.json) — the ratio therefore
        # mixes algorithm/hardware wins with baseline CPU starvation
        "baseline_fps": round(baseline, 2),
        "baseline_note": "reference C++ binary, 6 threads on 2 vCPUs",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
