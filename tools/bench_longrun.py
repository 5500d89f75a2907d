"""Long-video scale proof: thousands of frames, bounded memory,
mid-run checkpoint/resume, and a final large-graph Sim(3) BA.

The reference caps a run at 32,500 frames (main.cpp:174-175) and scales
by batch-restarting the process from text files; this driver proves the
TPU pipeline sustains the same regime in one process:

1. stream N synthetic frames (rendered on the fly — never materialized
   as a whole; host memory stays O(window));
2. run GN tracking with the loop-closure window active
   (runner.run_sequence, checkpointing every ``ckpt_every`` intervals);
3. KILL the run at ~N/2 (max_frames), then RESUME from the newest
   checkpoint and finish — exercising the production restart path
   (the reference's analog: relaunch at BATCH_START_ID,
   main.cpp:156-166);
4. build the full keyframe Sim(3) graph (odometry chain + loop edges)
   and refine it with graph/ba.py — the O(E+N) PCG solver, plus the
   edge-sharded variant on an 8-device CPU mesh in a subprocess.

Prints one JSON line with frames/s, node/edge counts, BA timings, and
the (constant) device-state footprint.

Usage: python tools/bench_longrun.py [n_frames] [--no-resume-split]
"""
import json
import os
import subprocess
import sys
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np

_ = float(jnp.asarray(1.0) + 1.0)          # honest sync mode

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig  # noqa
from egomotion_with_local_loop_closures_tpu.geom import lie  # noqa
from egomotion_with_local_loop_closures_tpu.graph import ba, sim3  # noqa
from egomotion_with_local_loop_closures_tpu.runtime import runner  # noqa
from egomotion_with_local_loop_closures_tpu.utils import synthetic  # noqa

SHARDED_SNIPPET = """
import sys, time, os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from egomotion_with_local_loop_closures_tpu.graph import ba
from egomotion_with_local_loop_closures_tpu.graph.sim3 import Sim3Graph
d = np.load(sys.argv[1])
g = Sim3Graph(nodes=jnp.asarray(d["nodes"]), edges=jnp.asarray(d["edges"]),
              meas=jnp.asarray(d["meas"]), weights=jnp.asarray(d["weights"]))
from jax.sharding import Mesh
import numpy as onp
m = Mesh(onp.asarray(jax.devices()[:8]).reshape(8), ("edge",))
out = ba.refine_sharded(g, m, axis="edge", num_iters=10, cg_iters=25)
_ = float(np.asarray(out.rms_history)[-1])           # compile + run
t0 = time.perf_counter()
out = ba.refine_sharded(g, m, axis="edge", num_iters=10, cg_iters=25)
rms = float(np.asarray(out.rms_history)[-1])
dt = time.perf_counter() - t0
print(f"SHARDED {dt:.3f} {rms:.6f}")
"""


def frame_stream(n, cfg, scene, poses):
    fx, fy, cx, cy = cfg.level_intrinsics(0)
    render = jax.jit(lambda p: synthetic.render(
        scene, p, cfg.rows, cfg.cols, fx, fy, cx, cy)[0])
    for i in range(n):
        yield np.asarray(render(jnp.asarray(poses[i])))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and not \
        sys.argv[1].startswith("-") else 5200
    split = "--no-resume-split" not in sys.argv
    cfg = ELLCConfig(do_loop_closure=True)
    scene = synthetic.make_room_scene(seed=0, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    poses = synthetic.loop_trajectory(n, seed=0)

    ckpt_dir = tempfile.mkdtemp(prefix="ellc_longrun_ckpt_")
    t0 = time.perf_counter()
    if split:
        # phase 1: run to ~N/2, checkpointing, then abandon the process
        # state (the RunResult is discarded — only the checkpoint
        # survives, as after a crash)
        half = (n // 2 // cfg.keyframe_interval) * cfg.keyframe_interval
        r1 = runner.run_sequence(frame_stream(n, cfg, scene, poses), cfg,
                                 checkpoint_dir=ckpt_dir,
                                 checkpoint_every=4, max_frames=half)
        # phase 2: resume from the checkpoint and finish the sequence
        r2 = runner.run_sequence(frame_stream(n, cfg, scene, poses), cfg,
                                 checkpoint_dir=ckpt_dir,
                                 checkpoint_every=4, resume=True)
        results = [r1, r2]
    else:
        results = [runner.run_sequence(frame_stream(n, cfg, scene, poses),
                                       cfg, checkpoint_dir=ckpt_dir,
                                       checkpoint_every=4)]
    dt_track = time.perf_counter() - t0
    n_tracked = sum(len(r.frame_ids) for r in results)
    fps = n_tracked / dt_track

    # --- assemble the global keyframe Sim(3) graph ---
    ids = np.concatenate([r.frame_ids for r in results])
    world = np.concatenate([r.world_poses for r in results])
    rescales = np.concatenate([r.rescales for r in results])
    K = cfg.keyframe_interval
    kf_mask = ids % K == 0
    kf_ids = ids[kf_mask]
    kf_poses = world[kf_mask]
    id2node = {int(f): k for k, f in enumerate(kf_ids)}
    lc = []
    for r in results:
        for e in r.extra.get("loop_edges", []):
            i = id2node.get(int(e.matched_kf_id))
            j = id2node.get(int(e.frame_id))
            if i is not None and j is not None:
                lc.append((i, j, np.asarray(e.pose_wrt_matched, np.float32)))
    g = sim3.graph_from_trajectory(kf_poses, rescales[kf_mask],
                                   loop_edges=lc)

    # --- single-device BA (production path, runtime/ellc_lc.py) ---
    out = ba.refine(g, num_iters=10, cg_iters=25)
    _ = float(np.asarray(out.rms_history)[-1])
    t0 = time.perf_counter()
    out = ba.refine(g, num_iters=10, cg_iters=25)
    rms = float(np.asarray(out.rms_history)[-1])
    dt_ba = time.perf_counter() - t0

    # --- edge-sharded BA on a virtual 8-device CPU mesh (subprocess:
    # the parent process is bound to the TPU platform) ---
    sharded_line = None
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, nodes=np.asarray(g.nodes),
                 edges=np.asarray(g.edges), meas=np.asarray(g.meas),
                 weights=np.asarray(g.weights))
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        p = subprocess.run([sys.executable, "-c", SHARDED_SNIPPET, f.name],
                           capture_output=True, text=True, timeout=1800,
                           env=env)
        for ln in p.stdout.splitlines():
            if ln.startswith("SHARDED"):
                sharded_line = ln.split()
    ckpt_files = sorted(os.listdir(ckpt_dir))
    # the checkpoint serializes the FULL pipeline state — its size is the
    # bounded device-state footprint, constant in sequence length
    ckpt_bytes = max((os.path.getsize(os.path.join(ckpt_dir, f))
                      for f in ckpt_files), default=0)

    print(json.dumps({
        "metric": "longrun",
        "frames": int(n_tracked), "wall_s": round(dt_track, 1),
        "frames_per_s": round(fps, 2),
        "resume_split": split,
        "checkpoints_kept": len(ckpt_files),
        "pipeline_state_bytes": ckpt_bytes,
        "kf_nodes": int(len(kf_ids)), "edges": int(g.edges.shape[0]),
        "loop_edges": len(lc),
        "ba_10gn_s": round(dt_ba, 3),
        "ba_iters_per_s": round(10.0 / dt_ba, 2),
        "ba_final_rms": round(rms, 6),
        "ba_sharded_8dev_s": (round(float(sharded_line[1]), 3)
                              if sharded_line else None),
        "ba_sharded_final_rms": (round(float(sharded_line[2]), 6)
                                 if sharded_line else None),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
