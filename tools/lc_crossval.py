"""Cross-validate loop-closure edges against the unmodified reference binary.

The reference's LC bootstrap batch (``ELLC LC <config>`` with
FLAG_IS_BOOTSTRAP=1) is the only LC configuration that runs without the
MATLAB half of the pipeline: checkExitCondition (ToggleFlags.h:108-134)
switches straight to GN with ``loopClosureFlag(true)``, tracks BATCH_SIZE
keyframe propagations, and terminates.  While tracking, every keyframe
push runs findMatchParallel (GlobalOptimize.cpp:274-416) and each accepted
match appends a line to ``matchframes_globalopt.txt``
(GlobalOptimize.cpp:574-582):

    frameId matchedId pose6(poseWrtMatched) rescale seeds KL rms viewAngle

This tool

1. writes the LC config, runs the reference binary on the shared
   ``frames_480x270.npz`` input (built by tools/make_reference_input.py),
2. runs this framework's ``_track_batch`` + ``LoopCloser`` on the SAME
   480x270 floats over the same batch,
3. diffs the two edge lists: pair sets, KL values on common pairs, and
   rematch-pose rotation deltas.

Usage: python tools/lc_crossval.py [--run-dir reference_build/run]
       [--batch-size 10] [--skip-reference] (reuse an existing
       matchframes_globalopt.txt)
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np


def run_reference(run_dir: str, batch_size: int) -> str:
    """Drive the reference binary in LC bootstrap mode; returns the path
    of the matchframes_globalopt.txt it wrote."""
    bin_dir = os.path.join(run_dir, "bin")
    os.makedirs(bin_dir, exist_ok=True)
    ellc = os.path.abspath(
        os.path.join(os.path.dirname(run_dir.rstrip("/")), "build", "ELLC"))
    cfg_path = os.path.join(bin_dir, "lc_config.txt")
    with open(cfg_path, "w") as f:
        # BATCH_START_ID BATCH_SIZE FLAG_IS_BOOTSTRAP (main.cpp:134-137)
        f.write(f"1 {batch_size} 1\n")
    out = os.path.join(run_dir, "outputs", "matchframes_globalopt.txt")
    if os.path.exists(out):
        os.remove(out)
    print(f"running reference: {ellc} LC lc_config.txt (cwd {bin_dir})",
          flush=True)
    res = subprocess.run([ellc, "LC", "lc_config.txt"], cwd=bin_dir,
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL, timeout=3600)
    print(f"reference exited {res.returncode}")
    if not os.path.exists(out):
        raise SystemExit("reference wrote no matchframes_globalopt.txt")
    return out


def load_reference_edges(path: str) -> list:
    rows = []
    with open(path) as f:
        for ln in f:
            parts = ln.split()
            if len(parts) >= 13:
                rows.append({
                    "frame": int(float(parts[0])),
                    "matched": int(float(parts[1])),
                    "pose": np.asarray([float(v) for v in parts[2:8]]),
                    "rescale": float(parts[8]), "seeds": float(parts[9]),
                    "kl": float(parts[10]), "rms": float(parts[11]),
                    "angle": float(parts[12])})
    return rows


def run_ours(frames_npz: str, batch_size: int, seed: int) -> list:
    import jax
    import jax.numpy as jnp

    from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
    from egomotion_with_local_loop_closures_tpu.loop import closure
    from egomotion_with_local_loop_closures_tpu.runtime import pipeline
    from egomotion_with_local_loop_closures_tpu.runtime.ellc_lc import \
        _track_batch

    # the reference's LC bootstrap turns loop closure on
    # (loopClosureFlag(true), ToggleFlags.h:126); do_loop_closure makes
    # process_interval produce the keyframe snapshots the closer consumes
    cfg = ELLCConfig(do_loop_closure=True)
    frames = np.load(frames_npz)["frames"]
    # batch starting at frame 1: first interval is K-1 frames, keyframes
    # at K, 2K, ... — identical ids to the reference (main.cpp:404)
    n = batch_size * cfg.keyframe_interval - 1
    if len(frames) < n + 1:
        raise SystemExit(f"need {n + 1} frames, have {len(frames)}")
    state = pipeline.init_pipeline(jnp.asarray(frames[0]),
                                   jax.random.PRNGKey(seed), cfg)
    closer = closure.LoopCloser(cfg)
    _track_batch(state, list(frames[1:n + 1]), 1, cfg, closer)
    return [{"frame": e.frame_id, "matched": e.matched_kf_id,
             "pose": np.asarray(e.pose_wrt_matched), "rescale": e.rescale,
             "seeds": e.seeds, "kl": e.match_value, "rms": e.rms_error,
             "angle": e.view_angle} for e in closer.edges]


def main() -> int:
    ap = argparse.ArgumentParser()
    # separate dir from the GN-mode parity run (run_gn): the two modes'
    # outputs/poses_orig.txt would otherwise clobber each other
    ap.add_argument("--run-dir", default="reference_build/run_lc")
    ap.add_argument("--batch-size", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    out = os.path.join(args.run_dir, "outputs", "matchframes_globalopt.txt")
    if not args.skip_reference:
        out = run_reference(args.run_dir, args.batch_size)
    ref = load_reference_edges(out)
    ours = run_ours(os.path.join(args.run_dir, "frames_480x270.npz"),
                    args.batch_size, args.seed)

    # Keyframe ids match the reference exactly since round 4 (the first
    # interval tracks K-1 frames, so keyframes are 8, 16, 24... on both
    # sides — main.cpp:404 convention); edge pairs compare directly.
    ref_pairs = {(r["frame"], r["matched"]): r for r in ref}
    our_pairs = {(r["frame"], r["matched"]): r for r in ours}
    common = sorted(set(ref_pairs) & set(our_pairs))
    only_ref = sorted(set(ref_pairs) - set(our_pairs))
    only_ours = sorted(set(our_pairs) - set(ref_pairs))

    print(f"\nreference edges: {len(ref)}   ours: {len(ours)}   "
          f"common pairs: {len(common)}")
    print(f"only-reference: {only_ref}")
    print(f"only-ours:      {only_ours}")

    if common:
        kl_d, rot_d, ang_d = [], [], []
        print(f"\n{'pair':>12} {'KL ref':>8} {'KL ours':>8} "
              f"{'rot delta deg':>13} {'angle ref/ours':>15}")
        for p in common:
            r, o = ref_pairs[p], our_pairs[p]
            drot = float(np.linalg.norm(r["pose"][:3] - o["pose"][:3]))
            drot_deg = np.degrees(drot)
            kl_d.append(abs(r["kl"] - o["kl"]))
            rot_d.append(drot_deg)
            ang_d.append(abs(r["angle"] - o["angle"]))
            print(f"{str(p):>12} {r['kl']:8.4f} {o['kl']:8.4f} "
                  f"{drot_deg:13.3f} {r['angle']:7.2f}/{o['angle']:.2f}")
        print(f"\nKL |delta|   mean {np.mean(kl_d):.4f}  max {np.max(kl_d):.4f}")
        print(f"rematch rot  mean {np.mean(rot_d):.3f} deg  "
              f"max {np.max(rot_d):.3f} deg")
        print(f"view angle   mean {np.mean(ang_d):.3f} deg  "
              f"max {np.max(ang_d):.3f} deg")
    return 0


if __name__ == "__main__":
    sys.exit(main())
