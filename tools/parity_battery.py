"""Multi-scene, multi-seed trajectory-parity battery vs the reference binary.

Round-4 verdict: every fidelity claim rested on ONE synthetic scene.  This
driver sweeps scenes x seeds, running the full identical-input protocol per
combination:

  phase A (CPU, parallel subprocesses):
     1. tools/make_reference_input.py --scene S --seed K   (render + the
        reference's exact JPEG->gray->undistort->resize ingest)
     2. the unmodified reference binary in GN mode (tools/run_reference.py)
  phase B (one TPU process, jit warmup paid ONCE for all combos):
     3. parity_eval.evaluate() on the same 480x270 floats (optionally with
        --glibc-init for bit-matched bootstrap depth)
     4. collect per-combination RPE/ATE/seeds/survival into one table.

The HUJI EgoSeg dataset the paper evaluates on is not in the container and
there is no network; this battery is the strongest achievable proxy: same
binary, same bytes in, trajectory out.

Usage:
  python tools/parity_battery.py [--scenes base,lowtex,fastrot,revisit]
      [--seeds 0,1,2] [--frames 420] [--glibc-init] [--json out.json]
      [--skip-existing] [--jobs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _prepare_combo(scene: str, seed: int, frames: int, root: str,
                   skip_existing: bool) -> str:
    """Phase A for one combo: render input + run the reference binary.
    Runs the renderer on CPU (JAX_PLATFORMS=cpu) so phase A never contends
    with the single TPU chip.  Returns the reference run dir."""
    tag = f"{scene}_s{seed}"
    run_dir = os.path.join(root, tag)
    # a fully-prepared (possibly symlinked, e.g. base_s0 -> the original
    # 520-frame parity run) _gn dir short-circuits the whole combo
    if (skip_existing
            and os.path.exists(os.path.join(run_dir + "_gn", "outputs",
                                            "poses_orig.txt"))
            and os.path.exists(os.path.join(run_dir + "_gn",
                                            "frames_480x270.npz"))):
        return run_dir + "_gn"
    npz = os.path.join(run_dir, "frames_480x270.npz")
    env = dict(os.environ)
    env.setdefault("ELLC_PLATFORM", "cpu")
    if not (skip_existing and os.path.exists(npz)):
        subprocess.run([sys.executable, "tools/make_reference_input.py",
                        "--frames", str(frames), "--out", run_dir,
                        "--seed", str(seed), "--scene", scene],
                       check=True, cwd=REPO, env=env)
    ref_poses = os.path.join(run_dir + "_gn", "outputs", "poses_orig.txt")
    if not (skip_existing and os.path.exists(ref_poses)):
        subprocess.run([sys.executable, "tools/run_reference.py", "gn",
                        "--input", run_dir, "--out", run_dir + "_gn"],
                       check=True, cwd=REPO, env=env)
    return run_dir + "_gn"


def summarize(rows: list[dict]) -> str:
    lines = ["| scene | seed | ref survives | ours survives | RPE-8f mean / "
             "p95 / max (deg) | ATE | seeds% ref / ours |",
             "|---|---|---|---|---|---|---|"]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['scene']} | {r['seed']} | "
                         f"ERROR: {r['error']} |||||")
            continue
        rpe = r.get("rpe_rot_8f", {})
        lines.append(
            f"| {r['scene']} | {r['seed']} | "
            f"{r['reference_tracks_until']} | {r['ours_tracks_until']} | "
            f"{rpe.get('mean_deg', float('nan')):.2f} / "
            f"{rpe.get('p95_deg', float('nan')):.2f} / "
            f"{rpe.get('max_deg', float('nan')):.2f} | "
            f"{r['ate_sim3_aligned']:.3f} | "
            f"{r['seeds_reference_mean']:.1f} / "
            f"{r['seeds_ours_mean']:.1f} |")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="base,lowtex,fastrot,revisit")
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--frames", type=int, default=420)
    ap.add_argument("--glibc-init", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-existing", action="store_true",
                    help="reuse input/reference artifacts already present")
    ap.add_argument("--root", default="reference_build/battery")
    ap.add_argument("--jobs", type=int, default=4,
                    help="phase-A parallelism (render + reference binary)")
    ap.add_argument("--phase", choices=["all", "prepare", "eval"],
                    default="all")
    args = ap.parse_args()

    combos = [(scene, int(seed))
              for scene in args.scenes.split(",")
              for seed in args.seeds.split(",")]

    if args.phase in ("all", "prepare"):
        from concurrent.futures import ProcessPoolExecutor
        t0 = time.time()
        with ProcessPoolExecutor(max_workers=args.jobs) as ex:
            futs = {ex.submit(_prepare_combo, sc, sd, args.frames,
                              args.root, args.skip_existing): (sc, sd)
                    for sc, sd in combos}
            for f, (sc, sd) in futs.items():
                f.result()
                print(f"prepared {sc}_s{sd}", flush=True)
        print(f"phase A done in {time.time()-t0:.0f}s", flush=True)
    if args.phase == "prepare":
        return 0

    sys.path.insert(0, HERE)
    from parity_eval import evaluate

    rows = []
    for scene, seed in combos:
        run_dir = os.path.join(args.root, f"{scene}_s{seed}_gn")
        t0 = time.time()
        try:
            res = evaluate(run_dir, glibc_init=args.glibc_init)
        except Exception as e:                      # keep the sweep going
            res = {"error": f"{type(e).__name__}: {e}"}
        res["scene"] = scene
        res["seed"] = seed
        res["eval_s"] = round(time.time() - t0, 1)
        rows.append(res)
        print(json.dumps(res), flush=True)

    print("\n" + summarize(rows))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print("wrote", args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
