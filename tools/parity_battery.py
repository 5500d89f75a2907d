"""Multi-scene, multi-seed trajectory-parity battery vs the reference binary.

Round-4 verdict: every fidelity claim rested on ONE synthetic scene.  This
driver sweeps scenes x seeds, running the full identical-input protocol per
combination:

  1. tools/make_reference_input.py --scene S --seed K   (render + the
     reference's exact JPEG->gray->undistort->resize ingest)
  2. the unmodified reference binary in GN mode (tools/run_reference.py)
  3. this framework on the same 480x270 floats (tools/parity_eval.py,
     optionally with --glibc-init for bit-matched bootstrap depth)
  4. collect per-combination RPE/ATE/seeds/survival into one table.

The HUJI EgoSeg dataset the paper evaluates on is not in the container and
there is no network; this battery is the strongest achievable proxy: same
binary, same bytes in, trajectory out.

Usage:
  python tools/parity_battery.py [--scenes base,lowtex,fastrot,revisit]
      [--seeds 0,1,2] [--frames 420] [--glibc-init] [--json out.json]
      [--skip-existing]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def sh(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    return subprocess.run(cmd, check=True, cwd=REPO, **kw)


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
    args = ap.parse_args()

    rows = []
    for scene in args.scenes.split(","):
        for seed in (int(s) for s in args.seeds.split(",")):
            tag = f"{scene}_s{seed}"
            run_dir = os.path.join(args.root, tag)
            npz = os.path.join(run_dir, "frames_480x270.npz")
            if not (args.skip_existing and os.path.exists(npz)):
                sh([sys.executable, "tools/make_reference_input.py",
                    "--frames", str(args.frames), "--out", run_dir,
                    "--seed", str(seed), "--scene", scene])
            ref_poses = os.path.join(run_dir + "_gn", "outputs",
                                     "poses_orig.txt")
            if not (args.skip_existing and os.path.exists(ref_poses)):
                sh([sys.executable, "tools/run_reference.py", "gn",
                    "--input", run_dir, "--out", run_dir + "_gn"])
            cmd = [sys.executable, "tools/parity_eval.py",
                   "--input", run_dir + "_gn", "--json"]
            if args.glibc_init:
                cmd.append("--glibc-init")
            out = subprocess.run(cmd, check=True, cwd=REPO,
                                 capture_output=True, text=True)
            res = json.loads(out.stdout.strip().splitlines()[-1])
            res["scene"] = scene
            res["seed"] = seed
            rows.append(res)
            print(json.dumps(res), flush=True)

    # summary table (markdown, pasted into BASELINE.md)
    print("\n| scene | seed | ref survives | ours survives | RPE-8f mean / "
          "p95 / max (deg) | ATE | seeds% ref / ours |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        rpe = r.get("rpe_rot_8f", {})
        print(f"| {r['scene']} | {r['seed']} | "
              f"{r['reference_tracks_until']} | {r['ours_tracks_until']} | "
              f"{rpe.get('mean_deg', float('nan')):.2f} / "
              f"{rpe.get('p95_deg', float('nan')):.2f} / "
              f"{rpe.get('max_deg', float('nan')):.2f} | "
              f"{r['ate_sim3_aligned']:.3f} | "
              f"{r['seeds_reference_mean']:.1f} / "
              f"{r['seeds_ours_mean']:.1f} |")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print("wrote", args.json)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
