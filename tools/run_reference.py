"""Run the unmodified reference binary on the shared parity input.

Sets up an isolated run directory per MODE — GN (default Gauss-Newton,
no CLI args, ``/root/reference/src/main.cpp:76-78``) or LC bootstrap
(``ELLC LC <config>`` with FLAG_IS_BOOTSTRAP=1, ``main.cpp:89-137``) — so
one mode's outputs can never clobber the other's (the round-3 failure
VERDICT.md records).  The frame JPEGs live once in the shared input dir
(tools/make_reference_input.py) and are symlinked into each run dir;
everything the binary writes (``../outputs/*.txt``, ``../Test_images``,
``../matches``) stays inside the run dir.

Usage:
  python tools/run_reference.py gn           -> reference_build/run_gn
  python tools/run_reference.py lc           -> reference_build/run_lc
  [--input reference_build/run] [--batch-size 10] [--out DIR]

After this, parity tools consume the artifacts:
  python tools/parity_eval.py --input reference_build/run_gn
  python tools/lc_crossval.py --run-dir reference_build/run_lc --skip-reference
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["gn", "lc"])
    ap.add_argument("--input", default="reference_build/run",
                    help="shared input dir holding data/ and "
                         "frames_480x270.npz")
    ap.add_argument("--out", default=None,
                    help="run dir (default reference_build/run_<mode>)")
    ap.add_argument("--batch-size", type=int, default=10,
                    help="LC bootstrap batch size in KF propagations "
                         "(small_batch_rotavg_bootstrap.m:27)")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ellc = os.path.join(repo, "reference_build", "build", "ELLC")
    if not os.path.exists(ellc):
        raise SystemExit(f"{ellc} missing - run "
                         "reference_build/build_reference.sh first")
    src_data = os.path.abspath(os.path.join(args.input, "data"))
    if not os.path.isdir(src_data):
        raise SystemExit(f"{src_data} missing - run "
                         "tools/make_reference_input.py first")

    run_dir = os.path.abspath(args.out or
                              os.path.join("reference_build",
                                           f"run_{args.mode}"))
    for sub in ("outputs", "Test_images", "matches", "bin"):
        os.makedirs(os.path.join(run_dir, sub), exist_ok=True)
    link = os.path.join(run_dir, "data")
    if os.path.islink(link):
        os.remove(link)
    elif os.path.isdir(link):
        shutil.rmtree(link)
    os.symlink(src_data, link)
    # copy the preprocessed float frames alongside so parity tools can
    # point --input at the run dir alone
    src_npz = os.path.join(args.input, "frames_480x270.npz")
    dst_npz = os.path.join(run_dir, "frames_480x270.npz")
    if os.path.exists(src_npz) and not os.path.exists(dst_npz):
        os.link(src_npz, dst_npz)

    bin_dir = os.path.join(run_dir, "bin")
    if args.mode == "gn":
        cmd = [ellc]
    else:
        cfg_path = os.path.join(bin_dir, "lc_config.txt")
        with open(cfg_path, "w") as f:
            # BATCH_START_ID BATCH_SIZE FLAG_IS_BOOTSTRAP (main.cpp:134-137)
            f.write(f"1 {args.batch_size} 1\n")
        cmd = [ellc, "LC", "lc_config.txt"]

    print(f"running {' '.join(cmd)}  (cwd {bin_dir})", flush=True)
    t0 = time.time()
    res = subprocess.run(cmd, cwd=bin_dir, stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL, timeout=args.timeout)
    dt = time.time() - t0
    poses = os.path.join(run_dir, "outputs", "poses_orig.txt")
    n = sum(1 for _ in open(poses)) if os.path.exists(poses) else 0
    print(f"exit {res.returncode} in {dt:.1f}s; poses_orig.txt: {n} rows"
          f"  ({poses})")
    if n == 0:
        return 1
    if args.mode == "gn" and n > 1:
        fps = (n - 1) / dt
        print(f"reference GN throughput: {fps:.2f} frames/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
