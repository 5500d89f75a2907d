"""Command-line entry point.

Usage:
    python -m egomotion_with_local_loop_closures_tpu.runtime.cli \
        --frames <image_dir> --out <out_dir> [--max-frames N]
    python -m egomotion_with_local_loop_closures_tpu.runtime.cli \
        --synthetic N --out <out_dir> [--rows R --cols C]
    python -m ...runtime.cli --synthetic N --out <out_dir> --lc

Replaces invoking the reference binary: default mode = plain GN tracking
(``ELLC``, src/main.cpp:76-88), ``--lc`` = the alternating GN / rotation-
averaging pipeline (``ELLC LC ../config.txt`` + the MATLAB batch loop of
bin/ELLC_LC.sh, run in-process — no process restarts or text-file state).
Writes ``poses_orig.txt`` / ``matchframes.txt`` (+ ``poses_corrected.txt``
and ``poses_sim3.txt`` in LC mode) in the reference formats.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="ELLC-TPU sequence runner")
    ap.add_argument("--frames", help="directory of image frames")
    ap.add_argument("--video", help="video file (decoded like the "
                    "reference: resize 1/4, BGR->gray)")
    ap.add_argument("--skip", type=int, default=0,
                    help="fast-forward N frames before tracking "
                         "(the reference's BATCH_START_ID skip)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="render N synthetic frames instead of reading files")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--cols", type=int, default=None)
    ap.add_argument("--fx", type=float, default=None)
    ap.add_argument("--fy", type=float, default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lc", action="store_true",
                    help="alternating GN/rotation-averaging mode "
                         "(the reference's 'ELLC LC' + MATLAB loop)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
    from egomotion_with_local_loop_closures_tpu.runtime import io as ellc_io
    from egomotion_with_local_loop_closures_tpu.runtime import runner

    cfg = ELLCConfig()
    overrides = {}
    if args.rows:
        overrides["rows"] = args.rows
        overrides["cy"] = args.rows / 2.0
    if args.cols:
        overrides["cols"] = args.cols
        overrides["cx"] = args.cols / 2.0
    if args.fx:
        overrides["fx"] = args.fx
    if args.fy:
        overrides["fy"] = args.fy
    if overrides:
        cfg = cfg.replace(**overrides)

    os.makedirs(args.out, exist_ok=True)

    if args.synthetic:
        import jax.numpy as jnp
        from egomotion_with_local_loop_closures_tpu.utils import synthetic
        if not args.rows:
            cfg = cfg.replace(rows=96, cols=128, fx=110.0, fy=110.0,
                              cx=64.0, cy=48.0)
        scene = synthetic.make_room_scene(seed=args.seed, depth=1.25,
                                          half_width=1.7, half_height=1.15)
        gt = synthetic.trajectory(args.synthetic, seed=args.seed,
                                  rot_step=0.0015, trans_step=0.02)
        fx, fy, cx, cy = cfg.level_intrinsics(0)

        render = jax.jit(lambda p: synthetic.render(
            scene, p, cfg.rows, cfg.cols, fx, fy, cx, cy)[0])

        def frames():
            for p in gt:
                yield render(p)
        src = frames()
        import numpy as np
        np.savetxt(os.path.join(args.out, "poses_gt.txt"),
                   np.asarray(gt), fmt="%.9g")
    elif args.video or args.frames:
        import itertools
        src = (ellc_io.video_frames(args.video, skip=args.skip)
               if args.video else ellc_io.image_dir_frames(args.frames))
        # align the camera model to the actual decoded frame size unless
        # the user pinned it (the reference requires editing
        # ExternVariable.h to match the video; here it is automatic)
        first = next(src)
        h, w = first.shape[:2]
        fixes = {}
        if not args.rows and cfg.rows != h:
            fixes.update(rows=h, cy=h / 2.0)
        if not args.cols and cfg.cols != w:
            fixes.update(cols=w, cx=w / 2.0)
        if fixes:
            cfg = cfg.replace(**fixes)
            print(f"camera model set to decoded frame size {h}x{w}")
        src = itertools.chain([first], src)
    else:
        ap.error("need --video, --frames or --synthetic")

    t0 = time.time()
    if args.lc:
        from egomotion_with_local_loop_closures_tpu.runtime import ellc_lc
        result = ellc_lc.run_ellc_lc(src, cfg, out_dir=args.out,
                                     seed=args.seed,
                                     max_frames=args.max_frames)
        dt = time.time() - t0
        n = len(result.frame_ids)
        print(f"LC mode: {n} corrected poses, {result.num_batches} batches, "
              f"{result.num_loop_edges} loop edges in {dt:.2f}s "
              f"({n / max(dt, 1e-9):.2f} fps)")
    else:
        result = runner.run_sequence(src, cfg, out_dir=args.out,
                                     max_frames=args.max_frames,
                                     seed=args.seed)
        dt = time.time() - t0
        n = len(result.frame_ids)
        print(f"tracked {n} frames in {dt:.2f}s "
              f"({n / max(dt, 1e-9):.2f} fps)")
    print(f"outputs written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
