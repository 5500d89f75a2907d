"""Trajectory parity vs the unmodified reference binary on identical input.

The round-2 harness built the reference (reference_build/build_reference.sh),
rendered identical input (tools/make_reference_input.py) and ran the binary
(reference_build/run/bin/ELLC) to produce poses_orig.txt — the per-frame
world poses written by /root/reference/src/main.cpp:361-384.  This script
runs the SAME 480x270 float frames through runner.run_sequence and reports:

  * rotation error stats (CompareRotations.m semantics) over the window
    where the reference itself still tracks (its seeds column > 0 and
    rescale finite — the reference loses tracking partway through the
    synthetic sequence),
  * similarity-aligned ATE-RMSE over the same window,
  * segment-wise relative-pose error (RPE) over 1-interval and 5-interval
    windows, which factors out the bootstrap depth-init divergence
    (different RNG for initializeRandomly, DepthPropagation.cpp:145-184),
  * a seeds% (depth occupancy) trajectory comparison — the depth
    subsystem's behavioural fingerprint.

Usage: python tools/parity_eval.py [--input reference_build/run]
       [--max-frames N] [--out parity_curves.npz] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def load_reference(path: str):
    """poses_orig.txt rows: frameId kfId wx wy wz vx vy vz rescale seeds
    (main.cpp:361-384, README.md:83-88)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 10:
                continue
            rows.append([float(p) if p != "-nan" and p != "nan"
                         else np.nan for p in parts])
    a = np.asarray(rows)
    return {"frame_id": a[:, 0].astype(int), "kf_id": a[:, 1].astype(int),
            "pose": a[:, 2:8], "rescale": a[:, 8], "seeds": a[:, 9]}


def rotmats(poses6):
    from egomotion_with_local_loop_closures_tpu.geom import lie
    import jax.numpy as jnp
    T = lie.exp_se3(jnp.asarray(poses6))
    return np.asarray(T[..., :3, :3])


def angle_deg(Ra, Rb):
    """Geodesic angle between rotation arrays (N,3,3)."""
    tr = np.einsum("nij,nij->n", Ra, Rb)
    c = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(c))


def rpe_rotation(Ra, Rb, L):
    """Relative-pose rotation error over windows of length L frames:
    angle( (Ra_i^T Ra_{i+L}),  (Rb_i^T Rb_{i+L}) )."""
    dRa = np.einsum("nji,njk->nik", Ra[:-L], Ra[L:])
    dRb = np.einsum("nji,njk->nik", Rb[:-L], Rb[L:])
    return angle_deg(dRa, dRb)


def evaluate(input_dir: str, max_frames: int | None = None, seed: int = 0,
             no_window_warp: bool = False, glibc_init: bool = False,
             out_npz: str | None = None) -> dict:
    """Run the framework on ``input_dir``'s shared frames and score it
    against the reference binary's poses_orig.txt.  Callable in-process so
    the multi-combination parity battery pays jit warmup ONCE (every
    scene/seed shares the 480x270 shape family) instead of once per
    subprocess."""
    ref = load_reference(os.path.join(input_dir, "outputs",
                                      "poses_orig.txt"))
    frames = np.load(os.path.join(input_dir, "frames_480x270.npz"))["frames"]

    import jax.numpy as jnp  # noqa: F401  (honest-mode read below)
    _ = float(jnp.asarray(1.0) + 1.0)

    from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
    from egomotion_with_local_loop_closures_tpu.runtime import runner
    from egomotion_with_local_loop_closures_tpu.utils import metrics

    cfg = ELLCConfig()
    if no_window_warp:
        cfg = cfg.replace(use_window_warp=False)
    if glibc_init:
        cfg = cfg.replace(bootstrap_rng="glibc")
    # stereo-pool capacity overrides for capacity/fidelity tuning sweeps
    if os.environ.get("PARITY_CAPS"):
        long_f, short_f, short_s = os.environ["PARITY_CAPS"].split(",")
        cfg = cfg.replace(stereo_compact_frac=float(long_f),
                          stereo_short_frac=float(short_f),
                          stereo_short_steps=int(short_s))
    n = max_frames or len(frames)
    res = runner.run_sequence(iter(frames[:n]), cfg, seed=seed)

    # the comparison window: the synthetic sequence has a low-texture
    # section where BOTH systems eventually lose tracking (the reference
    # dies with seeds -> 0 / NaN rescale, main.cpp:361-384 keeps writing
    # rows); dying-frame poses are garbage on either side, so compare
    # only while BOTH still track (seeds > 0, finite)
    ok = np.isfinite(ref["rescale"]) & (ref["seeds"] > 0)
    ref_last = int(ref["frame_id"][ok].max()) if ok.any() else 0
    ours_ok = res.seeds > 0
    ours_last = int(res.frame_ids[ours_ok].max()) if ours_ok.any() else 0
    last_good = min(ref_last, ours_last)

    common = sorted(set(ref["frame_id"].tolist())
                    & set(res.frame_ids.tolist()))
    common = [i for i in common if i <= last_good]
    if len(common) < 3:
        # one (or both) system dies immediately on this input — survival
        # itself is the parity datum; there is no window to score
        return {"frames_compared": len(common),
                "reference_tracks_until": ref_last,
                "ours_tracks_until": ours_last,
                "compared_until": last_good,
                "rotation_vs_reference": {},
                "ate_sim3_aligned": float("nan"),
                "seeds_reference_mean": float(np.nanmean(ref["seeds"])),
                "seeds_ours_mean": float(np.mean(res.seeds))}
    ri = {f: k for k, f in enumerate(ref["frame_id"])}
    oi = {f: k for k, f in enumerate(res.frame_ids)}
    idx_r = np.asarray([ri[f] for f in common])
    idx_o = np.asarray([oi[f] for f in common])

    pose_r = ref["pose"][idx_r]
    pose_o = res.world_poses[idx_o]
    Rr = rotmats(pose_r)
    Ro = rotmats(pose_o)

    rot = {k: float(v) for k, v in
           metrics.compare_rotations(jnp.asarray(Rr),
                                     jnp.asarray(Ro)).items()}
    ate = float(metrics.ate_rmse(jnp.asarray(pose_o), jnp.asarray(pose_r)))

    K = cfg.keyframe_interval
    out = {
        "frames_compared": len(common),
        "reference_tracks_until": ref_last,
        "ours_tracks_until": ours_last,
        "compared_until": last_good,
        "rotation_vs_reference": rot,
        "ate_sim3_aligned": ate,
    }
    for L, name in ((K, f"rpe_rot_{K}f"), (5 * K, f"rpe_rot_{5*K}f")):
        if len(common) > L:
            e = rpe_rotation(Rr, Ro, L)
            out[name] = {"mean_deg": float(e.mean()),
                         "median_deg": float(np.median(e)),
                         "p95_deg": float(np.percentile(e, 95)),
                         "max_deg": float(e.max())}

    seeds_r = ref["seeds"][idx_r]
    seeds_o = res.seeds[idx_o]
    out["seeds_reference_mean"] = float(np.nanmean(seeds_r))
    out["seeds_ours_mean"] = float(np.mean(seeds_o))
    out["seeds_abs_diff_mean"] = float(np.nanmean(np.abs(seeds_r - seeds_o)))
    if len(seeds_r) > 2:
        out["seeds_correlation"] = float(np.corrcoef(seeds_r, seeds_o)[0, 1])

    if out_npz:
        np.savez(out_npz, frame_id=np.asarray(common),
                 angle_deg=angle_deg(
                     Rr, Ro @ (Ro[0].T @ Rr[0])[None]),
                 pose_ref=pose_r, pose_ours=pose_o,
                 seeds_ref=seeds_r, seeds_ours=seeds_o,
                 rescale_ref=ref["rescale"][idx_r],
                 rescale_ours=res.rescales[idx_o])
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    # run_gn = the GN-mode run dir written by tools/run_reference.py gn
    # (kept separate from the LC-mode run so neither clobbers the other)
    ap.add_argument("--input", default="reference_build/run_gn")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default=None,
                    help="npz with per-frame curves for root-causing")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-window-warp", action="store_true",
                    help="use the plain XLA-gather bilinear warp instead "
                         "of the shift-and-blend window sampler (gap-source "
                         "experiment: quantifies window censoring)")
    ap.add_argument("--glibc-init", action="store_true",
                    help="bit-match the reference's bootstrap depth init "
                         "(unseeded glibc rand() in raster order, "
                         "DepthPropagation.cpp:160) so both systems start "
                         "from IDENTICAL depth — isolates algorithmic "
                         "divergence from init randomness")
    args = ap.parse_args()

    out = evaluate(args.input, max_frames=args.max_frames, seed=args.seed,
                   no_window_warp=args.no_window_warp,
                   glibc_init=args.glibc_init, out_npz=args.out)
    if args.json:
        print(json.dumps(out))
    else:
        print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
