"""Generate identical input for the reference binary and this framework.

Renders the synthetic room scene at the reference's capture resolution
(1920x1080; it resizes by 1/4 to 480x270, ExternVariable.h:41-51) along a
smooth random trajectory, writes ``%06d.jpg`` frames for the reference's
``cv::VideoCapture("../data/%06d.jpg")`` ingest (main.cpp:107-108,
Frame.cpp:34-124), and then replicates the reference's exact preprocessing
(JPEG decode -> gray -> cv::undistort with the hard-coded model
(Frame.cpp:57-70, ExternVariable.h:62) -> resize 1/4) to produce the
480x270 float frames the reference actually tracks.  Those frames are
saved to ``frames_480x270.npz`` and fed verbatim to this framework, so a
trajectory diff between the two systems measures algorithmic parity, not
input-pipeline differences.

Usage: python tools/make_reference_input.py [--frames N] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# reference intrinsics at capture resolution (ExternVariable.h:53-59 are the
# /4 values; these are the 1920x1080 originals cited there)
ORIG_FX = 1642.405612
ORIG_FY = 1636.148027
ORIG_CX = 1920 / 2.0
ORIG_CY = 1080 / 2.0
DISTORTION = (-0.288283, 0.146546, 0.003800, -0.001690, -0.132134)  # EV:62


def build_scene_and_poses(scene_kind: str, seed: int, frames: int,
                          rot_step: float = 0.0015,
                          trans_step: float = 0.02):
    """Scene/trajectory factory for the multi-scene parity battery.

    - ``base``:    the original round-2 room + smooth random walk.
    - ``lowtex``:  the same room with texture amplitude scaled to 45%
                   (gradients hover near the MIN_ABS_GRAD_* gates — the
                   regime where both systems' knife-edge behaviour lives).
    - ``fastrot``: base room, 3x the rotational velocity (egocentric
                   head-turn regime; stresses the coarse-to-fine basin).
    - ``revisit``: base room on a BOUNDED oscillating trajectory
                   (synthetic.loop_trajectory) with genuine viewpoint
                   revisits — the local-loop-closure workload
                   (/root/reference/README.md:7-8).
    """
    from egomotion_with_local_loop_closures_tpu.utils import synthetic
    import jax.numpy as jnp
    scene = synthetic.make_room_scene(seed=seed, depth=1.25,
                                      half_width=1.7, half_height=1.15)
    if scene_kind == "lowtex":
        scene = scene._replace(tex_amp=scene.tex_amp * 0.45)
        poses = synthetic.trajectory(frames, seed=seed, rot_step=rot_step,
                                     trans_step=trans_step)
    elif scene_kind == "fastrot":
        poses = synthetic.trajectory(frames, seed=seed,
                                     rot_step=3.0 * rot_step,
                                     trans_step=trans_step)
    elif scene_kind == "revisit":
        poses = jnp.asarray(synthetic.loop_trajectory(
            frames, seed=seed, rot_amp=0.08, trans_amp=0.12))
    else:
        assert scene_kind == "base", scene_kind
        poses = synthetic.trajectory(frames, seed=seed, rot_step=rot_step,
                                     trans_step=trans_step)
    return scene, poses


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=520)
    ap.add_argument("--out", default="reference_build/run")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rot-step", type=float, default=0.0015)
    ap.add_argument("--trans-step", type=float, default=0.02)
    ap.add_argument("--scene", default="base",
                    choices=["base", "lowtex", "fastrot", "revisit"])
    args = ap.parse_args()

    import cv2
    import jax
    if os.environ.get("ELLC_PLATFORM"):
        # the container's sitecustomize registers the TPU-tunnel backend at
        # interpreter start, so JAX_PLATFORMS alone cannot opt out
        # (tests/conftest.py); config.update before backend init can.  The
        # battery's phase-A render subprocesses must stay off the single
        # TPU chip while phase B (or another bench) owns it.
        jax.config.update("jax_platforms", os.environ["ELLC_PLATFORM"])
    import jax.numpy as jnp

    from egomotion_with_local_loop_closures_tpu.utils import synthetic

    rows, cols = 1080, 1920
    scene, poses = build_scene_and_poses(args.scene, args.seed, args.frames,
                                         args.rot_step, args.trans_step)

    data_dir = os.path.join(args.out, "data")
    for sub in ("data", "outputs", "Test_images", "matches", "bin"):
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    render = jax.jit(lambda p: synthetic.render(
        scene, p, rows, cols, ORIG_FX, ORIG_FY, ORIG_CX, ORIG_CY)[0])

    # the reference's undistortion setup, replicated number-for-number
    # (Frame.cpp:57-70): intrinsics at the CAPTURE resolution
    # (ORIG_FX*INTRINSIC_FACTOR, ORIG_CX*DIM_FACTOR)
    cam_k = np.array([[ORIG_FX, 0, ORIG_CX],
                      [0, ORIG_FY, ORIG_CY],
                      [0, 0, 1]], np.float32)
    dist = np.array(DISTORTION, np.float32)
    cam_knew = cv2.getOptimalNewCameraMatrix(
        cam_k, dist, (cols, rows), 0.0)[0]

    small = []
    for i in range(args.frames):
        img = np.asarray(render(poses[i]))
        gray = np.clip(img, 0, 255).astype(np.uint8)
        path = os.path.join(data_dir, "%06d.jpg" % (i + 1))
        cv2.imwrite(path, cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 97])
        # replicate the reference ingest from the JPEG just written so both
        # systems see the same (JPEG-lossy) pixels
        bgr = cv2.imread(path)
        g = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
        und = cv2.undistort(g, cam_k, dist, None, cam_knew)
        sm = cv2.resize(und, None, fx=0.25, fy=0.25,
                        interpolation=cv2.INTER_LINEAR)
        small.append(sm)
        if (i + 1) % 100 == 0:
            print(f"rendered {i + 1}/{args.frames}", flush=True)

    np.savez_compressed(os.path.join(args.out, "frames_480x270.npz"),
                        frames=np.stack(small).astype(np.float32),
                        poses_gt=np.asarray(poses))
    print("wrote", data_dir, "and frames_480x270.npz")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
