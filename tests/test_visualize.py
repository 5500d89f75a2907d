"""Visualization tests: JET/colormap reference semantics + file outputs."""

import numpy as np
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.utils import synthetic, visualize

CFG = ELLCConfig(rows=96, cols=128, fx=110.0, fy=110.0, cx=64.0, cy=48.0)


def test_jet_endpoints():
    rgb = visualize.jet_colormap(np.asarray([0, 128, 255], np.uint8))
    # JET(0) is deep blue (b ~ 128, r = g = 0) — the sentinel the reference
    # keys the invalid-pixel replacement on (DepthPropagation.cpp:1207)
    assert rgb[0, 2] in (127, 128) and rgb[0, 0] == 0 and rgb[0, 1] == 0
    # middle is green-ish, end is deep red
    assert rgb[1, 1] > 200
    assert rgb[2, 0] in (127, 128) and rgb[2, 2] == 0


def test_colour_depth_map_invalid_pixels_grayscale():
    depth = np.zeros((4, 4), np.float32)
    depth[0, 0] = 1.0          # valid -> jet color
    gray = np.full((4, 4), 77.0, np.float32)
    rgb = visualize.colour_depth_map(depth, gray)
    assert rgb.shape == (4, 4, 3)
    # invalid pixel replaced by gray
    assert tuple(rgb[1, 1]) == (77, 77, 77)
    # valid pixel: uint8(1.0*100)=100 -> jet, not grayscale
    assert not (rgb[0, 0][0] == rgb[0, 0][1] == rgb[0, 0][2])
    # saturation: huge depth clamps to 255 without overflow
    depth[2, 2] = 99.0
    rgb = visualize.colour_depth_map(depth, gray)
    assert rgb[2, 2][0] in (127, 128)   # deep red end of jet


def test_alignment_views_and_dump(tmp_path):
    scene = synthetic.make_room_scene(seed=2, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    img0, depth0 = synthetic.render(scene, jnp.zeros(6), CFG.rows, CFG.cols,
                                    fx, fy, cx, cy)
    pose = jnp.asarray([0.0, 0.0, 0.0, 0.01, 0.0, 0.0])
    img1, _ = synthetic.render(scene, pose, CFG.rows, CFG.cols,
                               fx, fy, cx, cy)
    views = visualize.alignment_views(img0, depth0, img1, pose, CFG)
    assert views["valid_mask"].any()
    # warping current into the keyframe at the true pose ~ reproduces it
    m = views["valid_mask"]
    err = np.abs(views["residual"][m])
    assert np.median(err) < 3.0

    prefix = str(tmp_path / "dbg")
    visualize.dump_frame_debug(prefix, img0, depth0, img1, pose, CFG)
    import os
    for suffix in ("_depth.png", "_warped.png", "_residual.png"):
        assert os.path.getsize(prefix + suffix) > 0


def test_plot_trajectory(tmp_path):
    poses = np.asarray([[0, 0.01 * i, 0, 0.02 * i, 0, 0.01 * i]
                        for i in range(20)], np.float32)
    p = str(tmp_path / "traj.png")
    visualize.plot_trajectory(poses, p, gt_poses=poses)
    import os
    assert os.path.getsize(p) > 0
