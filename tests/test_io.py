"""IO tests: reference-format pose files and the video frame source."""

import numpy as np
import pytest

from egomotion_with_local_loop_closures_tpu.runtime import io as ellc_io


def test_pose_writer_roundtrip(tmp_path):
    p = str(tmp_path / "poses_orig.txt")
    with ellc_io.PoseWriter(p) as w:
        w.write(2, 1, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6], 1.5, 42.0)
        w.write(3, 1, [0.0] * 6, 1.0, 10.0)
    rows = ellc_io.read_pose_file(p)
    assert rows.shape == (2, 10)
    assert rows[0, 0] == 2 and rows[0, 1] == 1
    np.testing.assert_allclose(rows[0, 2:8], [0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
    assert rows[0, 8] == 1.5 and rows[0, 9] == 42.0


def test_match_writer_appends_extras(tmp_path):
    p = str(tmp_path / "matchframes_globalopt.txt")
    with ellc_io.PoseWriter(p, kind="match") as w:
        w.write(9, 1, [0.0] * 6, 1.0, 5.0, extras=(0.05, 3.2, 7.5))
    rows = ellc_io.read_pose_file(p)
    # frameId kfId pose6 rescale seeds matchValue rms viewAngle = 13 cols
    assert rows.shape == (1, 13)
    np.testing.assert_allclose(rows[0, 10:], [0.05, 3.2, 7.5])


def test_video_frames_decode_resize_gray(tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (128, 96))
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
    for i in range(12):
        w.write(np.roll(base, i, axis=1))
    w.release()

    frames = list(ellc_io.video_frames(path, resize_factor=0.5, skip=2,
                                       max_frames=5))
    assert len(frames) == 5
    assert frames[0].shape == (48, 64)
    assert frames[0].dtype == np.float32
    # skip=2 means the first yielded frame is source frame 2: rolling the
    # texture shifts content, so consecutive frames must differ
    assert np.abs(frames[1] - frames[0]).max() > 1.0
