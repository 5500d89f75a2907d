"""Native C++ frame loader tests: decode parity vs PIL, ordering,
resize, skip, and fallback."""

import os

import numpy as np
import pytest
from PIL import Image

from egomotion_with_local_loop_closures_tpu.runtime import native_loader


def _make_seq(d, n=6, size=(40, 32), fmt="jpeg"):
    rng = np.random.default_rng(0)
    truth = []
    for i in range(n):
        # smooth image so JPEG loss stays tiny
        base = np.zeros(size, np.float32)
        base += np.linspace(0, 200, size[1])[None, :]
        base += 10.0 * i
        img = np.clip(base + rng.normal(0, 1, size), 0, 255).astype(np.uint8)
        name = f"{i:06d}.jpg" if fmt == "jpeg" else f"{i:06d}.pgm"
        Image.fromarray(img).save(os.path.join(d, name))
        truth.append(img)
    return truth


@pytest.fixture(scope="module")
def lib_ok():
    if native_loader.get_lib() is None:
        pytest.skip("native loader not buildable")
    return True


def test_jpeg_sequence_in_order(tmp_path, lib_ok):
    truth = _make_seq(str(tmp_path), fmt="jpeg")
    with native_loader.NativeFrameLoader(str(tmp_path), 40, 32) as ld:
        assert len(ld) == len(truth)
        for i, frame in enumerate(ld):
            assert frame.shape == (40, 32)
            # JPEG is lossy; grayscale roundtrip stays within a few levels
            assert np.abs(frame - truth[i].astype(np.float32)).mean() < 3.0


def test_pgm_exact_and_resize(tmp_path, lib_ok):
    truth = _make_seq(str(tmp_path), n=3, fmt="pgm")
    # native size: exact
    with native_loader.NativeFrameLoader(str(tmp_path), 40, 32) as ld:
        f0 = next(iter(ld))
    np.testing.assert_array_equal(f0, truth[0].astype(np.float32))
    # downscaled: compare against the OpenCV INTER_LINEAR formula
    # (src = (dst+0.5)*scale - 0.5, 2-tap, edge clamp) computed in numpy
    with native_loader.NativeFrameLoader(str(tmp_path), 20, 16) as ld:
        g0 = next(iter(ld))
    src = truth[0].astype(np.float32)

    def cv_bilinear(a, rows, cols):
        sy = a.shape[0] / rows
        sx = a.shape[1] / cols
        fy = (np.arange(rows) + 0.5) * sy - 0.5
        fx = (np.arange(cols) + 0.5) * sx - 0.5
        y0 = np.floor(fy).astype(int)
        x0 = np.floor(fx).astype(int)
        wy = (fy - y0)[:, None]
        wx = (fx - x0)[None, :]
        y0c = np.clip(y0, 0, a.shape[0] - 1)
        y1c = np.clip(y0 + 1, 0, a.shape[0] - 1)
        x0c = np.clip(x0, 0, a.shape[1] - 1)
        x1c = np.clip(x0 + 1, 0, a.shape[1] - 1)
        top = a[y0c][:, x0c] * (1 - wx) + a[y0c][:, x1c] * wx
        bot = a[y1c][:, x0c] * (1 - wx) + a[y1c][:, x1c] * wx
        return top * (1 - wy) + bot * wy

    want = cv_bilinear(src, 20, 16)
    assert np.abs(g0 - want).max() < 1e-3


def test_skip(tmp_path, lib_ok):
    truth = _make_seq(str(tmp_path), n=5, fmt="pgm")
    with native_loader.NativeFrameLoader(str(tmp_path), 40, 32) as ld:
        ld.skip(3)
        f = next(iter(ld))
    np.testing.assert_array_equal(f, truth[3].astype(np.float32))


def test_frames_fallback_matches(tmp_path, lib_ok):
    truth = _make_seq(str(tmp_path), n=2, fmt="pgm")
    got = list(native_loader.frames(str(tmp_path), 40, 32))
    assert len(got) == 2
    np.testing.assert_array_equal(got[1], truth[1].astype(np.float32))
