"""Bit-exactness of the glibc rand() replica and the reference-matched
random depth bootstrap (DepthPropagation.cpp:145-184)."""

import ctypes

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth import state as dstate
from egomotion_with_local_loop_closures_tpu.utils import glibc_rand


def test_glibc_rand_matches_libc():
    """The replica must equal the toolchain's actual rand() stream —
    both from srand(1) (== the never-seeded default) and another seed."""
    libc = ctypes.CDLL(None)
    for seed in (1, 12345):
        libc.srand(seed)
        expect = [libc.rand() for _ in range(2000)]
        got = glibc_rand.glibc_rand(2000, seed=seed).tolist()
        assert got == expect, f"divergence for seed {seed}"


def test_glibc_unit_floats_formula():
    """(rand() % 100001) / 100000.0f in float32, values in [0, 1]."""
    r = glibc_rand.glibc_rand(100)
    u = glibc_rand.glibc_unit_floats(100)
    expect = (r % np.uint32(100001)).astype(np.float32) / np.float32(1e5)
    np.testing.assert_array_equal(u, expect)
    assert u.dtype == np.float32
    assert (u >= 0).all() and (u <= 1.0).all()


def test_initialize_random_glibc_raster_order():
    """cfg.bootstrap_rng='glibc' must consume the stream exactly like
    the reference's scan: raster order (y outer from 1, x inner from 1),
    one draw per pixel whose max-gradient exceeds MIN_ABS_GRAD_CREATE;
    non-gated pixels consume nothing."""
    H, W = 24, 32
    rng = np.random.default_rng(3)
    max_grad = rng.uniform(0.0, 3.0, size=(H, W)).astype(np.float32)
    cfg = ELLCConfig(rows=H, cols=W, bootstrap_rng="glibc")

    st = dstate.initialize_random(jax.random.PRNGKey(0),
                                  jnp.asarray(max_grad), cfg)
    got_idepth = np.asarray(st.idepth)
    got_valid = np.asarray(st.valid)

    # reference emulation, literally the C++ double loop
    u = glibc_rand.glibc_unit_floats(H * W)
    k = 0
    expect = np.zeros((H, W), np.float32)
    expect_valid = np.zeros((H, W), bool)
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            if max_grad[y, x] > cfg.min_abs_grad_create:
                expect[y, x] = np.float32(0.5) + np.float32(1.0) * u[k]
                expect_valid[y, x] = True
                k += 1
    assert k > 50, "test scene too flat to exercise the stream"
    np.testing.assert_array_equal(got_valid, expect_valid)
    np.testing.assert_array_equal(got_idepth, expect)

    # and the jax path still works + differs (sanity that the flag does
    # something)
    st2 = dstate.initialize_random(jax.random.PRNGKey(0),
                                   jnp.asarray(max_grad),
                                   cfg.replace(bootstrap_rng="jax"))
    assert np.any(np.asarray(st2.idepth) != got_idepth)
    np.testing.assert_array_equal(np.asarray(st2.valid), expect_valid)
