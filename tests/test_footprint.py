"""HBM footprint accounting (utils/footprint.py, VERDICT r4 #4)."""

import jax
import jax.numpy as jnp
import pytest

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.runtime import pipeline
from egomotion_with_local_loop_closures_tpu.utils import footprint

CFG = ELLCConfig(rows=48, cols=64, fx=55.0, fy=55.0, cx=32.0, cy=24.0)


def test_tree_bytes_counts_leaves():
    tree = {"a": jnp.zeros((4, 8), jnp.float32),
            "b": (jnp.zeros((3,), jnp.int32), None)}
    assert footprint.tree_bytes(tree) == 4 * 8 * 4 + 3 * 4


def test_interval_footprint_scales_with_videos():
    fp1 = footprint.interval_footprint(1, CFG)
    fp4 = footprint.interval_footprint(4, CFG)
    assert fp1.videos == 1 and fp4.videos == 4
    # argument bytes (states + image batch) scale linearly with V
    assert fp4.argument_bytes == pytest.approx(4 * fp1.argument_bytes,
                                               rel=0.01)
    assert fp4.state_bytes == 4 * fp1.state_bytes
    assert fp1.peak_bytes > 0
    assert fp1.describe().startswith("V=1:")


def test_check_fits_raises_cleanly_when_over_limit(monkeypatch):
    fp = footprint.interval_footprint(2, CFG)
    # pretend the device is smaller than the program
    monkeypatch.setattr(footprint, "device_bytes_limit",
                        lambda device=None: fp.peak_bytes - 1)
    with pytest.raises(MemoryError, match="does not fit"):
        footprint.check_fits(2, CFG)
    # and fits when the limit is big enough
    monkeypatch.setattr(footprint, "device_bytes_limit",
                        lambda device=None: fp.peak_bytes * 10)
    out = footprint.check_fits(2, CFG)
    assert out.fits is True


def test_weight_acc_absent_in_plain_gn_mode():
    """Plain GN mode must not carry the loop-window weight accumulator
    (a full image pyramid per video, runtime/pipeline.py make_keyframe)."""
    img = jnp.zeros((CFG.rows, CFG.cols), jnp.float32)
    key = jax.random.PRNGKey(0)
    st_gn = pipeline.init_pipeline(img, key, CFG)
    assert st_gn.kf.weight_acc == ()
    cfg_lc = CFG.replace(do_loop_closure=True)
    st_lc = pipeline.init_pipeline(img, key, cfg_lc)
    assert len(st_lc.kf.weight_acc) == cfg_lc.num_levels
    # the GN state is strictly smaller
    assert (footprint.tree_bytes(st_gn) < footprint.tree_bytes(st_lc))
