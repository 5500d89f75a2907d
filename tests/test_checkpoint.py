"""Checkpoint/resume tests: pytree round-trip, rolling retention, resume
continuation equivalence, and reference text-snapshot format parity
(FLAG_SAVE_MATS, Frame.cpp:698-905)."""

import numpy as np
import jax
import jax.numpy as jnp

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.runtime import (checkpoint,
                                                            pipeline, runner)
from egomotion_with_local_loop_closures_tpu.utils import synthetic

CFG = ELLCConfig(rows=96, cols=128, fx=110.0, fy=110.0, cx=64.0, cy=48.0)


def _images(n):
    scene = synthetic.make_room_scene(seed=5, depth=1.25, half_width=1.7,
                                      half_height=1.15)
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    return [np.asarray(synthetic.render(
        scene, jnp.asarray([0, 0, 0, 0.004 * i, 0, 0], jnp.float32),
        CFG.rows, CFG.cols, fx, fy, cx, cy)[0]) for i in range(n)]


def test_pytree_roundtrip(tmp_path):
    imgs = _images(1)
    state = pipeline.init_pipeline(jnp.asarray(imgs[0]),
                                   jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "snap")
    checkpoint.save(path, state, meta={"frame_id": 1, "kf_id": 1})
    template = checkpoint.template_pipeline_state(CFG)
    restored = checkpoint.load(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert checkpoint.load_meta(path)["frame_id"] == 1


def test_template_leaf_count_guards_config_mismatch(tmp_path):
    imgs = _images(1)
    state = pipeline.init_pipeline(jnp.asarray(imgs[0]),
                                   jax.random.PRNGKey(0), CFG)
    path = str(tmp_path / "snap")
    checkpoint.save(path, state)
    bad = checkpoint.template_pipeline_state(CFG.replace(num_levels=2))
    try:
        checkpoint.load(path, bad)
        assert False, "expected leaf-count mismatch"
    except ValueError:
        pass


def test_manager_retention_and_latest(tmp_path):
    mgr = checkpoint.CheckpointManager(str(tmp_path), keep=2)
    tree = {"a": np.arange(3.0)}
    for step in (8, 16, 24):
        mgr.save(step, tree, meta={"frame_id": step, "kf_id": step})
    assert mgr.all_steps() == [16, 24]      # oldest garbage-collected
    assert mgr.latest_step() == 24
    restored, meta = mgr.restore({"a": np.zeros(3)})
    assert meta["step"] == 24
    np.testing.assert_array_equal(restored["a"], np.arange(3.0))


def test_resume_continues_identically(tmp_path):
    """A run checkpointed mid-way and resumed must produce the same poses
    as the uninterrupted run (the reference's batch-restart determinism,
    FLAG_REPLICATE_NEW_DEPTH fixture mechanism, SURVEY §4)."""
    n = 3 * CFG.keyframe_interval + 1
    imgs = _images(n)
    # per-interval dispatch on BOTH sides: checkpoints are interval-
    # aligned, so the resumed run replays the remaining intervals with
    # the exact same dispatch graphs as the uninterrupted run (chunked
    # multi-interval dispatch would fuse several intervals into one scan
    # whose float reassociation differs at the ~1e-4 level — covered by
    # test_runner_chunked_dispatch_matches_per_interval)
    full = runner.run_sequence(iter(imgs), CFG, out_dir=None,
                               intervals_per_dispatch=1)

    ck = str(tmp_path / "ck")
    # first leg: checkpoint after every interval, stop after 2 intervals
    runner.run_sequence(iter(imgs), CFG, out_dir=None,
                        checkpoint_dir=ck, checkpoint_every=1,
                        max_frames=2 * CFG.keyframe_interval + 1,
                        intervals_per_dispatch=1)
    # second leg: resume and run to the end
    res = runner.run_sequence(iter(imgs), CFG, out_dir=None,
                              checkpoint_dir=ck, resume=True,
                              intervals_per_dispatch=1)
    # the resumed tail must match the uninterrupted run bit-for-bit
    tail = len(res.frame_ids)
    assert tail > 0
    np.testing.assert_array_equal(res.frame_ids,
                                  full.frame_ids[-tail:])
    np.testing.assert_allclose(res.world_poses,
                               full.world_poses[-tail:], atol=1e-6)


def test_mat_text_roundtrip_reference_format(tmp_path):
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(7, 9)).astype(np.float32)
    p = checkpoint.save_mat_text(mat, 42, "depth_mat", str(tmp_path))
    assert p.endswith("42_depth_mat.txt")
    with open(p) as f:
        first = f.readline()
    assert first.endswith(" \n")            # trailing space like operator<<
    back = checkpoint.load_mat_text(42, "depth_mat", str(tmp_path),
                                    shape=(7, 9))
    np.testing.assert_allclose(back, mat, rtol=1e-4, atol=1e-5)
