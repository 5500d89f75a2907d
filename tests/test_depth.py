"""Depth subsystem tests: line stereo, EKF observation, propagation,
hole filling, regularization — against analytically rendered ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egomotion_with_local_loop_closures_tpu.config import ELLCConfig
from egomotion_with_local_loop_closures_tpu.depth import (fusion, propagate,
                                                          state as dstate,
                                                          stereo)
from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.image import interp, pyramid
from egomotion_with_local_loop_closures_tpu.utils import synthetic

CFG = ELLCConfig(rows=96, cols=128, fx=110.0, fy=110.0, cx=64.0, cy=48.0)
# scene at depth ~1 so the reference's scale assumptions (random idepth
# prior in [0.5, 1.5], rescaleFactor gate 0.7-1.4) hold
SCENE = synthetic.make_room_scene(seed=5, depth=1.2, half_width=1.6,
                                  half_height=1.1)


def _frame(pose):
    fx, fy, cx, cy = CFG.level_intrinsics(0)
    return synthetic.render(SCENE, pose, CFG.rows, CFG.cols, fx, fy, cx, cy)


def _kf_data(img):
    gx, gy = pyramid.gradients(img)
    mg = pyramid.max_abs_gradient(gx, gy)
    return gx, gy, mg


def test_line_stereo_triangulates_true_depth():
    img0, depth0 = _frame(jnp.zeros(6))
    pose1 = jnp.asarray([0.0, 0.0, 0.0, 0.04, 0.01, 0.0])  # sideways baseline
    img1, _ = _frame(pose1)
    gx, gy, mg = _kf_data(img0)

    T = lie.exp_se3(pose1)
    t_kf_from_cur = -T[:3, :3].T @ T[:3, 3]
    epx, epy, ok = stereo.epl_direction(img0, t_kf_from_cur, CFG)

    gt_id = 1.0 / depth0
    # update-style band around the truth
    sv = 0.15
    packed = interp.pack_quad_u8(img1) if CFG.stereo_pack_u8 \
        else interp.pack_pairs_u16(img1)
    res = stereo.line_stereo(img0, gx, gy, packed,
                             epx, epy,
                             jnp.maximum(gt_id - 2 * sv, 0.0), gt_id,
                             jnp.minimum(gt_id + 2 * sv, 1.0 / CFG.min_depth),
                             pose1, CFG)
    good = ok & (res.code == 0)
    frac = float(jnp.mean(good.astype(jnp.float32)))
    assert frac > 0.25, f"too few successful stereo pixels: {frac}"
    rel_err = jnp.where(good, jnp.abs(res.idepth - gt_id) / gt_id, 0.0)
    med = float(jnp.median(rel_err[good]))
    assert med < 0.02, f"median relative idepth error {med}"
    # with a ~4.5 px/unit-idepth baseline, alpha ~ 0.22 so observation
    # variances land well under MAX_VAR (=0.25)
    assert float(jnp.median(res.var[good])) < CFG.max_var
    # variances positive for successes
    assert float(jnp.min(jnp.where(good, res.var, 1.0))) > 0


def test_line_stereo_rejects_no_baseline():
    img0, depth0 = _frame(jnp.zeros(6))
    gx, gy, mg = _kf_data(img0)
    # pure rotation: epipolar direction degenerates (t ~ 0)
    pose1 = jnp.asarray([0.01, 0.005, 0.0, 0.0, 0.0, 0.0])
    T = lie.exp_se3(pose1)
    t_inv = -T[:3, :3].T @ T[:3, 3]
    epx, epy, ok = stereo.epl_direction(img0, t_inv, CFG)
    # essentially every pixel fails the epl length/grad checks
    assert float(jnp.mean(ok.astype(jnp.float32))) < 0.05


def test_observe_converges_from_random_init():
    # ample pool capacity: this test validates the FILTER's convergence
    # from random init over 6 frames; the production capacities
    # (steady-state-sized, bootstrap overflows and retries over several
    # frames) are an orthogonal throughput/latency tradeoff measured
    # end-to-end by tools/parity_eval.py
    cfg = CFG.replace(stereo_compact_frac=0.9, stereo_short_frac=0.3)
    key = jax.random.PRNGKey(0)
    img0, depth0 = _frame(jnp.zeros(6))
    gx, gy, mg = _kf_data(img0)
    st = dstate.initialize_random(key, mg, cfg)
    init_seeds = float(dstate.seeds_percent(st))
    assert init_seeds > 30

    # several frames with varied baselines refine the map
    motions = [
        [0.0, 0.0, 0.0, 0.03, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0, 0.03, 0.005],
        [0.002, -0.001, 0.0, -0.03, 0.01, 0.0],
        [0.0, 0.0, 0.001, 0.02, -0.03, 0.01],
        [0.001, 0.002, 0.0, -0.02, -0.02, 0.005],
        [0.0, -0.002, 0.0, 0.04, 0.02, -0.01],
    ]
    for m in motions:
        pose = jnp.asarray(m)
        img1, _ = _frame(pose)
        out = stereo.observe(st, img0, gx, gy, mg, img1, pose, cfg)
        st = out.state
        st = propagate.do_regularization(st, mg, cfg)

    gt_id = 1.0 / depth0
    good = st.valid & (st.idepth_smoothed > 0)
    frac = float(jnp.mean(good.astype(jnp.float32)))
    assert frac > 0.2, f"valid fraction {frac}"
    rel = jnp.abs(st.idepth_smoothed - gt_id) / gt_id
    med = float(jnp.median(rel[good]))
    assert med < 0.05, f"median relative idepth error after refinement: {med}"


def test_observe_updates_and_creates_counts():
    # ample pool capacity: from random init EVERY gated pixel is a
    # wide-sigma update (long walk); production capacities are sized for
    # steady state and would overflow here by design
    cfg = CFG.replace(stereo_compact_frac=0.9, stereo_short_frac=0.3)
    key = jax.random.PRNGKey(1)
    img0, _ = _frame(jnp.zeros(6))
    gx, gy, mg = _kf_data(img0)
    st = dstate.initialize_random(key, mg, cfg)
    st = propagate.regularize(st, cfg)  # give pixels smoothed priors
    pose = jnp.asarray([0.0, 0.0, 0.0, 0.03, 0.01, 0.0])
    img1, _ = _frame(pose)
    out = stereo.observe(st, img0, gx, gy, mg, img1, pose, cfg)
    assert int(out.num_updated) > 500
    # kill some pixels to open create opportunities
    st2 = out.state._replace(
        valid=out.state.valid & (jax.random.uniform(key, st.valid.shape) > 0.3))
    out2 = stereo.observe(st2, img0, gx, gy, mg, img1, pose, cfg)
    assert int(out2.num_created) > 50


def test_propagate_reprojects_to_new_keyframe():
    img0, depth0 = _frame(jnp.zeros(6))
    pose_new = jnp.asarray([0.002, 0.001, 0.0, 0.05, 0.02, 0.03])
    img_new, depth_new = _frame(pose_new)
    _, _, mg_new = _kf_data(img_new)

    # perfect state on the old KF
    H, W = CFG.shape
    gt_id = 1.0 / depth0
    var = jnp.full((H, W), 0.001)
    st = dstate.DepthMapState(
        idepth=gt_id, var=var, idepth_smoothed=gt_id, var_smoothed=var,
        validity=jnp.full((H, W), 100.0),
        blacklisted=jnp.zeros((H, W), jnp.int32),
        valid=jnp.ones((H, W), bool))

    st_new = propagate.propagate(st, img0, img_new, mg_new, pose_new, CFG)
    gt_new = 1.0 / depth_new
    good = st_new.valid
    frac = float(jnp.mean(good.astype(jnp.float32)))
    # occupancy is capped by the destination max-gradient gate
    # (MIN_ABS_GRAD_DECREASE, DepthPropagation.cpp:1072) — the smooth
    # Fourier texture leaves ~30% of pixels above it
    grad_frac = float((mg_new >= CFG.min_abs_grad_decrease).mean())
    assert frac > 0.7 * grad_frac, f"propagated occupancy {frac} vs {grad_frac}"
    rel = jnp.abs(st_new.idepth - gt_new) / gt_new
    med = float(jnp.median(rel[good]))
    assert med < 0.02, f"median propagated idepth error {med}"
    # smoothed fields reset for re-regularization
    assert float(st_new.idepth_smoothed.max()) == -1.0


def _hole_state(depth0, hole):
    H, W = CFG.shape
    gt_id = 1.0 / depth0
    var = jnp.full((H, W), 0.01)
    valid = jnp.ones((H, W), bool).at[hole].set(False)
    return dstate.DepthMapState(
        idepth=jnp.where(valid, gt_id, 0.0), var=var,
        idepth_smoothed=jnp.where(valid, gt_id, -1.0), var_smoothed=var,
        validity=jnp.where(valid, 50.0, 0.0),
        blacklisted=jnp.zeros((H, W), jnp.int32), valid=valid)


def test_fill_holes_reference_row_semantics():
    """The reference's val score is rowsum(y+2) - rowsum(y-3) (its integral
    buffer has no column pass, DepthPropagation.cpp:1414-1429), so a hole
    in a uniformly valid map scores ~0 and is NOT filled; a hole whose row
    y-3 is empty but row y+2 is full IS filled."""
    img0, depth0 = _frame(jnp.zeros(6))
    _, _, mg = _kf_data(img0)
    assert bool(mg[40, 60] >= CFG.min_abs_grad_decrease)
    # uniform validity: row difference ~ 0 -> no fill
    st = _hole_state(depth0, (slice(40, 42), slice(60, 62)))
    st2 = propagate.fill_holes(st, mg, CFG)
    assert not bool(st2.valid[40, 60])
    # invalidate rows above the hole: rowsum(y-3)=0, rowsum(y+2)=250 -> fill
    st3 = _hole_state(depth0, (slice(30, 42), slice(None)))
    st4 = propagate.fill_holes(st3, mg, CFG)
    filled = st4.valid & ~st3.valid
    assert int(filled.sum()) > 0
    # fills only appear where a lower neighbourhood supports them
    ys = jnp.where(filled.any(axis=1))[0]
    assert int(ys.min()) >= 38


def test_fill_holes_lsd_correct_mode_fills_isolated_gap():
    cfg2 = CFG.replace(lsd_correct_hole_fill=True)
    img0, depth0 = _frame(jnp.zeros(6))
    _, _, mg = _kf_data(img0)
    st = _hole_state(depth0, (slice(40, 42), slice(60, 62)))
    st2 = propagate.fill_holes(st, mg, cfg2)
    assert bool(st2.valid[40, 60])
    got = float(st2.idepth[40, 60])
    want = float((1.0 / depth0)[40, 60])
    assert abs(got - want) / want < 0.2


def test_regularize_smooths_and_drops():
    H, W = CFG.shape
    key = jax.random.PRNGKey(2)
    idepth = 1.0 + 0.01 * jax.random.normal(key, (H, W))
    var = jnp.full((H, W), 0.01)
    valid = jnp.ones((H, W), bool)
    # one outlier pixel and one isolated low-validity pixel
    idepth = idepth.at[50, 50].set(5.0)
    validity = jnp.full((H, W), 30.0).at[20, 20].set(0.0)
    validity = validity.at[18:23, 18:23].set(0.0)
    st = dstate.DepthMapState(idepth, var, jnp.full((H, W), -1.0),
                              jnp.full((H, W), -1.0), validity,
                              jnp.zeros((H, W), jnp.int32), valid)
    st2 = propagate.regularize(st, CFG)
    # outlier incompatible with all neighbours -> no weight from them, but
    # its own ivar keeps it; its neighbours exclude it from their means
    np.testing.assert_allclose(float(st2.idepth_smoothed[50, 52]), 1.0,
                               atol=0.05)
    # low-validity neighbourhood dropped
    assert not bool(st2.valid[20, 20])
    assert int(st2.blacklisted[20, 20]) == -1
    # smoothed variance set for surviving interior pixels
    assert float(st2.var_smoothed[40, 40]) > 0


def test_make_idepth_one_normalizes():
    H, W = CFG.shape
    valid = jnp.ones((H, W), bool)
    idepth = jnp.full((H, W), 2.0)
    st = dstate.DepthMapState(idepth, jnp.full((H, W), 0.01), idepth,
                              jnp.full((H, W), 0.01),
                              jnp.full((H, W), 30.0),
                              jnp.zeros((H, W), jnp.int32), valid)
    st2, rescale = dstate.make_idepth_one(st)
    np.testing.assert_allclose(float(rescale), 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(st2.idepth_smoothed[10, 10]), 1.0,
                               rtol=1e-6)
    np.testing.assert_allclose(float(st2.var[10, 10]), 0.0025, rtol=1e-5)


def test_to_depth_image_borders_and_sentinels():
    H, W = CFG.shape
    valid = jnp.ones((H, W), bool)
    idepth = jnp.full((H, W), 2.0)
    st = dstate.DepthMapState(idepth, jnp.full((H, W), 0.01), idepth,
                              jnp.full((H, W), 0.01),
                              jnp.full((H, W), 30.0),
                              jnp.zeros((H, W), jnp.int32), valid)
    st2, depth, var = dstate.to_depth_image(st, CFG)
    assert float(depth[0, 0]) == 0.0 and float(var[0, 0]) == -1.0
    np.testing.assert_allclose(float(depth[10, 10]), 0.5, rtol=1e-6)
    assert not bool(st2.valid[1, 1])


def test_compacted_stereo_matches_dense():
    """Seed-compacted observe (stereo_compact_frac > 0) must produce the
    IDENTICAL depth state as the dense golden path whenever the capacity
    covers every gated pixel — the walk is elementwise per pixel, so
    compaction is a pure layout change."""
    img0, _ = _frame(jnp.zeros(6))
    pose1 = jnp.asarray([0.001, 0.0005, 0.0, 0.03, 0.01, 0.003])
    img1, _ = _frame(pose1)
    gx, gy, mg = _kf_data(img0)
    st = dstate.initialize_random(jax.random.PRNGKey(3), mg, CFG)

    dense_cfg = CFG.replace(stereo_compact_frac=0.0)
    # ample capacity in BOTH pools (short tier + full-length tier)
    comp_cfg = CFG.replace(stereo_compact_frac=0.9, stereo_short_frac=0.9)
    # and the single-pool layout (short tier disabled)
    single_cfg = CFG.replace(stereo_compact_frac=0.9, stereo_short_steps=0)
    out_d = stereo.observe(st, img0, gx, gy, mg, img1, pose1, dense_cfg)
    for cfg_c in (comp_cfg, single_cfg):
        out_c = stereo.observe(st, img0, gx, gy, mg, img1, pose1, cfg_c)
        assert int(out_c.num_overflow) == 0
        assert int(out_d.num_created) == int(out_c.num_created)
        assert int(out_d.num_updated) == int(out_c.num_updated)
        for a, b in zip(out_d.state, out_c.state):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compacted_stereo_overflow_drops_uniformly():
    """With a capacity below the gated-pixel count the excess is dropped
    (code -5: no state change for those pixels) and reported, and the
    drops are spread over the image rather than censoring the last rows."""
    img0, _ = _frame(jnp.zeros(6))
    pose1 = jnp.asarray([0.001, 0.0005, 0.0, 0.03, 0.01, 0.003])
    img1, _ = _frame(pose1)
    gx, gy, mg = _kf_data(img0)
    st = dstate.initialize_random(jax.random.PRNGKey(3), mg, CFG)

    tiny = CFG.replace(stereo_compact_frac=0.05)
    out_d = stereo.observe(st, img0, gx, gy, mg, img1, pose1,
                           CFG.replace(stereo_compact_frac=0.0))
    out_t = stereo.observe(st, img0, gx, gy, mg, img1, pose1, tiny)
    assert int(out_t.num_overflow) > 0
    # processed pixels changed state identically to dense; unprocessed kept
    # their prior state -- so every pixel equals dense OR prior
    for a_d, a_t, a_0 in zip(out_d.state, out_t.state, st):
        d, t, z = (np.asarray(a_d), np.asarray(a_t), np.asarray(a_0))
        assert np.all((t == d) | (t == z))
    # drops spread over rows: changed-pixel rows span most of the image
    changed = np.asarray(out_t.state.idepth) != np.asarray(st.idepth)
    rows_with_changes = np.unique(np.nonzero(changed)[0])
    assert rows_with_changes.size > 0.5 * (changed.shape[0] - 2 * CFG.border)


def test_stereo_u8_quad_close_to_u16():
    """The 1-gather u8-quad sampling path stays within the quantization
    bound of the 2-gather u16 path: same success pattern for ~all pixels
    and small idepth differences where both succeed."""
    img0, depth0 = _frame(jnp.zeros(6))
    pose1 = jnp.asarray([0.0, 0.0, 0.0, 0.04, 0.01, 0.0])
    img1, _ = _frame(pose1)
    gx, gy, mg = _kf_data(img0)
    st = dstate.initialize_random(jax.random.PRNGKey(3), mg, CFG)
    out16 = stereo.observe(st, img0, gx, gy, mg, img1, pose1,
                           CFG.replace(stereo_pack_u8=False))
    out8 = stereo.observe(st, img0, gx, gy, mg, img1, pose1,
                          CFG.replace(stereo_pack_u8=True))
    v16 = np.asarray(out16.state.valid)
    v8 = np.asarray(out8.state.valid)
    agree = float(np.mean(v16 == v8))
    assert agree > 0.97, f"u8/u16 validity agreement {agree}"
    both = v16 & v8
    i16 = np.asarray(out16.state.idepth)[both]
    i8 = np.asarray(out8.state.idepth)[both]
    med = float(np.median(np.abs(i16 - i8) / np.maximum(np.abs(i16), 1e-6)))
    assert med < 0.05, f"median idepth disagreement {med}"


def test_pool_drop_rotation_cycles_overflow():
    """Under sustained overflow, the rotated _pool_indices must drop a
    DIFFERENT create subset for different rot values (ADVICE r4: the
    fixed permutation starved the same trailing pixels every frame),
    while with sufficient capacity the pooled SET is rot-independent."""
    HW = 256
    perm = stereo._interleave_perm(HW)
    mask = np.zeros(HW, bool)
    mask[: 128] = True          # 128 candidates (in permuted order)
    mask_p = jnp.asarray(mask)

    cap = 64                    # overflow: only half fit
    sets = []
    for rot in (0, 64, 128):
        idx, ovf = stereo._pool_indices(mask_p, None, cap, perm, HW,
                                        rot=jnp.asarray(rot, jnp.int32))
        assert int(ovf) == 64
        s = set(int(v) for v in np.asarray(idx) if int(v) < HW)
        assert len(s) == cap
        sets.append(s)
    assert sets[0] != sets[1], "rotation did not change the dropped set"
    # rot=128 == n_candidates wraps to the same set as rot=0
    assert sets[0] == sets[2]
    # full coverage across a rotation cycle: every candidate pooled
    assert sets[0] | sets[1] == {i for i in range(HW)
                                 if mask[int(np.asarray(perm)[i])]} or \
        len(sets[0] | sets[1]) == 128

    # ample capacity: the pooled set must be identical for every rot
    cap = 192
    ref = None
    for rot in (0, 7, 31):
        idx, ovf = stereo._pool_indices(mask_p, None, cap, perm, HW,
                                        rot=jnp.asarray(rot, jnp.int32))
        assert int(ovf) == 0
        s = set(int(v) for v in np.asarray(idx) if int(v) < HW)
        if ref is None:
            ref = s
        assert s == ref


def test_pool_rotation_preserves_priority():
    """Priority (existing-hypothesis) pixels must keep claiming capacity
    first regardless of the create-rank rotation."""
    HW = 256
    perm = stereo._interleave_perm(HW)
    mask = np.zeros(HW, bool)
    mask[:128] = True
    prio = np.zeros(HW, bool)
    prio[:32] = True            # 32 priority pixels among the candidates
    cap = 48                    # room for all priority + 16 creates
    prio_set = {int(np.asarray(perm)[i]) for i in range(32)}
    for rot in (0, 5, 77):
        idx, ovf = stereo._pool_indices(
            jnp.asarray(mask), jnp.asarray(prio), cap, perm, HW,
            rot=jnp.asarray(rot, jnp.int32))
        pooled = set(int(v) for v in np.asarray(idx) if int(v) < HW)
        assert prio_set <= pooled, "priority pixel dropped under rotation"
        assert int(ovf) == 128 - cap
