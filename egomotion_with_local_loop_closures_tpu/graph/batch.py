"""Per-batch pose-graph correction: the MATLAB driver logic, in-process.

Replaces ``matlab_scripts/small_batch_rotavg{,_bootstrap}.m`` +
``perform_rotation_averaging_transition1.m``: assemble keyframe-to-keyframe
odometry edges and loop-closure edges, run robust rotation averaging over
the batch, keep the odometry translations, and re-concatenate non-keyframe
poses onto the averaged keyframe rotations.  The reference crosses a
process boundary (C++ -> text files -> MATLAB -> text files -> restart);
here it is one function call on in-memory arrays between tracking batches.

Array formats mirror the reference files so the same code paths also run
on ``poses_orig.txt``/``matchframes*.txt`` read from disk:
- pose rows: ``frame_id kf_id wx wy wz vx vy vz ...``
- edges carry the pose of ``frame_id`` w.r.t. ``kf_id``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egomotion_with_local_loop_closures_tpu.geom import lie
from egomotion_with_local_loop_closures_tpu.graph import rotation_averaging as ra

# batched, jitted Lie helpers: per-row eager evaluation costs one
# synchronous tunnel round-trip PER OP on the TPU runtime (BASELINE.md
# perf notes), which made each RA batch cost tens of seconds of pure
# dispatch latency
_exp_se3_batch = jax.jit(jax.vmap(lie.exp_se3))
_log_so3_batch = jax.jit(jax.vmap(lie.log_so3))
_compose_pairs = jax.jit(jax.vmap(lie.compose))


def perform_rotation_averaging(odometry: np.ndarray,
                               extra: Optional[np.ndarray],
                               pose_abs: np.ndarray,
                               transition_id: int,
                               kf_interval: int = 8,
                               sigma_deg: float = 5.0) -> np.ndarray:
    """Port of perform_rotation_averaging_transition1.m.

    Args:
      odometry: (N, >=8) rows ``frame_id kf_id pose6`` — per-frame odometry
        edges (matchframes.txt content restricted to the batch).
      extra: (K, >=8) loop-closure edges or None.
      pose_abs: (M, >=8) rows ``frame_id transition_id pose6`` — world poses
        of all batch frames w.r.t. the transition frame, must include the
        transition frame itself as an identity row.
      transition_id: the batch's anchor frame id.

    Returns:
      (M, 7) rows ``frame_id pose6``: corrected poses w.r.t. the transition
      frame (averaged rotations for keyframes, original translations;
      non-keyframe poses re-concatenated onto their keyframe).
    """
    odometry = np.asarray(odometry, dtype=np.float64)
    pose_abs = np.asarray(pose_abs, dtype=np.float64)

    # keep only KF->KF odometry edges (id gap >= kf_interval, :23-29)
    kf_edges = odometry[odometry[:, 0] - odometry[:, 1] >= kf_interval]
    delim = np.zeros((1, odometry.shape[1]))
    delim[0, 0] = delim[0, 1] = transition_id
    parts = [delim, kf_edges]
    if extra is not None and len(extra):
        parts.append(np.asarray(extra, dtype=np.float64)[:, :odometry.shape[1]])
    edges = np.concatenate(parts, axis=0)
    edges = edges[np.argsort(edges[:, 0], kind="stable")]

    # dense node reindex (:53-62)
    node_ids = np.unique(np.concatenate([edges[:, 0], edges[:, 1]]))
    idx_of = {int(f): i for i, f in enumerate(node_ids)}
    m = len(edges)
    I = np.zeros((2, m), np.int64)
    for p in range(m):
        I[0, p] = idx_of[int(edges[p, 1])]   # from = keyframe
        I[1, p] = idx_of[int(edges[p, 0])]   # to = frame
    RR = np.asarray(_exp_se3_batch(
        jnp.asarray(edges[:, 2:8], jnp.float32)))[:, :3, :3]

    R_avg = ra.average_so3_graph(RR, I, sigma_deg=sigma_deg)

    # averaged log-rotations + ORIGINAL translations of the KF world poses
    # (:79-82).  Keyframe selection mirrors BOTH reference branches
    # (perform_rotation_averaging_transition1.m:39-46): bootstrap
    # (is_bootstrap, transition_id==1) keeps id==transition_id plus the
    # absolute keyframes id % kf_interval == 0; steady state keeps
    # (id - transition_id) % kf_interval == 0 where transition_id is
    # itself a keyframe — both reduce to the union below.  (A previous
    # revision used only the steady-state form, which under the
    # frame_counter % K keyframe-id convention selects NON-keyframe rows
    # 9, 17, ... for the bootstrap batch, zeroing every keyframe
    # translation.)
    kf_mask = ((pose_abs[:, 0] == transition_id)
               | (np.mod(pose_abs[:, 0], kf_interval) == 0))
    kf_rows = pose_abs[kf_mask]
    ws = np.asarray(_log_so3_batch(jnp.asarray(R_avg, jnp.float32)))
    so3 = np.zeros((len(node_ids), 7))
    for i, f in enumerate(node_ids):
        row = kf_rows[kf_rows[:, 0] == f]
        trans = row[0, 5:8] if len(row) else np.zeros(3)
        so3[i] = [f, ws[i, 0], ws[i, 1], ws[i, 2],
                  trans[0], trans[1], trans[2]]

    # re-concatenate non-KF poses onto the averaged keyframe poses
    # (:88-98) — host-side bookkeeping picks each row's relative pose and
    # anchor keyframe, then ONE batched compose does all the Lie math
    out = np.zeros((len(pose_abs), 7))
    odo_of = {int(r[0]): r for r in odometry}
    so3_of = {int(r[0]): r for r in so3}
    last_kf = so3[0]
    rel6_all = np.zeros((len(pose_abs), 6), np.float32)
    base_all = np.zeros((len(pose_abs), 6), np.float32)
    is_cat = np.zeros(len(pose_abs), bool)
    for i, row in enumerate(pose_abs):
        f = int(row[0])
        if f in so3_of:
            last_kf = so3_of[f]
            out[i] = [f, *last_kf[1:7]]
        else:
            rel = odo_of.get(f, None)
            rel6_all[i] = rel[2:8] if rel is not None else row[2:8]
            base_all[i] = last_kf[1:7]
            is_cat[i] = True
            out[i, 0] = f
    if is_cat.any():
        cat = np.asarray(_compose_pairs(jnp.asarray(rel6_all[is_cat]),
                                        jnp.asarray(base_all[is_cat])))
        out[is_cat, 1:7] = cat
    return out


def batch_edges_from_files(poses_local: np.ndarray,
                           matchframes: np.ndarray,
                           globalopt: Optional[np.ndarray],
                           transition_id: int
                           ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Filter edge files to the current batch (small_batch_rotavg.m:69-79):
    keep rows whose frame AND keyframe ids are >= the transition frame."""
    mf = matchframes[(matchframes[:, 0] >= transition_id)
                     & (matchframes[:, 1] >= transition_id)]
    go = None
    if globalopt is not None and len(globalopt):
        go = globalopt[(globalopt[:, 0] >= transition_id)
                       & (globalopt[:, 1] >= transition_id)]
        if not len(go):
            go = None
    return mf, go
