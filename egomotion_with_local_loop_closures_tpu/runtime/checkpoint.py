"""Checkpoint / resume for the ELLC-TPU pipeline.

The reference checkpoints at batch granularity through the filesystem:
``FLAG_SAVE_MATS`` dumps keyframe depth / depth-pyramid-0 / variance mats
as whitespace text under ``bin/Saved_mats/`` (``src/Frame.cpp:698-905``,
path ``src/ExternVariable.h:218``), ``World_pose.mat`` accumulates absolute
poses (``matlab_scripts/small_batch_rotavg.m:22-24``), and resume =
relaunching the binary with a new ``config.txt`` start id
(``src/ToggleFlags.h:135-196``, ``src/main.cpp:156-166``).  Notably the
process restart clears the in-memory loop window, so a resumed run starts
with an empty window — this module reproduces exactly that contract.

Here the whole pipeline state is one pytree of device arrays, so a
checkpoint is a single atomic snapshot:

- ``save`` / ``load``: any pytree <-> one ``.npz`` file (+ JSON metadata).
  Restore shape/treedef comes from a template built with ``jax.eval_shape``
  — no pickling of code, no version-fragile treedef serialization.
- ``CheckpointManager``: rolling retention of the last K snapshots with an
  atomic ``latest`` pointer, one directory per run.
- ``save_mat_text`` / ``load_mat_text``: byte-compatible analogs of the
  reference's ``saveMatAsText`` / ``makeMatFromText`` (space-separated
  values, one row per line, filename ``<id>_<name>.txt``) so depth
  snapshots can round-trip with reference tooling
  (FLAG_SAVE_MATS / FLAG_REPLICATE_NEW_DEPTH replay).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


# ----------------------------------------------------------------- pytree IO

def save(path: str, tree: Any, meta: Optional[Dict[str, Any]] = None) -> None:
    """Write a pytree snapshot to ``<path>.npz`` (+ ``<path>.json``).

    Leaves are host-gathered and stored in flattening order; the structure
    itself is NOT stored — ``load`` rebuilds it from a template with the
    same treedef (see ``template_pipeline_state``)."""
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path + ".npz")
    if meta is not None:
        with open(path + ".json", "w") as f:
            json.dump(meta, f)


def load(path: str, template: Any) -> Any:
    """Restore a pytree saved by ``save``; ``template`` supplies the
    treedef (e.g. from ``jax.eval_shape`` or a live state of the same
    configuration)."""
    with np.load(path + ".npz") as z:
        leaves = [z[k] for k in sorted(z.files)]
    treedef = jax.tree.structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but template expects "
            f"{treedef.num_leaves} — config mismatch?")
    t_leaves = jax.tree.leaves(template)
    cast = [np.asarray(l, dtype=t.dtype) if hasattr(t, "dtype") else l
            for l, t in zip(leaves, t_leaves)]
    return jax.tree.unflatten(treedef, cast)


def load_meta(path: str) -> Dict[str, Any]:
    with open(path + ".json") as f:
        return json.load(f)


def template_pipeline_state(cfg, rows: Optional[int] = None,
                            cols: Optional[int] = None):
    """Abstract PipelineState with the treedef/shapes/dtypes that
    ``init_pipeline`` produces for ``cfg`` — built with ``jax.eval_shape``
    (zero FLOPs, no device memory)."""
    import jax.numpy as jnp

    from egomotion_with_local_loop_closures_tpu.runtime import pipeline

    r = rows if rows is not None else cfg.rows
    c = cols if cols is not None else cfg.cols
    img = jax.ShapeDtypeStruct((r, c), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return jax.eval_shape(
        lambda i, k: pipeline.init_pipeline(i, k, cfg), img, key)


# ------------------------------------------------------- rolling checkpoints

class CheckpointManager:
    """Rolling snapshots under ``directory/step_<N>`` with retention of the
    newest ``keep`` and an atomically-updated ``latest`` pointer file."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = directory
        self.keep = keep
        os.makedirs(directory, exist_ok=True)

    def _step_path(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:09d}")

    def save(self, step: int, tree: Any,
             meta: Optional[Dict[str, Any]] = None) -> str:
        meta = dict(meta or {})
        meta["step"] = step
        path = self._step_path(step)
        save(path, tree, meta)
        tmp = os.path.join(self.directory, ".latest.tmp")
        with open(tmp, "w") as f:
            f.write(str(step))
        os.replace(tmp, os.path.join(self.directory, "latest"))
        self._gc()
        return path

    def all_steps(self):
        out = []
        for n in os.listdir(self.directory):
            if n.startswith("step_") and n.endswith(".npz"):
                out.append(int(n[len("step_"):-len(".npz")]))
        return sorted(out)

    def latest_step(self) -> Optional[int]:
        p = os.path.join(self.directory, "latest")
        if not os.path.exists(p):
            steps = self.all_steps()
            return steps[-1] if steps else None
        with open(p) as f:
            return int(f.read().strip())

    def restore(self, template: Any, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        path = self._step_path(step)
        return load(path, template), load_meta(path)

    def _gc(self) -> None:
        steps = self.all_steps()
        for s in steps[:-self.keep] if self.keep > 0 else []:
            for ext in (".npz", ".json"):
                try:
                    os.remove(self._step_path(s) + ext)
                except FileNotFoundError:
                    pass


# ------------------------------------------------- reference text snapshots

def save_mat_text(mat: np.ndarray, frame_id: int, name: str,
                  directory: str) -> str:
    """saveMatAsText (Frame.cpp:698-734): one row per line, values
    space-separated with a trailing space, file ``<id>_<name>.txt``."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{frame_id}_{name}.txt")
    a = np.asarray(mat, dtype=np.float32)
    with open(path, "w") as f:
        for row in a:
            f.write(" ".join(f"{v:g}" for v in row) + " \n")
    return path


def load_mat_text(frame_id: int, name: str, directory: str,
                  shape=None) -> np.ndarray:
    """makeMatFromText (Frame.cpp:737-795): read the whitespace grid back;
    ``shape`` optionally validates dimensions like the pre-allocated cv::Mat
    the reference fills."""
    path = os.path.join(directory, f"{frame_id}_{name}.txt")
    rows = []
    with open(path) as f:
        for line in f:
            vals = line.split()
            if vals:
                rows.append([float(v) for v in vals])
    a = np.asarray(rows, dtype=np.float32)
    if shape is not None and tuple(a.shape) != tuple(shape):
        raise ValueError(f"{path}: shape {a.shape} != expected {shape}")
    return a
