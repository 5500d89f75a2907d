"""Measure BA iters/s (the BASELINE.json north-star metric) on the chip.

One 'iter' = one damped-GN iteration of graph/ba.py: per-edge analytic
Jacobians + robust weights + block-Jacobi preconditioner + a fixed-trip
PCG solve (cg_iters matvecs) + manifold retraction.  Graph sizes span a
keyframe window (the production ELLC-LC case) up to a long-video global
graph.  Prints one JSON line per size.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

_ = float(jnp.asarray(1.0) + 1.0)   # honest sync mode (BASELINE.md)

from egomotion_with_local_loop_closures_tpu.graph import ba, sim3  # noqa: E402


@jax.jit
def _edge_meas(gt_i, gt_j):
    """Batched ground-truth relative measurements (ONE dispatch — an
    eager per-edge loop costs a tunnel round trip per op)."""
    Z = sim3.exp_sim3(gt_j) @ sim3.inv_sim3(sim3.exp_sim3(gt_i))
    return sim3.log_sim3(Z)


def make_graph(rng, n_nodes, extra_per_node=3):
    gt = np.cumsum(rng.normal(size=(n_nodes, 7)).astype(np.float32)
                   * np.asarray([.05, .05, .05, .2, .2, .2, .02],
                                np.float32), axis=0)
    edges = [[k, k + 1] for k in range(n_nodes - 1)]
    for _ in range((n_nodes - 1) * (extra_per_node - 1)):
        i, j = rng.choice(n_nodes, 2, replace=False)
        edges.append([int(min(i, j)), int(max(i, j))])
    e = np.asarray(edges, np.int32)
    meas = np.array(_edge_meas(jnp.asarray(gt[e[:, 0]]),
                               jnp.asarray(gt[e[:, 1]])))
    meas += rng.normal(size=meas.shape).astype(np.float32) * 0.01
    init = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.02
    init[0] = gt[0]
    return sim3.Sim3Graph(nodes=jnp.asarray(init),
                          edges=jnp.asarray(e),
                          meas=jnp.asarray(meas),
                          weights=jnp.ones((len(edges),), jnp.float32))


def main():
    rng = np.random.default_rng(0)
    num_iters, cg_iters = 10, 25
    for n_nodes in (64, 512, 4096):
        graph = make_graph(rng, n_nodes)
        out = ba.refine(graph, num_iters=num_iters, cg_iters=cg_iters)
        jax.block_until_ready(out)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = ba.refine(graph, num_iters=num_iters, cg_iters=cg_iters)
            # read real bytes INSIDE the loop: on an async runtime a
            # read-after-loop would time only the last solve's execution
            # plus N dispatches (BASELINE.md measurement-honesty notes)
            _ = float(np.asarray(out.rms_history)[-1])
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "metric": "ba_iters_per_s", "nodes": n_nodes,
            "edges": int(graph.edges.shape[0]),
            "cg_iters": cg_iters,
            "value": round(num_iters / dt, 1), "unit": "GN iters/s",
            "final_rms": float(np.asarray(out.rms_history)[-1]),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
