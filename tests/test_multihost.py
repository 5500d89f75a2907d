"""Multi-host (multi-process) execution: jax.distributed bootstrap + a
2-process CPU mesh running the edge-sharded BA psum path and the
pixel-sharded GN psum across processes.

The reference's closest analog is its filesystem pipeline (text files +
process restart, bin/ELLC_LC.sh:4-19); here two OS processes join one
JAX runtime (parallel.mesh.initialize_multihost) and the collectives run
through the runtime instead of the disk.  Each child process owns 2
virtual CPU devices, the global mesh spans 4.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_CHILD = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from egomotion_with_local_loop_closures_tpu.parallel import mesh as mesh_mod
    from egomotion_with_local_loop_closures_tpu.graph import ba, sim3
    from egomotion_with_local_loop_closures_tpu.track import alignment
    from egomotion_with_local_loop_closures_tpu.config import ELLCConfig

    pid = int(sys.argv[1])
    port = sys.argv[2]
    mesh_mod.initialize_multihost(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    assert len(jax.local_devices()) == 2

    def make_global(mesh, spec, full):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(full))

    # ---- leg 1: edge-sharded BA across the 2 processes ----
    rng = np.random.default_rng(0)          # identical in both processes
    n_nodes = 12
    gt = np.cumsum(rng.normal(size=(n_nodes, 7)).astype(np.float32) * 0.05,
                   axis=0)
    # 11 chain + 9 two-hop edges = 20, already a multiple of the 4-way
    # edge shard (refine_sharded would zero-pad otherwise)
    edges = np.asarray([[k, k + 1] for k in range(n_nodes - 1)]
                       + [[k, k + 2] for k in range(n_nodes - 3)],
                       np.int32)
    meas = np.stack([
        np.array(sim3.log_sim3(sim3.exp_sim3(jnp.asarray(gt[j]))
                               @ sim3.inv_sim3(sim3.exp_sim3(
                                   jnp.asarray(gt[i])))))
        for i, j in edges]).astype(np.float32)
    weights = np.ones((len(edges),), np.float32)
    init = gt + rng.normal(size=gt.shape).astype(np.float32) * 0.03
    init[0] = gt[0]

    ba_mesh = Mesh(np.asarray(jax.devices()).reshape(4), ("edge",))
    graph = sim3.Sim3Graph(
        nodes=make_global(ba_mesh, P(), init),
        edges=make_global(ba_mesh, P("edge"), edges),
        meas=make_global(ba_mesh, P("edge"), meas),
        weights=make_global(ba_mesh, P("edge"), weights))
    out = ba.refine_sharded(graph, ba_mesh, num_iters=6, cg_iters=20)
    nodes = np.asarray(out.nodes)           # replicated -> addressable
    err = float(np.abs(nodes - gt).max())
    assert err < 1e-3, f"BA across processes did not converge: {err}"

    # ---- leg 2: pixel-sharded GN psum across the 2 processes ----
    from egomotion_with_local_loop_closures_tpu.parallel import sharded
    cfg = ELLCConfig(rows=48, cols=64, fx=55.0, fy=55.0, cx=32.0, cy=24.0)
    rng2 = np.random.default_rng(1)
    img0 = rng2.uniform(0, 255, (48, 64)).astype(np.float32)
    img1 = np.roll(img0, 1, axis=1) * 0.98
    depth = np.ones((48, 64), np.float32)
    var = np.full((48, 64), 1e-3, np.float32)
    gx = np.gradient(img1, axis=1).astype(np.float32)
    gy = np.gradient(img1, axis=0).astype(np.float32)
    gn_mesh = Mesh(np.asarray(jax.devices()).reshape(1, 4),
                   ("video", "pixel"))
    kf = alignment.KeyframeLevel(
        make_global(gn_mesh, P("pixel", None), img0),
        make_global(gn_mesh, P("pixel", None), depth),
        make_global(gn_mesh, P("pixel", None), var))
    cur = alignment.CurrentLevel(
        make_global(gn_mesh, P(), img1),
        make_global(gn_mesh, P(), gx),
        make_global(gn_mesh, P(), gy))
    pose = make_global(gn_mesh, P(), np.zeros(6, np.float32))
    H, g = sharded.sharded_gn_quantities(kf, cur, pose, 0, cfg, gn_mesh)
    H, g = np.asarray(H), np.asarray(g)
    # golden: the plain single-device linearization on the full arrays
    H_ref, g_ref, _, _, _ = alignment._gn_quantities(
        alignment.KeyframeLevel(jnp.asarray(img0), jnp.asarray(depth),
                                jnp.asarray(var)),
        alignment.CurrentLevel(jnp.asarray(img1), jnp.asarray(gx),
                               jnp.asarray(gy)),
        jnp.zeros(6), cfg.level_intrinsics(0), cfg)
    np.testing.assert_allclose(H, np.asarray(H_ref), rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(g, np.asarray(g_ref), rtol=2e-4, atol=2e-2)

    print(f"child {pid} OK", flush=True)
""")


def test_two_process_cpu_mesh_ba_and_gn_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # child sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen([sys.executable, str(script), str(pid),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out[-4000:]}"
        assert f"child {pid} OK" in out
