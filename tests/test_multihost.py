"""Two-process jax.distributed test: spawn 2 CPU processes with a
localhost coordinator, build the global source mesh spanning both, and
assert the sharded transient equals the single-process render.

This exercises the actual DCN code path (jax.distributed.initialize +
cross-process collectives over the gloo/grpc backend), not just the
single-process 8-virtual-device mesh the other sharding tests use —
TPU-native replacement for the reference's multiprocessing pools
(mesh_optimization/main_multiprocess.py:10-12, SURVEY.md §2.4)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, os.environ["NLOS_ROOT"])

from nlos_surface_optimization_tpu.parallel import multihost
multihost.initialize(os.environ["COORD"], 2, int(os.environ["PID_IDX"]))
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np
import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.parallel import sharded_inverse_render

rng = np.random.RandomState(0)
n = 6
xs = np.linspace(-0.25, 0.25, n)
gx, gy = np.meshgrid(xs, xs)
z = 0.5 + 0.08 * np.sin(6 * gx) * np.cos(5 * gy) + 0.02 * rng.randn(n, n)
v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
faces = []
for i in range(n - 1):
    for j in range(n - 1):
        a = i * n + j
        faces.append([a, a + n, a + 1])
        faces.append([a + n, a + n + 1, a + 1])
f = np.array(faces, np.int32)
mesh = make_mesh(v, f, dtype=np.float64)

cfg = nst.RenderConfig(num_samples=900, num_bins=180,
                       distance_resolution=7e-3, source_chunk=0)
lighting, lnormal = nst.make_confocal_scan(4)
data = np.ones((16, 180), np.float64) * 1e-3
w = np.ones_like(data)
dmesh = multihost.global_source_mesh()
key = jax.random.key(3)
t, g = sharded_inverse_render(mesh, data, w, lighting, lnormal, cfg, key,
                              dmesh)
# the transient is source-sharded across processes; gather via allgather
t = jax.experimental.multihost_utils.process_allgather(t, tiled=True)
if multihost.is_coordinator():
    out = {"t": np.asarray(t).reshape(-1).tolist()[:40],
           "t_sum": float(np.asarray(t).sum()),
           "g_sum": float(np.asarray(g).sum()),
           "g00": float(np.asarray(g)[0, 0]),
           "summary": multihost.scaling_summary()}
    with open(os.environ["OUT_JSON"], "w") as fh:
        json.dump(out, fh)
print("worker", os.environ["PID_IDX"], "done", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_matches_single(tmp_path):
    port = _free_port()
    out_json = str(tmp_path / "mh.json")
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith(("JAX_", "XLA_"))}
    procs = []
    for pid in range(2):
        env = dict(env_base, COORD=f"127.0.0.1:{port}", PID_IDX=str(pid),
                   NLOS_ROOT=ROOT, OUT_JSON=out_json)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode(errors="replace"))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed workers timed out (ports/backend "
                    "unavailable in this sandbox)")
    for p, o in zip(procs, outs):
        if p.returncode != 0 and ("UNAVAILABLE" in o or "DEADLINE" in o
                                  or "permission" in o.lower()):
            pytest.skip(f"jax.distributed unavailable: {o[-400:]}")
        assert p.returncode == 0, o[-2000:]
    with open(out_json) as fh:
        got = json.load(fh)
    assert got["summary"]["processes"] == 2
    assert got["summary"]["global_devices"] == 4

    # single-process reference on a 4-virtual-device mesh (same shard count,
    # so the counter RNG yields bit-identical sampling)
    import jax
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.parallel import (
        make_source_mesh,
        sharded_inverse_render,
    )

    rng = np.random.RandomState(0)
    n = 6
    xs = np.linspace(-0.25, 0.25, n)
    gx, gy = np.meshgrid(xs, xs)
    z = (0.5 + 0.08 * np.sin(6 * gx) * np.cos(5 * gy)
         + 0.02 * rng.randn(n, n))
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + n, a + n + 1, a + 1])
    f = np.array(faces, np.int32)
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=900, num_bins=180,
                           distance_resolution=7e-3, source_chunk=0)
    lighting, lnormal = nst.make_confocal_scan(4)
    data = np.ones((16, 180), np.float64) * 1e-3
    w = np.ones_like(data)
    dmesh = make_source_mesh(jax.devices()[:4])
    t1, g1 = sharded_inverse_render(mesh, data, w, lighting, lnormal, cfg,
                                    jax.random.key(3), dmesh)
    t1 = np.asarray(t1)
    np.testing.assert_allclose(got["t_sum"], float(t1.sum()), rtol=1e-12)
    np.testing.assert_allclose(got["g_sum"], float(np.asarray(g1).sum()),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(got["t"]),
                               t1.reshape(-1)[:40], rtol=1e-12)
