"""Visibility-backend scaling sweep over mesh size (VERDICT r2 item #3).

Times one full inverse iteration (fwd + analytic bwd, 8x8 scan, 20k
samples — samples_per_face floors at 1 so R grows linearly with F past
20k) on height-field meshes of ~3k..250k faces for each visibility
backend, and prints one JSON row per (F, backend) with paths/s.

The reference optimizes to 250k faces (exp_bunny/test.py:119); the
candidate-list kernels must show sub-quadratic growth there (the brute
jnp path is O(R*F) and is only run at small F).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.accel import morton_order_faces
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.render.api import _inverse_impl_host

RES = int(os.environ.get("RES", "8"))
REPS = int(os.environ.get("REPS", "2"))


def build(n):
    xs = np.linspace(-0.35, 0.35, n)
    gx, gy = np.meshgrid(xs, xs)
    rng = np.random.RandomState(0)
    z = 0.6 + 0.08 * np.sin(6 * gx) * np.cos(5 * gy) + 0.01 * rng.randn(n, n)
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + n, a + n + 1, a + 1])
    f = morton_order_faces(v, np.array(faces, np.int32))
    return make_mesh(v, f)


def bench_one(mesh, vis, key):
    F = int(mesh.f.shape[0])
    spt0 = 1 + (20000 - 1) // F
    # memory knob: keep the per-chunk ray tensor ~2M rays (the flagship
    # working set) so big meshes don't blow HBM on intermediates
    chunk = max(1, min(64, 2_000_000 // (F * spt0)))
    cfg = nst.RenderConfig(
        num_samples=20000, num_bins=1200, distance_resolution=1.2e-3,
        sigma_bin=1, bin_refine_resolution=10, source_chunk=chunk,
        occl_backend=vis,
    )
    lighting, lnormal = nst.make_confocal_scan(RES, (-0.25, -0.25),
                                               (0.25, 0.25))
    L = lighting.shape[0]
    spt = cfg.samples_per_face(F)
    B = cfg.num_bins
    data = jnp.zeros((L, B), jnp.float32)
    weight = jnp.ones((L, B), jnp.float32)
    lj = jnp.asarray(lighting)
    nj = jnp.asarray(lnormal)

    def one_iter(k):
        t, g = _inverse_impl_host(mesh, data, weight, lj, nj, k,
                                  jnp.float32(0.1), cfg, spt, "vertex")
        return jnp.sum(t) + jnp.sum(g)

    float(one_iter(jax.random.fold_in(key, 999)))   # compile + warm
    ts = []
    for i in range(REPS):
        t0 = time.perf_counter()
        float(one_iter(jax.random.fold_in(key, i)))
        ts.append(time.perf_counter() - t0)
    sec = min(ts)
    paths = 2.0 * L * F * spt
    return {"F": F, "vis": vis, "spt": spt, "iter_s": round(sec, 3),
            "paths_per_s": round(paths / sec)}


def main():
    key = jax.random.key(0)
    grids = {3042: 40, 31250: 126, 99458: 224, 250000: 355}
    plans = {
        3042: ["jnp", "fused", "pallas", ],
        31250: ["fused", "pallas", ],
        99458: ["fused", "pallas"],
        250000: ["pallas"],
    }
    for Ftgt, n in grids.items():
        mesh = build(n)
        for vis in plans[Ftgt]:
            try:
                row = bench_one(mesh, vis, key)
            except Exception as e:  # noqa: BLE001
                row = {"F": int(mesh.f.shape[0]), "vis": vis,
                       "error": f"{type(e).__name__}: {str(e)[:140]}"}
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
