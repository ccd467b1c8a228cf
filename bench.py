"""Benchmark: one flagship inverse-rendering iteration (fwd + analytic bwd).

Scale mirrors the reference's bunny run at 64x64 (BASELINE.md): 4096 scan
points, B=1200 bins at 1.2 mm, 20k stratified samples per source, Gaussian
smoothing sigma_bin=1 / refine=10 (41 gradient kernel taps), on a ~2k-face
height-field mesh (the reference's CNLOS init meshes are the same order).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is path-samples/s/chip counting forward + backward re-trace
(the reference traces the same paths twice — transient_and_gradient.cpp
:122-237 and :843-1007).  vs_baseline is null: the reference publishes no
numbers (BASELINE.json "published": {}).
"""

import json
import os
import sys
import time

import numpy as np


def build_scene(n=40):
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh

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
    return make_mesh(v, np.array(faces, np.int32))


def main():
    import jax
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.render import inverse_render

    res = int(os.environ.get("BENCH_SCAN_RES", "64"))
    samples = int(os.environ.get("BENCH_SAMPLES", "20000"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    mesh = build_scene()
    F = int(mesh.f.shape[0])
    cfg = nst.RenderConfig(
        num_samples=samples,
        num_bins=1200,
        distance_resolution=1.2e-3,
        sigma_bin=1,
        bin_refine_resolution=10,
        source_chunk=64,
    )
    lighting, lnormal = nst.make_confocal_scan(
        res, lower=(-0.25, -0.25), upper=(0.25, 0.25)
    )
    L = lighting.shape[0]
    key = jax.random.key(0)

    # synthetic data/weight: workload is independent of their values
    B = cfg.num_bins
    data = np.zeros((L, B), np.float32)
    weight = np.ones((L, B), np.float32)

    # warmup (compile)
    t, g, _ = inverse_render(mesh, data, weight, lighting, lnormal, cfg, key)
    jax.block_until_ready((t, g))

    times = []
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        t, g, _ = inverse_render(mesh, data, weight, lighting, lnormal, cfg, k)
        jax.block_until_ready((t, g))
        times.append(time.perf_counter() - t0)

    best = min(times)
    spt = cfg.samples_per_face(F)
    # paths traced: forward + backward re-trace, per source
    paths = 2.0 * L * F * spt
    value = paths / best

    print(json.dumps({
        "metric": "path_samples_per_sec_per_chip_fwd_bwd",
        "value": value,
        "unit": "paths/s",
        "vs_baseline": None,
        "detail": {
            "scan": f"{res}x{res}", "faces": F, "spt": spt,
            "bins": B, "iter_seconds": best,
            "platform": jax.devices()[0].platform,
        },
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
