"""Benchmark: one flagship inverse-rendering iteration (fwd + analytic bwd).

Scale mirrors the reference's bunny run at 64x64 (BASELINE.md): 4096 scan
points, B=1200 bins at 1.2 mm, 20k stratified samples per source, Gaussian
smoothing sigma_bin=1 / refine=10, on a ~3k-face height-field mesh (the
reference's CNLOS init meshes are the same order).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The metric is path-samples/s/chip counting forward + backward re-trace
(the reference traces the same paths twice — transient_and_gradient.cpp
:122-237 and :843-1007).  vs_baseline is null: the reference publishes no
numbers (BASELINE.json "published": {}).

Timing methodology (required by this rig): the TPU is reached through an
async tunnel where block_until_ready() is a no-op and only a device->host
fetch synchronizes (first fetch pays a ~3 min cold-start).  So: jit ONE
function that runs K chained iterations (keys folded per iteration) and
returns a scalar checksum; warm up the fetch path; then time
(dispatch + fetch) for K=1 and K=REPS and difference them — fixed sync
overhead cancels, per-iteration time is the slope.
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
    from nlos_surface_optimization_tpu.geometry.accel import morton_order_faces
    f = morton_order_faces(v, np.array(faces, np.int32))
    return make_mesh(v, f)


def _time_one(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def run_bench(res, samples, reps, vis):
    import jax
    import jax.numpy as jnp
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.render.api import (
        _inverse_impl,
        _inverse_impl_host,
    )

    mesh = build_scene()
    F = int(mesh.f.shape[0])
    cfg = nst.RenderConfig(
        num_samples=samples,
        num_bins=1200,
        distance_resolution=1.2e-3,
        sigma_bin=1,
        bin_refine_resolution=10,
        source_chunk=64,
        occl_backend=vis if vis in ("fused", "pallas", "mxu", "jnp") else "jnp",
    )
    lighting, lnormal = nst.make_confocal_scan(
        res, lower=(-0.25, -0.25), upper=(0.25, 0.25)
    )
    L = lighting.shape[0]
    spt = cfg.samples_per_face(F)
    key = jax.random.key(0)

    B = cfg.num_bins
    data = jnp.zeros((L, B), jnp.float32)
    weight = jnp.ones((L, B), jnp.float32)
    lighting = jnp.asarray(lighting)
    lnormal = jnp.asarray(lnormal)
    alpha = jnp.float32(0.1)

    # Host-chunked dispatch: one short XLA program per source chunk.  The
    # serving tunnel bounds per-program wall time (a fused 64x64 iteration
    # is one ~40 s program and gets the worker killed); chunk programs
    # dispatch asynchronously, so only the final scalar fetch synchronizes
    # and the timing still measures the full iteration.
    def one_iter(k):
        t, g = _inverse_impl_host(mesh, data, weight, lighting, lnormal, k,
                                  alpha, cfg, spt, "vertex")
        return jnp.sum(t) + jnp.sum(g)

    @jax.jit
    def trivial(k):
        return jnp.sum(jax.random.key_data(k).astype(jnp.float32))

    # warm-up: compile + pay the tunnel's cold fetch once (~3 min).
    # The tunnel kills long-running XLA programs, so each iteration is a
    # separate (dispatch + scalar fetch); the fetch-path overhead is
    # measured with a trivial program and subtracted.
    float(trivial(key))
    float(one_iter(jax.random.fold_in(key, 10_001)))

    overhead = min(
        _time_one(lambda: float(trivial(jax.random.fold_in(key, i))))
        for i in range(3)
    )
    times = [
        _time_one(lambda: float(one_iter(jax.random.fold_in(key, 100 + i))))
        for i in range(reps)
    ]
    t1 = min(times)
    tN = sum(times)
    per_iter = max(t1 - overhead, 1e-9)

    paths = 2.0 * L * F * spt  # forward + backward re-trace
    value = paths / per_iter

    return {
        "metric": "path_samples_per_sec_per_chip_fwd_bwd",
        "value": value,
        "unit": "paths/s",
        "vs_baseline": None,
        "detail": {
            "scan": f"{res}x{res}", "faces": F, "spt": spt,
            "bins": B, "iter_seconds": per_iter,
            "t_single": t1, "t_chained": tN, "reps": reps,
            "visibility": vis,
            "platform": jax.devices()[0].platform,
        },
    }


def main():
    res = int(os.environ.get("BENCH_SCAN_RES", "64"))
    samples = int(os.environ.get("BENCH_SAMPLES", "20000"))
    reps = int(os.environ.get("BENCH_REPS", "8"))
    # visibility backend: 'fused' (occlusion+splat kernel, the TPU fast
    # path) | 'pallas' | 'jnp' | 'culled' | 'mxu'
    vis = os.environ.get("BENCH_VIS", "fused")

    if os.environ.get("BENCH_SINGLE_SCALE"):
        print(json.dumps(run_bench(res, samples, reps, vis)))
        return

    # Fall back to smaller scales rather than printing nothing.  Each scale
    # runs in a FRESH subprocess: when the TPU tunnel's worker crashes, the
    # PJRT client in that process is dead for good, but a new process
    # reconnects cleanly.
    import subprocess

    last_err = "unknown"
    for r, s in ((res, samples), (res // 2, samples // 2),
                 (16, 4000), (8, 2000)):
        if r < 8:
            continue
        env = dict(os.environ, BENCH_SINGLE_SCALE="1",
                   BENCH_SCAN_RES=str(r), BENCH_SAMPLES=str(s))
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=1500,
            )
            line = ""
            for ln in (p.stdout or "").strip().splitlines():
                if ln.startswith("{"):
                    line = ln
            if p.returncode == 0 and line:
                out = json.loads(line)
                if (r, s) != (res, samples):
                    out["detail"]["fallback_from_error"] = str(last_err)[:200]
                print(json.dumps(out))
                return
            last_err = (p.stderr or "").strip().splitlines()[-1:] or ["no output"]
        except subprocess.TimeoutExpired:
            last_err = f"timeout at {r}x{r}"
    print(json.dumps({
        "metric": "path_samples_per_sec_per_chip_fwd_bwd",
        "value": 0.0, "unit": "paths/s", "vs_baseline": None,
        "detail": {"error": str(last_err)[:500]},
    }))


if __name__ == "__main__":
    # Persistent compile cache: the Mosaic kernel's first compile on this
    # toolchain is minutes; cache it across bench processes/scales.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
