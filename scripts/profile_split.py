"""Profile split: visibility vs forward splat vs backward, on the real chip.

Times three jitted programs at bench scale (smaller scan to keep it quick):
  1. trace-only     (sampling + visibility; returns sum of valid mask)
  2. trace+forward  (adds the fine-histogram splat + smoothing)
  3. full inverse   (adds the gradient pass, which re-traces)
Differences give the per-stage cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.render.api import (
    _inverse_impl, _render_transient_impl, _chunks)
from nlos_surface_optimization_tpu.render.core import trace_chunk
from bench import build_scene

RES = int(os.environ.get("RES", "32"))
SAMPLES = int(os.environ.get("SAMPLES", "20000"))
VIS = os.environ.get("VIS", "culled")

mesh = build_scene()
F = int(mesh.f.shape[0])
cfg = nst.RenderConfig(
    num_samples=SAMPLES, num_bins=1200, distance_resolution=1.2e-3,
    sigma_bin=1, bin_refine_resolution=10, source_chunk=64,
    occl_backend=VIS if VIS in ("pallas", "mxu") else "jnp",
)
lighting, lnormal = nst.make_confocal_scan(RES, (-0.25, -0.25), (0.25, 0.25))
L = lighting.shape[0]
spt = cfg.samples_per_face(F)
key = jax.random.key(0)

B = cfg.num_bins
data = jnp.zeros((L, B), jnp.float32)
weight = jnp.ones((L, B), jnp.float32)
lighting = jnp.asarray(lighting)
lnormal = jnp.asarray(lnormal)
alpha = jnp.float32(0.1)


@jax.jit
def trace_only(k):
    lit, nrm, L_, Lc, nch = _chunks(lighting, lnormal, cfg)

    def one(args):
        lc, nc_, off = args
        rays = trace_chunk(mesh, lc, nc_, k, cfg, spt, source_offset=off)
        return jnp.sum(rays.valid.astype(jnp.float32))

    offsets = jnp.arange(nch) * (L_ // nch if nch else 1)
    return jax.lax.map(one, (lit, nrm, offsets)).sum()


@jax.jit
def fwd_only(k):
    t = _render_transient_impl(mesh, lighting, lnormal, k, alpha, cfg, spt,
                               cfg.forward_refine)
    return jnp.sum(t)


@jax.jit
def full(k):
    t, g = _inverse_impl(mesh, data, weight, lighting, lnormal, k, alpha,
                         cfg, spt, "vertex")
    return jnp.sum(t) + jnp.sum(g)


@jax.jit
def trivial(k):
    return jnp.sum(jax.random.key_data(k).astype(jnp.float32))


def timeit(f, name, n=4):
    float(f(jax.random.fold_in(key, 9999)))  # compile+warm
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(jax.random.fold_in(key, i)))
        ts.append(time.perf_counter() - t0)
    print(f"{name:12s} min={min(ts)*1e3:9.1f} ms  all={[round(t*1e3) for t in ts]}")
    return min(ts)


print("platform:", jax.devices()[0].platform, " scan:", RES, "spt:", spt,
      "F:", F, "vis:", VIS)
t0 = timeit(trivial, "overhead")
t1 = timeit(trace_only, "trace")
t2 = timeit(fwd_only, "trace+fwd")
t3 = timeit(full, "full")
print(f"visibility ~{(t1-t0)*1e3:.0f} ms | fwd splat ~{(t2-t1)*1e3:.0f} ms | "
      f"bwd (retrace+grad) ~{(t3-t2)*1e3:.0f} ms | total {(t3-t0)*1e3:.0f} ms")
