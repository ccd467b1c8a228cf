"""Fine-grained split of the non-visibility iteration cost on the chip.

Times, at a fixed trace (pallas visibility), jitted programs that stop at
successive stages of the forward splat and the analytic backward:
  shade      trace + per-ray contribution (no scatter)
  fwd        trace + full forward_chunk (adds the segment-sum splat)
  taps       trace + _tap_reductions (the K-tap diff gathers)
  gradmath   trace + full per-ray gradient vectors (no vertex scatter)
  bwd        trace + full backward_chunk
Differences localize the scatter, gather, and math costs.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.render import core
from nlos_surface_optimization_tpu.render.core import (
    trace_chunk, forward_chunk, backward_chunk, _gradient_terms,
    _tap_reductions)
from nlos_surface_optimization_tpu.render.kernels import gaussian_kernel
from bench import build_scene

RES = int(os.environ.get("RES", "16"))
SAMPLES = int(os.environ.get("SAMPLES", "20000"))

mesh = build_scene()
F = int(mesh.f.shape[0])
cfg = nst.RenderConfig(
    num_samples=SAMPLES, num_bins=1200, distance_resolution=1.2e-3,
    sigma_bin=1, bin_refine_resolution=10, source_chunk=64,
    occl_backend="pallas",
)
lighting, lnormal = nst.make_confocal_scan(RES, (-0.25, -0.25), (0.25, 0.25))
L = lighting.shape[0]
Lc = cfg.source_chunk
nc = L // Lc
spt = cfg.samples_per_face(F)
key = jax.random.key(0)
B = cfg.num_bins
diff = jnp.ones((L, B), jnp.float32) * 1e-3
lighting = jnp.asarray(lighting).reshape(nc, Lc, 3)
lnormal = jnp.asarray(lnormal).reshape(nc, Lc, 3)


def over_chunks(body):
    def run(k):
        def one(args):
            lc, nc_, off = args
            rays = trace_chunk(mesh, lc, nc_, k, cfg, spt, source_offset=off)
            return body(rays, nc_, off)
        offsets = jnp.arange(nc) * Lc
        return jax.lax.map(one, (lighting, lnormal, offsets)).sum()
    return jax.jit(run)


def shade_body(rays, nc_, off):
    onorm = nc_[:, None, None, :]
    cos2 = jnp.sum(onorm * rays.dirs, axis=-1)
    cos3 = -jnp.sum(rays.normal * rays.dirs, axis=-1)
    ff = jnp.maximum(0.0, cos3 * cos2) / (rays.h * rays.h)
    contrib = rays.area[None, :, None] * rays.albedo * ff * ff
    contrib = jnp.where(rays.valid, contrib, 0.0)
    return jnp.sum(contrib)


def fwd_body(rays, nc_, off):
    return jnp.sum(forward_chunk(rays, nc_, cfg, spt, cfg.forward_refine))


def taps_body(rays, nc_, off):
    weights, deltas = gaussian_kernel(
        cfg.distance_resolution, cfg.bin_refine_resolution, cfg.sigma_bin)
    A, Bw = _tap_reductions(rays, diff, off, cfg, weights, deltas)
    return jnp.sum(A) + jnp.sum(Bw)


def gradmath_body(rays, nc_, off):
    t1, t2, intensity, _ = _gradient_terms(rays, nc_, cfg, None)
    weights, deltas = gaussian_kernel(
        cfg.distance_resolution, cfg.bin_refine_resolution, cfg.sigma_bin)
    A, Bw = _tap_reductions(rays, diff, off, cfg, weights, deltas)
    sigma2 = cfg.sigma * cfg.sigma
    gauss_vec = (2.0 / sigma2) * rays.dirs * (intensity * Bw)[..., None]
    v1 = mesh.v[mesh.f[:, 0]][None, :, None, :]
    v2 = mesh.v[mesh.f[:, 1]][None, :, None, :]
    v3 = mesh.v[mesh.f[:, 2]][None, :, None, :]
    edges = (v3 - v2, v1 - v3, v2 - v1)
    scale = (jnp.where(rays.valid, 1.0, 0.0) * rays.area[None, :, None])[..., None]
    tot = 0.0
    for k in range(3):
        gk = ((t1 * A[..., None] + gauss_vec) * rays.bary[..., k:k + 1]
              + jnp.cross(t2, jnp.broadcast_to(edges[k], t2.shape)) * A[..., None])
        tot = tot + jnp.sum(gk * scale)
    return tot


def bwd_body(rays, nc_, off):
    return jnp.sum(backward_chunk(rays, mesh, nc_, diff, off, cfg, spt))


def trace_body(rays, nc_, off):
    return jnp.sum(rays.valid.astype(jnp.float32))


def timeit(f, name, n=3):
    float(f(jax.random.fold_in(key, 9999)))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(f(jax.random.fold_in(key, i)))
        ts.append(time.perf_counter() - t0)
    print(f"{name:10s} min={min(ts)*1e3:9.1f} ms")
    return min(ts)


print("platform:", jax.devices()[0].platform, "scan:", RES, "spt:", spt, "F:", F)
t_tr = timeit(over_chunks(trace_body), "trace")
t_sh = timeit(over_chunks(shade_body), "shade")
t_fw = timeit(over_chunks(fwd_body), "fwd")
t_tp = timeit(over_chunks(taps_body), "taps")
t_gm = timeit(over_chunks(gradmath_body), "gradmath")
t_bw = timeit(over_chunks(bwd_body), "bwd")
print(f"shading ~{(t_sh-t_tr)*1e3:.0f} | splat-scatter ~{(t_fw-t_sh)*1e3:.0f} | "
      f"tap-gathers ~{(t_tp-t_tr)*1e3:.0f} | gradmath ~{(t_gm-t_tp)*1e3:.0f} | "
      f"vertex-scatter ~{(t_bw-t_gm)*1e3:.0f}")
