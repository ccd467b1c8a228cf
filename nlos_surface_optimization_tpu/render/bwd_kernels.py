"""Fused analytic-backward Pallas kernel (the second hot loop).

The reference's gradient pass (transient_and_gradient.cpp:843-1007) is the
same cost as its forward; through round 3 this repo ran it as plain XLA
(render/core.py::backward_chunk) — ~45% of the flagship iteration, nearly
all of it HBM traffic through [Lc, F, spt, 3] intermediates (t1, t2, P,
bary products) that XLA materializes between fusions.

This kernel folds the ENTIRE per-ray gradient math plus the per-face
reduction into one VMEM-resident pass:

  inputs    one [16, 128] row-tile per (source, face-block): dirs(3),
            shading normal(3), source normal(3), half-length h(1),
            albedo(1), 1/(2*area)(1), bary1/bary2(2), and the two
            PRE-REDUCED temporal factors Aw / Bws(2) — the K-tap Gaussian
            reductions collapse to per-fine-bin table gathers in XLA
            (core._tap_reductions), so the kernel sees two scalars per ray.
  math      t1 / t2 / gn / gauss terms exactly as backward_chunk
            (clamped cosines, the reference's formulas at
            transient_and_gradient.cpp:944-1001), ~60 VPU flops/ray.
  reduce    the 12 per-ray outputs (P*bary_k for k=1..3, S2) contract
            against a CONSTANT block-diagonal one-hot [128, fpb<=128]
            (lane l belongs to face l//spt) on the MXU — per-face sums
            with no scatter.  Rays are (face, sample)-ordered, so the
            matrix is static.
  revisit   grid (face_block, source): the [16, 128] output face-tile
            stays VMEM-resident while every source accumulates into it
            (first-visit zeroing via the source grid index).

Per-face cross products against opposite edges (linear in the reduced
T2f — see backward_chunk's hoist) and the faces->vertices segment-sum
stay in XLA: they touch [F, 3] data, one-thousandth of the ray tensors.

HBM traffic drops from ~15 ray-sized tensors round-tripped to ONE 64-byte
row-tile read per ray.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 128  # rays per block (lanes)


def _bwd_kernel(rows_ref, out_ref, *, spt, use_gn, eps_area):
    l = pl.program_id(1)

    def row(r):
        return rows_ref[0, 0, r:r + 1, :]          # [1, RB]

    dx, dy, dz = row(0), row(1), row(2)
    nx, ny, nz = row(3), row(4), row(5)
    ox, oy, oz = row(6), row(7), row(8)
    h = row(9)
    alb = row(10)
    inv2a = row(11)
    b1 = row(12)
    b2 = row(13)
    aw = row(14)
    bws = row(15)

    cos2 = jnp.maximum(ox * dx + oy * dy + oz * dz, 0.0)
    cos3 = jnp.maximum(-(nx * dx + ny * dy + nz * dz), 0.0)
    hs = jnp.maximum(h, 1e-12)
    inv_h2 = 1.0 / (hs * hs)
    cc = cos2 * cos3
    ff = cc * inv_h2
    inten = alb * ff * ff

    # t1 = albedo * 2*cc*(onorm*cos3 - normal*cos2 - 4*dirs*cc)/h^5
    s1 = alb * 2.0 * cc * inv_h2 * inv_h2 / hs
    t1x = s1 * (ox * cos3 - nx * cos2 - 4.0 * dx * cc)
    t1y = s1 * (oy * cos3 - ny * cos2 - 4.0 * dy * cc)
    t1z = s1 * (oz * cos3 - nz * cos2 - 4.0 * dz * cc)

    # t2 = (normal*intensity + gn) / (2*area)
    t2x = nx * inten
    t2y = ny * inten
    t2z = nz * inten
    if use_gn:
        sg = -2.0 * alb * cos3 * cos2 * cos2 * inv_h2 * inv_h2
        gx = sg * dx
        gy = sg * dy
        gz = sg * dz
        dot = gx * nx + gy * ny + gz * nz
        t2x += gx - nx * dot
        t2y += gy - ny * dot
        t2z += gz - nz * dot
    t2x = t2x * inv2a
    t2y = t2y * inv2a
    t2z = t2z * inv2a

    # P = t1*Aw + dirs * (intensity * Bws)
    gsc = inten * bws
    px = t1x * aw + dx * gsc
    py = t1y * aw + dy * gsc
    pz = t1z * aw + dz * gsc
    s2x = t2x * aw
    s2y = t2y * aw
    s2z = t2z * aw

    b3 = 1.0 - b1 - b2
    zero = jnp.zeros_like(px)
    u = jnp.concatenate([
        px * b1, py * b1, pz * b1,
        px * b2, py * b2, pz * b2,
        px * b3, py * b3, pz * b3,
        s2x, s2y, s2z,
        zero, zero, zero, zero,
    ], axis=0)                                     # [16, RB]

    # constant one-hot: lane l -> face column l // spt
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, RB), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (RB, RB), 1)
    M = (lane // spt == col).astype(jnp.float32)

    acc = jax.lax.dot_general(
        u, M, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                              # [16, RB]

    @pl.when(l == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    out_ref[0] += acc


@functools.partial(
    jax.jit, static_argnames=("spt", "use_gn", "interpret"))
def backward_face_sums_pallas(rows, spt: int, use_gn: bool,
                              interpret: bool = False):
    """rows [Lc, nfb, 16, RB] -> per-face partial sums [nfb, 16, RB].

    Row layout per ray lane (see module docstring); lanes are
    (face-within-block, sample) ordered with fpb = RB // spt faces per
    block; dead lanes (padding) must carry Aw = Bws = 0.

    out[bf, 0:3, c]  = sum_rays P*b1   of face bf*fpb + c   (sources sum)
    out[bf, 3:6, c]  = ... P*b2 ; [6:9] P*b3 ; [9:12] S2
    """
    Lc, nfb = rows.shape[0], rows.shape[1]
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, spt=spt, use_gn=use_gn,
                          eps_area=1e-30),
        grid=(nfb, Lc),
        in_specs=[pl.BlockSpec((1, 1, 16, RB), lambda bf, l: (l, bf, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, RB), lambda bf, l: (bf, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nfb, 16, RB), jnp.float32),
        interpret=interpret,
    )(rows)
    return out


def backward_chunk_fused(rays, mesh, lighting_normal, difference,
                         source_offset, cfg, spt: int,
                         interpret: bool = False):
    """Drop-in for core.backward_chunk (Lambertian BRDF, spt <= RB):
    same analytic gradient, per-ray math + face reduction fused in Pallas.

    Requires cfg.brdf == 'lambertian'.  The gn (shading-normal) term is
    active exactly when backward_chunk's is (normal == 'vn' and
    testing_flag == 0, transient_and_gradient.cpp:959-964)."""
    from .core import _EPS, _tap_reductions
    from .kernels import gaussian_kernel

    Lc, F = rays.h.shape[0], rays.h.shape[1]
    dt = jnp.float32

    weights, deltas = gaussian_kernel(
        cfg.distance_resolution, cfg.bin_refine_resolution, cfg.sigma_bin)
    A, Bw = _tap_reductions(rays, difference, source_offset, cfg,
                            weights, deltas)
    sigma2 = cfg.sigma * cfg.sigma
    w = (jnp.where(rays.valid, 1.0, 0.0) * rays.area[None, :, None]
         * (-2.0 / float(spt)))
    Aw = (A * w).astype(dt)
    Bws = (Bw * w * (2.0 / sigma2)).astype(dt)

    inv2a = (1.0 / (2.0 * jnp.maximum(rays.area, _EPS)))[None, :, None]
    onorm = jnp.broadcast_to(lighting_normal[:, None, None, :],
                             rays.dirs.shape)

    fpb = RB // spt
    nfb = -(-F // fpb)
    Fp = nfb * fpb

    def prep(x):
        # [Lc, F, spt] -> [Lc, nfb, fpb*spt] -> padded to [Lc, nfb, RB]
        x = x.astype(dt)
        x = jnp.pad(x, ((0, 0), (0, Fp - F), (0, 0)))
        x = x.reshape(Lc, nfb, fpb * spt)
        return jnp.pad(x, ((0, 0), (0, 0), (0, RB - fpb * spt)))

    rows = jnp.stack([
        prep(rays.dirs[..., 0]), prep(rays.dirs[..., 1]),
        prep(rays.dirs[..., 2]),
        prep(rays.normal[..., 0]), prep(rays.normal[..., 1]),
        prep(rays.normal[..., 2]),
        prep(onorm[..., 0]), prep(onorm[..., 1]), prep(onorm[..., 2]),
        prep(rays.h), prep(rays.albedo),
        prep(jnp.broadcast_to(inv2a, rays.h.shape)),
        prep(rays.bary[..., 0]), prep(rays.bary[..., 1]),
        prep(Aw), prep(Bws),
    ], axis=2)                                     # [Lc, nfb, 16, RB]

    use_gn = cfg.normal == "vn" and cfg.testing_flag == 0
    out = backward_face_sums_pallas(rows, spt, use_gn, interpret=interpret)

    # [nfb, 16, RB] -> per-face vectors [F, 3] x4
    per = out[:, :12, :fpb]                        # [nfb, 12, fpb]
    per = per.transpose(0, 2, 1).reshape(Fp, 12)[:F]
    Pb = (per[:, 0:3], per[:, 3:6], per[:, 6:9])
    T2f = per[:, 9:12].astype(rays.h.dtype)

    v1 = mesh.v[mesh.f[:, 0]]
    v2 = mesh.v[mesh.f[:, 1]]
    v3 = mesh.v[mesh.f[:, 2]]
    edges = (v3 - v2, v1 - v3, v2 - v1)
    per_face = [Pb[k].astype(rays.h.dtype) + jnp.cross(T2f, edges[k])
                for k in range(3)]

    V = mesh.v.shape[0]
    stacked = jnp.stack(per_face, axis=1).reshape(-1, 3)
    ids = mesh.f.reshape(-1)
    return jax.ops.segment_sum(stacked, ids, num_segments=V)
