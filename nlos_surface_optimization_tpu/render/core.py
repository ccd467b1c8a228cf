"""Core confocal transient rendering: forward splat + analytic backward.

TPU-first re-design of the reference's per-(source x triangle) Embree kernels
(smoothed_transient/transient_and_gradient.cpp).  Work is a dense tensor of
rays [Lc, F, spt] (source-chunk x face x samples-per-face); visibility is a
tiled segment-occlusion query; temporal binning is a segment-sum; the K-tap
Gaussian scatter loop of the reference's gradient kernel
(transient_and_gradient.cpp:972-1001) is algebraically collapsed into two
weighted gather-reductions per ray:

    A = sum_i w_i * diff[l, bin_i]
    Bw = sum_i w_i * delta_i * diff[l, bin_i]

so the per-vertex gradient is dense VPU math followed by one segment-sum
scatter over vertex ids.

Semantics parity notes (deliberate, documented deviations):
  * Out-of-range kernel taps are masked to zero; the reference reads out of
    bounds of `difference` there (latent UB).
  * A sample whose coarse bin lands exactly on num_bins (2h == upper bound)
    is dropped; the reference writes out of bounds.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..geometry.intersect import segment_occluded
from ..geometry.mesh import Mesh, face_normals_areas
from ..geometry.sampling import stratified_barycoords
from . import brdf as ggx
from .kernels import gaussian_kernel, grouped_gaussian_tables

_EPS = 1e-30


class RayBatch(NamedTuple):
    """Per-ray quantities for a source chunk; leading shape [Lc, F, spt]."""

    dirs: jax.Array       # [Lc,F,spt,3] unit ray directions
    h: jax.Array          # [Lc,F,spt]   half path length |p - o|
    normal: jax.Array     # [Lc,F,spt,3] shading normal (fn broadcast or vn interp)
    albedo: jax.Array     # [Lc,F,spt]
    bary: jax.Array       # [Lc,F,spt,3]
    valid: jax.Array      # [Lc,F,spt] bool: f_valid & in-range & visible.
                          # Only meaningful for rays with nonzero shading
                          # contribution: zero-contribution rays skip the
                          # visibility query (_occl_skip_mask) and report
                          # True even when geometrically occluded — do NOT
                          # use as a coverage/visibility mask on its own.
    area: jax.Array       # [F] face areas
    face_n: jax.Array     # [F,3] unit face normals


def _sample_chunk(mesh: Mesh, lighting, key, cfg: RenderConfig, spt: int,
                  source_offset):
    """Stratified sampling + ray setup for one source chunk (no occlusion).

    Returns (bary, dirs, hs, in_range, face_n, area, flat o/d/t/fid)."""
    Lc = lighting.shape[0]
    F = mesh.f.shape[0]
    v1 = mesh.v[mesh.f[:, 0]]
    v2 = mesh.v[mesh.f[:, 1]]
    v3 = mesh.v[mesh.f[:, 2]]
    face_n, area = face_normals_areas(mesh.v, mesh.f)

    bary = stratified_barycoords(key, Lc, F, spt, source_offset)  # [Lc,F,spt,3]
    p = (
        bary[..., 0:1] * v1[None, :, None, :]
        + bary[..., 1:2] * v2[None, :, None, :]
        + bary[..., 2:3] * v3[None, :, None, :]
    )
    o = lighting[:, None, None, :]
    dvec = p - o
    h = jnp.linalg.norm(dvec, axis=-1)
    hs = jnp.maximum(h, 1e-12)
    dirs = dvec / hs[..., None]
    in_range = (h >= cfg.bin_lower / 2.0) & (h <= cfg.bin_upper / 2.0)

    R = Lc * F * spt
    o_flat = jnp.broadcast_to(o, p.shape).reshape(R, 3)
    d_flat = dirs.reshape(R, 3)
    t_flat = hs.reshape(R)
    fid = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[None, :, None], (Lc, F, spt)
    ).reshape(R)
    return bary, dirs, hs, in_range, face_n, area, o_flat, d_flat, t_flat, fid


def _interp_attrs(mesh: Mesh, bary, dirs, face_n, cfg: RenderConfig):
    """(shading normal, interpolated albedo) per ray."""
    if cfg.normal == "vn":
        n1 = mesh.vn[mesh.f[:, 0]]
        n2 = mesh.vn[mesh.f[:, 1]]
        n3 = mesh.vn[mesh.f[:, 2]]
        normal = (
            bary[..., 0:1] * n1[None, :, None, :]
            + bary[..., 1:2] * n2[None, :, None, :]
            + bary[..., 2:3] * n3[None, :, None, :]
        )  # NOT normalized, matching transient_and_gradient.cpp:216-219
    else:
        normal = jnp.broadcast_to(face_n[None, :, None, :], dirs.shape)

    a1 = mesh.albedo[mesh.f[:, 0]]
    a2 = mesh.albedo[mesh.f[:, 1]]
    a3 = mesh.albedo[mesh.f[:, 2]]
    alb = (
        bary[..., 0] * a1[None, :, None]
        + bary[..., 1] * a2[None, :, None]
        + bary[..., 2] * a3[None, :, None]
    )
    return normal, alb


def _occl_skip_mask(dirs, normal, face_n, lighting_normal, pre_valid):
    """Rays whose contribution is EXACTLY zero in every consumer (forward
    splat, analytic backward, intensity pass, per-vertex diagnostic) and
    whose occlusion result is therefore irrelevant.

    Zeroing these rays' segments before the visibility query is a pure
    optimization: on closed meshes roughly half the samples sit on
    backfacing triangles, and precisely those rays' segments cross the
    whole body — the worst case for every broad phase.

    Exactness argument per consumer (cos2 = source-normal cosine, cos3m =
    shading-normal cosine, cos3f = face-normal cosine):
      forward   max(0, cos2*cos3m)   -> needs cos2*cos3m <= 0
      intensity max(0, cos2*cos3f)   -> needs cos2*cos3f <= 0
      backward  separate clamps      -> needs cos2 <= 0 or cos3m <= 0
      vgb (fn)  separate clamps      -> cos2*cos3f<=0 ∧ ¬(both<0) gives it
    (the reference clamps the forward PRODUCT but the backward cosines
    separately, transient_and_gradient.cpp:204-233 vs :944-950, so the
    both-negative case forward-contributes and is NOT skipped)."""
    cos2 = jnp.sum(lighting_normal[:, None, None, :] * dirs, axis=-1)
    cos3m = -jnp.sum(normal * dirs, axis=-1)
    cos3f = -jnp.sum(
        jnp.broadcast_to(face_n[None, :, None, :], dirs.shape) * dirs,
        axis=-1)
    dead = ((cos2 * cos3m <= 0.0) & (cos2 * cos3f <= 0.0)
            & ((cos2 <= 0.0) | (cos3m <= 0.0)))
    return ~pre_valid | dead


def trace_chunk(mesh: Mesh, lighting, lighting_normal, key, cfg: RenderConfig,
                spt: int, source_offset=0, occl_ray_chunk: int = 16384
                ) -> RayBatch:
    """Sample points on every face from every source in the chunk and run the
    visibility query.  Mirrors streamedRayTraceTriangle's setup
    (transient_and_gradient.cpp:178-215).

    The RayBatch is traced ONCE per chunk and shared by the forward splat
    and the analytic backward (render.api._fused_chunk_body) — the
    reference instead re-traces every path for its gradient pass
    (transient_and_gradient.cpp:903-920)."""
    Lc = lighting.shape[0]
    F = mesh.f.shape[0]
    (bary, dirs, hs, in_range, face_n, area,
     o_flat, d_flat, t_flat, fid) = _sample_chunk(
        mesh, lighting, key, cfg, spt, source_offset)
    R = Lc * F * spt

    normal, alb = _interp_attrs(mesh, bary, dirs, face_n, cfg)
    pre_valid = (mesh.f_valid[None, :, None] & in_range
                 & (area > 0)[None, :, None])
    skip = _occl_skip_mask(dirs, normal, face_n, lighting_normal, pre_valid)
    t_flat = jnp.where(skip.reshape(R), 0.0, t_flat)

    # Visibility: nearest hit must be the sampled face <=> segment unblocked.
    backend = cfg.occl_backend
    if backend in ("auto", "fused"):
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"

    if backend == "pallas":
        from .pallas_kernels import segment_occluded_pallas

        occ = segment_occluded_pallas(
            o_flat, d_flat, t_flat, fid, mesh.v, mesh.f, mesh.f_valid,
            t_rel=cfg.occl_t_rel, t_min=cfg.occl_t_min,
            interpret=jax.default_backend() != "tpu",
        ).reshape(Lc, F, spt)
    else:
        n_rc = max(1, math.ceil(R / occl_ray_chunk))
        pad = n_rc * occl_ray_chunk - R
        if pad:
            o_flat = jnp.pad(o_flat, ((0, pad), (0, 0)))
            d_flat = jnp.pad(d_flat, ((0, pad), (0, 0)), constant_values=1.0)
            t_flat = jnp.pad(t_flat, (0, pad))
            fid = jnp.pad(fid, (0, pad))

        occ_fn = segment_occluded
        if backend == "mxu":
            from ..geometry.intersect import segment_occluded_mxu
            occ_fn = segment_occluded_mxu

        def occ_chunk(args):
            oc, dc, tc, fc = args
            return occ_fn(
                oc, dc, tc, fc, mesh.v, mesh.f, mesh.f_valid,
                t_rel=cfg.occl_t_rel, t_min=cfg.occl_t_min,
            )

        occ = jax.lax.map(
            occ_chunk,
            (
                o_flat.reshape(n_rc, occl_ray_chunk, 3),
                d_flat.reshape(n_rc, occl_ray_chunk, 3),
                t_flat.reshape(n_rc, occl_ray_chunk),
                fid.reshape(n_rc, occl_ray_chunk),
            ),
        ).reshape(-1)[:R].reshape(Lc, F, spt)

    valid = pre_valid & ~occ
    return RayBatch(dirs=dirs, h=hs, normal=normal, albedo=alb, bary=bary,
                    valid=valid, area=area, face_n=face_n)


def trace_forward_fused(mesh: Mesh, lighting, lighting_normal, key,
                        cfg: RenderConfig, spt: int, refine: int,
                        source_offset=0, alpha=None):
    """(RayBatch, fine histogram [Lc, num_bins*refine]) via the fused
    occlusion + splat kernel (render/fused_kernels.py).

    Semantics identical to trace_chunk + forward_chunk with
    occl_backend='pallas' — the per-ray contribution
    (transient_and_gradient.cpp:204-233) is precomputed here without the
    occlusion mask, and the kernel zeroes occluded rays before splatting.
    """
    Lc = lighting.shape[0]
    F = mesh.f.shape[0]
    (bary, dirs, hs, in_range, face_n, area,
     o_flat, d_flat, t_flat, fid) = _sample_chunk(
        mesh, lighting, key, cfg, spt, source_offset)
    normal, alb = _interp_attrs(mesh, bary, dirs, face_n, cfg)
    pre_valid = (mesh.f_valid[None, :, None] & in_range
                 & (area > 0)[None, :, None])

    rays_pre = RayBatch(dirs=dirs, h=hs, normal=normal, albedo=alb,
                        bary=bary, valid=pre_valid, area=area, face_n=face_n)

    onorm = lighting_normal[:, None, None, :]
    cos2 = jnp.sum(onorm * dirs, axis=-1)
    cos3 = -jnp.sum(normal * dirs, axis=-1)
    ff = jnp.maximum(0.0, cos3 * cos2) / (hs * hs)
    contrib = area[None, :, None] * alb * ff * ff
    contrib = contrib * _brdf_value(rays_pre, cfg, alpha)
    contrib = jnp.where(pre_valid, contrib, 0.0) / float(spt)

    fine_res = cfg.distance_resolution / refine
    Bf = cfg.num_bins * refine
    bin_f = jnp.floor((2.0 * hs - cfg.bin_lower) / fine_res).astype(jnp.int32)
    ok = (bin_f >= 0) & (bin_f < Bf)
    contrib = jnp.where(ok, contrib, 0.0)
    bin_f = jnp.clip(bin_f, 0, Bf - 1)

    from .fused_kernels import occluded_splat_pallas

    skip = _occl_skip_mask(dirs, normal, face_n, lighting_normal, pre_valid)
    t_flat = jnp.where(skip.reshape(-1), 0.0, t_flat)
    occ, hist = occluded_splat_pallas(
        o_flat, d_flat, t_flat, fid,
        contrib.reshape(-1), bin_f.reshape(-1),
        mesh.v, mesh.f, mesh.f_valid, Lc, Bf,
        t_rel=cfg.occl_t_rel, t_min=cfg.occl_t_min,
        interpret=jax.default_backend() != "tpu",
    )
    rays = rays_pre._replace(
        valid=pre_valid & ~occ.reshape(Lc, F, spt))
    return rays, hist


def _brdf_value(rays: RayBatch, cfg: RenderConfig, alpha):
    """BRDF multiplier per ray (1 for Lambertian)."""
    if cfg.brdf == "ggx":
        c = jnp.sum(rays.normal * (-rays.dirs), axis=-1)
        return ggx.eval_scalar(alpha, c)
    return jnp.ones_like(rays.h)


def forward_chunk(rays: RayBatch, lighting_normal, cfg: RenderConfig,
                  spt: int, refine: int, alpha=None):
    """Fine histogram [Lc, num_bins*refine] for one source chunk.

    Per-sample weight area*albedo*max(0, cos2*cos3)^... : exactly
    transient_and_gradient.cpp:204-233 (note the forward clamps the product,
    the backward clamps the cosines separately)."""
    Lc = rays.h.shape[0]
    onorm = lighting_normal[:, None, None, :]
    cos2 = jnp.sum(onorm * rays.dirs, axis=-1)
    cos3 = -jnp.sum(rays.normal * rays.dirs, axis=-1)
    ff = jnp.maximum(0.0, cos3 * cos2) / (rays.h * rays.h)
    contrib = rays.area[None, :, None] * rays.albedo * ff * ff
    contrib = contrib * _brdf_value(rays, cfg, alpha)
    contrib = jnp.where(rays.valid, contrib, 0.0) / float(spt)

    fine_res = cfg.distance_resolution / refine
    Bf = cfg.num_bins * refine
    bin_f = jnp.floor((2.0 * rays.h - cfg.bin_lower) / fine_res).astype(jnp.int32)
    ok = (bin_f >= 0) & (bin_f < Bf)
    contrib = jnp.where(ok, contrib, 0.0)
    bin_f = jnp.clip(bin_f, 0, Bf - 1)

    l_idx = jnp.broadcast_to(
        jnp.arange(Lc, dtype=jnp.int32)[:, None, None], rays.h.shape
    )
    seg = (l_idx * Bf + bin_f).reshape(-1)
    hist = jax.ops.segment_sum(
        contrib.reshape(-1), seg, num_segments=Lc * Bf
    )
    return hist.reshape(Lc, Bf)


def intensity_chunk(rays: RayBatch, lighting_normal, cfg: RenderConfig, spt: int):
    """Per-face visibility intensity, accumulated over sources in the chunk
    (streamedRayTraceIntensity, transient_and_gradient.cpp:91-117; albedo and
    normals are forced to defaults there)."""
    onorm = lighting_normal[:, None, None, :]
    cos2 = jnp.sum(onorm * rays.dirs, axis=-1)
    # face normal regardless of cfg.normal (reference passes nullptr normals)
    F = rays.area.shape[0]
    fn = jnp.broadcast_to(rays.face_n[None, :, None, :], rays.dirs.shape)
    cos3 = -jnp.sum(fn * rays.dirs, axis=-1)
    ff = jnp.maximum(0.0, cos3 * cos2) / (rays.h * rays.h)
    contrib = rays.area[None, :, None] * ff * ff
    contrib = jnp.where(rays.valid, contrib, 0.0) / float(spt)
    return contrib.sum(axis=(0, 2))  # [F]


def _gradient_terms(rays: RayBatch, lighting_normal, cfg: RenderConfig, alpha):
    """Shared per-ray gradient ingredients: t1 [.,3], t2 [.,3], intensity,
    ff2 (BRDF-free squared form factor), following
    transient_and_gradient.cpp:944-966 and ggx/transient_and_gradient.cpp:
    750-782."""
    onorm = lighting_normal[:, None, None, :]
    cos2 = jnp.maximum(jnp.sum(onorm * rays.dirs, axis=-1), 0.0)
    cos3 = jnp.maximum(-jnp.sum(rays.normal * rays.dirs, axis=-1), 0.0)
    h = rays.h
    ff = cos2 * cos3 / (h * h)
    ff2 = ff * ff

    area_s = jnp.maximum(rays.area, _EPS)[None, :, None, None]

    # Base spatial-derivative direction (no albedo/BRDF factor yet):
    # 2*cos2*cos3*(onorm*cos3 - normal*cos2 + 4*(-dir)*cos2*cos3)/h^5
    t1_base = (
        2.0
        * (cos2 * cos3)[..., None]
        * (
            onorm * cos3[..., None]
            - rays.normal * cos2[..., None]
            + 4.0 * (-rays.dirs) * (cos2 * cos3)[..., None]
        )
        / (h ** 5)[..., None]
    )

    use_gn = cfg.normal == "vn" and cfg.testing_flag == 0

    if cfg.brdf == "ggx":
        c = jnp.sum(rays.normal * (-rays.dirs), axis=-1)
        bval = ggx.eval_scalar(alpha, c)
        dscale = ggx.eval_cdiff(alpha, c)
        # eval_nwdiff: BRDF_dn = Dscale*w, BRDF_dw = Dscale*normal (w = -dir)
        brdf_dn = dscale[..., None] * (-rays.dirs)
        brdf_dw = dscale[..., None] * rays.normal
        # d(BRDF)/d(point) = (-BRDF_dw + dir*dot(dir, BRDF_dw)) / h.
        # The reference divides only the parallel component by halfLength
        # (C++ precedence slip, ggx/transient_and_gradient.cpp:759);
        # cfg.ggx_compat_dx replicates that verbatim.
        par = rays.dirs * jnp.sum(rays.dirs * brdf_dw, axis=-1, keepdims=True)
        if cfg.ggx_compat_dx:
            brdf_dx = -brdf_dw + par / h[..., None]
        else:
            brdf_dx = (-brdf_dw + par) / h[..., None]
        intensity = rays.albedo * ff2 * bval
        # ggx t1_1 carries no albedo factor (ggx .cpp:764-768)
        t1 = t1_base * bval[..., None] + ff2[..., None] * brdf_dx
        gn = jnp.zeros_like(t1)
        if use_gn:
            gn = (
                -2.0 * rays.dirs * (cos3 * cos2 * cos2 * bval)[..., None]
                / (h ** 4)[..., None]
            )
            gn = gn + ff2[..., None] * brdf_dn
            gn = gn - rays.normal * jnp.sum(gn * rays.normal, axis=-1, keepdims=True)
    else:
        intensity = rays.albedo * ff2
        t1 = rays.albedo[..., None] * t1_base
        gn = jnp.zeros_like(t1)
        if use_gn:
            gn = (
                -2.0
                * rays.albedo[..., None]
                * rays.dirs
                * (cos3 * cos2 * cos2)[..., None]
                / (h ** 4)[..., None]
            )
            gn = gn - rays.normal * jnp.sum(gn * rays.normal, axis=-1, keepdims=True)

    t2 = (rays.normal * intensity[..., None] + gn) / (2.0 * area_s)
    return t1, t2, intensity, ff2


def _tap_tables(difference, source_offset, Lc, cfg: RenderConfig, dtype):
    """Per-fine-bin tap-reduction tables (A_tab, Bw_tab), each [Lc, Bf+1].

    The K (= 4*refine*sigma_bin+1) taps land on only G = 4*sigma_bin+2
    consecutive COARSE bins with phase-grouped weights
    (kernels.grouped_gaussian_tables), and the whole reduction depends on
    the ray ONLY through its fine bin q — so the reference's per-tap
    gather loop (transient_and_gradient.cpp:972-1001) collapses to a
    per-fine-bin TABLE built with static-index ops (no per-ray work), and
    the per-ray part is ONE lookup per output."""
    B = cfg.num_bins
    res = cfg.distance_resolution
    refine = cfg.bin_refine_resolution
    sigma_bin = cfg.sigma_bin

    W, WD = grouped_gaussian_tables(res, refine, sigma_bin)
    G = W.shape[1]
    rsig = 2 * refine * sigma_bin
    Bf = B * refine

    diff_c = jax.lax.dynamic_slice_in_dim(
        difference, source_offset, Lc, axis=0).astype(dtype)

    # tables over q in [0, Bf] (q == Bf at 2h == bin_upper)
    qs_tab = np.arange(Bf + 1) - rsig
    p_tab = qs_tab % refine
    b0_tab = qs_tab // refine
    A_tab = jnp.zeros((Lc, Bf + 1), dtype)
    Bw_tab = jnp.zeros((Lc, Bf + 1), dtype)
    for j in range(G):
        b = b0_tab + j
        ok = (b >= 0) & (b < B)
        idx = np.clip(b, 0, B - 1)
        d = jnp.where(jnp.asarray(ok)[None, :], diff_c[:, idx], 0.0)
        A_tab = A_tab + jnp.asarray(W[p_tab, j], dtype)[None, :] * d
        Bw_tab = Bw_tab + jnp.asarray(WD[p_tab, j], dtype)[None, :] * d
    return A_tab, Bw_tab


def _tap_reductions(rays: RayBatch, difference, source_offset, cfg: RenderConfig,
                    weights, deltas):
    """Gather diff over the K kernel taps and reduce.

    Returns (A, Bw): A = sum_i w_i*d_i, Bw = sum_i w_i*delta_i*d_i, each with
    ray shape.  difference is the full [L, B] array; sources in this chunk
    start at source_offset.  Tables from _tap_tables; bit-identical to the
    per-ray formulation (same fma order per entry)."""
    Lc = rays.h.shape[0]
    B = cfg.num_bins
    res = cfg.distance_resolution
    refine = cfg.bin_refine_resolution
    fine_res = res / refine
    Bf = B * refine
    dtype = rays.h.dtype

    A_tab, Bw_tab = _tap_tables(difference, source_offset, Lc, cfg, dtype)

    q = jnp.floor((2.0 * rays.h - cfg.bin_lower) / fine_res).astype(jnp.int32)
    # out-of-table rays read a clipped entry; every consumer masks them
    # with rays.valid (in_range) before use
    qc = jnp.clip(q, 0, Bf)
    l_local = jnp.arange(Lc, dtype=jnp.int32)[:, None, None]
    flat = l_local * (Bf + 1) + qc
    A = A_tab.reshape(-1)[flat]
    Bw = Bw_tab.reshape(-1)[flat]
    zero = (q < 0) | (q > Bf)
    A = jnp.where(zero, 0.0, A)
    Bw = jnp.where(zero, 0.0, Bw)
    return A, Bw


def backward_chunk(rays: RayBatch, mesh: Mesh, lighting_normal, difference,
                   source_offset, cfg: RenderConfig, spt: int, alpha=None):
    """Analytic vertex gradient for one source chunk -> [V,3] (sum over the
    chunk's sources; caller divides by total num_sources).

    Implements streamedRayTraceTriangleGradient
    (transient_and_gradient.cpp:925-1007) with the K-tap loop collapsed to
    the (A, Bw) reductions, and the cross-product term hoisted from per-ray
    to per-face: cross(t2, e_k) is linear in t2 while e_k is constant per
    face, so  sum_rays cross(t2, e_k)*A == cross(sum_rays t2*A, e_k) —
    the per-ray work drops to two weighted vectors and three bary-weighted
    face reductions (same math, summation reordered)."""
    t1, t2, intensity, _ = _gradient_terms(rays, lighting_normal, cfg, alpha)
    weights, deltas = gaussian_kernel(
        cfg.distance_resolution, cfg.bin_refine_resolution, cfg.sigma_bin
    )
    A, Bw = _tap_reductions(rays, difference, source_offset, cfg, weights, deltas)

    sigma2 = cfg.sigma * cfg.sigma
    w = (
        jnp.where(rays.valid, 1.0, 0.0)
        * rays.area[None, :, None]
        * (-2.0 / float(spt))
    )
    Aw = A * w
    # P = (t1*A + gauss_vec) * w   with gauss_vec = (2/s^2)*dir*intensity*Bw
    P = t1 * Aw[..., None] + rays.dirs * (
        (2.0 / sigma2) * intensity * Bw * w
    )[..., None]
    S2 = t2 * Aw[..., None]

    T2f = S2.sum(axis=(0, 2))                       # [F,3]
    v1 = mesh.v[mesh.f[:, 0]]
    v2 = mesh.v[mesh.f[:, 1]]
    v3 = mesh.v[mesh.f[:, 2]]
    edges = (v3 - v2, v1 - v3, v2 - v1)             # opposite edge per slot

    per_face = [
        (P * rays.bary[..., k : k + 1]).sum(axis=(0, 2))
        + jnp.cross(T2f, edges[k])
        for k in range(3)
    ]

    # Scatter-add: segment-sum faces -> vertices.
    V = mesh.v.shape[0]
    stacked = jnp.stack(per_face, axis=1).reshape(-1, 3)  # [F*3,3]
    ids = mesh.f.reshape(-1)
    return jax.ops.segment_sum(stacked, ids, num_segments=V)


def backward_jitter_chunk(rays: RayBatch, mesh: Mesh, lighting_normal,
                          difference, source_offset, cfg: RenderConfig,
                          spt: int, jitter_weight, jitter_grad,
                          jitter_offset: int):
    """Analytic vertex gradient with a measured temporal kernel -> [V,3].

    Implements the jitter gradient kernel
    (jitter/transient_and_gradient.cpp:900-975): taps are integer bin
    shifts delta_i = i - offset of the sample's coarse bin; per tap,
        g = (t1*w_i + jg_i*intensity*(-2)*dir/res)*bary + cross(t2,e)*w_i
    times -2*difference[bin+delta_i]; collapsed into two reductions
        A = sum_i w_i  * diff[bin_i],   C = sum_i jg_i * diff[bin_i].
    Out-of-range taps are masked (the reference reads OOB — latent UB)."""
    t1, t2, intensity, _ = _gradient_terms(rays, lighting_normal, cfg, None)

    B = cfg.num_bins
    res = cfg.distance_resolution
    Lc = rays.h.shape[0]
    bin0 = jnp.floor((2.0 * rays.h - cfg.bin_lower) / res).astype(jnp.int32)

    # The K-tap reduction depends on the ray only through its coarse bin,
    # so it collapses to a per-bin table: T[l, b] = sum_i k_i *
    # diff[l, b+i-offset] — a 1-D correlation of each difference row with
    # the kernel (K can be ~901 for measured jitter; per-ray that would be
    # 2K gathers, as a table it is one convolve + ONE gather per output).
    K = jitter_weight.shape[0]
    dtype = rays.h.dtype
    diff_c = jax.lax.dynamic_slice_in_dim(
        difference, source_offset, Lc, axis=0).astype(dtype)

    def corr_rows(kernel):
        # T[b] = sum_i kernel[i] * diff[b + i - offset], diff 0 outside:
        # = convolve(diff, flip(kernel), 'full')[K-1-offset + b]
        def one(row):
            full = jnp.convolve(row, kernel[::-1].astype(dtype), mode="full")
            return jax.lax.dynamic_slice_in_dim(
                full, K - 1 - jitter_offset, B + 1)

        return jax.vmap(one)(
            jnp.pad(diff_c, ((0, 0), (0, 1))))          # allow bin0 == B

    A_tab = corr_rows(jnp.asarray(jitter_weight))
    C_tab = corr_rows(jnp.asarray(jitter_grad))

    bc = jnp.clip(bin0, 0, B)
    l_local = jnp.arange(Lc, dtype=jnp.int32)[:, None, None]
    flat = l_local * (B + 1) + bc
    zero = (bin0 < 0) | (bin0 > B)
    A = jnp.where(zero, 0.0, A_tab.reshape(-1)[flat])
    C = jnp.where(zero, 0.0, C_tab.reshape(-1)[flat])

    # same per-face cross hoist as backward_chunk (cross linear in t2)
    w = (
        jnp.where(rays.valid, 1.0, 0.0)
        * rays.area[None, :, None]
        * (-2.0 / float(spt))
    )
    Aw = A * w
    P = t1 * Aw[..., None] + rays.dirs * (
        (-2.0 / res) * intensity * C * w
    )[..., None]
    S2 = t2 * Aw[..., None]

    T2f = S2.sum(axis=(0, 2))
    v1 = mesh.v[mesh.f[:, 0]]
    v2 = mesh.v[mesh.f[:, 1]]
    v3 = mesh.v[mesh.f[:, 2]]
    edges = (v3 - v2, v1 - v3, v2 - v1)

    per_face = [
        (P * rays.bary[..., k : k + 1]).sum(axis=(0, 2))
        + jnp.cross(T2f, edges[k])
        for k in range(3)
    ]

    V = mesh.v.shape[0]
    stacked = jnp.stack(per_face, axis=1).reshape(-1, 3)
    ids = mesh.f.reshape(-1)
    return jax.ops.segment_sum(stacked, ids, num_segments=V)


def backward_albedo_chunk(rays: RayBatch, lighting_normal, difference,
                          source_offset, cfg: RenderConfig, spt: int):
    """Scalar albedo gradient (streamedRayTraceTriangleGradientAlbedo,
    transient_and_gradient.cpp:652-693: g0 = ff^2 with separately clamped
    cosines; no albedo/BRDF factor)."""
    _, _, _, ff2 = _gradient_terms(rays, lighting_normal, cfg, None)
    weights, deltas = gaussian_kernel(
        cfg.distance_resolution, cfg.bin_refine_resolution, cfg.sigma_bin
    )
    A, _ = _tap_reductions(rays, difference, source_offset, cfg, weights, deltas)
    g = jnp.where(rays.valid, ff2 * A, 0.0) * rays.area[None, :, None]
    return (-2.0 / float(spt)) * g.sum()


def backward_alpha_chunk(rays: RayBatch, lighting_normal, difference,
                         source_offset, cfg: RenderConfig, spt: int, alpha):
    """Scalar GGX-roughness gradient (ggx/transient_and_gradient.cpp:385-512,
    eval_adiff at :492): g0 = albedo * ff^2 * d(BRDF)/d(alpha)."""
    c = jnp.sum(rays.normal * (-rays.dirs), axis=-1)
    adiff = ggx.eval_adiff(alpha, c)
    _, _, _, ff2 = _gradient_terms(rays, lighting_normal, cfg, alpha)
    weights, deltas = gaussian_kernel(
        cfg.distance_resolution, cfg.bin_refine_resolution, cfg.sigma_bin
    )
    A, _ = _tap_reductions(rays, difference, source_offset, cfg, weights, deltas)
    g = jnp.where(rays.valid, rays.albedo * ff2 * adiff * A, 0.0)
    g = g * rays.area[None, :, None]
    return (-2.0 / float(spt)) * g.sum()


def vertex_gradient_bins_chunk(rays: RayBatch, mesh: Mesh, lighting_normal,
                               vertex_num: int, cfg: RenderConfig, spt: int):
    """Per-bin gradient diagnostic for one vertex -> [B,3]
    (streamedRayTraceTriangleVertexGradient,
    transient_and_gradient.cpp:697-840; fn shading, no difference weighting).
    """
    cfg_fn = cfg.replace(normal="fn")
    t1, t2, intensity, _ = _gradient_terms(rays, lighting_normal, cfg_fn, None)
    # This diagnostic DOES include the gn face-normal term unconditionally
    # (transient_and_gradient.cpp:798-803).
    onorm = lighting_normal[:, None, None, :]
    cos2 = jnp.maximum(jnp.sum(onorm * rays.dirs, axis=-1), 0.0)
    fnb = jnp.broadcast_to(rays.face_n[None, :, None, :], rays.dirs.shape)
    cos3 = jnp.maximum(-jnp.sum(fnb * rays.dirs, axis=-1), 0.0)
    gn = (
        -2.0
        * rays.albedo[..., None]
        * rays.dirs
        * (cos3 * cos2 * cos2)[..., None]
        / (rays.h ** 4)[..., None]
    )
    gn = gn - fnb * jnp.sum(gn * fnb, axis=-1, keepdims=True)
    area_s = jnp.maximum(rays.area, _EPS)[None, :, None, None]
    t2 = (fnb * intensity[..., None] + gn) / (2.0 * area_s)

    weights, deltas = gaussian_kernel(
        cfg.distance_resolution, cfg.bin_refine_resolution, cfg.sigma_bin
    )
    sigma2 = cfg.sigma * cfg.sigma

    v1 = mesh.v[mesh.f[:, 0]][None, :, None, :]
    v2 = mesh.v[mesh.f[:, 1]][None, :, None, :]
    v3 = mesh.v[mesh.f[:, 2]][None, :, None, :]
    edges = (v3 - v2, v1 - v3, v2 - v1)

    # Which barycentric slot (if any) this vertex occupies per face.
    slot_mask = [
        (mesh.f[:, k] == vertex_num)[None, :, None] for k in range(3)
    ]
    bary_k = sum(
        jnp.where(slot_mask[k], rays.bary[..., k], 0.0) for k in range(3)
    )
    edge_k = sum(
        jnp.where(slot_mask[k][..., None], jnp.broadcast_to(edges[k], t2.shape), 0.0)
        for k in range(3)
    )
    involved = sum(jnp.where(m, 1.0, 0.0) for m in slot_mask) > 0

    scale = (
        jnp.where(rays.valid & involved, 1.0, 0.0)
        * rays.area[None, :, None]
        / float(spt)
    )

    B = cfg.num_bins
    out = jnp.zeros((B, 3), rays.h.dtype)
    two_h = 2.0 * rays.h
    cross_term = jnp.cross(t2, edge_k)
    for i in range(weights.shape[0]):
        w_i = float(weights[i])
        d_i = float(deltas[i])
        gauss = (2.0 * d_i / sigma2) * rays.dirs * intensity[..., None]
        g = ((t1 + gauss) * bary_k[..., None] + cross_term) * w_i
        g = g * scale[..., None]
        b = jnp.floor((two_h + d_i - cfg.bin_lower) /
                      cfg.distance_resolution).astype(jnp.int32)
        ok = (b >= 0) & (b < B)
        g = jnp.where(ok[..., None], g, 0.0)
        b = jnp.clip(b, 0, B - 1)
        out = out + jax.ops.segment_sum(
            g.reshape(-1, 3), b.reshape(-1), num_segments=B
        )
    return out
