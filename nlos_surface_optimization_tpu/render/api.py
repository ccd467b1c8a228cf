"""High-level rendering API: TPU equivalents of the reference's
exp_bunny/rendering.py entry points.

  render_transient        <- forwardRendering / renderStreamedTransient
                             (rendering.py:280-297, renderer.pyx:173-187)
  render_intensity        <- removeTriangle's intensity pass
                             (renderer.pyx:189-200)
  inverse_render          <- inverseRendering / renderStreamedGradient
                             (rendering.py:252-269, renderer.pyx:92-111)
  inverse_render_albedo   <- inverseRenderingAlbedo (rendering.py:241-250)
  inverse_render_alpha    <- inverseRenderingAlpha  (rendering.py:232-238)
  vertex_gradient_bins    <- vertex_gradient (rendering.py:26-30)

All functions are jitted with cfg/spt static; sources are processed in
chunks of cfg.source_chunk (memory knob) via lax.map.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..geometry.mesh import Mesh
from .core import (
    backward_albedo_chunk,
    backward_alpha_chunk,
    backward_chunk,
    backward_jitter_chunk,
    forward_chunk,
    intensity_chunk,
    trace_chunk,
    trace_forward_fused,
    vertex_gradient_bins_chunk,
)
from .kernels import jitter_convolve, smooth_and_coarsen


def _spt(cfg: RenderConfig, mesh: Mesh) -> int:
    """samples-per-face from the VALID face count, so shape-bucketed
    (padded) meshes keep the reference's allocation 1+(S-1)//F
    (transient_and_gradient.cpp:184-191) — padded rows are f_valid=False
    and contribute zero but must not dilute the per-face sample budget."""
    return cfg.samples_per_face(int(np.asarray(mesh.f_valid).sum()))


def _use_fused(cfg: RenderConfig, mesh: Mesh) -> bool:
    """Whether the forward path runs the fused occlusion+splat kernel
    (render/fused_kernels.py).  'auto' picks it on TPU for meshes that fit
    the VMEM-resident triangle soup; an explicit 'fused' is always
    honored (interpret mode off-TPU)."""
    if cfg.occl_backend == "fused":
        return True
    if cfg.occl_backend == "auto":
        from .fused_kernels import FUSED_FACE_CAP

        return (jax.default_backend() == "tpu"
                and int(mesh.f.shape[0]) <= FUSED_FACE_CAP)
    return False


def _trace_and_forward(mesh: Mesh, lc, nc_, key, cfg: RenderConfig, spt: int,
                       off, refine: int, alpha, fused: bool):
    """(RayBatch, fine histogram) for one source chunk, via the fused
    kernel or the trace+splat pair — identical semantics."""
    if fused:
        return trace_forward_fused(mesh, lc, nc_, key, cfg, spt, refine,
                                   source_offset=off, alpha=alpha)
    rays = trace_chunk(mesh, lc, nc_, key, cfg, spt, source_offset=off)
    return rays, forward_chunk(rays, nc_, cfg, spt, refine, alpha=alpha)


def pathlengths(cfg: RenderConfig) -> jnp.ndarray:
    return cfg.bin_lower + jnp.arange(cfg.num_bins) * cfg.distance_resolution


def _chunks(lighting, lighting_normal, cfg: RenderConfig):
    """Reshape sources into [nc, Lc, 3] with zero-normal padding (padded
    sources contribute exactly zero)."""
    L = lighting.shape[0]
    Lc = cfg.source_chunk if cfg.source_chunk > 0 else L
    Lc = min(Lc, L)
    nc = math.ceil(L / Lc)
    pad = nc * Lc - L
    if pad:
        lighting = jnp.pad(lighting, ((0, pad), (0, 0)))
        lighting_normal = jnp.pad(lighting_normal, ((0, pad), (0, 0)))
    return (
        lighting.reshape(nc, Lc, 3),
        lighting_normal.reshape(nc, Lc, 3),
        L,
        Lc,
        nc,
    )


@partial(jax.jit, static_argnames=("cfg", "spt", "refine"))
def _render_transient_impl(mesh: Mesh, lighting, lighting_normal, key,
                           alpha, cfg: RenderConfig, spt: int, refine: int):
    lit, nrm, L, Lc, nc = _chunks(lighting, lighting_normal, cfg)
    fused = _use_fused(cfg, mesh)

    def one(args):
        lc, nc_, off = args
        _, fine = _trace_and_forward(mesh, lc, nc_, key, cfg, spt, off,
                                     refine, alpha, fused)
        return fine

    offsets = jnp.arange(nc) * Lc
    fine = jax.lax.map(one, (lit, nrm, offsets))  # [nc, Lc, B*refine]
    fine = fine.reshape(nc * Lc, cfg.num_bins * refine)[:L]
    return smooth_and_coarsen(fine, cfg.distance_resolution, refine,
                              cfg.sigma_bin)


def render_transient(mesh: Mesh, lighting, lighting_normal, cfg: RenderConfig,
                     key, refine: Optional[int] = None, alpha=None):
    """Forward confocal transient [L, B] (+ pathlengths [B]).

    `refine` defaults to cfg.bin_refine_resolution like renderStreamedTransient;
    pass refine=1 for raw (unsmoothed) histograms as the reference's GT
    generation does (main_create_gt.py uses refine=1, sigma=1)."""
    spt = _spt(cfg, mesh)
    r = cfg.bin_refine_resolution if refine is None else refine
    a = jnp.float32(0.1) if alpha is None else alpha
    t = _render_transient_impl(mesh, lighting, lighting_normal, key, a, cfg,
                               spt, r)
    return t, pathlengths(cfg)


@partial(jax.jit, static_argnames=("cfg", "spt", "refine"))
def _forward_one_chunk(mesh: Mesh, lc, nc_, off, key, alpha,
                       cfg: RenderConfig, spt: int, refine: int):
    fused = _use_fused(cfg, mesh)
    _, fine = _trace_and_forward(mesh, lc, nc_, key, cfg, spt, off, refine,
                                 alpha, fused)
    return fine


def render_transient_host(mesh: Mesh, lighting, lighting_normal,
                          cfg: RenderConfig, key,
                          refine: Optional[int] = None, alpha=None):
    """render_transient with the source-chunk loop on the HOST: one short
    XLA program per chunk instead of one program spanning the scan.

    Numerically identical to render_transient (same chunking, offsets,
    keys).  REQUIRED for long renders through serving tunnels that bound
    per-program device time (e.g. GT generation at the reference's
    1024^2-scan/1e8-sample scale, main_create_gt.py:52-56): each chunk
    program runs well under the bound and the compile is reused across
    every chunk, shard, and process (persistent compilation cache)."""
    spt = _spt(cfg, mesh)
    r = cfg.bin_refine_resolution if refine is None else refine
    a = jnp.float32(0.1) if alpha is None else alpha
    lit, nrm, L, Lc, nc = _chunks(lighting, lighting_normal, cfg)
    parts = [
        _forward_one_chunk(mesh, lit[i], nrm[i], i * Lc, key, a, cfg, spt, r)
        for i in range(nc)
    ]
    fine = jnp.concatenate(parts, axis=0)[:L]
    t = smooth_and_coarsen(fine, cfg.distance_resolution, r, cfg.sigma_bin)
    return t, pathlengths(cfg)


@partial(jax.jit, static_argnames=("cfg", "spt"))
def _render_intensity_impl(mesh: Mesh, lighting, lighting_normal, key,
                           cfg: RenderConfig, spt: int):
    lit, nrm, L, Lc, nc = _chunks(lighting, lighting_normal, cfg)

    def one(args):
        lc, nc_, off = args
        rays = trace_chunk(mesh, lc, nc_, key, cfg, spt, source_offset=off)
        return intensity_chunk(rays, nc_, cfg, spt)

    offsets = jnp.arange(nc) * Lc
    per_chunk = jax.lax.map(one, (lit, nrm, offsets))  # [nc, F]
    return per_chunk.sum(axis=0)


@partial(jax.jit, static_argnames=("cfg", "spt"))
def _intensity_one_chunk(mesh: Mesh, lc, nc_, off, key, cfg: RenderConfig,
                         spt: int):
    rays = trace_chunk(mesh, lc, nc_, key, cfg, spt, source_offset=off)
    return intensity_chunk(rays, nc_, cfg, spt)


def render_intensity_host(mesh: Mesh, lighting, lighting_normal,
                          cfg: RenderConfig, key):
    """render_intensity with host-side chunk dispatch (same rationale as
    render_transient_host / inverse_render_host)."""
    spt = _spt(cfg, mesh)
    lit, nrm, L, Lc, nc = _chunks(lighting, lighting_normal, cfg)
    out = _intensity_one_chunk(mesh, lit[0], nrm[0], 0, key, cfg, spt)
    for i in range(1, nc):
        out = out + _intensity_one_chunk(mesh, lit[i], nrm[i], i * Lc, key,
                                         cfg, spt)
    return out


def render_intensity(mesh: Mesh, lighting, lighting_normal, cfg: RenderConfig,
                     key):
    """Per-face visibility intensity [F] summed over sources, for
    invisible-triangle culling (rendering.py:271-278)."""
    spt = _spt(cfg, mesh)
    return _render_intensity_impl(mesh, lighting, lighting_normal, key, cfg, spt)


def _difference(data, transient, weight, cfg: RenderConfig):
    """difference = weight * f(data - transient), f = identity or 2d^3
    (stratifiedStreamedGradientRenderer.cpp:543-550)."""
    d = data - transient
    if cfg.loss_flag == 1:
        d = 2.0 * d * d * d
    if cfg.loss_smooth_width > 0:
        from .kernels import box_smooth_difference

        d = box_smooth_difference(d, cfg.loss_smooth_width)
    return d * weight


def _pad_rows(x, pad):
    return jnp.pad(x, ((0, pad), (0, 0))) if pad else x


def _fused_chunk_body(mesh: Mesh, lc, nc_, off, key, dat, w,
                      cfg: RenderConfig, spt: int, mode: str, alpha,
                      fused: bool):
    """(transient rows, gradient) for one source chunk.

    The difference weight*(data - T_smooth) is ROW-LOCAL per source
    (loss_flag and the legacy box smoothing act along the bin axis only),
    so the forward histogram, the smoothed transient, the difference and
    the analytic backward of a chunk's sources need only that chunk's
    rays: one trace serves both passes.  The reference instead traces
    every path twice (transient_and_gradient.cpp:122-237 forward,
    :843-1007 backward re-trace)."""
    refine = cfg.forward_refine
    rays, fine = _trace_and_forward(mesh, lc, nc_, key, cfg, spt, off,
                                    refine, alpha, fused)
    transient = smooth_and_coarsen(fine, cfg.distance_resolution, refine,
                                   cfg.sigma_bin)
    diff = _difference(dat, transient, w, cfg)
    if mode == "vertex":
        from .bwd_kernels import RB, backward_chunk_fused
        use_fused_bwd = (
            cfg.brdf == "lambertian" and spt <= RB
            and (cfg.bwd_backend == "fused"
                 or (cfg.bwd_backend == "auto"
                     and jax.default_backend() == "tpu"))
        )
        if use_fused_bwd:
            g = backward_chunk_fused(
                rays, mesh, nc_, diff, 0, cfg, spt,
                interpret=jax.default_backend() != "tpu")
        else:
            g = backward_chunk(rays, mesh, nc_, diff, 0, cfg, spt,
                               alpha=alpha)
    elif mode == "albedo":
        g = backward_albedo_chunk(rays, nc_, diff, 0, cfg, spt)
    elif mode == "alpha":
        g = backward_alpha_chunk(rays, nc_, diff, 0, cfg, spt, alpha)
    else:
        raise ValueError(mode)
    return transient, g


@partial(jax.jit, static_argnames=("cfg", "spt", "mode"))
def _inverse_impl(mesh: Mesh, data, weight, lighting, lighting_normal, key,
                  alpha, cfg: RenderConfig, spt: int, mode: str):
    lit, nrm, L, Lc, nc = _chunks(lighting, lighting_normal, cfg)
    fused = _use_fused(cfg, mesh)
    pad = nc * Lc - L
    # Padded rows carry zero weight => zero difference => zero gradient.
    data_p = _pad_rows(jnp.asarray(data), pad).reshape(nc, Lc, cfg.num_bins)
    weight_p = _pad_rows(jnp.asarray(weight), pad).reshape(nc, Lc,
                                                           cfg.num_bins)

    def one(args):
        lc, nc_, off, dat, w = args
        return _fused_chunk_body(mesh, lc, nc_, off, key, dat, w, cfg, spt,
                                 mode, alpha, fused)

    offsets = jnp.arange(nc) * Lc
    t, per_chunk = jax.lax.map(one, (lit, nrm, offsets, data_p, weight_p))
    transient = t.reshape(nc * Lc, cfg.num_bins)[:L]
    grad = per_chunk.sum(axis=0) / float(L)  # /numSources (t&g.cpp:561-565)
    return transient, grad


@partial(jax.jit, static_argnames=("cfg", "spt", "mode", "fused"))
def _fused_one_chunk(mesh: Mesh, lc, nc_, off, key, alpha, dat, w,
                     cfg: RenderConfig, spt: int, mode: str,
                     fused: bool = False):
    return _fused_chunk_body(mesh, lc, nc_, off, key, dat, w, cfg, spt,
                             mode, alpha, fused)


def _inverse_impl_host(mesh: Mesh, data, weight, lighting, lighting_normal,
                       key, alpha, cfg: RenderConfig, spt: int, mode: str):
    """_inverse_impl with the source-chunk loop on the HOST: one short XLA
    program per chunk instead of one program spanning the whole scan.

    Numerically identical to _inverse_impl (same chunking, same offsets,
    same keys).  Use when a single fused program would run long enough to
    hit dispatch/runtime execution limits (e.g. serving tunnels that bound
    per-program wall time), or to overlap dispatch with host work — the
    chunks dispatch asynchronously and only the final fetch synchronizes."""
    lit, nrm, L, Lc, nc = _chunks(lighting, lighting_normal, cfg)
    fused = _use_fused(cfg, mesh)
    pad = nc * Lc - L
    data_p = _pad_rows(jnp.asarray(data), pad).reshape(nc, Lc, cfg.num_bins)
    weight_p = _pad_rows(jnp.asarray(weight), pad).reshape(nc, Lc,
                                                           cfg.num_bins)

    parts = [
        _fused_one_chunk(mesh, lit[i], nrm[i], i * Lc, key, alpha,
                         data_p[i], weight_p[i], cfg, spt, mode, fused)
        for i in range(nc)
    ]
    transient = jnp.concatenate([t for t, _ in parts], axis=0)[:L]
    grad = parts[0][1]
    for _, g in parts[1:]:
        grad = grad + g
    return transient, grad / float(L)


def inverse_render(mesh: Mesh, data, weight, lighting, lighting_normal,
                   cfg: RenderConfig, key, alpha=None):
    """(transient [L,B], vertex gradient [V,3], pathlengths [B]).

    Parity with rendering.inverseRendering (rendering.py:252-269): the
    gradient is of  sum_l,b weight*(data - T_smooth)^2  averaged over sources,
    with the reference's forward tmp_refine semantics."""
    spt = _spt(cfg, mesh)
    a = jnp.float32(0.1) if alpha is None else alpha
    t, g = _inverse_impl(mesh, data, weight, lighting, lighting_normal, key,
                         a, cfg, spt, "vertex")
    return t, g, pathlengths(cfg)


def inverse_render_host(mesh: Mesh, data, weight, lighting,
                        lighting_normal, cfg: RenderConfig, key, alpha=None):
    """inverse_render with the source-chunk loop on the host (one short
    XLA program per chunk; numerically identical — see _inverse_impl_host).
    The production path for long scans through serving tunnels that bound
    per-program device time; also overlaps dispatch with host work."""
    spt = _spt(cfg, mesh)
    a = jnp.float32(0.1) if alpha is None else alpha
    t, g = _inverse_impl_host(mesh, data, weight, lighting, lighting_normal,
                              key, a, cfg, spt, "vertex")
    return t, g, pathlengths(cfg)


def inverse_shading_render(mesh: Mesh, data, weight, lighting,
                           lighting_normal, cfg: RenderConfig, key):
    """(transient, vertex gradient, pathlengths) with freshly recomputed
    interpolated vertex normals — inverseShadingRendering
    (rendering.py:219-229: per_vertex_normal then
    renderStreamedShadingGradient)."""
    from ..geometry.mesh import vertex_normals

    vn = vertex_normals(mesh.v, mesh.f, mesh.f_valid)
    mesh = mesh._replace(vn=vn)
    return inverse_render(mesh, data, weight, lighting, lighting_normal,
                          cfg.replace(normal="vn"), key)


def inverse_render_albedo(mesh: Mesh, data, weight, lighting, lighting_normal,
                          cfg: RenderConfig, key):
    """(transient, scalar albedo gradient) — inverseRenderingAlbedo
    (rendering.py:241-250)."""
    spt = _spt(cfg, mesh)
    t, g = _inverse_impl(mesh, data, weight, lighting, lighting_normal, key,
                         jnp.float32(0.0), cfg, spt, "albedo")
    return t, g


def inverse_render_alpha(mesh: Mesh, data, weight, lighting, lighting_normal,
                         cfg: RenderConfig, key, alpha):
    """(transient, scalar GGX-roughness gradient) — inverseRenderingAlpha
    (rendering.py:232-238)."""
    spt = _spt(cfg, mesh)
    t, g = _inverse_impl(mesh, data, weight, lighting, lighting_normal, key,
                         alpha, cfg, spt, "alpha")
    return t, g


@partial(jax.jit, static_argnames=("cfg", "spt", "vertex_num"))
def _vgrad_impl(mesh: Mesh, lighting, lighting_normal, key, cfg: RenderConfig,
                spt: int, vertex_num: int):
    lit, nrm, L, Lc, nc = _chunks(lighting, lighting_normal, cfg)

    def one(args):
        lc, nc_, off = args
        rays = trace_chunk(mesh, lc, nc_, key, cfg, spt, source_offset=off)
        return vertex_gradient_bins_chunk(rays, mesh, nc_, vertex_num, cfg, spt)

    offsets = jnp.arange(nc) * Lc
    return jax.lax.map(one, (lit, nrm, offsets)).sum(axis=0)


def vertex_gradient_bins(mesh: Mesh, lighting, lighting_normal,
                         cfg: RenderConfig, key, vertex_num: int):
    """Per-bin single-vertex gradient diagnostic [B,3]
    (rendering.py:26-30 / streamed_render_vertex_gradient)."""
    spt = _spt(cfg, mesh)
    return _vgrad_impl(mesh, lighting, lighting_normal, key, cfg, spt,
                       vertex_num)


@partial(jax.jit, static_argnames=("cfg", "spt", "jitter_offset", "grad"))
def _jitter_impl(mesh: Mesh, data, weight, lighting, lighting_normal, key,
                 jitter_weight, jitter_grad, cfg: RenderConfig, spt: int,
                 jitter_offset: int, grad: bool):
    lit, nrm, L, Lc, nc = _chunks(lighting, lighting_normal, cfg)
    offsets = jnp.arange(nc) * Lc

    if not grad:
        def fwd(args):
            lc, nc_, off = args
            rays = trace_chunk(mesh, lc, nc_, key, cfg, spt,
                               source_offset=off)
            return forward_chunk(rays, nc_, cfg, spt, refine=1)

        hist = jax.lax.map(fwd, (lit, nrm, offsets)).reshape(
            nc * Lc, cfg.num_bins)[:L]
        return jitter_convolve(hist, jitter_weight, jitter_offset), None

    # jitter_convolve and the difference are row-local per source, so one
    # trace per chunk serves both passes (see _fused_chunk_body).
    pad = nc * Lc - L
    data_p = _pad_rows(jnp.asarray(data), pad).reshape(nc, Lc, cfg.num_bins)
    weight_p = _pad_rows(jnp.asarray(weight), pad).reshape(nc, Lc,
                                                           cfg.num_bins)

    def one(args):
        lc, nc_, off, dat, w = args
        rays = trace_chunk(mesh, lc, nc_, key, cfg, spt, source_offset=off)
        hist = forward_chunk(rays, nc_, cfg, spt, refine=1)
        transient = jitter_convolve(hist, jitter_weight, jitter_offset)
        diff = _difference(dat, transient, w, cfg)
        g = backward_jitter_chunk(rays, mesh, nc_, diff, 0, cfg, spt,
                                  jitter_weight, jitter_grad, jitter_offset)
        return transient, g

    t, per_chunk = jax.lax.map(one, (lit, nrm, offsets, data_p, weight_p))
    transient = t.reshape(nc * Lc, cfg.num_bins)[:L]
    return transient, per_chunk.sum(axis=0) / float(L)


def render_transient_jitter(mesh: Mesh, lighting, lighting_normal,
                            cfg: RenderConfig, key, jitter_weight,
                            jitter_offset: int):
    """Forward transient smoothed by a measured temporal kernel [K]
    (jitter variant, rendering.py:252-269 opt.jitter branch)."""
    spt = _spt(cfg, mesh)
    t, _ = _jitter_impl(mesh, None, None, lighting, lighting_normal, key,
                        jnp.asarray(jitter_weight), jnp.zeros(1), cfg, spt,
                        jitter_offset, False)
    return t, pathlengths(cfg)


def inverse_render_jitter(mesh: Mesh, data, weight, lighting,
                          lighting_normal, cfg: RenderConfig, key,
                          jitter_weight, jitter_grad, jitter_offset: int):
    """(transient, vertex gradient, pathlengths) under the measured jitter
    kernel (jitter.pyx renderStreamedGradient)."""
    spt = _spt(cfg, mesh)
    t, g = _jitter_impl(mesh, jnp.asarray(data), jnp.asarray(weight),
                        lighting, lighting_normal, key,
                        jnp.asarray(jitter_weight), jnp.asarray(jitter_grad),
                        cfg, spt, jitter_offset, True)
    return t, g, pathlengths(cfg)


def transient_loss_and_grad(mesh: Mesh, data, weight, lighting,
                            lighting_normal, cfg: RenderConfig, key,
                            alpha=None):
    """Convenience: weighted L2 loss (rendering.py:360-367 style, without the
    smoothness term) plus the analytic vertex gradient."""
    t, g, _ = inverse_render(mesh, data, weight, lighting, lighting_normal,
                             cfg, key, alpha)
    diff = (t - data) * jnp.sqrt(weight)
    loss = jnp.sum(diff * diff) / data.shape[0]
    return loss, t, g
