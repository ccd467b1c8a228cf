"""Differentiable "autograd twin" of the transient renderer.

A fully jax.grad-compatible forward model that splats each path sample into
time bins with the exact Gaussian-CDF integral instead of quantized kernel
taps, with detached (stop-gradient) sampling and visibility.  It plays the
role the reference's prototype autograd renderer plays
(transient_rendering_python/rendering_grad.py, test_autograd.py): an
independent differentiable implementation used as the mathematical ground
truth for the analytic gradient, and a composable differentiable renderer
for optax-style pipelines.

The smoothed transient model is
    T[l,b] = sum_s c_s(v) * (Phi(ub - 2h_s(v)) - Phi(lb - 2h_s(v)))
with c_s = area*albedo*ff^2(*BRDF) and Phi the N(0, sigma) CDF; bin edges
lb/ub at b*res+lo / (b+1)*res+lo.  Its exact derivative equals the analytic
backward's continuous model; the analytic pass approximates the integral by
K kernel taps.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..geometry.mesh import Mesh
from .core import RayBatch, trace_chunk
from . import brdf as ggx


def _phi(x, sigma):
    return 0.5 * (1.0 + jax.lax.erf(x / (sigma * jnp.sqrt(2.0))))


def twin_transient_from_rays(v, mesh: Mesh, rays: RayBatch, lighting,
                             lighting_normal, cfg: RenderConfig, spt: int,
                             alpha=None, clamp_mode: str = "separate",
                             detach_normal: bool = True):
    """Smoothed transient [Lc, B] as a differentiable function of vertex
    positions `v` ([V,3]); sampling (barycoords), visibility, and face
    validity come detached from `rays`.

    clamp_mode 'separate' follows the gradient kernel's cosine clamping;
    'product' follows the forward kernel's.

    detach_normal=True freezes the shading normal, matching the reference's
    gradient model (no d(normal)/dv term in fn mode); False gives the TRUE
    gradient of the smoothed render, for FD validation."""
    f = mesh.f
    bary = jax.lax.stop_gradient(rays.bary)
    valid = jax.lax.stop_gradient(rays.valid)

    v1, v2, v3 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    nvec = jnp.cross(v2 - v1, v3 - v1)
    dbl = jnp.linalg.norm(nvec, axis=-1)
    area = dbl / 2.0
    fn = nvec / jnp.maximum(dbl, 1e-30)[:, None]

    p = (
        bary[..., 0:1] * v1[None, :, None, :]
        + bary[..., 1:2] * v2[None, :, None, :]
        + bary[..., 2:3] * v3[None, :, None, :]
    )
    o = lighting[:, None, None, :]
    dvec = p - o
    h = jnp.linalg.norm(dvec, axis=-1)
    h = jnp.maximum(h, 1e-12)
    d = dvec / h[..., None]

    if cfg.normal == "vn":
        n1, n2, n3 = mesh.vn[f[:, 0]], mesh.vn[f[:, 1]], mesh.vn[f[:, 2]]
        nrm = (
            bary[..., 0:1] * n1[None, :, None, :]
            + bary[..., 1:2] * n2[None, :, None, :]
            + bary[..., 2:3] * n3[None, :, None, :]
        )
    else:
        nrm = jnp.broadcast_to(fn[None, :, None, :], p.shape)
    # The analytic backward holds the shading normal fixed at its current
    # value in fn mode (no dn/dv term outside the vn/testing_flag gn path);
    # detach it so twin-vs-analytic comparisons are exact.
    if detach_normal:
        nrm = jax.lax.stop_gradient(nrm)

    a1, a2, a3 = mesh.albedo[f[:, 0]], mesh.albedo[f[:, 1]], mesh.albedo[f[:, 2]]
    alb = (
        bary[..., 0] * a1[None, :, None]
        + bary[..., 1] * a2[None, :, None]
        + bary[..., 2] * a3[None, :, None]
    )

    onorm = lighting_normal[:, None, None, :]
    if clamp_mode == "separate":
        cos2 = jnp.maximum(jnp.sum(onorm * d, axis=-1), 0.0)
        cos3 = jnp.maximum(-jnp.sum(nrm * d, axis=-1), 0.0)
        ff = cos2 * cos3 / (h * h)
    else:
        ff = jnp.maximum(
            0.0, -jnp.sum(nrm * d, axis=-1) * jnp.sum(onorm * d, axis=-1)
        ) / (h * h)
    c = alb * ff * ff
    if cfg.brdf == "ggx":
        c = c * ggx.eval_scalar(alpha, jnp.sum(nrm * (-d), axis=-1))
    c = c * area[None, :, None] / float(spt)
    c = jnp.where(valid, c, 0.0)

    B = cfg.num_bins
    edges = cfg.bin_lower + jnp.arange(B + 1) * cfg.distance_resolution
    # [Lc,F,spt,B+1] is big; contract over bins via CDF differences in a scan
    # over bin blocks if needed.  For twin/test use, dense is fine.
    x = edges[None, None, None, :] - 2.0 * h[..., None]
    cdf = _phi(x, cfg.sigma)
    w = cdf[..., 1:] - cdf[..., :-1]
    return jnp.einsum("lfs,lfsb->lb", c, w)


def twin_transient(mesh: Mesh, lighting, lighting_normal, cfg: RenderConfig,
                   key, alpha=None, clamp_mode: str = "separate"):
    """Differentiable smoothed transient [L,B]; gradient flows to mesh.v."""
    spt = cfg.samples_per_face(int(mesh.f.shape[0]))
    rays = trace_chunk(mesh, lighting, lighting_normal, key, cfg, spt)
    return twin_transient_from_rays(
        mesh.v, mesh, rays, lighting, lighting_normal, cfg, spt, alpha=alpha,
        clamp_mode=clamp_mode,
    )
