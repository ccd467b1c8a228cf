"""shard_map sharding of forward/inverse rendering over the source axis.

Work decomposition: the L scan points are split across the device mesh's
'sources' axis; every device holds the full (replicated) triangle mesh and
renders/differentiates only its source shard.  The transient [L, B] stays
sharded by source; the vertex gradient [V, 3] and the scalar albedo/alpha
gradients are `psum`ed over ICI — the TPU-native counterpart of the
reference's per-thread accumulator + sequential reduction
(transient_and_gradient.cpp:308-345, 548-565).

Determinism: sampling keys are folded with the GLOBAL source index
(geometry/sampling.py), so the rendered transient and gradients are
bit-identical for any device count (tested in tests/test_sharding.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import PartitionSpec as P

from ..config import RenderConfig
from ..geometry.mesh import Mesh
from ..render.core import (
    backward_albedo_chunk,
    backward_alpha_chunk,
    backward_chunk,
    forward_chunk,
    trace_chunk,
)
from ..render.kernels import smooth_and_coarsen

AXIS = "sources"


def make_source_mesh(devices=None) -> DeviceMesh:
    """1-D device mesh over the source axis.

    Multi-host: pass jax.devices() after jax.distributed.initialize() — the
    axis then spans hosts x local devices, gradients all-reduce over ICI
    within a host and DCN across hosts."""
    devices = jax.devices() if devices is None else devices
    return DeviceMesh(np.asarray(devices), (AXIS,))


def _pad_sources(lighting, lighting_normal, data, weight, n_shards):
    """Pad L to a multiple of n_shards.  Padded sources carry a zero
    lighting normal (=> zero contribution) and zero weight (=> zero
    difference => zero gradient)."""
    L = lighting.shape[0]
    Lp = math.ceil(L / n_shards) * n_shards
    pad = Lp - L
    if pad:
        lighting = jnp.pad(lighting, ((0, pad), (0, 0)))
        lighting_normal = jnp.pad(lighting_normal, ((0, pad), (0, 0)))
        if data is not None:
            data = jnp.pad(data, ((0, pad), (0, 0)))
            weight = jnp.pad(weight, ((0, pad), (0, 0)))
    return lighting, lighting_normal, data, weight, L, Lp


@partial(jax.jit, static_argnames=("cfg", "spt", "refine", "dmesh"))
def _sharded_forward(mesh: Mesh, lighting, lighting_normal, key, alpha,
                     cfg: RenderConfig, spt: int, refine: int,
                     dmesh: DeviceMesh):
    n = dmesh.devices.size
    lighting, lighting_normal, _, _, L, Lp = _pad_sources(
        lighting, lighting_normal, None, None, n
    )
    Lc = Lp // n

    @partial(
        jax.shard_map,
        mesh=dmesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(), P()),
        out_specs=P(AXIS),
    )
    def shard(m, lit, nrm, k, a):
        off = jax.lax.axis_index(AXIS) * Lc
        rays = trace_chunk(m, lit, nrm, k, cfg, spt, source_offset=off)
        fine = forward_chunk(rays, nrm, cfg, spt, refine, alpha=a)
        return smooth_and_coarsen(fine, cfg.distance_resolution, refine,
                                  cfg.sigma_bin)

    return shard(mesh, lighting, lighting_normal, key, alpha)[:L]


def sharded_render_transient(mesh: Mesh, lighting, lighting_normal,
                             cfg: RenderConfig, key, dmesh: DeviceMesh,
                             refine: Optional[int] = None, alpha=None):
    """Forward transient [L, B] with sources sharded over `dmesh`."""
    # spt from the VALID face count (same as render.api._spt): padded
    # rows of a shape-bucketed mesh must not dilute the per-face
    # sample budget (transient_and_gradient.cpp:184-191 allocation)
    spt = cfg.samples_per_face(int(np.asarray(mesh.f_valid).sum()))
    r = cfg.bin_refine_resolution if refine is None else refine
    a = jnp.float32(0.1) if alpha is None else alpha
    return _sharded_forward(mesh, jnp.asarray(lighting),
                            jnp.asarray(lighting_normal), key, a, cfg, spt, r,
                            dmesh)


@partial(jax.jit, static_argnames=("cfg", "spt", "mode", "dmesh"))
def _sharded_inverse(mesh: Mesh, data, weight, lighting, lighting_normal,
                     key, alpha, cfg: RenderConfig, spt: int, mode: str,
                     dmesh: DeviceMesh):
    n = dmesh.devices.size
    lighting, lighting_normal, data, weight, L, Lp = _pad_sources(
        lighting, lighting_normal, data, weight, n
    )
    Lc = Lp // n

    @partial(
        jax.shard_map,
        mesh=dmesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P()),
    )
    def shard(m, dat, w, lit, nrm, k, a):
        off = jax.lax.axis_index(AXIS) * Lc
        rays = trace_chunk(m, lit, nrm, k, cfg, spt, source_offset=off)
        fine = forward_chunk(rays, nrm, cfg, spt, cfg.forward_refine,
                             alpha=a)
        transient = smooth_and_coarsen(fine, cfg.distance_resolution,
                                       cfg.forward_refine, cfg.sigma_bin)
        d = dat - transient
        if cfg.loss_flag == 1:
            d = 2.0 * d * d * d
        diff = d * w
        # difference rows are local: index with source_offset=0
        if mode == "vertex":
            g = backward_chunk(rays, m, nrm, diff, 0, cfg, spt, alpha=a)
        elif mode == "albedo":
            g = backward_albedo_chunk(rays, nrm, diff, 0, cfg, spt)
        else:
            g = backward_alpha_chunk(rays, nrm, diff, 0, cfg, spt, a)
        g = jax.lax.psum(g, AXIS) / float(L)
        return transient, g

    t, g = shard(mesh, data, weight, lighting, lighting_normal, key, alpha)
    return t[:L], g


def sharded_inverse_render(mesh: Mesh, data, weight, lighting,
                           lighting_normal, cfg: RenderConfig, key,
                           dmesh: DeviceMesh, alpha=None,
                           mode: str = "vertex"):
    """(transient [L,B] source-sharded, gradient replicated).

    mode: 'vertex' -> [V,3] vertex gradient; 'albedo'/'alpha' -> scalar.
    Semantics identical to render.api.inverse_render* on one device."""
    # spt from the VALID face count (same as render.api._spt): padded
    # rows of a shape-bucketed mesh must not dilute the per-face
    # sample budget (transient_and_gradient.cpp:184-191 allocation)
    spt = cfg.samples_per_face(int(np.asarray(mesh.f_valid).sum()))
    a = jnp.float32(0.1) if alpha is None else alpha
    if mode == "alpha":
        a = alpha
    return _sharded_inverse(mesh, jnp.asarray(data), jnp.asarray(weight),
                            jnp.asarray(lighting),
                            jnp.asarray(lighting_normal), key, a, cfg, spt,
                            mode, dmesh)
