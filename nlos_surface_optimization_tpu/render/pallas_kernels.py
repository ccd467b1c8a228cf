"""Pallas TPU kernels for the renderer hot path.

segment_occluded_pallas: the visibility query (nearest-hit == sampled-face
re-expressed as segment occlusion, geometry/intersect.py) as a fused
kernel.  The jnp path scans face tiles with lax.scan, whose carry and ray
tensors round-trip HBM between iterations; here each (ray-block x
face-tile) grid cell runs Möller–Trumbore entirely in VMEM with the
triangle soup resident on-chip, accumulating the occlusion mask across the
face-tile grid axis.

Layout: all per-(ray, face) planes are [BLOCK_R, TILE_F] with TILE_F=128
lanes (VPU lane width); vector components are kept as separate planes so
every op is a broadcasted elementwise multiply/add (no gather, no
transpose).  Cites: reference visibility semantics
transient_and_gradient.cpp:199-206.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_R = 512
TILE_F = 128


def _occl_kernel(o_ref, d_ref, t_ref, fid_ref, tri_ref, valid_ref, out_ref,
                 *, t_rel, t_min, eps_det):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    o = o_ref[:]          # [R, 3]
    d = d_ref[:]          # [R, 3]
    tsf = t_ref[:]        # [R, 1]
    sfid = fid_ref[:]     # [R, 1] int32
    tri = tri_ref[:]      # [TILE_F, 9] = p1 | e1 | e2
    val = valid_ref[:]    # [TILE_F, 1] int32

    def col(m, k):  # [R,1] ray component
        return m[:, k:k + 1]

    def trow(k):    # [1,TILE_F] triangle component
        return tri[:, k].reshape(1, TILE_F)

    dx, dy, dz = col(d, 0), col(d, 1), col(d, 2)
    ox, oy, oz = col(o, 0), col(o, 1), col(o, 2)
    p1x, p1y, p1z = trow(0), trow(1), trow(2)
    e1x, e1y, e1z = trow(3), trow(4), trow(5)
    e2x, e2y, e2z = trow(6), trow(7), trow(8)

    # pvec = cross(d, e2):   [R, TILE_F] planes
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv = jnp.where(jnp.abs(det) > eps_det, 1.0 / det, 0.0)

    tvx = ox - p1x
    tvy = oy - p1y
    tvz = oz - p1z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv

    # qvec = cross(tvec, e1)
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv

    fid = (j * TILE_F
           + jax.lax.broadcasted_iota(jnp.int32, (1, TILE_F), 1))
    t_cut = tsf * (1.0 - t_rel)

    blocked = (
        (jnp.abs(det) > eps_det)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (val.reshape(1, TILE_F) != 0)
        & (t > t_min) & (t < t_cut)
        & (fid != sfid)
    )
    any_blocked = jnp.any(blocked, axis=1, keepdims=True)
    out_ref[:] = out_ref[:] | any_blocked


@functools.partial(jax.jit,
                   static_argnames=("t_rel", "t_min", "interpret"))
def segment_occluded_pallas(o, d, t_self, self_fid, v, f, f_valid,
                            t_rel=1e-4, t_min=1e-6, interpret=False):
    """Drop-in for geometry.intersect.segment_occluded (same semantics)."""
    R = o.shape[0]
    F = f.shape[0]
    Rp = pl.cdiv(R, BLOCK_R) * BLOCK_R
    Fp = pl.cdiv(F, TILE_F) * TILE_F

    dt = jnp.float32
    p1 = v[f[:, 0]].astype(dt)
    e1 = (v[f[:, 1]] - v[f[:, 0]]).astype(dt)
    e2 = (v[f[:, 2]] - v[f[:, 0]]).astype(dt)
    tri = jnp.concatenate([p1, e1, e2], axis=1)          # [F, 9]
    tri = jnp.pad(tri, ((0, Fp - F), (0, 0)))
    valid = jnp.pad(f_valid.astype(jnp.int32), (0, Fp - F)).reshape(Fp, 1)

    o_p = jnp.pad(o.astype(dt), ((0, Rp - R), (0, 0)))
    d_p = jnp.pad(d.astype(dt), ((0, Rp - R), (0, 0)), constant_values=1.0)
    t_p = jnp.pad(t_self.astype(dt), (0, Rp - R)).reshape(Rp, 1)
    fid_p = jnp.pad(self_fid.astype(jnp.int32), (0, Rp - R)).reshape(Rp, 1)

    grid = (Rp // BLOCK_R, Fp // TILE_F)
    out = pl.pallas_call(
        functools.partial(_occl_kernel, t_rel=t_rel, t_min=t_min,
                          eps_det=1e-12),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_R, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 3), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_F, 9), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_F, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.bool_),
        interpret=interpret,
    )(o_p, d_p, t_p, fid_p, tri, valid)
    return out[:R, 0]
