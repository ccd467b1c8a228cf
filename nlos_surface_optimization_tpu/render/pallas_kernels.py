"""Pallas TPU kernels for the renderer hot path.

segment_occluded_pallas: the visibility query (nearest-hit == sampled-face
re-expressed as segment occlusion, geometry/intersect.py) as a fused
kernel.  The jnp path scans face tiles with lax.scan, whose [R, tile]
Möller–Trumbore intermediates round-trip HBM between fusions; here each
(ray-block x face-tile) grid cell runs MT entirely in VMEM, accumulating
the occlusion mask across the face-tile grid axis.

Two design points that matter on this hardware:

  * Layout: per-(ray, face) planes are [BLOCK_R, TILE_F] with TILE_F=128
    lanes; triangle data arrives PRE-TRANSPOSED as [16, F] so each
    component is a native (1, TILE_F) sublane slice — the [F, 9]-column
    variant forces a cross-lane relayout per component that this Mosaic
    toolchain compiles pathologically (observed: non-terminating compile).
  * Tile skipping: each grid cell first tests the face tile's bounding
    sphere against the ray block's bounding capsule (segment between the
    block's origin- and endpoint-sphere centers, radius = max of the two
    sphere radii + tile radius); on a miss the whole MT body is skipped
    via pl.when.  This is a dense two-level broad phase: exact (the
    capsule contains every segment of the block, so a sphere miss proves
    no face of the tile can occlude) and data-dependent only in *time*,
    never in shape.

Cites: reference visibility semantics transient_and_gradient.cpp:199-206.
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


def _occl_kernel(meta_ref, sph_ref, o_ref, d_ref, t_ref, fid_ref, tri_ref,
                 out_ref, *, t_rel, t_min, eps_det):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # --- capsule-vs-sphere prefilter (scalar math from SMEM; meta/sph are
    # scalar-prefetch args: FULL arrays indexed by the grid position).
    # Both are FLAT 1-D: SMEM pads the last axis to 128 lanes, so a
    # [nb, 8] layout would cost 16x its size and blow the 1 MB SMEM
    # budget at flagship ray counts. --------------------------------------
    ocx, ocy, ocz = meta_ref[i * 8 + 0], meta_ref[i * 8 + 1], meta_ref[i * 8 + 2]
    pcx, pcy, pcz = meta_ref[i * 8 + 3], meta_ref[i * 8 + 4], meta_ref[i * 8 + 5]
    block_r = meta_ref[i * 8 + 6]
    cx, cy, cz = sph_ref[j * 4 + 0], sph_ref[j * 4 + 1], sph_ref[j * 4 + 2]
    cr = sph_ref[j * 4 + 3]
    abx, aby, abz = pcx - ocx, pcy - ocy, pcz - ocz
    ab2 = abx * abx + aby * aby + abz * abz
    tt = (cx - ocx) * abx + (cy - ocy) * aby + (cz - ocz) * abz
    tt = jnp.clip(tt / jnp.maximum(ab2, 1e-30), 0.0, 1.0)
    qx = cx - (ocx + tt * abx)
    qy = cy - (ocy + tt * aby)
    qz = cz - (ocz + tt * abz)
    d2 = qx * qx + qy * qy + qz * qz
    reach = cr + block_r

    # reach < 0 marks an all-padding face tile (sentinel radius); a signed
    # guard is required because reach*reach would overflow f32 to +inf and
    # defeat the skip entirely (d2 >= 0 always).
    @pl.when((reach >= 0.0) & (d2 <= reach * reach))
    def _():
        o = o_ref[:]          # [R, 3]
        d = d_ref[:]          # [R, 3]
        tsf = t_ref[:]        # [R, 1]
        sfid = fid_ref[:]     # [R, 1] int32

        def col(m, k):        # [R, 1] ray component
            return m[:, k:k + 1]

        def trow(k):          # [1, TILE_F] triangle component (sublane slice)
            return tri_ref[k:k + 1, :]

        dx, dy, dz = col(d, 0), col(d, 1), col(d, 2)
        ox, oy, oz = col(o, 0), col(o, 1), col(o, 2)
        p1x, p1y, p1z = trow(0), trow(1), trow(2)
        e1x, e1y, e1z = trow(3), trow(4), trow(5)
        e2x, e2y, e2z = trow(6), trow(7), trow(8)
        val = trow(9)

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
            & (val > 0.5)
            & (t > t_min) & (t < t_cut)
            & (fid != sfid)
        )
        any_blocked = jnp.any(blocked, axis=1, keepdims=True)
        out_ref[:] = out_ref[:] | any_blocked


def _block_capsules(o, d, t_self, nb):
    """[NB, 8] f32: per ray-block (origin-sphere center, endpoint-sphere
    center, max radius, pad).  AABB-center bounding spheres."""
    p = o + d * t_self[:, None]
    ob = o.reshape(nb, BLOCK_R, 3)
    pb = p.reshape(nb, BLOCK_R, 3)

    def sphere(x):
        lo = x.min(axis=1)
        hi = x.max(axis=1)
        c = 0.5 * (lo + hi)
        r = jnp.linalg.norm(x - c[:, None, :], axis=-1).max(axis=1)
        return c, r

    oc, orad = sphere(ob)
    pc, prad = sphere(pb)
    rr = jnp.maximum(orad, prad)
    return jnp.concatenate(
        [oc, pc, rr[:, None], jnp.zeros((nb, 1), oc.dtype)], axis=1
    ).astype(jnp.float32)


def _tile_spheres(v, f, f_valid, nt):
    """[NT, 4] f32 bounding spheres over each face tile's VALID vertices;
    tiles with no valid face get radius -inf (always skipped)."""
    verts = v[f].astype(jnp.float32).reshape(nt, TILE_F, 3, 3)
    val = f_valid.reshape(nt, TILE_F)
    big = 1e30
    w = val[..., None, None]
    lo = jnp.where(w, verts, big).min(axis=(1, 2))
    hi = jnp.where(w, verts, -big).max(axis=(1, 2))
    c = 0.5 * (lo + hi)
    dist = jnp.linalg.norm(verts - c[:, None, None, :], axis=-1)
    r = jnp.where(val[..., None], dist, -big).max(axis=(1, 2))
    any_valid = val.any(axis=1)
    c = jnp.where(any_valid[:, None], c, 0.0)
    r = jnp.where(any_valid, r, -big)
    return jnp.concatenate([c, r[:, None]], axis=1)


# Cap on ray blocks per pallas_call: the flat capsule metadata lives in
# SMEM (8 f32 per block), and SMEM is ~1 MB/core shared with everything
# else.  4096 blocks = 128 KB of capsules = 2M rays per call; larger ray
# sets run as an outer lax.map over groups.
MAX_NB = 4096


def _occl_call(o_p, d_p, t_p, fid_p, tri_t, sph_flat, nt,
               t_rel, t_min, interpret):
    """One pallas_call over [Rp] padded rays (Rp multiple of BLOCK_R)."""
    Rp = o_p.shape[0]
    nb = Rp // BLOCK_R
    meta = _block_capsules(o_p, d_p, t_p, nb).reshape(-1)

    # NOTE: with num_scalar_prefetch=2 every index_map receives the two
    # scalar-prefetch refs appended to the grid indices — (i, j, meta, sph).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # meta, sph: FLAT arrays in SMEM
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((BLOCK_R, 3), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 3), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, TILE_F), lambda i, j, *_: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_R, 1), lambda i, j, *_: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_occl_kernel, t_rel=t_rel, t_min=t_min,
                          eps_det=1e-12),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, 1), jnp.bool_),
        interpret=interpret,
    )(meta, sph_flat, o_p, d_p, t_p.reshape(Rp, 1), fid_p.reshape(Rp, 1),
      tri_t)
    return out


@functools.partial(jax.jit,
                   static_argnames=("t_rel", "t_min", "interpret"))
def segment_occluded_pallas(o, d, t_self, self_fid, v, f, f_valid,
                            t_rel=1e-4, t_min=1e-6, interpret=False):
    """Drop-in for geometry.intersect.segment_occluded (same semantics)."""
    R = o.shape[0]
    F = f.shape[0]
    nb_total = pl.cdiv(R, BLOCK_R)
    ng = pl.cdiv(nb_total, MAX_NB)
    gnb = pl.cdiv(nb_total, ng)          # blocks per group
    Rp = ng * gnb * BLOCK_R
    Fp = pl.cdiv(F, TILE_F) * TILE_F

    dt = jnp.float32
    p1 = v[f[:, 0]].astype(dt)
    e1 = (v[f[:, 1]] - v[f[:, 0]]).astype(dt)
    e2 = (v[f[:, 2]] - v[f[:, 0]]).astype(dt)
    tri = jnp.concatenate([p1, e1, e2, f_valid.astype(dt)[:, None]], axis=1)
    # [16, Fp]: transposed so the kernel slices components along sublanes
    tri_t = jnp.pad(tri.T, ((0, 6), (0, Fp - F)))

    o_p = jnp.pad(o.astype(dt), ((0, Rp - R), (0, 0)))
    d_p = jnp.pad(d.astype(dt), ((0, Rp - R), (0, 0)), constant_values=1.0)
    t_p = jnp.pad(t_self.astype(dt), (0, Rp - R))
    fid_p = jnp.pad(self_fid.astype(jnp.int32), (0, Rp - R))

    nt = Fp // TILE_F
    fv_p = jnp.pad(f_valid, (0, Fp - F))
    f_pad = jnp.pad(f, ((0, Fp - F), (0, 0)))
    sph_flat = _tile_spheres(v, f_pad, fv_p, nt).reshape(-1)

    if ng == 1:
        out = _occl_call(o_p, d_p, t_p, fid_p, tri_t, sph_flat, nt,
                         t_rel, t_min, interpret)
        return out[:R, 0]

    gR = gnb * BLOCK_R

    def one(args):
        og, dg, tg, fg = args
        return _occl_call(og, dg, tg, fg, tri_t, sph_flat, nt,
                          t_rel, t_min, interpret)

    out = jax.lax.map(one, (o_p.reshape(ng, gR, 3), d_p.reshape(ng, gR, 3),
                            t_p.reshape(ng, gR), fid_p.reshape(ng, gR)))
    return out.reshape(Rp)[:R]
