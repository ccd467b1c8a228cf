"""Ray-triangle intersection and visibility on TPU.

The reference casts Embree ray streams and accepts a sample iff the nearest
hit is the sampled triangle (transient_and_gradient.cpp:199-206).  We
re-express that as a segment-occlusion query: a sample at distance t_self on
its own face is visible iff no OTHER face intersects the ray strictly before
t_self.  This avoids an argmin and reduces to a masked any-reduction that XLA
vectorizes; the face loop is tiled with lax.scan to bound memory.

Also provides the nearest-hit API mirroring embree_intersector
(c_embree_intersector.cpp:106-163) used by the geometry pipeline
(space-carving projection, Delaunay validation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Padding for face tiles: a degenerate triangle at the origin never hits.
_DEF_TILE = 512


def moller_trumbore(o, d, p1, e1, e2, eps_det=1e-12):
    """Batched Möller–Trumbore.

    o,d: [...,3] ray origins/directions;  p1,e1,e2: [K,3] triangle data
    (first vertex, edges v2-v1, v3-v1).  Returns (t, u, v, hit) each [..., K].
    Pure math re-derivation (cf. the prototype's NumPy version,
    transient_rendering_python/mesh_intersection.py:3-53).
    """
    pvec = jnp.cross(d[..., None, :], e2[None, :, :])          # [...,K,3]
    det = jnp.sum(e1 * pvec, axis=-1)                          # [...,K]
    inv_det = jnp.where(jnp.abs(det) > eps_det, 1.0 / det, 0.0)
    tvec = o[..., None, :] - p1                                # [...,K,3]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(d[..., None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) > eps_det)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
    )
    return t, u, v, hit


def _pad_faces(v, f, tile):
    F = f.shape[0]
    Fp = -(-F // tile) * tile
    p1 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p1
    e2 = v[f[:, 2]] - p1
    pad = Fp - F
    if pad:
        p1 = jnp.pad(p1, ((0, pad), (0, 0)))
        e1 = jnp.pad(e1, ((0, pad), (0, 0)))
        e2 = jnp.pad(e2, ((0, pad), (0, 0)))
    return p1, e1, e2, Fp


@partial(jax.jit, static_argnames=("tile",))
def segment_occluded(o, d, t_self, self_fid, v, f, f_valid,
                     t_rel=1e-4, t_min=1e-6, tile=_DEF_TILE):
    """True where the segment o -> o + d*t_self is blocked by another face.

    o,d: [R,3]; t_self: [R] (distance to the sampled point, d unit-norm);
    self_fid: [R] face the sample lives on (never occludes itself).
    Scans faces in tiles of `tile` to bound the [R, tile] working set.
    """
    p1, e1, e2, Fp = _pad_faces(v, f, tile)
    valid = jnp.pad(f_valid, (0, Fp - f.shape[0]))
    n_tiles = Fp // tile
    p1 = p1.reshape(n_tiles, tile, 3)
    e1 = e1.reshape(n_tiles, tile, 3)
    e2 = e2.reshape(n_tiles, tile, 3)
    valid = valid.reshape(n_tiles, tile)
    t_cut = t_self * (1.0 - t_rel)

    def body(occ, tri):
        tp1, te1, te2, tva, tstart = tri
        t, _, _, hit = moller_trumbore(o, d, tp1, te1, te2)
        fid = tstart + jnp.arange(tile)
        blocked = (
            hit
            & tva[None, :]
            & (t > t_min)
            & (t < t_cut[:, None])
            & (fid[None, :] != self_fid[:, None])
        )
        return occ | jnp.any(blocked, axis=-1), None

    starts = jnp.arange(n_tiles) * tile
    # derive the all-False carry from a varying input so the carry's
    # varying-manual-axes match under shard_map (vma-clean)
    occ0 = t_self != t_self
    occ, _ = jax.lax.scan(body, occ0, (p1, e1, e2, valid, starts))
    return occ


@partial(jax.jit, static_argnames=("tile",))
def segment_occluded_mxu(o, d, t_self, self_fid, v, f, f_valid,
                         t_rel=1e-4, t_min=1e-6, tile=_DEF_TILE):
    """segment_occluded with the Möller–Trumbore batch cast as systolic-
    array matmuls (geometry.accel.mt_coefficients): phi [R,10] @ B [10,4T]
    per face tile — the MXU does the ray casting, the VPU only signs."""
    from .accel import mt_coefficients

    F = f.shape[0]
    Fp = -(-F // tile) * tile
    p1 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p1
    e2 = v[f[:, 2]] - p1
    soup = jnp.concatenate([p1, e1, e2,
                            f_valid.astype(p1.dtype)[:, None]], axis=1)
    soup = jnp.pad(soup, ((0, Fp - F), (0, 0)))
    n_tiles = Fp // tile
    B_all, val_all = mt_coefficients(soup.reshape(n_tiles, tile, 10))
    # B_all [n_tiles, 10, tile*4]; val_all [n_tiles, tile]

    c = jnp.cross(o, d)
    phi = jnp.concatenate([d, c, o, jnp.ones_like(o[:, :1])], axis=1)
    t_cut = t_self * (1.0 - t_rel)

    def body(occ, args):
        B, tval, tstart = args
        out = jnp.matmul(phi, B,
                         precision=jax.lax.Precision.HIGHEST)  # [R, tile*4]
        out = out.reshape(-1, tile, 4)
        det = out[..., 0]
        u_num = out[..., 1]
        v_num = out[..., 2]
        t_num = out[..., 3]
        fid = tstart + jnp.arange(tile)
        blocked = (
            (jnp.abs(det) > 1e-12)
            & (u_num * det >= 0.0) & (v_num * det >= 0.0)
            & ((u_num + v_num - det) * det <= 0.0)
            & ((t_num - t_min * det) * det > 0.0)
            & ((t_num - t_cut[:, None] * det) * det < 0.0)
            & (tval[None, :] != 0.0)
            & (fid[None, :] != self_fid[:, None])
        )
        return occ | jnp.any(blocked, axis=-1), None

    starts = jnp.arange(n_tiles) * tile
    occ0 = t_self != t_self
    occ, _ = jax.lax.scan(body, occ0, (B_all, val_all, starts))
    return occ


@partial(jax.jit, static_argnames=("tile",))
def nearest_hit(o, d, v, f, f_valid, t_min=1e-6, tile=_DEF_TILE):
    """Nearest-hit query: returns (fid, u, v, t); fid = -1 for a miss.

    TPU equivalent of embree_intersector.embree3_tbb_line_intersection
    (c_embree_intersector.cpp:106-163): rays with no hit get fid -1.
    """
    p1, e1, e2, Fp = _pad_faces(v, f, tile)
    valid = jnp.pad(f_valid, (0, Fp - f.shape[0]))
    n_tiles = Fp // tile
    p1 = p1.reshape(n_tiles, tile, 3)
    e1 = e1.reshape(n_tiles, tile, 3)
    e2 = e2.reshape(n_tiles, tile, 3)
    valid = valid.reshape(n_tiles, tile)

    R = o.shape[0]
    # carries derived from varying inputs (vma-clean under shard_map);
    # dtype follows o so x64 test runs don't break the scan carry
    zero = o[:, 0] * 0.0
    init = (
        zero + jnp.inf,                        # best t
        zero.astype(jnp.int32) - 1,            # best fid
        zero,                                  # u
        zero,                                  # v
    )

    def body(state, tri):
        bt, bf, bu, bv = state
        tp1, te1, te2, tva, tstart = tri
        t, u, w, hit = moller_trumbore(o, d, tp1, te1, te2)
        ok = hit & tva[None, :] & (t > t_min)
        t = jnp.where(ok, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        better = tj < bt
        idx = (jnp.arange(R), j)
        bt = jnp.where(better, tj, bt)
        bf = jnp.where(better, (tstart + j).astype(jnp.int32), bf)
        bu = jnp.where(better, u[idx], bu)
        bv = jnp.where(better, w[idx], bv)
        return (bt, bf, bu, bv), None

    starts = jnp.arange(n_tiles) * tile
    (bt, bf, bu, bv), _ = jax.lax.scan(body, init, (p1, e1, e2, valid, starts))
    return bf, bu, bv, jnp.where(jnp.isfinite(bt), bt, -1.0)


def ray_mesh_barycoords(o, d, v, f, f_valid=None):
    """[R,3] barycoord output (fid, u, v) like embree_intersector's module
    API; fid==-1 signals a miss (embree_intersector.pyx:24-45)."""
    if f_valid is None:
        f_valid = jnp.ones(f.shape[0], dtype=bool)
    fid, u, w, _ = nearest_hit(o, d, v, f, f_valid)
    return jnp.stack([fid.astype(jnp.float32), u, w], axis=-1)
