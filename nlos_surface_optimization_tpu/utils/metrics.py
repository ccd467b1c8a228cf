"""Evaluation metrics.

compute_v2 <- rendering.py:182-191: mean UNSIGNED distance from the current
vertices to the GT mesh (igl.signed_distance with
SIGNED_DISTANCE_TYPE_UNSIGNED there).  Implemented as an exact point-
triangle distance min-reduced over faces (Ericson, Real-Time Collision
Detection §5.1.5) — O(P*F) dense, fine on TPU for the mesh sizes involved
and trivially correct.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.mesh import Mesh


def _point_triangle_dist2(p, a, b, c):
    """Squared distance point->triangle; p [..,3], a/b/c [..,3]."""
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # region tests (in priority order, composed with where)
    # vertex regions
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    # edge regions
    v_ab = jnp.where(jnp.abs(d1 - d3) > 0, d1 / (d1 - d3 + 1e-300), 0.0)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    w_ac = jnp.where(jnp.abs(d2 - d6) > 0, d2 / (d2 - d6 + 1e-300), 0.0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    w_bc = jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) > 0,
        (d4 - d3) / ((d4 - d3) + (d5 - d6) + 1e-300), 0.0,
    )
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    denom = 1.0 / jnp.maximum(va + vb + vc, 1e-300)
    v_in = vb * denom
    w_in = vc * denom

    closest = a + v_in[..., None] * ab + w_in[..., None] * ac          # face
    closest = jnp.where(on_bc[..., None],
                        b + w_bc[..., None] * (c - b), closest)
    closest = jnp.where(on_ac[..., None],
                        a + w_ac[..., None] * ac, closest)
    closest = jnp.where(on_ab[..., None],
                        a + v_ab[..., None] * ab, closest)
    closest = jnp.where(in_c[..., None], c, closest)
    closest = jnp.where(in_b[..., None], b, closest)
    closest = jnp.where(in_a[..., None], a, closest)
    d = p - closest
    return jnp.sum(d * d, -1)


@partial(jax.jit, static_argnames=())
def point_mesh_distance(points, v, f, f_valid):
    """Unsigned distance [P] from each point to the mesh surface."""
    a = v[f[:, 0]]
    b = v[f[:, 1]]
    c = v[f[:, 2]]

    def per_point(p):
        d2 = _point_triangle_dist2(p[None, :], a, b, c)
        d2 = jnp.where(f_valid, d2, jnp.inf)
        return jnp.sqrt(jnp.min(d2))

    return jax.lax.map(per_point, jnp.asarray(points), batch_size=1024)


def compute_v2(v, gt_mesh: Mesh):
    """Mean unsigned distance of vertices to the GT mesh
    (rendering.py:182-191)."""
    d = point_mesh_distance(v, gt_mesh.v, gt_mesh.f, gt_mesh.f_valid)
    return jnp.mean(d)


def average_z_distance(v, gt_mesh: Mesh):
    """Mean |z - z_gt| where z_gt is the GT surface depth hit by a +z ray
    from (x, y, 0) — the reference's MATLAB eval metric
    (average_point_distance_to_mesh.m:1-16).  Vertices whose ray misses the
    GT mesh are excluded."""
    from ..geometry.intersect import nearest_hit

    v = jnp.asarray(v)
    o = v.at[:, 2].set(0.0)
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], v.dtype), (v.shape[0], 1))
    fid, _, _, t = nearest_hit(o, d, gt_mesh.v, gt_mesh.f, gt_mesh.f_valid)
    hit = fid >= 0
    err = jnp.abs(v[:, 2] - t)
    return jnp.sum(jnp.where(hit, err, 0.0)) / jnp.maximum(hit.sum(), 1)
