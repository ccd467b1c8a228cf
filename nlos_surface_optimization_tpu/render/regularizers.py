"""Mesh regularizers: total-area (curvature) gradient and normal smoothness.

Reference: smoothed_transient/stratifiedStreamedGradientRenderer.cpp —
`streamedTriangleCurvatureGrad` (:27-57), `streamedTriangleNormalSmoothing`
(:77-126), drivers `streamed_render_curvature_grad` (:162-180) and
`streamed_render_normal_smoothing` (:127-160).

Deliberate deviation: the reference writes per-triangle contributions into
its per-thread gradient buffer with `=` instead of `+=` (e.g. :41-43,
:108-110), so for vertices shared by triangles handled by the same thread
only the LAST triangle's term survives — a thread-count-dependent
last-writer-wins race (SURVEY.md §5).  The formulas below are the intended
sums, implemented as segment_sum scatters; `jax.grad` of `total_area`
reproduces `curvature_gradient` exactly, confirming the intended math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.mesh import Mesh, face_normals_areas


def _scatter_cross(term, v1, v2, v3, f, num_v):
    """Scatter cross(term, opposite_edge/2) into the 3 vertex slots.

    term: [F,3] per-face vector (the face normal or its smoothing residual).
    Returns [V,3]."""
    g1 = jnp.cross(term, (v3 - v2) / 2.0)
    g2 = jnp.cross(term, (v1 - v3) / 2.0)
    g3 = jnp.cross(term, (v2 - v1) / 2.0)
    stacked = jnp.stack([g1, g2, g3], axis=1).reshape(-1, 3)
    return jax.ops.segment_sum(stacked, f.reshape(-1), num_segments=num_v)


@jax.jit
def curvature_gradient(v: jax.Array, f: jax.Array, f_valid: jax.Array):
    """d(total mesh area)/d(vertices) -> [V,3].

    Per face, the gradient w.r.t. each vertex is cross(n, e_opp)/2
    (streamedTriangleCurvatureGrad, :40-56), summed over incident faces."""
    p1, p2, p3 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n, _ = face_normals_areas(v, f)
    n = jnp.where(f_valid[:, None], n, 0.0)
    return _scatter_cross(n, p1, p2, p3, f, v.shape[0])


@jax.jit
def normal_smoothing(v: jax.Array, f: jax.Array, f_valid: jax.Array,
                     affinity: jax.Array):
    """(value, gradient [V,3]) of the area-weighted neighbor-normal
    misalignment regularizer.

    Per face i with edge-neighbors N(i) (affinity [F,3], -1 = border):
        m_i   = normalize(area_i*n_i + sum_{j in N(i)} area_j*n_j)
        value = sum_i area_i * (1 - dot(m_i, n_i))
        grad  = scatter cross(n_i - m_i, e_opp/2)  per vertex slot
    (streamedTriangleNormalSmoothing, :78-126)."""
    p1, p2, p3 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n, area = face_normals_areas(v, f)
    area = jnp.where(f_valid, area, 0.0)
    wn = n * area[:, None]  # area-weighted normals

    nb = jnp.clip(affinity, 0, f.shape[0] - 1)
    nb_ok = (affinity >= 0) & f_valid[:, None] & f_valid[nb]
    acc = wn + jnp.sum(jnp.where(nb_ok[..., None], wn[nb], 0.0), axis=1)
    m = acc / jnp.maximum(jnp.linalg.norm(acc, axis=-1, keepdims=True), 1e-30)

    value = jnp.sum(area * (1.0 - jnp.sum(m * n, axis=-1)))

    residual = jnp.where(f_valid[:, None], n - m, 0.0)
    grad = _scatter_cross(residual, p1, p2, p3, f, v.shape[0])
    return value, grad


def total_area(v: jax.Array, f: jax.Array, f_valid: jax.Array):
    _, area = face_normals_areas(v, f)
    return jnp.sum(jnp.where(f_valid, area, 0.0))


def curvature_gradient_mesh(mesh: Mesh):
    return curvature_gradient(mesh.v, mesh.f, mesh.f_valid)


def normal_smoothing_mesh(mesh: Mesh, affinity: jax.Array):
    return normal_smoothing(mesh.v, mesh.f, mesh.f_valid, affinity)
