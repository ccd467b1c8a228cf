"""Mesh containers and differential-geometry helpers.

The device-side mesh is a pytree of padded, static-shape arrays so that
remeshing (which changes V/F) only triggers recompilation when a padding
bucket is crossed.  Invalid (padding) faces carry a validity mask and are
excluded from every reduction.

Reference correspondences:
  face normals/areas       exp_bunny/rendering.py:310-318
  per-vertex normals       cgal_api/c_cgal_api.cpp:129-155 (area-weighted)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Mesh(NamedTuple):
    """Device mesh: padded static-shape arrays + validity masks.

    v        [V,3] f32   vertex positions (padding rows = 0)
    f        [F,3] i32   vertex indices   (padding rows = 0)
    f_valid  [F]   bool  which faces are real
    vn       [V,3] f32   optional vertex normals ('vn' shading); zeros if unused
    albedo   [V]   f32   optional per-vertex albedo; ones if unused
    """

    v: jax.Array
    f: jax.Array
    f_valid: jax.Array
    vn: jax.Array
    albedo: jax.Array

    @property
    def num_vertices_padded(self) -> int:
        return self.v.shape[0]

    @property
    def num_faces_padded(self) -> int:
        return self.f.shape[0]


def make_mesh(
    v: np.ndarray,
    f: np.ndarray,
    vn: Optional[np.ndarray] = None,
    albedo: Optional[np.ndarray] = None,
    pad_v: Optional[int] = None,
    pad_f: Optional[int] = None,
    dtype=np.float32,
) -> Mesh:
    v = np.asarray(v, dtype=dtype)
    f = np.asarray(f, dtype=np.int32)
    V, F = v.shape[0], f.shape[0]
    pv = pad_v if pad_v is not None else V
    pf = pad_f if pad_f is not None else F
    assert pv >= V and pf >= F
    vpad = np.zeros((pv, 3), dtype)
    vpad[:V] = v
    fpad = np.zeros((pf, 3), np.int32)
    fpad[:F] = f
    valid = np.zeros((pf,), bool)
    valid[:F] = True
    if vn is None:
        vnp = np.zeros((pv, 3), dtype)
    else:
        vnp = np.zeros((pv, 3), dtype)
        vnp[:V] = vn
    if albedo is None:
        alb = np.ones((pv,), dtype)
    else:
        alb = np.ones((pv,), dtype)
        alb[:V] = albedo
    return Mesh(
        v=jnp.asarray(vpad),
        f=jnp.asarray(fpad),
        f_valid=jnp.asarray(valid),
        vn=jnp.asarray(vnp),
        albedo=jnp.asarray(alb),
    )


def bucket_size(n: int, growth: float = 1.3, base: int = 256) -> int:
    """Smallest padded size >= n from a geometric bucket ladder.

    Bounds the number of distinct compiled shapes across remeshes
    (the reference recompiles nothing because it is interpreted C++;
    we bound XLA recompilations instead)."""
    size = base
    while size < n:
        size = int(np.ceil(size * growth))
    return size


def pad_mesh(v: np.ndarray, f: np.ndarray, **kw) -> Mesh:
    return make_mesh(
        v, f, pad_v=bucket_size(v.shape[0]), pad_f=bucket_size(f.shape[0]), **kw
    )


def face_vertices(mesh: Mesh):
    """(v1, v2, v3) each [F,3]."""
    return (
        mesh.v[mesh.f[:, 0]],
        mesh.v[mesh.f[:, 1]],
        mesh.v[mesh.f[:, 2]],
    )


def face_normals_areas(v: jax.Array, f: jax.Array):
    """Unit face normals [F,3] and areas [F].

    n = cross(v2-v1, v3-v1); area = |n|/2; n /= 2*area
    (transient_and_gradient.cpp:157-159).  Degenerate faces get area 0 and a
    zero normal (guarded, no NaN)."""
    p1 = v[f[:, 0]]
    p2 = v[f[:, 1]]
    p3 = v[f[:, 2]]
    n = jnp.cross(p2 - p1, p3 - p1)
    double_area = jnp.linalg.norm(n, axis=-1)
    area = double_area / 2.0
    n = n / jnp.maximum(double_area, 1e-30)[:, None]
    return n, area


def vertex_normals(v: jax.Array, f: jax.Array, f_valid: jax.Array) -> jax.Array:
    """Area-weighted per-vertex normals (CGAL-equivalent,
    c_cgal_api.cpp:129-155), normalized to unit length."""
    n, area = face_normals_areas(v, f)
    w = jnp.where(f_valid, area, 0.0)[:, None] * n  # area-weighted face normals
    V = v.shape[0]
    idx = f.reshape(-1)
    acc = jax.ops.segment_sum(jnp.repeat(w, 3, axis=0), idx, num_segments=V)
    norm = jnp.linalg.norm(acc, axis=-1, keepdims=True)
    return acc / jnp.maximum(norm, 1e-30)


def total_area(v: jax.Array, f: jax.Array, f_valid: jax.Array) -> jax.Array:
    _, area = face_normals_areas(v, f)
    return jnp.sum(jnp.where(f_valid, area, 0.0))
