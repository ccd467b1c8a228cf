"""Delaunay-based height-field re-triangulation + midpoint upsampling.

Reference: exp_bunny/rendering.py —
  recompute_connectivity (:103-136): re-triangulate the vertices' xy by
    Delaunay, flip winding to face the wall, keep only triangles whose
    centroid's +z ray from the wall actually hits the current mesh
    (validates against overhangs/concavities the 2-D triangulation fakes).
  remesh (:138-179): resample the surface on a regular res x res grid of
    +z rays, append the border vertices, Delaunay the xy, validate the
    same way.
  upsample (:95-100): igl.upsample — 1-to-4 midpoint subdivision.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np
from scipy.spatial import Delaunay

from .intersect import nearest_hit
from .mesh import Mesh, make_mesh


def _validate_faces(new_v: np.ndarray, new_f: np.ndarray, mesh: Mesh
                    ) -> np.ndarray:
    """Keep faces whose xy-centroid's upward ray hits the current mesh
    (rendering.py:106-136 / :166-178)."""
    c = (new_v[new_f[:, 0]] + new_v[new_f[:, 1]] + new_v[new_f[:, 2]]) / 3.0
    o = np.array(c, np.float32)
    o[:, 2] = 0.0
    d = np.tile(np.array([0, 0, 1], np.float32), (o.shape[0], 1))
    fid, _, _, _ = nearest_hit(jnp.asarray(o), jnp.asarray(d), mesh.v,
                               mesh.f, mesh.f_valid)
    return np.asarray(fid) >= 0


def recompute_connectivity(v: np.ndarray, f: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """Delaunay xy re-triangulation of the existing vertices, validated by
    downward ray casts (rendering.py:103-136)."""
    tri = Delaunay(v[:, :2])
    new_f = np.asarray(tri.simplices[:, [0, 2, 1]], np.int32)  # flip winding
    mesh = make_mesh(v, f)
    keep = _validate_faces(v, new_f, mesh)
    return v, new_f[keep]


def grid_resample(v: np.ndarray, f: np.ndarray, res: int,
                  border_v: np.ndarray,
                  lower=(-0.25, -0.25), upper=(0.25, 0.25)
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Resample the surface on a res x res grid of +z rays, append border
    vertices, re-Delaunay, validate (rendering.py:138-179 'remesh')."""
    xs = np.linspace(lower[0], upper[0], res)
    ys = np.linspace(lower[1], upper[1], res)
    gx, gy = np.meshgrid(xs, ys)
    o = np.stack([gx.ravel(), gy.ravel(), np.zeros(res * res)], 1
                 ).astype(np.float32)
    d = np.tile(np.array([0, 0, 1], np.float32), (o.shape[0], 1))
    mesh = make_mesh(v, f)
    fid, bu, bv, t = nearest_hit(jnp.asarray(o), jnp.asarray(d), mesh.v,
                                 mesh.f, mesh.f_valid)
    fid = np.asarray(fid)
    hit = fid >= 0
    p = o.copy()
    p[:, 2] = np.asarray(t)
    pts = p[hit]

    new_v = np.vstack([pts, v[border_v == 1]]).astype(np.float32)
    tri = Delaunay(new_v[:, :2])
    new_f = np.asarray(tri.simplices[:, [0, 2, 1]], np.int32)
    keep = _validate_faces(new_v, new_f, mesh)
    return new_v, new_f[keep]


def upsample(v: np.ndarray, f: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray]:
    """1-to-4 midpoint subdivision (igl.upsample semantics,
    rendering.py:95-100): every edge gets a midpoint vertex; each triangle
    becomes 4."""
    v = np.asarray(v, np.float64)
    f = np.asarray(f, np.int64)
    edge_id = {}
    verts = [v[i] for i in range(v.shape[0])]

    def mid(a: int, b: int) -> int:
        key = (min(a, b), max(a, b))
        if key not in edge_id:
            edge_id[key] = len(verts)
            verts.append((v[a] + v[b]) / 2.0)
        return edge_id[key]

    out = []
    for a, b, c in f:
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        out.extend([[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]])
    return (np.asarray(verts, np.float32),
            np.asarray(out, np.int32).reshape(-1, 3))
