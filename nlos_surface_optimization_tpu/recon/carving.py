"""Space carving from first-photon arrival times.

JAX port of the reference's compute_space_carving_mesh.m (:1-46): for every
scan point, any voxel whose round-trip distance 2*d1 is shorter than
(first-photon distance - 10 bins) cannot be occupied; the carve region is
the intersection over all scan points.  The reference runs MarchingCubes on
the occupancy and ray-casts against the resulting mesh for the projection
constraint (rendering.py:193-206).  Here the carve boundary facing the wall
is extracted directly as a height field z_surf(x, y) = min occupied z per
column — exactly the surface the +z projection rays hit — and triangulated;
`space_carving_projection` then matches rendering.py:193-206 via our
nearest-hit query (geometry/intersect.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.intersect import nearest_hit
from ..geometry.mesh import Mesh


class CarveGrid(NamedTuple):
    occupancy: jnp.ndarray  # [Z,Y,X] bool — True = possibly occupied
    xs: jnp.ndarray         # [X]
    ys: jnp.ndarray         # [Y]
    zs: jnp.ndarray         # [Z]


@partial(jax.jit, static_argnames=())
def _carve(first_distance, lighting, gx, gy, gz, threshold):
    """occupancy[z,y,x] = all_i (2*d1 > first_distance_i - threshold)."""
    def body(occ, args):
        fd, light = args
        d1 = jnp.sqrt(
            (gx - light[0]) ** 2 + (gy - light[1]) ** 2 + (gz - light[2]) ** 2
        )
        return occ & (2.0 * d1 > fd - threshold), None

    occ0 = jnp.ones(gx.shape, bool)
    occ, _ = jax.lax.scan(body, occ0, (first_distance, lighting))
    return occ


def first_photon_distance(transient, bin_width: float) -> jnp.ndarray:
    """Path length of the first nonzero bin per scan point
    (compute_space_carving_mesh.m:18-20; 1-based bin index * bin_width)."""
    t = jnp.asarray(transient)
    nz = t != 0
    idx = jnp.argmax(nz, axis=1) + 1  # MATLAB find(...,1) is 1-based
    has = jnp.any(nz, axis=1)
    return jnp.where(has, idx * bin_width, jnp.inf)


def space_carve_occupancy(transient, lighting, bin_width: float,
                          lateral: Tuple[float, float] = (-0.3, 0.3),
                          interval_x: float = 0.5 / 64,
                          z_max: Optional[float] = None,
                          threshold_bins: int = 10) -> CarveGrid:
    """Carve the voxel grid (compute_space_carving_mesh.m:10-27)."""
    transient = jnp.asarray(transient)
    lighting = jnp.asarray(lighting)
    threshold = threshold_bins * bin_width
    if z_max is None:
        z_max = bin_width * transient.shape[1] / 2.0
    xs = jnp.arange(lateral[0], lateral[1] + interval_x / 2, interval_x)
    ys = xs
    zs = jnp.arange(0.0, z_max + threshold / 4, threshold / 2.0)
    gy, gx, gz = jnp.meshgrid(ys, xs, zs, indexing="ij")
    # layout [Y,X,Z] mirrors MATLAB meshgrid(X,Y,Z) semantics closely
    # enough; we expose axes explicitly via CarveGrid
    fd = first_photon_distance(transient, bin_width)
    occ = _carve(fd, lighting, gx, gy, gz, threshold)
    return CarveGrid(occupancy=jnp.transpose(occ, (2, 0, 1)), xs=xs, ys=ys,
                     zs=zs)


def carve_mesh(grid: CarveGrid) -> Tuple[np.ndarray, np.ndarray]:
    """Triangulated wall-facing boundary surface of the carve region:
    z_surf(y, x) = lowest occupied z per column (the surface MarchingCubes
    would place the +z projection rays onto)."""
    occ = np.asarray(grid.occupancy)        # [Z,Y,X]
    zs = np.asarray(grid.zs)
    Z, Y, X = occ.shape
    any_occ = occ.any(axis=0)
    first = np.argmax(occ, axis=0)          # lowest occupied z index
    zsurf = np.where(any_occ, zs[first], zs[-1])
    gx, gy = np.meshgrid(np.asarray(grid.xs), np.asarray(grid.ys))
    v = np.stack([gx.ravel(), gy.ravel(), zsurf.ravel()], 1).astype(np.float32)
    faces = []
    for i in range(Y - 1):
        for j in range(X - 1):
            a = i * X + j
            faces.append([a, a + X, a + 1])
            faces.append([a + X, a + X + 1, a + 1])
    return v, np.asarray(faces, np.int32)


def space_carving_projection(v, carve: Mesh) -> jnp.ndarray:
    """z := max(z, carve-surface z) per vertex (rendering.py:193-206):
    cast +z rays from (x, y, 0); vertices whose ray hits the carve mesh are
    clamped to at least the hit depth."""
    v = jnp.asarray(v)
    o = v.at[:, 2].set(0.0)
    d = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], v.dtype), (v.shape[0], 1))
    fid, bu, bv, t = nearest_hit(o, d, carve.v, carve.f, carve.f_valid)
    hit = fid >= 0
    newz = jnp.where(hit, jnp.maximum(t, v[:, 2]), v[:, 2])
    return v.at[:, 2].set(newz)
