"""Delaunay re-triangulation, grid resampling, upsampling."""

import numpy as np

from nlos_surface_optimization_tpu.geometry.delaunay import (
    grid_resample,
    recompute_connectivity,
    upsample,
)
from nlos_surface_optimization_tpu.geometry.topology import border_vertices


def test_recompute_connectivity_covers_field(bumpy_mesh):
    v, f = bumpy_mesh
    v2, f2 = recompute_connectivity(v, f)
    assert v2.shape == v.shape
    # similar face count, all referencing valid vertices, wall-facing
    assert abs(f2.shape[0] - f.shape[0]) <= f.shape[0] // 2
    n = np.cross(v2[f2[:, 1]] - v2[f2[:, 0]], v2[f2[:, 2]] - v2[f2[:, 0]])
    assert (n[:, 2] < 0).mean() > 0.9  # wound toward the wall (-z)


def test_grid_resample(bumpy_mesh):
    v, f = bumpy_mesh
    border = border_vertices(f, v.shape[0])
    v2, f2 = grid_resample(v, f, res=9, border_v=border,
                           lower=(-0.2, -0.2), upper=(0.2, 0.2))
    assert f2.shape[0] > 0
    # resampled z values live on the original surface's z range
    assert v2[:, 2].min() >= v[:, 2].min() - 1e-3
    assert v2[:, 2].max() <= v[:, 2].max() + 1e-3


def test_upsample_counts(bumpy_mesh):
    v, f = bumpy_mesh
    E = 3 * f.shape[0]  # directed; undirected interior shared
    v2, f2 = upsample(v, f)
    assert f2.shape[0] == 4 * f.shape[0]
    # new vertex per undirected edge
    und = set()
    for tri in f:
        for s in range(3):
            a, b = tri[s], tri[(s + 1) % 3]
            und.add((min(a, b), max(a, b)))
    assert v2.shape[0] == v.shape[0] + len(und)
    # original vertices unchanged
    np.testing.assert_allclose(v2[: v.shape[0]], v, rtol=1e-6)
