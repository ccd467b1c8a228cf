"""Morton face ordering (geometry/accel.py): the spatial-compaction
property the Pallas kernels' broad phases rely on."""

import numpy as np

from nlos_surface_optimization_tpu.geometry.accel import morton_order_faces


def _layered_mesh():
    """Height field PLUS a floating occluder patch above part of it."""
    n = 10
    xs = np.linspace(-0.25, 0.25, n)
    gx, gy = np.meshgrid(xs, xs)
    z = 0.5 + 0.05 * np.sin(5 * gx) * np.cos(4 * gy)
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + n, a + n + 1, a + 1])
    # occluder: small quad at z=0.3 over the +x,+y quadrant
    base = v.shape[0]
    occ_v = np.array([
        [0.05, 0.05, 0.3], [0.2, 0.05, 0.3], [0.05, 0.2, 0.3],
        [0.2, 0.2, 0.3],
    ], np.float32)
    v = np.vstack([v, occ_v])
    faces += [[base, base + 2, base + 1], [base + 2, base + 3, base + 1]]
    return v, np.array(faces, np.int32)


def test_morton_order_is_permutation_and_compact():
    v, f = _layered_mesh()
    fm = morton_order_faces(v, f)
    # permutation of the same face set
    assert sorted(map(tuple, fm.tolist())) == sorted(map(tuple, f.tolist()))
    # tiles of consecutive faces are spatially tighter than raster order
    def tile_extent(ff, k=16):
        cent = (v[ff[:, 0]] + v[ff[:, 1]] + v[ff[:, 2]]) / 3.0
        n = (len(ff) // k) * k
        c = cent[:n].reshape(-1, k, 3)
        return (c.max(axis=1) - c.min(axis=1)).sum(axis=1).mean()
    assert tile_extent(fm) <= tile_extent(f) * 1.05
