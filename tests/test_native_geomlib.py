"""C++ geomlib vs the pure-Python semantics twin."""

import numpy as np
import pytest

from nlos_surface_optimization_tpu.geometry import native
from nlos_surface_optimization_tpu.geometry.remesh import (
    isotropic_remesh,
    isotropic_remesh_py,
)
from nlos_surface_optimization_tpu.geometry.topology import face_affinity

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="geomlib not built")


@needs_native
def test_native_affinity_matches_python(bumpy_mesh):
    v, f = bumpy_mesh
    a = native.face_affinity_native(f)
    b = face_affinity(f)
    np.testing.assert_array_equal(np.sort(a, 1), np.sort(b, 1))


@needs_native
def test_native_remesh_invariants(bumpy_mesh):
    v, f = bumpy_mesh
    L0 = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1).mean()
    for target in (L0 / 2, L0 * 1.7):
        v2, f2 = native.isotropic_remesh_native(v, f, target)
        assert f2.min() >= 0 and f2.max() < v2.shape[0]
        n = np.cross(v2[f2[:, 1]] - v2[f2[:, 0]], v2[f2[:, 2]] - v2[f2[:, 0]])
        assert (np.linalg.norm(n, axis=1) > 1e-12).all()
        from collections import Counter
        c = Counter()
        for tri in f2:
            for s in range(3):
                a, b = tri[s], tri[(s + 1) % 3]
                c[(min(a, b), max(a, b))] += 1
        assert max(c.values()) <= 2
        e = np.concatenate([
            v2[f2[:, 0]] - v2[f2[:, 1]],
            v2[f2[:, 1]] - v2[f2[:, 2]],
            v2[f2[:, 2]] - v2[f2[:, 0]],
        ])
        mean_len = np.linalg.norm(e, axis=1).mean()
        assert 0.4 * target < mean_len < 2.5 * target


@needs_native
def test_native_remesh_close_to_python_counts(bumpy_mesh):
    """Same algorithm: face counts land within 20% of the Python twin."""
    v, f = bumpy_mesh
    L0 = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1).mean()
    vc, fc = native.isotropic_remesh_native(v, f, L0 / 2)
    vp, fp = isotropic_remesh_py(v, f, L0 / 2)
    assert abs(fc.shape[0] - fp.shape[0]) <= max(fc.shape[0],
                                                 fp.shape[0]) * 0.2


def test_dispatch_auto_works(bumpy_mesh):
    v, f = bumpy_mesh
    L0 = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1).mean()
    v2, f2 = isotropic_remesh(v, f, L0 / 1.5)
    assert f2.shape[0] > 0


def _icosphere(subdiv: int):
    """Closed, curved test surface (unit icosphere)."""
    t = (1 + 5 ** 0.5) / 2
    v = np.array(
        [[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
         [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
         [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    f = np.array(
        [[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
         [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
         [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
         [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]], int)
    for _ in range(subdiv):
        mid = {}
        nv = list(v)
        nf = []

        def gm(a, b):
            k = (min(a, b), max(a, b))
            if k not in mid:
                mid[k] = len(nv)
                nv.append((np.asarray(nv[a]) + np.asarray(nv[b])) / 2)
            return mid[k]

        for (a, b, c) in f:
            ab, bc, ca = gm(a, b), gm(b, c), gm(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v, f = np.array(nv, float), np.array(nf, int)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32), f.astype(np.int32)


@pytest.mark.parametrize("backend", ["native", "python"])
def test_remesh_coarsens_closed_curved_surface(backend):
    """Edge collapse must actually fire on a closed curved mesh.

    Regression: the batch-collapse CCD used to treat the dropped vertex
    landing on the kept vertex's incident faces at t=1 (a topological
    coincidence of every collapse) as a collision, so curved surfaces
    could refine but never coarsen.  The merged primitives are now
    excluded via a representative map (geomlib_integrate_ccd_rep)."""
    if backend == "native" and not native.available():
        pytest.skip("geomlib not built")
    v, f = _icosphere(4)  # 5120 faces, mean edge ~0.075
    e = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1).mean()
    v2, f2 = isotropic_remesh(v, f, e * 4, iterations=3, backend=backend)
    assert f2.shape[0] < 0.4 * f.shape[0], f2.shape

    # manifold output: no duplicate directed edge, <= 2 faces per edge
    from collections import Counter
    dirE = Counter()
    for tri in f2:
        for s in range(3):
            dirE[(int(tri[s]), int(tri[(s + 1) % 3]))] += 1
    assert max(dirE.values()) == 1
    undE = Counter()
    for (p, q) in dirE:
        undE[(min(p, q), max(p, q))] += 1
    assert max(undE.values()) <= 2

    # still a sphere-ish surface: radii near 1
    r = np.linalg.norm(v2, axis=1)
    assert 0.9 < r.min() and r.max() < 1.1
