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
