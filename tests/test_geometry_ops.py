"""Regularizers + topology: exactness and oracle checks.

- curvature_gradient must equal jax.grad(total_area) exactly (same formula).
- normal_smoothing checked against an independent per-face NumPy loop.
- topology ops checked on meshes with known structure.
"""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.geometry.topology import (
    border_vertices,
    face_affinity,
    keep_largest_component,
    remove_triangles,
)
from nlos_surface_optimization_tpu.render.regularizers import (
    curvature_gradient,
    normal_smoothing,
    total_area,
)
from nlos_surface_optimization_tpu.optim.loss import (
    create_weighting_function,
    evaluate_loss_with_normal_smoothness,
)


def test_curvature_gradient_is_area_gradient(bumpy_mesh):
    v, f = bumpy_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    g = curvature_gradient(mesh.v, mesh.f, mesh.f_valid)
    g_auto = jax.grad(lambda vv: total_area(vv, mesh.f, mesh.f_valid))(mesh.v)
    np.testing.assert_allclose(np.array(g), np.array(g_auto), rtol=1e-10,
                               atol=1e-12)


def test_normal_smoothing_zero_on_plane(plane_mesh):
    v, f = plane_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    aff = jnp.asarray(face_affinity(f))
    val, g = normal_smoothing(mesh.v, mesh.f, mesh.f_valid, aff)
    assert float(val) < 1e-12
    np.testing.assert_allclose(np.array(g), 0.0, atol=1e-12)


def _normal_smoothing_oracle(v, f, aff):
    """Independent loop re-derivation of streamedTriangleNormalSmoothing
    (stratifiedStreamedGradientRenderer.cpp:78-126) with += scatter."""
    F = f.shape[0]
    n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    dbl = np.linalg.norm(n, axis=1)
    area = dbl / 2
    n = n / dbl[:, None]
    val = 0.0
    grad = np.zeros_like(v)
    for i in range(F):
        acc = n[i] * area[i]
        for k in range(3):
            j = aff[i, k]
            if j >= 0:
                acc = acc + n[j] * area[j]
        m = acc / np.linalg.norm(acc)
        val += area[i] * (1 - np.dot(m, n[i]))
        resid = n[i] - m
        vs = v[f[i]]
        for k, (a, b) in enumerate([(2, 1), (0, 2), (1, 0)]):
            e = vs[a] - vs[b]
            grad[f[i, k]] += np.cross(resid, e / 2)
    return val, grad


def test_normal_smoothing_matches_oracle(bumpy_mesh):
    v, f = bumpy_mesh
    v = v.astype(np.float64)
    mesh = make_mesh(v, f, dtype=np.float64)
    aff = face_affinity(f)
    val, g = normal_smoothing(mesh.v, mesh.f, mesh.f_valid, jnp.asarray(aff))
    val_ref, g_ref = _normal_smoothing_oracle(v, f, aff)
    np.testing.assert_allclose(float(val), val_ref, rtol=1e-12)
    np.testing.assert_allclose(np.array(g), g_ref, rtol=1e-9, atol=1e-14)


def test_normal_smoothing_descends(bumpy_mesh):
    """Stepping against the gradient reduces the smoothing value."""
    v, f = bumpy_mesh
    mesh = make_mesh(v.astype(np.float64), f, dtype=np.float64)
    aff = jnp.asarray(face_affinity(f))
    val0, g = normal_smoothing(mesh.v, mesh.f, mesh.f_valid, aff)
    v1 = mesh.v - 1e-3 * g / jnp.max(jnp.abs(g))
    val1, _ = normal_smoothing(v1, mesh.f, mesh.f_valid, aff)
    assert float(val1) < float(val0)


def test_face_affinity_plane(plane_mesh):
    v, f = plane_mesh
    aff = face_affinity(f)
    # two triangles share exactly one edge: each lists the other exactly once
    assert (aff[0] == 1).sum() == 1
    assert (aff[1] == 0).sum() == 1
    assert (aff == -1).sum() == 4


def test_border_vertices_grid(bumpy_mesh):
    v, f = bumpy_mesh
    ind = border_vertices(f, v.shape[0])
    n = int(np.sqrt(v.shape[0]))
    grid = ind.reshape(n, n)
    assert (grid[0] == 1).all() and (grid[-1] == 1).all()
    assert (grid[:, 0] == 1).all() and (grid[:, -1] == 1).all()
    assert (grid[1:-1, 1:-1] == 0).all()


def test_keep_largest_component():
    # two disjoint patches: a 2-face quad and a single far triangle
    v = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],   # quad
        [5, 5, 0], [6, 5, 0], [5, 6, 0],              # lone triangle
    ], np.float32)
    f = np.array([[0, 1, 2], [2, 1, 3], [4, 5, 6]], np.int32)
    v2, f2 = keep_largest_component(v, f)
    assert f2.shape[0] == 2 and v2.shape[0] == 4
    # faces reference valid remapped vertices
    assert f2.max() < v2.shape[0]


def test_remove_triangles_rule():
    aff = np.array([[1, 2, 3], [0, -1, -1], [0, -1, -1], [0, -1, -1]])
    inten = np.array([0.0, 0.0, 1.0, 0.5])
    keep = remove_triangles(None, aff, inten)
    # face 0: zero intensity but interior (all neighbors) -> kept
    # face 1: zero intensity, has border -> culled; 2,3 intensity>0 -> kept
    np.testing.assert_array_equal(keep, [True, False, True, True])


def test_convex_hull_2d():
    from nlos_surface_optimization_tpu.geometry.topology import convex_hull_2d
    rng = np.random.RandomState(0)
    pts = rng.randn(200, 2)
    # plant known extremes
    pts = np.vstack([pts, [[10, 0], [-10, 0], [0, 10], [0, -10]]])
    hull = convex_hull_2d(pts)
    assert {200, 201, 202, 203} <= set(hull.tolist())
    # all points inside or on the hull polygon (cross-product test)
    hp = pts[hull]
    for i in range(len(hull)):
        a, b = hp[i], hp[(i + 1) % len(hull)]
        e = b - a
        rel = pts - a
        s = e[0] * rel[:, 1] - e[1] * rel[:, 0]
        assert (s >= -1e-9).all()


def test_weighting_function_normalization():
    rng = np.random.RandomState(0)
    data = rng.rand(6, 40)
    w = np.array(create_weighting_function(data, gamma=2.0))
    assert w.shape == data.shape
    np.testing.assert_allclose(w.sum(), data.size, rtol=1e-6)
    # monotone in data
    i, j = np.unravel_index(np.argmax(data), data.shape)
    assert w[i, j] == w.max()


def test_evaluate_loss_with_normal_smoothness():
    rng = np.random.RandomState(1)
    gt = rng.rand(5, 30)
    t = gt + 0.1
    w = np.ones_like(gt)
    total, l1 = evaluate_loss_with_normal_smoothness(gt, w, t, 2.0, 0.5)
    np.testing.assert_allclose(float(l1), np.sum(0.01 * np.ones_like(gt)) / 5,
                               rtol=1e-6)
    np.testing.assert_allclose(float(total), float(l1) + 1.0, rtol=1e-6)
