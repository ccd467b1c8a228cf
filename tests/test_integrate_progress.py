"""Collision-aware integration, progress collection, z-distance metric."""

import numpy as np
import jax
import jax.numpy as jnp

from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.geometry.remesh import integrate_vertices
from nlos_surface_optimization_tpu.io.mat import save_checkpoint
from nlos_surface_optimization_tpu.io.progress import collect_progress
from nlos_surface_optimization_tpu.utils.metrics import average_z_distance


def test_integrate_stops_at_collision():
    v = np.array([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],
        [0.2, 0.2, 0.5], [1.2, 0.2, 0.5], [0.2, 1.2, 0.5],
    ], np.float64)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    new_v = v.copy()
    new_v[3] = [0.2, 0.2, -0.5]  # would punch through the base triangle
    out = integrate_vertices(v, f, new_v)
    assert out[3, 2] > 0.0
    np.testing.assert_allclose(out[3, 2], 0.05, atol=1e-9)  # 0.9*t_first
    # non-colliding move passes through unchanged
    new_v2 = v.copy()
    new_v2[4] = [1.3, 0.2, 0.6]
    out2 = integrate_vertices(v, f, new_v2)
    np.testing.assert_allclose(out2[4], [1.3, 0.2, 0.6])


def test_collect_progress(tmp_path):
    for t in range(3):
        save_checkpoint(
            str(tmp_path / f"{t:05d}.mat"), v=np.random.rand(4 + t, 3),
            f=np.array([[0, 1, 2]]), iteration=t,
            rng_key=np.zeros(2, np.uint32),
            extra={"l2": 1.0 / (t + 1), "l2_original": 2.0 / (t + 1)},
        )
    out = collect_progress(str(tmp_path))
    np.testing.assert_array_equal(out["iteration"], [0, 1, 2])
    np.testing.assert_allclose(out["l2"], [1.0, 0.5, 1 / 3])
    np.testing.assert_array_equal(out["num_vertices"], [4, 5, 6])
    assert out["final_v"].shape == (6, 3)


def test_average_z_distance(plane_mesh):
    v, f = plane_mesh
    gt = make_mesh(v, f, dtype=np.float64)
    pts = np.array([[0.0, 0.0, 0.52], [0.1, -0.1, 0.47]], np.float64)
    d = float(average_z_distance(jnp.asarray(pts), gt))
    np.testing.assert_allclose(d, (0.02 + 0.03) / 2, atol=1e-9)
    # a point whose column misses the plane is excluded
    pts2 = np.array([[0.0, 0.0, 0.52], [5.0, 5.0, 0.1]], np.float64)
    d2 = float(average_z_distance(jnp.asarray(pts2), gt))
    np.testing.assert_allclose(d2, 0.02, atol=1e-9)


def test_integrate_edge_edge_ccd():
    """Two meshes whose EDGES sweep through each other without any vertex
    crossing a face: only edge-edge CCD (native geomlib) catches this; the
    vertex-path fallback would sail through."""
    import pytest

    from nlos_surface_optimization_tpu.geometry import native

    if not native.available():
        pytest.skip("geomlib not built")
    v = np.array([
        [-1.0, 0.0, 1.0], [1.0, 0.0, 1.0], [0.5, 0.3, 1.0],   # moving tri
        [0.0, -1.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, -3.0],  # static tri
    ], np.float64)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    new_v = v.copy()
    new_v[:3, 2] = -1.0  # edge (0,1) sweeps across static edge (3,4) at t=0.5
    out = integrate_vertices(v, f, new_v)
    # moving vertices stopped at 0.9 * t_contact: z = 1 - 2*0.45 = 0.1
    np.testing.assert_allclose(out[:3, 2], 0.1, atol=1e-6)
    np.testing.assert_allclose(out[3:], v[3:], atol=0)  # static side untouched


def test_integrate_ccd_vertex_face_both_moving():
    """Vertex and face both move toward each other; contact time comes from
    the relative motion cubic."""
    import pytest

    from nlos_surface_optimization_tpu.geometry import native

    if not native.available():
        pytest.skip("geomlib not built")
    v = np.array([
        [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
        [0.2, 0.2, 1.0], [1.2, 0.2, 1.0], [0.2, 1.2, 1.0],
    ], np.float64)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    new_v = v.copy()
    new_v[3] = [0.2, 0.2, -1.0]   # down 2
    new_v[:3, 2] = 1.0            # base plane up 1 -> relative speed 3
    out = integrate_vertices(v, f, new_v)
    # contact at t=1/3; every involved vertex scaled to 0.9/3 = 0.3
    np.testing.assert_allclose(out[3, 2], 1.0 - 2 * 0.3, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], 0.3, atol=1e-6)
