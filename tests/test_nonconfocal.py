"""Non-confocal angular-sampling renderer: oracle parity + differentiability
(prototype generation, transient_rendering_python/rendering_grad.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.render.nonconfocal import (
    angular_transient,
    hemisphere_directions,
    render_nonconfocal,
)

KEY = jax.random.key(41)


def _oracle(v, f, dirs, light, sensor, res, B):
    """Loop re-derivation of rendering_grad.py:16-126."""
    out = np.zeros(B)
    for d in dirs:
        best_t, best_i = np.inf, -1
        for i, tri in enumerate(f):
            p1, p2, p3 = v[tri[0]], v[tri[1]], v[tri[2]]
            e1, e2 = p2 - p1, p3 - p1
            pvec = np.cross(d, e2)
            det = e1 @ pvec
            if abs(det) < 1e-14:
                continue
            tvec = light - p1
            u = (tvec @ pvec) / det
            qvec = np.cross(tvec, e1)
            w = (d @ qvec) / det
            t = (e2 @ qvec) / det
            if u >= 0 and w >= 0 and u + w <= 1 and t > 1e-6 and t < best_t:
                best_t, best_i = t, i
        if best_i < 0:
            continue
        p = light + d * best_t
        d1 = best_t
        v2 = sensor - p
        d2 = np.linalg.norm(v2)
        v2u = v2 / d2
        # shadow ray occlusion by OTHER faces
        occluded = False
        for i, tri in enumerate(f):
            if i == best_i:
                continue
            p1, p2, p3 = v[tri[0]], v[tri[1]], v[tri[2]]
            e1, e2 = p2 - p1, p3 - p1
            pvec = np.cross(-v2u, e2)
            det = e1 @ pvec
            if abs(det) < 1e-14:
                continue
            tvec = sensor - p1
            u = (tvec @ pvec) / det
            qvec = np.cross(tvec, e1)
            w = (-v2u @ qvec) / det
            t = (e2 @ qvec) / det
            if u >= 0 and w >= 0 and u + w <= 1 and 1e-6 < t < d2 * (1 - 1e-4):
                occluded = True
                break
        if occluded:
            continue
        tri = f[best_i]
        fn = np.cross(v[tri[1]] - v[tri[0]], v[tri[2]] - v[tri[0]])
        fn = fn / np.linalg.norm(fn)
        cos2 = max(fn @ v2u, 0.0)
        b = int(np.ceil((d1 + d2) / res)) - 1
        if 0 <= b < B:
            out[b] += cos2 / d2**2
    return out * 2 * np.pi / len(dirs)


def test_angular_matches_oracle(bumpy_mesh):
    v, f = bumpy_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_bins=400, distance_resolution=5e-3)
    light = np.array([0.05, 0.0, 0.0], np.float64)
    sensor = np.array([-0.05, 0.02, 0.0], np.float64)
    dirs = np.array(hemisphere_directions(
        KEY, 400, jnp.asarray([0.0, 0.0, 1.0], jnp.float64)))
    t = angular_transient(mesh, jnp.asarray(dirs), jnp.asarray(light),
                          jnp.asarray(sensor),
                          jnp.asarray([0.0, 0.0, 1.0]), cfg)
    t_ref = _oracle(v.astype(np.float64), f, dirs, light, sensor,
                    cfg.distance_resolution, cfg.num_bins)
    assert t_ref.sum() > 0
    np.testing.assert_allclose(np.array(t), t_ref, rtol=1e-6, atol=1e-10)


def test_nonconfocal_batch_and_grad(bumpy_mesh):
    v, f = bumpy_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=300, num_bins=300,
                           distance_resolution=6e-3)
    L = 4
    lighting = np.array([[0.1 * i - 0.15, 0.0, 0.0] for i in range(L)],
                        np.float64)
    sensors = lighting + np.array([0.02, 0.01, 0.0])
    nrm = np.tile([0.0, 0.0, 1.0], (L, 1))
    t = render_nonconfocal(mesh, lighting, sensors, nrm, nrm, cfg, KEY)
    assert t.shape == (L, cfg.num_bins)
    assert float(jnp.sum(t)) > 0

    def loss(vv):
        m = mesh._replace(v=vv)
        tt = render_nonconfocal(m, lighting, sensors, nrm, nrm, cfg, KEY)
        return jnp.sum(tt ** 2)

    g = jax.grad(loss)(mesh.v)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_hemisphere_directions_distribution():
    n = jnp.asarray([0.0, 0.0, 1.0])
    d = np.array(hemisphere_directions(KEY, 5000, n))
    assert (d[:, 2] >= -1e-6).all()                 # upper hemisphere
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-6)
    # cos(theta) ~ U[0,1] for this sampler
    assert abs(d[:, 2].mean() - 0.5) < 0.03
    # tilted normal
    nt = jnp.asarray([1.0, 0.0, 0.0])
    d2 = np.array(hemisphere_directions(KEY, 2000, nt))
    assert (d2 @ np.array([1.0, 0, 0]) >= -1e-6).all()
