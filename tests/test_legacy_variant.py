"""Legacy-variant (N4/P4) parity: box-filter loss smoothing and the
height-field smoothness gradients of the v1 pipeline
(stratified_transient_raytracer/stratifiedStreamedGradientRenderer.cpp:
447-462, exp_bunny/rendering.py:320-356)."""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.optim.loss import (
    smooth_grad,
    smooth_grad_first_order,
)
from nlos_surface_optimization_tpu.render.api import (
    _difference,
    inverse_render,
    inverse_shading_render,
)
from nlos_surface_optimization_tpu.render.kernels import box_smooth_difference

KEY = jax.random.key(3)


def _oracle_box_smooth(diff, width):
    """Independent re-derivation of the reference's double full-convolution
    with window offsets (convolve into numBins+2w, keep [w : w+numBins])."""
    k = np.full(2 * width + 1, 1.0 / (2 * width + 1))
    out = np.empty_like(diff)
    for i, row in enumerate(diff):
        y = np.convolve(k, row, mode="full")           # numBins + 2w
        y2 = np.convolve(k, y[width:width + row.shape[0]], mode="full")
        out[i] = y2[width:width + row.shape[0]]
    return out


def test_box_smooth_matches_reference_alignment():
    rng = np.random.RandomState(0)
    diff = rng.randn(5, 64)
    for width in (1, 3, 7):
        got = np.array(box_smooth_difference(jnp.asarray(diff), width))
        np.testing.assert_allclose(got, _oracle_box_smooth(diff, width),
                                   rtol=1e-12, atol=1e-14)
    # width 0 is the identity (smoothing disabled)
    np.testing.assert_array_equal(
        np.array(box_smooth_difference(jnp.asarray(diff), 0)), diff
    )


def test_difference_applies_box_smoothing():
    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.rand(4, 32))
    tr = jnp.asarray(rng.rand(4, 32))
    w = jnp.asarray(rng.rand(4, 32))
    cfg = nst.RenderConfig(loss_smooth_width=2)
    got = np.array(_difference(data, tr, w, cfg))
    want = _oracle_box_smooth(np.array(data - tr), 2) * np.array(w)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def _grid_mesh(n=6):
    xs = np.linspace(-0.2, 0.2, n)
    gx, gy = np.meshgrid(xs, xs)
    rng = np.random.RandomState(5)
    z = 0.5 + 0.03 * rng.randn(n, n)
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + n, a + n + 1, a + 1])
    return v, np.array(faces, np.int32), (n, n)


def test_smooth_grad_is_gradient_of_second_difference_energy():
    v, _, shape = _grid_mesh()

    def energy(vz):
        s = vz.reshape(shape)
        dx = 2 * s[:, 1:-1] - s[:, :-2] - s[:, 2:]
        dy = 2 * s[1:-1, :] - s[:-2, :] - s[2:, :]
        return 0.5 * (jnp.sum(dx * dx) + jnp.sum(dy * dy))

    g = smooth_grad(jnp.asarray(v), shape)
    g_auto = jax.grad(energy)(jnp.asarray(v[:, 2]))
    np.testing.assert_allclose(np.array(g[:, 2]), np.array(g_auto),
                               rtol=1e-10, atol=1e-12)
    assert np.all(np.array(g[:, :2]) == 0)


def test_smooth_grad_first_order_is_gradient():
    v, _, shape = _grid_mesh()

    def energy(vz):
        s = vz.reshape(shape)
        dx = s[:, 1:] - s[:, :-1]
        dy = s[1:, :] - s[:-1, :]
        return 0.5 * (jnp.sum(dx * dx) + jnp.sum(dy * dy))

    g = smooth_grad_first_order(jnp.asarray(v), shape)
    g_auto = jax.grad(energy)(jnp.asarray(v[:, 2]))
    np.testing.assert_allclose(np.array(g[:, 2]), np.array(g_auto),
                               rtol=1e-10, atol=1e-12)


def test_inverse_shading_render_matches_vn_inverse_render():
    v, f, _ = _grid_mesh()
    from nlos_surface_optimization_tpu.geometry.mesh import vertex_normals

    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=400, num_bins=400,
                           distance_resolution=5e-3, testing_flag=0)
    lighting, lnormal = nst.make_confocal_scan(4)
    lighting = lighting.astype(np.float64)
    lnormal = lnormal.astype(np.float64)
    data = jnp.zeros((lighting.shape[0], cfg.num_bins), jnp.float64)
    w = jnp.ones_like(data)

    t1, g1, _ = inverse_shading_render(mesh, data, w, lighting, lnormal,
                                       cfg, KEY)
    vn = vertex_normals(mesh.v, mesh.f, mesh.f_valid)
    t2, g2, _ = inverse_render(mesh._replace(vn=vn), data, w, lighting,
                               lnormal, cfg.replace(normal="vn"), KEY)
    np.testing.assert_allclose(np.array(t1), np.array(t2), rtol=1e-12)
    np.testing.assert_allclose(np.array(g1), np.array(g2), rtol=1e-12)
    assert np.abs(np.array(g1)).sum() > 0


def test_legacy_box_loss_descends():
    """v1 pipeline end-to-end: refine=1 forward + box-smoothed difference
    drives the loss down on the plane scene (main.py:50-129 semantics)."""
    v, f, _ = _grid_mesh()
    gt_v = v.copy()
    cfg = nst.RenderConfig(num_samples=1200, num_bins=400,
                           distance_resolution=5e-3, sigma_bin=1,
                           bin_refine_resolution=1, loss_smooth_width=2)
    lighting, lnormal = nst.make_confocal_scan(4)
    lighting = lighting.astype(np.float64)
    lnormal = lnormal.astype(np.float64)
    gt_mesh = make_mesh(gt_v, f, dtype=np.float64)
    from nlos_surface_optimization_tpu.render import render_transient

    data, _ = render_transient(gt_mesh, lighting, lnormal, cfg,
                               jax.random.key(99))
    w = jnp.ones_like(data)

    v0 = v.copy()
    v0[:, 2] += 0.01
    mesh = make_mesh(v0, f, dtype=np.float64)

    def l2(m, k):
        t, _ = render_transient(m, lighting, lnormal, cfg, k)
        return float(jnp.sum((t - data) ** 2))

    loss0 = l2(mesh, KEY)
    vv = jnp.asarray(v0)
    for i in range(15):
        _, g, _ = inverse_render(mesh, data, w, lighting, lnormal, cfg,
                                 jax.random.fold_in(KEY, i))
        vv = vv - 0.05 * g
        mesh = mesh._replace(v=vv)
    loss1 = l2(mesh, jax.random.fold_in(KEY, 100))
    assert loss1 < 0.7 * loss0, (loss0, loss1)
