"""Scalar material estimation: albedo projection/descent and GGX alpha
recovery against self-rendered GT (exp_ggx/optimize_parameters.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.optim.material import (
    initial_fitting_albedo,
    optimize_albedo,
    optimize_alpha,
)
from nlos_surface_optimization_tpu.render import render_transient

KEY = jax.random.key(31)


def _scene(bumpy_mesh, brdf="lambertian"):
    v, f = bumpy_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=800, num_bins=400,
                           distance_resolution=5e-3, brdf=brdf)
    lighting, lnormal = nst.make_confocal_scan(5)
    return mesh, cfg, lighting.astype(np.float64), lnormal.astype(np.float64)


def test_initial_fitting_albedo_recovers_scale(bumpy_mesh):
    mesh, cfg, lighting, lnormal = _scene(bumpy_mesh)
    true_albedo = 0.37
    gt, _ = render_transient(
        mesh._replace(albedo=jnp.full_like(mesh.albedo, true_albedo)),
        lighting, lnormal, cfg, KEY, refine=1)
    a0 = initial_fitting_albedo(mesh, np.asarray(gt), lighting, lnormal,
                                cfg, KEY)
    np.testing.assert_allclose(a0, true_albedo, rtol=1e-6)


def test_optimize_albedo_descends(bumpy_mesh):
    mesh, cfg, lighting, lnormal = _scene(bumpy_mesh)
    true_albedo = 0.6
    gt, _ = render_transient(
        mesh._replace(albedo=jnp.full_like(mesh.albedo, true_albedo)),
        lighting, lnormal, cfg, KEY, refine=1)
    gt = np.asarray(gt)
    w = np.ones_like(gt)
    a, losses = optimize_albedo(mesh, gt, w, lighting, lnormal, cfg, KEY,
                                albedo0=0.2, lr=5e-2, T=30,
                                loss_epsilon=1e-7, log=lambda s: None)
    assert abs(a - true_albedo) < 0.1, a
    assert losses[-1] < losses[0]


def test_optimize_alpha_descends(bumpy_mesh):
    mesh, cfg, lighting, lnormal = _scene(bumpy_mesh, brdf="ggx")
    true_alpha = 0.3
    gt, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1,
                             alpha=jnp.float64(true_alpha))
    gt = np.asarray(gt)
    w = np.ones_like(gt)
    a, losses = optimize_alpha(mesh, gt, w, lighting, lnormal, cfg, KEY,
                               alpha0=0.6, lr=3e-2, T=40,
                               loss_epsilon=1e-8, log=lambda s: None)
    assert abs(a - true_alpha) < 0.1, a
    assert losses[-1] < losses[0]


def test_optimize_shape_descends(bumpy_mesh):
    """The shape leg of the alternating material pipeline
    (optimize_parameters.py:80-147) lowers the data loss."""
    from nlos_surface_optimization_tpu.optim.material import optimize_shape

    mesh, cfg, lighting, lnormal = _scene(bumpy_mesh)
    gt, _ = render_transient(mesh, lighting, lnormal, cfg, KEY)
    gt = np.asarray(gt)
    w = np.ones_like(gt)
    v0 = np.asarray(mesh.v).copy()
    v0[:, 2] += 0.008
    m0 = mesh._replace(v=jnp.asarray(v0))
    m2, plateaued, l2_final, losses = optimize_shape(
        m0, gt, w, lighting, lnormal, cfg, jax.random.fold_in(KEY, 1),
        lr=2e-3, T=10, loss_epsilon=1e-9, log=lambda s: None)
    assert np.isfinite(l2_final)
    assert losses[-1] < losses[0]
    assert np.abs(np.asarray(m2.v) - v0).sum() > 0
