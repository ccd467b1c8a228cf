"""Analytic backward vs jax.grad of the continuous autograd twin.

The twin computes the exact Gaussian-CDF smoothed transient; the analytic
backward approximates the Gaussian integral by K kernel taps.  On a linear
functional sum(ct * T(v)) their gradients must agree to tap-quadrature
accuracy.  This mirrors the reference's use of its PyTorch-autograd prototype
as ground truth (test_autograd.py, check_matlab/compare_python_matlab.m)."""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh, vertex_normals
from nlos_surface_optimization_tpu.render.autograd_twin import (
    twin_transient_from_rays,
)
from nlos_surface_optimization_tpu.render.core import backward_chunk, trace_chunk

KEY = jax.random.key(11)


def _compare(v, f, cfg, res=4, vn=None, alpha=None, rtol=1e-2):
    mesh = make_mesh(v.astype(np.float64), f, vn=vn, dtype=np.float64)
    lighting, lnormal = nst.make_confocal_scan(res)
    lighting = lighting.astype(np.float64)
    lnormal = lnormal.astype(np.float64)
    spt = cfg.samples_per_face(f.shape[0])
    rays = trace_chunk(mesh, jnp.asarray(lighting), jnp.asarray(lnormal), KEY,
                       cfg, spt)

    rng = np.random.RandomState(5)
    ct = rng.randn(lighting.shape[0], cfg.num_bins)

    def lin(vv):
        m = mesh._replace(v=vv)
        t = twin_transient_from_rays(vv, m, rays, jnp.asarray(lighting),
                                     jnp.asarray(lnormal), cfg, spt,
                                     alpha=alpha)
        return jnp.sum(jnp.asarray(ct) * t)

    g_twin = np.array(jax.grad(lin)(mesh.v))

    # analytic backward: gradient of sum w*(data-T)^2 with difference given;
    # ct = -2*difference  =>  difference = -ct/2
    g_an = np.array(
        backward_chunk(rays, mesh, jnp.asarray(lnormal),
                       jnp.asarray(-ct / 2.0), 0, cfg, spt,
                       alpha=alpha)
    )
    gt = g_twin[: v.shape[0]]
    ga = g_an[: v.shape[0]]
    denom = np.linalg.norm(gt)
    assert denom > 0
    # tap-quadrature error vanishes as refine grows (verified separately);
    # compare in norm to avoid amplifying near-zero components
    assert np.linalg.norm(ga - gt) / denom < rtol, (ga, gt)


def _cfg(**kw):
    base = dict(num_samples=300, num_bins=200, distance_resolution=8e-3,
                sigma_bin=5, bin_refine_resolution=10)
    base.update(kw)
    return nst.RenderConfig(**base)


def test_twin_plane_fn(plane_mesh):
    v, f = plane_mesh
    _compare(v, f, _cfg())


def test_twin_bumpy_fn(bumpy_mesh):
    v, f = bumpy_mesh
    _compare(v, f, _cfg(num_samples=800))


# NOTE: vn mode is validated against the NumPy oracle instead of the twin:
# the reference's t2 term uses the INTERPOLATED shading normal in the
# area-derivative cross product (transient_and_gradient.cpp:956, 966) where
# the exact derivative would use the face normal, so the exact-math twin
# diverges from the (faithfully replicated) analytic formula in vn mode.


def test_twin_ggx(bumpy_mesh):
    v, f = bumpy_mesh
    _compare(v, f, _cfg(num_samples=800, brdf="ggx"), alpha=jnp.float64(0.3),
             rtol=2e-2)
