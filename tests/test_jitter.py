"""Jitter (measured temporal kernel) variant: forward + gradient parity.

The reference's own oracle for this variant is delta-kernel equivalence
(jitter/test.py: a [0,...,1,...,0] kernel must reproduce the unsmoothed
renderer); we add full-kernel comparison against an independent NumPy
re-derivation."""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.geometry.sampling import stratified_barycoords
from nlos_surface_optimization_tpu.render import (
    inverse_render_jitter,
    render_transient,
    render_transient_jitter,
)

import oracle

KEY = jax.random.key(13)


def _setup(vf, res=6):
    v, f = vf
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=500, num_bins=500,
                           distance_resolution=5e-3)
    lighting, lnormal = nst.make_confocal_scan(res)
    lighting = lighting.astype(np.float64)
    lnormal = lnormal.astype(np.float64)
    spt = cfg.samples_per_face(f.shape[0])
    bary = np.array(
        stratified_barycoords(KEY, lighting.shape[0], f.shape[0], spt, 0),
        np.float64,
    )
    return mesh, cfg, lighting, lnormal, bary, spt


def test_delta_kernel_equals_raw(bumpy_mesh):
    """Kernel = delta at the offset -> identical to the raw histogram
    (the reference's implicit correctness oracle, jitter/test.py)."""
    mesh, cfg, lighting, lnormal, bary, spt = _setup(bumpy_mesh)
    t_raw, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1)
    w = np.zeros(7); w[3] = 1.0
    t_jit, _ = render_transient_jitter(mesh, lighting, lnormal, cfg, KEY,
                                       w, 3)
    np.testing.assert_allclose(np.array(t_jit), np.array(t_raw), rtol=1e-12,
                               atol=0)


def test_jitter_forward_matches_oracle(bumpy_mesh):
    mesh, cfg, lighting, lnormal, bary, spt = _setup(bumpy_mesh)
    rng = np.random.RandomState(2)
    w = rng.rand(11); w /= w.sum()
    off = 4
    t, _ = render_transient_jitter(mesh, lighting, lnormal, cfg, KEY, w, off)
    t_ref = oracle.forward_transient_jitter(
        np.array(mesh.v), np.array(mesh.f), lighting, lnormal, bary,
        cfg.bin_lower, cfg.distance_resolution, cfg.num_bins, w, off,
    )
    np.testing.assert_allclose(np.array(t), t_ref, rtol=1e-6, atol=1e-12)


def test_jitter_gradient_matches_oracle(bumpy_mesh):
    mesh, cfg, lighting, lnormal, bary, spt = _setup(bumpy_mesh)
    rng = np.random.RandomState(3)
    w = rng.rand(9); w /= w.sum()
    jg = np.gradient(w)  # any smooth derivative array works for parity
    off = 4
    t, _ = render_transient_jitter(mesh, lighting, lnormal, cfg, KEY, w, off)
    data = np.array(t) * (1 + 0.2 * rng.rand(*t.shape))
    weight = 0.5 + rng.rand(*data.shape)
    t2, g, _ = inverse_render_jitter(mesh, data, weight, lighting, lnormal,
                                     cfg, KEY, w, jg, off)
    np.testing.assert_allclose(np.array(t2), np.array(t), rtol=1e-12)
    diff = (data - np.array(t)) * weight
    g_ref = oracle.vertex_gradient_jitter(
        np.array(mesh.v), np.array(mesh.f), lighting, lnormal, bary, diff,
        cfg.bin_lower, cfg.distance_resolution, cfg.num_bins, w, jg, off,
    )
    v_count = g_ref.shape[0]
    np.testing.assert_allclose(np.array(g)[:v_count], g_ref, rtol=5e-3,
                               atol=1e-6 * np.abs(g_ref).max())


def test_jitter_gaussian_kernel_approximates_gaussian_path(plane_mesh):
    """A jitter kernel = the Gaussian discretized at coarse-bin centers
    approximates the refine=4 Gaussian-smoothed forward to a few percent
    (coarse vs fine kernel discretization)."""
    v, f = plane_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=500, num_bins=300,
                           distance_resolution=5e-3, sigma_bin=5,
                           bin_refine_resolution=4)
    lighting, lnormal = nst.make_confocal_scan(4)
    lighting = lighting.astype(np.float64)
    lnormal = lnormal.astype(np.float64)
    t_gauss, _ = render_transient(mesh, lighting, lnormal, cfg, KEY)

    # discretize the same Gaussian at coarse-bin centers
    sigma_bins = cfg.sigma / cfg.distance_resolution
    half = 10
    x = np.arange(-half, half + 1)
    w = np.exp(-(x / sigma_bins) ** 2 / 2)
    w /= w.sum()
    t_jit, _ = render_transient_jitter(mesh, lighting, lnormal, cfg, KEY,
                                       w, half)
    a, b = np.array(t_gauss), np.array(t_jit)
    assert np.linalg.norm(a - b) / np.linalg.norm(a) < 0.05
