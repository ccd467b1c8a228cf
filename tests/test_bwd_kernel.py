"""Fused-backward kernel parity: backward_chunk_fused (Pallas, interpret
on CPU) must reproduce backward_chunk (plain XLA) on the same traced
rays — same analytic gradient, summation reordered per face."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.render.bwd_kernels import (
    backward_chunk_fused,
)
from nlos_surface_optimization_tpu.render.core import (
    backward_chunk,
    trace_chunk,
)

KEY = jax.random.key(11)


def _scene(bumpy_mesh, num_samples=900, normal="fn", testing_flag=1):
    v, f = bumpy_mesh
    mesh = make_mesh(v, f)
    if normal == "vn":
        from nlos_surface_optimization_tpu.geometry.mesh import (
            vertex_normals,
        )
        mesh = mesh._replace(vn=vertex_normals(mesh.v, mesh.f, mesh.f_valid))
    cfg = nst.RenderConfig(num_samples=num_samples, num_bins=300,
                           distance_resolution=5e-3, normal=normal,
                           testing_flag=testing_flag)
    lighting, lnormal = nst.make_confocal_scan(4)
    return mesh, cfg, jnp.asarray(lighting), jnp.asarray(lnormal)


@pytest.mark.parametrize("normal,testing_flag", [
    ("fn", 1), ("vn", 0), ("vn", 1)])
@pytest.mark.smoke
def test_fused_backward_matches_xla(bumpy_mesh, normal, testing_flag):
    mesh, cfg, lighting, lnormal = _scene(bumpy_mesh, normal=normal,
                                          testing_flag=testing_flag)
    spt = cfg.samples_per_face(int(mesh.f.shape[0]))
    rays = trace_chunk(mesh, lighting, lnormal, KEY, cfg, spt)
    rng = np.random.RandomState(0)
    diff = jnp.asarray(
        rng.randn(lighting.shape[0], cfg.num_bins) * 1e-3)
    g_ref = np.asarray(backward_chunk(rays, mesh, lnormal, diff, 0, cfg,
                                      spt))
    g_fused = np.asarray(backward_chunk_fused(rays, mesh, lnormal, diff, 0,
                                              cfg, spt, interpret=True))
    assert np.isfinite(g_fused).all()
    scale = np.abs(g_ref).max()
    assert scale > 0
    np.testing.assert_allclose(g_fused, g_ref, rtol=2e-4,
                               atol=2e-5 * scale)


def test_fused_backward_spt_variants(bumpy_mesh):
    """Odd spt (128 % spt != 0) exercises the padded-lane path."""
    for samples in (60, 160, 500):  # spt = 2, 4, 10 at F=50
        mesh, cfg, lighting, lnormal = _scene(bumpy_mesh,
                                              num_samples=samples)
        spt = cfg.samples_per_face(int(mesh.f.shape[0]))
        rays = trace_chunk(mesh, lighting, lnormal, KEY, cfg, spt)
        diff = jnp.ones((lighting.shape[0], cfg.num_bins)) * 1e-3
        g_ref = np.asarray(backward_chunk(rays, mesh, lnormal, diff, 0,
                                          cfg, spt))
        g_fused = np.asarray(backward_chunk_fused(rays, mesh, lnormal,
                                                  diff, 0, cfg, spt,
                                                  interpret=True))
        scale = max(np.abs(g_ref).max(), 1e-30)
        np.testing.assert_allclose(g_fused, g_ref, rtol=2e-4,
                                   atol=2e-5 * scale, err_msg=str(spt))


def test_inverse_render_uses_fused_backward(bumpy_mesh):
    """End-to-end: inverse_render with bwd_backend auto vs xla agree."""
    from nlos_surface_optimization_tpu.render import inverse_render
    v, f = bumpy_mesh
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(4)
    cfg_x = nst.RenderConfig(num_samples=800, num_bins=300,
                             distance_resolution=5e-3, bwd_backend="xla")
    cfg_a = cfg_x.replace(bwd_backend="fused")
    data = np.ones((16, 300)) * 1e-3
    w = np.ones_like(data)
    t1, g1, _ = inverse_render(mesh, data, w, lighting, lnormal, cfg_x, KEY)
    t2, g2, _ = inverse_render(mesh, data, w, lighting, lnormal, cfg_a, KEY)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    scale = np.abs(np.asarray(g1)).max()
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-4,
                               atol=2e-5 * scale)


def test_fused_backward_multi_slab(bumpy_mesh):
    """Lc > LS exercises the source-slab accumulation path (grid dim 2 +
    first-visit zeroing), including a non-divisible slab count."""
    v, f = bumpy_mesh
    mesh = make_mesh(v, f)
    cfg = nst.RenderConfig(num_samples=900, num_bins=300,
                           distance_resolution=5e-3)
    lighting, lnormal = nst.make_confocal_scan(7)   # 49 sources > LS=32
    lighting = jnp.asarray(lighting)
    lnormal = jnp.asarray(lnormal)
    spt = cfg.samples_per_face(int(mesh.f.shape[0]))
    rays = trace_chunk(mesh, lighting, lnormal, KEY, cfg, spt)
    rng = np.random.RandomState(3)
    diff = jnp.asarray(rng.randn(49, cfg.num_bins) * 1e-3)
    g_ref = np.asarray(backward_chunk(rays, mesh, lnormal, diff, 0, cfg,
                                      spt))
    g_fused = np.asarray(backward_chunk_fused(rays, mesh, lnormal, diff, 0,
                                              cfg, spt, interpret=True))
    scale = np.abs(g_ref).max()
    # looser than the small-scan tests: with 49 sources a few rays land
    # within f32 ulp of a fine-bin boundary and the kernel's f32 floor
    # disagrees with this CPU test's f64 XLA floor (on TPU both paths
    # compute the same f32 q, so production parity is exact)
    np.testing.assert_allclose(g_fused, g_ref, rtol=2e-2,
                               atol=3e-3 * scale)
