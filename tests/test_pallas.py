"""Pallas occlusion kernel vs the jnp reference path (interpret mode on
CPU; the same code compiles for TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nlos_surface_optimization_tpu.geometry.intersect import segment_occluded
from nlos_surface_optimization_tpu.render.pallas_kernels import (
    segment_occluded_pallas,
)

KEY = jax.random.key(3)


def _rays_from_scene(bumpy_mesh, n_rays=700):
    v, f = bumpy_mesh
    rng = np.random.RandomState(0)
    # rays from the wall toward random surface-ish targets
    o = np.zeros((n_rays, 3), np.float32)
    o[:, 0] = rng.uniform(-0.25, 0.25, n_rays)
    o[:, 1] = rng.uniform(-0.25, 0.25, n_rays)
    tgt = np.stack([
        rng.uniform(-0.25, 0.25, n_rays),
        rng.uniform(-0.25, 0.25, n_rays),
        rng.uniform(0.4, 0.6, n_rays),
    ], 1).astype(np.float32)
    d = tgt - o
    t = np.linalg.norm(d, axis=1)
    d = d / t[:, None]
    fid = rng.randint(0, f.shape[0], n_rays).astype(np.int32)
    return v, f, o, d, t.astype(np.float32), fid


def test_pallas_occlusion_matches_reference(bumpy_mesh):
    v, f, o, d, t, fid = _rays_from_scene(bumpy_mesh)
    f_valid = jnp.ones(f.shape[0], bool)
    vj = jnp.asarray(v, jnp.float32)
    ref = segment_occluded(jnp.asarray(o), jnp.asarray(d), jnp.asarray(t),
                           jnp.asarray(fid), vj, jnp.asarray(f), f_valid)
    got = segment_occluded_pallas(jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(t), jnp.asarray(fid), vj,
                                  jnp.asarray(f), f_valid, interpret=True)
    np.testing.assert_array_equal(np.array(got), np.array(ref))
    # scene must exercise both outcomes
    r = np.array(ref)
    assert r.any() and (~r).any()


def test_pallas_occlusion_padding_edges(bumpy_mesh):
    """Ray count not divisible by the block, face padding rows inert."""
    v, f, o, d, t, fid = _rays_from_scene(bumpy_mesh, n_rays=513)
    f_valid = jnp.ones(f.shape[0], bool)
    vj = jnp.asarray(v, jnp.float32)
    ref = segment_occluded(jnp.asarray(o), jnp.asarray(d), jnp.asarray(t),
                           jnp.asarray(fid), vj, jnp.asarray(f), f_valid)
    got = segment_occluded_pallas(jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(t), jnp.asarray(fid), vj,
                                  jnp.asarray(f), f_valid, interpret=True)
    np.testing.assert_array_equal(np.array(got), np.array(ref))


def test_pallas_backend_end_to_end(bumpy_mesh):
    """occl_backend='pallas' produces the same transient as 'jnp' (f32)."""
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.render import render_transient

    v, f = bumpy_mesh
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(4)
    cfg = nst.RenderConfig(num_samples=400, num_bins=300,
                           distance_resolution=5e-3)
    t_jnp, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1)
    cfg_p = cfg.replace(occl_backend="pallas")
    t_pal, _ = render_transient(mesh, lighting, lnormal, cfg_p, KEY, refine=1)
    np.testing.assert_allclose(np.array(t_pal), np.array(t_jnp), rtol=2e-5,
                               atol=1e-8)


def test_pallas_occlusion_invalid_faces_ignored(bumpy_mesh):
    v, f, o, d, t, fid = _rays_from_scene(bumpy_mesh, n_rays=256)
    f_valid = jnp.zeros(f.shape[0], bool)  # nothing can occlude
    got = segment_occluded_pallas(jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(t), jnp.asarray(fid),
                                  jnp.asarray(v, jnp.float32),
                                  jnp.asarray(f), f_valid, interpret=True)
    assert not np.array(got).any()


def test_pallas_occlusion_multigroup(bumpy_mesh, monkeypatch):
    """Ray sets above MAX_NB blocks run as an outer lax.map over groups;
    shrink the cap so a small scene exercises the grouped path."""
    from nlos_surface_optimization_tpu.render import pallas_kernels as pk

    monkeypatch.setattr(pk, "MAX_NB", 1)  # 1 block (512 rays) per call
    v, f, o, d, t, fid = _rays_from_scene(bumpy_mesh, n_rays=1300)
    f_valid = jnp.ones(f.shape[0], bool)
    vj = jnp.asarray(v, jnp.float32)
    ref = segment_occluded(jnp.asarray(o), jnp.asarray(d), jnp.asarray(t),
                           jnp.asarray(fid), vj, jnp.asarray(f), f_valid)
    got = pk.segment_occluded_pallas.__wrapped__(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t), jnp.asarray(fid),
        vj, jnp.asarray(f), f_valid, interpret=True)
    np.testing.assert_array_equal(np.array(got), np.array(ref))


def test_fused_kernel_matches_reference(bumpy_mesh):
    """occluded_splat_pallas == segment_occluded + segment_sum exactly
    (occlusion) / to f32 summation order (histogram)."""
    from nlos_surface_optimization_tpu.render.fused_kernels import (
        occluded_splat_pallas,
    )

    v, f = bumpy_mesh
    rng = np.random.RandomState(1)
    F = f.shape[0]
    Lc, spt = 3, 2
    R = Lc * F * spt
    # sources far off-axis so rays graze the bumps -> real occlusion
    src = np.stack([rng.uniform(0.7, 0.9, Lc),
                    rng.uniform(-0.25, 0.25, Lc), 0.45 + np.zeros(Lc)], 1)
    fi = np.tile(np.repeat(np.arange(F), spt), Lc).astype(np.int32)
    u = rng.rand(R).astype(np.float32)
    w = rng.rand(R).astype(np.float32)
    m = u + w > 1
    u[m], w[m] = 1 - u[m], 1 - w[m]
    p = (v[f[fi, 0]] * (1 - u - w)[:, None] + v[f[fi, 1]] * u[:, None]
         + v[f[fi, 2]] * w[:, None])
    o = np.repeat(src, F * spt, 0).astype(np.float32)
    d = p - o
    t = np.linalg.norm(d, axis=1).astype(np.float32)
    d = (d / t[:, None]).astype(np.float32)
    contrib = rng.rand(R).astype(np.float32)
    NB = 384
    bins = rng.randint(0, NB, R).astype(np.int32)
    f_valid = jnp.ones(F, bool)
    vj = jnp.asarray(v, jnp.float32)

    occ_ref = np.asarray(segment_occluded(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t), jnp.asarray(fi),
        vj, jnp.asarray(f), f_valid))
    hist_ref = np.zeros((Lc, NB), np.float32)
    l_idx = np.repeat(np.arange(Lc), F * spt)
    np.add.at(hist_ref, (l_idx, bins), np.where(occ_ref, 0, contrib))

    occ, hist = occluded_splat_pallas(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t), jnp.asarray(fi),
        jnp.asarray(contrib), jnp.asarray(bins), vj, jnp.asarray(f),
        f_valid, Lc, NB, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), occ_ref)
    np.testing.assert_allclose(np.asarray(hist), hist_ref, rtol=2e-6,
                               atol=1e-7)
    assert occ_ref.any()


def test_fused_kernel_windowed_residual(bumpy_mesh):
    """Bin count far beyond the kernel's wp-page histogram window, with
    per-block bin spreads that overflow it: the out-of-window rays must be
    splatted exactly by the XLA residual pass (window base page0 logic)."""
    from nlos_surface_optimization_tpu.render.fused_kernels import (
        occluded_splat_pallas,
    )

    v, f = bumpy_mesh
    rng = np.random.RandomState(7)
    F = f.shape[0]
    Lc, spt = 2, 2
    R = Lc * F * spt
    src = np.stack([rng.uniform(0.7, 0.9, Lc),
                    rng.uniform(-0.25, 0.25, Lc), 0.45 + np.zeros(Lc)], 1)
    fi = np.tile(np.repeat(np.arange(F), spt), Lc).astype(np.int32)
    u = rng.rand(R).astype(np.float32)
    w = rng.rand(R).astype(np.float32)
    m = u + w > 1
    u[m], w[m] = 1 - u[m], 1 - w[m]
    p = (v[f[fi, 0]] * (1 - u - w)[:, None] + v[f[fi, 1]] * u[:, None]
         + v[f[fi, 2]] * w[:, None])
    o = np.repeat(src, F * spt, 0).astype(np.float32)
    d = p - o
    t = np.linalg.norm(d, axis=1).astype(np.float32)
    d = (d / t[:, None]).astype(np.float32)
    contrib = rng.rand(R).astype(np.float32)
    # a few zero-contribution rays: they must not widen the window
    contrib[rng.rand(R) < 0.1] = 0.0
    NB = 4096  # 32 pages > wp=24: window + residual both active
    bins = rng.randint(0, NB, R).astype(np.int32)
    f_valid = jnp.ones(F, bool)
    vj = jnp.asarray(v, jnp.float32)

    occ_ref = np.asarray(segment_occluded(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t), jnp.asarray(fi),
        vj, jnp.asarray(f), f_valid))
    hist_ref = np.zeros((Lc, NB), np.float32)
    l_idx = np.repeat(np.arange(Lc), F * spt)
    np.add.at(hist_ref, (l_idx, bins), np.where(occ_ref, 0, contrib))

    occ, hist = occluded_splat_pallas(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(t), jnp.asarray(fi),
        jnp.asarray(contrib), jnp.asarray(bins), vj, jnp.asarray(f),
        f_valid, Lc, NB, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ), occ_ref)
    np.testing.assert_allclose(np.asarray(hist), hist_ref, rtol=2e-6,
                               atol=1e-7)


def test_fused_backend_inverse_matches_jnp(bumpy_mesh):
    """occl_backend='fused' reproduces the jnp transient AND gradient."""
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.render import inverse_render

    v, f = bumpy_mesh
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(4)
    cfg = nst.RenderConfig(num_samples=400, num_bins=300,
                           distance_resolution=5e-3)
    data = jnp.zeros((16, 300), jnp.float32)
    w = jnp.ones((16, 300), jnp.float32)
    t_j, g_j, _ = inverse_render(mesh, data, w, lighting, lnormal, cfg, KEY)
    cfg_f = cfg.replace(occl_backend="fused")
    t_f, g_f, _ = inverse_render(mesh, data, w, lighting, lnormal, cfg_f, KEY)
    np.testing.assert_allclose(np.array(t_f), np.array(t_j), rtol=2e-5,
                               atol=1e-8)
    np.testing.assert_allclose(np.array(g_f), np.array(g_j), rtol=2e-4,
                               atol=1e-7)


@pytest.mark.parametrize("ka,ka2", [(4, 128), (4, 2)])
def test_fused_two_level_fallback(bumpy_mesh, monkeypatch, ka, ka2):
    """Shrinking the fine list forces the coarse 64-face-supergroup
    regime (ka2 ample) or the full-scan regime (ka2 tiny too); both must
    reproduce the jnp backend exactly."""
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.render import fused_kernels as fk
    from nlos_surface_optimization_tpu.render import render_transient

    v, f = bumpy_mesh
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(4)
    cfg = nst.RenderConfig(num_samples=400, num_bins=300,
                           distance_resolution=5e-3)
    t_ref, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1)
    monkeypatch.setattr(fk, "KA_MAX", ka)
    monkeypatch.setattr(fk, "KA2_MAX", ka2)
    cfg_f = cfg.replace(occl_backend="fused")
    t_f, _ = render_transient(mesh, lighting, lnormal, cfg_f, KEY, refine=1)
    np.testing.assert_allclose(np.array(t_f), np.array(t_ref), rtol=2e-5,
                               atol=1e-8)


def test_fused_multigroup(bumpy_mesh, monkeypatch):
    """Block counts above MAX_NBA run as an outer lax.map over groups."""
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.render import fused_kernels as fk
    from nlos_surface_optimization_tpu.render import render_transient

    v, f = bumpy_mesh
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(4)
    cfg = nst.RenderConfig(num_samples=400, num_bins=300,
                           distance_resolution=5e-3)
    t_ref, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1)
    monkeypatch.setattr(fk, "MAX_NBA", 2)
    cfg_f = cfg.replace(occl_backend="fused")
    t_f, _ = render_transient(mesh, lighting, lnormal, cfg_f, KEY, refine=1)
    np.testing.assert_allclose(np.array(t_f), np.array(t_ref), rtol=2e-5,
                               atol=1e-8)
