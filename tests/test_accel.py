"""Broad-phase visibility culling: culled path must be EXACTLY as
conservative-correct as brute force (same valid masks, same transients,
same gradients on identical samples)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.accel import (
    CLUSTER_SIZE,
    active_cluster_lists,
    build_accel,
    permute_mesh,
    required_K,
)
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.render import (
    inverse_render,
    prepare_visibility,
    render_transient,
)
from nlos_surface_optimization_tpu.render.core import trace_chunk

KEY = jax.random.key(23)


def _layered_mesh():
    """Height field PLUS a floating occluder patch above part of it, so the
    culled path must catch real occlusion."""
    n = 10
    xs = np.linspace(-0.25, 0.25, n)
    gx, gy = np.meshgrid(xs, xs)
    z = 0.5 + 0.05 * np.sin(5 * gx) * np.cos(4 * gy)
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + n, a + n + 1, a + 1])
    # occluder: small quad at z=0.3 over the +x,+y quadrant
    base = v.shape[0]
    occ_v = np.array([
        [0.05, 0.05, 0.3], [0.2, 0.05, 0.3], [0.05, 0.2, 0.3],
        [0.2, 0.2, 0.3],
    ], np.float32)
    v = np.vstack([v, occ_v])
    faces += [[base, base + 2, base + 1], [base + 2, base + 3, base + 1]]
    return v, np.array(faces, np.int32)


def test_build_accel_structure():
    v, f = _layered_mesh()
    accel = build_accel(v, f)
    F = f.shape[0]
    C = accel.num_clusters
    assert C == -(-F // CLUSTER_SIZE)
    perm = np.asarray(accel.perm)
    sv = np.asarray(accel.slot_valid)
    assert sv.sum() == F
    assert sorted(perm[sv].tolist()) == list(range(F))
    # every valid face is inside its cluster's bounding sphere
    cent = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3
    for j in np.flatnonzero(sv):
        c = j // CLUSTER_SIZE
        r = np.linalg.norm(cent[perm[j]] - np.asarray(accel.centers)[c])
        assert r <= np.asarray(accel.radii)[c] + 1e-5


def test_culled_equals_bruteforce_tracechunk():
    """Same permuted mesh, same samples: brute-force vs culled visibility
    masks must be IDENTICAL (the broad phase is conservative-exact)."""
    v, f = _layered_mesh()
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(6)
    cfg = nst.RenderConfig(num_samples=800, num_bins=600,
                           distance_resolution=4e-3)
    accel, lists = prepare_visibility(mesh, lighting)
    pmesh = permute_mesh(mesh, accel)
    spt = cfg.samples_per_face(f.shape[0])

    rays_bf = trace_chunk(pmesh, jnp.asarray(lighting), jnp.asarray(lnormal),
                          KEY, cfg, spt)
    rays_cl = trace_chunk(pmesh, jnp.asarray(lighting), jnp.asarray(lnormal),
                          KEY, cfg, spt, accel=accel, cluster_lists=lists)
    np.testing.assert_array_equal(np.asarray(rays_cl.valid),
                                  np.asarray(rays_bf.valid))
    # the occluder actually blocks something in this scene
    assert (~np.asarray(rays_bf.valid)).any()


def test_culled_end_to_end_transient_and_gradient():
    from nlos_surface_optimization_tpu.render.api import (
        _inverse_impl,
        _render_transient_impl,
    )

    v, f = _layered_mesh()
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(6)
    cfg = nst.RenderConfig(num_samples=800, num_bins=600,
                           distance_resolution=4e-3)
    accel, lists = prepare_visibility(mesh, lighting)
    # pin spt so brute-force-on-permuted-mesh and culled paths draw the
    # exact same samples (the public API derives spt from its mesh's F)
    spt = cfg.samples_per_face(f.shape[0])
    alpha = jnp.float32(0.1)
    lit = jnp.asarray(lighting)
    nrm = jnp.asarray(lnormal)

    t_cull = _render_transient_impl(mesh, lit, nrm, KEY, alpha, cfg, spt, 1,
                                    accel=accel, cluster_lists=lists)
    pmesh = permute_mesh(mesh, accel)
    t_bf = _render_transient_impl(pmesh, lit, nrm, KEY, alpha, cfg, spt, 1)
    np.testing.assert_array_equal(np.asarray(t_cull), np.asarray(t_bf))

    data = jnp.asarray(np.asarray(t_bf) * 1.2)
    w = jnp.ones_like(data)
    _, g_cull = _inverse_impl(mesh, data, w, lit, nrm, KEY, alpha, cfg, spt,
                              "vertex", accel=accel, cluster_lists=lists)
    _, g_bf = _inverse_impl(pmesh, data, w, lit, nrm, KEY, alpha, cfg, spt,
                            "vertex")
    np.testing.assert_allclose(np.asarray(g_cull), np.asarray(g_bf),
                               rtol=1e-12, atol=0)


def test_required_K_bounds():
    v, f = _layered_mesh()
    mesh = make_mesh(v, f)
    lighting, _ = nst.make_confocal_scan(6)
    accel = build_accel(v, f)
    K = required_K(accel, lighting)
    assert 1 <= K <= accel.num_clusters
    lists, max_active = active_cluster_lists(accel, jnp.asarray(lighting), K)
    assert int(max_active) <= K
    assert lists.shape == (lighting.shape[0], accel.num_clusters, K)


def test_host_chunked_culled_matches_fused(bumpy_mesh):
    """Host-dispatched chunk loop with broad-phase culling == fused."""
    import jax.numpy as jnp
    import numpy as np

    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.render import prepare_visibility
    from nlos_surface_optimization_tpu.render.api import (
        _inverse_impl,
        _inverse_impl_host,
    )

    v, f = bumpy_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=500, num_bins=600,
                           distance_resolution=5e-3, source_chunk=10)
    lighting, lnormal = nst.make_confocal_scan(6)
    lighting = lighting.astype(np.float64)
    lnormal = lnormal.astype(np.float64)
    spt = cfg.samples_per_face(f.shape[0])
    accel, lists = prepare_visibility(mesh, lighting)
    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.rand(lighting.shape[0], cfg.num_bins))
    w = jnp.ones_like(data)
    key = jax.random.key(11)
    a = jnp.float64(0.1)
    t1, g1 = _inverse_impl(mesh, data, w, jnp.asarray(lighting),
                           jnp.asarray(lnormal), key, a, cfg, spt, "vertex",
                           accel=accel, cluster_lists=lists)
    t2, g2 = _inverse_impl_host(mesh, data, w, jnp.asarray(lighting),
                                jnp.asarray(lnormal), key, a, cfg, spt,
                                "vertex", accel=accel, cluster_lists=lists)
    np.testing.assert_allclose(np.array(t1), np.array(t2), rtol=1e-12)
    np.testing.assert_allclose(np.array(g1), np.array(g2), rtol=1e-9)
