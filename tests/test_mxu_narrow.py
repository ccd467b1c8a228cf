"""Möller–Trumbore-as-matmul narrow phases vs the elementwise reference
(exact in f64 on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.accel import permute_mesh
from nlos_surface_optimization_tpu.geometry.intersect import (
    segment_occluded,
    segment_occluded_mxu,
)
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.render import prepare_visibility
from nlos_surface_optimization_tpu.render.core import trace_chunk
from test_accel import _layered_mesh

KEY = jax.random.key(23)


def _scene():
    v, f = _layered_mesh()
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(6)
    cfg = nst.RenderConfig(num_samples=800, num_bins=600,
                           distance_resolution=4e-3)
    return mesh, cfg, lighting, lnormal, f


def test_culled_mxu_matches_vpu_and_bruteforce():
    mesh, cfg, lighting, lnormal, f = _scene()
    accel, lists = prepare_visibility(mesh, lighting)
    pmesh = permute_mesh(mesh, accel)
    spt = cfg.samples_per_face(f.shape[0])
    r_bf = trace_chunk(pmesh, jnp.asarray(lighting), jnp.asarray(lnormal),
                       KEY, cfg, spt)
    r_vpu = trace_chunk(pmesh, jnp.asarray(lighting), jnp.asarray(lnormal),
                        KEY, cfg.replace(mt_narrow="vpu"), spt, accel=accel,
                        cluster_lists=lists)
    r_mxu = trace_chunk(pmesh, jnp.asarray(lighting), jnp.asarray(lnormal),
                        KEY, cfg.replace(mt_narrow="mxu"), spt, accel=accel,
                        cluster_lists=lists)
    bf = np.asarray(r_bf.valid)
    np.testing.assert_array_equal(np.asarray(r_vpu.valid), bf)
    mm = (np.asarray(r_mxu.valid) != bf).mean()
    assert mm < 1e-3, mm  # knife-edge-only differences (0 in f64 on CPU)


def test_bruteforce_mxu_matches_reference():
    mesh, cfg, lighting, lnormal, f = _scene()
    rng = np.random.RandomState(1)
    n = 700
    o = np.zeros((n, 3), np.float32)
    o[:, :2] = rng.uniform(-0.25, 0.25, (n, 2))
    tgt = np.stack([
        rng.uniform(-0.25, 0.25, n), rng.uniform(-0.25, 0.25, n),
        rng.uniform(0.25, 0.6, n),
    ], 1).astype(np.float32)
    d = tgt - o
    t = np.linalg.norm(d, axis=1)
    d = d / t[:, None]
    fid = rng.randint(0, f.shape[0], n).astype(np.int32)
    args = (jnp.asarray(o), jnp.asarray(d), jnp.asarray(t.astype(np.float32)),
            jnp.asarray(fid), mesh.v, mesh.f, mesh.f_valid)
    ref = np.asarray(segment_occluded(*args))
    got = np.asarray(segment_occluded_mxu(*args))
    assert ref.any() and (~ref).any()
    assert (got != ref).mean() < 1e-3
