"""Möller–Trumbore-as-matmul narrow phases vs the elementwise reference
(exact in f64 on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.intersect import (
    segment_occluded,
    segment_occluded_mxu,
)
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from test_accel import _layered_mesh

KEY = jax.random.key(23)


def _scene():
    v, f = _layered_mesh()
    mesh = make_mesh(v, f)
    lighting, lnormal = nst.make_confocal_scan(6)
    cfg = nst.RenderConfig(num_samples=800, num_bins=600,
                           distance_resolution=4e-3)
    return mesh, cfg, lighting, lnormal, f


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
