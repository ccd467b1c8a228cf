"""Shard-count invariance and sharded-vs-single-device parity.

The reference has no distributed tests (SURVEY.md §4.5); these are the gates
the TPU framework adds: identical transients/gradients on 1 vs N devices,
exercised on an 8-way virtual CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.optim import adam_modified
from nlos_surface_optimization_tpu.parallel import (
    make_source_mesh,
    sharded_inverse_render,
    sharded_render_transient,
)
from nlos_surface_optimization_tpu.render import inverse_render, render_transient

KEY = jax.random.key(21)


def _scene(bumpy_mesh, res=6):
    v, f = bumpy_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=500, num_bins=400,
                           distance_resolution=5e-3)
    lighting, lnormal = nst.make_confocal_scan(res)
    return mesh, cfg, lighting.astype(np.float64), lnormal.astype(np.float64)


@pytest.mark.parametrize("ndev", [1, 2, 8])
def test_forward_shard_invariance(bumpy_mesh, ndev):
    mesh, cfg, lighting, lnormal = _scene(bumpy_mesh)
    t_ref, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1)
    dmesh = make_source_mesh(jax.devices()[:ndev])
    t_sh = sharded_render_transient(mesh, lighting, lnormal, cfg, KEY, dmesh,
                                    refine=1)
    np.testing.assert_array_equal(np.array(t_ref), np.array(t_sh))


@pytest.mark.parametrize("ndev", [2, 8])
def test_gradient_shard_invariance(bumpy_mesh, ndev):
    mesh, cfg, lighting, lnormal = _scene(bumpy_mesh)
    t0, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1)
    rng = np.random.RandomState(4)
    data = np.array(t0) * (1 + 0.2 * rng.rand(*t0.shape))
    weight = 0.5 + rng.rand(*data.shape)

    _, g_ref, _ = inverse_render(mesh, data, weight, lighting, lnormal, cfg,
                                 KEY)
    dmesh = make_source_mesh(jax.devices()[:ndev])
    t_sh, g_sh = sharded_inverse_render(mesh, data, weight, lighting, lnormal,
                                        cfg, KEY, dmesh)
    # f64 on CPU: the only difference is reduction order (psum tree vs
    # lax.map sum); tolerances are tight
    np.testing.assert_allclose(np.array(g_sh), np.array(g_ref), rtol=1e-10,
                               atol=1e-14)


def test_shard_invariance_nondivisible(bumpy_mesh):
    """L=25 sources over 8 devices (pad 7): padded sources contribute zero."""
    mesh, cfg, lighting, lnormal = _scene(bumpy_mesh, res=5)
    assert lighting.shape[0] % 8 != 0
    t_ref, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1)
    dmesh = make_source_mesh(jax.devices())
    t0, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1)
    data = np.array(t0) * 1.1
    weight = np.ones_like(data)
    _, g_ref, _ = inverse_render(mesh, data, weight, lighting, lnormal, cfg,
                                 KEY)
    t_sh, g_sh = sharded_inverse_render(mesh, data, weight, lighting, lnormal,
                                        cfg, KEY, dmesh)
    assert t_sh.shape == t_ref.shape
    np.testing.assert_array_equal(np.array(t_ref), np.array(t_sh))
    np.testing.assert_allclose(np.array(g_sh), np.array(g_ref), rtol=1e-10,
                               atol=1e-14)


@pytest.mark.parametrize("mode", ["albedo", "alpha"])
def test_scalar_gradient_shard_invariance(bumpy_mesh, mode):
    cfgkw = dict(num_samples=400, num_bins=300, distance_resolution=5e-3)
    if mode == "alpha":
        cfgkw["brdf"] = "ggx"
    v, f = bumpy_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(**cfgkw)
    lighting, lnormal = nst.make_confocal_scan(4)
    lighting = lighting.astype(np.float64)
    lnormal = lnormal.astype(np.float64)
    alpha = jnp.float64(0.3) if mode == "alpha" else None
    t0, _ = render_transient(mesh, lighting, lnormal, cfg, KEY, refine=1,
                             alpha=alpha)
    data = np.array(t0) * 1.2
    weight = np.ones_like(data)

    from nlos_surface_optimization_tpu.render import (
        inverse_render_albedo,
        inverse_render_alpha,
    )
    if mode == "albedo":
        _, g_ref = inverse_render_albedo(mesh, data, weight, lighting,
                                         lnormal, cfg, KEY)
    else:
        _, g_ref = inverse_render_alpha(mesh, data, weight, lighting,
                                        lnormal, cfg, KEY, alpha)
    dmesh = make_source_mesh(jax.devices())
    _, g_sh = sharded_inverse_render(mesh, data, weight, lighting, lnormal,
                                     cfg, KEY, dmesh, alpha=alpha, mode=mode)
    np.testing.assert_allclose(float(g_sh), float(g_ref), rtol=1e-10)


def test_adam_modified_isotropic_denominator():
    """The denominator is shared across a vertex's xyz: a vertex whose grad
    is (g, 0, 0) must still be divided by mean(sqrt(v))+eps over xyz, not
    per-coordinate (adam_modified.py:102)."""
    init_fn, update_fn = adam_modified(lr=1e-2, b1=0.0, b2=0.0, eps=0.0)
    params = jnp.zeros((2, 3))
    state = init_fn(params)
    grads = jnp.array([[3.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    updates, state = update_fn(grads, state)
    # b1=b2=0: m=g, v=g^2, denom=|g|, new_denom=mean(|g|) per row
    # row0: mean(|g|)=1 -> update = -lr*g/1 = (-0.03, 0, 0)
    np.testing.assert_allclose(np.array(updates[0]), [-0.03, 0.0, 0.0],
                               rtol=1e-6)
    np.testing.assert_allclose(np.array(updates[1]), [-0.01] * 3, rtol=1e-6)


def test_adam_modified_lr_scale():
    """Border vertices step with lr*edge_lr_ratio (two-param-group
    semantics, exp_bunny/test.py:104)."""
    init_fn, update_fn = adam_modified(lr=1e-2)
    params = jnp.zeros((2, 3))
    state = init_fn(params)
    grads = jnp.ones((2, 3))
    lr_scale = jnp.array([1.0, 0.1])
    u, _ = update_fn(grads, state, lr_scale=lr_scale)
    np.testing.assert_allclose(np.array(u[1]), np.array(u[0]) * 0.1,
                               rtol=1e-6)


def test_adam_modified_matches_torch_reference_shape_of_update():
    """Bias-correction folding: step = lr*sqrt(1-b2^t)/(1-b1^t) * m/denom
    (adam_modified.py:104-107) — checked over 3 steps against a NumPy
    re-derivation."""
    lr, b1, b2, eps = 5e-3, 0.9, 0.999, 1e-8
    init_fn, update_fn = adam_modified(lr, b1, b2, eps)
    rng = np.random.RandomState(0)
    params = jnp.asarray(rng.randn(4, 3))
    state = init_fn(params)
    m = np.zeros((4, 3)); v = np.zeros((4, 3))
    p_np = np.array(params)
    for t in range(1, 4):
        g = rng.randn(4, 3)
        u, state = update_fn(jnp.asarray(g), state)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        denom = np.sqrt(v) + eps
        new_denom = denom.mean(axis=1, keepdims=True)
        step = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
        u_np = -step * m / new_denom
        np.testing.assert_allclose(np.array(u), u_np, rtol=1e-10)
