"""SPAD noise model: statistical sanity vs the reference's photon pipeline
(exp_noise/noise/spadModel.m)."""

import jax
import jax.numpy as jnp
import numpy as np

from nlos_surface_optimization_tpu.noise import (
    SpadParams,
    spad_model,
    spad_noisy_transients,
)

KEY = jax.random.key(99)


def _ideal(B=200, center=80, width=6.0):
    x = np.arange(B)
    return np.exp(-((x - center) / width) ** 2 / 2)


def test_spad_counts_concentrate_at_peak():
    ideal = _ideal()
    params = SpadParams(num_photons=3000, mu_noise=0.0, pileup=False)
    jitters = np.array([0.0])          # no jitter
    counts = np.array([1.0])
    out = np.asarray(spad_model(KEY, ideal, jitters, counts, params))
    assert out.sum() > 0
    # detected photons follow the ideal distribution: peak near center
    assert abs(int(np.argmax(out)) - 80) <= 3
    # mass within +-4 sigma dominates
    assert out[56:104].sum() / out.sum() > 0.95


def test_spad_jitter_broadens():
    ideal = _ideal(width=2.0)
    params = SpadParams(num_photons=4000, mu_noise=0.0, pileup=False)
    no_jit = np.asarray(spad_model(
        KEY, ideal, np.array([0.0]), np.array([1.0]), params))
    # jitter uniform over +-20 bins (in seconds: bins * dt)
    jbins = np.arange(-20, 21).astype(np.float64)
    jit = np.asarray(spad_model(
        KEY, ideal, jbins * params.dt, np.ones_like(jbins), params))

    def std_of(h):
        x = np.arange(len(h))
        p = h / h.sum()
        mu = (x * p).sum()
        return np.sqrt(((x - mu) ** 2 * p).sum())

    assert std_of(jit) > std_of(no_jit) * 2


def test_spad_background_level():
    """With a flat ideal and mu_noise, background adds ~Poisson(mu_back)."""
    B = 150
    ideal = np.ones(B)
    M = 1000
    mu = 50.0
    jit = np.array([0.0]); cnt = np.array([200.0])
    params = SpadParams(num_photons=M, mu_noise=mu, pileup=False, pdp=0.0)
    # pdp=0: no photons detected; counts are pure background
    out = np.asarray(spad_model(KEY, ideal, jit, cnt, params))
    expected = mu * M / 200.0 * B / 1.0  # spadModel.m:64
    mean = out.mean()
    assert 0.8 * expected < mean < 1.2 * expected


def test_spad_pileup_reduces_counts():
    ideal = _ideal()
    jit = np.array([0.0]); cnt = np.array([1.0])
    base = SpadParams(num_photons=2000, mu_noise=0.0)
    with_pu = np.asarray(spad_model(KEY, ideal, jit, cnt, base))
    no_pu = np.asarray(spad_model(
        KEY, ideal, jit, cnt, base._replace(pileup=False)))
    assert with_pu.sum() < no_pu.sum()


def test_spad_batch_rescale():
    t = np.stack([_ideal(), 2 * _ideal(center=120)], 0)
    params = SpadParams(num_photons=500, mu_noise=0.0, pileup=False)
    out = np.asarray(spad_noisy_transients(
        KEY, t, np.array([0.0]), np.array([1.0]), params))
    assert out.shape == t.shape
    # rescaled to ideal energy / M * counts: same order of magnitude as ideal
    for i in range(2):
        assert 0.3 * t[i].sum() < out[i].sum() < 3.0 * t[i].sum()


def test_noise_scene_injects_spad_and_descends(tmp_path):
    """run_experiment('noise') pushes GT through the SPAD Scaled model
    before optimizing (addNoiseExample.m:20-24) and the loop still runs:
    the injected GT must differ from the ideal render, and the loop must
    produce finite losses."""
    import os

    from nlos_surface_optimization_tpu.experiments import run as run_mod
    from nlos_surface_optimization_tpu.experiments.run import run_experiment

    seen = {}
    orig = run_mod._apply_spad_noise

    def spy(gt, spec, workdir, key, num_photons, log):
        noisy = orig(gt, spec, workdir, key, num_photons, log)
        seen["ideal"] = np.asarray(gt).copy()
        seen["noisy"] = np.asarray(noisy).copy()
        return noisy

    run_mod._apply_spad_noise = spy
    try:
        state, history = run_experiment(
            "noise", str(tmp_path / "noise"), max_iters=2,
            scan_resolution=8, sample_num=300, gt_sample_num=2000,
            spad_photons=800,
        )
    finally:
        run_mod._apply_spad_noise = orig

    assert "noisy" in seen, "noise scene did not inject SPAD noise"
    ideal, noisy = seen["ideal"], seen["noisy"]
    assert ideal.shape == noisy.shape
    rel = np.abs(noisy - ideal).sum() / max(ideal.sum(), 1e-30)
    assert rel > 0.01, "SPAD injection left the transients unchanged"
    # energy rescale keeps per-scan-point totals in the ideal ballpark
    tot_i = ideal.sum(axis=1)
    tot_n = noisy.sum(axis=1)
    live = tot_i > 0
    assert np.all(tot_n[live] / tot_i[live] < 20.0)
    assert len(history["l2"]) == 2
    assert all(np.isfinite(history["l2"]))
