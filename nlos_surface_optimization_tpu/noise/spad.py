"""Photon-level SPAD simulation for robustness experiments.

JAX port of the reference's spadModel.m / spadModelScaled.m
(exp_noise/noise/spadModel.m:1-70; Hernandez et al., "A Computational Model
of a Single-Photon Avalanche Diode Sensor for Transient Imaging"):

  per photon pulse idx of M:
    t     ~ importance-sample from the ideal transient        (:33)
    t    += jitter drawn from the measured histogram          (:34, :41)
    detect iff (pile-up: t + idx*RR > tLast) & in range & PDP (:43)
    on detection: count; afterpulses at +HO with prob APP^n   (:45-57)
    tLast = t + HO(+...) + idx*RR                             (:59)
  background ~ Poisson(muNoise * M/sum(counts) * tEnd/len(jitters))  (:64-66)

`pileup=False` reproduces spadModelScaled.m (drops the dead-time gate,
spadModelScaled.m:44-45) — the variant actually used by addNoiseExample.m.
The per-photon chain is a lax.scan (sequential carry tLast), vmapped over
scan points.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class SpadParams(NamedTuple):
    num_photons: int = 20_000        # M (addNoiseExample.m: 2e4)
    pdp: float = 1.0                 # photon detection probability
    app: float = 0.01                # afterpulsing probability
    dt: float = 4e-12                # temporal resolution (s)
    t_hold_off: float = 1e-6         # hold-off (s)
    laser_freq: float = 8e7          # pulse frequency (Hz)
    mu_noise: float = 10_000.0       # ambient level (addNoiseExample.m:6)
    max_afterpulses: int = 3         # APP^n truncation (1e-6 tail)
    pileup: bool = True              # False = spadModelScaled semantics


@partial(jax.jit, static_argnames=("params", "num_bins"))
def _spad_one(key, transient_ideal, jitters_bins, jitter_probs,
              counts_total, params: SpadParams, num_bins: int):
    M = params.num_photons
    HO = int(round(params.t_hold_off / params.dt))
    RR = int(round((1.0 / params.laser_freq) / params.dt))

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = jnp.maximum(transient_ideal, 0.0)
    p = p / jnp.maximum(p.sum(), 1e-300)
    tvec = jax.random.choice(k1, num_bins, (M,), p=p) + 1  # 1-based bins
    jit = jax.random.choice(k2, jitters_bins, (M,), p=jitter_probs)
    u_det = jax.random.uniform(k3, (M,))
    u_ap = jax.random.uniform(k4, (M, params.max_afterpulses))

    def photon(tLast, inputs):
        idx, t0, j, ud, uap = inputs
        t_stamp = t0 + idx * RR
        t = t0 + j
        in_range = (t >= 1) & (t <= num_bins)
        gate = (t_stamp > tLast) if params.pileup else True
        detected = gate & in_range & (ud < params.pdp)

        hist = jnp.zeros(num_bins, jnp.float32)
        hist = jnp.where(
            detected,
            hist.at[jnp.clip(t - 1, 0, num_bins - 1)].add(1.0),
            hist,
        )
        t_after = t + HO
        n_extra = jnp.int32(0)
        alive = detected
        for n in range(1, params.max_afterpulses + 1):
            fire = alive & (t_after <= num_bins) & (
                uap[n - 1] < params.app ** n
            )
            hist = jnp.where(
                fire,
                hist.at[jnp.clip(t_after - 1, 0, num_bins - 1)].add(1.0),
                hist,
            )
            t_after = jnp.where(fire, t_after + HO, t_after)
            n_extra = n_extra + jnp.where(fire, 1, 0)
            alive = fire
        new_tLast = jnp.where(detected, t_after + idx * RR, tLast)
        return new_tLast, hist

    idxs = jnp.arange(M)
    _, hists = jax.lax.scan(
        photon, jnp.int64(0) if jax.config.jax_enable_x64 else jnp.int32(0),
        (idxs, tvec, jit, u_det, u_ap),
    )
    counts = hists.sum(axis=0)

    # background: muNoise * M / sum(jitterCounts) * tEnd / len(jittersAll)
    # (spadModel.m:64-66; counts_total is the RAW counts sum)
    mu_back = (params.mu_noise * M / jnp.maximum(counts_total, 1e-300)
               * num_bins / jitters_bins.shape[0])
    background = jax.random.poisson(k5, mu_back, (num_bins,))
    return counts + background.astype(jnp.float32)


def spad_model(key, transient_ideal, jitters_s, jitter_counts,
               params: SpadParams = SpadParams()):
    """Noisy photon-count transient for ONE scan point [B].

    jitters_s: jitter sample values in SECONDS (jitter.mat t_1);
    jitter_counts: their histogram counts (counts_1)."""
    transient_ideal = jnp.asarray(transient_ideal)
    B = transient_ideal.shape[-1]
    jit_bins = jnp.round(jnp.asarray(jitters_s) / params.dt).astype(jnp.int32)
    probs = jnp.asarray(jitter_counts, jnp.float32)
    total = probs.sum()
    probs_n = probs / jnp.maximum(total, 1e-30)
    return _spad_one(key, transient_ideal, jit_bins, probs_n, total, params,
                     B)


def spad_noisy_transients(key, transients, jitters_s, jitter_counts,
                          params: SpadParams = SpadParams(),
                          rescale: bool = True,
                          source_chunk: int = 16):
    """Apply the SPAD model to every scan point [L,B]; with rescale=True the
    counts are scaled back to the ideal energy / M (addNoiseExample.m:22-24:
    spadModelScaled(...) / M * sum(transient)).

    Sources are processed in chunks of `source_chunk`: the per-photon
    intermediates are [M, B] per source (~1.5 GB per 16-source chunk at
    the exp_noise scale M=20000, B=1200) — a single vmap over a full
    4096-point scan would materialize ~400 GB.  One-time preprocessing,
    so the chunk loop runs on the host."""
    transients = jnp.asarray(transients)
    L, B = transients.shape
    keys = jax.random.split(key, L)
    chunks = []
    for s0 in range(0, L, source_chunk):
        s1 = min(s0 + source_chunk, L)
        part = jax.vmap(
            lambda k, t: spad_model(k, t, jitters_s, jitter_counts, params)
        )(keys[s0:s1], transients[s0:s1])
        chunks.append(np.asarray(part))
    out = jnp.asarray(np.concatenate(chunks, axis=0))
    if rescale:
        out = out / params.num_photons * transients.sum(axis=1, keepdims=True)
    return out
