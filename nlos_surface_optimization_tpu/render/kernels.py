"""Temporal kernels: Gaussian smoothing and measured SPAD jitter.

Reference semantics (transient_and_gradient.cpp:348-371):
  sigma   = resolution * sigma_bin / 2.355          (FWHM -> sigma)
  taps    = 4 * refine * sigma_bin + 1 sub-bins of width resolution/refine
  delta_i = (-2*refine*sigma_bin + i) * resolution / refine
  w_i     = exp(-(delta_i/sigma)^2/2) / (sigma*sqrt(2*pi)) * resolution/refine
The forward renders a fine histogram at resolution/refine, convolves with w
('same' alignment: output index i maps to y[i + 2*refine*sigma_bin] of the
full convolution), and sums each group of `refine` fine bins into a coarse
bin.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gaussian_kernel(resolution: float, refine: int, sigma_bin: int):
    """(weights [K], deltas [K]) as numpy f64 (host-side constants)."""
    K = 4 * refine * sigma_bin + 1
    sigma = resolution * sigma_bin / 2.355
    i = np.arange(K)
    deltas = (-2.0 * refine * sigma_bin + i) * resolution / refine
    norm = 1.0 / sigma / np.sqrt(2.0 * np.pi) * resolution / refine
    weights = np.exp(-((deltas / sigma) ** 2) / 2.0) * norm
    return weights, deltas


def grouped_gaussian_tables(resolution: float, refine: int, sigma_bin: int):
    """Phase-grouped tap tables (W, WD) of shape [refine, G].

    The K = 4*refine*sigma_bin+1 gradient kernel taps are spaced one FINE
    bin apart, so along the coarse-bin axis they cover only G = 4*sigma_bin+2
    consecutive bins.  For a sample whose fine-bin index is q (phase
    p = q mod refine), tap i lands on coarse bin
        b0 + floor((p + i)/refine),   b0 = floor((q - 2*refine*sigma_bin)/refine)
    so the 3K-gather tap loop of the reference's gradient kernel
    (transient_and_gradient.cpp:972-1001) collapses to G gathers with
        W[p, j]  = sum_i w_i        [floor((p+i)/refine) == j]
        WD[p, j] = sum_i w_i*delta_i[floor((p+i)/refine) == j].
    Exact (not approximate): same taps, same bins, grouped."""
    w, d = gaussian_kernel(resolution, refine, sigma_bin)
    K = w.shape[0]
    G = 4 * sigma_bin + 2
    W = np.zeros((refine, G))
    WD = np.zeros((refine, G))
    for p in range(refine):
        for i in range(K):
            j = (p + i) // refine
            W[p, j] += w[i]
            WD[p, j] += w[i] * d[i]
    return W, WD


def jitter_convolve(hist: jnp.ndarray, weight: jnp.ndarray,
                    offset: int) -> jnp.ndarray:
    """Measured-SPAD-jitter temporal smoothing of a coarse histogram.

    T[l, b] = sum_i weight[i] * hist[l, b + offset - i]: the reference's
    full convolution into numBins+K-1 scratch followed by a window at
    `offset` (jitter/transient_and_gradient.cpp:333-351)."""
    w = jnp.asarray(weight, dtype=hist.dtype)
    B = hist.shape[-1]
    full = jnp.vectorize(
        lambda x: jnp.convolve(x, w, mode="full"), signature="(n)->(m)"
    )(hist)
    return full[..., offset:offset + B]


def box_smooth_difference(diff: jnp.ndarray, width: int) -> jnp.ndarray:
    """Legacy loss smoothing: the difference convolved TWICE with a
    normalized box of 2*width+1 taps, 'same' alignment.

    The legacy renderer (stratified_transient_raytracer/
    stratifiedStreamedGradientRenderer.cpp:447-462) runs two MKL full
    convolutions and windows at `width` each time, which for an odd kernel
    is exactly a centered same-mode convolution applied twice (net effect:
    a triangular kernel of support 4*width+1)."""
    if width <= 0:
        return diff
    k = jnp.full((2 * width + 1,), 1.0 / (2 * width + 1), dtype=diff.dtype)
    same = jnp.vectorize(
        lambda x: jnp.convolve(x, k, mode="same"), signature="(n)->(n)"
    )
    return same(same(diff))


def smooth_and_coarsen(fine_hist: jnp.ndarray, resolution: float,
                       refine: int, sigma_bin: int) -> jnp.ndarray:
    """[L, B*refine] fine histogram -> [L, B] smoothed coarse transient.

    Matches transient_and_gradient.cpp:360-371 (centered convolution, then
    group-sum by refine)."""
    if refine == 1:
        return fine_hist
    w, _ = gaussian_kernel(resolution, refine, sigma_bin)
    w = jnp.asarray(w, dtype=fine_hist.dtype)
    L, Bf = fine_hist.shape
    # 'same' convolution: centered (kernel length K is odd).
    smoothed = jnp.vectorize(
        lambda x: jnp.convolve(x, w, mode="same"), signature="(n)->(n)"
    )(fine_hist)
    B = Bf // refine
    return smoothed.reshape(L, B, refine).sum(axis=-1)
