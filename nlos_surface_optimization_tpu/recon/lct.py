"""Confocal NLOS reconstruction by the light-cone transform (LCT).

JAX port of the reference's MATLAB cnlos.m (exp_bunny/cnlos.m:1-120), which
follows O'Toole et al., "Confocal non-line-of-sight imaging based on the
light-cone transform" (Nature 2018).  3-D FFT deconvolution is exactly the
kind of workload XLA maps well to TPU.

Pipeline (cnlos.m line refs):
  radiometric scale data * z^4          (:60-65)
  resample time axis t -> sqrt(t)       (resamplingOperator, :47, local fn)
  pad x2, FFT, multiply Wiener inverse PSF, IFFT, unpad   (:67-75)
  resample depth axis back, clamp >= 0  (:77-78)
  crop to ind = round(M*2*width/(range/2)), flip x        (:93-96)
  depth = argmax_z vol; albedo = max_z vol                (:99-101)
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def define_psf(N: int, M: int, slope: float) -> np.ndarray:
    """NLOS blur kernel (cnlos.m definePsf, :~122-135): the light-cone
    surface |(4*slope)^2*(x^2+y^2) - z| arg-min'd over z, normalized, and
    circularly shifted to the corner."""
    x = np.linspace(-1, 1, 2 * N)
    y = np.linspace(-1, 1, 2 * N)
    z = np.linspace(0, 2, 2 * M)
    gz, gy, gx = np.meshgrid(z, y, x, indexing="ij")
    psf = np.abs((4.0 * slope) ** 2 * (gx ** 2 + gy ** 2) - gz)
    psf = (psf == psf.min(axis=0, keepdims=True)).astype(np.float64)
    psf = psf / psf[:, N, N].sum()
    psf = psf / np.linalg.norm(psf.ravel())
    psf = np.roll(psf, (0, N, N), axis=(0, 1, 2))
    return psf


def resampling_operator(M: int) -> Tuple[np.ndarray, np.ndarray]:
    """(mtx, mtxi) [M,M]: t -> sqrt-resampled axis (cnlos.m
    resamplingOperator with K = kron(I, ones(1,M)) row-block sum)."""
    x = np.arange(1, M * M + 1)
    rows = (x - 1) // M
    cols = np.ceil(np.sqrt(x)).astype(int) - 1
    vals = 1.0 / np.sqrt(x)
    mtx = np.zeros((M, M))
    np.add.at(mtx, (rows, cols), vals)
    return mtx, mtx.T


class LCTResult(NamedTuple):
    x: jnp.ndarray        # [N,N] lateral grid
    y: jnp.ndarray        # [N,N]
    depth: jnp.ndarray    # [N,N] argmax depth (meters from wall)
    albedo: jnp.ndarray   # [N,N] max projection
    vol: jnp.ndarray      # [Mc,N,N] cropped reconstruction volume


@partial(jax.jit, static_argnames=("N", "M", "isdiffuse", "isbackprop"))
def _lct_core(data, psf, mtx, mtxi, snr, N: int, M: int, isdiffuse: bool,
              isbackprop: bool):
    fpsf = jnp.fft.fftn(psf)
    if isbackprop:
        invpsf = jnp.conj(fpsf)
    else:
        invpsf = jnp.conj(fpsf) / (jnp.abs(fpsf) ** 2 + 1.0 / snr)

    grid_z = jnp.linspace(0.0, 1.0, M)[:, None, None]
    data = data * (grid_z ** (4 if isdiffuse else 2))

    tdata = jnp.zeros((2 * M, 2 * N, 2 * N), data.dtype)
    resampled = (mtx @ data.reshape(M, -1)).reshape(M, N, N)
    tdata = tdata.at[:M, :N, :N].set(resampled)

    tvol = jnp.fft.ifftn(jnp.fft.fftn(tdata) * invpsf)
    tvol = tvol[:M, :N, :N]

    vol = (mtxi @ tvol.reshape(M, -1).real).reshape(M, N, N)
    return jnp.maximum(vol, 0.0)


def lct_reconstruct(transient, width: float,
                    bin_resolution_m: float = 1.2e-3,
                    snr: float = 0.8, isdiffuse: bool = True,
                    isbackprop: bool = False, z_offset: int = 0) -> LCTResult:
    """LCT reconstruction of a confocal transient [L=N^2, M].

    `width` is the scan half-width ((max_x - min_x)/2, cnlos.m:31);
    `bin_resolution_m` the path-length bin width in meters (the MATLAB code
    works in seconds with bin*c — equivalent)."""
    transient = jnp.asarray(transient)
    L, M = transient.shape
    N = int(math.isqrt(L))
    assert N * N == L, "confocal scan must be square"
    rng = M * bin_resolution_m  # 'range' in cnlos.m (path length, meters)

    psf = jnp.asarray(define_psf(N, M, width / rng))
    mtx, mtxi = resampling_operator(M)

    # permute(reshape(t, N,N,M), [3 2 1]): data[m, col, row] with row-major
    # scan rows = y (meshgrid row-major, config.make_confocal_scan)
    rect = transient.reshape(N, N, M)
    data = jnp.transpose(rect, (2, 1, 0))

    vol = _lct_core(data, psf, jnp.asarray(mtx), jnp.asarray(mtxi),
                    snr, N, M, isdiffuse, isbackprop)

    tic_z = jnp.linspace(0.0, rng / 2.0, M)
    tic_xy = jnp.linspace(-width, width, N)

    # crop + flip (cnlos.m:93-96)
    ind = int(round(M * 2.0 * width / (rng / 2.0)))
    vol = vol[:, :, ::-1]
    hi = min(ind + z_offset, vol.shape[0])
    vol_c = vol[z_offset:hi]
    tic_z = tic_z[z_offset:hi]

    imax = jnp.argmax(vol_c, axis=0)
    depth = tic_z[imax]
    albedo = jnp.max(vol_c, axis=0)
    gx, gy = jnp.meshgrid(tic_xy, tic_xy)
    return LCTResult(x=gx, y=gy, depth=depth, albedo=albedo, vol=vol_c)


def _grid_faces(mask: np.ndarray) -> np.ndarray:
    """Triangulate masked grid cells (gptoolbox create_face equivalent):
    two triangles per quad whose 4 corners are all masked, indices into the
    compacted masked-vertex array."""
    H, W = mask.shape
    remap = -np.ones(H * W, np.int64)
    remap[np.flatnonzero(mask.ravel())] = np.arange(int(mask.sum()))
    faces = []
    for i in range(H - 1):
        for j in range(W - 1):
            a, b = i * W + j, i * W + j + 1
            c, d = (i + 1) * W + j, (i + 1) * W + j + 1
            if mask.ravel()[[a, b, c, d]].all():
                faces.append([remap[a], remap[c], remap[b]])
                faces.append([remap[c], remap[d], remap[b]])
    return np.asarray(faces, np.int32).reshape(-1, 3)


def init_mesh_from_lct(res: LCTResult, threshold: float = 0.8e-3
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Threshold the albedo map and triangulate the masked height field
    (compute_init_mesh.m:13-22; vertices are [-x, y, depth] there)."""
    albedo = np.asarray(res.albedo)
    mask = albedo > threshold
    v_all = np.stack(
        [-np.asarray(res.x).ravel(), np.asarray(res.y).ravel(),
         np.asarray(res.depth).ravel()], axis=1
    )
    v = v_all[mask.ravel()].astype(np.float32)
    f = _grid_faces(mask)
    # Orient normals toward the wall (-z), the renderer's convention —
    # the reference flips its Delaunay winding for the same reason
    # (rendering.py:105).  A backwards init renders a ~zero transient
    # (all faces backfacing) and the optimization cannot start.
    if f.shape[0]:
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        if n[:, 2].sum() > 0:
            f = f[:, ::-1].copy()
    return v, f
