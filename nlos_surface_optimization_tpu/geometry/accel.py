"""Morton face ordering + Möller–Trumbore-as-matmul coefficients.

Two pieces of the visibility fast path:

  * morton_order_faces — spatially-compact face tiles are what make the
    Pallas occlusion kernels' broad phases effective (candidate lists
    stay short); called host-side between optimizer steps.
  * mt_coefficients — the MXU narrow phase: MT's (det, u, v, t)
    numerators are bilinear in per-ray and per-face data, so a whole
    (ray-block x face-tile) cast is ONE systolic-array matmul
    (geometry.intersect.segment_occluded_mxu).

A two-level cluster-culled narrow phase (capsule-vs-sphere broad phase
feeding dense per-cluster MT) lived here through round 3; it measured
slower than the Pallas candidate-list kernels at every face count
(SCALING_r03.json) and was removed — see the pallas/fused kernels in
render/ for the winning design.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _morton3(x: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleave 3x bits-bit integers -> Morton codes."""
    def part(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    q = np.clip((x * (2 ** bits - 1)).astype(np.int64), 0, 2 ** bits - 1)
    return (part(q[:, 0]) | (part(q[:, 1]) << np.uint64(1))
            | (part(q[:, 2]) << np.uint64(2)))


def morton_order_faces(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    """Faces reordered by centroid Morton code (host-side, between steps).

    Spatially-compact face tiles are what make the Pallas occlusion
    kernel's broad phase effective: raster-ordered height-field tiles
    span the whole mesh and every tile is a candidate for every ray
    block (measured 100% pass rate); Morton-ordered tiles are ~patch-
    shaped and most blocks keep only a handful of candidates.  The
    renderer's MC estimate changes (sampling keys are per face slot) but
    its expectation does not.
    """
    v = np.asarray(v)
    f = np.asarray(f)
    if f.shape[0] < 2:
        return f
    cent = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3.0
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-12)
    codes = _morton3((cent - lo) / span)
    return f[np.argsort(codes, kind="stable")]


def mt_coefficients(soup):
    """Möller–Trumbore as an MXU matmul: per-face coefficient matrix.

    MT's quantities are bilinear in per-ray and per-face data:
        det   = d · (e2 x e1)
        u_num = (o x d) · e2  -  d · (e2 x p1)
        v_num = -(o x d) · e1 +  d · (e1 x p1)
        t_num = o · (e1 x e2) -  p1 · (e1 x e2)
    so with the per-ray feature vector phi = [d, o x d, o, 1] (10) and a
    per-face 10x4 block, ALL of (det, u_num, v_num, t_num) for a
    (ray-block x face-tile) come from ONE matmul phi @ B — the systolic
    array does the ray casting; only the sign tests stay on the VPU.
    The sign tests avoid the divides: u >= 0 <=> u_num*det >= 0, etc.

    soup: [..., CS, 10] (p1|e1|e2|valid) -> B [..., 10, 4*CS] plus the
    valid plane [..., CS]."""
    p1 = soup[..., 0:3]
    e1 = soup[..., 3:6]
    e2 = soup[..., 6:9]
    val = soup[..., 9]
    n2 = jnp.cross(e2, e1)          # det row block (d)
    m1 = jnp.cross(e2, p1)
    k1 = jnp.cross(e1, p1)
    n12 = -n2                       # e1 x e2
    zeros = jnp.zeros_like(p1)
    zcol = jnp.zeros_like(val)
    # B rows: [d(3), oxd(3), o(3), 1] ; columns 4 per face
    b_det = jnp.concatenate([n2, zeros, zeros, zcol[..., None]], axis=-1)
    b_u = jnp.concatenate([-m1, e2, zeros, zcol[..., None]], axis=-1)
    b_v = jnp.concatenate([k1, -e1, zeros, zcol[..., None]], axis=-1)
    b_t = jnp.concatenate(
        [zeros, zeros, n12, -jnp.sum(p1 * n12, -1, keepdims=True)], axis=-1
    )
    B = jnp.stack([b_det, b_u, b_v, b_t], axis=-2)  # [..., CS, 4, 10]
    CS = soup.shape[-2]
    B = jnp.swapaxes(B.reshape(B.shape[:-3] + (CS * 4, 10)), -1, -2)
    return B, val                                    # [..., 10, CS*4]
