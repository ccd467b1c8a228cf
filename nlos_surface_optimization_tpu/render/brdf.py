"""Confocal GGX (Trowbridge-Reitz) microfacet BRDF and its derivatives.

TPU re-derivation of the reference's Mitsuba-based confocal GGX
(ggx/ggx_confocal.cpp):
  eval        = D * G1^2 / 4            (:13-27)
  D           = 1 / (pi a^2 ((1+(1-c^2)/(a^2 c^2)) c^2)^2)     (:29-49)
  G1          = 2 / (c + sqrt(a^2 + (1-a^2) c^2))              (:56-70)
plus closed-form derivatives w.r.t. alpha (eval_adiff, :74-136) and w.r.t.
cos = dot(n, w) split into d/dn and d/dw directions (eval_nwdiff, :138-166).

All functions are branch-free jnp versions (guards via jnp.where) operating
on c = dot(normal, w); the caller supplies c (possibly from an unnormalized
interpolated normal, matching the reference's vn mode).
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = jnp.pi


def _D(alpha, c):
    c2 = c * c
    a2 = alpha * alpha
    beck = (1.0 - c2) / jnp.maximum(a2 * c2, 1e-30)
    root = (1.0 + beck) * c2
    d = 1.0 / jnp.maximum(_PI * a2 * root * root, 1e-30)
    d = jnp.where(d * c < 1e-20, 0.0, d)  # ggx_confocal.cpp:44-46
    return jnp.where(c > 0, d, 0.0)


def _G1(alpha, c):
    root = alpha * alpha + (1.0 - alpha * alpha) * c * c
    g = 2.0 / jnp.maximum(c + jnp.sqrt(jnp.maximum(root, 0.0)), 1e-30)
    g = jnp.where((c >= 1.0) | (c <= -1.0), 1.0, g)
    return jnp.where(c > 0, g, 0.0)


def eval_scalar(alpha, c):
    """BRDF value given c = dot(normal, w).  D*G1^2/4, 0 if c<=0."""
    d = _D(alpha, c)
    g1 = _G1(alpha, c)
    val = d * g1 * g1 / 4.0
    return jnp.where((c > 0) & (d > 0), val, 0.0)


def _D_adiff(alpha, c):
    c2 = c * c
    a2 = alpha * alpha
    val = a2 * c2 - c2 + 1.0
    out = -(2.0 * alpha * (a2 * c2 + c2 - 1.0)) / jnp.maximum(
        _PI * val * val * val, 1e-30
    )
    return jnp.where(c > 0, out, 0.0)


def _G1_adiff(alpha, c):
    c2 = c * c
    val = jnp.sqrt(jnp.maximum(alpha * alpha - c2 * (alpha * alpha - 1.0), 1e-30))
    root = c + val
    out = 2.0 * alpha * (c2 - 1.0) / jnp.maximum(val * root * root, 1e-30)
    out = jnp.where((c >= 1.0) | (c <= -1.0), 0.0, out)
    return jnp.where(c > 0, out, 0.0)


def eval_adiff(alpha, c):
    """d(eval)/d(alpha)."""
    d = _D(alpha, c)
    g1 = _G1(alpha, c)
    g = g1 * g1
    dprime = _D_adiff(alpha, c)
    gprime = 2.0 * _G1_adiff(alpha, c) * g1
    out = (dprime * g + gprime * d) / 4.0
    return jnp.where((c > 0) & (d > 0), out, 0.0)


def _D_ndiff(alpha, c):
    c2 = c * c
    a2 = alpha * alpha
    root = (a2 - 1.0) * c2 + 1.0
    out = -(4.0 * a2 * c * (a2 - 1.0)) / jnp.maximum(
        _PI * root * root * root, 1e-30
    )
    return jnp.where(c > 0, out, 0.0)


def _G1_ndiff(alpha, c):
    c2 = c * c
    a2 = alpha * alpha
    temp = jnp.sqrt(jnp.maximum(a2 - c2 * (a2 - 1.0), 1e-30))
    root = c + temp
    out = -2.0 * (1.0 - (c * (a2 - 1.0)) / temp) / jnp.maximum(root * root, 1e-30)
    out = jnp.where((c >= 1.0) | (c <= -1.0), 0.0, out)
    return jnp.where(c > 0, out, 0.0)


def eval_cdiff(alpha, c):
    """Scalar d(eval)/dc with c = dot(n, w).

    The reference's eval_nwdiff returns (Dscale*w, Dscale*n) where Dscale is
    exactly this scalar (ggx_confocal.cpp:138-166); the caller forms the
    vector derivatives dn = Dscale*w and dw = Dscale*n."""
    d = _D(alpha, c)
    g1 = _G1(alpha, c)
    g = g1 * g1
    gprime = 2.0 * _G1_ndiff(alpha, c) * g1
    dprime = _D_ndiff(alpha, c)
    out = (dprime * g + gprime * d) / 4.0
    return jnp.where((c > 0) & (d > 0), out, 0.0)
