"""Non-confocal angular-sampling transient renderer (differentiable).

JAX re-design of the reference's prototype generation
(transient_rendering_python/rendering_grad.py:16-126, rendering.py:8-93):
separate light and sensor positions, uniform hemisphere direction sampling
from the light, nearest-hit surface point, explicit shadow ray to the
sensor, binning by total path length d1+d2 with intensity cos(theta2)/d2^2
and the 2*pi/N solid-angle estimator.

Differentiable w.r.t. mesh vertices via jax.grad: nearest-hit face indices
are found non-differentiably, then (t, u, v) are re-solved on the selected
face with Moller-Trumbore algebra so gradients flow through the hit point
(the same detached-sampling pattern as the prototype's autograd path).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..geometry.intersect import nearest_hit, segment_occluded
from ..geometry.mesh import Mesh


def hemisphere_directions(key, n: int, normal) -> jax.Array:
    """n directions uniform over the hemisphere around `normal`
    (test_autograd.py:61-70: phi ~ U(0, 2pi), theta = acos(u))."""
    k1, k2 = jax.random.split(key)
    phi = jax.random.uniform(k1, (n,)) * 2.0 * jnp.pi
    cos_t = jax.random.uniform(k2, (n,))
    sin_t = jnp.sqrt(1.0 - cos_t * cos_t)
    local = jnp.stack(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=1
    )
    # rotate +z to `normal` (rotation_matrix.py R_2vect role)
    z = jnp.asarray([0.0, 0.0, 1.0], local.dtype)
    n_ = normal / jnp.linalg.norm(normal)
    v = jnp.cross(z, n_)
    c = jnp.dot(z, n_)
    s = jnp.linalg.norm(v)
    eye = jnp.eye(3, dtype=local.dtype)

    def general():
        vx = jnp.array([[0.0, -v[2], v[1]],
                        [v[2], 0.0, -v[0]],
                        [-v[1], v[0], 0.0]], local.dtype)
        return eye + vx + vx @ vx * ((1.0 - c) / jnp.maximum(s * s, 1e-30))

    R = jnp.where(s < 1e-12, jnp.where(c > 0, eye, -eye), general())
    return local @ R.T


def _solve_hit(v, f, fid, o, d):
    """Differentiable (t, u, w) on the SELECTED face per ray."""
    tri = v[f[jnp.maximum(fid, 0)]]           # [R,3,3]
    p1 = tri[:, 0]
    e1 = tri[:, 1] - p1
    e2 = tri[:, 2] - p1
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-14, det, 1.0)
    tvec = o - p1
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    w = jnp.sum(d * qvec, axis=-1) * inv
    t = jnp.sum(e2 * qvec, axis=-1) * inv
    return t, u, w, p1, e1, e2


@partial(jax.jit, static_argnames=("cfg",))
def angular_transient(mesh: Mesh, directions, lighting, sensor,
                      sensor_normal, cfg: RenderConfig) -> jax.Array:
    """Transient [B] for one (light, sensor) pair over N sampled directions
    (rendering_grad.py:16-126 semantics)."""
    N = directions.shape[0]
    o = jnp.broadcast_to(lighting[None, :], directions.shape)

    fid, _, _, _ = nearest_hit(o, directions, mesh.v, mesh.f, mesh.f_valid)
    hit = fid >= 0
    t, u, w, p1, e1, e2 = _solve_hit(mesh.v, mesh.f, fid, o, directions)
    d1 = jnp.abs(t)
    p = o + directions * t[:, None]

    v2 = sensor[None, :] - p
    d2 = jnp.linalg.norm(v2, axis=-1)
    d2s = jnp.maximum(d2, 1e-12)
    v2u = v2 / d2s[:, None]

    # shadow ray: sensor -> p must be unobstructed except the target face
    occ = segment_occluded(
        jnp.broadcast_to(sensor[None, :], p.shape), -v2u, d2s,
        fid, mesh.v, mesh.f, mesh.f_valid,
        t_rel=cfg.occl_t_rel, t_min=cfg.occl_t_min,
    )

    fn = jnp.cross(e1, e2)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-30)
    cos2 = jnp.maximum(jnp.sum(fn * v2u, axis=-1), 0.0)

    bins = jnp.ceil((d1 + d2) / cfg.distance_resolution).astype(jnp.int32) - 1
    ok = hit & ~occ & (bins >= 0) & (bins < cfg.num_bins)
    intensity = jnp.where(ok, cos2 / (d2s * d2s), 0.0)
    bins = jnp.clip(bins, 0, cfg.num_bins - 1)

    out = jax.ops.segment_sum(intensity, bins, num_segments=cfg.num_bins)
    return out * (2.0 * jnp.pi / N)


def render_nonconfocal(mesh: Mesh, lighting, sensors, lighting_normal,
                       sensor_normal, cfg: RenderConfig, key,
                       num_dirs: Optional[int] = None) -> jax.Array:
    """Transients [L, B] for L (light, sensor) pairs."""
    n = num_dirs or cfg.num_samples
    lighting = jnp.asarray(lighting)
    sensors = jnp.asarray(sensors)
    lighting_normal = jnp.asarray(lighting_normal)
    sensor_normal = jnp.asarray(sensor_normal)

    def one(i):
        k = jax.random.fold_in(key, i)
        dirs = hemisphere_directions(k, n, lighting_normal[i])
        return angular_transient(mesh, dirs, lighting[i], sensors[i],
                                 sensor_normal[i], cfg)

    return jax.lax.map(one, jnp.arange(lighting.shape[0]))
