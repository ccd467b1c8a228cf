"""Stratified area sampling on triangles with counter-based RNG.

The reference draws two uniforms (S, T) per sample from a per-thread SFMT
generator and maps them to barycentric coordinates
    sqrtT = sqrt(T); u = 1-sqrtT; v = (1-S)*sqrtT; w = S*sqrtT
(transient_and_gradient.cpp:184-191, mesh_processing.py:97-108).

We use threefry keys split per (source, face) so results are independent of
device count and chunking: the same (key, source, face, sample-slot) always
yields the same draw.  Because barycentric draws do not depend on vertex
positions, re-running with the same key is exactly the reference's
"frozen sampling" mode used for finite-difference gradient checks
(check_matlab/check_mesh_sampling_grad.m).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniforms_for(key: jax.Array, num_sources: int, num_faces: int, spt: int,
                 source_offset: int | jax.Array = 0):
    """Per-(source, face, sample) uniforms S,T of shape [L, F, spt].

    Counter-based: fold source and face ids into the key so the draw for a
    given (global source index, face, slot) is chunk- and shard-invariant.
    """
    def per_source(s):
        ks = jax.random.fold_in(key, s + source_offset)
        u = jax.random.uniform(ks, (num_faces, spt, 2), dtype=jnp.float32)
        return u

    u = jax.vmap(per_source)(jnp.arange(num_sources))
    return u[..., 0], u[..., 1]  # S, T


def barycoords_from_uniforms(S: jax.Array, T: jax.Array):
    """Map uniforms to barycentric coords (u,v,w) — same mapping as the
    reference (transient_and_gradient.cpp:187-190)."""
    sqrtT = jnp.sqrt(T)
    u = 1.0 - sqrtT
    v = (1.0 - S) * sqrtT
    w = S * sqrtT
    return jnp.stack([u, v, w], axis=-1)


def stratified_barycoords(key: jax.Array, num_sources: int, num_faces: int,
                          spt: int, source_offset: int | jax.Array = 0):
    """Barycoords [L, F, spt, 3]."""
    S, T = uniforms_for(key, num_sources, num_faces, spt, source_offset)
    return barycoords_from_uniforms(S, T)


def barycentric_to_world(v: jax.Array, f: jax.Array, fid: jax.Array,
                         bary_uv: jax.Array) -> jax.Array:
    """World point from (face id, embree-style (u=v2 weight, v=v3 weight)).

    Mirrors embree_intersector's barycentric_to_world
    (c_embree_intersector.cpp:94-105): p = (1-u-v)*v1 + u*v2 + v*v3.
    """
    tri = v[f[fid]]
    u = bary_uv[..., 0]
    v_ = bary_uv[..., 1]
    w0 = (1.0 - u - v_)[..., None]
    return w0 * tri[..., 0, :] + u[..., None] * tri[..., 1, :] + v_[..., None] * tri[..., 2, :]
