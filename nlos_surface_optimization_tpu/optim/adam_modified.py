"""Adam_Modified: Adam with a per-vertex isotropic denominator.

The reference replaces Adam's elementwise denominator sqrt(v_t)+eps by its
mean over each vertex's xyz row, so a vertex moves isotropically instead of
axis-by-axis (exp_bunny/adam_modified.py:99-107, key line :102
``new_denom = torch.mean(denom, dim=1, keepdim=True)``).  Bias correction is
folded into the step size as lr*sqrt(1-b2^t)/(1-b1^t) exactly as there
(:104-106) — note the second moment is NOT bias-corrected before the sqrt.

The reference's two param groups (interior vs border vertices with
lr and lr*edge_lr_ratio, exp_bunny/test.py:104) are expressed here as a
per-vertex ``lr_scale`` array, which also keeps the whole update one fused
jit computation instead of two optimizer instances.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class AdamModifiedState(NamedTuple):
    step: jax.Array   # scalar int32
    m: jax.Array      # [V,3] first moment
    v: jax.Array      # [V,3] second moment


def adam_modified(lr: float, b1: float = 0.9, b2: float = 0.999,
                  eps: float = 1e-8):
    """(init_fn, update_fn) pair in the optax GradientTransformation shape.

    update_fn(grads, state, lr_scale=None) -> (updates, state):
    ``lr_scale`` is an optional [V] or [V,1] per-vertex multiplier
    (1 for interior, edge_lr_ratio for border vertices)."""

    def init_fn(params: jax.Array) -> AdamModifiedState:
        return AdamModifiedState(
            step=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(params),
            v=jnp.zeros_like(params),
        )

    def update_fn(grads: jax.Array, state: AdamModifiedState,
                  lr_scale: Optional[jax.Array] = None):
        step = state.step + 1
        m = b1 * state.m + (1.0 - b1) * grads
        v = b2 * state.v + (1.0 - b2) * grads * grads
        denom = jnp.sqrt(v) + eps
        new_denom = jnp.mean(denom, axis=1, keepdims=True)  # :102
        t = step.astype(grads.dtype)
        step_size = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        updates = -step_size * m / new_denom
        if lr_scale is not None:
            updates = updates * jnp.reshape(lr_scale, (-1, 1))
        return updates, AdamModifiedState(step=step, m=m, v=v)

    return init_fn, update_fn
