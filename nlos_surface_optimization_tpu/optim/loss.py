"""Loss evaluation and the intensity weighting function.

Reference: exp_bunny/rendering.py —
  create_weighting_function            (:208-217)
  evaluate_loss_with_normal_smoothness (:360-367)
  evaluate_loss_with_curvature         (:369-380)
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def create_weighting_function(data, gamma: float = 1.0):
    """w = (data/max(data) + 0.1)^gamma, normalized so sum(w) = L*B
    (rendering.py:208-217)."""
    eps = 0.1
    data = jnp.asarray(data)
    w = (data / jnp.max(data) + eps) ** gamma
    w = w / jnp.sum(w)
    return w * (data.shape[0] * data.shape[1])


def weighted_l2(gt_transient, weight, transient):
    """||sqrt(w) * (T - gt)||^2 / L (rendering.py:361-363)."""
    d = (jnp.asarray(transient) - jnp.asarray(gt_transient)) * jnp.sqrt(
        jnp.asarray(weight)
    )
    return jnp.sum(d * d) / d.shape[0]


def evaluate_loss_with_normal_smoothness(gt_transient, weight, transient,
                                         smoothing_val, smooth_weight
                                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(total, data_term): data L2 + smooth_weight * smoothing value
    (rendering.py:360-367)."""
    l1 = weighted_l2(gt_transient, weight, transient)
    return l1 + smooth_weight * smoothing_val, l1


def evaluate_loss_with_curvature(gt_transient, weight, transient, area_total,
                                 smooth_weight):
    """(total, data_term, total_area) (rendering.py:369-380)."""
    l1 = weighted_l2(gt_transient, weight, transient)
    return l1 + smooth_weight * area_total, l1, area_total


def smooth_grad(v, grid_shape: Tuple[int, int], weight: float = 1.0):
    """Legacy height-field smoothness gradient [V,3] (z only).

    For vertices laid out on a grid_shape grid, the energy is the squared
    second difference of z along x and y; this returns its gradient,
    re-deriving rendering.py:320-343 (smooth_grad) as jnp stencils."""
    s = jnp.asarray(v)[:, 2].reshape(grid_shape)
    H, W = grid_shape
    dx = 2 * s[:, 1:-1] - s[:, :-2] - s[:, 2:]           # [H, W-2]
    gx = jnp.zeros_like(s)
    gx = gx.at[:, :-2].add(-dx)
    gx = gx.at[:, 1:-1].add(2 * dx)
    gx = gx.at[:, 2:].add(-dx)
    dy = 2 * s[1:-1, :] - s[:-2, :] - s[2:, :]           # [H-2, W]
    gy = jnp.zeros_like(s)
    gy = gy.at[:-2, :].add(-dy)
    gy = gy.at[1:-1, :].add(2 * dy)
    gy = gy.at[2:, :].add(-dy)
    gz = (gx + gy).reshape(-1) * weight
    return jnp.zeros((gz.shape[0], 3), gz.dtype).at[:, 2].set(gz)


def smooth_grad_first_order(v, grid_shape: Tuple[int, int],
                            weight: float = 1.0):
    """First-difference variant (rendering.py:345-356, smooth_grad_smooth)."""
    s = jnp.asarray(v)[:, 2].reshape(grid_shape)
    dx = s[:, 1:] - s[:, :-1]
    gx = jnp.zeros_like(s)
    gx = gx.at[:, :-1].add(-dx)
    gx = gx.at[:, 1:].add(dx)
    dy = s[1:, :] - s[:-1, :]
    gy = jnp.zeros_like(s)
    gy = gy.at[:-1, :].add(-dy)
    gy = gy.at[1:, :].add(dy)
    gz = (gx + gy).reshape(-1) * weight
    return jnp.zeros((gz.shape[0], 3), gz.dtype).at[:, 2].set(gz)
