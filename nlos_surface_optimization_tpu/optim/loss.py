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
