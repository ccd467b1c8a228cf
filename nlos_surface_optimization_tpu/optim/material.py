"""Material (scalar albedo / GGX roughness) estimation.

Reference: exp_ggx/optimize_parameters.py —
  initial_fitting_albedo  (:46-48)  closed-form projection sum(gt*T)/||T||^2
  optimize_albedo         (:14-44)  Adam on the scalar albedo, plateau stop
  optimize_alpha          (:50-78)  Adam on GGX roughness, plateau stop
Alternating these with optimize_shape (:80+) gives joint shape+material
recovery (driven by the outer loop in practice).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..geometry.mesh import Mesh, make_mesh
from ..render import (
    inverse_render_albedo,
    inverse_render_alpha,
    render_transient,
)
from .loss import weighted_l2


def _with_albedo(mesh: Mesh, albedo: float) -> Mesh:
    return mesh._replace(albedo=jnp.full_like(mesh.albedo, albedo))


def initial_fitting_albedo(mesh: Mesh, gt_transient, lighting,
                           lighting_normal, cfg: RenderConfig, key) -> float:
    """Closed-form albedo by projection: sum(gt*T)/||T||^2 for T rendered at
    albedo=1 (optimize_parameters.py:46-48)."""
    t, _ = render_transient(_with_albedo(mesh, 1.0), lighting,
                            lighting_normal, cfg, key, refine=1)
    t = np.asarray(t)
    return float(np.sum(np.asarray(gt_transient) * t)
                 / max(np.linalg.norm(t) ** 2, 1e-300))


def _scalar_adam_loop(value0: float, grad_fn: Callable[[float, int], Tuple[float, float]],
                      lr: float, T: int, loss_epsilon: float,
                      log=print) -> Tuple[float, list]:
    """Plain Adam on one scalar with the reference's plateau break
    (optimize_parameters.py:32-40)."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    m = v = 0.0
    x = float(value0)
    losses = []
    for t in range(T):
        loss, g = grad_fn(x, t)
        losses.append(loss)
        if t > 2 and (losses[-2] - loss) / max(losses[-2], 1e-300) < loss_epsilon:
            break
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (t + 1))
        vh = v / (1 - b2 ** (t + 1))
        x = x - lr * mh / (np.sqrt(vh) + eps)
        log(f"{t:05d} loss {loss:.8f} value {x:.6f}")
    return x, losses


def optimize_albedo(mesh: Mesh, gt_transient, weight, lighting,
                    lighting_normal, cfg: RenderConfig, key,
                    albedo0: float, lr: float = 1e-2, T: int = 50,
                    loss_epsilon: float = 1e-4, log=print):
    """Scalar albedo descent (optimize_parameters.py:14-44)."""
    gt = np.asarray(gt_transient)
    w = np.asarray(weight)

    def grad_fn(a, t):
        m = _with_albedo(mesh, a)
        transient, g = inverse_render_albedo(
            m, gt, w, lighting, lighting_normal, cfg,
            jax.random.fold_in(key, t),
        )
        loss = float(weighted_l2(gt, w, np.asarray(transient)))
        return loss, float(g)

    return _scalar_adam_loop(albedo0, grad_fn, lr, T, loss_epsilon, log)


def optimize_alpha(mesh: Mesh, gt_transient, weight, lighting,
                   lighting_normal, cfg: RenderConfig, key,
                   alpha0: float, lr: float = 5e-3, T: int = 50,
                   loss_epsilon: float = 1e-4, log=print):
    """GGX roughness descent (optimize_parameters.py:50-78); cfg must have
    brdf='ggx'."""
    assert cfg.brdf == "ggx"
    gt = np.asarray(gt_transient)
    w = np.asarray(weight)

    def grad_fn(a, t):
        transient, g = inverse_render_alpha(
            mesh, gt, w, lighting, lighting_normal, cfg,
            jax.random.fold_in(key, t), jnp.asarray(a, mesh.v.dtype),
        )
        loss = float(weighted_l2(gt, w, np.asarray(transient)))
        return loss, float(g)

    return _scalar_adam_loop(alpha0, grad_fn, lr, T, loss_epsilon, log)


def optimize_shape(mesh: Mesh, gt_transient, weight, lighting,
                   lighting_normal, cfg: RenderConfig, key,
                   lr: float = 1e-4 / 3, T: int = 50,
                   loss_epsilon: float = 1e-4, smooth_ratio: float = 100.0,
                   edge_lr_ratio: float = 0.1, alpha=None, log=print):
    """Fixed-topology shape descent with Adam_Modified + normal smoothing
    and the plateau break — the shape leg of the alternating GGX material
    pipeline (optimize_parameters.py:80-147: inverseRendering +
    renderStreamedNormalSmoothing + auto smooth_weight at t=0 + border
    lr group + two-consecutive-plateau return).

    Returns (mesh, plateaued, original_l2, losses)."""
    from ..geometry.topology import border_vertices, face_affinity
    from ..render import inverse_render, normal_smoothing
    from .adam_modified import adam_modified
    from .loss import evaluate_loss_with_normal_smoothness

    gt = np.asarray(gt_transient)
    w = np.asarray(weight)
    f = np.asarray(mesh.f)
    affinity = jnp.asarray(face_affinity(f))
    border = border_vertices(f, int(mesh.v.shape[0]))
    lr_scale = jnp.asarray(
        np.where(border == 1, edge_lr_ratio, 1.0) * lr
    )
    opt_init, opt_update = adam_modified(lr=1.0)
    opt_state = opt_init(mesh.v)

    smooth_weight = None
    losses, losses_o = [], []
    original_l2 = float("nan")
    for t in range(T):
        k = jax.random.fold_in(key, t)
        transient, grad, _ = inverse_render(
            mesh, gt, w, lighting, lighting_normal, cfg, k, alpha=alpha
        )
        sval, sgrad = normal_smoothing(mesh.v, mesh.f, mesh.f_valid, affinity)
        sval = float(sval)
        if smooth_weight is None:
            l2_0 = float(weighted_l2(gt, w, np.asarray(transient)))
            smooth_weight = l2_0 / max(sval, 1e-300) / smooth_ratio
            log(f"smoothness weight {smooth_weight:f}")
        l2, original_l2 = evaluate_loss_with_normal_smoothness(
            gt, w, np.asarray(transient), sval, smooth_weight
        )
        l2, original_l2 = float(l2), float(original_l2)
        losses.append(l2)
        losses_o.append(original_l2)
        log(f"{t:05d} L2 {l2:.8f} old_l2 {original_l2:.8f}")
        if t > 2:
            if (losses_o[-2] - original_l2) / max(losses_o[-2], 1e-300) \
                    < loss_epsilon:
                return mesh, True, original_l2, losses
            if (losses[-2] - l2) / max(losses[-2], 1e-300) < loss_epsilon:
                return mesh, True, original_l2, losses
        g = grad + smooth_weight * sgrad
        updates, opt_state = opt_update(g, opt_state, lr_scale=lr_scale)
        mesh = mesh._replace(v=mesh.v + updates)
    return mesh, False, original_l2, losses
