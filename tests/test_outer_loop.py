"""Outer-loop integration: remesher invariants + a short optimization run
that crosses a forced remesh and drives the loss down (the reference's
end-to-end regression pattern, SURVEY.md §4.3)."""

import numpy as np
import jax
import pytest

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.geometry.remesh import isotropic_remesh
from nlos_surface_optimization_tpu.optim.outer_loop import (
    InverseRenderingLoop,
    LoopConfig,
)
from nlos_surface_optimization_tpu.render import render_transient

KEY = jax.random.key(17)


def _grid_mesh(n, zfn, extent=0.28):
    xs = np.linspace(-extent, extent, n)
    gx, gy = np.meshgrid(xs, xs)
    z = zfn(gx, gy)
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + n, a + n + 1, a + 1])
    return v, np.array(faces, np.int32)


def test_remesh_edge_lengths_and_manifoldness(bumpy_mesh):
    v, f = bumpy_mesh
    L0 = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1).mean()
    for target in (L0 / 2, L0 * 1.5):
        v2, f2 = isotropic_remesh(v, f, target, iterations=3)
        assert f2.min() >= 0 and f2.max() < v2.shape[0]
        n = np.cross(v2[f2[:, 1]] - v2[f2[:, 0]], v2[f2[:, 2]] - v2[f2[:, 0]])
        assert (np.linalg.norm(n, axis=1) > 1e-12).all()
        from collections import Counter
        c = Counter()
        for tri in f2:
            for s in range(3):
                a, b = tri[s], tri[(s + 1) % 3]
                c[(min(a, b), max(a, b))] += 1
        assert max(c.values()) <= 2
        e = np.concatenate([
            v2[f2[:, 0]] - v2[f2[:, 1]],
            v2[f2[:, 1]] - v2[f2[:, 2]],
            v2[f2[:, 2]] - v2[f2[:, 0]],
        ])
        mean_len = np.linalg.norm(e, axis=1).mean()
        assert 0.4 * target < mean_len < 2.5 * target


def test_remesh_preserves_surface(bumpy_mesh):
    """Remeshed surface stays near the original (height-field distance)."""
    v, f = bumpy_mesh
    L0 = np.linalg.norm(v[f[:, 0]] - v[f[:, 1]], axis=1).mean()
    v2, f2 = isotropic_remesh(v, f, L0 / 2, iterations=3)
    import jax.numpy as jnp
    from nlos_surface_optimization_tpu.utils import point_mesh_distance
    m = make_mesh(v, f, dtype=np.float64)
    d = np.asarray(point_mesh_distance(jnp.asarray(v2, jnp.float64), m.v,
                                       m.f, m.f_valid))
    assert d.max() < 0.02, d.max()


def test_outer_loop_descends_and_remeshes():
    """20 iterations on a small scene: loss decreases, the forced remesh at
    15 runs without breaking state, v2 improves or holds."""
    v_gt, f_gt = _grid_mesh(8, lambda x, y: 0.5 + 0.04 * np.sin(6 * x))
    gt_mesh = make_mesh(v_gt, f_gt, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=2500, num_bins=220,
                           distance_resolution=6e-3)
    lighting, lnormal = nst.make_confocal_scan(8)
    gt, _ = render_transient(make_mesh(v_gt, f_gt), lighting, lnormal, cfg,
                             KEY, refine=1)
    gt = np.array(gt)

    v0, f0 = _grid_mesh(8, lambda x, y: np.full_like(x, 0.5))
    loop_cfg = LoopConfig(
        lr0=2e-3, T=20, smooth_ratio=100.0, loss_epsilon=1e-6,
        scan_resolution=8, forced_remesh_every=15,
    )
    loop = InverseRenderingLoop(gt, lighting, lnormal, cfg, loop_cfg,
                                v0, f0, KEY, gt_mesh=gt_mesh,
                                log=lambda s: None)
    state, hist = loop.run(max_iters=20)
    assert len(hist["l2_original"]) >= 15
    first = np.mean(hist["l2_original"][:3])
    last = np.mean(hist["l2_original"][-3:])
    assert last < first, (first, last)
    assert np.isfinite(state.v).all()
    assert state.f.shape[0] > 0
    # v2 should not have blown up
    assert hist["v2"][-1] <= hist["v2"][0] * 1.2


def test_outer_loop_plateau_switches_phase():
    """With loss_epsilon = 1 every step is a 'plateau': after 3 runs the
    machine must switch to shading mode then coarse-to-fine."""
    v_gt, f_gt = _grid_mesh(6, lambda x, y: 0.5 + 0.03 * np.cos(5 * y))
    cfg = nst.RenderConfig(num_samples=1200, num_bins=200,
                           distance_resolution=6e-3)
    lighting, lnormal = nst.make_confocal_scan(6)
    gt, _ = render_transient(make_mesh(v_gt, f_gt), lighting, lnormal, cfg,
                             KEY, refine=1)
    v0, f0 = _grid_mesh(6, lambda x, y: np.full_like(x, 0.5))
    loop_cfg = LoopConfig(lr0=1e-3, T=12, smooth_ratio=100.0,
                          loss_epsilon=1.0, scan_resolution=6)
    loop = InverseRenderingLoop(np.array(gt), lighting, lnormal, cfg,
                                loop_cfg, v0, f0, KEY, log=lambda s: None)
    saw_shading = False
    saw_c2f = False
    for _ in range(12):
        if not loop.step():
            break
        if loop.state.testing_flag == 0:
            saw_shading = True
        if loop.state.scan_resolution > 6:
            saw_c2f = True
    assert saw_shading
    assert saw_c2f
    assert loop.state.sample_num > cfg.num_samples  # coarse-to-fine bumped
