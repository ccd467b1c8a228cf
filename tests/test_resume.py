"""Kill+resume parity: a loop resumed from a mid-run checkpoint reproduces
the uninterrupted run's subsequent l2/v2 trajectory (the full-resume
feature this framework adds beyond the reference, whose progress dumps
hold only mesh+transient — exp_bunny/test.py:186-187)."""

import numpy as np
import jax
import pytest

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.optim.outer_loop import (
    InverseRenderingLoop,
    LoopConfig,
)
from nlos_surface_optimization_tpu.render import render_transient

KEY = jax.random.key(23)


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


def _build_loop(gt, lighting, lnormal, cfg, v0, f0, gt_mesh, ckpt_dir):
    lcfg = LoopConfig(scan_resolution=8, loss_epsilon=5e-3,
                      forced_remesh_every=5, checkpoint_dir=ckpt_dir)
    return InverseRenderingLoop(gt, lighting, lnormal, cfg, lcfg, v0, f0,
                                KEY, gt_mesh=gt_mesh, log=lambda s: None)


@pytest.mark.smoke
def test_resume_matches_uninterrupted(tmp_path):
    v_gt, f_gt = _grid_mesh(8, lambda x, y: 0.5 + 0.04 * np.sin(6 * x))
    gt_mesh = make_mesh(v_gt, f_gt, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=2000, num_bins=220,
                           distance_resolution=6e-3)
    lighting, lnormal = nst.make_confocal_scan(8)
    gt, _ = render_transient(make_mesh(v_gt, f_gt), lighting, lnormal, cfg,
                             jax.random.key(99))
    gt = np.asarray(gt)
    v0, f0 = _grid_mesh(8, lambda x, y: 0.5 + 0.0 * x)

    # Uninterrupted run: 12 iterations (crosses the forced remesh at 5).
    full = _build_loop(gt, lighting, lnormal, cfg, v0, f0, gt_mesh,
                       str(tmp_path / "full"))
    full.run(max_iters=12)

    # Resume from the iteration-6 checkpoint and continue to 12.
    ckpt = tmp_path / "full" / "00006.mat"
    assert ckpt.exists()
    lcfg = LoopConfig(scan_resolution=8, loss_epsilon=5e-3,
                      forced_remesh_every=5,
                      checkpoint_dir=str(tmp_path / "res"))
    res = InverseRenderingLoop.from_checkpoint(
        str(ckpt), gt, lighting, lnormal, cfg, lcfg, gt_mesh=gt_mesh,
        log=lambda s: None)
    assert res.state.t == 6
    res.run(max_iters=12)

    # The resumed run re-executes iterations 6..11; trajectories must match.
    for k in ("l2", "l2_original", "v2"):
        a = np.asarray(full.history[k], np.float64)
        b = np.asarray(res.history[k], np.float64)
        assert a.shape == b.shape, (k, a.shape, b.shape)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-12, err_msg=k)
    np.testing.assert_allclose(res.state.v, full.state.v, rtol=1e-4,
                               atol=1e-7)
    assert np.array_equal(res.state.f, full.state.f)
    # scalar phase state converged to the same place
    assert res.state.testing_flag == full.state.testing_flag
    assert res.state.run_count == full.state.run_count
    np.testing.assert_allclose(res.state.smooth_weight,
                               full.state.smooth_weight, rtol=1e-6)


@pytest.mark.smoke
def test_checkpoint_roundtrip_fields(tmp_path):
    """Every LoopState scalar survives save_checkpoint/load_checkpoint."""
    from nlos_surface_optimization_tpu.io.mat import (
        load_checkpoint,
        save_checkpoint,
    )
    v = np.zeros((4, 3), np.float32)
    f = np.asarray([[0, 1, 2], [1, 3, 2]], np.int32)
    snap = {"old_v": v + 1, "run_count": 3, "weight_flag": 1,
            "testing_flag": 0, "smooth_weight": 2.5e-3, "lr": 1.1e-4,
            "loss_epsilon": 5e-5, "scan_resolution": 96.0,
            "sample_num": 30000.0, "smooth_ratio": 12.5,
            "l2_first": 0.125}
    p = str(tmp_path / "ck.mat")
    save_checkpoint(p, v=v, f=f, iteration=7,
                    rng_key=np.asarray(jax.random.key_data(KEY)),
                    opt_m=v, opt_v=v, opt_step=7, loop_state=snap,
                    history={"l2": [1.0, 0.5], "l2_original": [1.1, 0.6],
                             "v2": [0.01, 0.009]})
    d = load_checkpoint(p)
    for k, val in snap.items():
        got = np.asarray(d["ls_" + k])
        np.testing.assert_allclose(got.ravel(),
                                   np.asarray(val, np.float64).ravel())
    assert list(np.asarray(d["hist_l2"]).ravel()) == [1.0, 0.5]
