"""Real-capture pipeline: measured transient.mat loading, measured jitter
calibration, and the end-to-end real-scene experiment branch.

The reference runs its real scenes from exp_s/transient.mat
('transient' [4096, 2048] + 'lighting' [4096, 3], exp_s/test.py:64-70) and
loads the SPAD jitter kernel from jitter/jitter_info.mat
(jitter/test.py:60-74).  These tests exercise the same layout contracts
with synthetic stand-ins of the reference's exact shapes."""

import os

import jax
import numpy as np
import pytest
import scipy.io

import nlos_surface_optimization_tpu as nst
from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
from nlos_surface_optimization_tpu.geometry.sampling import (
    stratified_barycoords,
)
from nlos_surface_optimization_tpu.io.mat import (
    load_jitter_calibration,
    load_real_capture,
)
from nlos_surface_optimization_tpu.render import (
    inverse_render_jitter,
    render_transient_jitter,
)

import oracle

KEY = jax.random.key(29)


def _standin_capture(path, n=64, bins=2048, res=1.2e-3):
    """Synthetic measured capture with the reference's exact layout:
    'transient' [n*n, bins] + 'lighting' [n*n, 3] (exp_s/transient.mat).
    Signal: per-pixel Gaussian pulse at the path length of a plane at
    z=0.55 (lands well past the zeroed 600-bin prefix), plus a fake
    direct-bounce spike in the early bins that loading must wipe."""
    xs = np.linspace(-0.35, 0.35, n)
    gx, gy = np.meshgrid(xs, xs)
    lighting = np.stack(
        [gx.ravel(), gy.ravel(), np.zeros(n * n)], axis=1
    )
    h = np.sqrt(gx.ravel() ** 2 + gy.ravel() ** 2 + 0.55 ** 2)
    center = 2.0 * h / res                       # path-length bin
    b = np.arange(bins)
    t = np.exp(-((b[None, :] - center[:, None]) / 6.0) ** 2)
    t[:, :600] += 5.0                            # direct-bounce garbage
    scipy.io.savemat(path, {"transient": t, "lighting": lighting})
    return t, lighting


def test_load_real_capture_layout(tmp_path):
    p = os.path.join(tmp_path, "transient.mat")
    t_raw, lighting_raw = _standin_capture(p)
    t, lighting, n = load_real_capture(p)
    assert n == 64 and t.shape == (4096, 2048)
    assert (t[:, :600] == 0).all()               # prefix wiped
    np.testing.assert_allclose(t[:, 600:], t_raw[:, 600:])
    np.testing.assert_allclose(lighting, lighting_raw.astype(np.float32),
                               rtol=1e-6)


def test_load_real_capture_rect_data_and_downsample(tmp_path):
    """'rect_data' [N,N,B] variant (exp_s/test.py:66) + scan downsample."""
    n, bins = 16, 256
    rect = np.random.RandomState(0).rand(n, n, bins)
    p = os.path.join(tmp_path, "rect.mat")
    scipy.io.savemat(p, {"rect_data": rect})
    t, lighting, n_out = load_real_capture(p, zero_bins=32, downsample=4)
    assert lighting is None and n_out == 4 and t.shape == (16, bins)
    assert (t[:, :32] == 0).all()
    flat = rect.reshape(n * n, bins)
    idx = (np.arange(0, n, 4)[:, None] * n + np.arange(0, n, 4)).ravel()
    np.testing.assert_allclose(t[:, 32:], flat[idx, 32:])


def test_measured_jitter_calibration(bumpy_mesh, tmp_path):
    """Load a jitter_info.mat-layout calibration (asymmetric kernel,
    non-central offset) and run the jitter renderer with it; gradient
    checked against the independent NumPy oracle."""
    rng = np.random.RandomState(7)
    K, off = 13, 3                                # asymmetric: offset != K//2
    w = rng.rand(K) * np.exp(-0.4 * np.arange(K))  # decaying tail
    w /= w.sum()
    jg = np.gradient(w)
    p = os.path.join(tmp_path, "jitter_info.mat")
    scipy.io.savemat(p, {"jitter_weight": w[:, None],
                         "jitter_grad": jg[:, None],
                         "jitter_offset": np.uint8(off)})
    w2, jg2, off2 = load_jitter_calibration(p)
    np.testing.assert_allclose(w2, w)
    np.testing.assert_allclose(jg2, jg)
    assert off2 == off

    v, f = bumpy_mesh
    mesh = make_mesh(v, f, dtype=np.float64)
    cfg = nst.RenderConfig(num_samples=500, num_bins=500,
                           distance_resolution=5e-3)
    lighting, lnormal = nst.make_confocal_scan(6)
    lighting = lighting.astype(np.float64)
    lnormal = lnormal.astype(np.float64)
    t, _ = render_transient_jitter(mesh, lighting, lnormal, cfg, KEY, w2,
                                   off2)
    t = np.array(t)
    assert t.sum() > 0 and np.isfinite(t).all()
    data = t * (1 + 0.2 * rng.rand(*t.shape))
    weight = 0.5 + rng.rand(*data.shape)
    t2, g, _ = inverse_render_jitter(mesh, data, weight, lighting, lnormal,
                                     cfg, KEY, w2, jg2, off2)
    spt = cfg.samples_per_face(f.shape[0])
    bary = np.array(
        stratified_barycoords(KEY, lighting.shape[0], f.shape[0], spt, 0),
        np.float64,
    )
    diff = (data - t) * weight
    g_ref = oracle.vertex_gradient_jitter(
        np.array(mesh.v), np.array(mesh.f), lighting, lnormal, bary, diff,
        cfg.bin_lower, cfg.distance_resolution, cfg.num_bins, w2, jg2, off2,
    )
    v_count = g_ref.shape[0]
    np.testing.assert_allclose(np.array(g)[:v_count], g_ref, rtol=5e-3,
                               atol=1e-6 * np.abs(g_ref).max())


def test_run_real_scene_end_to_end(tmp_path):
    """run_experiment('s') executes against a stand-in .mat with the
    reference's exact shapes (64x64, B=2048), downsampled to 8x8 for CPU
    speed (VERDICT round-1 item 4)."""
    from nlos_surface_optimization_tpu.experiments.run import run_experiment

    workdir = os.path.join(tmp_path, "s")
    os.makedirs(workdir)
    _standin_capture(os.path.join(workdir, "transient.mat"))
    state, history = run_experiment(
        "s", workdir, max_iters=2, scan_resolution=8, sample_num=300,
    )
    assert len(history["l2"]) == 2
    assert all(np.isfinite(history["l2"]))
    assert np.isnan(history["v2"]).all()          # no GT mesh for real data
    assert os.path.exists(os.path.join(workdir, "progress", "00000.mat"))


# ---------------------------------------------------------------------------
# Gated tests against the reference's ACTUAL measured captures
# (exp_s/transient.mat etc., shipped in the reference checkout).

import os as _os

_REF_DATA = next(
    (d for d in [_os.environ.get("NLOS_DATA_DIR") or "",
                 "/root/reference"]
     if d and _os.path.exists(_os.path.join(
         d, "transient_rendering_cython", "exp_s", "transient.mat"))),
    None)


@pytest.mark.skipif(_REF_DATA is None,
                    reason="reference measured captures not available")
@pytest.mark.parametrize("scene", ["s", "su", "mannequin"])
def test_load_reference_capture(scene):
    """The measured SPAD captures load through load_real_capture with the
    documented layout (64x64 scan, B=2048, direct bounce zeroed)."""
    from nlos_surface_optimization_tpu.io.mat import load_real_capture
    p = _os.path.join(_REF_DATA, "transient_rendering_cython",
                      f"exp_{scene}", "transient.mat")
    t, lighting, n = load_real_capture(p)
    assert n == 64 and t.shape == (4096, 2048)
    assert (t[:, :600] == 0).all()          # exp_s/test.py:66-67
    assert t.max() > 0
    assert lighting is not None and lighting.shape == (4096, 3)
    # the scan plane is the z=0 wall, x/y within ~[-0.4, 0.4]
    assert np.abs(lighting[:, 2]).max() < 0.1
    assert np.abs(lighting[:, :2]).max() < 0.6


@pytest.mark.skipif(_REF_DATA is None,
                    reason="reference measured captures not available")
def test_find_capture_reference_layout(tmp_path):
    """_find_capture resolves the reference checkout layout via
    NLOS_DATA_DIR."""
    from nlos_surface_optimization_tpu.experiments.run import _find_capture
    from nlos_surface_optimization_tpu.experiments.scenes import SCENES
    old = _os.environ.get("NLOS_DATA_DIR")
    _os.environ["NLOS_DATA_DIR"] = _REF_DATA
    try:
        p = _find_capture(SCENES["s"], str(tmp_path), None)
        assert p.endswith("exp_s/transient.mat")
    finally:
        if old is None:
            _os.environ.pop("NLOS_DATA_DIR", None)
        else:
            _os.environ["NLOS_DATA_DIR"] = old


@pytest.mark.skipif(_REF_DATA is None,
                    reason="reference measured captures not available")
def test_real_capture_two_iterations(tmp_path):
    """run_experiment('s') on the ACTUAL measured data, downsampled scan
    for CPU: loads the capture + the reference's threshold init obj, runs
    2 iterations, descends without NaN."""
    from nlos_surface_optimization_tpu.experiments.run import run_experiment
    old = _os.environ.get("NLOS_DATA_DIR")
    _os.environ["NLOS_DATA_DIR"] = _REF_DATA
    try:
        state, hist = run_experiment(
            "s", str(tmp_path), max_iters=2, scan_resolution=8,
            sample_num=1200, log=lambda s: None)
    finally:
        if old is None:
            _os.environ.pop("NLOS_DATA_DIR", None)
        else:
            _os.environ["NLOS_DATA_DIR"] = old
    assert len(hist["l2"]) == 2
    assert np.isfinite(hist["l2"]).all()
    assert np.isfinite(state.v).all()


@pytest.mark.skipif(_REF_DATA is None,
                    reason="reference measured captures not available")
def test_real_capture_remesh_crossing(tmp_path):
    """The ACTUAL exp_s capture (B=2048 intact, scan downsampled for CPU)
    driven through a FORCED remesh boundary: locks in the backward
    kernel's B=2048 VMEM-slab sizing (bwd_kernels._slab_sources) and the
    shape-bucketed re-jit across a face-count change — the regime the
    round-4 slab fixes (commits 82d0908, 9da5f70) addressed, previously
    exercised only by the one-off run scripts."""
    from nlos_surface_optimization_tpu.config import RenderConfig
    from nlos_surface_optimization_tpu.experiments.run import _find_capture
    from nlos_surface_optimization_tpu.experiments.scenes import SCENES
    from nlos_surface_optimization_tpu.io.mat import load_real_capture
    from nlos_surface_optimization_tpu.io.obj import read_obj
    from nlos_surface_optimization_tpu.optim.outer_loop import (
        InverseRenderingLoop,
        LoopConfig,
    )

    spec = SCENES["s"]
    p = _os.path.join(_REF_DATA, "transient_rendering_cython", "exp_s",
                      "transient.mat")
    gt, lighting, res = load_real_capture(p, downsample=8)   # 8x8, B=2048
    assert gt.shape == (64, 2048)
    lnormal = np.tile(np.array([0.0, 0.0, 1.0], np.float32),
                      (lighting.shape[0], 1))
    init_obj = _os.path.join(_os.path.dirname(p), "cnlos_s_threshold.obj")
    v0, f0 = read_obj(init_obj)
    cfg = RenderConfig(num_samples=800, num_bins=2048,
                       distance_resolution=spec.distance_resolution,
                       source_chunk=64)
    events = []
    loop = InverseRenderingLoop(
        gt, lighting, lnormal, cfg,
        LoopConfig(smooth_ratio=spec.smooth_ratio, gamma=spec.gamma,
                   edge_lr_ratio=spec.edge_lr_ratio, lr0=spec.lr0,
                   scan_resolution=res, forced_remesh_every=2,
                   checkpoint_dir=None),
        v0, f0, KEY, log=events.append)
    faces_before = loop.state.f.shape[0]
    state, hist = loop.run(max_iters=6)
    assert any(e == "remesh" for e in events), events
    # the loop rendered on both sides of the remesh without NaN
    assert len(hist["l2"]) >= 4
    assert np.isfinite(hist["l2"]).all()
    assert np.isfinite(state.v).all()
    assert state.f.shape[0] != faces_before or len(events) > 2
