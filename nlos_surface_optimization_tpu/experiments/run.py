"""End-to-end experiment runner.

One config-driven function replacing the reference's per-scene
test.py / preprocess.m pipeline:
  1. load or create GT transients                    (test.py:69-75 / P5)
  2. LCT reconstruction -> init mesh                 (preprocess.m / M1)
  3. space carving (optional projection constraint)  (M2)
  4. plateau-driven outer loop                       (test.py:116-219)
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import jax
import numpy as np

from ..config import RenderConfig, make_confocal_scan
from ..geometry.mesh import make_mesh
from ..io.mat import load_transient_shards
from ..io.obj import read_obj
from ..optim.outer_loop import InverseRenderingLoop, LoopConfig
from ..recon import init_mesh_from_lct, lct_reconstruct
from .create_gt import create_gt
from .scenes import SCENES, SceneSpec, mesh_dir


def _load_gt_mesh(spec: SceneSpec, meshes: Optional[str]):
    d = meshes or mesh_dir()
    if spec.mesh_file and d:
        p = os.path.join(d, spec.mesh_file)
        if os.path.exists(p):
            return read_obj(p)
    # synthetic fallback: a height field stands in for the missing asset
    n = 32
    xs = np.linspace(spec.scan_lower[0], spec.scan_upper[0], n)
    gx, gy = np.meshgrid(xs, xs)
    z = 0.5 + 0.06 * np.sin(6 * gx) * np.cos(5 * gy)
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            f.append([a, a + n, a + 1])
            f.append([a + n, a + n + 1, a + 1])
    return v, np.array(f, np.int32)


def _find_capture(spec: SceneSpec, workdir: str,
                  transient_path: Optional[str]) -> str:
    """Locate a real scene's measured transient.mat: explicit path, then
    workdir, then $NLOS_DATA_DIR/<scene>/ (the reference keeps them at
    exp_s/transient.mat etc., exp_s/test.py:64)."""
    fname = spec.transient_file or "transient.mat"
    cands = [transient_path, os.path.join(workdir, fname)]
    data_dir = os.environ.get("NLOS_DATA_DIR")
    if data_dir:
        # both flat (<dir>/<scene>/) and the reference checkout layout
        # (<dir>/exp_<scene>/transient.mat, exp_s/test.py:64)
        cands.append(os.path.join(data_dir, spec.name, fname))
        cands.append(os.path.join(data_dir, "exp_" + spec.name, fname))
        cands.append(os.path.join(
            data_dir, "transient_rendering_cython", "exp_" + spec.name,
            fname))
    for p in cands:
        if p and os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"no measured transient for scene '{spec.name}'; looked at "
        f"{[c for c in cands if c]} (set NLOS_DATA_DIR or pass "
        f"transient_path)"
    )


def _lct_on_cpu(gt, width, bin_resolution_m):
    """LCT init pinned to the host CPU backend: the [N,N,B] FFTs take
    milliseconds on CPU but minutes to COMPILE through remote-TPU serving
    tunnels (measured 10 min of the first flagship attempt) — and the init
    runs exactly once, so compiling it for the accelerator never pays."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return lct_reconstruct(gt, width=width,
                               bin_resolution_m=bin_resolution_m)
    with jax.default_device(cpu):
        return lct_reconstruct(gt, width=width,
                               bin_resolution_m=bin_resolution_m)


def run_real_experiment(spec: SceneSpec, workdir: str,
                        max_iters: Optional[int],
                        scan_resolution: Optional[int],
                        sample_num: Optional[int],
                        transient_path: Optional[str],
                        key, log, resume: bool = False):
    """Measured-capture pipeline (exp_s/test.py:55-110): load
    transient.mat, LCT-init from the data, optimize with no GT mesh/v2.

    scan_resolution (must divide the capture's N) downsamples the scan for
    reduced-scale runs; the reference always runs the full 64x64."""
    from ..io.mat import load_real_capture

    path = _find_capture(spec, workdir, transient_path)
    n_full = spec.scan_resolution
    down = 1
    if scan_resolution and scan_resolution < n_full:
        assert n_full % scan_resolution == 0, (
            f"scan_resolution {scan_resolution} must divide {n_full}")
        down = n_full // scan_resolution
    gt, lighting, res = load_real_capture(path, downsample=down)
    log(f"loaded capture {path}: {res}x{res} scan, B={gt.shape[1]}")
    num_bins = gt.shape[1]

    if lighting is None:
        lighting, lnormal = make_confocal_scan(
            res, lower=spec.scan_lower, upper=spec.scan_upper
        )
    else:
        lnormal = np.tile(np.array([0.0, 0.0, 1.0], np.float32),
                          (lighting.shape[0], 1))

    cfg = RenderConfig(
        num_samples=sample_num or spec.sample_num,
        num_bins=num_bins,
        distance_resolution=spec.distance_resolution,
        brdf=spec.brdf,
        source_chunk=min(256, res * res),
    )

    # Init mesh: the reference ships a thresholded-CNLOS init per real
    # scene (exp_s/test.py:73-76, cnlos_s_threshold.obj); use it when it
    # sits next to the capture, else run our LCT init from the data.
    init_obj = os.path.join(os.path.dirname(path),
                            f"cnlos_{spec.name}_threshold.obj")
    if os.path.exists(init_obj):
        log(f"init mesh from {init_obj}")
        v0, f0 = read_obj(init_obj)
    else:
        log("LCT initialization from measured data")
        width = float((lighting[:, 0].max() - lighting[:, 0].min()) / 2)
        lct = _lct_on_cpu(gt, width, spec.distance_resolution)
        thr = float(np.asarray(lct.albedo).max()) * 0.25
        v0, f0 = init_mesh_from_lct(lct, threshold=thr)
    log(f"init mesh: V={v0.shape[0]} F={f0.shape[0]}")

    # Radiometric alignment: measured captures are raw photon counts
    # (exp_s/transient.mat sums to ~4.5e6) while the renderer works in
    # form-factor units (~1e1 for this scene) — optimizing shape against a
    # 4000x brighter target stalls (the transient term in the difference
    # is negligible, so the loss barely responds to vertex moves).  Fit
    # the reference's closed-form global albedo to the INIT render
    # (initial_fitting_albedo, exp_ggx/optimize_parameters.py:46-48:
    # albedo* = sum(gt*T)/sum(T^2)) and fold it into the data scale.
    from ..render import render_transient_host
    cfg_fit = cfg.replace(num_samples=max(2000, cfg.num_samples // 10))
    t_init, _ = render_transient_host(make_mesh(v0, f0), lighting, lnormal,
                                      cfg_fit, key)
    t_init = np.asarray(t_init, np.float64)
    denom = float((t_init * t_init).sum())
    albedo_star = float((gt * t_init).sum()) / max(denom, 1e-30)
    if albedo_star > 0:
        log(f"closed-form albedo fit: {albedo_star:.4g} "
            "(folded into data scale)")
        gt = gt / albedo_star

    loop_cfg = _loop_config(spec, res, workdir)
    loop = _make_or_resume_loop(gt, lighting, lnormal, cfg, loop_cfg,
                                v0, f0, key, None, log, resume)
    return loop.run(max_iters=max_iters)


def _loop_config(spec: SceneSpec, res: int, workdir: str) -> LoopConfig:
    """Per-scene outer-loop config: the reference sets lr0 per scene
    (exp_bunny/test.py:56 lr0=1e-4/3, exp_s/test.py:56 lr0=1e-4)."""
    kw = {}
    if spec.lr0 is not None:
        kw["lr0"] = spec.lr0
    return LoopConfig(
        smooth_ratio=spec.smooth_ratio,
        loss_epsilon=spec.loss_epsilon,
        edge_lr_ratio=spec.edge_lr_ratio,
        gamma=spec.gamma,
        scan_resolution=res,
        checkpoint_dir=os.path.join(workdir, "progress"),
        **kw,
    )


def _find_jitter_calibration(workdir: str):
    """(jitters_s, counts) for the SPAD model: measured jitter.mat when
    available (exp_noise/noise/jitter.mat layout: t_1 seconds, counts_1),
    else a synthetic ~60 ps-FWHM Gaussian histogram at the SPAD's 4 ps
    resolution (same shape as the measured calibration)."""
    import scipy.io

    cands = [os.path.join(workdir, "jitter.mat")]
    data_dir = os.environ.get("NLOS_DATA_DIR")
    if data_dir:
        cands.append(os.path.join(data_dir, "noise", "jitter.mat"))
    for p in cands:
        if os.path.exists(p):
            m = scipy.io.loadmat(p)
            return (np.asarray(m["t_1"]).ravel(),
                    np.asarray(m["counts_1"]).ravel())
    # Synthetic stand-in mirroring the measured calibration's envelope
    # (901 samples over [-84 ps, 650 ps], Gaussian core + diffusion tail,
    # total counts ~3.6e6).  The absolute scale matters: spadModel.m's
    # background rate divides muNoise*M by sum(jitterCounts) and
    # multiplies by numBins/length(jittersAll), so a miscalibrated sum
    # changes the signal-to-background ratio of the whole experiment.
    t = np.linspace(-84e-12, 650e-12, 901)
    sigma = 25e-12
    core = np.exp(-0.5 * (t / sigma) ** 2)
    tail = 0.02 * np.exp(-np.maximum(t, 0.0) / 150e-12)
    counts = core + tail
    counts *= 3.57e6 / counts.sum()
    return t, counts


def _apply_spad_noise(gt: np.ndarray, spec: SceneSpec, workdir: str, key,
                      num_photons: Optional[int], log) -> np.ndarray:
    """Push ideal GT transients through the SPAD photon model, Scaled
    variant, and rescale counts back to the ideal energy — exactly
    addNoiseExample.m:20-24 (spadModelScaled(...)/M*sum(transient))."""
    from ..noise.spad import SpadParams, spad_noisy_transients

    jitters_s, counts = _find_jitter_calibration(workdir)
    params = SpadParams(
        num_photons=num_photons or spec.spad_photons,
        mu_noise=spec.spad_mu_noise,
        pileup=False,  # spadModelScaled semantics (spadModelScaled.m:44-45)
    )
    log(f"injecting SPAD noise: M={params.num_photons} "
        f"muNoise={params.mu_noise}")
    noisy = spad_noisy_transients(jax.random.fold_in(key, 777), gt,
                                  jitters_s, counts, params, rescale=True)
    return np.asarray(noisy, np.float64)


def run_experiment(scene: str, workdir: str,
                   max_iters: Optional[int] = None,
                   scan_resolution: Optional[int] = None,
                   sample_num: Optional[int] = None,
                   gt_sample_num: Optional[int] = None,
                   meshes: Optional[str] = None,
                   transient_path: Optional[str] = None,
                   spad_photons: Optional[int] = None,
                   resume: bool = False,
                   key=None, log=print):
    """Run one scene end-to-end; returns (state, history)."""
    spec = SCENES[scene]
    key = jax.random.key(0) if key is None else key
    res = scan_resolution or spec.scan_resolution
    os.makedirs(workdir, exist_ok=True)

    if spec.kind == "real":
        return run_real_experiment(spec, workdir, max_iters,
                                   scan_resolution, sample_num,
                                   transient_path, key, log, resume=resume)

    gt_v, gt_f = _load_gt_mesh(spec, meshes)
    gt_mesh = make_mesh(gt_v, gt_f)

    shard_glob = os.path.join(workdir, "setup",
                              f"{spec.name}_transient_{res}_*.mat")
    files = sorted(glob.glob(shard_glob),
                   key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    if files:
        gt = load_transient_shards(files)
        if gt.shape[0] != res * res:  # partial shards from a crashed run
            log(f"discarding incomplete GT ({gt.shape[0]}/{res * res} rows)")
            files = []
    if not files:
        log(f"creating GT transients for {scene} at {res}x{res}")
        files = create_gt(
            spec, gt_v, gt_f, os.path.join(workdir, "setup"),
            # 16 shards at the flagship 256 scan = the reference's batch
            # layout (test.py:63); atomic per-shard writes make the GT
            # phase resumable at shard granularity
            num_shards=16 if res >= 256 else 8, resolution=res,
            sample_num=gt_sample_num or min(spec.gt_sample_num, 200_000),
            key=key,
        )
        gt = load_transient_shards(files)

    if spec.spad_noise:
        gt = _apply_spad_noise(gt, spec, workdir, key, spad_photons, log)

    cfg = RenderConfig(
        num_samples=sample_num or spec.sample_num,
        num_bins=spec.num_bins,
        distance_resolution=spec.distance_resolution,
        brdf=spec.brdf,
        source_chunk=min(256, res * res),
    )
    lighting, lnormal = make_confocal_scan(
        res, lower=spec.scan_lower, upper=spec.scan_upper
    )

    log("LCT initialization")
    width = float((lighting[:, 0].max() - lighting[:, 0].min()) / 2)
    lct = _lct_on_cpu(gt, width, spec.distance_resolution)
    thr = float(np.asarray(lct.albedo).max()) * 0.25
    v0, f0 = init_mesh_from_lct(lct, threshold=thr)
    log(f"init mesh: V={v0.shape[0]} F={f0.shape[0]}")

    loop_cfg = _loop_config(spec, res, workdir)
    loop = _make_or_resume_loop(gt, lighting, lnormal, cfg, loop_cfg, v0, f0,
                                key, gt_mesh, log, resume)
    return loop.run(max_iters=max_iters)


def _make_or_resume_loop(gt, lighting, lnormal, cfg, loop_cfg, v0, f0, key,
                         gt_mesh, log, resume: bool):
    """Fresh loop, or — when `resume` and progress checkpoints exist — a
    loop restored from the latest one (failure recovery: a crashed run
    continues from its last completed iteration)."""
    if resume and loop_cfg.checkpoint_dir:
        ckpts = sorted(glob.glob(
            os.path.join(loop_cfg.checkpoint_dir, "[0-9]*.mat")))
        if ckpts:
            log(f"resuming from {ckpts[-1]}")
            return InverseRenderingLoop.from_checkpoint(
                ckpts[-1], gt, lighting, lnormal, cfg, loop_cfg,
                gt_mesh=gt_mesh, log=log)
    return InverseRenderingLoop(gt, lighting, lnormal, cfg, loop_cfg,
                                v0, f0, key, gt_mesh=gt_mesh, log=log)


def main():
    import argparse
    ap = argparse.ArgumentParser(description="NLOS surface optimization")
    ap.add_argument("scene", choices=sorted(SCENES))
    ap.add_argument("--workdir", default="./runs")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--meshes", default=None,
                    help="directory with GT *_centered.obj assets")
    ap.add_argument("--transient", default=None,
                    help="measured transient.mat (real scenes)")
    args = ap.parse_args()
    run_experiment(args.scene, os.path.join(args.workdir, args.scene),
                   max_iters=args.iters, scan_resolution=args.res,
                   sample_num=args.samples, meshes=args.meshes,
                   transient_path=args.transient)


if __name__ == "__main__":
    main()
