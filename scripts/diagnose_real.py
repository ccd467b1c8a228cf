"""Diagnose the measured-capture fit (VERDICT r4 #2's analysis leg).

Renders the init (or a checkpoint's) mesh against exp_s/transient.mat and
reports WHERE the model and the data disagree:
  * total-energy ratio and the closed-form albedo fit
  * per-source peak-bin offset + global cross-correlation shift (a
    temporal miscalibration shows up as a constant bin offset)
  * energy fraction the render puts into the zeroed direct-bounce
    prefix (bins < 600, exp_s/test.py:66-67)
  * l2 of the raw fit vs the l2 after the best global shift/scale —
    the gap says how much of the loss floor is calibration vs shape.

Env: SCENE (s), CKPT (optional progress/*.mat to use instead of the
shipped threshold init), SAMPLES (20000), DOWN (1 = full 64x64).
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("NLOS_DATA_DIR", "/root/reference")

import jax
import numpy as np

SCENE = os.environ.get("SCENE", "s")
CKPT = os.environ.get("CKPT")
SAMPLES = int(os.environ.get("SAMPLES", "20000"))
DOWN = int(os.environ.get("DOWN", "1"))


def main():
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.experiments.run import _find_capture
    from nlos_surface_optimization_tpu.experiments.scenes import SCENES
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.io.mat import load_real_capture
    from nlos_surface_optimization_tpu.io.obj import read_obj
    from nlos_surface_optimization_tpu.render import render_transient_host

    spec = SCENES[SCENE]
    path = _find_capture(spec, "/tmp", None)
    gt, lighting, res = load_real_capture(path, downsample=DOWN)
    lnormal = np.tile(np.array([0.0, 0.0, 1.0], np.float32),
                      (lighting.shape[0], 1))
    B = gt.shape[1]

    if CKPT:
        import scipy.io
        d = scipy.io.loadmat(CKPT, squeeze_me=True)
        v0 = np.asarray(d["v"], np.float32).reshape(-1, 3)
        f0 = np.asarray(d["f"], np.int32).reshape(-1, 3)
        src = CKPT
    else:
        src = os.path.join(os.path.dirname(path),
                           f"cnlos_{SCENE}_threshold.obj")
        v0, f0 = read_obj(src)

    cfg = nst.RenderConfig(
        num_samples=SAMPLES, num_bins=B,
        distance_resolution=spec.distance_resolution,
        source_chunk=min(64, res * res))
    key = jax.random.key(3)
    t, _ = render_transient_host(make_mesh(v0, f0), lighting, lnormal, cfg,
                                 key)
    t = np.asarray(t, np.float64)

    e_gt = gt.sum()
    e_t = t.sum()
    albedo_star = float((gt * t).sum() / max((t * t).sum(), 1e-30))
    ts = t * albedo_star

    # energy in the zeroed prefix
    pre = float(ts[:, :600].sum() / max(ts.sum(), 1e-30))

    # global best shift via cross-correlation of the mean transients
    mg = gt.mean(axis=0)
    mt = ts.mean(axis=0)
    xc = np.correlate(mg, mt, mode="full")
    shift = int(np.argmax(xc)) - (B - 1)      # >0: render arrives early

    # per-source peak offsets (only sources with signal)
    live = (gt.max(axis=1) > 0) & (ts.max(axis=1) > 0)
    pk_g = gt[live].argmax(axis=1)
    pk_t = ts[live].argmax(axis=1)
    d_pk = pk_g - pk_t

    def l2(a, b):
        return float(((a - b) ** 2).sum() / a.shape[0])

    l2_raw = l2(gt, ts)
    ts_shift = np.zeros_like(ts)
    if shift >= 0:
        ts_shift[:, shift:] = ts[:, :B - shift]
    else:
        ts_shift[:, :B + shift] = ts[:, -shift:]
    a2 = float((gt * ts_shift).sum() / max((ts_shift * ts_shift).sum(),
                                           1e-30))
    l2_shift = l2(gt, ts_shift * a2)
    l2_zero = l2(gt, np.zeros_like(gt))

    out = {
        "mesh": src, "faces": int(f0.shape[0]),
        "energy_ratio_gt_over_render": float(e_gt / max(e_t, 1e-30)),
        "albedo_star": albedo_star,
        "render_energy_in_zeroed_prefix": pre,
        "best_global_shift_bins": shift,
        "peak_offset_bins": {
            "median": float(np.median(d_pk)),
            "p10": float(np.percentile(d_pk, 10)),
            "p90": float(np.percentile(d_pk, 90)),
        },
        "l2_zero_render": l2_zero,
        "l2_raw_fit": l2_raw,
        "l2_after_best_shift_and_rescale": l2_shift,
        "fit_explains_pct_of_data_energy":
            100.0 * (1 - l2_raw / max(l2_zero, 1e-30)),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
