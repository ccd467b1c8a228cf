"""SPAD-noise robustness experiment on the real chip (VERDICT r4 #8).

The reference's exp_noise pushes ideal GT transients through the SPAD
photon model (addNoiseExample.m:1-40, spadModelScaled) before the same
bunny optimization.  This script runs run_experiment twice at 64x64 —
scene 'noise' (SPAD-noised GT) and scene 'bunny' (clean GT, same mesh,
same sample budget) — and quantifies the robustness gap as the v2
(mean-distance-to-GT-mesh) curves of the two runs.

Env: ITERS (40), RES (64), WORKDIR.  Resumable (resume=True) so a
worker restart continues both legs.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("NLOS_MESH_DIR",
                      "/root/reference/transient_rendering_cython/mesh")

import numpy as np

ITERS = int(os.environ.get("ITERS", "40"))
RES = int(os.environ.get("RES", "64"))
WORKDIR = os.environ.get("WORKDIR", "/tmp/noise_exp")


def run_leg(scene, workdir, log_prefix):
    from nlos_surface_optimization_tpu.experiments.run import run_experiment

    times = []
    last = [time.time()]

    def log(s):
        now = time.time()
        if s[:1].isdigit():
            times.append(now - last[0])
        last[0] = now
        print(f"[{log_prefix}] {s}", flush=True)

    state, hist = run_experiment(
        scene, workdir, max_iters=ITERS, scan_resolution=RES,
        resume=True, log=log)
    return state, hist, times


def main():
    t0 = time.time()
    clean_state, clean_hist, _ = run_leg(
        "bunny", os.path.join(WORKDIR, "clean"), "clean")
    noisy_state, noisy_hist, _ = run_leg(
        "noise", os.path.join(WORKDIR, "noisy"), "noisy")
    wall = time.time() - t0

    cv2 = np.asarray(clean_hist["v2"], np.float64)
    nv2 = np.asarray(noisy_hist["v2"], np.float64)
    cl2 = np.asarray(clean_hist["l2_original"], np.float64)
    nl2 = np.asarray(noisy_hist["l2_original"], np.float64)

    outdir = os.path.join(ROOT, "RESULTS")
    os.makedirs(outdir, exist_ok=True)
    np.savez(os.path.join(outdir, "noise_robustness.npz"),
             clean_v2=cv2, noisy_v2=nv2, clean_l2=cl2, noisy_l2=nl2,
             clean_f=clean_state.f, noisy_f=noisy_state.f)

    def curve(x, k=8):
        x = x[np.isfinite(x)]
        idx = np.unique(np.linspace(0, len(x) - 1, k).astype(int))
        return "  ".join(f"{i}:{x[i] * 1000:.2f}" for i in idx)

    gap = (nv2[np.isfinite(nv2)][-1] - cv2[np.isfinite(cv2)][-1]) * 1000
    md = f"""

## SPAD-noise robustness (exp_noise)

`python scripts/run_noise.py` — paired {RES}x{RES} bunny optimizations
on one v5e chip, {len(cv2)} iterations each: clean GT vs GT pushed
through the SPAD photon model (spadModelScaled semantics: importance-
sampled photon times, measured-envelope jitter, hold-off, afterpulse,
Poisson background, no pileup; M={20000} photons, muNoise=10000 —
addNoiseExample.m:6-8,20-24) with energy rescale.

v2 curves (iter:mm):
  clean  {curve(cv2)}
  noisy  {curve(nv2)}

final v2: clean {cv2[np.isfinite(cv2)][-1] * 1000:.2f} mm, noisy
{nv2[np.isfinite(nv2)][-1] * 1000:.2f} mm — **noise penalty
{gap:+.2f} mm**; l2 clean {cl2[-1]:.6f} / noisy {nl2[-1]:.6f}.
Wall {wall / 60:.1f} min.  Artifacts: `RESULTS/noise_robustness.npz`.
"""
    with open(os.path.join(ROOT, "RESULTS.md"), "a") as fh:
        fh.write(md)
    print(json.dumps({
        "clean_v2_mm": float(cv2[np.isfinite(cv2)][-1] * 1000),
        "noisy_v2_mm": float(nv2[np.isfinite(nv2)][-1] * 1000),
        "wall_min": wall / 60}))


if __name__ == "__main__":
    main()
