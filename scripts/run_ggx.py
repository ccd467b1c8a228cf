"""GGX material-recovery experiment on the real chip (VERDICT r4 #7).

Mirrors the reference's alternating pipeline (exp_ggx/test8.py:106-151):
GT transients of a GGX surface at a KNOWN roughness alpha*, then from a
wrong alpha0 = 0.5 (test8.py:60) alternate

    optimize_alpha  (scalar GGX-roughness descent, 50-iter budget)
    optimize_shape  (Adam_Modified vertex descent, 15-iter budget)

for a few rounds and record the recovered alpha vs alpha*.  The closed-
form albedo projection (initial_fitting_albedo) seeds the radiometry as
in exp_ggx/optimize_parameters.py:46-48.

GT mesh: the real bunny_centered.obj when NLOS_MESH_DIR (or the
reference checkout) provides it, else the synthetic height field.
Writes RESULTS/ggx_recovery.npz and appends a RESULTS.md section.

Env: ALPHA_STAR (0.2), ROUNDS (4), RES (64), SAMPLES (20000).
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

import jax
import jax.numpy as jnp
import numpy as np

ALPHA_STAR = float(os.environ.get("ALPHA_STAR", "0.2"))
ROUNDS = int(os.environ.get("ROUNDS", "4"))
RES = int(os.environ.get("RES", "64"))
SAMPLES = int(os.environ.get("SAMPLES", "20000"))


def main():
    import nlos_surface_optimization_tpu as nst
    from nlos_surface_optimization_tpu.experiments.run import (
        _load_gt_mesh,
        _lct_on_cpu,
    )
    from nlos_surface_optimization_tpu.experiments.scenes import SCENES
    from nlos_surface_optimization_tpu.geometry.accel import (
        morton_order_faces,
    )
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.optim.loss import (
        create_weighting_function,
    )
    from nlos_surface_optimization_tpu.optim.material import (
        initial_fitting_albedo,
        optimize_alpha,
        optimize_shape,
    )
    from nlos_surface_optimization_tpu.recon import init_mesh_from_lct
    from nlos_surface_optimization_tpu.render import render_transient_host
    from nlos_surface_optimization_tpu.geometry.remesh import isotropic_remesh
    from nlos_surface_optimization_tpu.utils.metrics import compute_v2

    t0 = time.time()
    key = jax.random.key(11)
    spec = SCENES["ggx"]
    gt_v, gt_f = _load_gt_mesh(spec, None)
    gt_mesh = make_mesh(gt_v, morton_order_faces(gt_v, gt_f))
    print(f"GT mesh: {gt_f.shape[0]} faces; alpha* = {ALPHA_STAR}",
          flush=True)

    lighting, lnormal = nst.make_confocal_scan(
        RES, lower=spec.scan_lower, upper=spec.scan_upper)
    F = int(gt_mesh.f.shape[0])
    spt0 = 1 + (200_000 - 1) // F
    chunk = max(1, min(64, 2_000_000 // (F * spt0)))
    cfg_gt = nst.RenderConfig(
        num_samples=200_000, num_bins=spec.num_bins,
        distance_resolution=spec.distance_resolution, brdf="ggx",
        source_chunk=chunk)
    gt, _ = render_transient_host(gt_mesh, lighting, lnormal, cfg_gt, key,
                                  refine=1, alpha=jnp.float32(ALPHA_STAR))
    gt = np.asarray(gt, np.float64)
    print(f"GT rendered in {time.time() - t0:.0f}s", flush=True)

    lct = _lct_on_cpu(gt, float(lighting[:, 0].max()),
                      spec.distance_resolution)
    thr = float(np.asarray(lct.albedo).max()) * 0.25
    v0, f0 = init_mesh_from_lct(lct, threshold=thr)
    v0, f0 = isotropic_remesh(v0, f0, 0.5 / RES, iterations=3)
    f0 = morton_order_faces(v0, f0)
    mesh = make_mesh(v0, f0)
    print(f"init mesh: {f0.shape[0]} faces", flush=True)

    cfg = nst.RenderConfig(
        num_samples=SAMPLES, num_bins=spec.num_bins,
        distance_resolution=spec.distance_resolution, brdf="ggx",
        source_chunk=min(64, RES * RES))
    weight = np.asarray(create_weighting_function(gt, spec.gamma))

    # closed-form albedo seed (at the init shape, rendered with alpha0)
    a_star = initial_fitting_albedo(mesh, gt, lighting, lnormal,
                                    cfg.replace(num_samples=4000), key)
    print(f"closed-form albedo: {a_star:.4g}", flush=True)
    if a_star > 0:
        mesh = mesh._replace(albedo=jnp.full_like(mesh.albedo, a_star))

    alpha = 0.5                          # test8.py:60 starting roughness
    alpha_traj = [alpha]
    events = []
    for rnd in range(ROUNDS):
        alpha, losses_a = optimize_alpha(
            mesh, gt, weight, lighting, lnormal, cfg,
            jax.random.fold_in(key, 100 + rnd), alpha,
            lr=1e-2, T=50, loss_epsilon=1e-4,
            log=lambda s: None)
        alpha_traj.append(alpha)
        events.append(f"round {rnd}: alpha -> {alpha:.4f} "
                      f"({len(losses_a)} alpha iters)")
        print(events[-1], flush=True)
        mesh, plateaued, l2o, losses_s = optimize_shape(
            mesh, gt, weight, lighting, lnormal, cfg,
            jax.random.fold_in(key, 200 + rnd),
            lr=1e-4 / 3, T=15, alpha=jnp.float32(alpha),
            log=lambda s: None)
        v2 = float(compute_v2(mesh.v, gt_mesh))
        events.append(f"round {rnd}: shape {len(losses_s)} iters, "
                      f"l2 {l2o:.6f}, v2 {v2 * 1000:.2f} mm")
        print(events[-1], flush=True)

    wall = time.time() - t0
    err = abs(alpha - ALPHA_STAR)
    outdir = os.path.join(ROOT, "RESULTS")
    os.makedirs(outdir, exist_ok=True)
    np.savez(os.path.join(outdir, "ggx_recovery.npz"),
             alpha_traj=np.asarray(alpha_traj), alpha_star=ALPHA_STAR,
             final_v=np.asarray(mesh.v), final_f=np.asarray(mesh.f))

    md = f"""

## GGX roughness recovery (exp_ggx pipeline)

`python scripts/run_ggx.py` — the reference's alternating material
pipeline (exp_ggx/test8.py:106-151: optimize_alpha <-> optimize_shape,
closed-form albedo seed) on one v5e chip, {RES}x{RES} scan,
{SAMPLES} samples, GT = {'real bunny' if gt_f.shape[0] > 10000 else
'height field'} rendered with GGX alpha* = {ALPHA_STAR}
(GT at 200k samples/source).

alpha trajectory (start 0.5, test8.py:60): {
    '  '.join(f'{a:.4f}' for a in alpha_traj)}
**recovered alpha = {alpha:.4f}, |error| = {err:.4f}
({100 * err / ALPHA_STAR:.1f}% of alpha*)** in {wall / 60:.1f} min.

{chr(10).join(events)}

Artifacts: `RESULTS/ggx_recovery.npz`.
"""
    with open(os.path.join(ROOT, "RESULTS.md"), "a") as fh:
        fh.write(md)
    print(json.dumps({"alpha": alpha, "alpha_star": ALPHA_STAR,
                      "err": err, "wall_min": wall / 60}))


if __name__ == "__main__":
    main()
