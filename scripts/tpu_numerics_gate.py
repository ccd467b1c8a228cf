"""On-TPU numerics gate: real-hardware kernels vs a CPU float64 reference.

Runs the forward transient and the analytic vertex gradient at bench-like
density on the REAL device for every visibility backend (jnp, mxu, pallas,
fused) and compares each against a float64 run of the same dtype-
polymorphic code on CPU with identical frozen sampling (counter RNG keyed
on global indices is dtype/platform independent) — the same bounds
test_f32_numerics.py enforces on CPU.  This is the check that would have
caught both prior round-ending bugs (kernels that pass interpret-mode
tests but crash or drift when Mosaic-compiled on hardware).

Methodology cite: check_matlab/check_mesh_sampling_grad.m:22-27 (frozen
sampling making the MC estimator deterministic and comparable).

Usage:  python scripts/tpu_numerics_gate.py        (exits nonzero on fail)
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# f32-vs-f64 bounds.  The forward uses a CUMULATIVE-sum metric: f32 path
# lengths quantize samples across bin edges (see test_f32_numerics.py's
# diagnosis), which adjacent-bin transport cancels in the cumsum; raw
# per-bin max-rel error is ~8e-3 at this density for EVERY backend
# identically.  The cross-backend checks are the sharp hardware gates:
# Mosaic-compiled kernels must agree with the XLA jnp path to float32
# noise on the same device.
FWD_CUM_RTOL = 1e-3   # measured f32 floor on this scene: 3.7e-4
GRAD_RTOL = 5e-3      # measured: 3.4e-3
XBACKEND_FWD_RTOL = 5e-5
XBACKEND_GRAD_RTOL = 1e-4
REF_PATH = "/tmp/nlos_tpu_gate_ref.npz"


def build_scene_np():
    import numpy as np

    n = 14
    xs = np.linspace(-0.3, 0.3, n)
    gx, gy = np.meshgrid(xs, xs)
    rng = np.random.RandomState(3)
    z = 0.55 + 0.06 * np.sin(6 * gx) * np.cos(5 * gy) + 0.005 * rng.randn(n, n)
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + n, a + n + 1, a + 1])
    from nlos_surface_optimization_tpu.geometry.accel import morton_order_faces

    f = morton_order_faces(v, np.array(faces, np.int32))
    return v, f


def scene_cfg():
    import nlos_surface_optimization_tpu as nst

    return nst.RenderConfig(num_samples=4000, num_bins=600,
                            distance_resolution=2.4e-3, sigma_bin=1,
                            bin_refine_resolution=10, source_chunk=32)


def run_once(dtype_str, backend):
    import jax

    if dtype_str == "f64":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    import nlos_surface_optimization_tpu as nst  # noqa: F401
    from nlos_surface_optimization_tpu.geometry.mesh import make_mesh
    from nlos_surface_optimization_tpu.render.api import inverse_render

    dt = np.float64 if dtype_str == "f64" else np.float32
    v, f = build_scene_np()
    mesh = make_mesh(np.asarray(v, dt), f, dtype=dt)
    cfg = scene_cfg().replace(occl_backend=backend)
    lighting, lnormal = nst.make_confocal_scan(8)
    L, B = lighting.shape[0], cfg.num_bins
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.rand(L, B).astype(dt) * 1e-4)
    weight = jnp.ones((L, B), dt)
    key = jax.random.key(7)
    t, g, _ = inverse_render(mesh, data, weight, lighting.astype(dt),
                             lnormal.astype(dt), cfg, key)
    return (np.asarray(t, np.float64),
            np.asarray(g, np.float64)[: v.shape[0]])


def main():
    if "--cpu-ref" in sys.argv:
        import numpy as np

        t, g = run_once("f64", "jnp")
        np.savez(REF_PATH, t=t, g=g)
        print("ref written")
        return

    import numpy as np

    if not os.path.exists(REF_PATH):
        print("computing CPU f64 reference in a subprocess...")
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--cpu-ref"], cwd=ROOT, timeout=1800)
        if r.returncode != 0:
            print("FAIL (reference run failed)")
            sys.exit(1)

    ref = np.load(REF_PATH)
    t_ref, g_ref = ref["t"], ref["g"]
    tc_ref = np.cumsum(t_ref, axis=1)
    tc_scale = np.abs(tc_ref).max()
    t_scale = np.abs(t_ref).max()
    g_scale = np.abs(g_ref).max()

    import jax

    platform = jax.devices()[0].platform
    print(f"platform: {platform}")
    results = {}
    ok_all = True
    base_t = base_g = None
    for be in ("jnp", "mxu", "pallas", "fused"):
        try:
            t, g = run_once("f32", be)
            te = float(np.abs(np.cumsum(t, axis=1) - tc_ref).max()
                       / max(tc_scale, 1e-300))
            ge = float(np.abs(g - g_ref).max() / max(g_scale, 1e-300))
            if base_t is None:
                base_t, base_g = t, g
                xt = xg = 0.0
            else:
                xt = float(np.abs(t - base_t).max() / max(t_scale, 1e-300))
                xg = float(np.abs(g - base_g).max() / max(g_scale, 1e-300))
            ok = (np.isfinite(t).all() and np.isfinite(g).all()
                  and te < FWD_CUM_RTOL and ge < GRAD_RTOL
                  and xt < XBACKEND_FWD_RTOL and xg < XBACKEND_GRAD_RTOL)
            print(f"{be:8s} fwd_cum={te:.3e} (<{FWD_CUM_RTOL})  "
                  f"grad={ge:.3e} (<{GRAD_RTOL})  "
                  f"vs_jnp fwd={xt:.1e} grad={xg:.1e}  "
                  f"{'ok' if ok else 'FAIL'}")
            results[be] = {"fwd_cum_rel": te, "grad_rel": ge,
                           "xbackend_fwd": xt, "xbackend_grad": xg,
                           "ok": bool(ok)}
            ok_all = ok_all and ok
        except Exception as e:  # noqa: BLE001 — a crash IS the signal
            print(f"{be:8s} CRASH: {type(e).__name__}: {str(e)[:200]}")
            results[be] = {"crash": str(e)[:200]}
            ok_all = False

    out = {"platform": platform, "pass": bool(ok_all), "backends": results}
    with open(os.path.join(ROOT, "TPU_NUMERICS_GATE.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print("PASS" if ok_all else "FAIL")
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
