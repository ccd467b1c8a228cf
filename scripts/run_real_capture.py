"""Optimize the reference's ACTUAL measured capture on the real chip
(VERDICT r3 #3).

Runs run_experiment('s') against
/root/reference/transient_rendering_cython/exp_s/transient.mat at the true
64x64/B=2048 scale (exp_s/test.py:55-110: lr 1e-4, gamma 0, edge_lr 1,
init from the shipped cnlos_s_threshold.obj), records the l2 history +
final mesh into RESULTS/real_s.npz and appends a summary to RESULTS.md.

Env: NLOS_DATA_DIR (default /root/reference), WORKDIR, MAX_ITERS, SCENE.
Wrap in a shell retry loop — resume=True continues across TPU-worker
restarts.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("NLOS_DATA_DIR", "/root/reference")

import numpy as np

SCENE = os.environ.get("SCENE", "s")
WORKDIR = os.environ.get("WORKDIR", f"/tmp/real_{SCENE}")
MAX_ITERS = int(os.environ.get("MAX_ITERS", "40"))


def main():
    from nlos_surface_optimization_tpu.experiments.run import run_experiment

    events = []
    times = []
    t0 = time.time()
    last = [t0]

    def log(s):
        now = time.time()
        events.append(f"[{now - t0:8.1f}s] {s}")
        if s[:1].isdigit():
            times.append(now - last[0])
        last[0] = now
        print(s, flush=True)

    from nlos_surface_optimization_tpu.experiments.scenes import SCENES
    spec = SCENES[SCENE]

    state, hist = run_experiment(
        SCENE, WORKDIR, max_iters=MAX_ITERS, resume=True, log=log,
    )
    wall = time.time() - t0

    outdir = os.path.join(ROOT, "RESULTS")
    os.makedirs(outdir, exist_ok=True)
    l2 = np.asarray(hist["l2_original"], np.float64)
    np.savez(os.path.join(outdir, f"real_{SCENE}.npz"),
             l2=np.asarray(hist["l2"]), l2_original=l2,
             final_v=state.v, final_f=state.f)

    def curve(x, k=10):
        idx = np.unique(np.linspace(0, len(x) - 1, k).astype(int))
        return "  ".join(f"{i}:{x[i]:.6f}" for i in idx)

    md = f"""

## Real measured capture: scene '{SCENE}' (exp_{SCENE}/transient.mat)

`python scripts/run_real_capture.py` — {len(l2)} iterations in
{wall / 60:.1f} min on one v5e chip against the reference's ACTUAL
measured SPAD capture (64x64 scan, B=2048 @ 1.2 mm,
sample_num={spec.sample_num}, lr0={spec.lr0},
init from the shipped cnlos_{SCENE}_threshold.obj; no GT mesh => no v2;
reference flow: exp_s/test.py:55-110, config exp_s/test.py:18,56,70).

weighted L2: {l2[0]:.6f} -> {l2[-1]:.6f} (x{l2[-1] / l2[0]:.3f});
final mesh {state.f.shape[0]} faces.

l2 curve (iter:value): {curve(l2)}

Event log: {sum(1 for e in events if e.endswith("remesh"))} remesh
block(s), {sum(1 for e in events if "shading based" in e)} shading
switch(es).  Artifacts: `RESULTS/real_{SCENE}.npz`.
"""
    with open(os.path.join(ROOT, "RESULTS.md"), "a") as fh:
        fh.write(md)
    print(json.dumps({"iters": len(l2), "wall_min": wall / 60,
                      "l2_first": float(l2[0]), "l2_last": float(l2[-1]),
                      "faces": int(state.f.shape[0])}))


if __name__ == "__main__":
    main()
