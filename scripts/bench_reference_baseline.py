"""Measure the reference's runnable prototype on THIS host (VERDICT r4 #5).

Four rounds of BASELINE.md carried an unfalsifiable ">=5x the reference"
north star because the production renderer (N1, Embree/MKL/TBB) cannot be
built here.  The prototype generation CAN run: the torch autograd
angular-sampling renderer (`transient_rendering_python/rendering_grad.py`
+ `mesh_intersection_grad.py`, the CPU twin of the GPU path
`main_gpu.py:28-60`) and its NumPy forward twin (`rendering.py` +
`mesh_intersection.py`) are pure numpy/torch with no pyigl dependency.
This script imports the reference's OWN code from /root/reference
(read-only; nothing is copied), times it on the bench scene at a common
sub-scale, and records measured paths/s for comparison against this
repo's BENCH numbers.

Workload semantics: one prototype "path sample" casts a primary ray
against all F faces (dense Moller-Trumbore), resolves the nearest hit,
casts a shadow ray against all F faces, shades, and bins — the same
per-path structure as one confocal path of the production renderer (and
of this repo).  fwd+bwd timing includes torch autograd backward to the
vertex gradient, the prototype's gradient path (P7/P9, SURVEY.md).

Caveats recorded with the numbers:
  * the prototype is the reference's VALIDATED but unoptimized
    generation; the unbuildable C++ production renderer is faster on CPU
    (Embree BVH vs dense MT) — this baseline bounds the prototype, and
    the production envelope is bounded separately by its experiment
    scales (BASELINE.md table).
  * torch uses all host cores for the dense MT matmuls; the per-sample
    nearest-hit resolve loop (rendering_grad.py:44-62) is single-thread
    Python — both are the reference's own code, timed as-is.
"""

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
PROTO = "/root/reference/transient_rendering_python"
sys.path.insert(0, PROTO)

SAMPLES = int(os.environ.get("BASE_SAMPLES", "2500"))  # main_gpu.py OPT
REPS = int(os.environ.get("BASE_REPS", "5"))


class OPT:  # main_gpu.py:15-20 fields, bench-scene binning
    sample_num = SAMPLES
    # 2048 bins: every scene path (d1+d2 <= ~1.7 m) bins in-range, keeping
    # clear of the twin's own boundary off-by-one (rendering.py:84 uses
    # `<= max_distance_bin` and would index OOB at exactly the last bin)
    max_distance_bin = 2048
    distance_resolution = 1.2e-3
    epsilon = sys.float_info.epsilon
    normal = "fn"


class MeshNP:
    pass


def bench_scene():
    sys.path.insert(0, ROOT)
    import bench

    m = bench.build_scene()
    return np.asarray(m.v, np.float64), np.asarray(m.f, np.int64)


def hemisphere_directions(n, rng):
    # main_gpu.py:48-56 sampling (frame already +z aligned here)
    phi = 2 * np.pi * rng.rand(n)
    theta = np.arccos(rng.rand(n))
    return np.vstack((np.sin(theta) * np.cos(phi),
                      np.sin(theta) * np.sin(phi),
                      np.cos(theta))).T


def time_numpy_forward(v, f, direction, lighting, sensor, opt):
    import rendering as proto_rendering  # reference numpy twin

    mesh = MeshNP()
    mesh.v = v
    mesh.f = f
    # igl.per_face_normals convention: unit cross((v1-v0), (v2-v0))
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    n = np.cross(e1, e2)
    mesh.fn = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        proto_rendering.angular_sampling(
            mesh, direction, lighting, sensor,
            np.array([0.0, 0.0, 1.0]), np.array([0.0, 0.0, 1.0]), opt)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_torch_fwd_bwd(v, f, direction, lighting, sensor, opt):
    import torch

    # rendering_grad.py was written for torch 0.3, where squeeze() never
    # produced 0-d tensors (len()/iteration on a single-element result
    # worked).  Restore that semantic for the reference's own calls; the
    # numerical behavior is unchanged.
    _orig_squeeze = torch.squeeze

    def _legacy_squeeze(x, *a, **k):
        out = _orig_squeeze(x, *a, **k)
        return out.reshape(-1) if out.dim() == 0 else out

    torch.squeeze = _legacy_squeeze
    import rendering_grad  # reference torch autograd twin

    mesh = MeshNP()
    mesh.v = torch.from_numpy(v).requires_grad_()
    mesh.f = torch.from_numpy(f).long()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        tr = rendering_grad.angular_sampling(
            mesh, direction, lighting, sensor,
            np.array([0.0, 0.0, 1.0]), np.array([0.0, 0.0, 1.0]), opt)
        loss = tr.sum()
        loss.backward()
        mesh.v.grad = None
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    v, f = bench_scene()
    rng = np.random.RandomState(0)
    direction = hemisphere_directions(SAMPLES, rng)
    # collocated source/sensor on the wall below the height field
    lighting = np.array([0.0, 0.0, 0.0])
    sensor = lighting

    opt = OPT()
    t_np = time_numpy_forward(v, f, direction, lighting, sensor, opt)
    t_th = time_torch_fwd_bwd(v, f, direction, lighting, sensor, opt)

    out = {
        "host": os.uname().nodename,
        "cpu_count": os.cpu_count(),
        "faces": int(f.shape[0]),
        "samples": SAMPLES,
        "reps": REPS,
        "numpy_forward_s": t_np,
        "numpy_forward_paths_per_s": SAMPLES / t_np,
        "torch_fwd_bwd_s": t_th,
        # x2: fwd+bwd, matching BENCH's path accounting
        "torch_fwd_bwd_paths_per_s": 2 * SAMPLES / t_th,
        "code": "reference transient_rendering_python rendering_grad/"
                "rendering on bench.build_scene() mesh",
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(ROOT, "BASELINE_MEASURED.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
