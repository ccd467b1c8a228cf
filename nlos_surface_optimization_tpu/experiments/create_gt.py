"""GT transient generation (exp_bunny/main_create_gt.py:44-79).

Renders the GT mesh at high scan resolution and sample count, sharded over
scan-point batches, each written to setup/<scene>_transient_<res>_<i>.mat
with the same keys the reference's drivers load (test.py:69-75)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import scipy.io

from ..config import RenderConfig, make_confocal_scan
from ..geometry.mesh import Mesh, make_mesh, pad_mesh
from ..io.obj import read_obj
from ..render import render_transient_host
from .scenes import SceneSpec


def create_gt(spec: SceneSpec, gt_v: np.ndarray, gt_f: np.ndarray,
              out_dir: str, num_shards: int = 64,
              resolution: Optional[int] = None,
              sample_num: Optional[int] = None,
              key=None, dmesh=None) -> list:
    """Render + shard GT transients; returns the shard file list.

    Pass `dmesh` (jax.sharding.Mesh) to run each shard source-sharded over
    devices (the TPU replacement for the reference's 64-shard CPU farm)."""
    res = resolution or spec.gt_scan_resolution
    samples = sample_num or spec.gt_sample_num
    key = jax.random.key(0) if key is None else key

    # memory knob: the tracer materializes [Lc, F, spt, 3] ray tensors, so
    # cap the per-chunk ray count at ~2M (the flagship working set) — a
    # fixed Lc=256 OOMs HBM on full-resolution GT meshes (bunny: 69k faces)
    F = int(gt_f.shape[0])
    spt0 = 1 + (samples - 1) // max(F, 1)
    chunk = max(1, min(256, 2_000_000 // max(F * spt0, 1)))
    cfg = RenderConfig(
        num_samples=samples,
        num_bins=spec.num_bins,
        distance_resolution=spec.distance_resolution,
        source_chunk=chunk,
        brdf=spec.brdf,   # ggx GT renders with the scene's true alpha
    )
    alpha = spec.ggx_alpha if spec.brdf == "ggx" else None
    lighting, lnormal = make_confocal_scan(
        res, lower=spec.scan_lower, upper=spec.scan_upper
    )
    # Morton-order the GT mesh: every broad phase keys on spatially
    # compact face tiles/groups; raw OBJ face order degrades the
    # candidate lists to full scans (measured: 15x slower GT render on
    # bunny_centered).  Face order only permutes sampling RNG and f32
    # summation — the GT estimate is statistically identical.
    from ..geometry.accel import morton_order_faces
    gt_f = morton_order_faces(gt_v, gt_f)
    mesh = make_mesh(gt_v, gt_f)
    L = lighting.shape[0]
    shards = np.array_split(np.arange(L), num_shards)

    os.makedirs(out_dir, exist_ok=True)
    files = []
    for i, idx in enumerate(shards):
        done = os.path.join(out_dir, f"{spec.name}_transient_{res}_{i}.mat")
        if os.path.exists(done):     # resumable: shard writes are atomic
            files.append(done)
            continue
        if dmesh is not None:
            from ..parallel import sharded_render_transient
            t = sharded_render_transient(
                mesh, lighting[idx], lnormal[idx], cfg, key, dmesh,
                refine=1, alpha=alpha,
            )
        else:
            t, _ = render_transient_host(mesh, lighting[idx], lnormal[idx],
                                         cfg, key, refine=1, alpha=alpha)
        fn = os.path.join(out_dir,
                          f"{spec.name}_transient_{res}_{i}.mat")
        scipy.io.savemat(fn + ".tmp", {
            "gt_transient": np.asarray(t),
            "gt_v": gt_v, "gt_f": gt_f,
            "lighting": lighting[idx],
            "bin_width": spec.distance_resolution,
        })
        os.replace(fn + ".tmp", fn)  # crash-safe: no partial shards
        files.append(fn)
    return files
