"""Device-sharded GT generation: create_gt(dmesh=...) renders each shard
source-sharded over the 8-virtual-device mesh and must produce the same
.mat shards as the single-device path (counter RNG => bit-identical) —
the TPU-pod replacement for the reference's 64-process CPU render farm
(exp_bunny/main_create_gt.py:52-56)."""

import glob
import os

import numpy as np
import jax
import pytest
import scipy.io

from nlos_surface_optimization_tpu.experiments.create_gt import create_gt
from nlos_surface_optimization_tpu.experiments.scenes import SceneSpec
from nlos_surface_optimization_tpu.parallel import make_source_mesh


def _gt_mesh(n=8):
    xs = np.linspace(-0.25, 0.25, n)
    gx, gy = np.meshgrid(xs, xs)
    z = 0.5 + 0.05 * np.sin(5 * gx)
    v = np.stack([gx.ravel(), gy.ravel(), z.ravel()], 1).astype(np.float32)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            f += [[a, a + n, a + 1], [a + n, a + n + 1, a + 1]]
    return v, np.array(f, np.int32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_create_gt_sharded_matches_single(tmp_path):
    spec = SceneSpec("tiny", num_bins=240, distance_resolution=5e-3,
                     gt_sample_num=2000, gt_scan_resolution=8)
    v, f = _gt_mesh()
    dmesh = make_source_mesh(jax.devices()[:8])

    fs_sh = create_gt(spec, v, f, str(tmp_path / "sh"), num_shards=4,
                      key=jax.random.key(5), dmesh=dmesh)
    fs_1 = create_gt(spec, v, f, str(tmp_path / "one"), num_shards=4,
                     key=jax.random.key(5))
    assert len(fs_sh) == len(fs_1) == 4
    for a, b in zip(fs_sh, fs_1):
        ta = scipy.io.loadmat(a)["gt_transient"]
        tb = scipy.io.loadmat(b)["gt_transient"]
        assert ta.shape == tb.shape == (16, 240)
        np.testing.assert_array_equal(ta, tb)
    total = sum(scipy.io.loadmat(a)["gt_transient"].sum() for a in fs_sh)
    assert total > 0
