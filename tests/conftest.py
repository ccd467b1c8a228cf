"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware.

Note: this image boots an 'axon' TPU PJRT plugin from sitecustomize which
overrides the JAX_PLATFORMS env var, so we must force the platform through
jax.config (backends initialize lazily; XLA_FLAGS is read at first backend
init, which happens after this file runs)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float64 on CPU so oracle comparisons and FD gradchecks are exact; the
# device code paths are dtype-polymorphic (f32 on TPU).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def plane_mesh():
    """The reference's 2-triangle plane scene
    (smoothed_transient/test.py:17-21): a 0.6x0.6 plane at z=0.5."""
    v = np.array(
        [[-0.3, -0.3, 0.5], [0.3, -0.3, 0.5], [-0.3, 0.3, 0.5], [0.3, 0.3, 0.5]],
        np.float32,
    )
    # wound so face normals point toward the wall (-z), as the reference's
    # reconstruction meshes are (rendering.py:105 flips Delaunay winding)
    f = np.array([[0, 2, 1], [2, 3, 1]], np.int32)
    return v, f


@pytest.fixture
def bumpy_mesh():
    """A small irregular height-field mesh (non-planar, some occlusion)."""
    rng = np.random.RandomState(0)
    n = 6
    xs = np.linspace(-0.25, 0.25, n)
    gx, gy = np.meshgrid(xs, xs)
    z = 0.5 + 0.08 * np.sin(6 * gx) * np.cos(5 * gy) + 0.02 * rng.randn(n, n)
    v = np.stack([gx.reshape(-1), gy.reshape(-1), z.reshape(-1)], 1).astype(
        np.float32
    )
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + n, a + n + 1, a + 1])
    return v, np.array(faces, np.int32)


# ---------------------------------------------------------------------------
# Smoke tier: `pytest -m smoke` is the fast pre-commit gate (< 2 min CPU).
# Selection is centralized here (plus any @pytest.mark.smoke decorators):
# one load-bearing test per subsystem — oracle forward/backward parity,
# kernel-vs-jnp parity (pallas + fused), autograd twin, checkpoint
# round-trip, remesh invariants, adam re-derivation.
_SMOKE = {
    "test_forward_matches_oracle[plane_mesh]",
    "test_forward_smoothed_matches_oracle",
    "test_gradient_matches_oracle[plane_mesh]",
    "test_gradient_vn_matches_oracle",
    "test_twin_ggx",
    "test_pallas_occlusion_matches_reference",
    "test_pallas_backend_end_to_end",
    "test_fused_kernel_matches_reference",
    "test_fused_backend_inverse_matches_jnp",
    "test_delta_kernel_equals_raw",
    "test_adam_modified_isotropic_denominator",
    "test_remesh_edge_lengths_and_manifoldness",
    "test_shard_invariance_nondivisible",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        if item.name in _SMOKE:
            item.add_marker(_pytest.mark.smoke)
