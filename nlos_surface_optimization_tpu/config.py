"""Render configuration.

The reference keeps its config in ad-hoc per-script ``class OPT`` blocks
(reference: transient_rendering_cython/exp_bunny/test.py:16-47).  Here it is a
frozen, hashable dataclass so it can be passed as a static argument to jitted
renderers, plus a helper building the confocal scan grid
(reference: exp_bunny/test.py:20-32).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static renderer options (hashable; safe as a jit static arg).

    Mirrors the semantics of the reference OPT fields
    (exp_bunny/test.py:33-47) plus the renderer-variant switches that the
    reference spreads over four native modules (smoothed_transient / ggx /
    jitter / stratified_transient_raytracer).
    """

    # Monte-Carlo budget: total samples; per-face count is
    # 1 + (num_samples - 1) // num_faces  (transient_and_gradient.cpp:289).
    num_samples: int = 2500

    # Temporal axis: B bins of width `distance_resolution` meters of path
    # length, starting at `bin_lower` (exp_bunny/test.py:33-34).
    num_bins: int = 1200
    distance_resolution: float = 1.2e-3
    bin_lower: float = 0.0

    # Gaussian temporal smoothing: sigma = resolution*sigma_bin/2.355,
    # kernel support 4*refine*sigma_bin+1 sub-bins of width resolution/refine
    # (transient_and_gradient.cpp:348-355).  The forward transient is only
    # smoothed when sigma_bin >= 5 (stratifiedStreamedGradientRenderer.cpp:
    # 521-524 forces refine=1 otherwise); the gradient always uses the
    # smoothed-loss kernel.
    bin_refine_resolution: int = 10
    sigma_bin: int = 1

    # Shading: 'fn' face normals or 'vn' interpolated vertex normals
    # (renderer.pyx:116-135).
    normal: str = "fn"

    # Gate for the normal-derivative gradient term gn in vn mode
    # (transient_and_gradient.cpp:959-964).
    testing_flag: int = 1

    # loss_flag == 1 transforms difference d -> 2*d^3 before weighting
    # (stratifiedStreamedGradientRenderer.cpp:546-549).
    loss_flag: int = 0

    # BRDF variant: 'lambertian' (form-factor^2) or 'ggx' (x D*G^2/4,
    # ggx/ggx_confocal.cpp).
    brdf: str = "lambertian"

    # Epsilons for the occlusion test (Embree nearest-hit == sampled-face
    # semantics re-expressed as a segment occlusion query).
    occl_t_rel: float = 1e-4
    occl_t_min: float = 1e-6

    # Replicate the reference's GGX BRDF_dx formula verbatim (it divides
    # only the parallel component by halfLength due to a C++ operator-
    # precedence slip, ggx/transient_and_gradient.cpp:759).  Default False =
    # mathematically correct projection (-dw + dir*dot(dir,dw))/h, which the
    # autograd twin confirms.
    ggx_compat_dx: bool = False

    # Legacy (v1) loss smoothing: box-filter the difference twice with a
    # normalized (2*width+1)-tap box before the gradient pass
    # (stratified_transient_raytracer/stratifiedStreamedGradientRenderer.cpp
    # :447-462).  0 disables (the production Gaussian path).
    loss_smooth_width: int = 0

    # Number of scan points rendered per jitted chunk (memory knob).
    source_chunk: int = 0  # 0 = all sources in one chunk

    # Visibility backend: 'auto' picks, on TPU, the fused occlusion+splat
    # kernel ('fused', render/fused_kernels.py) for meshes that fit the
    # VMEM-resident triangle soup and the tiled candidate-list kernel
    # ('pallas', render/pallas_kernels.py) above that; 'jnp' (lax.scan
    # over face tiles) elsewhere.  Any of 'fused'/'pallas'/'mxu'/'jnp'
    # can be forced.
    occl_backend: str = "auto"

    # Analytic-backward backend: 'auto' fuses the per-ray gradient math +
    # per-face reduction into the Pallas kernel (render/bwd_kernels.py) ON
    # TPU for Lambertian vertex gradients; 'fused' forces the kernel
    # (interpret mode off-TPU, f32 — for parity tests); 'xla' forces the
    # plain-XLA backward_chunk everywhere.
    bwd_backend: str = "auto"

    @property
    def bin_upper(self) -> float:
        return self.bin_lower + self.num_bins * self.distance_resolution

    @property
    def sigma(self) -> float:
        return self.distance_resolution * self.sigma_bin / 2.355

    @property
    def kernel_taps(self) -> int:
        return 4 * self.bin_refine_resolution * self.sigma_bin + 1

    @property
    def forward_refine(self) -> int:
        """Refine scale actually used by the forward pass (the reference's
        tmp_refine_scale trick, stratifiedStreamedGradientRenderer.cpp:521)."""
        return 1 if self.sigma_bin < 5 else self.bin_refine_resolution

    def samples_per_face(self, num_faces: int) -> int:
        return 1 + (self.num_samples - 1) // max(num_faces, 1)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


def make_confocal_scan(
    resolution: int,
    lower: Tuple[float, float] = (-0.25, -0.25),
    upper: Tuple[float, float] = (0.25, 0.25),
    wall_z: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Confocal scan grid on the LOS wall.

    Returns (lighting [L,3] f32, lighting_normal [L,3] f32) with L=res^2,
    row-major over a meshgrid like the reference (exp_bunny/test.py:20-32):
    x varies fastest within a row of constant y.
    """
    xs = np.linspace(lower[0], upper[0], resolution)
    ys = np.linspace(lower[1], upper[1], resolution)
    gx, gy = np.meshgrid(xs, ys)
    lighting = np.stack(
        [gx.reshape(-1), gy.reshape(-1), np.full(resolution * resolution, wall_z)],
        axis=1,
    ).astype(np.float32)
    normal = np.tile(np.array([0.0, 0.0, 1.0], dtype=np.float32), (lighting.shape[0], 1))
    return np.ascontiguousarray(lighting), np.ascontiguousarray(normal)


def num_bins_for(lower: float, upper: float, resolution: float) -> int:
    """B = ceil((upper-lower)/resolution), as in renderer.pyx:43."""
    return int(math.ceil((upper - lower) / resolution))
