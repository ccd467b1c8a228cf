from .api import (  # noqa: F401
    render_transient,
    render_transient_host,
    render_intensity,
    render_intensity_host,
    inverse_render,
    inverse_render_host,
    inverse_render_albedo,
    inverse_render_alpha,
    render_transient_jitter,
    inverse_render_jitter,
    vertex_gradient_bins,
    transient_loss_and_grad,
)
from .kernels import gaussian_kernel, jitter_convolve  # noqa: F401
from .regularizers import (  # noqa: F401
    curvature_gradient,
    normal_smoothing,
    total_area,
)
