from .api import (  # noqa: F401
    render_transient,
    render_intensity,
    inverse_render,
    inverse_render_albedo,
    vertex_gradient_bins,
    transient_loss_and_grad,
)
from .kernels import gaussian_kernel  # noqa: F401
