"""Device-mesh sharding of the renderer (SPMD over scan points).

The reference parallelizes with TBB threads over (source x triangle) work
items and reduces per-thread accumulators sequentially
(smoothed_transient/transient_and_gradient.cpp:308-345).  The TPU-native
equivalent: shard the SOURCE (scan-point) axis over a jax.sharding.Mesh,
replicate the triangle mesh in every device's HBM, and psum the per-vertex
gradient over ICI.  Counter-based sampling keys make results independent of
the shard count (geometry/sampling.py).
"""

from .shard import (  # noqa: F401
    make_source_mesh,
    sharded_render_transient,
    sharded_inverse_render,
)
