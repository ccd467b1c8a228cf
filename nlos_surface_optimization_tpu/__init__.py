"""TPU-native NLOS surface-optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cmu-ci-lab/nlos_surface_optimization ("Beyond Volumetric Albedo — A Surface
Optimization Framework for Non-Line-of-Sight Imaging", CVPR 2019):
a differentiable confocal transient renderer with analytic vertex gradients,
plus the full inverse-rendering outer loop (remeshing, regularizers,
coarse-to-fine schedules) and the initialization/evaluation pipeline.

Layering (bottom-up):
  geometry/  mesh containers, stratified area sampling, ray-triangle tests
  render/    forward transient renderer + analytic custom_vjp backward
  parallel/  shard_map sharding of (source x sample) work over device meshes
  optim/     Adam_Modified, losses, the plateau/remesh outer loop
  recon/     LCT (light-cone-transform) initialization, space carving
  noise/     SPAD sensor simulation
  io/        OBJ / .mat interop
geomlib/ (C++, repo root) provides host-side mesh surgery (isotropic
remeshing, components, borders, collision-aware integration) between
jitted steps, mirroring the reference's CGAL/El Topo native layer.
"""

__version__ = "0.1.0"

from .config import RenderConfig, make_confocal_scan  # noqa: F401
from .geometry.mesh import Mesh, face_normals_areas, vertex_normals  # noqa: F401
