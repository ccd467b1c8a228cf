from .mesh import Mesh, face_normals_areas, vertex_normals, pad_mesh  # noqa: F401
from .sampling import stratified_barycoords, barycentric_to_world  # noqa: F401
from .intersect import (  # noqa: F401
    moller_trumbore,
    segment_occluded,
    nearest_hit,
    ray_mesh_barycoords,
)
