"""Initialization pipeline: LCT (light-cone transform) reconstruction and
space carving — JAX ports of the reference's MATLAB stage (SURVEY.md §2.3),
so the TPU framework runs end-to-end without MATLAB."""

from .lct import lct_reconstruct, init_mesh_from_lct  # noqa: F401
from .carving import (  # noqa: F401
    space_carve_occupancy,
    carve_mesh,
    space_carving_projection,
)
