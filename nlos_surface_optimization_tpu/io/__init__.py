"""Mesh and measurement I/O."""

from .obj import read_obj, write_obj  # noqa: F401
from .mat import (  # noqa: F401
    load_transient_shards,
    save_checkpoint,
    load_checkpoint,
)
