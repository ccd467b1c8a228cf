"""Metrics, timers, profiling helpers."""

from .metrics import point_mesh_distance, compute_v2  # noqa: F401
from .timers import PhaseTimer  # noqa: F401
