"""Multi-host initialization and process-spanning meshes.

The reference's only cross-worker story is a manually sharded GT render
farm (64 .mat shards, main_create_gt.py) and multiprocessing pools in the
prototype (SURVEY.md §2.4).  Here multi-host is first-class: initialize
jax.distributed, build a global mesh over all hosts' devices, and reuse
the exact same shard_map renderers (parallel/shard.py) — the source axis
then spans hosts, gradient psums ride ICI within a host and DCN across.

Usage (one process per host):
    from nlos_surface_optimization_tpu.parallel import multihost
    multihost.initialize(coordinator, num_processes, process_id)
    dmesh = multihost.global_source_mesh()
    t, g = sharded_inverse_render(..., dmesh=dmesh)

Data layout contract: every host passes the FULL (lighting, data, weight)
arrays; jax shards rows by position.  Counter-based sampling keys keep the
result identical to the single-host run.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .shard import AXIS, make_source_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with explicit or env-derived topology."""
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def global_source_mesh():
    """1-D mesh over every device of every host (source-axis sharding)."""
    return make_source_mesh(jax.devices())


def is_coordinator() -> bool:
    return jax.process_index() == 0


def scaling_summary() -> dict:
    return {
        "processes": jax.process_count(),
        "process_index": jax.process_index(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "axis": AXIS,
    }
