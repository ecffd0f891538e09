"""Multi-host runtime entry — `jax.distributed.initialize` + pod-slice meshes.

The reference has no distributed backend at all (SURVEY.md §2.4/§5.8); the
target capability is edge-partitioned training over a pod: one process per
host, ICI collectives inside a slice, DCN across slices. This module is the
launch plumbing:

- `initialize_multihost()` — wraps `jax.distributed.initialize` with env-var
  fallbacks (`COORDINATOR_ADDRESS` / `NUM_PROCESSES` / `PROCESS_ID`, plus the
  TPU autodetection built into jax). No-op for single-process runs, so the
  same train.py works from a laptop to a pod.
- `make_hybrid_mesh(dcn, ici)` — a 2-D ("dp", "graph") mesh with the DCN axis
  outermost: graph-partition collectives (the per-layer boundary halo
  exchange, parallel/planned_sharded.py) ride ICI inside a slice; only the
  gradient psum for data parallelism crosses DCN once per step. Falls back to
  a plain reshape when slice topology is unavailable (CPU fake meshes), which
  is how the 8-virtual-device tests exercise it.

Real multi-host hardware is not reachable in this environment; the logic is
fake-mesh tested (tests/test_parallel.py) and the entry points are wired into
train.py flags.
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialise the multi-process runtime. Returns True if distributed mode
    was activated. Single-process (num_processes in {None on non-TPU-pod, 1})
    is a no-op."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    if num_processes in (None, 0, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def _slice_ids(devices) -> np.ndarray | None:
    ids = [getattr(d, "slice_index", None) for d in devices]
    if any(i is None for i in ids) or len(set(ids)) <= 1:
        return None
    return np.asarray(ids)


def make_hybrid_mesh(dcn: int | None = None, ici: int | None = None,
                     dcn_axis: str = "dp", ici_axis: str = "graph") -> Mesh:
    """(dcn, ici) mesh with DCN outermost so graph collectives stay on ICI.

    With real pod slices, devices are grouped by `slice_index` (the
    `mesh_utils.create_hybrid_device_mesh` layout rule); on fake/CPU meshes
    it degrades to a plain reshape of the device list.
    """
    devices = np.asarray(jax.devices())
    n = len(devices)
    if dcn is None and ici is None:
        sids = _slice_ids(devices)
        dcn = len(set(sids.tolist())) if sids is not None else 1
    if dcn is None:
        dcn = n // ici
    if ici is None:
        ici = n // dcn
    if dcn * ici != n:
        raise ValueError(f"mesh {dcn}x{ici} != {n} devices")
    sids = _slice_ids(devices)
    if sids is not None and len(set(sids.tolist())) == dcn:
        order = np.lexsort((np.arange(n), sids))   # group by slice
        devices = devices[order]
    return Mesh(devices.reshape(dcn, ici), (dcn_axis, ici_axis))


def process_summary() -> dict:
    """Log-friendly view of the distributed runtime state."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
