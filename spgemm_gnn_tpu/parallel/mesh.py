"""Device mesh helpers."""
from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "graph") -> Mesh:
    """1-D mesh over the graph-partition axis."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(devices, (axis,))
