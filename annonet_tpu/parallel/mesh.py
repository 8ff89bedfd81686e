"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("batch",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a Mesh over the first ``n_devices`` devices.

    Default is a 1-D "batch" (data-parallel) mesh — the natural axis for
    this workload (SURVEY.md §2.3: DP is THE parallelism axis; there is no
    attention/TP to shard). Multi-axis shapes are supported for forward
    compatibility (e.g. ("batch", "tiles")).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices but only {len(devices)} available"
        )
    if shape is None:
        shape = (n_devices,) if len(axis_names) == 1 else None
    if shape is None or len(shape) != len(axis_names):
        raise ValueError("shape must match axis_names")
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} does not use {n_devices} devices")
    mesh_devices = np.asarray(devices[:n_devices]).reshape(shape)
    return Mesh(mesh_devices, axis_names)
