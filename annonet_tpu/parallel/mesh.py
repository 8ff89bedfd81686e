"""Device-mesh construction helpers."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def ensure_virtual_devices(n_devices: int) -> bool:
    """Make at least ``n_devices`` JAX devices visible, virtualizing on CPU.

    Must run before the JAX backend initializes: sets
    --xla_force_host_platform_device_count and forces the cpu platform (the
    axon TPU plugin pre-sets jax_platforms to "axon,cpu", overriding the
    JAX_PLATFORMS env var, so the config must be updated explicitly).
    Returns True if n_devices are now visible, False if the backend was
    already initialized with fewer. Used by the driver's dryrun_multichip
    and, behind ANNONET_TPU_VIRTUAL_MESH=1, by the train CLI's --mesh for
    multi-device testing on single-device hosts.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:
        # no-op if the backend is already initialized on another platform
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    return len(jax.devices()) >= n_devices


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
