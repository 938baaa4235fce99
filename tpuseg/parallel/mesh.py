"""Mesh / sharding layer — the framework's communication backend.

The reference has no distributed machinery at all (SURVEY.md §2.8); this
layer is the TPU-native equivalent: a first-class 1-D data mesh over the
slice (v5e-8 and beyond), ``NamedSharding`` annotations for batches,
replicated parameters, and XLA-emitted ICI collectives for the gradient
mean (automatic SPMD under jit).  Model size (<5M params) does not warrant
TP/PP; spatial (sequence-parallel) sharding of the 256x256 maps is the
documented extension point (SURVEY.md §5.7).

Testable on a faked multi-device CPU backend via
``XLA_FLAGS=--xla_force_host_platform_device_count=8``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over the first n available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad the batch axis by repeating the first element (the reference pads
    short batches the same way, dataset.py:330-333).  Returns (padded,
    n_valid)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = np.repeat(np.take(arr, [0], axis=axis), rem, axis=axis)
    return np.concatenate([arr, pad], axis=axis), n


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put every leaf with its batch dim sharded over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
