"""Spatial (sequence-parallel) sharding for large images — SURVEY.md §5.7.

The reference's "sequence length" analogue is spatial resolution, pinned
at 256×256; nothing in it can process a larger field of view than fits
one device.  The TPU-native answer is NOT hand-written halo exchange:
convolutions under ``jit`` with an input sharded over H are spatially
partitioned by XLA's SPMD pass, which inserts the minimal halo collectives
(``collective-permute`` of the kernel-overlap rows) on ICI by itself — the
scaling-book recipe of "pick a mesh, annotate shardings, let XLA insert
collectives".

This module provides that annotation layer for the semantic path (UNet +
SE + semantic head), which is fully convolutional and therefore spatially
partitionable.  The instance-extraction path is globally sequential (one
attention argmax per glimpse) and stays data-parallel; for >256² inputs
the intended production recipe is: spatial-shard the semantic forward,
then run extraction on the (much cheaper) downsampled feature maps or on
foreground crops.

Height is the sharded axis (NHWC row-major: rows are contiguous, so halo
rows are dense transfers).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """(B, H, W, C) sharded over H across the mesh."""
    return NamedSharding(mesh, P(None, axis_name))


def shard_spatial(x, mesh: Mesh, axis_name: str = "data"):
    """Place an image batch with H split across the mesh.  H must divide
    evenly (pad beforehand; the bucketing helper in runtime/predict
    already rounds H to multiples of 64 ≥ typical mesh sizes)."""
    h = x.shape[1]
    n = mesh.devices.size
    assert h % n == 0, f"H={h} not divisible by {n} devices"
    return jax.device_put(jnp.asarray(x), spatial_sharding(mesh, axis_name))


def make_semantic_spatial(model, mesh: Mesh, axis_name: str = "data"):
    """Returns a jitted ``fn(variables, images_u8)`` computing the semantic
    probabilities with the image HEIGHT sharded across the mesh — XLA
    partitions every conv spatially and emits the halo exchanges.

    The output keeps the spatial sharding (P(None, axis) over H) so a
    downstream sharded consumer pays no gather; ``np.asarray`` on it
    gathers to host when needed.
    """
    from tpuseg.data.colorspace import image_ex_standardize

    out_sharding = spatial_sharding(mesh, axis_name)

    @jax.jit
    def fn(variables, images_u8):
        x = image_ex_standardize(images_u8)
        probs = model.apply(variables, x, mode="semantic")
        return jax.lax.with_sharding_constraint(probs, out_sharding)

    return fn
