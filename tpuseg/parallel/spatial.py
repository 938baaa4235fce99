"""Spatial (sequence-parallel) sharding for large images — SURVEY.md §5.7.

The reference's "sequence length" analogue is spatial resolution, pinned
at 256×256; nothing in it can process a larger field of view than fits
one device.  The TPU-native answer is NOT hand-written halo exchange:
convolutions under ``jit`` with an input sharded over H are spatially
partitioned by XLA's SPMD pass, which inserts the minimal halo collectives
(``collective-permute`` of the kernel-overlap rows) on ICI by itself — the
scaling-book recipe of "pick a mesh, annotate shardings, let XLA insert
collectives".

Two annotation layers:
  * ``make_semantic_spatial`` — the semantic path (UNet + SE + head),
    fully convolutional, halo-only comms;
  * ``make_infer_spatial`` — the FULL instance inference (attend +
    glimpse rounds + pyramid decode) under H-sharding.  The extraction
    loop's global reductions (the per-glimpse attention argmax, the
    remaining-foreground sums) become small cross-shard all-reduces of
    per-shard partials; full-resolution activations never gather — so
    >256² *instance* inference runs on images larger than one device's
    memory.  Measured comms on the 8-device mesh at 512×256 (probe +
    tests/test_spatial_sharding.py): 378 collective-permutes (conv
    halos), all-gathers limited to (a) per-shard scalar partials
    (f32/s32 [B,8]) and (b) three low-channel pyramid maps at ≤¼
    resolution (largest 256 KB vs the ~40 MB 21-channel input
    activation) where a shard holds too few rows to partition a conv.

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


def replicate_state(state, mesh: Mesh):
    """Place a TrainState fully replicated on the mesh (call once before
    a ``make_train_spatial`` loop)."""
    return jax.device_put(state, NamedSharding(mesh, jax.sharding.PartitionSpec()))


def shard_train_batch(batch: dict, mesh: Mesh, axis_name: str = "data"):
    """H-shard the spatial tensors of a training batch; per-sample
    scalars replicate."""
    shard = spatial_sharding(mesh, axis_name)
    repl = NamedSharding(mesh, jax.sharding.PartitionSpec())
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v)
        out[k] = jax.device_put(
            v, shard if v.ndim == 4 else repl
        )
    return out


def make_train_spatial(cfg, model, mesh: Mesh, axis_name: str = "data",
                       **step_kw):
    """Training step with the image HEIGHT sharded across the mesh —
    sequence-parallel TRAINING (SURVEY §5.7; the inference analogue is
    ``make_infer_spatial``).  State stays replicated; XLA's SPMD pass
    spatially partitions every conv in the forward AND backward pass
    (halo collective-permutes both ways), keeps activations H-sharded
    through the glimpse scan, and all-reduces the loss/gradients — so a
    single global batch can train at resolutions whose activations
    exceed one device's HBM, which the reference (pinned to one GPU's
    256² crop, ``/root/reference/code/lib/model.py``) cannot.

    Returns ``step(state, batch, rng) -> (state, metrics)`` — the SAME
    jitted step ``make_train_step`` builds (identical math; equality
    asserted in tests/test_spatial_sharding.py): sharding here is pure
    data placement, propagated by the partitioner from the operands.
    Replicate the state once with ``replicate_state`` and feed batches
    through ``shard_train_batch``.
    """
    from tpuseg.runtime.train import make_train_step

    step = make_train_step(cfg, model, **step_kw)

    def fn(state, batch, rng):
        return step(state, shard_train_batch(batch, mesh, axis_name), rng)

    return fn


def make_infer_spatial(
    model, mesh: Mesh, axis_name: str = "data",
    max_instances: Optional[int] = None, stop_params=None,
):
    """Returns a jitted ``fn(variables, images_u8)`` running the FULL
    instance inference (semantic head + attention + iterative extraction
    + pyramid decode) with the image HEIGHT sharded across the mesh.

    XLA's SPMD pass spatially partitions every conv (halo
    collective-permutes), keeps the elementwise extraction state
    (remaining foreground, id map) sharded, and reduces the glimpse
    argmax / stopping sums across shards — no activation-sized gather
    anywhere (asserted in tests/test_spatial_sharding.py).

    Returns (sem_probs, idmap, counts): sem_probs and idmap stay
    H-sharded; counts (B,) is replicated.
    """
    from tpuseg.data.colorspace import image_ex_standardize

    out_sharding = spatial_sharding(mesh, axis_name)

    @jax.jit
    def fn(variables, images_u8):
        x = image_ex_standardize(images_u8)
        sem_probs, idmap, counts = model.apply(
            variables, x, mode="infer", max_instances=max_instances,
            stop_params=stop_params,
        )
        sem_probs = jax.lax.with_sharding_constraint(sem_probs, out_sharding)
        idmap = jax.lax.with_sharding_constraint(idmap, out_sharding)
        return sem_probs, idmap, counts

    return fn
