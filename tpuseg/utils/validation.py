"""Input validation and numerical guards.

The reference's only safety is CHECK_CONTIGUOUS/CHECK_FLOAT asserts in the
C++ kernel plus scattered NaN scrubs (SURVEY.md §5.2).  Here: explicit
shape/dtype checks at API boundaries and jit-safe finiteness guards.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ValidationError(ValueError):
    pass


def _check(cond: bool, msg: str):
    if not cond:
        raise ValidationError(msg)


def check_image_batch(images, n_channels=(3, 21)) -> None:
    """images: (B, H, W, C) with C in n_channels; uint8 for C=3."""
    _check(images.ndim == 4, f"images must be (B,H,W,C), got {images.shape}")
    _check(
        images.shape[-1] in n_channels,
        f"images channels {images.shape[-1]} not in {n_channels}",
    )
    if images.shape[-1] == 3:
        _check(
            images.dtype == np.uint8,
            f"raw RGB batches must be uint8, got {images.dtype}",
        )


def check_batch(batch: Dict, n_classes: int, max_n_objects: int) -> None:
    """Validate a training batch contract (the collate output)."""
    for key in ("images", "sem_onehot", "ins_masks", "n_objects"):
        _check(key in batch, f"batch missing '{key}'")
    check_image_batch(batch["images"])
    b, h, w, _ = batch["images"].shape
    _check(
        batch["sem_onehot"].shape == (b, h, w, n_classes),
        f"sem_onehot shape {batch['sem_onehot'].shape} != {(b, h, w, n_classes)}",
    )
    _check(
        batch["ins_masks"].shape == (b, h, w, max_n_objects),
        f"ins_masks shape {batch['ins_masks'].shape} != {(b, h, w, max_n_objects)}",
    )
    _check(batch["n_objects"].shape == (b,), "n_objects must be (B,)")
    _check(
        int(np.max(np.asarray(batch["n_objects"]))) <= max_n_objects,
        "n_objects exceeds max_n_objects",
    )


def assert_finite(x: jnp.ndarray, name: str = "tensor") -> jnp.ndarray:
    """jit-safe finiteness check (uses jax.debug machinery via checkify-free
    error printing); returns x unchanged."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.debug.callback(
        lambda b, n=name: (_raise_nonfinite(n) if bool(b) else None), bad
    )
    return x


def _raise_nonfinite(name):
    raise FloatingPointError(f"non-finite values in {name}")


def nan_guard(x: jnp.ndarray, value: float = 0.0) -> jnp.ndarray:
    """Replace NaNs (the reference's torch.where(isnan) scrub,
    modules/utils.py:297,655)."""
    return jnp.where(jnp.isnan(x), value, x)
