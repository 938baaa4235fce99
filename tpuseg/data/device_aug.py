"""On-device training augmentation (fused into the jitted train step).

The host pipeline (`AlignCollate('training', ...)`, re-deriving the
reference's ``lib/dataset.py:175-325`` / ``lib/preprocess.py``) runs
PIL/numpy per sample; on a host-starved machine (this box has ONE core)
it rate-limits the whole train loop — the TPU idles while PIL flips
images.  This module re-expresses the *static-shape* subset of those
transforms as batched jnp ops so they compile into the train step:

  geometric (applied consistently to image + semantic + instances):
    hflip / vflip / transpose (p=0.5 each)  — dataset.py:203-217
    rot90 k∈{0,1,2,3}                        — dataset.py:218-222
  photometric (image only):
    color jitter: brightness/contrast/saturation ±0.4
                                             — lib/utils.py:58-59
    gamma in [0.7, 1.3)                      — preprocess.py:405-427
    channel remap (choice WITH replacement, p=0.5)
                                             — preprocess.py:381-390
    grayscale p=0.3                          — RandomGrayscale

Deliberately NOT on device (dynamic output shapes / resampling —
remain host-side via AlignCollate when full parity with the reference's
augmentation distribution is wanted): degrade_resolution, small-angle
rotation with random background, center_cut, HSV hue shift (the device
color jitter applies brightness/contrast/saturation in fixed order;
PIL applies them in random order — a distributional approximation, not
an equivalence; see tests/test_device_aug.py for what IS exact).

All randomness flows from the explicit PRNG key; everything is
per-sample (vmap-free: flags broadcast over the batch with
``jnp.where``; rot90 combines 4 statically-rotated copies with a
one-hot — elementwise bandwidth, negligible next to the step's convs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _luma(img):
    """PIL 'L' conversion weights (ITU-R 601-2)."""
    return (
        img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    )[..., None]


def _apply_spatial(x, hf, vf, tr, rotk, h_axis, w_axis):
    """Apply per-sample flips/transpose/rot90 to one spatial tensor.

    x: (B, H, W, C); hf/vf/tr: (B,) bool; rotk: (B,) int32 in [0,4).
    """
    bshape = (-1,) + (1,) * (x.ndim - 1)
    if hf is not None:
        x = jnp.where(hf.reshape(bshape), jnp.flip(x, axis=w_axis), x)
    if vf is not None:
        x = jnp.where(vf.reshape(bshape), jnp.flip(x, axis=h_axis), x)
    if tr is not None:
        x = jnp.where(tr.reshape(bshape), jnp.swapaxes(x, h_axis, w_axis), x)
    if rotk is not None:
        rots = jnp.stack(
            [jnp.rot90(x, k=k, axes=(h_axis, w_axis)) for k in range(4)]
        )  # (4, B, H, W, C)
        onehot = jax.nn.one_hot(rotk, 4, dtype=x.dtype)  # (B, 4)
        onehot = jnp.moveaxis(onehot, -1, 0).reshape((4,) + bshape)
        x = jnp.sum(rots * onehot, axis=0)
    return x


def device_augment(batch: dict, key, cfg) -> dict:
    """Augment a training batch on device.

    batch: images (B,H,W,3) uint8, sem_onehot (B,H,W,C) f32,
           ins_masks (B,H,W,N) f32, n_objects (B,) — the AlignCollate
           output collated in 'test' mode (no host augmentation).
    cfg: DataConfig — the same flags gate the same transforms as the
    host path.  Returns a new batch dict; images stay uint8.
    """
    imgs = batch["images"].astype(jnp.float32)
    sem = batch["sem_onehot"]
    ins = batch["ins_masks"]
    b = imgs.shape[0]
    square = imgs.shape[1] == imgs.shape[2]

    (k_hf, k_vf, k_tr, k_rot, k_bri, k_con, k_sat, k_gam, k_swp, k_swpi,
     k_gry) = jax.random.split(key, 11)

    hf = jax.random.bernoulli(k_hf, 0.5, (b,)) if cfg.hflip else None
    vf = jax.random.bernoulli(k_vf, 0.5, (b,)) if cfg.vflip else None
    tr = (jax.random.bernoulli(k_tr, 0.5, (b,))
          if (cfg.transpose and square) else None)
    rotk = (jax.random.randint(k_rot, (b,), 0, 4)
            if (cfg.rot90 and square) else None)

    if any(f is not None for f in (hf, vf, tr, rotk)):
        imgs = _apply_spatial(imgs, hf, vf, tr, rotk, 1, 2)
        sem = _apply_spatial(sem, hf, vf, tr, rotk, 1, 2)
        ins = _apply_spatial(ins, hf, vf, tr, rotk, 1, 2)

    if cfg.color_jitter:
        fb = 1.0 + jax.random.uniform(k_bri, (b, 1, 1, 1), minval=-0.4,
                                      maxval=0.4)
        imgs = imgs * fb
        fc = 1.0 + jax.random.uniform(k_con, (b, 1, 1, 1), minval=-0.4,
                                      maxval=0.4)
        # ImageEnhance.Contrast blends with the image's mean luminance
        mean_l = jnp.mean(_luma(imgs), axis=(1, 2), keepdims=True)
        imgs = imgs * fc + (1.0 - fc) * mean_l
        fs = 1.0 + jax.random.uniform(k_sat, (b, 1, 1, 1), minval=-0.4,
                                      maxval=0.4)
        imgs = imgs * fs + (1.0 - fs) * _luma(imgs)
        imgs = jnp.clip(imgs, 0.0, 255.0)

    if cfg.gamma:
        g = jax.random.uniform(k_gam, (b, 1, 1, 1)) * 0.6 + 0.7
        imgs = 255.0 * (jnp.clip(imgs, 0.0, 255.0) / 255.0) ** g

    if cfg.channel_swap:
        do = jax.random.bernoulli(k_swp, 0.5, (b,))
        # reference draws WITH replacement: channels may repeat
        idx = jax.random.randint(k_swpi, (b, 3), 0, 3)
        remapped = jnp.take_along_axis(imgs, idx[:, None, None, :], axis=3)
        imgs = jnp.where(do[:, None, None, None], remapped, imgs)

    if cfg.grayscale:
        do = jax.random.bernoulli(k_gry, 0.3, (b,))
        gray = jnp.broadcast_to(jnp.round(_luma(imgs)), imgs.shape)
        imgs = jnp.where(do[:, None, None, None], gray, imgs)

    out = dict(batch)
    out["images"] = jnp.clip(jnp.round(imgs), 0, 255).astype(jnp.uint8)
    out["sem_onehot"] = sem
    out["ins_masks"] = ins
    return out
