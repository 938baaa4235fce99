"""Deterministic debug-image dumps (behind an explicit flag).

Reference: the decoder writes ``p_*.jpg / pred_*.jpg / target_*.jpg /
pro.jpg / mas.jpg`` every 40 iterations unconditionally into the CWD
(``attenet2.py:143-179,247-251``; writers ``lib/utils.py:154-174``).  Here
the same artifacts are produced on demand into a chosen directory.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image


def _to_u8(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    mn, mx = float(x.min()), float(x.max())
    if mx > mn:
        x = (x - mn) / (mx - mn)
    return (x * 255).astype(np.uint8)


def write_pro_jpg(
    prob: np.ndarray, background: np.ndarray, path: str,
    point: Optional[int] = None,
) -> None:
    """Normalised probability map masked to the background fg, optional
    sampled-point marker (reference writeProJpg, lib/utils.py:154-167)."""
    h, w = prob.shape[-2:] if prob.ndim > 2 else prob.shape
    pro = np.asarray(prob, np.float32).reshape(h, w)
    back = np.asarray(background, np.float32).reshape(h, w)
    masked = np.where(back > 0, pro, np.nan)
    mn, mx = np.nanmin(masked), np.nanmax(masked)
    denom = (mx - mn) if mx > mn else 1.0
    norm = np.where(back > 0, (pro - mn) / denom, 0.0)
    rgb = np.stack([norm] * 3, axis=-1)
    if point is not None:
        rgb[point // w, point % w] = [0, 0, 1]
    Image.fromarray((rgb * 255).astype(np.uint8)).save(path)


def write_pn_jpg(p_n: np.ndarray, background: np.ndarray, path: str) -> None:
    """Reference writePnJpg (lib/utils.py:169-174)."""
    h, w = np.asarray(background).reshape(-1).shape[0] ** 0.5, 0
    back = np.asarray(background, np.float32)
    side = int(back.size**0.5)
    back = back.reshape(side, side) * 255
    pn = (np.asarray(p_n, np.float32).reshape(side, side) > 0.5) * back
    rgb = np.stack([back, back, pn], axis=-1).astype(np.uint8)
    Image.fromarray(rgb).save(path)


def dump_pyramid_debug(
    out_dir: str,
    preds: Sequence[np.ndarray],     # per level (B, h, w, 2) logits
    targets: Sequence[np.ndarray],   # per level (B, h, w, 1)
    pro: np.ndarray,                 # (B, H, W, 1) merged attention
    mask: np.ndarray,                # (B, H, W, 1) fg mask
    alpha: Optional[np.ndarray] = None,
    sample_idx: int = 0,
    point: Optional[int] = None,
) -> None:
    """The decoder's per-level binary/softmax/target dumps
    (attenet2.py:143-179), deterministic and directory-scoped."""
    os.makedirs(out_dir, exist_ok=True)
    b = min(sample_idx, preds[0].shape[0] - 1)
    for f, (p, t) in enumerate(zip(preds, targets)):
        binary = (p[b, :, :, 1] > p[b, :, :, 0]).astype(np.uint8) * 255
        Image.fromarray(binary).save(os.path.join(out_dir, f"p_{f}.jpg"))
        e = np.exp(p[b] - p[b].max(-1, keepdims=True))
        soft = (e / e.sum(-1, keepdims=True))[:, :, 1]
        Image.fromarray(_to_u8(soft)).save(
            os.path.join(out_dir, f"pred_{f}.jpg")
        )
        Image.fromarray(_to_u8(t[b, :, :, 0])).save(
            os.path.join(out_dir, f"target_{f}.jpg")
        )
    write_pro_jpg(pro[b, :, :, 0], mask[b, :, :, 0],
                  os.path.join(out_dir, "proall.jpg"))
    if alpha is not None:
        write_pro_jpg(alpha[b].reshape(pro.shape[1], pro.shape[2]),
                      mask[b, :, :, 0], os.path.join(out_dir, "pro.jpg"),
                      point)
    Image.fromarray(
        (np.asarray(mask[b, :, :, 0]) * 255).astype(np.uint8)
    ).save(os.path.join(out_dir, "mas.jpg"))
