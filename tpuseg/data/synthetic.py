"""Synthetic CVPPP-style data generator.

The reference repo ships only metadata (no raw images), so tests, smoke
training runs and benchmarks use generated plant-like scenes: randomly
placed/rotated ellipse "leaves" around a rosette center, with exact
per-instance masks — the same data contract as the real pipeline
(image PNG + semantic mask + per-instance mask stack + count).
"""

from __future__ import annotations

import io
import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from tpuseg.data.records import RecordWriter


def make_scene(
    rng: np.random.Generator,
    height: int = 256,
    width: int = 256,
    min_leaves: int = 3,
    max_leaves: int = 12,
    hard: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Returns (rgb uint8 (H,W,3), semantic (H,W) {0,1}, instances
    (H,W,N) {0,1}, n).

    ``hard=True`` is the round-2 difficulty preset: off-center plants,
    wider leaf-size variance, wavy leaf boundaries, and tighter packing
    (more occlusion) — the eval hardening VERDICT r1 asked for."""
    n = int(rng.integers(min_leaves, max_leaves + 1))
    yy, xx = np.mgrid[0:height, 0:width]
    cy, cx = height / 2.0, width / 2.0
    if hard:
        cy += rng.uniform(-0.15, 0.15) * height
        cx += rng.uniform(-0.15, 0.15) * width
    img = np.zeros((height, width, 3), np.float32)
    # soil-ish background with noise
    img[..., 0] = 60 + 20 * rng.random((height, width))
    img[..., 1] = 45 + 15 * rng.random((height, width))
    img[..., 2] = 35 + 12 * rng.random((height, width))
    instances = []
    for i in range(n):
        ang = rng.random() * 2 * np.pi
        dmax = 0.26 if hard else 0.32  # tighter packing -> more occlusion
        dist = rng.uniform(0.08, dmax) * min(height, width)
        ecy = cy + np.sin(ang) * dist
        ecx = cx + np.cos(ang) * dist
        lo, hi = (0.04, 0.20) if hard else (0.06, 0.16)
        a = rng.uniform(lo, hi) * min(height, width)  # semi-major
        b = a * rng.uniform(0.35, 0.7)  # semi-minor
        # orient the leaf along the radial direction
        ca, sa = np.cos(ang), np.sin(ang)
        u = (xx - ecx) * ca + (yy - ecy) * sa
        v = -(xx - ecx) * sa + (yy - ecy) * ca
        r2 = (u / a) ** 2 + (v / b) ** 2
        if hard:
            # wavy leaf boundary: radius modulated around the contour
            theta = np.arctan2(v / max(b, 1e-6), u / max(a, 1e-6))
            wav = 1.0 + rng.uniform(0.05, 0.18) * np.sin(
                rng.integers(3, 7) * theta + rng.random() * 2 * np.pi
            )
            mask = r2 <= wav
        else:
            mask = r2 <= 1.0
        instances.append(mask.astype(np.uint8))
        g = rng.uniform(110, 200)
        shade = 1.0 - 0.5 * np.clip(r2, 0, 1)
        img[mask, 0] = (30 + 25 * rng.random()) * shade[mask]
        img[mask, 1] = g * (0.6 + 0.4 * shade[mask])
        img[mask, 2] = (25 + 30 * rng.random()) * shade[mask]
    instance = np.stack(instances, axis=-1)
    # later leaves occlude earlier ones
    claim = np.zeros((height, width), bool)
    for i in range(n - 1, -1, -1):
        m = instance[..., i].astype(bool) & ~claim
        instance[..., i] = m.astype(np.uint8)
        claim |= m
    # drop fully occluded leaves
    keep = [i for i in range(n) if instance[..., i].sum() > 8]
    instance = instance[..., keep] if keep else np.zeros(
        (height, width, 1), np.uint8
    )
    n = instance.shape[-1]
    semantic = (instance.sum(-1) > 0).astype(np.uint8)
    rgb = np.clip(img + rng.normal(0, 3, img.shape), 0, 255).astype(np.uint8)
    return rgb, semantic, instance, n


def write_synthetic_records(
    prefix: str,
    n_samples: int,
    seed: int = 0,
    height: int = 256,
    width: int = 256,
    **scene_kw,
) -> None:
    rng = np.random.default_rng(seed)
    w = RecordWriter(prefix)
    for _ in range(n_samples):
        rgb, sem, ins, n = make_scene(rng, height, width, **scene_kw)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        w.add(buf.getvalue(), sem, ins, n)
    w.close()


def write_synthetic_eval_tree(
    root: str, n_samples: int, seed: int = 0, height: int = 256,
    width: int = 256, **scene_kw,
):
    """Build the on-disk ground-truth layout evaluate.py expects:
    metadata (validation_image_paths.txt, number_of_instances.txt) + A1
    dir with plantXXX_rgb.png / _label.png / _fg.png.  Returns the list
    file path."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(
        root, "data", "raw", "CVPPP", "CVPPP2017_LSC_training", "training", "A1"
    )
    meta = os.path.join(root, "data", "metadata", "CVPPP")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(meta, exist_ok=True)
    paths, counts = [], []
    for i in range(n_samples):
        rgb, sem, ins, n = make_scene(rng, height, width, **scene_kw)
        name = f"plant{i:04d}"
        label = np.zeros(sem.shape, np.uint8)
        for j in range(ins.shape[-1]):
            label[ins[..., j] > 0] = j + 1
        Image.fromarray(rgb).save(os.path.join(img_dir, name + "_rgb.png"))
        Image.fromarray(label).save(os.path.join(img_dir, name + "_label.png"))
        Image.fromarray(sem).save(os.path.join(img_dir, name + "_fg.png"))
        paths.append(os.path.join(img_dir, name + "_rgb.png"))
        counts.append((name, n))
    lst = os.path.join(meta, "validation_image_paths.txt")
    with open(lst, "w") as f:
        f.write("\n".join(paths) + "\n")
    with open(os.path.join(meta, "number_of_instances.txt"), "w") as f:
        f.write("\n".join(f"{n},{c}" for n, c in counts) + "\n")
    return lst
