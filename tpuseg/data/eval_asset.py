"""Frozen evaluation asset (VERDICT r3 missing #1).

Every quality number before round 4 was measured on scenes re-generated
from ``tpuseg.data.synthetic`` at report time — and the generator itself
was hardened between rounds, so cross-round SBD/|DiC| numbers were not
measured on a fixed distribution.  Real CVPPP data cannot land in this
environment, so the auditable substitute is a **versioned, committed
eval asset**: a compact container generated ONCE, whose bytes are pinned
by sha256, from which the evaluate.py ground-truth tree (reference
layout: ``/root/reference/code/evaluate.py:60-92``) is materialized
deterministically at report time.

Asset layout (committed under ``assets/``)::

    eval_hard64.tsbin / eval_hard64.tsidx   blob file + JSON index
    eval_hard64.sha256                      pinned hashes of both files

Per sample the container stores the PNG-encoded RGB exactly as generated
plus a PNG-encoded instance *label map* (instances are disjoint after
the generator's occlusion pass, so the label map is a lossless encoding
of the mask stack — and PNG shrinks it ~50× vs the raw stack).
Materialize writes both PNG byte strings back verbatim (no re-encode)
and derives ``_fg.png`` as ``label > 0``, so the materialized tree is a
function of the asset bytes only.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
from typing import Dict, List

import numpy as np
from PIL import Image

EVAL_MAGIC = b"TSEV0001"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _png_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def freeze_eval_records(
    prefix: str,
    n_samples: int = 64,
    seed: int = 99,
    height: int = 256,
    width: int = 256,
    hard: bool = True,
    max_leaves: int = 14,
    min_leaves: int = 3,
) -> dict:
    """Generate the eval scenes once and write them as a pinned asset +
    a ``.sha256`` sidecar.  Returns the hash dict.  Defaults reproduce
    the distribution every round-3 hard-64 REPORT number was drawn from
    (tools/quality_report.py: seed 99, hard, max_leaves=14)."""
    from tpuseg.data.synthetic import make_scene

    rng = np.random.default_rng(seed)
    index: List[Dict] = []
    with open(prefix + ".tsbin", "wb") as binf:
        binf.write(EVAL_MAGIC)
        offset = len(EVAL_MAGIC)

        def blob(data: bytes):
            nonlocal offset
            binf.write(data)
            ref = [offset, len(data)]
            offset += len(data)
            return ref

        for _ in range(n_samples):
            rgb, sem, ins, n = make_scene(
                rng, height, width, min_leaves=min_leaves,
                max_leaves=max_leaves, hard=hard,
            )
            label = np.zeros(sem.shape, np.uint8)
            for j in range(ins.shape[-1]):
                label[ins[..., j] > 0] = j + 1
            index.append({
                "image": blob(_png_bytes(rgb)),
                "label": blob(_png_bytes(label)),
                "n_objects": int(n),
            })
    with open(prefix + ".tsidx", "w") as f:
        json.dump({
            "format": "eval_tree_v1",
            "num_samples": len(index),
            "generator": {
                "seed": seed, "hard": hard, "height": height,
                "width": width, "min_leaves": min_leaves,
                "max_leaves": max_leaves,
            },
            "samples": index,
        }, f)
    hashes = {
        os.path.basename(prefix) + ".tsbin": _sha256(prefix + ".tsbin"),
        os.path.basename(prefix) + ".tsidx": _sha256(prefix + ".tsidx"),
    }
    with open(prefix + ".sha256", "w") as f:
        for name, digest in sorted(hashes.items()):
            f.write(f"{digest}  {name}\n")
    return hashes


def verify_eval_records(prefix: str) -> None:
    """Raise if the asset bytes do not match the pinned hashes."""
    with open(prefix + ".sha256") as f:
        pinned = dict(
            reversed(line.split()) for line in f.read().splitlines() if line
        )
    base = os.path.dirname(os.path.abspath(prefix))
    for name, digest in pinned.items():
        actual = _sha256(os.path.join(base, name))
        if actual != digest:
            raise ValueError(
                f"frozen eval asset {name} hash mismatch: "
                f"pinned {digest}, on disk {actual}"
            )


def materialize_eval_tree(
    records_prefix: str, root: str, verify: bool = True
) -> str:
    """Write the on-disk ground-truth layout evaluate.py expects
    (metadata lst/counts + A1 dir with plantXXXX_rgb/_label/_fg PNGs,
    reference reader: ``evaluate.py:60-92``) from the frozen asset.
    Deterministic: RGB and label PNG bytes are copied verbatim from the
    blobs; fg is derived as label>0.  Returns the list-file path (same
    contract as ``write_synthetic_eval_tree``)."""
    if verify and os.path.isfile(records_prefix + ".sha256"):
        verify_eval_records(records_prefix)
    with open(records_prefix + ".tsidx") as f:
        idx = json.load(f)
    img_dir = os.path.join(
        root, "data", "raw", "CVPPP", "CVPPP2017_LSC_training", "training",
        "A1",
    )
    meta = os.path.join(root, "data", "metadata", "CVPPP")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(meta, exist_ok=True)
    paths, counts = [], []
    with open(records_prefix + ".tsbin", "rb") as binf:
        assert binf.read(len(EVAL_MAGIC)) == EVAL_MAGIC, "bad eval asset"

        def blob(ref) -> bytes:
            binf.seek(ref[0])
            return binf.read(ref[1])

        for i, rec in enumerate(idx["samples"]):
            name = f"plant{i:04d}"
            with open(os.path.join(img_dir, name + "_rgb.png"), "wb") as f:
                f.write(blob(rec["image"]))
            label_png = blob(rec["label"])
            with open(os.path.join(img_dir, name + "_label.png"), "wb") as f:
                f.write(label_png)
            label = np.asarray(Image.open(io.BytesIO(label_png)))
            Image.fromarray((label > 0).astype(np.uint8)).save(
                os.path.join(img_dir, name + "_fg.png")
            )
            paths.append(os.path.join(img_dir, name + "_rgb.png"))
            counts.append((name, rec["n_objects"]))
    lst = os.path.join(meta, "validation_image_paths.txt")
    with open(lst, "w") as f:
        f.write("\n".join(paths) + "\n")
    with open(os.path.join(meta, "number_of_instances.txt"), "w") as f:
        f.write("\n".join(f"{n},{c}" for n, c in counts) + "\n")
    return lst


def default_asset_prefix() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "assets", "eval_hard64",
    )
