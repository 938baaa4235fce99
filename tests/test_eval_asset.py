"""Frozen eval asset (VERDICT r3 #1): pinned bytes, deterministic
materialization, tamper detection."""

import os

import numpy as np
import pytest
from PIL import Image

from tpuseg.data.eval_asset import (
    default_asset_prefix,
    freeze_eval_records,
    materialize_eval_tree,
    verify_eval_records,
)

ASSET = default_asset_prefix()


def test_committed_asset_hashes_verify():
    verify_eval_records(ASSET)


def test_materialize_layout_and_content(tmp_path):
    lst = materialize_eval_tree(ASSET, str(tmp_path))
    paths = open(lst).read().splitlines()
    assert len(paths) == 64
    counts = {
        line.split(",")[0]: int(line.split(",")[1])
        for line in open(
            os.path.join(str(tmp_path), "data", "metadata", "CVPPP",
                         "number_of_instances.txt")
        ).read().splitlines()
    }
    # spot-check sample 0: label ids are dense 1..n, fg == label>0,
    # count file matches label content
    p0 = paths[0]
    label = np.asarray(Image.open(p0.replace("_rgb.png", "_label.png")))
    fg = np.asarray(Image.open(p0.replace("_rgb.png", "_fg.png")))
    ids = np.unique(label)
    n = counts["plant0000"]
    assert ids[0] == 0 and ids[-1] == n and len(ids) == n + 1
    assert np.array_equal(fg > 0, label > 0)
    rgb = np.asarray(Image.open(p0))
    assert rgb.shape == (256, 256, 3) and rgb.dtype == np.uint8


def test_materialize_is_deterministic(tmp_path):
    import hashlib

    def tree_digest(root):
        h = hashlib.sha256()
        base = os.path.join(str(root), "data")
        for dirpath, _, files in sorted(os.walk(base)):
            for name in sorted(files):
                if name.endswith(".png"):
                    with open(os.path.join(dirpath, name), "rb") as f:
                        h.update(name.encode())
                        h.update(f.read())
        return h.hexdigest()

    materialize_eval_tree(ASSET, str(tmp_path / "a"))
    materialize_eval_tree(ASSET, str(tmp_path / "b"))
    assert tree_digest(tmp_path / "a") == tree_digest(tmp_path / "b")


def test_tamper_detection(tmp_path):
    prefix = str(tmp_path / "mini")
    freeze_eval_records(prefix, n_samples=2, seed=5)
    verify_eval_records(prefix)
    with open(prefix + ".tsbin", "r+b") as f:
        f.seek(20)
        f.write(b"\x00\x01")
    with pytest.raises(ValueError, match="hash mismatch"):
        verify_eval_records(prefix)
    with pytest.raises(ValueError):
        materialize_eval_tree(prefix, str(tmp_path / "out"))
