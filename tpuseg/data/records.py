"""Packed record dataset format.

The reference stores datasets in LMDB with keys ``image-{i}`` (encoded PNG),
``semantic-annotation-{i}`` / ``instance-annotation-{i}`` (raw uint8
buffers), ``height/width/n_objects-{i}`` and ``num-samples``
(``code/lib/dataset.py:34-61``, writer ``data/scripts/CVPPP/utils.py:14-62``).

This module provides the same contract over a self-contained two-file
format (``.tsidx`` JSON index + ``.tsbin`` blob file) that needs no
external C library, reads via mmap with zero-copy slices, and is written
append-only with an atomic index rename.  When the ``lmdb`` package is
importable, ``LmdbSegDataset`` reads the reference's LMDBs directly and
``convert_lmdb`` migrates them.

An optional C++ acceleration for batched reads lives in
``native/records_io.cpp`` (loaded via ctypes when built); the python mmap
path is the always-available fallback.
"""

from __future__ import annotations

import io
import json
import mmap
import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

MAGIC = b"TSEG0001"


class RecordWriter:
    """Append samples; ``close`` writes the JSON index atomically."""

    def __init__(self, path_prefix: str):
        self.prefix = path_prefix
        os.makedirs(os.path.dirname(os.path.abspath(path_prefix)) or ".",
                    exist_ok=True)
        self._bin = open(path_prefix + ".tsbin", "wb")
        self._bin.write(MAGIC)
        self._offset = len(MAGIC)
        self._index: List[Dict] = []

    def _write_blob(self, data: bytes) -> Tuple[int, int]:
        off = self._offset
        self._bin.write(data)
        self._offset += len(data)
        return off, len(data)

    def add(
        self,
        image_png: bytes,
        semantic: np.ndarray,
        instance: np.ndarray,
        n_objects: int,
    ) -> None:
        """semantic: (H, W) uint8; instance: (H, W, n_objects) uint8."""
        h, w = semantic.shape
        assert instance.shape == (h, w, n_objects), instance.shape
        img_off, img_len = self._write_blob(image_png)
        sem_off, sem_len = self._write_blob(
            np.ascontiguousarray(semantic, np.uint8).tobytes()
        )
        ins_off, ins_len = self._write_blob(
            np.ascontiguousarray(instance, np.uint8).tobytes()
        )
        self._index.append(
            {
                "image": [img_off, img_len],
                "semantic": [sem_off, sem_len],
                "instance": [ins_off, ins_len],
                "height": h,
                "width": w,
                "n_objects": int(n_objects),
            }
        )

    def close(self) -> None:
        self._bin.close()
        tmp = self.prefix + ".tsidx.tmp"
        with open(tmp, "w") as f:
            json.dump({"num_samples": len(self._index), "samples": self._index}, f)
        os.replace(tmp, self.prefix + ".tsidx")


class SegRecordDataset:
    """Reader with the reference ``SegDataset`` interface: ``__getitem__``
    returns (PIL image, semantic (H,W) uint8, instance (H,W,N) uint8,
    n_objects)."""

    def __init__(self, path_prefix: str):
        # accept either the prefix or the LMDB-style directory the CLIs pass
        if path_prefix.endswith((".tsidx", ".tsbin")):
            path_prefix = path_prefix.rsplit(".", 1)[0]
        self.prefix = path_prefix
        with open(path_prefix + ".tsidx") as f:
            idx = json.load(f)
        self.samples = idx["samples"]
        self.n_samples = idx["num_samples"]
        self._file = open(path_prefix + ".tsbin", "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        assert self._mm[: len(MAGIC)] == MAGIC, "bad record file"

    def __len__(self) -> int:
        return self.n_samples

    def _blob(self, ref) -> bytes:
        off, ln = ref
        return self._mm[off : off + ln]

    def __getitem__(self, i: int):
        rec = self.samples[i]
        img = Image.open(io.BytesIO(self._blob(rec["image"]))).convert("RGB")
        h, w, n = rec["height"], rec["width"], rec["n_objects"]
        sem = np.frombuffer(self._blob(rec["semantic"]), np.uint8).reshape(h, w)
        ins = np.frombuffer(self._blob(rec["instance"]), np.uint8).reshape(
            h, w, n
        )
        return img, sem.copy(), ins.copy(), n


class LmdbSegDataset:
    """Reads the reference's LMDB layout directly (lib/dataset.py:17-71).
    Requires the ``lmdb`` package."""

    def __init__(self, lmdb_path: str):
        import lmdb  # gated import

        self.env = lmdb.open(
            lmdb_path, max_readers=1, readonly=True, lock=False,
            readahead=False, meminit=False,
        )
        with self.env.begin(write=False) as txn:
            self.n_samples = int(txn.get(b"num-samples"))

    def __len__(self):
        return self.n_samples

    def __getitem__(self, i: int):
        with self.env.begin(write=False) as txn:
            k = lambda name: f"{name}-{i + 1}".encode()
            img = Image.open(io.BytesIO(txn.get(k("image")))).convert("RGB")
            h = int(txn.get(k("height")))
            w = int(txn.get(k("width")))
            n = int(txn.get(k("n_objects")))
            sem = np.frombuffer(
                txn.get(k("semantic-annotation")), np.uint8
            ).reshape(h, w)
            ins = np.frombuffer(
                txn.get(k("instance-annotation")), np.uint8
            ).reshape(h, w, n)
        return img, sem.copy(), ins.copy(), n


class LmdbWriter:
    """Writes the reference's exact LMDB layout so a tpuseg-prepared
    dataset round-trips into the reference's own reader
    (``code/lib/dataset.py:34-61``; writer semantics
    ``data/scripts/CVPPP/utils.py:14-62``): 1-based keys ``image-{i}``
    (encoded PNG bytes), ``semantic-annotation-{i}`` /
    ``instance-annotation-{i}`` (raw uint8 buffers), ``height/width/
    n_objects-{i}`` (ascii ints), ``num-samples``.  Puts are batched per
    transaction.  Requires the ``lmdb`` package (gated import)."""

    FLUSH_EVERY = 50  # samples per write transaction

    def __init__(self, lmdb_path: str, map_size: int = 1 << 36):
        import lmdb  # gated import

        self.env = lmdb.open(lmdb_path, map_size=map_size)
        self.n = 0
        self._cache: Dict[bytes, bytes] = {}

    def _flush(self) -> None:
        with self.env.begin(write=True) as txn:
            for k, v in self._cache.items():
                txn.put(k, v)
        self._cache = {}

    def add(
        self,
        image_png: bytes,
        semantic: np.ndarray,
        instance: np.ndarray,
        n_objects: int,
    ) -> None:
        """Same argument contract as ``RecordWriter.add``."""
        h, w = semantic.shape
        assert instance.shape == (h, w, n_objects), instance.shape
        i = self.n + 1
        self._cache[f"image-{i}".encode()] = bytes(image_png)
        self._cache[f"semantic-annotation-{i}".encode()] = (
            np.ascontiguousarray(semantic, np.uint8).tobytes()
        )
        self._cache[f"instance-annotation-{i}".encode()] = (
            np.ascontiguousarray(instance, np.uint8).tobytes()
        )
        self._cache[f"height-{i}".encode()] = str(h).encode()
        self._cache[f"width-{i}".encode()] = str(w).encode()
        self._cache[f"n_objects-{i}".encode()] = str(int(n_objects)).encode()
        self.n += 1
        if self.n % self.FLUSH_EVERY == 0:
            self._flush()

    def close(self) -> None:
        self._cache[b"num-samples"] = str(self.n).encode()
        self._flush()
        self.env.close()


def open_dataset(path: str):
    """Open either a packed-record prefix or an LMDB directory."""
    if os.path.isfile(path + ".tsidx") or path.endswith((".tsidx", ".tsbin")):
        return SegRecordDataset(path)
    if os.path.isdir(path) and (
        os.path.isfile(os.path.join(path, "data.mdb"))
        or os.path.isfile(os.path.join(path, "data.lmdb"))
    ):
        return LmdbSegDataset(path)
    # prefix without extension
    return SegRecordDataset(path)


def convert_lmdb(lmdb_path: str, out_prefix: str) -> int:
    """Migrate a reference LMDB into the packed-record format."""
    src = LmdbSegDataset(lmdb_path)
    w = RecordWriter(out_prefix)
    for i in range(len(src)):
        img, sem, ins, n = src[i]
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        w.add(buf.getvalue(), sem, ins, n)
    w.close()
    return len(src)


def convert_to_lmdb(src_path: str, lmdb_path: str) -> int:
    """Reverse of ``convert_lmdb``: round-trip a packed-record dataset
    back into a reference-consumable LMDB (lib/dataset.py:34-61)."""
    src = open_dataset(src_path)
    w = LmdbWriter(lmdb_path)
    for i in range(len(src)):
        img, sem, ins, n = src[i]
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        w.add(buf.getvalue(), sem, ins, n)
    w.close()
    return len(src)
