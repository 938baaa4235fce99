"""End-to-end pipeline: synthetic dataset -> records -> CLI inference ->
CLI evaluation, exercising the same artifact formats as the reference."""

import dataclasses
import os

import numpy as np
import pytest
from PIL import Image

import tpuseg.cli.evaluate as evaluate_cli
import tpuseg.cli.pred_list as pred_list_cli
from tpuseg.data.records import RecordWriter, SegRecordDataset
from tpuseg.data.dataset import AlignCollate, batches
from tpuseg.data.synthetic import (
    make_scene,
    write_synthetic_eval_tree,
    write_synthetic_records,
)


def test_records_roundtrip(tmp_path):
    prefix = os.path.join(tmp_path, "train")
    write_synthetic_records(prefix, 3, seed=1, height=64, width=64)
    ds = SegRecordDataset(prefix)
    assert len(ds) == 3
    img, sem, ins, n = ds[0]
    assert img.size == (64, 64)
    assert sem.shape == (64, 64)
    assert ins.shape == (64, 64, n)
    assert set(np.unique(sem)) <= {0, 1}
    # instances partition the foreground
    np.testing.assert_array_equal((ins.sum(-1) > 0).astype(np.uint8), sem)


class _FakeTxn:
    def __init__(self, store):
        self._s = store

    def put(self, k, v):
        self._s[bytes(k)] = bytes(v)

    def get(self, k):
        return self._s.get(bytes(k))

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeEnv:
    _stores = {}

    def __init__(self, path):
        self._s = _FakeEnv._stores.setdefault(os.path.abspath(path), {})

    def begin(self, write=False, **kw):
        return _FakeTxn(self._s)

    def close(self):
        pass


def _fake_lmdb_module():
    import types

    mod = types.ModuleType("lmdb")
    mod.open = lambda path, **kw: _FakeEnv(path)
    return mod


def test_lmdb_writer_roundtrips_reference_layout(tmp_path, monkeypatch):
    """LmdbWriter emits the reference's exact key layout
    (data/scripts/CVPPP/utils.py:42-59): convert a packed-record dataset
    to LMDB and read it back through LmdbSegDataset — the reader of the
    reference's own files (lib/dataset.py:34-61).  Runs against an
    in-memory lmdb stub so the layout is validated without the package;
    if the real lmdb package is installed the same test runs on disk."""
    import sys

    try:
        import lmdb  # noqa: F401 — real package present, use it
    except ImportError:
        monkeypatch.setitem(sys.modules, "lmdb", _fake_lmdb_module())

    from tpuseg.data.records import LmdbSegDataset, convert_to_lmdb

    prefix = os.path.join(tmp_path, "train")
    write_synthetic_records(prefix, 4, seed=3, height=48, width=48)
    src = SegRecordDataset(prefix)
    lmdb_dir = os.path.join(tmp_path, "train_lmdb")
    os.makedirs(lmdb_dir, exist_ok=True)
    n = convert_to_lmdb(prefix, lmdb_dir)
    assert n == 4
    back = LmdbSegDataset(lmdb_dir)
    assert len(back) == 4
    for i in range(4):
        img_a, sem_a, ins_a, n_a = src[i]
        img_b, sem_b, ins_b, n_b = back[i]
        assert n_a == n_b
        np.testing.assert_array_equal(sem_a, sem_b)
        np.testing.assert_array_equal(ins_a, ins_b)
        np.testing.assert_array_equal(np.array(img_a), np.array(img_b))


def test_align_collate_shapes_and_padding(tmp_path):
    prefix = os.path.join(tmp_path, "train")
    write_synthetic_records(prefix, 3, seed=2, height=96, width=96)
    ds = SegRecordDataset(prefix)
    from tpuseg.configs import cvppp_config

    cfg = cvppp_config().data
    cfg = dataclasses.replace(cfg, image_height=64, image_width=64)
    collate = AlignCollate("training", cfg, batch_size=4)
    batch = next(batches(ds, collate, 4, shuffle=True, seed=23))
    assert batch["images"].shape == (4, 64, 64, 3)
    assert batch["images"].dtype == np.uint8
    assert batch["sem_onehot"].shape == (4, 64, 64, 2)
    assert batch["ins_masks"].shape == (4, 64, 64, 32)
    assert batch["n_objects"].shape == (4,)
    assert (batch["n_objects"] >= 1).all()
    # one-hot is consistent
    np.testing.assert_allclose(batch["sem_onehot"].sum(-1), 1.0)
    # test-mode collate applies no augmentation: deterministic
    tc = AlignCollate("test", cfg, batch_size=2)
    b1 = tc([ds[0], ds[1]]).asdict()
    b2 = tc([ds[0], ds[1]]).asdict()
    np.testing.assert_array_equal(b1["images"], b2["images"])


@pytest.mark.slow
def test_pred_list_and_evaluate_cli(tmp_path, monkeypatch):
    """Full CLI chain on tiny synthetic eval data with a random-init model
    (metric values are meaningless; formats and plumbing are the test)."""
    monkeypatch.chdir(tmp_path)
    lst = write_synthetic_eval_tree(str(tmp_path), 3, seed=3, height=64, width=64)
    out_dir = os.path.join(tmp_path, "outputs_pred")
    # random init: pass a non-directory model path
    out = pred_list_cli.main(
        [
            "--lst", lst, "--model", "random_init.ckpt", "--dataset", "CVPPP",
            "--batchsize", "2", "--output", out_dir,
        ]
    )
    names = [f"plant{i:04d}_rgb" for i in range(3)]
    for n in names:
        d = os.path.join(out, n)
        for suffix in [".png", "-fg_mask.png", "-ins_mask.png",
                       "-ins_mask_color.png", "-n_objects.npy"]:
            assert os.path.isfile(os.path.join(d, n + suffix)), (n, suffix)
        ins = np.array(Image.open(os.path.join(d, n + "-ins_mask.png")))
        assert ins.shape == (64, 64)
    sbd, dic, fg = evaluate_cli.main(
        ["--pred_dir", out, "--dataset", "CVPPP"]
    )
    assert sbd is None or 0.0 <= sbd <= 1.0
    assert fg is None or 0.0 <= fg <= 1.0


def test_prefetch_loader_deterministic(tmp_path):
    import dataclasses

    from tpuseg.configs import cvppp_config
    from tpuseg.data.loader import PrefetchLoader

    prefix = os.path.join(tmp_path, "train")
    write_synthetic_records(prefix, 5, seed=4, height=64, width=64)
    ds = SegRecordDataset(prefix)
    cfg = dataclasses.replace(
        cvppp_config().data, image_height=64, image_width=64
    )
    collate = AlignCollate("training", cfg, batch_size=2)
    loader = PrefetchLoader(ds, collate, 2, shuffle=True, seed=23, n_workers=2)
    run1 = [b["images"].copy() for b in loader.epoch(0)]
    run2 = [b["images"].copy() for b in loader.epoch(0)]
    assert len(run1) == len(loader)
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a, b)
    # a different epoch gives a different stream
    run3 = [b["images"].copy() for b in loader.epoch(1)]
    assert any(not np.array_equal(a, b) for a, b in zip(run1, run3))


def test_pred_list_bucketed_flag(tmp_path):
    """pred_list --bucketed end to end: native-resolution artifacts."""
    import numpy as np
    from PIL import Image

    from tpuseg.cli import pred_list

    rng = np.random.RandomState(5)
    paths = []
    for i, (h, w) in enumerate([(40, 48), (64, 32)]):
        p = tmp_path / f"img{i}.png"
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(paths) + "\n")
    out_dir = tmp_path / "out"

    pred_list.main([
        "--lst", str(lst), "--model", "none", "--dataset", "CVPPP",
        "--batchsize", "2", "--output", str(out_dir), "--bucketed", "--f32",
    ])
    for i, (h, w) in enumerate([(40, 48), (64, 32)]):
        d = out_dir / f"img{i}"
        ins = np.array(Image.open(d / f"img{i}-ins_mask.png"))
        assert ins.shape == (h, w)  # native resolution, not 256-resized
        assert (d / f"img{i}-n_objects.npy").is_file()
