"""Tests for the remaining parity extras: Embedding/CalPosition, PN
losses, TransferDataset/Otsu, StackedRecurrentHourglass, pooled MmdLoss,
debug image writers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tpuseg.data.dataset import TransferDataset, otsu_threshold
from tpuseg.decoder.pn_losses import pn_loss, pn_loss3
from tpuseg.losses.mmd import mmd_loss_pooled
from tpuseg.nn.embedding import Embedding, cal_position
from tpuseg.nn.hourglass import StackedRecurrentHourglass
from tpuseg.utils.debug_images import dump_pyramid_debug

KEY = jax.random.PRNGKey(0)


def test_cal_position_distances():
    pts = jnp.asarray([[2, 3]], jnp.int32)
    planes = np.asarray(cal_position((4, 4), pts))
    assert planes.shape == (1, 4, 4, 2)
    # channel 0 = |col - 3|, channel 1 = |row - 2|
    assert planes[0, 0, 0, 0] == 3 and planes[0, 0, 0, 1] == 2
    assert planes[0, 2, 3, 0] == 0 and planes[0, 2, 3, 1] == 0


def test_embedding_module():
    m = Embedding(d_model=8)
    o = jnp.zeros((2, 6, 6, 8))
    pts = jnp.asarray([[1, 1], [4, 4]], jnp.int32)
    h = jnp.ones((2, 8))
    v = m.init(KEY, o, pts, h)
    out = m.apply(v, o, pts, h)
    assert out.shape == (2, 6, 6, 8)
    # the point pixel itself gets zero added in the first two channels
    assert float(jnp.abs(out[0, 1, 1, 0])) < 1e-6


def test_pn_losses_finite():
    rng = np.random.RandomState(0)
    b, hw = 2, 64
    pred = jnp.asarray(rng.rand(b, hw).astype(np.float32))
    adv = jnp.asarray(rng.randn(b, hw).astype(np.float32))
    alpha = jax.nn.softmax(jnp.asarray(rng.randn(b, hw).astype(np.float32)))
    evaline = jnp.asarray([0.01, 0.02])
    gold = jnp.asarray((rng.rand(b, hw) < 0.4).astype(np.float32))
    v1 = pn_loss(pred, adv, alpha, evaline[:, None], gold)
    assert v1.shape == (b,) and np.all(np.isfinite(np.asarray(v1)))
    h = w = 8
    v3 = pn_loss3(
        jax.nn.one_hot(jnp.argmax(alpha, 1), hw).reshape(b, h, w, 1),
        pred.reshape(b, h, w, 1), alpha.reshape(b, h, w, 1), evaline,
        gold.reshape(b, h, w, 1),
    )
    assert v3.shape == (b,) and np.all(np.isfinite(np.asarray(v3)))


def test_otsu_and_transfer_dataset(tmp_path):
    # bimodal image: clear separation
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 220
    img[:, :16] = 30
    Image.fromarray(img).save(os.path.join(tmp_path, "a.png"))
    th = otsu_threshold(
        np.asarray(Image.open(os.path.join(tmp_path, "a.png")).convert("L"))
        / 255.0
    )
    # any threshold in the inter-mode gap is Otsu-optimal (flat max);
    # argmax picks the first such bin
    assert 30 / 255 <= th <= 220 / 255
    ds = TransferDataset(str(tmp_path))
    assert len(ds) == 1
    pil, sem, ins, n = ds[0]
    assert n == 1 and sem.shape == (32, 32)
    # bright half is foreground
    assert sem[:, 20:].mean() > 0.9 and sem[:, :12].mean() < 0.1


def test_stacked_recurrent_hourglass():
    m = StackedRecurrentHourglass(
        n_stacks=2, hidden_n_filters=8, n_levels=2, embedding_size=6,
        n_classes=2,
    )
    x = jnp.ones((1, 16, 16, 3))
    v = m.init(KEY, x)
    sem, emb = m.apply(v, x)
    assert sem.shape == (1, 16, 16, 2)
    assert emb.shape == (1, 16, 16, 6)


def test_mmd_loss_pooled():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 64 * 64).astype(np.float32))
    t = jnp.asarray((rng.rand(2, 64 * 64) < 0.3).astype(np.float32))
    out = mmd_loss_pooled(x, t, jax.random.PRNGKey(2))
    assert out.shape == (2,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_debug_image_dump(tmp_path):
    rng = np.random.RandomState(2)
    preds = [rng.randn(1, 2**(4 + i), 2**(4 + i), 2).astype(np.float32)
             for i in range(3)]
    targets = [
        (rng.rand(1, 2**(4 + i), 2**(4 + i), 1) < 0.5).astype(np.float32)
        for i in range(3)
    ]
    pro = rng.rand(1, 64, 64, 1).astype(np.float32)
    mask = (rng.rand(1, 64, 64, 1) < 0.5).astype(np.float32)
    dump_pyramid_debug(str(tmp_path), preds, targets, pro, mask,
                       alpha=pro.reshape(1, -1), point=5)
    files = sorted(os.listdir(tmp_path))
    for f in ["p_0.jpg", "pred_0.jpg", "target_0.jpg", "proall.jpg",
              "pro.jpg", "mas.jpg"]:
        assert f in files, files


def test_random_resized_crop():
    from tpuseg.data.augment import random_resized_crop

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    )
    out, params = random_resized_crop(img, 32, 32, rng)
    assert out.size == (32, 32)
    i, j, h, w = params
    assert 0 <= i and i + h <= 48 and 0 <= j and j + w <= 64
    # same params applied to a mask give an identical geometric crop
    mask = Image.fromarray(np.zeros((48, 64), np.uint8))
    out2, params2 = random_resized_crop(mask, 32, 32, rng, params=params)
    assert params2 == params and out2.size == (32, 32)


def test_predict_cluster_and_attend_variants(tmp_path):
    """Legacy Prediction.predict_wae / predict_attend equivalents
    (prediction.py:87-182): embedding+KMeans path and raw-decoder path."""
    import dataclasses

    import jax.numpy as jnp
    from PIL import Image

    from tpuseg.cli.common import build_model, init_variables
    from tpuseg.configs import cvppp_config
    from tpuseg.runtime.predict import Predictor

    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=32, image_width=32, max_n_objects=4
        ),
    )
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=0)
    p = Predictor(cfg, model, variables, batch_size=1)

    img = (np.random.RandomState(0).rand(40, 48, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "x.png")
    Image.fromarray(img).save(path)

    res = p.predict_cluster(path)
    assert res["ins_mask"].shape == (40, 48)
    assert res["fg_mask"].shape == (40, 48)
    assert 1 <= res["n_objects"] <= 4
    # cluster ids only on predicted foreground
    assert set(np.unique(res["ins_mask"][res["fg_mask"] == 0])) <= {0}

    res2 = p.predict_attend(path)
    assert res2["ins_mask"].shape == (40, 48)
    assert res2["n_objects"] >= 0
