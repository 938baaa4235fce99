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


def test_pn_losses_match_torch_transliteration():
    """All three PN variants vs a line-by-line torch transliteration of
    attenet2.py:182-237 (PNloss2's undefined `self.pnloss` filled with
    the same BCE default the port uses; test data keeps every reference
    denominator nonzero so the port's NaN guards are inactive and the
    comparison is against the unguarded reference math)."""
    import torch

    from tpuseg.decoder.pn_losses import pn_loss2

    rng = np.random.RandomState(7)
    b, h, w = 3, 8, 8
    hw = h * w
    pred = rng.rand(b, hw).astype(np.float32) * 0.8 + 0.1
    adv = rng.randn(b, hw).astype(np.float32)
    alpha = np.exp(rng.randn(b, hw).astype(np.float32))
    alpha /= alpha.sum(1, keepdims=True)
    evaline = (1.0 / np.full((b,), 20.0)).astype(np.float32)
    gold = (rng.rand(b, hw) < 0.5).astype(np.float32)
    gamma, fw = 2.0, 0.3

    # --- PNloss (attenet2.py:182-202), focal term at weight fw ---
    tp, ta, tal, tg = map(torch.tensor, (pred, adv, alpha, gold))
    tev = torch.tensor(evaline)[:, None]
    p = torch.softmax(tp * tal, dim=1)
    p = torch.log(p.clamp(1e-7, 1.0 - 1e-7))
    pnloss1 = -p * ta
    t_sel = (tal > tev).float()
    ratio = torch.sum(t_sel, dim=1) / torch.sum(tg, dim=1)
    pc = tp.clamp(1e-7, 1.0 - 1e-7)
    f1 = (-1 * (2 - ratio).unsqueeze(1) * (1 - pc.detach()) ** gamma
          * torch.log(pc) * t_sel * tg)
    f0 = (-1 * ratio.unsqueeze(1) * pc.detach() ** gamma
          * torch.log(1 - pc) * (1 - t_sel) * tg)
    want1 = torch.sum(pnloss1 + fw * (f1 + f0), dim=1) / b
    got1 = pn_loss(
        jnp.asarray(pred), jnp.asarray(adv), jnp.asarray(alpha),
        jnp.asarray(evaline)[:, None], jnp.asarray(gold),
        focal_gamma=gamma, focal_weight=fw,
    )
    np.testing.assert_allclose(np.asarray(got1), want1.numpy(), rtol=2e-5)

    # --- PNloss2 (attenet2.py:211-224; dead-by-crash there) ---
    target = (rng.rand(b, hw) < 0.5).astype(np.float32)
    p_n = (rng.rand(b, h, w, 1) * 0.8).astype(np.float32)
    p_re = rng.rand(b, h, w, 1).astype(np.float32) * 0.05  # < 1/N often
    gold4 = gold.reshape(b, h, w, 1)
    tpred, ttar = torch.tensor(pred), torch.tensor(target)
    tpn, tpre, tg4 = map(torch.tensor, (p_n, p_re, gold4))
    pc = tpred.clamp(1e-7, 1.0 - 1e-7)
    ploss = -torch.sum(
        (ttar * torch.log(pc) + (1 - ttar) * torch.log(1 - pc)).view(b, -1),
        dim=1,
    )
    tpn = tpn * tg4
    N = torch.sum(tg4.view(b, -1), dim=1)
    sel = (tpre.view(b, -1) < (1.0 / N)[:, None]).float()
    sel = sel.view(tg4.shape) * tg4
    nloss = -torch.log(1 - tpn + 1e-7) * sel
    nloss = torch.sum(nloss.view(b, -1), dim=1)
    want2 = ploss * 1.1 + nloss / torch.sum(sel.view(b, -1), dim=1)
    assert float(torch.sum(sel)) > 0  # unguarded denominator is live
    got2 = pn_loss2(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(p_n),
        jnp.asarray(p_re), jnp.asarray(gold4),
    )
    np.testing.assert_allclose(np.asarray(got2), want2.numpy(), rtol=2e-5)

    # --- PNloss3 (attenet2.py:227-237) ---
    pro = rng.randn(b, h, w, 1).astype(np.float32)
    alpha4 = alpha.reshape(b, h, w, 1)
    maxidx = np.zeros((b, hw), np.float32)
    maxidx[np.arange(b), alpha.argmax(1)] = 1.0
    maxidx = maxidx.reshape(b, h, w, 1)
    tmi, tpro, tal4 = map(torch.tensor, (maxidx, pro, alpha4))
    tev3, tg4 = torch.tensor(evaline), torch.tensor(gold4)
    pk = torch.sum((tpro * tmi).view(b, -1), dim=1)
    ploss3 = torch.relu(-pk)
    npoint = (tal4 < tev3[:, None, None, None]).float() * tg4
    N3 = torch.sum(npoint.view(b, -1), dim=1)
    assert float(N3.min()) > 0
    nloss3 = torch.sum(torch.relu(tpro * npoint).view(b, -1), dim=1)
    want3 = ploss3 + nloss3 / N3
    got3 = pn_loss3(
        jnp.asarray(maxidx), jnp.asarray(pro), jnp.asarray(alpha4),
        jnp.asarray(evaline), jnp.asarray(gold4),
    )
    np.testing.assert_allclose(np.asarray(got3), want3.numpy(), rtol=2e-5)
