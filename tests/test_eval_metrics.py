"""Vectorised SBD/|DiC|/FG-Dice vs a direct numpy transcription of
reference code/evaluate.py:18-57."""

import numpy as np
import jax.numpy as jnp

from tpuseg.evalm import (
    calc_bd,
    calc_dic,
    calc_dice,
    calc_sbd,
    symmetric_best_dice_batch,
)


def _np_calc_dice(g, p):
    return 2.0 * np.sum(g * p) / (np.sum(g) + np.sum(p))


def _np_calc_bd(gt, pred):
    gt_ids = sorted(set(np.unique(gt)) - {0})
    pr_ids = sorted(set(np.unique(pred)) - {0})
    best = []
    for gi in gt_ids:
        g = (gt == gi).astype(bool)
        best.append(max(_np_calc_dice(g, (pred == pi).astype(bool)) for pi in pr_ids))
    return float(np.mean(best))


def _np_calc_sbd(gt, pred):
    return min(_np_calc_bd(gt, pred), _np_calc_bd(pred, gt))


def _random_idmap(rng, h, w, n):
    """Voronoi-ish random instance map with ids 1..n plus background."""
    pts = rng.randint(0, [h, w], size=(n, 2))
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    d = (yy[None] - pts[:, 0, None, None]) ** 2 + (xx[None] - pts[:, 1, None, None]) ** 2
    ids = d.argmin(0) + 1
    bg = rng.rand(h, w) < 0.3
    ids[bg] = 0
    return ids.astype(np.int32)


def test_sbd_matches_numpy_reference():
    rng = np.random.RandomState(0)
    for trial in range(4):
        gt = _random_idmap(rng, 32, 32, rng.randint(2, 7))
        pred = _random_idmap(rng, 32, 32, rng.randint(2, 7))
        want = _np_calc_sbd(gt, pred)
        got = float(calc_sbd(gt, pred, max_ids=16))
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bd_matches_numpy_reference_noncontiguous_ids():
    rng = np.random.RandomState(1)
    gt = _random_idmap(rng, 24, 24, 4)
    pred = _random_idmap(rng, 24, 24, 3)
    # make ids non-contiguous
    gt[gt == 2] = 9
    want = _np_calc_bd(gt, pred)
    got = float(calc_bd(gt, pred, max_ids=16))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dic_and_fg_dice():
    assert int(calc_dic(7, 5)) == 2
    g = np.zeros((8, 8), bool)
    g[:4] = True
    p = np.zeros((8, 8), bool)
    p[:2] = True
    np.testing.assert_allclose(float(calc_dice(g, p)), _np_calc_dice(g, p), rtol=1e-6)


def test_batched_sbd():
    rng = np.random.RandomState(2)
    gts = np.stack([_random_idmap(rng, 16, 16, 3) for _ in range(3)])
    prs = np.stack([_random_idmap(rng, 16, 16, 4) for _ in range(3)])
    got = np.asarray(symmetric_best_dice_batch(gts, prs, max_ids=8))
    want = np.array([_np_calc_sbd(g, p) for g, p in zip(gts, prs)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fg_dice_batch_matches_scalar():
    from tpuseg.evalm import fg_dice_batch

    rng = np.random.RandomState(0)
    g = rng.rand(4, 16, 16) > 0.5
    p = rng.rand(4, 16, 16) > 0.5
    batched = np.asarray(fg_dice_batch(g, p))
    for i in range(4):
        ref = 2.0 * (g[i] & p[i]).sum() / (g[i].sum() + p[i].sum())
        assert abs(batched[i] - ref) < 1e-6
