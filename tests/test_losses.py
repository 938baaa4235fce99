"""Loss parity tests against independent numpy re-implementations of the
reference formulas (code/lib/losses/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.losses import (
    bce_loss,
    dice_coefficient,
    dice_loss,
    discriminative_loss,
    focal_loss,
    gl_loss,
    instance_dice_loss,
    iou_binary,
    lovasz_grad,
    lovasz_hinge,
    lovasz_softmax,
    mmd_penalty,
    mmd_penalty_with_p,
    softmax_cross_entropy,
    stable_bce_loss,
)


def _np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _np_dice_coefficient(logits, target, smooth=1.0, time=2, map_weight=0, mask=None):
    """Direct transcription of reference dice.py:10-51 (NHWC)."""
    probs = _np_softmax(logits, -1)
    t = target.astype(np.float64)
    w = map_weight + 1
    num = probs * t * w
    den1 = (probs * w) if time == 1 else (probs**2 * w)
    den2 = (t * w) if time == 1 else (t**2 * w)
    if mask is not None:
        num, den1, den2 = num * mask, den1 * mask, den2 * mask
    num = num.sum((1, 2))
    den1 = den1.sum((1, 2))
    den2 = den2.sum((1, 2))
    return (2 * num + smooth) / (den1 + den2 + smooth)


@pytest.mark.parametrize("time", [1, 2])
def test_dice_coefficient_matches_reference_formula(time):
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 8, 2).astype(np.float32)
    labels = rng.randint(0, 2, (2, 8, 8))
    onehot = np.eye(2)[labels]
    got = dice_coefficient(jnp.asarray(logits), jnp.asarray(onehot), time=time)
    want = _np_dice_coefficient(logits, onehot, time=time)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_dice_coefficient_map_weight_and_mask():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 4, 4, 2).astype(np.float32)
    onehot = np.eye(2)[rng.randint(0, 2, (2, 4, 4))]
    mw = rng.rand(2, 4, 4, 1).astype(np.float32)
    mask = rng.randint(0, 2, (2, 4, 4, 1)).astype(np.float32)
    got = dice_coefficient(
        jnp.asarray(logits), jnp.asarray(onehot), mask=jnp.asarray(mask),
        map_weight=jnp.asarray(mw), time=1,
    )
    want = _np_dice_coefficient(logits, onehot, time=1, map_weight=mw, mask=mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_dice_loss_reductions_and_weights():
    rng = np.random.RandomState(2)
    logits = rng.randn(3, 4, 4, 3).astype(np.float32)
    onehot = np.eye(3)[rng.randint(0, 3, (3, 4, 4))]
    per_sample = dice_loss(jnp.asarray(logits), jnp.asarray(onehot), reduce=False)
    assert per_sample.shape == (3,)
    mean = dice_loss(jnp.asarray(logits), jnp.asarray(onehot))
    np.testing.assert_allclose(float(mean), float(jnp.mean(per_sample)), rtol=1e-6)
    s = dice_loss(jnp.asarray(logits), jnp.asarray(onehot), size_average=False)
    np.testing.assert_allclose(float(s), float(jnp.sum(per_sample)), rtol=1e-6)
    # class weights: renormalised over fg classes
    w = jnp.asarray([1.0, 2.0, 1.0])
    dw = dice_loss(jnp.asarray(logits), jnp.asarray(onehot), weight=w)
    dice = dice_coefficient(jnp.asarray(logits), jnp.asarray(onehot))[:, 1:]
    wf = jnp.asarray([2.0, 1.0])
    wf = 2 * wf / wf.sum()
    want = jnp.mean(1 - jnp.mean(dice * wf, axis=1))
    np.testing.assert_allclose(float(dw), float(want), rtol=1e-6)


def test_instance_dice_zero_area_contributes_zero():
    probs = jnp.asarray(np.random.RandomState(3).rand(2, 16).astype(np.float32))
    target = jnp.stack([jnp.zeros(16), jnp.ones(16)])
    loss = instance_dice_loss(probs, target)
    assert float(loss[0]) == 0.0
    assert float(loss[1]) > 0.0


def test_focal_loss_matches_reference_formula():
    rng = np.random.RandomState(4)
    logits = rng.randn(50, 2).astype(np.float32)
    targets = rng.randint(0, 2, (50,))
    gamma, alpha = 2.0, 0.25
    got = focal_loss(jnp.asarray(logits), jnp.asarray(targets), gamma, alpha)
    p = np.clip(_np_softmax(logits, 1), 1e-7, 1 - 1e-7)
    pt = _np_softmax(logits, 1)
    t = targets.astype(np.float64)
    f1 = -(1 - alpha) * (1 - pt[:, 1]) ** gamma * np.log(p[:, 1]) * t
    f0 = -(1 + alpha) * (1 - pt[:, 0]) ** gamma * np.log(p[:, 0]) * (1 - t)
    np.testing.assert_allclose(np.asarray(got), f1 + f0, rtol=1e-3, atol=1e-5)


def test_focal_loss_grad_finite():
    logits = jnp.asarray(np.random.RandomState(5).randn(20, 2).astype(np.float32))
    targets = jnp.asarray(np.random.RandomState(6).randint(0, 2, (20,)))
    g = jax.grad(lambda l: jnp.sum(focal_loss(l, targets, 2.0)))(logits)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_bce_loss_masked():
    pred = jnp.asarray([[0.9, 0.1, 0.5, 0.5]])
    target = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    got = float(bce_loss(pred, target, mask)[0])
    want = np.log(0.9) + np.log(0.9)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_softmax_cross_entropy_matches_torch_semantics():
    rng = np.random.RandomState(7)
    logits = rng.randn(30, 2).astype(np.float32)
    labels = rng.randint(0, 2, (30,))
    got = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    logp = np.log(_np_softmax(logits, 1))
    want = -logp[np.arange(30), labels].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # weighted: sum(w*ce)/sum(w)
    w = np.array([1.0, 3.0])
    gotw = float(
        softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w))
    )
    ce = -logp[np.arange(30), labels]
    wantw = (w[labels] * ce).sum() / w[labels].sum()
    np.testing.assert_allclose(gotw, wantw, rtol=1e-5)


# ---------------- lovasz ----------------


def _np_lovasz_grad(gt_sorted):
    p = len(gt_sorted)
    gts = gt_sorted.sum()
    inter = gts - np.cumsum(gt_sorted)
    union = gts + np.cumsum(1 - gt_sorted)
    jac = 1.0 - inter / union
    if p > 1:
        jac[1:p] = jac[1:p] - jac[0:-1]
    return jac


def test_lovasz_grad_matches():
    gt = np.array([1, 0, 1, 1, 0, 0], dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(lovasz_grad(jnp.asarray(gt))), _np_lovasz_grad(gt), rtol=1e-6
    )


def test_lovasz_hinge_matches_reference():
    rng = np.random.RandomState(8)
    logits = rng.randn(2, 6, 6).astype(np.float32)
    labels = rng.randint(0, 2, (2, 6, 6)).astype(np.float32)

    def np_hinge_flat(lg, lb):
        signs = 2 * lb - 1
        errors = 1 - lg * signs
        order = np.argsort(-errors, kind="stable")
        es, gs = errors[order], lb[order]
        return np.dot(np.maximum(es, 0), _np_lovasz_grad(gs))

    want = np.mean(
        [np_hinge_flat(logits[i].ravel(), labels[i].ravel()) for i in range(2)]
    )
    got = float(lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_stable_bce_matches_formula():
    x = jnp.asarray([-3.0, 0.0, 2.0])
    t = jnp.asarray([0.0, 1.0, 1.0])
    got = np.asarray(stable_bce_loss(x, t, reduction=False))
    xn = np.array([-3.0, 0.0, 2.0])
    tn = np.array([0.0, 1.0, 1.0])
    want = np.maximum(xn, 0) - xn * tn + np.log1p(np.exp(-np.abs(xn)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lovasz_softmax_runs_and_is_finite():
    rng = np.random.RandomState(9)
    probas = _np_softmax(rng.randn(2, 5, 5, 3).astype(np.float32), -1)
    labels = rng.randint(0, 3, (2, 5, 5))
    v = float(lovasz_softmax(jnp.asarray(probas), jnp.asarray(labels)))
    assert np.isfinite(v) and v >= 0


def test_iou_binary():
    p = jnp.asarray([[1, 1, 0, 0]])
    l = jnp.asarray([[1, 0, 0, 0]])
    np.testing.assert_allclose(float(iou_binary(p, l)), 50.0)


# ---------------- discriminative ----------------


def test_discriminative_loss_padding_invariance():
    """Adding padded (empty) instance slots must not change the loss."""
    rng = np.random.RandomState(10)
    emb = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    masks = np.zeros((2, 8, 8, 6), np.float32)
    masks[0, :4, :4, 0] = 1
    masks[0, 4:, 4:, 1] = 1
    masks[1, :2, :, 0] = 1
    masks[1, 6:, :, 1] = 1
    masks[1, 3:5, :, 2] = 1
    n_objects = jnp.asarray([2, 3])
    loss6, means6 = discriminative_loss(emb, jnp.asarray(masks), n_objects)
    masks10 = np.concatenate([masks, np.zeros((2, 8, 8, 4), np.float32)], -1)
    loss10, _ = discriminative_loss(emb, jnp.asarray(masks10), n_objects)
    np.testing.assert_allclose(float(loss6), float(loss10), rtol=1e-5)
    # means are L2-normalised for valid slots, zero for padding
    norms = np.linalg.norm(np.asarray(means6), axis=-1)
    np.testing.assert_allclose(norms[0, :2], 1.0, rtol=1e-5)
    np.testing.assert_allclose(norms[0, 2:], 0.0, atol=1e-6)


# ---------------- mmd ----------------


def test_mmd_penalty_increases_with_distribution_shift():
    # The reference IMQ statistic (dice.py:105-121) excludes diagonals in
    # the within-terms but not the cross-term, so identical clouds give a
    # *negative* value; shifted clouds must score strictly higher.
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    same = float(mmd_penalty(x, x, zdim=4))
    far = float(mmd_penalty(x, x + 50.0, zdim=4))
    assert same < 0
    assert far > same


def test_mmd_penalty_with_p_rbf_properties():
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(8, 2).astype(np.float32))
    w = jnp.ones(8)
    same = float(mmd_penalty_with_p(x, x, w, w))
    far = float(mmd_penalty_with_p(x, x + 100.0, w, w))
    assert abs(same) < 1e-5
    assert far > same


def test_gl_loss_zero_when_ranks_match():
    rng = np.random.RandomState(13)
    enc = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    # decode = encode => identical distance ranks => zero penalty
    v = float(gl_loss(enc, enc))
    assert abs(v) < 1e-6
