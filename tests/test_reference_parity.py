"""Numerical parity vs the ACTUAL reference implementations (torch-cpu).

These tests execute the reference's own loss code from /root/reference and
compare against the tpuseg jnp re-derivations on identical inputs — the
strongest form of formula parity available without the reference's full
(unavailable) dependency stack.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from tests.reference_import import load_reference_losses  # noqa: E402
from tpuseg.losses import (  # noqa: E402
    dice_coefficient,
    dice_loss,
    discriminative_loss,
    focal_loss,
    instance_dice_loss,
    lovasz_hinge,
    stable_bce_loss,
)

REF = load_reference_losses()


def _to_nchw(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


@pytest.mark.parametrize("time", [1, 2])
def test_dice_coefficient_parity(time):
    rng = np.random.RandomState(0)
    logits = rng.randn(3, 6, 6, 2).astype(np.float32)
    labels = rng.randint(0, 2, (3, 6, 6))
    onehot = np.eye(2, dtype=np.float32)[labels]
    ref = REF.dice.dice_coefficient(
        _to_nchw(logits), _to_nchw(onehot).int(), smooth=1.0, time=time
    ).numpy()
    got = np.asarray(
        dice_coefficient(jnp.asarray(logits), jnp.asarray(onehot), time=time)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_dice_loss_parity_reduce_modes():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 5, 5, 3).astype(np.float32)
    labels = rng.randint(0, 3, (2, 5, 5))
    onehot = np.eye(3, dtype=np.float32)[labels]
    for reduce, size_average in [(True, True), (True, False), (False, True)]:
        ref = REF.dice.dice_loss(
            _to_nchw(logits), _to_nchw(onehot).int(), reduce=reduce,
            size_average=size_average,
        )
        got = dice_loss(
            jnp.asarray(logits), jnp.asarray(onehot), reduce=reduce,
            size_average=size_average,
        )
        np.testing.assert_allclose(
            np.asarray(got), ref.detach().numpy(), rtol=1e-4, atol=1e-5
        )


def test_focal_loss_parity():
    rng = np.random.RandomState(2)
    logits = rng.randn(40, 2).astype(np.float32)
    targets = rng.randint(0, 2, (40,))
    ref_mod = REF.multi_loss.FocalLoss(gamma=2.0)
    ref = ref_mod(
        torch.from_numpy(logits), torch.from_numpy(targets), 0.25
    ).numpy()
    got = np.asarray(
        focal_loss(jnp.asarray(logits), jnp.asarray(targets), 2.0, 0.25)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


def test_instance_dice_parity():
    rng = np.random.RandomState(3)
    probs = rng.rand(3, 49).astype(np.float32)
    target = (rng.rand(3, 49) < 0.4).astype(np.float32)
    ref_mod = REF.multi_loss.DiceLoss()
    ref = ref_mod(torch.from_numpy(probs), torch.from_numpy(target)).numpy()
    got = np.asarray(instance_dice_loss(jnp.asarray(probs), jnp.asarray(target)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_stable_bce_parity():
    rng = np.random.RandomState(4)
    logits = rng.randn(30).astype(np.float32)
    targets = rng.randint(0, 2, (30,)).astype(np.float32)
    ref_mod = REF.lovasz.StableBCELoss(reduction=False)
    ref = ref_mod(torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    got = np.asarray(
        stable_bce_loss(jnp.asarray(logits), jnp.asarray(targets), reduction=False)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


def test_lovasz_hinge_parity():
    rng = np.random.RandomState(5)
    logits = rng.randn(2, 6, 6).astype(np.float32)
    labels = rng.randint(0, 2, (2, 6, 6)).astype(np.float32)
    ref = REF.lovasz.lovasz_hinge(
        torch.from_numpy(logits), torch.from_numpy(labels), per_image=True
    )
    got = float(lovasz_hinge(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, float(ref), rtol=1e-4)


def test_lovasz_grad_parity():
    from tpuseg.losses import lovasz_grad

    gt = np.array([1, 0, 1, 1, 0, 0, 1], np.float32)
    ref = REF.lovasz.lovasz_grad(torch.from_numpy(gt)).numpy()
    got = np.asarray(lovasz_grad(jnp.asarray(gt)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_discriminative_loss_parity():
    rng = np.random.RandomState(6)
    b, h, w, f, n = 2, 8, 8, 4, 3
    emb = rng.randn(b, h, w, f).astype(np.float32)
    masks = np.zeros((b, h, w, n), np.float32)
    masks[0, :4, :, 0] = 1
    masks[0, 4:, :, 1] = 1
    masks[1, :, :3, 0] = 1
    masks[1, :, 3:6, 1] = 1
    masks[1, :, 6:, 2] = 1
    n_objects = np.array([2, 3])
    ref_loss, ref_means = REF.discriminative.discriminative_loss(
        _to_nchw(emb),
        torch.from_numpy(np.ascontiguousarray(masks.transpose(0, 3, 1, 2))),
        torch.from_numpy(n_objects),
        n, 0.5, 1.5, 2, usegpu=False,
    )
    got_loss, got_means = discriminative_loss(
        jnp.asarray(emb), jnp.asarray(masks), jnp.asarray(n_objects),
        delta_v=0.5, delta_d=1.5, norm=2,
    )
    np.testing.assert_allclose(
        float(got_loss), float(ref_loss), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_means), ref_means.detach().numpy(), rtol=1e-3, atol=1e-4
    )


def test_bilinear_downsample_equals_torch_interpolate():
    """UNet downsample claim: torch interpolate(scale=0.5, bilinear,
    align_corners=False) == 2x2 avg pooling (tpuseg.nn.unet)."""
    rng = np.random.RandomState(7)
    x = rng.randn(2, 8, 16, 16).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=0.5, mode="bilinear",
        align_corners=False,
    ).numpy()
    from tpuseg.nn.unet import _downsample2x

    got = np.asarray(
        _downsample2x(jnp.asarray(x.transpose(0, 2, 3, 1)))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_maxpool_and_avgpool_resize_parity():
    """Pyramid mask resize claim: maxpool/avgpool(kernel=f, stride=f)
    match torch (pyramid.py _maxpool/_avgpool vs utils.py:838-867)."""
    rng = np.random.RandomState(8)
    x = (rng.rand(1, 1, 16, 16) > 0.5).astype(np.float32)
    for f in (2, 4):
        ref_max = torch.nn.MaxPool2d(f, f)(torch.from_numpy(x)).numpy()
        ref_avg = torch.nn.AvgPool2d(f, f)(torch.from_numpy(x)).numpy()
        from tpuseg.decoder.pyramid import _avgpool, _maxpool

        xm = jnp.asarray(x.transpose(0, 2, 3, 1))
        got_max = np.asarray(_maxpool(xm, f)).transpose(0, 3, 1, 2)
        got_avg = np.asarray(_avgpool(xm, f)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_max, ref_max)
        np.testing.assert_allclose(got_avg, ref_avg, rtol=1e-6)
