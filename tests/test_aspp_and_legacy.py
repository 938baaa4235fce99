"""Tests for DenseASPP / DilatedMobileNetV2 / masked encoder / legacy
atteNet pipeline / tracing + validation utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuseg.configs import DecoderConfig
from tpuseg.models.attenet_legacy import AtteNetLegacy, CorrelationDecoder
from tpuseg.nn.aspp import DenseASPP, DenseAsppBlock, DilatedMobileNetV2, MaskedAsppEncoder
from tpuseg.utils import StepTimer, check_batch, nan_guard
from tpuseg.utils.validation import ValidationError

KEY = jax.random.PRNGKey(0)


def test_dense_aspp_block():
    m = DenseAsppBlock(num1=8, num2=4, dilation_rate=3)
    x = jnp.ones((1, 16, 16, 12))
    v = m.init(KEY, x)
    assert m.apply(v, x).shape == (1, 16, 16, 4)


def test_masked_aspp_encoder_masks_and_projects():
    m = MaskedAsppEncoder(d_model=12, aspp_rates=(3, 6))
    x = jnp.ones((1, 8, 8, 12))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)
    v = m.init(KEY, x, mask)
    out = m.apply(v, x, mask)
    assert out.shape == (1, 8, 8, 12)


def test_dilated_mobilenet_taps():
    m = DilatedMobileNetV2(output_stride=8)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(KEY, x)
    outs = m.apply(v, x)
    assert len(outs) == 4
    # stride plan: stage taps at 1x, 1/2x, 1/4x(x8-dilated), final
    assert outs[0].shape[1] == 32
    assert outs[-1].shape[-1] == 256


def test_dense_aspp_wrapper():
    m = DenseASPP(output_stride=8)
    x = jnp.ones((1, 32, 32, 3))
    v = m.init(KEY, x)
    assert len(m.apply(v, x)) == 4


def test_correlation_decoder_range():
    m = CorrelationDecoder()
    sel = jnp.ones((2, 6))
    enc = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 6).astype(np.float32))
    v = m.init(KEY, sel, enc)
    out = m.apply(v, sel, enc)
    assert out.shape == (2, 16)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_attenet_legacy_loss_and_transitions():
    cfg = DecoderConfig()
    m = AtteNetLegacy(cfg=cfg, aspp_rates=(1, 2), max_iter=3)
    b, h, w, n = 2, 16, 16, 4
    feats = jnp.asarray(np.random.RandomState(1).randn(b, h, w, cfg.d_model).astype(np.float32))
    ins = np.zeros((b, h, w, n), np.float32)
    ins[:, :8, :, 0] = 1
    ins[:, 8:, :, 1] = 1
    mask = jnp.asarray((ins.sum(-1, keepdims=True) > 0).astype(np.float32))
    v = m.init({"params": KEY}, feats, mask, jnp.asarray(ins))
    loss, transitions = m.apply(v, feats, mask, jnp.asarray(ins))
    assert loss.shape == (b,)
    assert np.all(np.isfinite(np.asarray(loss)))
    assert len(transitions) == 3
    # rewards are IoUs in [0, 1]
    for t in transitions:
        r = np.asarray(t["reward"])
        assert np.all((r >= 0) & (r <= 1.0 + 1e-6))
    # foreground shrinks monotonically
    sums = [float(jnp.sum(t["mask"])) for t in transitions]
    assert sums == sorted(sums, reverse=True)


def test_check_batch_validation():
    batch = {
        "images": np.zeros((2, 8, 8, 3), np.uint8),
        "sem_onehot": np.zeros((2, 8, 8, 2), np.float32),
        "ins_masks": np.zeros((2, 8, 8, 4), np.float32),
        "n_objects": np.array([1, 2], np.int32),
    }
    check_batch(batch, n_classes=2, max_n_objects=4)
    bad = dict(batch, images=batch["images"].astype(np.float32))
    with pytest.raises(ValidationError):
        check_batch(bad, 2, 4)
    bad2 = dict(batch, n_objects=np.array([9, 1], np.int32))
    with pytest.raises(ValidationError):
        check_batch(bad2, 2, 4)


def test_nan_guard_and_step_timer():
    x = jnp.asarray([1.0, np.nan, 2.0])
    np.testing.assert_allclose(np.asarray(nan_guard(x)), [1.0, 0.0, 2.0])
    timer = StepTimer()
    out = timer.time("add", lambda: jnp.ones(4) + 1)
    assert float(out[0]) == 2.0
    s = timer.summary()
    assert s["add"]["count"] == 1 and s["add"]["mean_s"] > 0
