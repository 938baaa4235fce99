"""Step-0 term-level diagnosis for the loss-curve parity run: compare the
reference's per-iteration REINFORCE terms (loss1 = lambda_l*Predloss,
loss2 = lambda_r*REINFORCE, H = lambda_e*entropy — what attenet2.py:289
prints) against tpuseg's (DecoderConfig.debug_loss_terms).

Usage: python tools/parity_terms.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

from tools.parity_run import (
    H, W, B, N, _pin_reference_determinism, build_batches,
)


def main():
    import torch

    from tools.reference_shim import load_reference

    torch_batches, jax_batches = build_batches(1)

    ref = load_reference()
    ref.config.H = H
    ref.config.W = W
    ref.config.drop_rate = 0.0
    _pin_reference_determinism(ref)

    torch.manual_seed(23)
    np.random.seed(23)
    tmodel = ref.ReSeg(2, True, pretrained=False, use_coordinates=False,
                       use_wae=False, usegpu=False)
    tmodel.train()

    # capture the terms by wrapping Attenloss
    captured = []
    orig = ref.attenet2.DecoderLayer.Attenloss

    def wrap(self, pred, target, mask, pro, alpha, alpha_sample,
             alpha_maxidx, ratio, evaline, training, **kw):
        out = orig(self, pred, target, mask, pro, alpha, alpha_sample,
                   alpha_maxidx, ratio, evaline, training, **kw)
        lp, dl = self.Predloss(pred, target if isinstance(target, list)
                               else target)
        captured.append({
            "loss1": (ref.config.lambda_l * lp).detach().numpy(),
        })
        return out

    ref.attenet2.DecoderLayer.Attenloss = wrap

    x, sem, ins, n = torch_batches[0]
    out = tmodel(True, x, sem.float(), ins.float(), n.unsqueeze(1))
    ref.attenet2.DecoderLayer.Attenloss = orig
    print("ref INS cost:", float(out[2]))

    # ---- tpuseg side
    import jax

    if "axon" in str(jax.config.jax_platforms or ""):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tools.convert_reference_weights import convert
    from tpuseg.cli.common import build_model, init_variables
    from tpuseg.configs import cvppp_config

    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=H, image_width=W, max_n_objects=N
        ),
        decoder=dataclasses.replace(
            cfg.decoder, drop_rate=0.0, sp_reduction=20,
            deterministic_glimpse=True, debug_loss_terms=True,
            entropy_normal=(H / 256.0) ** 0.5,
        ),
        model=dataclasses.replace(
            cfg.model, use_count_head=False, use_density_head=False
        ),
    )
    model = build_model(cfg)
    template = init_variables(cfg, model, seed=0)
    variables = convert(tmodel, dict(template))

    batch = jax_batches[0]
    (_, _, losses), _ = model.apply(
        variables,
        jnp.asarray(batch["images"]),
        jnp.asarray(batch["sem_onehot"]),
        jnp.asarray(batch["ins_masks"]),
        jnp.asarray(batch["n_objects"]),
        train=True, mode="loss",
        rngs={"glimpse": jax.random.PRNGKey(0),
              "dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats", "decoder_state"],
    )
    print("tpuseg INS cost:", float(losses["loss"]))
    print("tpuseg loss1 per iter:", np.asarray(losses["debug_loss1"]))
    print("tpuseg loss2 per iter:", np.asarray(losses["debug_loss2"]))
    print("tpuseg H per iter:", np.asarray(losses["debug_hent"]))
    print("ref loss1 per iter:", [c["loss1"] for c in captured])


if __name__ == "__main__":
    main()
