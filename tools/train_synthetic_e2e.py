"""End-to-end learning evidence: train on synthetic leaves, show the
validation SBD/FG-Dice improve far beyond random init.

Runs at a reduced resolution for fast TPU iteration; exercises the FULL
stack: records -> augmented loader -> jitted train step (glimpse decoder,
REINFORCE) -> checkpointed params -> batched instance extraction ->
vectorized SBD scoring.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from tpuseg.cli.common import build_model, init_variables
from tpuseg.configs import cvppp_config
from tpuseg.data.colorspace import image_ex_standardize
from tpuseg.data.dataset import AlignCollate
from tpuseg.data.loader import PrefetchLoader
from tpuseg.data.records import SegRecordDataset
from tpuseg.data.synthetic import write_synthetic_records
from tpuseg.evalm import symmetric_best_dice_batch, calc_dice
from tpuseg.runtime import create_train_state, make_train_step


def evaluate(cfg, model, variables, ds, n=8, max_ids=32):
    """Instance-extract on val samples; return (mean SBD, mean fg dice)."""
    collate = AlignCollate("test", cfg.data, n)
    samples = [ds[i % len(ds)] for i in range(n)]
    batch = collate(samples).asdict()
    infer = jax.jit(
        lambda v, x: model.apply(v, image_ex_standardize(x), mode="infer")
    )
    _, idmap, counts = infer(variables, jnp.asarray(batch["images"]))
    idmap = np.asarray(idmap)
    gt_label = np.zeros(idmap.shape, np.int32)
    for b in range(n):
        ins = batch["ins_masks"][b]
        for j in range(int(batch["n_objects"][b])):
            gt_label[b][ins[:, :, j] > 0] = j + 1
    sbd = float(np.mean(np.asarray(
        symmetric_best_dice_batch(gt_label, idmap, max_ids=max_ids))))
    fg = float(np.mean([
        float(calc_dice(gt_label[b] > 0, idmap[b] > 0)) for b in range(n)
    ]))
    return sbd, fg, np.asarray(counts)


def main(epochs=200, res=128, n_train=32, n_val=8, batch_size=8,
         eval_every=40, lr=1.0, max_leaves=8, out="", install_bar=0.0):
    """out: where to save the trained weights (default: a /tmp path).
    install_bar: if > 0 and the final val SBD clears it, install the
    weights into assets/synthetic_ckpt.msgpack; the flagship asset is
    never overwritten by a run that fails its own quality bar."""
    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=res, image_width=res, max_n_objects=16
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=batch_size, learning_rate=lr
        ),
    )
    root = "/tmp/tpuseg_e2e"
    os.makedirs(root, exist_ok=True)
    write_synthetic_records(f"{root}/train", n_train, seed=1, height=res, width=res,
                            min_leaves=3, max_leaves=max_leaves)
    write_synthetic_records(f"{root}/val", n_val, seed=2, height=res, width=res,
                            min_leaves=3, max_leaves=max_leaves)
    train_ds = SegRecordDataset(f"{root}/train")
    val_ds = SegRecordDataset(f"{root}/val")

    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=cfg.train.seed)
    ckpt_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "assets",
        "synthetic_ckpt.msgpack",
    )
    if os.path.isfile(ckpt_path) and os.environ.get("TPUSEG_RESUME", "0") == "1":
        import flax.serialization

        from tpuseg.cli.common import _merge_restore

        with open(ckpt_path, "rb") as f:
            stored = flax.serialization.msgpack_restore(f.read())
        variables = _merge_restore(dict(variables), stored)
        print(f"resumed weights from {ckpt_path}", flush=True)
    state = create_train_state(cfg, variables)

    sbd0, fg0, c0 = evaluate(cfg, model, state.model_variables, val_ds, n_val)
    print(f"random init: SBD={sbd0:.4f} FG={fg0:.4f} counts={c0}", flush=True)

    best_sbd, best_epoch, best_payload = -1.0, -1, None
    loader = PrefetchLoader(
        train_ds, AlignCollate("training", cfg.data, batch_size), batch_size,
        shuffle=True, seed=cfg.train.seed, n_workers=4,
    )
    step = make_train_step(cfg, model)
    key = jax.random.PRNGKey(cfg.train.seed)
    t0 = time.time()
    for epoch in range(epochs):
        costs, ces, dices = [], [], []
        for batch in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, m = step(state, batch, sub)
            costs.append(float(m["cost"]))
            ces.append(float(m["ce_cost"]))
            dices.append(float(m["dice_cost"]))
        if epoch % 10 == 0 or epoch == epochs - 1:
            print(f"epoch {epoch}: cost {np.mean(costs):.3f} "
                  f"sem_ce {np.mean(ces):.3f} sem_dice {np.mean(dices):.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if (epoch + 1) % eval_every == 0:
            sbd, fg, counts = evaluate(cfg, model, state.model_variables,
                                       val_ds, n_val)
            print(f"  eval @{epoch}: SBD={sbd:.4f} FG={fg:.4f} "
                  f"counts={counts}", flush=True)
            if sbd > best_sbd:
                best_sbd, best_epoch = sbd, epoch
                best_payload = jax.device_get({
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "decoder_state": state.decoder_state,
                })
                print(f"  new best (SBD {sbd:.4f} @ {epoch})", flush=True)

    sbd1, fg1, c1 = evaluate(cfg, model, state.model_variables, val_ds, n_val)
    print(f"after {epochs} epochs: SBD={sbd1:.4f} FG={fg1:.4f} counts={c1}",
          flush=True)
    print(f"SBD {sbd0:.4f} -> {sbd1:.4f} ; FG dice {fg0:.4f} -> {fg1:.4f}",
          flush=True)

    # persist the BEST-eval weights (training can regress past its best —
    # observed: SBD 0.797 @124 -> 0.465 @150) OUTSIDE assets/; the
    # committed flagship asset is only replaced past install_bar
    import flax.serialization

    if best_payload is None or sbd1 > best_sbd:
        best_sbd, best_epoch = sbd1, epochs - 1
        best_payload = jax.device_get({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "decoder_state": state.decoder_state,
        })
    print(f"best eval: SBD {best_sbd:.4f} @ epoch {best_epoch}", flush=True)
    sbd1 = best_sbd
    out = out or "/tmp/tpuseg_e2e/trained_ckpt.msgpack"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(flax.serialization.to_bytes(best_payload))
    print(f"saved best weights to {out}", flush=True)

    if install_bar and sbd1 >= install_bar:
        import shutil

        asset = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), os.pardir, "assets",
            "synthetic_ckpt.msgpack",
        )
        shutil.copyfile(out, asset)
        print(f"installed into {asset} (SBD {sbd1:.4f} >= {install_bar})",
              flush=True)
    elif install_bar:
        print(f"NOT installed: SBD {sbd1:.4f} < bar {install_bar}", flush=True)

    resumed = os.environ.get("TPUSEG_RESUME", "0") == "1"
    assert resumed or fg1 > fg0 + 0.1, "fg dice did not improve enough"
    print("SYNTHETIC E2E TRAINING CHECK PASSED", flush=True)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--n_train", type=int, default=32)
    p.add_argument("--n_val", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--eval_every", type=int, default=40)
    p.add_argument("--lr", type=float, default=1.0)
    p.add_argument("--max_leaves", type=int, default=8)
    p.add_argument("--out", default="")
    p.add_argument("--install_bar", type=float, default=0.0)
    a = p.parse_args()
    main(a.epochs, a.res, a.n_train, a.n_val, a.batch_size, a.eval_every,
         a.lr, a.max_leaves, a.out, a.install_bar)
