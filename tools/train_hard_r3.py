"""Round-3 quality run: fine-tune the flagship asset on the HARD synthetic
preset so the count head (and the extraction stopping rule) actually see
the evaluation distribution.

Addresses VERDICT r2 "next" #2 and #6:
  * the r2 asset was trained on the easy preset (max_leaves=8, centered
    plants) but judged on the hard one (max_leaves=14, off-center, wavy,
    occluded) — hard-split |DiC| 0.92-0.97 traces directly to that shift;
  * checkpoint selection moves from the noisy 8-image val (ROADMAP
    finding: a 0.847 trainer-val candidate lost on BOTH CLI splits) to a
    32-image val scored on the full extraction chain: SBD, FG dice AND
    count error, selected on SBD - dic_weight * |DiC|;
  * constant-lr fine-tunes regress past their best (ROADMAP); this run
    cosine-decays the plateau LR scale instead.

Reference training loop being replaced: ``code/lib/model.py:358-464``.
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
from tpuseg.utils import enable_compilation_cache

enable_compilation_cache()
from tpuseg.data.colorspace import image_ex_standardize
from tpuseg.data.dataset import AlignCollate
from tpuseg.data.loader import PrefetchLoader
from tpuseg.data.records import SegRecordDataset
from tpuseg.data.synthetic import write_synthetic_records
from tpuseg.evalm import calc_dice, symmetric_best_dice_batch
from tpuseg.runtime import create_train_state, make_train_step


def evaluate_full(cfg, model, variables, ds, n, batch=16, max_ids=32):
    """Run the production extraction on n val samples; returns
    dict(sbd, fg, dic, counts) — the selection metrics of this run.
    Uses the INSTALLED stopping calibration (assets/stop_params.json) so
    checkpoint selection scores the same extraction the CLIs run."""
    from tpuseg.cli.common import load_stop_params

    sp = load_stop_params()
    collate = AlignCollate("test", cfg.data, batch)
    infer = jax.jit(
        lambda v, x: model.apply(
            v, image_ex_standardize(x), mode="infer", stop_params=sp
        )
    )
    print("  eval: tracing/compiling infer...", flush=True)
    sbds, fgs, dics = [], [], []
    for start in range(0, n, batch):
        idxs = [min(start + j, len(ds) - 1) for j in range(batch)]
        samples = [ds[i] for i in idxs]
        b = collate(samples).asdict()
        _, idmap, counts = infer(variables, jnp.asarray(b["images"]))
        idmap = np.asarray(idmap)
        counts = np.asarray(counts)
        n_valid = min(batch, n - start)
        gt_label = np.zeros(idmap.shape, np.int32)
        for j in range(n_valid):
            ins = b["ins_masks"][j]
            for k in range(int(b["n_objects"][j])):
                gt_label[j][ins[:, :, k] > 0] = k + 1
        sbd_b = np.asarray(
            symmetric_best_dice_batch(gt_label, idmap, max_ids=max_ids)
        )
        for j in range(n_valid):
            sbds.append(float(sbd_b[j]))
            fgs.append(float(calc_dice(gt_label[j] > 0, idmap[j] > 0)))
            dics.append(abs(int(counts[j]) - int(b["n_objects"][j])))
    return {
        "sbd": float(np.mean(sbds)),
        "fg": float(np.mean(fgs)),
        "dic": float(np.mean(dics)),
    }


def main(
    epochs=300,
    res=128,
    n_train=160,
    n_val=32,
    batch_size=8,
    eval_every=10,
    lr0=0.3,
    lr_min=0.02,
    max_leaves=14,
    min_leaves=3,
    dic_weight=0.05,
    resume=True,
    out="/tmp/tpuseg_r3/hard_ckpt.msgpack",
    install_bar=0.0,
    bf16=False,
    seed=31,
    swa_frac=0.0,
    freeze_bn=False,
    warm_opt=0,
    eval_res=0,
    freeze_subtrees="",
):
    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=res, image_width=res, max_n_objects=16
        ),
        train=dataclasses.replace(
            cfg.train, batch_size=batch_size, learning_rate=lr0
        ),
    )
    # selection val may run at a DIFFERENT resolution than training
    # (--eval_res): r5 finding — 256-res training collapses the model
    # (gradient-driven, lr- and optimizer-state-independent) while
    # 128-res training recovers, so the gate-matched recipe trains at
    # 128 and SELECTS on a 256-res val (the frozen eval's resolution).
    eval_res = eval_res or res
    eval_cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=eval_res, image_width=eval_res
        ),
    )
    root = "/tmp/tpuseg_r3"
    os.makedirs(root, exist_ok=True)
    write_synthetic_records(
        f"{root}/train", n_train, seed=seed, height=res, width=res,
        min_leaves=min_leaves, max_leaves=max_leaves, hard=True,
    )
    write_synthetic_records(
        f"{root}/val", n_val, seed=32, height=eval_res, width=eval_res,
        min_leaves=min_leaves, max_leaves=max_leaves, hard=True,
    )
    train_ds = SegRecordDataset(f"{root}/train")
    val_ds = SegRecordDataset(f"{root}/val")

    # bf16 compute (params/optimizer stay f32, loss boundary f32 — same
    # path as `train.py --bf16`); eval runs the SAME bf16 model so
    # selection scores what the flag would ship
    model = build_model(cfg, dtype=jnp.bfloat16 if bf16 else None)
    variables = init_variables(cfg, model, seed=cfg.train.seed)
    asset = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "assets",
        "synthetic_ckpt.msgpack",
    )
    if resume and os.path.isfile(asset):
        import flax.serialization

        from tpuseg.cli.common import _merge_restore

        with open(asset, "rb") as f:
            stored = flax.serialization.msgpack_restore(f.read())
        variables = _merge_restore(dict(variables), stored)
        print(f"resumed weights from {asset}", flush=True)
    state = create_train_state(cfg, variables)
    print("train state created", flush=True)
    # --freeze_bn: keep the resumed asset's BN running statistics for
    # the whole fine-tune.  Empirical r5 finding: fine-tuning at 256²
    # collapses the frozen-eval metrics IDENTICALLY at lr 0.3 and 0.08
    # (FG dice 0.94->0.81 within 4 epochs) — LR-independent damage, i.e.
    # the momentum batch-stat updates over the augmented train stream,
    # not the gradient updates, were degrading the eval path.
    frozen_stats = state.batch_stats if freeze_bn else None
    # --freeze_subtrees count_head,density_head: pin named top-level
    # param/stat subtrees to the resumed asset's values (restored after
    # every step).  r5 diagnosis: every fine-tune first blows up |DiC|
    # (budget collapse -> under-extraction -> FG/SBD collapse) while the
    # TRAIN-res count_err improves — the density head's 256-res
    # calibration is what goes stale, so keep the counting path fixed
    # while the mask path trains.
    pin_names = [s for s in freeze_subtrees.split(",") if s]
    pinned = None
    if pin_names:
        pinned = {
            "params": {k: state.params[k] for k in pin_names
                       if k in state.params},
            "batch_stats": {k: state.batch_stats[k] for k in pin_names
                            if k in state.batch_stats},
        }
        print(f"pinned subtrees: {sorted(pinned['params'])}", flush=True)

    def _repin(st):
        if pinned is None:
            return st
        p = dict(st.params)
        p.update(pinned["params"])
        bs = dict(st.batch_stats)
        bs.update(pinned["batch_stats"])
        return st.replace(params=p, batch_stats=bs)

    m0 = evaluate_full(eval_cfg, model, state.model_variables, val_ds, n_val)
    print(f"start: SBD={m0['sbd']:.4f} FG={m0['fg']:.4f} "
          f"|DiC|={m0['dic']:.3f}", flush=True)

    # a fine-tune must beat the START point to count as "best" — the
    # resumed asset is the incumbent, not a -inf placeholder
    best_score = m0["sbd"] - dic_weight * m0["dic"] if resume else -1e9
    best_epoch, best_payload, best_m = -1, None, m0
    # SWA (VERDICT r4 #2): tail-window running average of the weights,
    # evaluated once at the end and adopted only if it beats the best
    # single checkpoint on the same gate-aware score.  batch_stats are
    # averaged too (an approximation; the eval below scores exactly what
    # would ship, so a bad approximation simply loses the comparison).
    swa_sum, swa_n = None, 0
    swa_start = int(epochs * (1.0 - swa_frac)) if swa_frac > 0 else epochs + 1
    loader = PrefetchLoader(
        train_ds, AlignCollate("training", cfg.data, batch_size), batch_size,
        shuffle=True, seed=cfg.train.seed, n_workers=4,
    )
    step = make_train_step(cfg, model)
    key = jax.random.PRNGKey(cfg.train.seed)
    t0 = time.time()
    # --warm_opt: populate the Adadelta accumulators with realistic
    # gradient magnitudes BEFORE any weight moves (epochs at lr=0:
    # optax's rho-EMAs update regardless of the final lr scaling).  The
    # original optimizer state is gone with the orbax run dir (/tmp);
    # resuming weights-only with ZERO accumulators makes the first
    # updates ~|g|-independent sign kicks (ROADMAP r2 finding) — the
    # r5-observed LR-insensitive eval collapse in the first epochs.
    pre_warm_stats = state.batch_stats
    for wepoch in range(warm_opt):
        state = state.replace(
            plateau=state.plateau.replace(lr=jnp.asarray(0.0, jnp.float32))
        )
        for batch in loader.epoch(1000 + wepoch):
            key, sub = jax.random.split(key)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, _ = step(state, batch, sub)
            # params did not move (lr scale 0), so the asset's stats
            # stay the consistent ones — warm only the optimizer
            state = state.replace(batch_stats=pre_warm_stats)
        print(f"opt-warmup epoch {wepoch} done ({time.time()-t0:.0f}s)",
              flush=True)
    for epoch in range(epochs):
        # cosine LR decay via the plateau scale (ROADMAP: constant-lr
        # fine-tunes regress past their best)
        lr = lr_min + 0.5 * (lr0 - lr_min) * (
            1.0 + np.cos(np.pi * epoch / max(epochs - 1, 1))
        )
        state = state.replace(
            plateau=state.plateau.replace(lr=jnp.asarray(lr, jnp.float32))
        )
        costs, cerrs = [], []
        for batch in loader.epoch(epoch):
            key, sub = jax.random.split(key)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, m = step(state, batch, sub)
            if frozen_stats is not None:
                state = state.replace(batch_stats=frozen_stats)
            state = _repin(state)
            costs.append(float(m["cost"]))
            if "count_err" in m:
                cerrs.append(float(m["count_err"]))
        if epoch % 10 == 0 or epoch == epochs - 1:
            ce = f" count_err {np.mean(cerrs):.2f}" if cerrs else ""
            print(f"epoch {epoch}: cost {np.mean(costs):.3f}{ce} lr {lr:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if epoch >= swa_start:
            cur = jax.device_get({
                "params": state.params,
                "batch_stats": state.batch_stats,
            })
            if swa_sum is None:
                swa_sum = jax.tree_util.tree_map(
                    lambda x: np.asarray(x, np.float64), cur
                )
            else:
                swa_sum = jax.tree_util.tree_map(
                    lambda a, x: a + np.asarray(x, np.float64), swa_sum, cur
                )
            swa_n += 1
        if (epoch + 1) % eval_every == 0 or epoch == epochs - 1:
            m = evaluate_full(eval_cfg, model, state.model_variables, val_ds, n_val)
            score = m["sbd"] - dic_weight * m["dic"]
            print(f"  eval @{epoch}: SBD={m['sbd']:.4f} FG={m['fg']:.4f} "
                  f"|DiC|={m['dic']:.3f} score={score:.4f}", flush=True)
            if score > best_score:
                best_score, best_epoch, best_m = score, epoch, m
                best_payload = jax.device_get({
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "decoder_state": state.decoder_state,
                })
                # save incrementally: a killed/timed-out run keeps its best
                import flax.serialization

                os.makedirs(os.path.dirname(out), exist_ok=True)
                tmp_path = out + ".tmp"
                with open(tmp_path, "wb") as f:
                    f.write(flax.serialization.to_bytes(best_payload))
                os.replace(tmp_path, out)
                print(f"  new best @ {epoch} (saved to {out})", flush=True)

    if swa_n >= 2:
        swa_payload = jax.tree_util.tree_map(
            lambda a: np.asarray(a / swa_n, np.float32), swa_sum
        )
        swa_payload["decoder_state"] = jax.device_get(state.decoder_state)
        m = evaluate_full(eval_cfg, model, dict(swa_payload), val_ds, n_val)
        score = m["sbd"] - dic_weight * m["dic"]
        print(f"  SWA({swa_n} snapshots): SBD={m['sbd']:.4f} "
              f"FG={m['fg']:.4f} |DiC|={m['dic']:.3f} score={score:.4f}",
              flush=True)
        if score > best_score:
            best_score, best_epoch, best_m = score, epochs, m
            best_payload = swa_payload
            print("  SWA candidate wins", flush=True)

    import flax.serialization

    # ADVICE r3 (high): the asset only moves on an ACTUAL win. Under
    # resume the incumbent seeds best_score; if no eval beat it,
    # best_payload is None and nothing here may overwrite `out` (or the
    # installed asset) with unevaluated final-epoch weights while
    # printing the incumbent's metrics.
    if best_payload is None:
        if resume:
            print("no eval beat the resumed incumbent — leaving the "
                  f"asset and {out} untouched", flush=True)
            return
        best_payload = jax.device_get({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "decoder_state": state.decoder_state,
        })
    print(f"best: epoch {best_epoch} SBD={best_m['sbd']:.4f} "
          f"FG={best_m['fg']:.4f} |DiC|={best_m['dic']:.3f}", flush=True)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        f.write(flax.serialization.to_bytes(best_payload))
    print(f"saved best weights to {out}", flush=True)

    if install_bar and best_epoch >= 0 and best_m["sbd"] >= install_bar:
        import shutil

        shutil.copyfile(out, asset)
        print(f"installed into {asset} (SBD {best_m['sbd']:.4f} >= "
              f"{install_bar})", flush=True)
    elif install_bar:
        print(f"NOT installed: best_epoch={best_epoch} "
              f"SBD {best_m['sbd']:.4f} vs bar {install_bar}", flush=True)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--n_train", type=int, default=160)
    p.add_argument("--n_val", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--lr0", type=float, default=0.3)
    p.add_argument("--lr_min", type=float, default=0.02)
    p.add_argument("--max_leaves", type=int, default=14)
    p.add_argument("--min_leaves", type=int, default=3)
    p.add_argument("--dic_weight", type=float, default=0.05)
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--out", default="/tmp/tpuseg_r3/hard_ckpt.msgpack")
    p.add_argument("--install_bar", type=float, default=0.0)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=31,
                   help="training scene-pool generator seed")
    p.add_argument("--swa_frac", type=float, default=0.0,
                   help="tail fraction of epochs to average into an SWA "
                        "candidate (0 disables)")
    p.add_argument("--freeze_bn", action="store_true",
                   help="keep the resumed asset's BN running stats (the "
                        "momentum stat updates, not the gradients, were "
                        "collapsing 256-res fine-tune evals)")
    p.add_argument("--warm_opt", type=int, default=0,
                   help="optimizer-warmup epochs at lr=0 before training "
                        "(fills the Adadelta accumulators lost with the "
                        "original orbax state)")
    p.add_argument("--freeze_subtrees", default="",
                   help="comma-separated top-level param subtrees pinned "
                        "to the asset values (e.g. count_head,density_head)")
    p.add_argument("--eval_res", type=int, default=0,
                   help="selection-val resolution (0 = same as --res); "
                        "set 256 to gate-match the frozen eval while "
                        "training at a stabler resolution)")
    a = p.parse_args()
    main(a.epochs, a.res, a.n_train, a.n_val, a.batch_size, a.eval_every,
         a.lr0, a.lr_min, a.max_leaves, a.min_leaves, a.dic_weight,
         not a.no_resume, a.out, a.install_bar, a.bf16, a.seed, a.swa_frac,
         a.freeze_bn, a.warm_opt, a.eval_res, a.freeze_subtrees)
