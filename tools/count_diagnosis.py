"""Diagnose where |DiC| comes from: signed count-error distribution.

For N hard-preset synthetic scenes, records per image the GT instance
count, the extracted count (installed stopping rule), and the count-head
budget, then prints the signed-error histogram, the count-head's own
accuracy, and an oracle table: |DiC| if extraction stopped exactly at
the count-head prediction / at GT.  This decides the round-3 counting
lever: fix the stopping rule, the head, or the segmentation.

Usage: python tools/count_diagnosis.py [--ckpt assets/synthetic_ckpt.msgpack]
         [--n 64] [--res 256] [--bf16] [--seed 99]
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="assets/synthetic_ckpt.msgpack")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-leaves", type=int, default=14)
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stop-params", default="",
                    help="override: min_frac,max_misses[,suppress]")
    args = ap.parse_args()
    os.chdir(_REPO)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpuseg.cli.common import (
        adapt_cfg_to_checkpoint, build_model, load_variables,
    )
    from tpuseg.configs import cvppp_config
    from tpuseg.data.synthetic import make_scene
    from tpuseg.evalm.metrics import symmetric_best_dice_batch
    from tpuseg.runtime.predict import Predictor
    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = cvppp_config()
    cfg = adapt_cfg_to_checkpoint(cfg, args.ckpt)
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=args.res, image_width=args.res
        ),
    )
    model = build_model(cfg, dtype=jnp.bfloat16 if args.bf16 else None)
    variables = load_variables(cfg, model, args.ckpt)

    from tpuseg.cli.common import load_stop_params

    if args.stop_params:
        vals = [float(x) for x in args.stop_params.split(",")]
        sp = (vals[0], int(vals[1]), *vals[2:])
    else:
        sp = load_stop_params()
    print(f"stop_params: {sp}")

    rng = np.random.default_rng(args.seed)
    imgs, gt_ids, gt_ns = [], [], []
    for _ in range(args.n):
        rgb, _, ins, n = make_scene(
            rng, args.res, args.res, hard=True, max_leaves=args.max_leaves
        )
        idmap = np.zeros((args.res, args.res), np.int32)
        for j in range(ins.shape[-1]):
            idmap[ins[..., j] > 0] = j + 1
        imgs.append(rgb)
        gt_ids.append(idmap)
        gt_ns.append(n)
    imgs = np.stack(imgs).astype(np.uint8)
    gt_ids = np.stack(gt_ids)
    gt_ns = np.array(gt_ns)

    p = Predictor(
        cfg, model, variables, batch_size=args.batch, staged=True,
        stop_params=sp,
    )

    pred_ns, budgets, pred_ids = [], [], []
    for s in range(0, args.n, args.batch):
        chunk = imgs[s : s + args.batch]
        n_valid = len(chunk)
        if n_valid < args.batch:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[:1], args.batch - n_valid, axis=0)]
            )
        prep = p._infer_prep(p.variables, jnp.asarray(chunk))
        budgets.append(np.asarray(prep[2])[:n_valid])
        fg, idmap, counts = p._extract_from_prep(prep)
        pred_ns.append(np.asarray(counts)[:n_valid])
        pred_ids.append(np.asarray(idmap)[:n_valid])
    pred_ns = np.concatenate(pred_ns)
    budgets = np.concatenate(budgets)
    pred_ids = np.concatenate(pred_ids).astype(np.int32)

    sbd_per = np.asarray(symmetric_best_dice_batch(gt_ids, pred_ids))
    err = pred_ns - gt_ns
    head_err = budgets - gt_ns

    print(f"\nGT counts:       min {gt_ns.min()} max {gt_ns.max()} "
          f"mean {gt_ns.mean():.2f}")
    print(f"extracted:       mean {pred_ns.mean():.2f}   "
          f"|DiC| {np.abs(err).mean():.3f}  bias {err.mean():+.3f}")
    print(f"count head:      mean {budgets.mean():.2f}   "
          f"|DiC| {np.abs(head_err).mean():.3f}  "
          f"bias {head_err.mean():+.3f}  "
          f"exact {np.mean(budgets == gt_ns) * 100:.0f}%  "
          f"within1 {np.mean(np.abs(head_err) <= 1) * 100:.0f}%")
    print(f"SBD:             {sbd_per.mean():.4f}")

    print("\nsigned extraction-count error histogram:")
    for v, c in sorted(collections.Counter(err.tolist()).items()):
        print(f"  {v:+d}: {'#' * c} ({c})")
    print("\nsigned count-head error histogram:")
    for v, c in sorted(collections.Counter(head_err.tolist()).items()):
        print(f"  {v:+d}: {'#' * c} ({c})")

    # where does the extraction error come from? cross-tab vs head error
    both = collections.Counter(zip(head_err.tolist(), err.tolist()))
    print("\n(head_err, extract_err) pairs:")
    for (h, e), c in sorted(both.items()):
        print(f"  head {h:+d} -> extract {e:+d}: {c}")

    # budget-capped? how often did extraction hit the budget exactly
    print(f"\nextract == budget (cap active): "
          f"{np.mean(pred_ns == budgets) * 100:.0f}%")
    print(f"extract < budget (rule stopped first): "
          f"{np.mean(pred_ns < budgets) * 100:.0f}%")

    # worst images
    worst = np.argsort(-np.abs(err))[:8]
    print("\nworst images (idx, gt, extracted, budget, sbd):")
    for i in worst:
        print(f"  {i}: gt={gt_ns[i]} ext={pred_ns[i]} bud={budgets[i]} "
              f"sbd={sbd_per[i]:.3f}")


if __name__ == "__main__":
    main()
