"""Scoring CLI — reference ``code/evaluate.py`` contract.

Same flags (--pred_dir --dataset), same metrics and print format
(evaluate.py:110-112), but SBD runs vectorised on device via one-hot
matmuls (``tpuseg.evalm``) instead of O(G*P*H*W) numpy double loops.

Path notes: the reference reads metadata from
``../data/metadata/CVPPP/...`` while shipping it at ``data/metadata/``
(SURVEY.md quirk #5); both are probed here, plus ``--metadata``/
``--img_dir`` overrides.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from tpuseg.evalm import fg_dice_batch, symmetric_best_dice_batch


def _find_metadata(root_hint: str, dataset: str) -> str:
    cands = [
        os.path.join(root_hint, "data", "metadata", dataset),
        os.path.join(root_hint, "data", "metadata"),
        os.path.join("data", "metadata", dataset),
        os.path.join("data", "metadata"),
    ]
    for c in cands:
        if os.path.isfile(os.path.join(c, "validation_image_paths.txt")):
            return c
    raise FileNotFoundError(
        f"no metadata dir with validation_image_paths.txt among {cands}"
    )


def main(argv=None):
    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()  # warm starts: reuse compiled executables
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred_dir", required=True, help="Prediction directory")
    parser.add_argument("--dataset", type=str, required=True,
                        help='Name of the dataset which is "CVPPP"')
    parser.add_argument("--metadata", default="", help="metadata directory")
    parser.add_argument("--img_dir", default="", help="ground-truth image dir")
    opt = parser.parse_args(argv)
    assert opt.dataset in ["CVPPP"]
    pred_dir = opt.pred_dir

    meta = opt.metadata or _find_metadata(".", opt.dataset)
    names = np.loadtxt(
        os.path.join(meta, "validation_image_paths.txt"), dtype="str",
        delimiter=",", ndmin=1,
    )
    names = np.array([os.path.splitext(os.path.basename(n))[0] for n in names])
    n_objects_gts = np.loadtxt(
        os.path.join(meta, "number_of_instances.txt"), dtype="str",
        delimiter=",", ndmin=2,
    )
    img_dir = opt.img_dir or os.path.join(
        "data", "raw", opt.dataset, "CVPPP2017_LSC_training", "training", "A1"
    )

    # load everything first, then score in shape-bucketed device batches —
    # one SBD matmul batch and one fg-dice reduction per resolution bucket
    # instead of per-image dispatches (VERDICT r1 weak #7)
    records = []
    for name in names:
        base = f"{pred_dir}/{name}/{name}"
        if not os.path.isfile(base + "-n_objects.npy"):
            continue
        key = name.replace("_rgb", "")
        n_objects_gt = int(n_objects_gts[n_objects_gts[:, 0] == key][0][1])
        n_objects_pred = int(np.load(base + "-n_objects.npy"))
        ins_seg_gt = np.array(
            Image.open(os.path.join(img_dir, key + "_label.png"))
        ).astype(np.int32)
        ins_seg_pred = np.array(Image.open(base + "-ins_mask.png")).astype(
            np.int32
        )
        fg_seg_gt = np.array(Image.open(os.path.join(img_dir, key + "_fg.png")))
        fg_seg_pred = np.array(Image.open(base + "-fg_mask.png"))
        records.append({
            "ins_gt": ins_seg_gt,
            "ins_pred": ins_seg_pred,
            "fg_gt": (fg_seg_gt == 1),
            "fg_pred": (fg_seg_pred == 255),
            "n_gt": n_objects_gt,
            "n_pred": n_objects_pred,
        })

    dics, sbds, fg_dices = [], [], []
    buckets = {}
    for r in records:
        buckets.setdefault(r["ins_gt"].shape, []).append(r)
    for shape, group in buckets.items():
        max_ids = max(
            [int(max(r["ins_gt"].max(), r["ins_pred"].max(), 1))
             for r in group]
        )
        max_ids = int(np.ceil(max_ids / 16) * 16)  # bucket the compile shape
        gt_stack = np.stack([r["ins_gt"] for r in group])
        pred_stack = np.stack([r["ins_pred"] for r in group])
        sbds.extend(
            np.asarray(
                symmetric_best_dice_batch(gt_stack, pred_stack,
                                          max_ids=max_ids)
            ).tolist()
        )
        fg_dices.extend(
            np.asarray(
                fg_dice_batch(
                    np.stack([r["fg_gt"] for r in group]),
                    np.stack([r["fg_pred"] for r in group]),
                )
            ).tolist()
        )
        dics.extend(
            [abs(r["n_gt"] - r["n_pred"]) for r in group]
        )

    print("MEAN SBD     : ", np.mean(sbds) if sbds else float("nan"))
    print("MEAN |DIC|   : ", np.mean(dics) if dics else float("nan"))
    print("MEAN FG DICE : ", np.mean(fg_dices) if fg_dices else float("nan"))
    return (
        float(np.mean(sbds)) if sbds else None,
        float(np.mean(dics)) if dics else None,
        float(np.mean(fg_dices)) if fg_dices else None,
    )


if __name__ == "__main__":
    main()
