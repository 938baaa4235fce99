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

from tpuseg.evalm import calc_dice, calc_dic, calc_sbd


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

    dics, sbds, fg_dices = [], [], []
    for name in names:
        base = f"{pred_dir}/{name}/{name}"
        if not os.path.isfile(base + "-n_objects.npy"):
            continue
        key = name.replace("_rgb", "")
        n_objects_gt = int(n_objects_gts[n_objects_gts[:, 0] == key][0][1])
        n_objects_pred = np.load(base + "-n_objects.npy")

        ins_seg_gt = np.array(
            Image.open(os.path.join(img_dir, key + "_label.png"))
        )
        ins_seg_pred = np.array(Image.open(base + "-ins_mask.png"))
        fg_seg_gt = np.array(Image.open(os.path.join(img_dir, key + "_fg.png")))
        fg_seg_pred = np.array(Image.open(base + "-fg_mask.png"))
        fg_seg_gt = (fg_seg_gt == 1).astype(bool)
        fg_seg_pred = (fg_seg_pred == 255).astype(bool)

        max_ids = int(max(ins_seg_gt.max(), ins_seg_pred.max(), 1))
        max_ids = int(np.ceil(max_ids / 16) * 16)  # bucket to limit recompiles
        sbds.append(float(calc_sbd(ins_seg_gt, ins_seg_pred, max_ids=max_ids)))
        dics.append(int(calc_dic(n_objects_gt, n_objects_pred)))
        fg_dices.append(float(calc_dice(fg_seg_gt, fg_seg_pred)))

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
