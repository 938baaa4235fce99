"""Single-image inference CLI — reference ``code/pred.py`` contract.

``--image --model --output --dataset`` with the fg-mask path as the default
behaviour (reference __main__, pred.py:110-123) and ``--instances`` for the
full 4-artifact instance path (the reference's ``handleins``,
pred.py:56-91 — which crashes there; it works here).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from tpuseg.cli.common import (
    adapt_cfg_to_checkpoint,
    build_model,
    colorize_instances,
    load_variables,
)
from tpuseg.runtime.predict import Predictor
from tpuseg.settings import get_config


def main(argv=None):
    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()  # warm starts: reuse compiled executables
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True, help="Path of the image")
    parser.add_argument("--model", default="", help="Path of the model")
    parser.add_argument("--usegpu", action="store_true", default=True)
    parser.add_argument("--output", default="outputs/pred",
                        help="Path of the output directory")
    parser.add_argument("--dataset", type=str, default="CVPPP")
    parser.add_argument("--instances", action="store_true",
                        help="run the full instance path (handleins)")
    opt = parser.parse_args(argv)

    assert opt.dataset in ["CVPPP"]
    os.makedirs(opt.output, exist_ok=True)
    cfg = get_config(opt.dataset)
    cfg = adapt_cfg_to_checkpoint(cfg, opt.model)
    model = build_model(cfg)
    variables = load_variables(cfg, model, opt.model)
    predictor = Predictor(cfg, model, variables, batch_size=1)

    image_name = os.path.splitext(os.path.basename(opt.image))[0]

    if opt.instances:
        res = next(iter(predictor.predict_paths([opt.image])))
        fg = (res["fg_mask"] * 255).astype(np.uint8)
        ins = res["ins_mask"].astype(np.uint8)
        Image.fromarray(res["image"]).save(
            os.path.join(opt.output, image_name + ".png")
        )
        Image.fromarray(fg).convert("P").save(
            os.path.join(opt.output, image_name + "-fg_mask.png")
        )
        Image.fromarray(ins).save(
            os.path.join(opt.output, image_name + "-ins_mask.png")
        )
        Image.fromarray(colorize_instances(ins)).save(
            os.path.join(opt.output, image_name + "-ins_mask_color.png")
        )
        np.save(
            os.path.join(opt.output, image_name + "-n_objects.npy"),
            np.asarray(res["n_objects"]),
        )
    else:
        res = predictor.predict_semantic(opt.image)
        fg = ((res["fg_prob"] > 0.5) * 255).astype(np.uint8)
        Image.fromarray(fg).convert("P").save(
            os.path.join(opt.output, image_name + "-fg_mask.png")
        )
    print(f"wrote predictions for {image_name} to {opt.output}")


if __name__ == "__main__":
    main()
