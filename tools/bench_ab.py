"""A/B bench of inference-config knobs on the real chip.

Runs the exact bench.py measurement (same images, same jitted program
shape) under config variants passed as --set decoder.field=value pairs.

Usage:
  python tools/bench_ab.py --set decoder.use_pallas_softmax=True
  python tools/bench_ab.py --set decoder.extract_group=8
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def apply_overrides(cfg, pairs):
    groups = {}
    for pair in pairs:
        path, val = pair.split("=", 1)
        group, field = path.split(".")
        v = eval(val)  # ints/bools/floats from the CLI
        groups.setdefault(group, {})[field] = v
    for group, fields in groups.items():
        cfg = dataclasses.replace(
            cfg, **{group: dataclasses.replace(getattr(cfg, group), **fields)}
        )
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", action="append", default=[],
                    help="group.field=value config override")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    import bench
    import jax.numpy as jnp

    from tpuseg.cli.common import (
        adapt_cfg_to_checkpoint, build_model, load_variables,
    )
    from tpuseg.configs import cvppp_config

    cfg = cvppp_config()
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "synthetic_ckpt.msgpack")
    ckpt = ckpt if os.path.isfile(ckpt) else ""
    cfg = adapt_cfg_to_checkpoint(cfg, ckpt)
    cfg = apply_overrides(cfg, args.set)
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = load_variables(cfg, model, ckpt, seed=0)

    images = bench._synthetic_images(
        bench.N_IMAGES, cfg.data.image_height, cfg.data.image_width
    )
    vals = [
        bench.measure_tpu(cfg, model, variables, images)
        for _ in range(args.repeat)
    ]
    print({"overrides": args.set,
           "img_per_sec": [round(v, 2) for v in vals],
           "median": round(sorted(vals)[len(vals) // 2], 2)})


if __name__ == "__main__":
    main()
