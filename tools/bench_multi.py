"""Multi-metric bench (VERDICT r1 weak #6): the driver keeps reading
bench.py's single JSON line; this sidecar records the fuller picture in
BENCH_EXTRA.json:

  * pred_list inference throughput (median of N runs, the bench.py metric)
  * train step/s at the production 256^2 B=8 config (post-compile)
  * evaluate-CLI quality of the committed asset on the hard synthetic
    split (SBD / |DiC| / FG dice), via the real CLI chain

Usage: python tools/bench_multi.py [--skip-quality]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def measure_train_steps(n_steps=10, res=256, batch=8, dtype=None):
    import jax
    import jax.numpy as jnp

    from tpuseg.cli.common import build_model, init_variables
    from tpuseg.configs import cvppp_config
    from tpuseg.data.synthetic import make_scene
    from tpuseg.runtime import create_train_state, make_train_step
    import dataclasses

    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=res, image_width=res, max_n_objects=16
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch),
    )
    model = build_model(cfg, dtype=dtype)
    variables = init_variables(cfg, model, seed=0)
    state = create_train_state(cfg, variables)
    step = make_train_step(cfg, model)

    rng = np.random.default_rng(0)
    imgs, sems, inss, ns = [], [], [], []
    for _ in range(batch):
        rgb, sem, ins, n = make_scene(rng, res, res)
        pad = np.zeros((res, res, 16), np.float32)
        pad[..., : ins.shape[-1]] = ins[..., :16]
        imgs.append(rgb)
        sems.append(np.eye(2, dtype=np.float32)[sem])
        inss.append(pad)
        ns.append(min(n, 16))
    batch_d = {
        "images": jnp.asarray(np.stack(imgs)),
        "sem_onehot": jnp.asarray(np.stack(sems)),
        "ins_masks": jnp.asarray(np.stack(inss)),
        "n_objects": jnp.asarray(np.array(ns, np.int32)),
    }
    key = jax.random.PRNGKey(0)
    state, m = step(state, batch_d, key)  # compile
    _ = np.asarray(m["cost"])
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, m = step(state, batch_d, sub)
    _ = np.asarray(m["cost"])  # sync through the tunnel
    dt = time.perf_counter() - t0
    return n_steps / dt, float(m["cost"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    os.chdir(_REPO)

    # Carry over ONLY the keys other tools own (bench_scaling.py:
    # "scaling_table") — a blanket merge would preserve stale/renamed
    # metrics from older code versions indefinitely (ADVICE r3).
    _FOREIGN_KEYS = ("scaling_table",)
    out = {}
    if os.path.isfile("BENCH_EXTRA.json"):
        try:
            with open("BENCH_EXTRA.json") as f:
                old = json.load(f)
            out = {k: old[k] for k in _FOREIGN_KEYS if k in old}
        except Exception:
            out = {}
    out["provenance"] = {
        "generated_by": "tools/bench_multi.py",
        "commit": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True,
        ).stdout.strip(),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }

    # 1. quality through the CLI chain on the hard split — FIRST, in
    # subprocesses, BEFORE this process initialises jax: only one process
    # may hold the TPU tunnel at a time (CLAUDE.md), so the parent must
    # not have registered yet while pred_list/evaluate run.
    if not args.skip_quality:
        # measured on the FROZEN sha256-pinned asset (VERDICT r3 #1) so
        # cross-round quality numbers share one fixed distribution
        from tpuseg.data.eval_asset import (
            default_asset_prefix, materialize_eval_tree,
        )

        tmp = tempfile.mkdtemp(prefix="tpuseg_benchq_")
        lst = materialize_eval_tree(default_asset_prefix(), tmp)
        meta = os.path.join(tmp, "data", "metadata", "CVPPP")
        img_dir = os.path.join(
            tmp, "data", "raw", "CVPPP", "CVPPP2017_LSC_training",
            "training", "A1",
        )
        out_dir = os.path.join(tmp, "outputs")
        subprocess.run(
            [sys.executable, "pred_list.py", "--lst", lst, "--model",
             "assets/synthetic_ckpt.msgpack", "--dataset", "CVPPP",
             "--batchsize", "16", "--output", out_dir],
            check=True, capture_output=True, text=True,
        )
        ev = subprocess.run(
            [sys.executable, "evaluate.py", "--pred_dir", out_dir,
             "--dataset", "CVPPP", "--metadata", meta, "--img_dir", img_dir],
            check=True, capture_output=True, text=True,
        ).stdout
        for line in ev.strip().splitlines():
            if ":" in line:
                k, v = line.split(":", 1)
                out["quality_hard64_frozen_" + k.strip().replace(" ", "_")] \
                    = round(float(v), 4)

    # 2. inference throughput, median of N
    import bench

    import jax.numpy as jnp

    cfg, model_bf, vars_bf = bench._build(dtype=jnp.bfloat16)
    images = bench._synthetic_images(
        bench.N_IMAGES, cfg.data.image_height, cfg.data.image_width
    )
    vals = [
        bench.measure_tpu(cfg, model_bf, vars_bf, images)
        for _ in range(args.repeat)
    ]
    out["pred_list_images_per_sec"] = {
        "runs": [round(v, 2) for v in vals],
        "median": round(sorted(vals)[len(vals) // 2], 2),
    }

    # 3. train step/s — f32 (the train.py default) AND the --bf16
    # compute path (f32 params/optimizer, f32 loss boundary)
    sps, cost = measure_train_steps()
    out["train_steps_per_sec_256_b8"] = round(sps, 3)
    out["train_images_per_sec_256_b8"] = round(sps * 8, 2)
    out["train_cost_sanity"] = round(cost, 2)
    sps_bf, cost_bf = measure_train_steps(dtype=jnp.bfloat16)
    out["train_steps_per_sec_256_b8_bf16"] = round(sps_bf, 3)
    out["train_images_per_sec_256_b8_bf16"] = round(sps_bf * 8, 2)
    out["train_cost_sanity_bf16"] = round(cost_bf, 2)

    with open("BENCH_EXTRA.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
