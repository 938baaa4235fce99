"""Per-config timing of the TRAIN step on the real TPU chip (VERDICT r3
weak #1: training got zero optimization rounds while inference got
three).

Sweeps {f32, bf16} x {remat on, off} x batch sizes at the production
256^2 resolution and reports post-compile steps/s and img/s; optionally
dumps a jax.profiler trace for the HLO cost map (same method as
PERF.md's inference breakdown).

Timing through the tunnelled axon backend requires a forced host
transfer (np.asarray) to synchronise; steps are dispatched ITERS times
asynchronously and drained, amortising the ~26 ms dispatch round-trip.

Usage: python tools/profile_train.py [--res 256] [--batches 8]
       [--dtypes bf16,f32] [--remat 1,0] [--iters 10] [--trace DIR]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(res: int, batch: int, max_n: int = 16, seed: int = 0):
    import jax.numpy as jnp

    from tpuseg.data.synthetic import make_scene

    rng = np.random.default_rng(seed)
    imgs, sems, inss, ns = [], [], [], []
    for _ in range(batch):
        rgb, sem, ins, n = make_scene(rng, res, res)
        pad = np.zeros((res, res, max_n), np.float32)
        pad[..., : ins.shape[-1]] = ins[..., :max_n]
        imgs.append(rgb)
        sems.append(np.eye(2, dtype=np.float32)[sem])
        inss.append(pad)
        ns.append(min(n, max_n))
    return {
        "images": jnp.asarray(np.stack(imgs)),
        "sem_onehot": jnp.asarray(np.stack(sems)),
        "ins_masks": jnp.asarray(np.stack(inss)),
        "n_objects": jnp.asarray(np.array(ns, np.int32)),
    }


def build_step(res: int, batch: int, dtype, remat: bool, device_aug: bool = False):
    import jax.numpy as jnp

    from tpuseg.cli.common import build_model, init_variables
    from tpuseg.configs import cvppp_config
    from tpuseg.runtime import create_train_state, make_train_step

    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=res, image_width=res, max_n_objects=16
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch),
        decoder=dataclasses.replace(cfg.decoder, remat=remat),
    )
    model = build_model(
        cfg, dtype=jnp.bfloat16 if dtype == "bf16" else None
    )
    variables = init_variables(cfg, model, seed=0)
    state = create_train_state(cfg, variables)
    step = make_train_step(cfg, model, device_aug=device_aug)
    return cfg, state, step


def time_config(res, batch, dtype, remat, iters, device_aug=False):
    import jax

    t_c0 = time.perf_counter()
    cfg, state, step = build_step(res, batch, dtype, remat, device_aug)
    batch_d = make_batch(res, batch)
    key = jax.random.PRNGKey(0)
    try:
        state, m = step(state, batch_d, key)  # compile
        cost0 = float(np.asarray(m["cost"]))  # sync
    except Exception as e:  # OOM etc — record, keep sweeping
        return {"error": str(e)[:200]}
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        state, m = step(state, batch_d, sub)
    cost = float(np.asarray(m["cost"]))  # sync through the tunnel
    dt = (time.perf_counter() - t0) / iters
    return {
        "steps_per_sec": round(1.0 / dt, 3),
        "imgs_per_sec": round(batch / dt, 2),
        "ms_per_step": round(dt * 1e3, 1),
        "compile_s": round(compile_s, 1),
        "cost_first": round(cost0, 4),
        "cost_last": round(cost, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batches", default="8")
    ap.add_argument("--dtypes", default="bf16,f32")
    ap.add_argument("--remat", default="1")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--device_aug", action="store_true",
                    help="time the step WITH on-device augmentation fused "
                         "in (tpuseg/data/device_aug.py)")
    ap.add_argument("--trace", default="",
                    help="dump a jax.profiler trace of the FIRST config")
    args = ap.parse_args()

    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax

    results = {}
    first = True
    for dtype in args.dtypes.split(","):
        for remat in [bool(int(r)) for r in args.remat.split(",")]:
            for batch in [int(b) for b in args.batches.split(",")]:
                tag = f"{dtype}_remat{int(remat)}_b{batch}"
                results[tag] = time_config(
                    args.res, batch, dtype, remat, args.iters,
                    args.device_aug,
                )
                print(tag, results[tag], flush=True)
                if first and args.trace and "error" not in results[tag]:
                    cfg, state, step = build_step(
                        args.res, batch, dtype, remat
                    )
                    batch_d = make_batch(args.res, batch)
                    key = jax.random.PRNGKey(0)
                    state, m = step(state, batch_d, key)
                    np.asarray(m["cost"])
                    with jax.profiler.trace(args.trace):
                        state, m = step(state, batch_d, key)
                        np.asarray(m["cost"])
                    print(f"trace written to {args.trace}", file=sys.stderr)
                first = False
    print(json.dumps({"res": args.res, "iters": args.iters,
                      "configs": results}, indent=2))


if __name__ == "__main__":
    main()
