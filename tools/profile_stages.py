"""Per-stage timing of the batched inference path on the real TPU chip.

Decomposes the bench pipeline (tools used by bench.py / Predictor) into:
  preprocess  : uint8 -> 21-channel standardized (image_ex_standardize)
  semantic    : preprocess + UNet backbone + SE + sem head
  infer(k)    : full path with max_instances=k for k in sweep — the slope
                over k is the per-glimpse-slot extraction cost, the k->0
                intercept minus `semantic` is the attend + skip-transform
                cost.

Timing through the tunnelled axon backend requires a forced host transfer
(np.asarray) to synchronise; each stage is dispatched ITERS times
asynchronously and drained, amortising the ~26 ms dispatch round-trip.

Usage: python tools/profile_stages.py [--batch 32] [--f32] [--trace DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 8


def time_fn(fn, *args, iters=ITERS, sync=lambda out: np.asarray(out)):
    # warmup / compile
    sync(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        sync(o)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--trace", default="", help="jax.profiler trace dir")
    ap.add_argument("--ks", default="1,8,16,32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()

    from bench import _build, _synthetic_images
    from tpuseg.data.colorspace import image_ex_standardize

    dtype = None if args.f32 else jnp.bfloat16
    cfg, model, variables = _build(dtype=dtype)
    images = _synthetic_images(args.batch, cfg.data.image_height,
                               cfg.data.image_width)
    x_u8 = jnp.asarray(images)

    results = {}

    @jax.jit
    def f_pre(x_u8):
        return image_ex_standardize(x_u8)

    results["preprocess"] = time_fn(
        f_pre, x_u8, sync=lambda o: np.asarray(o[0, 0, 0]))

    @jax.jit
    def f_sem(variables, x_u8):
        x = image_ex_standardize(x_u8)
        probs = model.apply(variables, x, mode="semantic")
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

    results["semantic"] = time_fn(f_sem, variables, x_u8)

    ks = [int(k) for k in args.ks.split(",")]
    for k in ks:
        @jax.jit
        def f_inf(variables, x_u8, k=k):
            x = image_ex_standardize(x_u8)
            sem_probs, idmap, counts = model.apply(
                variables, x, mode="infer", max_instances=k)
            fg = jnp.argmax(sem_probs, axis=-1).astype(jnp.uint8)
            return fg, idmap.astype(jnp.uint8), counts.astype(jnp.int32)

        results[f"infer_k{k}"] = time_fn(
            f_inf, variables, x_u8,
            sync=lambda o: [np.asarray(t) for t in o])

    # derived numbers
    b = args.batch
    if len(ks) >= 2:
        k_lo, k_hi = ks[0], ks[-1]
        slope = (results[f"infer_k{k_hi}"] - results[f"infer_k{k_lo}"]) / (
            k_hi - k_lo)
        results["per_slot_extract"] = slope
        results["attend_plus_skips"] = (
            results[f"infer_k{k_lo}"] - slope * k_lo - results["semantic"])
    results["unet_only"] = results["semantic"] - results["preprocess"]

    if args.trace:
        import jax.profiler

        @jax.jit
        def f_full(variables, x_u8):
            x = image_ex_standardize(x_u8)
            return model.apply(variables, x, mode="infer")

        out = f_full(variables, x_u8)
        [np.asarray(t) for t in out]
        with jax.profiler.trace(args.trace):
            out = f_full(variables, x_u8)
            [np.asarray(t) for t in out]
        print(f"trace written to {args.trace}", file=sys.stderr)

    report = {
        "batch": b,
        "dtype": "f32" if args.f32 else "bf16",
        "stages_ms_per_batch": {k: round(v * 1e3, 2) for k, v in results.items()},
        "stages_ms_per_image": {k: round(v * 1e3 / b, 3) for k, v in results.items()},
        "imgs_per_sec_full": round(b / results[f"infer_k{ks[-1]}"], 2),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
