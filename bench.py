"""Benchmark: pred_list-style batched inference throughput.

Prints ONE JSON line:
  {"metric": "pred_list_images_per_sec", "value": N, "unit": "images/s",
   "vs_baseline": R}

The baseline (reference-equivalent) is the serial single-image pipeline
the reference runs (``code/pred_list.py:63``): per image host
preprocessing + a batch-1 forward + instance assignment, measured on CPU
with batch size 1 and no batching — i.e. this framework operated the way
the reference operates.  The measurement is cached in
``BENCH_BASELINE.json`` so reruns compare against a stable number.

The TPU path is the redesigned pipeline: fixed-size batches through one
jitted program (on-device 21-channel expansion + UNet + semantic head +
iterative instance extraction).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Overridable for A/B operating-point experiments (tools/bench_ab.py
# style); the committed defaults are the recorded operating point.
# 256 images (8 batches in flight) measures steady-state throughput:
# at 128 the 4-batch dispatch pipeline never fills and the edge effects
# are a quarter of the measurement (PERF.md round-3 A/B table).
N_IMAGES = int(os.environ.get("TPUSEG_BENCH_IMAGES", "256"))
BATCH = int(os.environ.get("TPUSEG_BENCH_BATCH", "32"))
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")


def _synthetic_images(n, h, w, seed=0):
    from tpuseg.data.synthetic import make_scene

    rng = np.random.default_rng(seed)
    return np.stack([make_scene(rng, h, w)[0] for _ in range(n)])


def _build(dtype=None):
    import contextlib
    import sys

    from tpuseg.cli.common import (
        adapt_cfg_to_checkpoint,
        build_model,
        load_variables,
    )
    from tpuseg.configs import cvppp_config

    cfg = cvppp_config()
    # trained synthetic weights give the extraction a realistic
    # instance-count workload; conv weights are resolution-independent,
    # so a lower-resolution-trained model still runs at 256.
    ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assets",
        "synthetic_ckpt.msgpack",
    )
    ckpt = ckpt if os.path.isfile(ckpt) else ""
    # keep stdout to exactly ONE JSON line (driver contract): loader
    # chatter goes to stderr
    with contextlib.redirect_stdout(sys.stderr):
        cfg = adapt_cfg_to_checkpoint(cfg, ckpt)
        win = int(os.environ.get("TPUSEG_EXTRACT_WINDOW", "-1"))
        wstride = int(os.environ.get("TPUSEG_EXTRACT_WINDOW_STRIDE", "-1"))
        if win >= 0 or wstride >= 0:
            import dataclasses

            dec = cfg.decoder
            if win >= 0:
                dec = dataclasses.replace(dec, extract_window=win)
            if wstride >= 0:
                dec = dataclasses.replace(dec, extract_window_stride=wstride)
            cfg = dataclasses.replace(cfg, decoder=dec)
        model = build_model(cfg, dtype=dtype)
        variables = load_variables(cfg, model, ckpt, seed=0)
    return cfg, model, variables


def measure_tpu(cfg, model, variables, images) -> float:
    import jax.numpy as jnp

    from tpuseg.cli.common import load_stop_params
    from tpuseg.runtime.predict import Predictor

    # the production pred_list path: Predictor._infer (one fused jitted
    # program; compact uint8 outputs — the host link at ~60 MB/s through
    # the tunnel is the bottleneck, not compute)
    p = Predictor(cfg, model, variables, batch_size=BATCH,
                  stop_params=load_stop_params())
    from tpuseg.runtime.predict import unpack_masks

    infer = p._infer_packed

    batches = [
        jnp.asarray(images[i : i + BATCH])
        for i in range(0, len(images), BATCH)
    ]
    # warmup / compile (np.asarray forces full materialisation — on the
    # tunnelled axon backend block_until_ready alone does not synchronise)
    _ = np.asarray(infer(variables, batches[0])[1])
    t0 = time.perf_counter()
    # dispatch every batch asynchronously, then drain results — overlaps
    # device compute with host transfers (the real pipeline does the
    # same, incl. the packed one-plane mask transfer + host unpack)
    outs = [infer(variables, b) for b in batches]
    for packed, counts in outs:
        _ = unpack_masks(np.asarray(packed)), np.asarray(counts)
    dt = time.perf_counter() - t0
    return len(images) / dt


def measure_tpu_staged(cfg, model, variables, images) -> float:
    """The production staged pred_list path: pipelined window dispatch
    (predict_batches_staged) — prep for every batch, ONE budget readback
    for the window, rounds programs sized to what each batch needs, ONE
    done readback.  Through the tunnel each blocking sync costs ~0.1 s,
    so the window amortization is what lets the 2.5x round savings
    (3 needed vs the static 8 at the k=32 cap) reach the wall clock."""
    import jax.numpy as jnp

    from tpuseg.cli.common import load_stop_params
    from tpuseg.runtime.predict import Predictor

    p = Predictor(cfg, model, variables, batch_size=BATCH, staged=True,
                  stop_params=load_stop_params())
    batches = [
        jnp.asarray(images[i : i + BATCH])
        for i in range(0, len(images), BATCH)
    ]
    from tpuseg.runtime.predict import unpack_masks

    # warmup pass over EVERY batch: compiles prep + all rounds-program
    # lengths this workload needs, so the timed pass never compiles
    outs = p.predict_batches_staged(batches, packed=True)
    for packed, counts in outs:
        _ = unpack_masks(np.asarray(packed)), np.asarray(counts)

    t0 = time.perf_counter()
    outs = p.predict_batches_staged(batches, packed=True)
    for packed, counts in outs:
        _ = unpack_masks(np.asarray(packed)), np.asarray(counts)
    dt = time.perf_counter() - t0
    return len(images) / dt


def measure_baseline_serial_cpu(cfg, model, variables, images) -> float:
    """Reference-style operation: serial, batch 1, CPU, host preprocessing."""
    import jax
    import jax.numpy as jnp

    from tpuseg.data.colorspace import image_ex_standardize

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        cpu_vars = jax.device_put(variables, cpu)

        @jax.jit
        def infer1(variables, x_u8):
            x = image_ex_standardize(x_u8)
            return model.apply(variables, x, mode="infer")

        # >=16 samples for the cached denominator of the headline ratio
        # (3 was too thin a sample for a number inherited forever)
        n = min(int(os.environ.get("BENCH_BASELINE_N", "16")), len(images))
        _ = np.asarray(infer1(cpu_vars, jnp.asarray(images[:1]))[2])
        t0 = time.perf_counter()
        for i in range(n):
            sem, idmap, counts = infer1(cpu_vars, jnp.asarray(images[i : i + 1]))
            _ = np.asarray(idmap), np.asarray(counts), np.asarray(sem)
        dt = time.perf_counter() - t0
    return n / dt


def main():
    import jax.numpy as jnp

    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()

    # bfloat16 compute path for the TPU measurement (params stay f32)
    cfg, model, variables = _build(dtype=jnp.bfloat16)
    images = _synthetic_images(N_IMAGES, cfg.data.image_height,
                               cfg.data.image_width)
    import sys

    if cfg.model.use_count_head:
        # A/B both dispatch modes (monolithic is the pred_list default;
        # staged loses through the tunnel — see pred_list.py)
        ips = measure_tpu_staged(cfg, model, variables, images)
        ips_mono = measure_tpu(cfg, model, variables, images)
        print(
            f"staged={ips:.2f} img/s, monolithic={ips_mono:.2f} img/s",
            file=sys.stderr,
        )
        ips = max(ips, ips_mono)
    else:
        ips = measure_tpu(cfg, model, variables, images)

    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)["serial_cpu_images_per_sec"]
    else:
        # baseline is measured with the f32 model (reference-equivalent)
        cfg32, model32, variables32 = _build(dtype=None)
        baseline = measure_baseline_serial_cpu(
            cfg32, model32, variables32, images
        )
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "serial_cpu_images_per_sec": baseline,
                    "note": "reference-equivalent serial batch-1 CPU pipeline",
                },
                f,
                indent=2,
            )

    print(
        json.dumps(
            {
                "metric": "pred_list_images_per_sec",
                "value": round(ips, 3),
                "unit": "images/s",
                "vs_baseline": round(ips / baseline, 2) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
