"""Re-measure BENCH_BASELINE.json over >=16 images (VERDICT r3 weak #4:
the cached serial-CPU denominator of bench.py's vs_baseline ratio rested
on a 3-image sample).

Runs the reference-equivalent pipeline (serial, batch-1, f32, CPU —
bench.py::measure_baseline_serial_cpu) and atomically rewrites the cache
with the sample size recorded.  MUST run with the box's single CPU core
otherwise idle: contention would deflate the baseline and inflate the
headline ratio.

Usage: python tools/recache_baseline.py [--n 16]
"""

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    args = ap.parse_args()

    import jax

    # axon is pinned by sitecustomize; this job must not touch the tunnel
    jax.config.update("jax_platforms", "cpu")

    os.environ["BENCH_BASELINE_N"] = str(args.n)
    from bench import (
        BASELINE_FILE, _build, _synthetic_images,
        measure_baseline_serial_cpu,
    )

    cfg, model, variables = _build(dtype=None)  # f32, reference-equivalent
    images = _synthetic_images(args.n, cfg.data.image_height,
                               cfg.data.image_width)
    ips = measure_baseline_serial_cpu(cfg, model, variables, images)
    payload = {
        "serial_cpu_images_per_sec": ips,
        "note": "reference-equivalent serial batch-1 CPU pipeline",
        "n_images": args.n,
    }
    tmp = BASELINE_FILE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, BASELINE_FILE)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
