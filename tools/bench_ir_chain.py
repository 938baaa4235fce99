"""Parity + benchmark for the fused inverted-residual chain kernel.

Compares ``tpuseg.kernels.ir_chain.ir_chain`` against the XLA-compiled
flax chain (4x ``InvertedResidual`` + mid-chain skip add, the hot loop of
``tpuseg/decoder/pyramid.py`` ``_UpAttenLevel``) at the production decode
shapes of the 256-sq flagship: level 4 (256x256, C=32) and level 3
(128x128, C=32), decode batch = extract_group * glimpses.

Usage:
  python tools/bench_ir_chain.py --parity          # CPU interpret parity
  python tools/bench_ir_chain.py --tpu             # TPU timing vs XLA
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def build_chain(key, ch: int, dtype):
    """4 InvertedResidual blocks with randomized BN stats; returns
    (vars_list, flax_apply(x, x1u))."""
    import jax
    import jax.numpy as jnp
    from tpuseg.nn.blocks import InvertedResidual

    blocks = [InvertedResidual(ch, dtype=dtype) for _ in range(4)]
    vars_list = []
    x0 = jnp.zeros((1, 8, 8, ch), dtype)
    for i, blk in enumerate(blocks):
        key, k1, k2, k3 = jax.random.split(key, 4)
        v = blk.init(k1, x0)
        # randomize BN stats so folding is actually exercised
        stats = jax.tree.map(lambda a: a, v["batch_stats"])
        leaves, treedef = jax.tree.flatten(stats)
        new_leaves = []
        for j, leaf in enumerate(leaves):
            k2, sub = jax.random.split(k2)
            if leaf.ndim == 1:
                new_leaves.append(
                    jax.random.normal(sub, leaf.shape) * 0.3
                    + (1.0 if "var" not in str(j) else 1.0)
                )
            else:
                new_leaves.append(leaf)
        stats = jax.tree.unflatten(treedef, new_leaves)
        # variances must be positive
        stats = jax.tree.map(jnp.abs, stats)
        v = {"params": v["params"], "batch_stats": stats}
        vars_list.append(v)

    def apply(x, x1u):
        y = x
        for i, (blk, v) in enumerate(zip(blocks, vars_list)):
            if i == 2 and x1u is not None:
                y = y + x1u
            y = blk.apply(v, y, train=False)
        return y

    return vars_list, apply


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hb", type=int, default=16)
    args = ap.parse_args()

    import jax

    if args.parity:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from tpuseg.kernels.ir_chain import ir_chain, stack_chain_params

    dtype = jnp.bfloat16

    def run_case(b, h, w, ch, interpret, iters=0, hb=None):
        key = jax.random.PRNGKey(0)
        vars_list, flax_apply = build_chain(key, ch, dtype)
        packed = stack_chain_params(vars_list, dtype=dtype)
        kx, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(kx, (b, h, w, ch), dtype)
        x1u = jax.random.normal(k2, (b, h, w, ch), dtype)

        ref_fn = jax.jit(flax_apply)
        ref = ref_fn(x, x1u)
        got = ir_chain(x, x1u, *packed, hb=hb, interpret=interpret)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        )
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"  ({b},{h},{w},{ch}) hb={hb}: max abs err {err:.4f} "
              f"(out scale {scale:.1f}, rel {err / max(scale, 1e-6):.2e})")
        ok = err <= 0.15 * scale / 10 or err < 0.35  # bf16 chain tolerance
        if iters:
            for name, fn in (
                ("xla", lambda: ref_fn(x, x1u)),
                ("pallas", lambda: ir_chain(
                    x, x1u, *packed, hb=hb, interpret=False)),
            ):
                fn()  # compile
                np.asarray(fn())  # tunnel sync
                t0 = time.perf_counter()
                outs = [fn() for _ in range(iters)]
                np.asarray(outs[-1])
                dt = (time.perf_counter() - t0) / iters * 1e3
                gb = 2 * b * h * w * ch * 2 / 1e9  # in+out bf16
                print(f"    {name}: {dt:.3f} ms  ({gb / (dt / 1e3):.0f} GB/s "
                      f"min-traffic equiv)")
        return ok

    if args.parity:
        print("interpret-mode parity (CPU):")
        ok1 = run_case(2, 32, 32, 16, True, hb=16)
        ok2 = run_case(1, 64, 48, 32, True, hb=16)
        print("PASS" if (ok1 and ok2) else "FAIL")
        sys.exit(0 if (ok1 and ok2) else 1)

    if args.tpu:
        print(f"TPU timing (batch={args.batch}, hb={args.hb}):")
        run_case(args.batch, 256, 256, 32, False, iters=20, hb=args.hb)
        run_case(args.batch, 128, 128, 32, False, iters=20, hb=args.hb)
        run_case(args.batch, 64, 64, 64, False, iters=20, hb=args.hb)


if __name__ == "__main__":
    main()
