"""How does the pyramid decode cost scale with (folded) batch size?

If decode(B*G) << G * decode(B), folding G glimpses per extraction round
into the batch dimension wins.  Also compares f32 vs bf16.

Usage: python tools/profile_decode_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timer(fn, args, iters=6):
    out = fn(*args)
    np.asarray(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            np.asarray(o)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()

    from bench import _build
    from tpuseg.decoder.pyramid import AttenDecoder

    results = {}
    for dt_name, dtype, act in (
        ("bf16", jnp.bfloat16, jnp.bfloat16),
        ("f32", None, jnp.float32),
    ):
        cfg, model, variables = _build(dtype=dtype)
        p = variables["params"]
        bs = variables.get("batch_stats", {})
        f = cfg.model.n_filters
        H = W = cfg.data.image_height
        bone = AttenDecoder(cfg=cfg.decoder, n_filters=f, dtype=dtype)
        bone_vars = {
            "params": p["decoder"]["glimpse"]["bone"],
            "batch_stats": bs.get("decoder", {}).get("glimpse", {}).get(
                "bone", {}),
        }
        key = jax.random.PRNGKey(0)
        for b in (32, 64, 128, 256):
            feats = tuple(
                jax.random.normal(key, (b, H // s, W // s, f * s), act)
                for s in (1, 2, 4, 8, 16)
            )
            sem_mask = (jax.random.uniform(key, (b, H, W, 1)) > 0.5).astype(
                jnp.float32)

            @jax.jit
            def f_sk(feats):
                return bone.apply(
                    bone_vars, feats, False,
                    method=AttenDecoder.transform_skips)

            skips_t = f_sk(feats)
            point = jnp.full((b,), (H // 2) * W + W // 2, jnp.int32)

            @jax.jit
            def f_dec(skips_t, point, sem_mask):
                t, pr = bone.apply(
                    bone_vars, point, list(skips_t), sem_mask, None, None,
                    False, method=AttenDecoder.decode)
                return jnp.sum(pr[-1].astype(jnp.float32))

            ms = timer(f_dec, (skips_t, point, sem_mask)) * 1e3
            results[f"decode_{dt_name}_b{b}"] = round(ms, 2)
            print(f"decode {dt_name} b={b}: {ms:.2f} ms "
                  f"({ms/b:.3f} ms/sample)", flush=True)
            del feats, skips_t, sem_mask
    print(json.dumps(results))


if __name__ == "__main__":
    main()
