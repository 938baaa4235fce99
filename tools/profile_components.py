"""Direct component timing on the TPU chip with synthesized inputs.

Times each stage of the inference path in isolation by applying the
submodules directly with their parameter subtrees — no subtraction games:
  stem            : _InsStem on the UNet output
  s_sp            : SpatialAttention (256^2, d_model)
  attend          : HardAttention (per-instance softmax head)
  transform_skips : the 5 glimpse-independent skip-transform chains
  decode1         : one pyramid decode (5 levels) given transformed skips
  extract_scan    : the full extraction scan (as shipped)

Usage: python tools/profile_components.py [--batch 32] [--f32] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timer(fn, args, iters, sync):
    sync(fn(*args))  # compile + warmup
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        for o in outs:
            sync(o)
        ts.append((time.perf_counter() - t0) / iters)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()

    from bench import _build
    from tpuseg.decoder.pyramid import AttenDecoder
    from tpuseg.models.reseg import _InsStem
    from tpuseg.nn.attention import HardAttention, SpatialAttention

    dtype = None if args.f32 else jnp.bfloat16
    act = jnp.float32 if args.f32 else jnp.bfloat16
    cfg, model, variables = _build(dtype=dtype)
    p = variables["params"]
    bs = variables.get("batch_stats", {})

    b = args.batch
    H = W = cfg.data.image_height
    f = cfg.model.n_filters
    d_model = cfg.decoder.d_model
    key = jax.random.PRNGKey(0)

    x_dec = jax.random.normal(key, (b, H, W, f), act)
    sem_mask = (jax.random.uniform(key, (b, H, W, 1)) > 0.5).astype(jnp.float32)
    feats = tuple(
        jax.random.normal(key, (b, H // s, W // s, f * s), act)
        for s in (1, 2, 4, 8, 16)
    )

    results = {}

    def sync_tree(o):
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(o)][0]

    # ---- stem
    stem = _InsStem(d_model, dtype=dtype)
    stem_vars = {"params": p["ins_stem"], "batch_stats": bs.get("ins_stem", {})}

    @jax.jit
    def f_stem(x):
        return jnp.sum(stem.apply(stem_vars, x, False).astype(jnp.float32))

    @jax.jit
    def f_stem_out(x):
        return stem.apply(stem_vars, x, False)

    results["stem"] = timer(f_stem, (x_dec,), args.iters, sync_tree)
    encode = f_stem_out(x_dec)

    # ---- spatial attention
    sp = SpatialAttention(d_model=d_model, dtype=dtype)
    sp_vars = {
        "params": p["decoder"]["s_sp"],
        "batch_stats": bs.get("decoder", {}).get("s_sp", {}),
    }

    @jax.jit
    def f_sp(e, m):
        return jnp.sum(sp.apply(sp_vars, e, m, train=False).astype(jnp.float32))

    @jax.jit
    def f_sp_out(e, m):
        return sp.apply(sp_vars, e, m, train=False)

    results["s_sp"] = timer(f_sp, (encode, sem_mask), args.iters, sync_tree)
    s_sp_out = f_sp_out(encode, sem_mask)

    # ---- hard attention
    ha = HardAttention(
        d_k=cfg.decoder.d_k, use_pallas=cfg.decoder.use_pallas_softmax,
        dtype=dtype,
    )
    ha_vars = {
        "params": p["decoder"]["attend"],
        "batch_stats": bs.get("decoder", {}).get("attend", {}),
    }

    @jax.jit
    def f_ha(s, m):
        p_, e_ = ha.apply(ha_vars, s, m, m, train=False)
        return jnp.sum(p_.astype(jnp.float32)) + jnp.sum(e_.astype(jnp.float32))

    results["attend"] = timer(f_ha, (s_sp_out, sem_mask), args.iters, sync_tree)

    # ---- pyramid: transform_skips + one decode
    bone = AttenDecoder(cfg=cfg.decoder, n_filters=f, dtype=dtype)
    bone_vars = {
        "params": p["decoder"]["glimpse"]["bone"],
        "batch_stats": bs.get("decoder", {}).get("glimpse", {}).get("bone", {}),
    }

    @jax.jit
    def f_skips(feats):
        outs = bone.apply(
            bone_vars, feats, False, method=AttenDecoder.transform_skips
        )
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    @jax.jit
    def f_skips_out(feats):
        return bone.apply(
            bone_vars, feats, False, method=AttenDecoder.transform_skips
        )

    results["transform_skips"] = timer(f_skips, (feats,), args.iters, sync_tree)
    skips_t = f_skips_out(feats)

    point = jnp.full((b,), (H // 2) * W + W // 2, jnp.int32)

    @jax.jit
    def f_dec1(skips_t, point, sem_mask):
        t, pr = bone.apply(
            bone_vars, point, list(skips_t), sem_mask, None, None, False,
            method=AttenDecoder.decode,
        )
        return jnp.sum(pr[-1].astype(jnp.float32))

    results["decode1"] = timer(
        f_dec1, (skips_t, point, sem_mask), args.iters, sync_tree)

    # ---- full extract scan, as shipped
    @jax.jit
    def f_extract(variables, x):
        sem_probs, idmap, counts = model.apply(variables, x, mode="infer")
        return idmap.astype(jnp.uint8), counts

    from bench import _synthetic_images
    from tpuseg.data.colorspace import image_ex_standardize

    imgs = jnp.asarray(_synthetic_images(b, H, W))

    @jax.jit
    def f_full(variables, imgs):
        x = image_ex_standardize(imgs)
        sem_probs, idmap, counts = model.apply(variables, x, mode="infer")
        return idmap.astype(jnp.uint8), counts

    results["full_infer"] = timer(
        f_full, (variables, imgs), max(args.iters // 2, 3), sync_tree)

    report = {
        "batch": b,
        "dtype": "f32" if args.f32 else "bf16",
        "ms_per_batch": {k: round(v * 1e3, 2) for k, v in results.items()},
        "ms_per_image": {k: round(v * 1e3 / b, 3) for k, v in results.items()},
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
