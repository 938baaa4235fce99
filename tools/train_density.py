"""Train the density-regression counting head on the frozen flagship asset.

VERDICT r2 "next" #2 asks for |DiC| <= 0.5 on the hard split;
tools/count_diagnosis.py shows extraction hits the count-head budget 84%
of the time, so the budget's accuracy (classifier head: 41% exact, 75%
within-1 on hard scenes) IS the |DiC| floor.  Density regression — a
per-pixel map where each GT instance contributes unit mass, count =
integral — is the stronger counting architecture (models/reseg.py::
_DensityHead).  The head reads the UNet decoder features behind a
stop_gradient, so this run trains ONLY the head: segmentation quality
(SBD) of the asset is untouched by construction.

Streams fresh synthetic scenes every step (the generator is the dataset),
mixing the hard and standard presets so both eval splits are covered.

Usage: python tools/train_density.py --steps 3000 --install
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import dataclasses
import time

import numpy as np


def make_pool(rng, n, res, max_slots, hard_frac=0.5, max_leaves=14):
    """Pre-generate scenes as (rgb, instance LABEL map uint8, count) — the
    label map is ~60x smaller than the per-slot mask stack, so a
    1500-scene pool fits comfortably; batches expand slots on the fly."""
    from tpuseg.data.synthetic import make_scene

    imgs = np.zeros((n, res, res, 3), np.uint8)
    labels = np.zeros((n, res, res), np.uint8)
    counts = np.zeros((n,), np.int32)
    for i in range(n):
        hard = bool(rng.random() < hard_frac)
        rgb, _, ins, cnt = make_scene(
            rng, res, res, hard=hard,
            max_leaves=max_leaves if hard else 12,
        )
        imgs[i] = rgb
        # label map loses overlap pixels to the later instance; each
        # instance keeps >= its visible region, which is what the density
        # target needs (unit mass per instance over its support)
        for k in range(min(ins.shape[-1], max_slots)):
            labels[i][ins[:, :, k] > 0] = k + 1
        counts[i] = cnt
    return imgs, labels, counts


def host_density_target(labels, counts, max_slots, scale):
    """GT density computed host-side in numpy: the per-slot mask stack is
    (B,H,W,16) f32 = 67 MB/batch — at the tunnel's ~60 MB/s shipping it
    dominates the step; the (B,H,W,1) target is 16x smaller."""
    b, h, w = labels.shape
    gt = np.zeros((b, h, w, 1), np.float32)
    for i in range(b):
        for k in range(1, min(int(counts[i]), max_slots) + 1):
            m = labels[i] == k
            a = m.sum()
            if a:
                gt[i, :, :, 0][m] += scale / a
    # mass-preserving pool onto the head's 1/4-res grid
    return gt.reshape(b, h // 4, 4, w // 4, 4, 1).sum(axis=(2, 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="assets/synthetic_ckpt.msgpack")
    ap.add_argument("--out", default="/tmp/tpuseg_r3/density_ckpt.msgpack")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--n-val", type=int, default=128)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--pool", type=int, default=1500)
    ap.add_argument("--max-leaves", type=int, default=14)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--install", action="store_true",
                    help="copy the best checkpoint over --ckpt")
    ap.add_argument("--calibrate-only", action="store_true",
                    help="skip training: refit ONLY the folded affine "
                         "count calibration of the checkpoint's existing "
                         "head on a fresh val pool (inference-only, "
                         "minutes not hours)")
    ap.add_argument("--hard-frac", type=float, default=0.5,
                    help="hard-preset fraction of the calibration/val "
                         "pool (the |DiC| gate is hard-split; weighting "
                         "the pool toward it targets the gate)")
    args = ap.parse_args()
    os.chdir(_REPO)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import flax.serialization
    import jax.numpy as jnp
    import optax

    from tpuseg.cli.common import _merge_restore, build_model, init_variables
    from tpuseg.configs import cvppp_config
    from tpuseg.data.colorspace import image_ex_standardize
    from tpuseg.models.reseg import DENSITY_SCALE
    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()

    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=args.res, image_width=args.res,
            max_n_objects=16,
        ),
        model=dataclasses.replace(cfg.model, use_density_head=True),
    )
    model = build_model(cfg)
    variables = init_variables(cfg, model, seed=0)
    with open(args.ckpt, "rb") as f:
        stored = flax.serialization.msgpack_restore(f.read())
    variables = _merge_restore(dict(variables), stored)
    print(f"resumed from {args.ckpt} (density head keeps fresh init)",
          flush=True)

    base_params = {
        k: v for k, v in variables["params"].items() if k != "density_head"
    }
    aux = {k: v for k, v in variables.items() if k != "params"}
    head0 = variables["params"]["density_head"]

    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.05)
    # clip first: the 1/4-res map loss is large early (per-pixel targets
    # are 16x the full-res values) and an unclipped first few steps can
    # slam the ReLU stack dead (observed: constant-output head)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adam(sched)
    )
    opt_state = tx.init(head0)

    def loss_fn(head_params, imgs_u8, gt, counts):
        params = {**base_params, "density_head": head_params}
        dens = model.apply(
            {"params": params, **aux},
            image_ex_standardize(imgs_u8),
            train=False, mode="density",
        )
        # npix/16 scaling: same loss magnitude as the full-res head (the
        # 1/4-res pixels carry 16x the mass, 256x the squared values)
        mse = jnp.mean(jnp.square(dens - gt)) * float(
            (args.res // 4) * (args.res // 4) / 16.0
        )
        est = jnp.sum(dens, axis=(1, 2, 3)) / DENSITY_SCALE
        cl = jnp.mean(jnp.square(est - counts.astype(jnp.float32)))
        return mse + 0.1 * cl, est

    @jax.jit
    def train_step(head_params, opt_state, imgs_u8, gt, counts):
        (loss, est), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            head_params, imgs_u8, gt, counts
        )
        updates, opt_state = tx.update(grads, opt_state, head_params)
        head_params = optax.apply_updates(head_params, updates)
        err = jnp.mean(jnp.abs(jnp.round(est) - counts))
        return head_params, opt_state, loss, err

    @jax.jit
    def predict_counts(head_params, imgs_u8):
        params = {**base_params, "density_head": head_params}
        dens = model.apply(
            {"params": params, **aux},
            image_ex_standardize(imgs_u8),
            train=False, mode="density",
        )
        return jnp.sum(dens, axis=(1, 2, 3)) / DENSITY_SCALE

    rng = np.random.default_rng(args.seed)
    if not args.calibrate_only:
        hf = f"_h{int(round(args.hard_frac * 100)):02d}"
        cache = (f"/tmp/tpuseg_r3/pool_{args.pool}_{args.res}_{args.seed}"
                 f"{hf if args.hard_frac != 0.5 else ''}.npz")
        if os.path.isfile(cache):
            d = np.load(cache)
            pi, pl, pc = d["pi"], d["pl"], d["pc"]
            print(f"loaded pool from {cache}", flush=True)
        else:
            print(f"generating {args.pool}-scene pool...", flush=True)
            pi, pl, pc = make_pool(
                rng, args.pool, args.res, 16, hard_frac=args.hard_frac,
                max_leaves=args.max_leaves,
            )
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez_compressed(cache, pi=pi, pl=pl, pc=pc)
    val_rng = np.random.default_rng(999)
    vi, vl, vc = make_pool(
        val_rng, args.n_val, args.res, 16, hard_frac=args.hard_frac,
        max_leaves=args.max_leaves,
    )

    def evaluate(head_params):
        ests = []
        for s in range(0, args.n_val, args.batch):
            chunk = vi[s : s + args.batch]
            if len(chunk) < args.batch:
                chunk = np.concatenate([
                    chunk,
                    np.repeat(chunk[:1], args.batch - len(chunk), axis=0),
                ])
            e = np.asarray(predict_counts(head_params, jnp.asarray(chunk)))
            ests.append(e[: min(args.batch, args.n_val - s)])
        est = np.round(np.concatenate(ests)).astype(int)
        err = est - vc
        return {
            "mae": float(np.abs(err).mean()),
            "exact": float((err == 0).mean()),
            "within1": float((np.abs(err) <= 1).mean()),
            "bias": float(err.mean()),
        }

    head = head0
    best = None
    best_mae = 1e9
    # tail-averaged (SWA) candidate: the eval-to-eval val MAE oscillates
    # ~0.43-0.78 late in training (observed); averaging the tail
    # checkpoints damps that variance at zero training cost
    swa_sum, swa_n = None, 0
    swa_start = int(args.steps * 0.5)
    t0 = time.time()
    if args.calibrate_only:
        best = jax.device_get(head0)
        m = evaluate(head0)
        print(f"pre-calibration val: MAE {m['mae']:.3f} exact "
              f"{m['exact']*100:.0f}% within1 {m['within1']*100:.0f}% "
              f"bias {m['bias']:+.2f}", flush=True)
        best_mae = m["mae"]
        args.steps = 0
    for step in range(1, args.steps + 1):
        idx = rng.integers(0, args.pool, size=args.batch)
        imgs, labels, counts = pi[idx].copy(), pl[idx].copy(), pc[idx]
        # count-invariant D4 augmentation (flip + rot90): the head
        # overfits a finite pool hard (observed: train MAE 0.06 vs val
        # 0.43 on a 2500-scene pool) — the 8 dihedral views multiply the
        # effective pool for free, and density targets transform with
        # the label map exactly
        for j in range(args.batch):
            k = int(rng.integers(0, 4))
            if k:
                imgs[j] = np.rot90(imgs[j], k)
                labels[j] = np.rot90(labels[j], k)
            if rng.random() < 0.5:
                imgs[j] = imgs[j][:, ::-1]
                labels[j] = labels[j][:, ::-1]
        gt = host_density_target(labels, counts, 16, DENSITY_SCALE)
        head, opt_state, loss, err = train_step(
            head, opt_state, jnp.asarray(imgs), jnp.asarray(gt),
            jnp.asarray(counts),
        )
        if step % 50 == 0:
            print(f"step {step}: loss {float(loss):.4f} "
                  f"train_mae {float(err):.3f} "
                  f"({(time.time()-t0):.0f}s)", flush=True)
        if step % args.eval_every == 0 or step == args.steps:
            m = evaluate(head)
            print(f"  val @{step}: MAE {m['mae']:.3f} exact "
                  f"{m['exact']*100:.0f}% within1 {m['within1']*100:.0f}% "
                  f"bias {m['bias']:+.2f}", flush=True)
            if m["mae"] < best_mae:
                best_mae, best = m["mae"], jax.device_get(head)
                print("  new best", flush=True)
            if step >= swa_start:
                hp = jax.device_get(head)
                if swa_sum is None:
                    swa_sum = jax.tree.map(
                        lambda a: np.asarray(a, np.float64).copy(), hp
                    )
                else:
                    swa_sum = jax.tree.map(
                        lambda s, a: s + np.asarray(a, np.float64),
                        swa_sum, hp,
                    )
                swa_n += 1

    if best is None:
        best = jax.device_get(head)
    if swa_n >= 2:
        swa = jax.tree.map(
            lambda s: (s / swa_n).astype(np.float32), swa_sum
        )
        m_swa = evaluate(swa)
        print(f"SWA of last {swa_n} evals: val MAE {m_swa['mae']:.3f} "
              f"exact {m_swa['exact']*100:.0f}% within1 "
              f"{m_swa['within1']*100:.0f}% bias {m_swa['bias']:+.2f}",
              flush=True)
        if m_swa["mae"] < best_mae:
            best_mae, best = m_swa["mae"], swa
            print("SWA candidate wins", flush=True)

    # ---- closed-form affine count calibration (folded into the head's
    # out_gain/out_off params: integral' = a*integral + b) ----
    def raw_ests(head_params, imgs):
        ests = []
        for s in range(0, len(imgs), args.batch):
            chunk = imgs[s : s + args.batch]
            nv = len(chunk)
            if nv < args.batch:
                chunk = np.concatenate([
                    chunk, np.repeat(chunk[:1], args.batch - nv, axis=0)
                ])
            e = np.asarray(predict_counts(head_params, jnp.asarray(chunk)))
            ests.append(e[:nv])
        return np.concatenate(ests)

    ests = raw_ests(best, vi)
    A = np.stack([ests, np.ones_like(ests)], axis=1)
    coef = np.linalg.lstsq(A, vc.astype(np.float64), rcond=None)[0]
    a_fit, b_fit = float(coef[0]), float(coef[1])
    # fine-tune the offset on the ROUNDED objective (exactness-aware)
    best_b, best_obj = float(b_fit), 1e9
    for db in np.linspace(-0.5, 0.5, 41):
        r = np.round(a_fit * ests + b_fit + db)
        obj = np.abs(r - vc).mean() - 0.01 * (r == vc).mean()
        if obj < best_obj:
            best_obj, best_b = obj, float(b_fit + db)
    best["out_gain"] = np.asarray(best["out_gain"]) * a_fit
    best["out_off"] = np.asarray(best["out_off"]) * a_fit + best_b
    print(f"calibration: a={a_fit:.4f} b={best_b:+.3f}", flush=True)

    # honest post-calibration numbers on SECOND held-out sets, one per
    # preset (the |DiC| gate is hard-split; standard must not regress)
    hi, _, hc = make_pool(
        np.random.default_rng(1234), args.n_val, args.res, 16,
        hard_frac=1.0, max_leaves=args.max_leaves,
    )
    si, _, sc = make_pool(
        np.random.default_rng(4321), args.n_val, args.res, 16,
        hard_frac=0.0, max_leaves=args.max_leaves,
    )
    for name, imgs_h, counts_h in (
        ("val", vi, vc), ("holdout-hard", hi, hc), ("holdout-std", si, sc),
    ):
        e = np.round(raw_ests(best, imgs_h)).astype(int)
        err = e - counts_h
        print(f"calibrated {name}: MAE {np.abs(err).mean():.3f} exact "
              f"{(err == 0).mean()*100:.0f}% within1 "
              f"{(np.abs(err) <= 1).mean()*100:.0f}% bias {err.mean():+.2f}",
              flush=True)

    payload = jax.device_get({
        "params": {**base_params, "density_head": best},
        **aux,
    })
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))
    print(f"saved {args.out} (best val MAE {best_mae:.3f})", flush=True)
    if args.install:
        import shutil

        shutil.copyfile(args.out, args.ckpt)
        print(f"installed into {args.ckpt}", flush=True)


if __name__ == "__main__":
    main()
