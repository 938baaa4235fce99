"""Step-0 gradient parity vs the reference (VERDICT r3 weak #3).

At identical initial weights and one identical batch, compares
  1. the FULL gradient pytree: the reference's ``cost.backward()`` grads
     (captured pre-clip at the ``clip_grad_norm_`` call site,
     model.py:272-277), mapped through the same torch->flax layout
     transforms as the weights (tools/convert_reference_weights), vs
     ``jax.grad`` of the tpuseg train loss;
  2. the first optimizer update: the per-leaf parameter DELTAS after one
     Adadelta step on each side.

Setup mirrors tools/parity_run.py exactly: argmax glimpse + identity
instance order pinned on both sides, dropout off, criterion 'Multi',
Adadelta lr=1 wd=1e-3 clip=10, seed 23.  CPU-only (torch + jax cpu).

Writes the '## Step-0 gradient parity' section of PARITY.md in place
(between GRADS markers) and prints the worst leaves.

Usage: python tools/parity_grads.py [--rel 1e-4]
"""

from __future__ import annotations

import argparse
import copy
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np

from tools.parity_run import (
    B, H, N, W, _ListLoader, _pin_reference_determinism, build_batches,
)

MARK_BEGIN = "<!-- GRADS:BEGIN -->"
MARK_END = "<!-- GRADS:END -->"


def run_reference(torch_batches, run_dir):
    """One real Model.fit epoch over one minibatch; returns
    (initial state_dict, pre-clip grads by param name, updated state_dict,
    pre-clip global grad norm, set of dormant param names)."""
    import torch

    from tools.reference_shim import load_reference

    ref = load_reference()
    ref.config.H = H
    ref.config.W = W
    ref.config.drop_rate = 0.0
    ref.config.pickle_path = run_dir + "/"
    _pin_reference_determinism(ref)

    torch.manual_seed(23)
    np.random.seed(23)
    tmodel = ref.ReSeg(2, True, pretrained=False, use_coordinates=False,
                       use_wae=False, usegpu=False)
    m = ref.Model(
        "CVPPP", "ReSeg", 2, N, wae_opt=None,
        use_instance_segmentation=True, use_wae=False, use_coords=False,
        load_model_path="", usegpu=False,
    )
    m.model = tmodel
    init_sd = copy.deepcopy(tmodel.state_dict())

    captured = {}
    dormant = set()
    norm_box = {}
    orig_clip = torch.nn.utils.clip_grad_norm_

    def capture_clip(params, max_norm, **kw):
        # called once between backward and step (model.py:275-277):
        # p.grad here is the raw cost gradient (weight decay is applied
        # later inside Adadelta.step, like optax's add_decayed_weights)
        for name, p in tmodel.named_parameters():
            if p.grad is None:
                # dormant parameter in the executed config (e.g.
                # decoder.pred: the L0Layer branch at attenet2.py:489
                # is never taken under the glimpse path) — the parity
                # claim is then "tpuseg's grad is zero too", which the
                # rel-L2 table checks (0 vs 0 passes, 0 vs !=0 blows up)
                captured[name] = np.zeros(tuple(p.shape), np.float32)
                dormant.add(name)
            else:
                captured[name] = p.grad.detach().clone().numpy()
        norm_box["pre_clip"] = float(
            np.sqrt(sum(float((g ** 2).sum()) for g in captured.values()))
        )
        return orig_clip(params, max_norm, **kw)

    torch.nn.utils.clip_grad_norm_ = capture_clip
    try:
        m.fit(
            "Multi", 0.5, 1.5, 2,
            1.0, 0.001, 10.0,
            0.5, 25, False, "Adadelta",
            True, 1, None,
            _ListLoader(torch_batches), _ListLoader(torch_batches[:1]),
            run_dir, False,
        )
    finally:
        torch.nn.utils.clip_grad_norm_ = orig_clip
    assert captured, "clip_grad_norm_ was never reached"
    updated_sd = copy.deepcopy(tmodel.state_dict())
    return init_sd, captured, updated_sd, norm_box["pre_clip"], dormant


def run_tpuseg(init_sd, jax_batch):
    """tpuseg grads + one train-step update from the converted weights.
    Returns (template, init params, grads pytree, updated params,
    pre-clip global grad norm)."""
    import dataclasses

    import jax

    if "axon" in str(jax.config.jax_platforms or ""):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpuseg.utils import enable_compilation_cache

    enable_compilation_cache()  # the CPU grad jit takes minutes; cache it

    from tools.convert_reference_weights import convert
    from tpuseg.cli.common import build_model, init_variables
    from tpuseg.configs import cvppp_config
    from tpuseg.runtime.state import create_train_state
    from tpuseg.runtime.train import make_train_step, total_cost

    cfg = cvppp_config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, image_height=H, image_width=W, max_n_objects=N
        ),
        decoder=dataclasses.replace(
            cfg.decoder, drop_rate=0.0, sp_reduction=20,
            deterministic_glimpse=True,
            entropy_normal=(H / 256.0) ** 0.5,
        ),
        model=dataclasses.replace(
            cfg.model, use_count_head=False, use_density_head=False
        ),
    )
    model = build_model(cfg)
    template = init_variables(cfg, model, seed=0)
    variables = convert(init_sd, dict(template))
    state = create_train_state(cfg, variables)
    batch = {k: jnp.asarray(v) for k, v in jax_batch.items()}
    key = jax.random.PRNGKey(23)

    def loss_fn(params):
        # the same composition as make_train_step's loss_fn
        vs = {
            "params": params,
            "batch_stats": state.batch_stats,
            "decoder_state": state.decoder_state,
        }
        r1, r2 = jax.random.split(key)
        (sem_logits, _, dec_losses), _ = model.apply(
            vs, batch["images"], batch["sem_onehot"], batch["ins_masks"],
            batch["n_objects"], train=True, mode="loss",
            rngs={"glimpse": r1, "dropout": r2},
            mutable=["batch_stats", "decoder_state"],
        )
        cost, _ = total_cost(
            cfg, sem_logits.astype(jnp.float32), batch["sem_onehot"],
            dec_losses, train=True, n_objects=batch["n_objects"],
        )
        return cost

    grads = jax.jit(jax.grad(loss_fn))(state.params)
    norm = float(jnp.sqrt(sum(
        jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads)
    )))
    step = make_train_step(cfg, model)
    state2, _ = step(state, batch, key)
    return template, state.params, grads, state2.params, norm


def leaf_rel_table(ref_tree, tpu_tree):
    """Per-leaf relative L2 error ||a-b|| / max(||a||, 1e-12)."""
    from flax.traverse_util import flatten_dict

    ref_flat = flatten_dict(ref_tree)
    tpu_flat = flatten_dict(tpu_tree)
    assert set(ref_flat) == set(tpu_flat)
    rows = []
    for k in sorted(ref_flat):
        a = np.asarray(ref_flat[k], np.float64)
        b = np.asarray(tpu_flat[k], np.float64)
        na = np.linalg.norm(a)
        rel = np.linalg.norm(a - b) / max(na, 1e-12)
        rows.append(("/".join(k), na, rel))
    return rows


def concat_rel(ref_tree, tpu_tree, exclude=()):
    """Scale-invariant aggregate: ||a-b|| / ||a|| over the CONCATENATED
    vector of all leaves.  Per-leaf relative error on near-zero-norm
    leaves (BN biases whose grads cancel to ~1e-8 while the global norm
    is ~600) measures fp32 rounding noise, not math divergence; the
    concatenated metric weighs every coordinate by its actual
    contribution to the update."""
    from flax.traverse_util import flatten_dict

    ref_flat = flatten_dict(ref_tree)
    tpu_flat = flatten_dict(tpu_tree)
    num = 0.0
    den = 0.0
    for k in sorted(ref_flat):
        if "/".join(k) in exclude:
            continue
        a = np.asarray(ref_flat[k], np.float64)
        b = np.asarray(tpu_flat[k], np.float64)
        num += float(((a - b) ** 2).sum())
        den += float((a ** 2).sum())
    return float(np.sqrt(num) / max(np.sqrt(den), 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rel", type=float, default=1e-4,
                    help="per-leaf relative-L2 gate for the gradients")
    ap.add_argument("--rel_update", type=float, default=1e-3,
                    help="per-leaf gate for the first optimizer update "
                         "(Adadelta's eps=1e-6 state amplifies fp noise)")
    ap.add_argument("--rel_concat", type=float, default=1e-3,
                    help="gate on the concatenated gradient vector")
    ap.add_argument("--rel_major", type=float, default=1e-2,
                    help="per-leaf gate applied only to leaves whose "
                         "||g_ref|| exceeds 1e-5 of the global grad norm "
                         "(ADVICE r4: a mid-norm leaf regression must not "
                         "hide under the concat aggregate)")
    ap.add_argument("--rel_update_concat", type=float, default=1e-2,
                    help="gate on the concatenated first-update deltas")
    ap.add_argument("--out", default=os.path.join(_REPO, "PARITY.md"))
    args = ap.parse_args()

    torch_batches, jax_batches = build_batches(1)
    run_dir = "/tmp/parity_grads_ref"
    os.makedirs(run_dir, exist_ok=True)

    print("=== reference: 1 Model.fit step, grads captured ===", flush=True)
    init_sd, ref_grads_sd, updated_sd, ref_norm, dormant = run_reference(
        torch_batches, run_dir
    )
    print("=== tpuseg: jax.grad + 1 train step ===", flush=True)
    template, p0, grads, p1, tpu_norm = run_tpuseg(init_sd, jax_batches[0])

    # map the torch grads through the weight-layout conversion: a
    # state_dict-shaped dict with grad values for every parameter (BN
    # running stats keep their real values — they fill the batch_stats
    # collection, which is not compared)
    from tools.convert_reference_weights import convert

    grad_sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
               for k, v in init_sd.items()}
    for name, g in ref_grads_sd.items():
        assert name in grad_sd, name
        grad_sd[name] = g
    ref_grads = convert(grad_sd, dict(template))["params"]
    ref_p0 = convert(init_sd, dict(template))["params"]
    ref_p1 = convert(updated_sd, dict(template))["params"]

    # dormant-leaf mask, pushed through the same layout transform so
    # torch param names map to flax leaf paths (ones survive
    # transpose/reshape): torch's Adadelta SKIPS params whose .grad is
    # None, while optax applies weight decay to every leaf, so the
    # first-update comparison must exclude dormant leaves (their grad
    # parity is still checked above: 0 vs 0).
    dormant_sd = {
        k: (np.ones if k in dormant else np.zeros)(
            tuple(v.shape), np.float32
        ) if hasattr(v, "shape") else v
        for k, v in init_sd.items()
    }
    dormant_tree = convert(dormant_sd, dict(template))["params"]

    import jax
    from flax.traverse_util import flatten_dict

    dormant_leaves = {
        "/".join(k)
        for k, v in flatten_dict(dormant_tree).items()
        if np.any(np.asarray(v) != 0)
    }

    grad_rows = leaf_rel_table(ref_grads, grads)
    # first-update deltas
    delta_ref = jax.tree.map(lambda a, b: np.asarray(b) - np.asarray(a),
                             ref_p0, ref_p1)
    delta_tpu = jax.tree.map(lambda a, b: np.asarray(b) - np.asarray(a),
                             p0, p1)
    upd_rows = [r for r in leaf_rel_table(delta_ref, delta_tpu)
                if r[0] not in dormant_leaves]

    def summarize(rows, gate):
        rels = [r for _, _, r in rows]
        worst = sorted(rows, key=lambda r: -r[2])[:5]
        return {
            "n": len(rows),
            "median": float(np.median(rels)),
            "p90": float(np.percentile(rels, 90)),
            "worst": worst,
            "n_over": sum(r > gate for r in rels),
        }

    gsum = summarize(grad_rows, args.rel)
    usum = summarize(upd_rows, args.rel_update)
    cg = concat_rel(ref_grads, grads)
    cu = concat_rel(delta_ref, delta_tpu, exclude=dormant_leaves)

    # ADVICE r4 (low): secondary per-leaf gate on MAJOR leaves — those
    # whose reference norm exceeds a floor relative to the global norm.
    # The concat metric is the headline (near-zero-norm BN biases are
    # fp32 noise), but a genuine divergence in one mid-norm leaf must
    # still fail the verdict.
    norm_floor = ref_norm * 1e-5
    major_rows = [r for r in grad_rows if r[1] > norm_floor]
    major_over = [r for r in major_rows if r[2] > args.rel_major]

    # raw grads on disk so the distribution stays auditable
    dump = os.path.join("/tmp", "parity_grads_dump.npz")
    np.savez_compressed(
        dump,
        **{"ref__" + k: np.asarray(v)
           for k, v in flatten_dict(ref_grads, sep="/").items()},
        **{"tpu__" + k: np.asarray(v)
           for k, v in flatten_dict(grads, sep="/").items()},
    )

    lines = [
        MARK_BEGIN,
        "## Step-0 gradient parity",
        "",
        "`tools/parity_grads.py`: full gradient pytree + first Adadelta",
        "update vs the reference at identical weights/batch (pre-clip",
        "grads captured at the reference's clip_grad_norm_ call,",
        "model.py:275-277; layouts mapped by",
        "tools/convert_reference_weights).",
        "",
        f"* global grad norm: reference {ref_norm:.6f} vs tpuseg "
        f"{tpu_norm:.6f} (rel {abs(ref_norm - tpu_norm) / ref_norm:.2e})",
        f"* **concatenated gradient vector rel L2: {cg:.2e}** "
        f"(gate {args.rel_concat:.0e}) — the scale-invariant aggregate; "
        f"per-leaf relatives on ~1e-8-norm BN-bias leaves measure fp32 "
        f"rounding (torch-CPU vs XLA-CPU op orderings differ), not math",
        f"* **concatenated first-update delta rel L2: {cu:.2e}** "
        f"(gate {args.rel_update_concat:.0e}; Adadelta's eps=1e-6 state "
        f"amplifies grad noise on small-accumulator coords)",
        f"* per-leaf gradients: {gsum['n']} leaves, median rel "
        f"{gsum['median']:.2e}, p90 {gsum['p90']:.2e}, {gsum['n_over']} "
        f"over {args.rel:.0e}",
        f"* per-leaf first update: {usum['n']} leaves, median rel "
        f"{usum['median']:.2e}, p90 {usum['p90']:.2e}, {usum['n_over']} "
        f"over {args.rel_update:.0e}",
        f"* per-leaf MAJOR gate (||g_ref|| > 1e-5 of global norm): "
        f"{len(major_rows)} leaves, {len(major_over)} over "
        f"{args.rel_major:.0e}",
        f"* raw grad trees dumped to {dump} for audit",
        # ADVICE r4 (low): the dormant torch params (untaken L0Layer
        # branch, attenet2.py:489) are on the weight converter's skip
        # list ('decoder.pred.'), so they map to 0 flax leaves — state
        # plainly whether they were excluded or actually compared
        (f"* dormant reference params (no grad): {len(dormant)} torch "
         f"params / {len(dormant_leaves)} surviving flax leaves — "
         + ("grad parity checked as 0 vs 0; excluded from the update "
            "table because torch's Adadelta skips None-grad params "
            "while optax weight-decays every leaf"
            if dormant_leaves else
            "all on the converter's skip list, so they are EXCLUDED "
            "from every comparison (no flax counterpart exists; "
            "nothing is checked 0-vs-0)")),
        "",
        "Worst gradient leaves:",
        "",
        "| leaf | ||g_ref|| | rel L2 |",
        "|---|---|---|",
    ]
    for k, na, rel in gsum["worst"]:
        lines.append(f"| {k} | {na:.3e} | {rel:.2e} |")
    lines += ["", "Worst first-update leaves:", "",
              "| leaf | ||d_ref|| | rel L2 |", "|---|---|---|"]
    for k, na, rel in usum["worst"]:
        lines.append(f"| {k} | {na:.3e} | {rel:.2e} |")
    grad_ok = cg <= args.rel_concat and not major_over
    upd_ok = cu <= args.rel_update_concat
    lines += [
        "",
        f"**Verdict (concat gates + major-leaf gate): gradients "
        f"{'PASS' if grad_ok else 'FAIL'} (concat {cg:.2e}, "
        f"{len(major_over)} major leaves over {args.rel_major:.0e}), "
        f"first update {'PASS' if upd_ok else 'FAIL'} ({cu:.2e}).**",
        MARK_END,
    ]
    section = "\n".join(lines)

    text = open(args.out).read() if os.path.isfile(args.out) else ""
    if MARK_BEGIN in text:
        pre = text[: text.index(MARK_BEGIN)]
        post = text[text.index(MARK_END) + len(MARK_END):]
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(args.out, "w") as f:
        f.write(text)
    print(section)
    print(f"\nwrote section to {args.out}")
    sys.exit(0 if (grad_ok and upd_ok) else 1)


if __name__ == "__main__":
    main()
