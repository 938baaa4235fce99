"""Native-resolution quality report (VERDICT r3 next #9).

The reference's prediction path resizes every input to the 256x256
model shape and upsamples the annotation back to the native image size
(`/root/reference/code/lib/prediction.py:47-50`) — so native-resolution
ground truth is scored against upsampled 256-grid masks.  tpuseg's
`pred_list --bucketed` instead runs the whole network at the native
shape (static per-bucket compiles).  This tool measures what that is
worth: the same fresh hard eval set at a non-256 native shape, scored
through the full CLI chain both ways:

  A. default path — 256 resize in, nearest-upsample out (reference
     semantics);
  B. --bucketed — native-shape inference, no resample on either side.

Both runs use --f32 so the comparison isolates resolution semantics
(and keeps remote compiles ~seconds; the bf16 512 compile costs minutes
through the tunnel).  Appends a marked section to REPORT.md which
tools/quality_report.py preserves across rewrites.

Usage: python tools/native_res_report.py [--n 24] [--res 512] [--seed 7]
"""

import argparse
import os
import re
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

MARK_BEGIN = "<!-- NATIVE_RES:BEGIN -->"
MARK_END = "<!-- NATIVE_RES:END -->"


def sh(cmd):
    print("+", " ".join(cmd), flush=True)
    out = subprocess.run(cmd, capture_output=True, text=True)
    print(out.stdout[-1500:], flush=True)
    if out.returncode != 0:
        print(out.stderr[-2000:], flush=True)
        raise RuntimeError(cmd)
    return out.stdout


def parse_metrics(ev_out: str):
    """Anchored parse of evaluate.py's exact labels
    (tpuseg/cli/evaluate.py:125-127) — fails loudly on no match instead
    of grabbing a number from an unrelated line (ADVICE r4)."""
    pats = {
        "sbd": r"^MEAN SBD\s*:\s*([-+0-9.eE]+|nan)\s*$",
        "dic": r"^MEAN \|DIC\|\s*:\s*([-+0-9.eE]+|nan)\s*$",
        "fg": r"^MEAN FG DICE\s*:\s*([-+0-9.eE]+|nan)\s*$",
    }
    vals = {}
    for line in ev_out.splitlines():
        for key, pat in pats.items():
            m = re.match(pat, line.strip())
            if m and key not in vals:
                vals[key] = float(m.group(1))
    missing = [k for k in pats if k not in vals]
    if missing:
        raise RuntimeError(
            f"evaluate.py output did not match expected labels {missing}; "
            f"raw output:\n{ev_out}"
        )
    return vals["sbd"], vals["dic"], vals["fg"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    os.chdir(_REPO)
    from tpuseg.data.synthetic import write_synthetic_eval_tree

    tmp = tempfile.mkdtemp(prefix="tpuseg_native_")
    lst = write_synthetic_eval_tree(
        tmp, args.n, seed=args.seed, height=args.res, width=args.res,
        hard=True, max_leaves=14,
    )
    meta = os.path.join(tmp, "data", "metadata", "CVPPP")
    img_dir = os.path.join(
        tmp, "data", "raw", "CVPPP", "CVPPP2017_LSC_training", "training",
        "A1",
    )

    results = {}
    for tag, extra in [("resize256", []), ("native_bucketed", ["--bucketed"])]:
        out_dir = os.path.join(tmp, "out_" + tag)
        sh([sys.executable, "pred_list.py", "--lst", lst, "--model",
            "assets/synthetic_ckpt.msgpack", "--dataset", "CVPPP",
            "--batchsize", str(args.batch), "--output", out_dir, "--f32"]
           + extra)
        ev = sh([sys.executable, "evaluate.py", "--pred_dir", out_dir,
                 "--dataset", "CVPPP", "--metadata", meta, "--img_dir",
                 img_dir])
        results[tag] = (parse_metrics(ev), ev.strip())

    (sbd_a, dic_a, fg_a), _ = results["resize256"]
    (sbd_b, dic_b, fg_b), _ = results["native_bucketed"]
    section = "\n".join([
        MARK_BEGIN,
        "## Native-resolution quality (tools/native_res_report.py)",
        "",
        f"{args.n} fresh hard scenes at {args.res}x{args.res} native "
        f"(seed {args.seed}), scored via the full CLI chain, f32 both "
        "ways. 'resize256' is the reference's semantics — model at "
        "256², nearest-upsampled masks scored against native GT "
        "(prediction.py:47-50); 'native' is `pred_list --bucketed` "
        "running the network at the native shape.",
        "",
        "| path | SBD | |DiC| | FG dice |",
        "|---|---|---|---|",
        f"| resize256 (reference semantics) | {sbd_a} | {dic_a} | {fg_a} |",
        f"| native --bucketed | {sbd_b} | {dic_b} | {fg_b} |",
        "",
        (f"Delta (native - resize256): SBD {sbd_b - sbd_a:+.4f}, "
         f"|DiC| {dic_b - dic_a:+.3f}."
         if None not in (sbd_a, sbd_b, dic_a, dic_b) else
         "Delta unavailable (metric parse failed — see raw output)."),
        MARK_END,
    ])

    rp = os.path.join(_REPO, "REPORT.md")
    text = open(rp).read() if os.path.isfile(rp) else ""
    if MARK_BEGIN in text:
        pre = text[: text.index(MARK_BEGIN)]
        post = text[text.index(MARK_END) + len(MARK_END):]
        text = pre + section + post
    else:
        text = text.rstrip() + "\n\n" + section + "\n"
    with open(rp, "w") as f:
        f.write(text)
    print(section)


if __name__ == "__main__":
    main()
