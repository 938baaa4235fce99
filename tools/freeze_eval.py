"""One-time generation of the frozen hard eval asset (VERDICT r3 #1).

Writes ``assets/eval_hard64.{tsbin,tsidx,sha256}`` from the synthetic
generator at the exact distribution the round-3 REPORT used
(tools/quality_report.py: 64 images, seed 99, hard=True, max_leaves=14).
Run once, commit the three files, never regenerate — the point is that
future quality numbers are measured on fixed bytes.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

from tpuseg.data.eval_asset import default_asset_prefix, freeze_eval_records

if __name__ == "__main__":
    prefix = default_asset_prefix()
    if os.path.isfile(prefix + ".sha256") and "--force" not in sys.argv:
        sys.exit(
            f"{prefix}.sha256 already exists — the asset is frozen. "
            "Pass --force only if you intend to re-pin it."
        )
    hashes = freeze_eval_records(prefix)
    for name, digest in sorted(hashes.items()):
        print(f"{digest}  {name}")
    print(f"frozen eval asset written to {prefix}.*")
