#!/usr/bin/env python
"""Entry point — see tpuseg/cli/train.py (reference: code/train.py)."""
from tpuseg.cli.train import main

if __name__ == "__main__":
    main()
