#!/usr/bin/env python
"""Entry point — see tpuseg/cli/evaluate.py (reference: code/evaluate.py)."""
from tpuseg.cli.evaluate import main

if __name__ == "__main__":
    main()
