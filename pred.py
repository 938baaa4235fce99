#!/usr/bin/env python
"""Entry point — see tpuseg/cli/pred.py (reference: code/pred.py)."""
from tpuseg.cli.pred import main

if __name__ == "__main__":
    main()
