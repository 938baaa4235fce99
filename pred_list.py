#!/usr/bin/env python
"""Entry point — see tpuseg/cli/pred_list.py (reference: code/pred_list.py)."""
from tpuseg.cli.pred_list import main

if __name__ == "__main__":
    main()
