"""Tracing / profiling utilities.

The reference's only profiling is a cProfile block in the SRU test and a
wall-clock epoch timer (SURVEY.md §5.1).  Here: ``jax.profiler`` trace
capture (viewable in TensorBoard/Perfetto), named step annotations, and a
step timer that forces materialisation — necessary on the tunnelled axon
backend where ``block_until_ready`` does not synchronise.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace_context(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with forced materialisation.

    ``timer.time(fn, *args)`` runs fn, pulls one leaf to host (real sync),
    and records the duration under ``name``.
    """

    def __init__(self):
        self.records: Dict[str, list] = {}

    def time(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            np.asarray(leaves[0])
        self.records.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "mean_s": float(np.mean(v)),
                "min_s": float(np.min(v)),
                "count": len(v),
            }
            for k, v in self.records.items()
        }
