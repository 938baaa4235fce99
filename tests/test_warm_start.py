"""Warm-start story: the persistent compilation cache used by all four
CLIs (tpuseg.utils.enable_compilation_cache) must round-trip across
processes — executables compiled once are reused, not recompiled.

Runs two subprocesses sharing one cache dir: the first populates it, the
second must hit it (asserted via JAX's persistent-cache logging) without
adding new entries.
"""

import os
import subprocess
import sys

CHILD = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import logging
logging.basicConfig(level=logging.DEBUG)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
import jax.numpy as jnp

@jax.jit
def f(x):
    return jnp.tanh(x @ x.T) * 3.0

import numpy as np
out = f(jnp.asarray(np.ones((64, 64), np.float32)))
print("RESULT", float(out.sum()))
"""


def _run(cache_dir):
    return subprocess.run(
        [sys.executable, "-c", CHILD, cache_dir],
        capture_output=True, text=True, timeout=300,
    )


def test_persistent_cache_round_trip(tmp_path):
    cache = str(tmp_path / "jax_cache")
    os.makedirs(cache, exist_ok=True)

    r1 = _run(cache)
    assert r1.returncode == 0, r1.stderr[-2000:]
    entries1 = [f for f in os.listdir(cache) if not f.startswith(".")]
    assert entries1, "first process wrote no cache entries"

    r2 = _run(cache)
    assert r2.returncode == 0, r2.stderr[-2000:]
    entries2 = [f for f in os.listdir(cache) if not f.startswith(".")]
    # same program, same key: the second process must reuse, not add
    assert sorted(entries2) == sorted(entries1)
    assert "RESULT" in r2.stdout


def test_enable_compilation_cache_sets_config(tmp_path):
    # in-process: the helper must point jax at the requested directory
    import jax

    from tpuseg.utils import enable_compilation_cache

    target = str(tmp_path / "cc")
    enable_compilation_cache(target)
    assert jax.config.jax_compilation_cache_dir == os.path.abspath(target)
