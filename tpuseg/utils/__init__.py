import os


def enable_compilation_cache(path: str = "") -> None:
    """Persist XLA compilations across processes (best effort)."""
    import jax

    path = path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, os.pardir,
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


from tpuseg.utils.tracing import trace_context, annotate, StepTimer
from tpuseg.utils.validation import (
    check_batch,
    check_image_batch,
    assert_finite,
    nan_guard,
)

__all__ = [
    "enable_compilation_cache",
    "trace_context",
    "annotate",
    "StepTimer",
    "check_batch",
    "check_image_batch",
    "assert_finite",
    "nan_guard",
]
