from tpuseg.utils.tracing import trace_context, annotate, StepTimer
from tpuseg.utils.validation import (
    check_batch,
    check_image_batch,
    assert_finite,
    nan_guard,
)

__all__ = [
    "trace_context",
    "annotate",
    "StepTimer",
    "check_batch",
    "check_image_batch",
    "assert_finite",
    "nan_guard",
]
