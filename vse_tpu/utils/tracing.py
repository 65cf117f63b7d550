"""jax.profiler integration.

First-class tracing replaces the reference's print-based timing
(SURVEY.md §5): wrap any pipeline section in `trace_context` to capture an
XLA/TPU profile viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace_context(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Profile the enclosed block when a trace dir is given (or VSE_TRACE_DIR
    is set); no-op otherwise."""
    trace_dir = trace_dir or os.environ.get("VSE_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-span inside a trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
