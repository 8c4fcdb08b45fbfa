"""Profiling / tracing hooks (SURVEY.md §5 — absent in the reference).

Wraps ``jax.profiler`` so any training or sampling run can capture a device
trace viewable in Perfetto/TensorBoard:

    with trace_if("/tmp/trace"):          # no-op when dir is falsy
        run_steps(...)

or via env: ``BYOGAN_TRACE_DIR=/tmp/trace python -m byogan_tpu.cli.main ...``.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace_if(trace_dir: Optional[str] = None) -> Iterator[None]:
    trace_dir = trace_dir or os.environ.get("BYOGAN_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def step_timer(name: str, sink: Optional[dict] = None) -> Iterator[None]:
    """Wall-clock timer; records into ``sink[name]`` seconds if given."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = dt


def annotate(name: str):
    """Named profiler region (shows up in the trace timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
