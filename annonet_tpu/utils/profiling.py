"""Profiling hooks: jax.profiler traces around any code region.

The reference's observability is wall-clock printouts only
(annonet_infer_main.cpp:438-507); the rebuild adds real device traces
(SURVEY.md §5 'same CLI timing report + jax.profiler trace option'). View
the captured trace with TensorBoard's profile plugin or xprof.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def profiler_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``trace_dir`` (no-op when None)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
