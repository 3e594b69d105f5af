"""Per-stage tracing & performance counters.

The reference's only observability is verbosity-4 command logging
(command.rs:5-6).  TPU equivalent: wall-clock per pipeline stage, cell/s
counters for the alignment engine, residues/s for ProstT5, and optional
`jax.profiler` device traces (UNICORE_TPU_TRACE_DIR=/path enables
tracing of every stage into that directory).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

from . import logging as msg

_COUNTERS: Dict[str, float] = {}


def add_counter(name: str, value: float) -> None:
    _COUNTERS[name] = _COUNTERS.get(name, 0.0) + value


def get_counters() -> Dict[str, float]:
    return dict(_COUNTERS)


@contextlib.contextmanager
def stage(name: str):
    """Time a pipeline stage; optionally capture a jax.profiler trace."""
    trace_dir = os.environ.get("UNICORE_TPU_TRACE_DIR")
    ctx = contextlib.nullcontext()
    if trace_dir:
        import jax
        ctx = jax.profiler.trace(os.path.join(trace_dir, name))
    t0 = time.time()
    with ctx:
        yield
    dt = time.time() - t0
    add_counter(f"stage.{name}.seconds", dt)
    msg.println_message(f"[{name}] {dt:.2f}s", 4)


def report() -> str:
    lines = ["performance counters:"]
    for k in sorted(_COUNTERS):
        lines.append(f"  {k} = {_COUNTERS[k]:.3f}")
    return "\n".join(lines)
