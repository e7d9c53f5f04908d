"""Structured logging + profiling helpers (SURVEY.md S6 observability row).

The reference logs via print(); here every stage can emit structured JSONL
events (timings, NLLs, diagnostics, throughput) and wrap hot regions in
jax.profiler traces for tensorboard-viewable TPU profiles.
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Optional

_LOG_PATH: Optional[Path] = None


def set_log_path(path) -> None:
    """Enable JSONL event logging to `path` (None disables)."""
    global _LOG_PATH
    _LOG_PATH = Path(path) if path else None


def log_event(event: str, **fields) -> None:
    """Append one structured event; silently a no-op when disabled."""
    if _LOG_PATH is None:
        return
    rec = {"event": event, "time": time.time(), **fields}
    with _LOG_PATH.open("a") as f:
        f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def timed(event: str, **fields):
    """Context manager: logs wall-clock of the block as `event`."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        log_event(event, seconds=time.perf_counter() - t0, **fields)


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """jax.profiler trace wrapper; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
