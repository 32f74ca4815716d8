"""Lightweight operational metrics (SURVEY.md §5 metrics/logging row).

The reference exposes no counters at all; production deployments of a
query engine need at least basic observability. This is a process-local
registry of counters and timers updated from the HOST-DRIVEN layers
only (engine entry points, fixup re-runs, backtrace compaction rounds)
— never inside jitted programs, so the hot device path is untouched.

Usage:
    from avxwindowfmindex_tpu.utils import metrics
    metrics.counter("search.queries").add(1024)
    with metrics.timer("search.count_seconds"):
        ...
    metrics.snapshot()  # -> {"search.queries": 1024, ...}

Disabled entirely (all no-ops) with AWFM_METRICS=0.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager
from typing import Dict


_lock = threading.Lock()
_counters: Dict[str, float] = {}


def _enabled() -> bool:
    return os.environ.get("AWFM_METRICS", "1") != "0"


class _Counter:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def add(self, value: float = 1) -> None:
        if not _enabled():
            return
        with _lock:
            _counters[self.name] = _counters.get(self.name, 0) + value

    inc = add


def counter(name: str) -> _Counter:
    return _Counter(name)


@contextmanager
def timer(name: str):
    """Accumulates elapsed wall seconds under ``name`` and counts calls
    under ``name + ".calls"``."""
    if not _enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _counters[name] = _counters.get(name, 0) + dt
            _counters[name + ".calls"] = _counters.get(name + ".calls", 0) + 1


def snapshot() -> Dict[str, float]:
    """Point-in-time copy of every metric."""
    with _lock:
        return dict(_counters)


def reset() -> None:
    with _lock:
        _counters.clear()
