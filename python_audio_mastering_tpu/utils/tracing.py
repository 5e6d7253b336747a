"""Tracing / profiling spans (SURVEY.md §5: the reference has none — its
progress visibility is bare ``print()``; engine:77).

Lightweight host-side spans with wall/ready timing for the device-async
world (a span can record both dispatch time and completion time), a
process-wide trace buffer, and an optional bridge to ``jax.profiler`` for
XLA-level traces.

    with span("eq"):
        y = eq(x)
    print(trace_summary())
"""

from __future__ import annotations

import contextlib
import json
import threading
import time

__all__ = ["span", "get_trace", "clear_trace", "trace_summary", "xla_trace",
           "Counter", "counters"]

_local = threading.local()
_global_lock = threading.Lock()
_global_trace: list[dict] = []


def _stack():
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


@contextlib.contextmanager
def span(name: str, sync=None, **attrs):
    """Record a named span.  ``sync``: optional callable invoked before the
    span closes (e.g. ``lambda: jax.block_until_ready(out)``) so device
    time is attributed to the span that launched it."""
    stack = _stack()
    rec = {"name": "/".join(s["name"] for s in stack) + "/" + name
           if stack else name,
           "start": time.perf_counter(), **attrs}
    stack.append(rec)
    try:
        yield rec
    finally:
        if sync is not None:
            sync()
        rec["dur_ms"] = (time.perf_counter() - rec["start"]) * 1000.0
        del rec["start"]
        stack.pop()
        with _global_lock:
            _global_trace.append(rec)


def get_trace() -> list[dict]:
    with _global_lock:
        return list(_global_trace)


def clear_trace():
    with _global_lock:
        _global_trace.clear()


def trace_summary() -> str:
    """Aggregate by span name: count, total and mean duration."""
    agg: dict[str, list[float]] = {}
    for rec in get_trace():
        agg.setdefault(rec["name"], []).append(rec.get("dur_ms", 0.0))
    lines = [f"{name:40s} n={len(ds):4d} total={sum(ds):9.2f}ms "
             f"mean={sum(ds) / len(ds):8.2f}ms"
             for name, ds in sorted(agg.items(),
                                    key=lambda kv: -sum(kv[1]))]
    return "\n".join(lines)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Wrap a region in a ``jax.profiler`` trace (TensorBoard-viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Counter:
    """A tiny thread-safe metric counter."""

    def __init__(self, name: str):
        self.name = name
        self.value = 0
        self._lock = threading.Lock()

    def inc(self, by: int = 1):
        with self._lock:
            self.value += by


class _Counters:
    def __init__(self):
        self._counters: dict[str, Counter] = {}
        self._lock = threading.Lock()

    def __call__(self, name: str) -> Counter:
        with self._lock:
            if name not in self._counters:
                self._counters[name] = Counter(name)
            return self._counters[name]

    def snapshot(self) -> dict[str, int]:
        with self._lock:
            return {k: c.value for k, c in self._counters.items()}

    def dump_json(self) -> str:
        return json.dumps(self.snapshot(), sort_keys=True)


counters = _Counters()
