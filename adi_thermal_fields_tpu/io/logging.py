"""Tagged run logging and memory estimation helpers.

Mirrors the reference's flush-printing tagged logger and byte estimator
(waam_from_stl_v7_mm.py:19-27) with a structured-metrics upgrade: `Metrics`
accumulates per-step timings/counters and can dump one JSON line per frame
for external tooling.
"""
from __future__ import annotations

import json
import sys
import time

__all__ = ["log", "fmt_bytes", "Metrics"]


def log(msg: str, *, tag: str | None = None, file=None) -> None:
    prefix = f"[{tag}] " if tag else ""
    print(prefix + msg, flush=True, file=file or sys.stdout)


def fmt_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024.0:
            return f"{n:.2f} {unit}"
        n /= 1024.0
    return f"{n:.2f} PiB"


class Metrics:
    """Lightweight wall-clock + counter metrics with JSON-line output."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self.counters: dict[str, float] = {}
        self.timings: dict[str, float] = {}

    def add(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    class _Timer:
        def __init__(self, metrics, name):
            self.metrics, self.name = metrics, name

        def __enter__(self):
            self.start = time.perf_counter()
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.start
            self.metrics.timings[self.name] = (
                self.metrics.timings.get(self.name, 0.0) + dt)

    def timer(self, name: str) -> "_Timer":
        return self._Timer(self, name)

    def emit(self, file=None, **extra) -> None:
        rec = {"wall_s": time.perf_counter() - self._t0,
               **self.counters, **self.timings, **extra}
        print(json.dumps(rec), flush=True, file=file or sys.stderr)
