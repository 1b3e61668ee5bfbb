"""Observability: leveled logging, phase timing, memory introspection.

The reference equivalents: kmer-cnt's singleton Logger with leveled
streams + optional file (logger.h), ProgressPercent (progress_bar.h),
getPeakRSS/getMemorySize (memory_info.h); f5c's per-phase time
accounting in core_t printed as a report (meth_main.c:617-676); the
per-benchmark rdtsc workTicks / load-imbalance summaries
(fmi.cpp:292-302, main_banded.cpp:310-318); and the VTune ittnotify ROI
markers compiled in with -DVTUNE_ANALYSIS (fmi/Makefile:66-69).

TPU equivalents here:
* Logger        — leveled stderr + optional file sink, timestamps.
* PhaseTimer    — named accumulating phases with a f5c-style report.
* roi()         — region-of-interest context manager that doubles as a
                  jax.profiler trace annotation (the ittnotify analog).
* peak_rss(), device_mem_stats() — memory introspection.
"""

from __future__ import annotations

import contextlib
import resource
import sys
import time


class Logger:
    """Leveled logger (logger.h semantics: debug/info/warning/error, an
    optional log file, wall-clock timestamps)."""

    LEVELS = {"debug": 10, "info": 20, "warning": 30, "error": 40}

    def __init__(self, level="info", logfile=None, stream=None):
        self.level = self.LEVELS[level]
        self.stream = stream or sys.stderr
        self._fh = open(logfile, "a") if logfile else None
        self._t0 = time.time()

    def _emit(self, lvl, msg):
        if self.LEVELS[lvl] < self.level:
            return
        line = f"[{time.strftime('%H:%M:%S')}] [{lvl.upper():7s}] {msg}"
        print(line, file=self.stream)
        if self._fh:
            print(line, file=self._fh, flush=True)

    def debug(self, msg):
        self._emit("debug", msg)

    def info(self, msg):
        self._emit("info", msg)

    def warning(self, msg):
        self._emit("warning", msg)

    def error(self, msg):
        self._emit("error", msg)


class PhaseTimer:
    """Accumulating named phase timers with an f5c-style report
    (meth_main.c:617-676 prints per-phase seconds and flags the
    dominant phase)."""

    def __init__(self):
        self.acc: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.acc[name] = self.acc.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, fp=None) -> str:
        fp = fp or sys.stderr
        total = sum(self.acc.values()) or 1e-12
        lines = ["[phase report]"]
        for name, t in sorted(self.acc.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"  {name:<24s} {t:9.3f} s  {100 * t / total:5.1f}%  (x{self.counts[name]})"
            )
        dominant = max(self.acc, key=self.acc.get)
        lines.append(f"  dominant phase: {dominant}")
        out = "\n".join(lines)
        print(out, file=fp)
        return out


@contextlib.contextmanager
def roi(name: str = "kernel"):
    """Region-of-interest marker: shows up in jax.profiler traces (the
    ittnotify __itt_resume/__itt_pause analog)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def peak_rss() -> int:
    """Peak resident set size in bytes (memory_info.h getPeakRSS)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024


def device_mem_stats():
    """Per-device HBM stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out


class ProgressPercent:
    """progress_bar.h equivalent: prints whole-percent advances."""

    def __init__(self, total: int, stream=None):
        self.total = max(total, 1)
        self.done = 0
        self.last = -1
        self.stream = stream or sys.stderr

    def advance(self, n: int = 1):
        self.done += n
        pct = 100 * self.done // self.total
        if pct != self.last:
            self.last = pct
            print(f"\r{pct}%", end="", file=self.stream, flush=True)
            if pct >= 100:
                print(file=self.stream)
