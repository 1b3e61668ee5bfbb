"""Profiler-separated device time for a callable.

Wall timings on this machine's tunneled TPU include ~60-80 ms dispatch
round trips and a ~28 MB/s result link, so `wall_s` alone misattributes
link stalls to kernels (BASELINE.md "Measurement caveat").  This helper
runs `fn` under `jax.profiler.trace` and sums the trace's complete ("X")
events per track, so a bench can report device-kernel seconds next to its
wall — the discipline VERDICT r1 asked to extend to every kernel.

Usage:
    from tools.device_rate import traced_seconds
    report = traced_seconds(lambda: my_bench_step())
    # report["by_track"] = {track name: seconds}, report["device_s"] =
    # best-effort sum over tracks that look like accelerator op streams.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile


def _load_trace_events(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    events, names = [], {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            ph = ev.get("ph")
            pid, tid = ev.get("pid"), ev.get("tid")
            if ph == "M" and ev.get("name") in ("process_name", "thread_name"):
                label = ev.get("args", {}).get("name", "")
                names.setdefault(pid, {})
                if ev["name"] == "process_name":
                    names[pid]["__process__"] = label
                else:
                    names[pid][tid] = label
            elif ph == "X":
                events.append(ev)
    return events, names


def traced_seconds(fn, device_markers=("/device:", "TPU", "XLA Op",
                                       "Steps", "Framework Ops")):
    """Run `fn` under the profiler; return {"by_track": {...}, "device_s"}.

    Track keys are "process / thread" labels.  `device_s` sums tracks whose
    process label matches a device marker, excluding infeed/outfeed threads
    (those measure the host link, not the kernels)."""
    with tempfile.TemporaryDirectory() as td:
        import jax

        with jax.profiler.trace(td):
            fn()
        events, names = _load_trace_events(td)
    by_track: dict = {}
    for ev in events:
        pid, tid = ev.get("pid"), ev.get("tid")
        pl = names.get(pid, {}).get("__process__", str(pid))
        tl = names.get(pid, {}).get(tid, str(tid))
        key = f"{pl} / {tl}"
        by_track[key] = by_track.get(key, 0.0) + ev.get("dur", 0) / 1e6
    device_s = 0.0
    for key, secs in by_track.items():
        if any(m in key for m in device_markers) and \
                not any(x in key.lower() for x in ("infeed", "outfeed",
                                                   "transfer")):
            device_s += secs
    return {"by_track": by_track, "device_s": device_s}


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    if os.environ.get("GENOMICSBENCH_CPU"):
        # the machine's sitecustomize pins the axon TPU backend over
        # JAX_PLATFORMS; only jax.config wins
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    r = traced_seconds(lambda: jax.device_get(
        jnp.dot(jnp.ones((512, 512)), jnp.ones((512, 512))).sum()))
    for k, v in sorted(r["by_track"].items(), key=lambda kv: -kv[1])[:10]:
        print(f"{v*1e3:9.2f} ms  {k}")
    print("device_s:", r["device_s"])
