"""Load/process/output overlap (batching/pipeline.py) — the f5c interleaved
pipeline analog (meth_main.c:478-615, --iop f5c.c:101-244)."""

import threading
import time

import pytest

from genomicsbench_tpu.batching.pipeline import pipeline_map


def test_results_in_order_with_parallel_loaders():
    def make_loader(i):
        def load():
            time.sleep(0.01 * ((i * 7) % 3))  # jitter completion order
            return i
        return load

    loads = [make_loader(i) for i in range(12)]
    out = []
    res = pipeline_map(loads, lambda b: b * 10, out.append,
                       prefetch=3, n_loaders=3)
    assert res == [i * 10 for i in range(12)]
    assert out == res  # writer saw everything


def test_overlap_actually_happens():
    timeline = []
    lock = threading.Lock()

    def load(i):
        def f():
            with lock:
                timeline.append(("load", i, time.perf_counter()))
            time.sleep(0.02)
            return i
        return f

    def proc(b):
        with lock:
            timeline.append(("proc", b, time.perf_counter()))
        time.sleep(0.02)
        return b

    t0 = time.perf_counter()
    pipeline_map([load(i) for i in range(6)], proc, prefetch=2, n_loaders=2)
    elapsed = time.perf_counter() - t0
    # serial would be 6*(0.02+0.02)=0.24s; overlapped must be well under
    assert elapsed < 0.20, f"no overlap: {elapsed:.3f}s"


def test_loader_exception_propagates():
    def bad():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        pipeline_map([lambda: 1, bad, lambda: 3], lambda b: b)


def test_plain_iterable_inputs():
    assert pipeline_map([1, 2, 3], lambda b: b + 1) == [2, 3, 4]
