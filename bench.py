"""Headline benchmark: banded Smith-Waterman DP throughput on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference AVX2 kernel (benchmarks/bsw, getScores16 path,
canonical -t 1 -b 512 config, run-cpu.sh:30) measured on this machine's
Intel Xeon @2.10GHz at 1.40e9 DP cells/s on the same synthetic workload
(20k seed-extension pairs, qlen 64-192, tlen up to 400, 8% divergence).
If the compiled reference binary is present it is re-measured live.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CELLS_PER_S = 1.40e9  # measured: reference AVX2, 1 thread (see above)
REF_BIN = "/tmp/refbuild/bsw_ref"


def gen_workload(n_pairs=20000, seed=0):
    rng = np.random.default_rng(seed)
    qs, ts, h0s = [], [], []
    for _ in range(n_pairs):
        ql = int(rng.integers(64, 192))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        tl = int(rng.integers(ql, min(2 * ql, 400)))
        t = np.zeros(tl, dtype=np.uint8)
        m = min(ql, tl)
        t[:m] = q[:m]
        nmut = max(1, int(0.08 * m))
        idx = rng.integers(0, m, nmut)
        t[idx] = rng.integers(0, 4, nmut)
        if tl > m:
            t[m:] = rng.integers(0, 4, tl - m)
        qs.append(q)
        ts.append(t)
        h0s.append(int(rng.integers(15, 40)))
    return qs, ts, h0s


def as_pairbatch(qs, ts, h0s):
    from genomicsbench_tpu.io.pairs import PairBatch

    n = len(qs)
    qlen = np.array([len(q) for q in qs], dtype=np.int32)
    tlen = np.array([len(t) for t in ts], dtype=np.int32)
    query = np.zeros((n, int(qlen.max())), dtype=np.uint8)
    target = np.zeros((n, int(tlen.max())), dtype=np.uint8)
    for i, (q, t) in enumerate(zip(qs, ts)):
        query[i, : len(q)] = q
        target[i, : len(t)] = t
    return PairBatch(target=target, query=query, tlen=tlen, qlen=qlen,
                     h0=np.array(h0s, dtype=np.int32))


def measure_reference(qs, ts, h0s):
    """Re-measure the reference AVX2 binary if available."""
    if not os.path.exists(REF_BIN):
        return None
    from genomicsbench_tpu.io.pairs import write_pairs

    path = "/tmp/bench_pairs_live.txt"
    write_pairs(path, list(zip(qs, ts, h0s)))
    try:
        out = subprocess.run(
            [REF_BIN, "-pairs", path, "-t", "1", "-b", "512"],
            capture_output=True, text=True, timeout=600,
        ).stdout
        for line in out.splitlines():
            if line.startswith("Overall SW cycles"):
                secs = float(line.split(",")[1].strip().rstrip(" s"))
                cells = sum(len(q) * len(t) for q, t in zip(qs, ts))
                return cells / secs
    except Exception:
        return None
    return None


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def chip_reachable(timeout_s=240):
    """Probe the device backend in a subprocess: with the TPU tunnel down
    a first dispatch hangs indefinitely (no error), which would hang the
    whole bench.  A trivial dispatch either completes (possibly slowly —
    remote compile) or we report honestly instead of hanging."""
    try:
        pr = subprocess.run(
            [sys.executable, "-c",
             # import the package first: it applies the JAX_PLATFORMS
             # override the bench itself runs under, so the probe tests
             # the SAME backend (a bare jax import would probe the
             # site-pinned one)
             "import genomicsbench_tpu, jax, jax.numpy as jnp;"
             "jax.device_get(jnp.ones((8, 8)).sum()); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        return "ok" in pr.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def main():
    if not chip_reachable():
        print(json.dumps({
            "metric": "bsw_dp_cells_per_sec_per_chip",
            "value": 0.0,
            "unit": "Gcells/s",
            "vs_baseline": 0.0,
            "error": "device backend unreachable (TPU tunnel down); "
                     "no measurement taken — see BASELINE.md for the "
                     "last healthy-link numbers",
        }))
        return
    qs, ts, h0s = gen_workload(100_000)
    batch = as_pairbatch(qs, ts, h0s)
    cells = batch.cells()

    from genomicsbench_tpu.ops.bsw import BswScorer

    scorer = BswScorer(batch)   # upload to HBM (outside the timer, like the
    res = scorer.score()        # reference's in-RAM workload) + warm compile
    dt = min(_timed(scorer.score) for _ in range(3))
    res = scorer.score()

    # cross-check a sample against the oracle so the bench can't drift wrong
    from genomicsbench_tpu.config import BswParams
    from genomicsbench_tpu.oracle.bsw import banded_sw_oracle

    mat = BswParams().score_matrix()
    for k in range(0, batch.n, 4001):
        want = banded_sw_oracle(
            qs[k], ts[k], mat, h0=h0s[k]
        ).as_tuple()
        assert res.row(k) == want, f"parity failure at pair {k}"

    cells_per_s = cells / dt
    baseline = measure_reference(qs, ts, h0s) or BASELINE_CELLS_PER_S
    print(json.dumps({
        "metric": "bsw_dp_cells_per_sec_per_chip",
        "value": round(cells_per_s / 1e9, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(cells_per_s / baseline, 2),
    }))


if __name__ == "__main__":
    main()
