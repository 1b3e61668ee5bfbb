"""Generate golden parity fixtures by running the compiled reference kernels.

The reference C++ kernels for bsw (bandedSWA.cpp) and chain (host_kernel.cpp)
are fully contained in /root/reference and are compiled out-of-tree into
/tmp/refbuild (see tools/build_reference.sh).  This script synthesizes
randomized inputs covering the kernels' edge cases (band shrink, z-drop,
max_skip breaks, max_iter caps), runs the reference binaries on them, and
stores input+output fixture files under tests/golden/.

Fixtures are committed, so the test suite does not need the reference tree.
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from genomicsbench_tpu.oracle.chain import make_anchors  # noqa: E402

GOLD = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
REFBUILD = "/tmp/refbuild"


def mutate(rng, seq, sub=0.1, ind=0.05):
    out = []
    for b in seq:
        r = rng.random()
        if r < sub:
            out.append(rng.integers(0, 4))
        elif r < sub + ind / 2:
            continue  # deletion
        elif r < sub + ind:
            out.append(rng.integers(0, 4))
            out.append(b)
        else:
            out.append(b)
    if not out:
        out = [0]
    return np.array(out, dtype=np.uint8)


def gen_bsw_cases(rng, n=400):
    """(h0, target, query) triples spanning the interesting regimes."""
    cases = []
    for k in range(n):
        regime = k % 5
        qlen = int(rng.integers(1, 255))
        if regime == 0:  # related pair, typical extension
            q = rng.integers(0, 4, qlen).astype(np.uint8)
            t = mutate(rng, q, sub=0.05, ind=0.02)
            h0 = int(rng.integers(10, 60))
        elif regime == 1:  # unrelated (z-drop / all-zero rows)
            q = rng.integers(0, 4, qlen).astype(np.uint8)
            t = rng.integers(0, 4, int(rng.integers(1, 511))).astype(np.uint8)
            h0 = int(rng.integers(1, 30))
        elif regime == 2:  # tiny h0 (first-row all zero paths)
            q = rng.integers(0, 4, qlen).astype(np.uint8)
            t = mutate(rng, q, sub=0.3, ind=0.1)
            h0 = int(rng.integers(0, 8))
        elif regime == 3:  # long target, short query (band clamp active)
            qlen = int(rng.integers(1, 64))
            q = rng.integers(0, 4, qlen).astype(np.uint8)
            t = np.concatenate([mutate(rng, q), rng.integers(0, 4, 1500)]).astype(
                np.uint8
            )[:2047]
            h0 = int(rng.integers(5, 40))
        else:  # ambiguous bases present
            q = rng.integers(0, 5, qlen).astype(np.uint8)
            t = mutate(rng, q, sub=0.1, ind=0.05)
            t[rng.integers(0, len(t), max(1, len(t) // 20))] = 4
            h0 = int(rng.integers(1, 50))
        t = t[:2047]
        cases.append((h0, t, q))
    # deterministic degenerate cases
    cases.append((19, np.array([0, 1, 2, 3], dtype=np.uint8), np.array([0, 1, 2, 3], dtype=np.uint8)))
    cases.append((0, np.array([0], dtype=np.uint8), np.array([1], dtype=np.uint8)))
    cases.append((200, np.zeros(200, dtype=np.uint8), np.zeros(200, dtype=np.uint8)))
    return cases


def run_bsw(cases, name, extra_args=()):
    inp = os.path.join(GOLD, f"bsw_{name}.in")
    out = os.path.join(GOLD, f"bsw_{name}.gold")
    with open(inp, "w") as f:
        f.write(f"{len(cases)}\n")
        for h0, t, q in cases:
            f.write(f"{h0} {len(t)} {len(q)}\n")
            f.write("".join(map(str, t)) + "\n")
            f.write("".join(map(str, q)) + "\n")
    with open(out, "w") as f:
        subprocess.run(
            [os.path.join(REFBUILD, "bsw_gold"), inp, *map(str, extra_args)],
            stdout=f,
            check=True,
        )
    print(f"wrote {inp} / {out} ({len(cases)} cases)")


def gen_chain_calls(rng):
    calls = []

    def colinear(n, step_r, step_q, noise, span=15, start=100):
        rp = start + np.cumsum(rng.integers(1, step_r, n))
        qp = 50 + np.cumsum(rng.integers(1, step_q, n)) + rng.integers(
            -noise, noise + 1, n
        )
        qp = np.maximum.accumulate(np.maximum(qp, 0))
        return make_anchors(rp.astype(np.uint64), qp.astype(np.uint64), span)

    # typical long-read chains of varied size
    for n in (1, 2, 7, 50, 300, 2000):
        x, y = colinear(n, 40, 40, 8)
        calls.append((x, y, dict(avg_qspan=15.0, max_dist_x=5000, max_dist_y=5000, bw=500, n_segs=1)))
    # dense cluster -> many predecessors, max_skip heuristics fire
    x, y = colinear(1500, 4, 4, 2)
    calls.append((x, y, dict(avg_qspan=19.5, max_dist_x=5000, max_dist_y=5000, bw=500, n_segs=1)))
    # >max_iter anchors inside one window -> max_iter cap fires
    n = 6000
    rp = 100 + np.cumsum(rng.integers(0, 2, n)).astype(np.uint64)
    qp = np.sort(rng.integers(0, 4000, n)).astype(np.uint64)
    x, y = make_anchors(rp, qp, 13)
    calls.append((x, y, dict(avg_qspan=13.0, max_dist_x=100000, max_dist_y=100000, bw=2000, n_segs=1)))
    # random scatter (mostly invalid predecessors)
    n = 500
    rp = np.sort(rng.integers(0, 100000, n)).astype(np.uint64)
    qp = rng.integers(0, 50000, n).astype(np.uint64)
    x, y = make_anchors(rp, qp, rng.integers(10, 25, n))
    calls.append((x, y, dict(avg_qspan=17.0, max_dist_x=5000, max_dist_y=5000, bw=500, n_segs=1)))
    # multi-segment ids
    n = 400
    rp = np.sort(rng.integers(0, 20000, n)).astype(np.uint64)
    qp = rng.integers(0, 10000, n).astype(np.uint64)
    seg = rng.integers(0, 2, n)
    x, y = make_anchors(rp, qp, 15, seg_id=seg)
    calls.append((x, y, dict(avg_qspan=15.0, max_dist_x=5000, max_dist_y=5000, bw=500, n_segs=2)))
    # duplicate ref positions (dr == 0 filter)
    rp = np.repeat(np.arange(100, 600, 25), 4).astype(np.uint64)
    qp = rng.integers(0, 600, len(rp)).astype(np.uint64)
    x, y = make_anchors(rp, qp, 15)
    calls.append((x, y, dict(avg_qspan=15.0, max_dist_x=5000, max_dist_y=5000, bw=500, n_segs=1)))
    return calls


def run_chain(calls, name):
    inp = os.path.join(GOLD, f"chain_{name}.in")
    out = os.path.join(GOLD, f"chain_{name}.gold")
    with open(inp, "w") as f:
        for x, y, p in calls:
            f.write(
                f"{len(x)} {p['avg_qspan']} {p['max_dist_x']} {p['max_dist_y']} {p['bw']} {p['n_segs']}\n"
            )
            for xi, yi in zip(x, y):
                f.write(f"{int(xi)} {int(yi)}\n")
    with open(out, "w") as f:
        subprocess.run([os.path.join(REFBUILD, "chain_gold"), inp], stdout=f, check=True)
    print(f"wrote {inp} / {out} ({len(calls)} calls)")


def main():
    os.makedirs(GOLD, exist_ok=True)
    rng = np.random.default_rng(42)
    run_bsw(gen_bsw_cases(rng, 400), "default")
    # alternative scoring parameters: match/mis/ambig o/e zdrop w
    rng2 = np.random.default_rng(7)
    run_bsw(
        gen_bsw_cases(rng2, 120),
        "altparams",
        extra_args=(2, 3, -2, 4, 2, 50, 40),
    )
    run_chain(gen_chain_calls(np.random.default_rng(1234)), "default")


if __name__ == "__main__":
    main()
