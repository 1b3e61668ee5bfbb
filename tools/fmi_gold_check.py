"""Crosscheck fmi_gold (the in-repo C baseline) against FmiPipeline on a
small random reference: the two must emit IDENTICAL (rid, pass, m, n+1,
k, s) SMEM sets for all three passes.

Also dumps the gold's binary input formats — reused by scale_bench's fmi
row to time the gold on the identical reference-scale workload.

Usage: python tools/fmi_gold_check.py [gold_binary] [seed]
"""

import os
import struct
import subprocess
import sys

import numpy as np

sys.path.insert(0, ".")


def dump_index(idx, path):
    """fmi_gold index.bin: n_rows, sent_row, C[5], cleaned bwt bytes."""
    n_rows = idx.n + 1
    # reconstruct the cleaned BWT from the stored SA (the index object
    # doesn't keep it): bwt[i] = T[sa[i]-1], sentinel row -> 0
    # cheaper path: rebuild from planes
    p0 = np.unpackbits(idx.plane0.view(np.uint8).reshape(-1, 8),
                       axis=1, bitorder="little").reshape(-1)[:n_rows]
    p1 = np.unpackbits(idx.plane1.view(np.uint8).reshape(-1, 8),
                       axis=1, bitorder="little").reshape(-1)[:n_rows]
    bwt = (p0 | (p1 << 1)).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack("<qq", n_rows, idx.sentinel_row))
        f.write(np.asarray(idx.C, np.int64).tobytes())
        f.write(bwt.tobytes())


def dump_reads(query, min_seed_len, path):
    q = np.asarray(query, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack("<qqq", q.shape[0], q.shape[1], min_seed_len))
        f.write(q.tobytes())


def pipeline_tuples(pipe, query, qlen):
    p1, p2, p3 = pipe.run(query, qlen)[:3]
    out = set()
    for pi, p in ((1, p1), (2, p2), (3, p3)):
        for rid, m, n, k, s in zip(p.rid, p.m, p.n, p.k, p.s):
            out.add((int(rid), pi, int(m), int(n) + 1, int(k), int(s)))
    return out


def gold_tuples(gold, idx_path, reads_path):
    r = subprocess.run([gold, idx_path, reads_path], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    out = set()
    for line in r.stdout.splitlines():
        rid, pi, m, e, k, s = map(int, line.split())
        out.add((rid, pi, m, e, k, s))
    return out, r.stderr.strip()


def main():
    gold = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/fmi_gold"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from genomicsbench_tpu.ops.fmi import FmiPipeline, build_fmd_index

    rng = np.random.default_rng(seed)
    ref = rng.integers(0, 4, 200_000).astype(np.uint8)
    idx = build_fmd_index(ref)
    pipe = FmiPipeline(idx, min_seed_len=19)

    B, L = 64, 151
    starts = rng.integers(0, len(ref) - L, B)
    q = ref[starts[:, None] + np.arange(L)[None, :]].copy()
    mut = rng.random(q.shape) < 0.01
    q[mut] = rng.integers(0, 4, mut.sum())
    # sprinkle ambiguous bases on a few reads (N-handling paths)
    namb = rng.random(q.shape) < 0.002
    q[namb] = 4
    qlen = np.full(B, L, np.int32)

    ours = pipeline_tuples(pipe, q, qlen)
    dump_index(idx, "/tmp/fmi_check.idx")
    dump_reads(q, 19, "/tmp/fmi_check.reads")
    theirs, summary = gold_tuples(gold, "/tmp/fmi_check.idx",
                                  "/tmp/fmi_check.reads")
    print(f"pipeline: {len(ours)} smems   gold: {len(theirs)} smems")
    print(f"gold summary: {summary}")
    if ours == theirs:
        print("FMI GOLD CROSSCHECK PASSED")
        return 0
    only_ours = sorted(ours - theirs)[:10]
    only_gold = sorted(theirs - ours)[:10]
    print(f"MISMATCH: only-pipeline {len(ours - theirs)}, "
          f"only-gold {len(theirs - ours)}")
    for t in only_ours:
        print("  ours:", t)
    for t in only_gold:
        print("  gold:", t)
    return 1


if __name__ == "__main__":
    sys.exit(main())
