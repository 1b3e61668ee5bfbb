"""ABEA alignment + event detection vs compiled-reference golden outputs."""

import pathlib

import numpy as np
import pytest

from genomicsbench_tpu.ops.abea import align_batch, detect_events, kmer_ranks

GOLD = pathlib.Path(__file__).parent / "golden"
ALPHA = {c: i for i, c in enumerate("ACGT")}


def load_align_fixture():
    toks = (GOLD / "abea_align.in").read_text().split()
    assert toks[0] == "align"
    n = int(toks[1])
    pos = 2
    mean = np.array(toks[pos : pos + 8192 : 2], np.float32)
    stdv = np.array(toks[pos + 1 : pos + 8192 : 2], np.float32)
    pos += 8192
    cases = []
    for _ in range(n):
        slen = int(toks[pos]); pos += 1
        seq = np.array([ALPHA[c] for c in toks[pos]], np.uint8); pos += 1
        ne = int(toks[pos]); pos += 1
        evs = np.array(toks[pos : pos + 2 * ne : 2], np.float32)
        pos += 2 * ne
        scale, shift = float(toks[pos]), float(toks[pos + 1]); pos += 2
        cases.append((seq, evs, scale, shift))
    # expected
    toks = (GOLD / "abea_align.gold").read_text().split()
    pos = 0
    expected = []
    for _ in range(n):
        m = int(toks[pos]); pos += 1
        arr = np.array(toks[pos : pos + 2 * m], np.int64).reshape(m, 2)
        pos += 2 * m
        expected.append(arr)
    return mean, stdv, cases, expected


class TestAbeaAlign:
    def test_golden(self):
        mean, stdv, cases, expected = load_align_fixture()
        seqs = [c[0] for c in cases]
        evs = [c[1] for c in cases]
        scalings = np.array([[c[2], c[3]] for c in cases], np.float32)
        res = align_batch(seqs, evs, mean, stdv, scalings)
        n_mismatch = 0
        for b, exp in enumerate(expected):
            got = res.pairs[b]
            if got.shape[0] != exp.shape[0] or (
                got.shape[0] and not np.array_equal(got[:, [0, 1]], exp)
            ):
                n_mismatch += 1
        assert n_mismatch == 0, f"{n_mismatch}/{len(expected)} reads mismatch"

    def test_qc_failure_path(self):
        mean, stdv, cases, expected = load_align_fixture()
        fails = [len(e) == 0 for e in expected]
        assert any(fails), "fixture should include QC-failing reads"


class TestEventDetection:
    def test_golden(self):
        toks = (GOLD / "abea_events.in").read_text().split()
        assert toks[0] == "events"
        n = int(toks[1])
        pos = 2
        sigs = []
        for _ in range(n):
            ns = int(toks[pos]); pos += 1
            sigs.append(np.array(toks[pos : pos + ns], np.float32))
            pos += ns
        gold = (GOLD / "abea_events.gold").read_text().split()
        pos = 0
        for i, sig in enumerate(sigs):
            ne = int(gold[pos]); pos += 1
            rows = np.array(gold[pos : pos + 4 * ne]).reshape(ne, 4)
            pos += 4 * ne
            starts, lengths, means, stdvs = detect_events(sig)
            assert len(starts) == ne, f"case {i}: {len(starts)} != {ne}"
            np.testing.assert_array_equal(starts, rows[:, 0].astype(np.int64))
            np.testing.assert_array_equal(
                lengths.astype(np.int64), rows[:, 1].astype(np.int64)
            )
            np.testing.assert_allclose(
                means, rows[:, 2].astype(np.float32), atol=2e-4, err_msg=f"case {i}"
            )
            np.testing.assert_allclose(
                stdvs, rows[:, 3].astype(np.float32), atol=2e-4, err_msg=f"case {i}"
            )
