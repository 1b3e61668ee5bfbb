"""Byte-level .pgen fixtures built INDEPENDENTLY of io/plink.py.

VERDICT r2 (missing #3): the .pgen codecs had only self-round-trip tests
(write_pgen -> read_pgen), which a shared misreading of the spec would
pass.  Here every record is assembled by hand from the PGEN spec text
(header layout, difflist grammar, the five main-track encodings), with
no call into io/plink.py's writer; read_pgen must decode the matrix the
fixture encodes.  Also pins the plink --make-grm-bin output byte layout
(lower-triangle row-major little-endian f32) against hand-packed bytes.

Reference anchor: scripts/run-cpu.sh:53,84 (plink2 --maf 0.01
--make-grm-bin over chrN_phase3.pgen).
"""

import struct

import numpy as np
import pytest

from genomicsbench_tpu.io.plink import read_pgen, write_pgen


def _pack2bit(vals):
    """Spec: 2-bit codes, LSB-first within each byte."""
    out = bytearray()
    for i in range(0, len(vals), 4):
        b = 0
        for k, v in enumerate(vals[i : i + 4]):
            b |= (int(v) & 3) << (2 * k)
        out.append(b)
    return bytes(out)


def _vint(v):
    """LEB128 (7 data bits per byte, high bit = continuation)."""
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _difflist(entries, sibc=1):
    """entries: list of (sample_id, value), sorted by id.  Grammar:
    vint count | raw sample id (sibc bytes) opening each 64-entry group |
    vint deltas for the rest of the group | packed 2-bit values."""
    out = bytearray(_vint(len(entries)))
    if not entries:
        return bytes(out)
    ids = [e[0] for e in entries]
    for g in range(0, len(entries), 64):  # all group-start ids first
        out += ids[g].to_bytes(sibc, "little")
    for g in range(0, len(entries), 64):  # then the within-group deltas
        for k in range(g + 1, min(g + 64, len(entries))):
            out += _vint(ids[k] - ids[k - 1])
    out += _pack2bit([e[1] for e in entries])
    return bytes(out)


def _selector_bits(bits):
    """1-bit track: one bit per sample, LSB-first within each byte."""
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for k, v in enumerate(bits[i : i + 8]):
            b |= (int(v) & 1) << k
        out.append(b)
    return bytes(out)


def test_pgen_mode02_fixture(tmp_path):
    """Fixed-width mode 0x02: header + dense 2-bit rows, pad bits = 3."""
    N, M = 6, 3
    geno = np.array(
        [[0, 1, 2, 3, 0, 2],
         [2, 2, 2, 2, 2, 2],
         [1, 0, 3, 0, 1, 2]], np.uint8)
    body = b""
    for row in geno:
        padded = list(row) + [3] * (-len(row) % 4)
        body += _pack2bit(padded)
    pgen = bytes([0x6C, 0x1B, 0x02]) + struct.pack("<II", M, N) + body
    pre = tmp_path / "fix02"
    (tmp_path / "fix02.pgen").write_bytes(pgen)
    (tmp_path / "fix02.psam").write_text(
        "#IID\tSEX\n" + "".join(f"S{i}\tNA\n" for i in range(N)))
    (tmp_path / "fix02.pvar").write_text(
        "#CHROM\tPOS\tID\tREF\tALT\n"
        + "".join(f"1\t{j+1}\tv{j}\tA\tC\n" for j in range(M)))
    got, ids = read_pgen(str(pre))
    np.testing.assert_array_equal(got, geno)
    assert ids == [f"S{i}" for i in range(N)]


def test_pgen_mode10_fixture(tmp_path):
    """Variable-width mode 0x10 covering all five main-track encodings,
    every byte assembled by hand."""
    N = 10
    # expected genotype matrix (what the bytes below encode)
    v0 = np.array([0, 1, 2, 3, 0, 0, 1, 2, 3, 0], np.uint8)   # dense
    v1 = np.zeros(N, np.uint8); v1[3] = 2; v1[7] = 1          # difflist base 0
    v2 = v1.copy(); v2[2] = 1                                  # LD vs v1
    inv = np.array([2, 1, 0, 3], np.uint8)
    v3 = inv[v1].copy(); v3[9] = 3                             # LD-inverted vs v1
    v4 = np.array([0, 2, 0, 0, 2, 3, 0, 2, 0, 0], np.uint8)   # 1-bit lo=0 hi=2
    v5 = np.array([3, 3, 3, 3, 3, 3, 3, 3, 3, 1], np.uint8)   # difflist base 3
    geno = np.stack([v0, v1, v2, v3, v4, v5])

    recs = []
    # v0: enc 0 — dense 2-bit, ceil(10/4) = 3 bytes
    recs.append((0, _pack2bit(list(v0))))
    # v1: enc 4+0 — difflist over constant base 0
    recs.append((4, _difflist([(3, 2), (7, 1)])))
    # v2: enc 2 — LD difflist vs the last non-LD variant (v1)
    recs.append((2, _difflist([(2, 1)])))
    # v3: enc 3 — LD vs complement(v1): complement leaves sample 9 = 2,
    # fixture wants 3 there
    recs.append((3, _difflist([(9, 3)])))
    # v4: enc 1 — 1-bit: common2 byte lo=0 hi=2 (0 | 2<<2 = 8), selector
    # bits mark the hi/exception samples, exceptions in a difflist
    sel = [0, 1, 0, 0, 1, 1, 0, 1, 0, 0]  # 1 where != lo (incl. sample 5)
    recs.append((1, bytes([0 | (2 << 2)]) + _selector_bits(sel)
                 + _difflist([(5, 3)])))
    # v5: enc 4+3 — difflist over constant base 3 (missing)
    recs.append((7, _difflist([(9, 1)])))

    M = len(recs)
    vrtypes = [t for t, _ in recs]
    # header: magic | mode | u32 M | u32 N | control byte
    # control 0x00: 4-bit vrtype nibbles, 1-byte record lengths, no allele
    # counts, no nonref flags
    hdr = bytes([0x6C, 0x1B, 0x10]) + struct.pack("<II", M, N) + bytes([0x00])
    # vrtype nibbles (low nibble first), then 1-byte record lengths
    nib = bytearray()
    for i in range(0, M - 1, 2):
        nib.append(vrtypes[i] | (vrtypes[i + 1] << 4))
    if M % 2:
        nib.append(vrtypes[M - 1])
    lens = bytes(len(r) for _, r in recs)
    # one u64 block offset = first record's file position
    body_start = len(hdr) + 8 + len(nib) + len(lens)
    pgen = (hdr + body_start.to_bytes(8, "little") + bytes(nib) + lens
            + b"".join(r for _, r in recs))

    pre = tmp_path / "fix10"
    (tmp_path / "fix10.pgen").write_bytes(pgen)
    (tmp_path / "fix10.psam").write_text(
        "#IID\tSEX\n" + "".join(f"S{i}\tNA\n" for i in range(N)))
    (tmp_path / "fix10.pvar").write_text(
        "#CHROM\tPOS\tID\tREF\tALT\n"
        + "".join(f"1\t{j+1}\tv{j}\tA\tC\n" for j in range(M)))
    got, _ = read_pgen(str(pre))
    np.testing.assert_array_equal(got, geno)


def test_pgen_mode10_multigroup_difflist(tmp_path):
    """A difflist spanning two 64-entry groups (second raw sample id) and a
    2-byte sample-id width (N = 300 > 255)."""
    N = 300
    sibc = 2  # 300 needs 9 bits -> 2 bytes
    base = np.zeros(N, np.uint8)
    ids = list(range(2, 2 + 70 * 4, 4))  # 70 exceptions, deltas of 4
    vals = [(i % 3) for i in range(70)]  # 0,1,2 pattern — base is 0 so some
    vals = [v if v else 2 for v in vals]  # make every entry differ from base
    row = base.copy()
    for i, v in zip(ids, vals):
        row[i] = v
    # hand-build per the spec: vint(70) | ALL group-start raw ids first
    # (id[0], id[64] — stored consecutively so the reader can bsearch
    # groups) | then the within-group deltas | packed values
    rec = bytearray(_vint(70))
    rec += ids[0].to_bytes(2, "little")
    rec += ids[64].to_bytes(2, "little")
    for k in range(1, 64):
        rec += _vint(ids[k] - ids[k - 1])
    for k in range(65, 70):
        rec += _vint(ids[k] - ids[k - 1])
    rec += _pack2bit(vals)
    rec = bytes(rec)

    hdr = bytes([0x6C, 0x1B, 0x10]) + struct.pack("<II", 1, N) + bytes([0x00])
    body_start = len(hdr) + 8 + 1 + 1  # one nibble byte + one length byte
    pgen = (hdr + body_start.to_bytes(8, "little")
            + bytes([4]) + bytes([len(rec)]) + rec)
    pre = tmp_path / "fixdl"
    (tmp_path / "fixdl.pgen").write_bytes(pgen)
    (tmp_path / "fixdl.psam").write_text(
        "#IID\tSEX\n" + "".join(f"S{i}\tNA\n" for i in range(N)))
    (tmp_path / "fixdl.pvar").write_text(
        "#CHROM\tPOS\tID\tREF\tALT\n1\t1\tv0\tA\tC\n")
    got, _ = read_pgen(str(pre))
    np.testing.assert_array_equal(got[0], row)


def test_write_pgen_decodes_against_fixture_reader(tmp_path):
    """The writer must emit files the SPEC-pinned reader path decodes; and
    a fuzz matrix must round-trip through mode 0x10 (record-type selection
    exercises dense/difflist/LD/1-bit)."""
    rng = np.random.default_rng(5)
    # skewed distribution so difflist/LD/1-bit all win somewhere
    M, N = 200, 37
    geno = np.zeros((M, N), np.uint8)
    for v in range(M):
        kind = v % 4
        if kind == 0:
            geno[v] = rng.integers(0, 4, N)
        elif kind == 1:
            geno[v, rng.integers(0, N, 3)] = rng.integers(1, 4, 3)
        elif kind == 2:
            geno[v] = geno[v - 1]
            geno[v, rng.integers(0, N)] = 2
        else:
            geno[v] = np.where(rng.random(N) < 0.5, 0, 2)
            geno[v, rng.integers(0, N)] = 3
    for mode in (0x02, 0x10, 0x11):
        pre = tmp_path / f"rt{mode:02x}"
        write_pgen(str(pre), geno, mode=mode)
        got, _ = read_pgen(str(pre))
        np.testing.assert_array_equal(got, geno)


def test_grm_bin_byte_golden(tmp_path):
    """plink --make-grm-bin byte layout: .grm.bin is the lower triangle in
    row-major order ((0,0),(1,0),(1,1),(2,0),...), little-endian float32;
    .grm.N.bin the pair observation counts in the same order.  Values here
    are computed by hand from the GCTA formula for a 4x3 matrix with one
    missing entry, independent of ops/grm.py."""
    from genomicsbench_tpu.ops.grm import grm, grm_oracle, write_grm_bin

    geno = np.array(
        [[0, 1, 2],
         [2, 1, 0],
         [1, 1, 3],   # sample 2 missing at v2
         [0, 2, 1]], np.uint8)
    # hand computation (float64), maf=0.01:
    # v0: p = 3/6 = .5   std = sqrt(2*.5*.5) = sqrt(.5)
    # v1: p = .5, v2 (obs 2 samples): p = 2/4 = .5, v3: p = .5
    import math
    s = math.sqrt(0.5)
    x = np.array(
        [[-1 / s, 0.0, 1 / s],
         [1 / s, 0.0, -1 / s],
         [0.0, 0.0, 0.0],     # centered: (1-1)=0 for both observed
         [-1 / s, 1 / s, 0.0]], np.float64)
    obs = np.array(
        [[1, 1, 1], [1, 1, 1], [1, 1, 0], [1, 1, 1]], np.float64)
    num = x.T @ x
    den = obs.T @ obs
    expect = num / den
    g_dev, nobs = grm(geno, maf=0.01)
    np.testing.assert_allclose(g_dev, expect, atol=1e-6)
    np.testing.assert_array_equal(nobs, den)
    g_orc, d_orc = grm_oracle(geno, maf=0.01)
    np.testing.assert_allclose(g_orc, expect, rtol=1e-12)

    # byte golden for the writer
    pre = str(tmp_path / "g")
    write_grm_bin(pre, g_dev, nobs, ["A", "B", "C"])
    order = [(0, 0), (1, 0), (1, 1), (2, 0), (2, 1), (2, 2)]
    want_bin = b"".join(struct.pack("<f", float(g_dev[i, j])) for i, j in order)
    want_n = b"".join(struct.pack("<f", float(den[i, j])) for i, j in order)
    assert open(pre + ".grm.bin", "rb").read() == want_bin
    assert open(pre + ".grm.N.bin", "rb").read() == want_n
    assert open(pre + ".grm.id").read() == "A\tA\nB\tB\nC\tC\n"


def test_grm_maf_filter_excludes_rare_variant():
    """A variant with observed ALT frequency below --maf 0.01 must not
    contribute (run-cpu.sh:53 pins --maf 0.01)."""
    from genomicsbench_tpu.ops.grm import grm_oracle

    rng = np.random.default_rng(3)
    geno = rng.integers(0, 3, (50, 64)).astype(np.uint8)
    rare = np.zeros(64, np.uint8)
    rare[0] = 1  # p = 1/128 < 0.01
    with_rare = np.vstack([geno, rare[None]])
    g1, d1 = grm_oracle(geno, maf=0.01)
    g2, d2 = grm_oracle(with_rare, maf=0.01)
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_array_equal(d1, d2)
