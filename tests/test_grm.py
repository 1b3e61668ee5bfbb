"""GRM kernel vs NumPy oracle + plink .bed IO."""

import numpy as np
import pytest

from genomicsbench_tpu.io.plink import read_bed, write_bed
from genomicsbench_tpu.ops.grm import grm, grm_oracle, write_grm_bin


def _rand_geno(rng, M, N, miss_rate=0.05):
    p = rng.uniform(0.005, 0.5, M)
    g = (rng.random((M, N)) < p[:, None]).astype(np.uint8) + (
        rng.random((M, N)) < p[:, None]
    ).astype(np.uint8)
    g[rng.random((M, N)) < miss_rate] = 3
    return g


class TestGrm:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        g = _rand_geno(rng, 500, 96)
        got, nobs = grm(g, maf=0.01, block=128)
        want, wantn = grm_oracle(g, maf=0.01)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(nobs, wantn)

    def test_maf_filter(self):
        rng = np.random.default_rng(1)
        g = _rand_geno(rng, 300, 64)
        got_strict, _ = grm(g, maf=0.2)
        want_strict, _ = grm_oracle(g, maf=0.2)
        np.testing.assert_allclose(got_strict, want_strict, rtol=2e-5, atol=2e-5)

    def test_bed_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        g = _rand_geno(rng, 40, 13)
        write_bed(str(tmp_path / "t"), g)
        g2, ids = read_bed(str(tmp_path / "t"))
        np.testing.assert_array_equal(g, g2)
        assert len(ids) == 13

    def test_grm_bin_output(self, tmp_path):
        rng = np.random.default_rng(3)
        g = _rand_geno(rng, 200, 16)
        mat, nobs = grm(g)
        write_grm_bin(str(tmp_path / "out"), mat, nobs, [f"S{i}" for i in range(16)])
        tri = np.fromfile(tmp_path / "out.grm.bin", dtype="<f4")
        assert len(tri) == 16 * 17 // 2
        assert np.isclose(tri[0], mat[0, 0])
        assert np.isclose(tri[2], mat[1, 1])


class TestPgenIo:
    """plink2 .pgen/.pvar/.psam (io/plink.py) — the canonical grm input
    format (run-cpu.sh:53,84)."""

    def test_pgen_roundtrip_mode2(self, tmp_path):
        from genomicsbench_tpu.io.plink import read_pgen, write_pgen

        rng = np.random.default_rng(0)
        geno = rng.integers(0, 4, size=(20, 13)).astype(np.uint8)
        write_pgen(str(tmp_path / "x"), geno, ids=[f"id{i}" for i in range(13)])
        back, ids = read_pgen(str(tmp_path / "x"))
        np.testing.assert_array_equal(back, geno)
        assert ids == [f"id{i}" for i in range(13)]

    def test_pgen_mode1_matches_bed(self, tmp_path):
        from genomicsbench_tpu.io.plink import read_bed, read_pgen, write_bed, write_pgen

        rng = np.random.default_rng(1)
        geno = rng.integers(0, 4, size=(8, 9)).astype(np.uint8)
        write_bed(str(tmp_path / "b"), geno)
        write_pgen(str(tmp_path / "p"), geno, mode=0x01)
        bed, _ = read_bed(str(tmp_path / "b"))
        pg, _ = read_pgen(str(tmp_path / "p"))
        np.testing.assert_array_equal(bed, geno)
        np.testing.assert_array_equal(pg, geno)

    def test_unsupported_mode_raises(self, tmp_path):
        from genomicsbench_tpu.io.plink import read_pgen, write_pgen

        write_pgen(str(tmp_path / "x"), np.zeros((2, 3), np.uint8))
        raw = bytearray((tmp_path / "x.pgen").read_bytes())
        raw[2] = 0x03  # fixed-width dosage: genuinely unsupported
        (tmp_path / "x.pgen").write_bytes(bytes(raw))
        with pytest.raises(NotImplementedError):
            read_pgen(str(tmp_path / "x"))

    @pytest.mark.parametrize("mode", [0x10, 0x11])
    def test_pgen_standard_roundtrip(self, tmp_path, mode):
        """Variable-width modes (the canonical phase3 .pgen storage,
        run-cpu.sh:53): every encoding class must round-trip."""
        from genomicsbench_tpu.io.plink import read_pgen, write_pgen

        rng = np.random.default_rng(7)
        rows = []
        # dense random -> vrtype 0
        rows += list(rng.integers(0, 4, size=(5, 700)).astype(np.uint8))
        # sparse over each constant base -> vrtypes 4..7
        for base in range(4):
            r = np.full(700, base, np.uint8)
            idx = rng.choice(700, 9, replace=False)
            r[idx] = (base + 1 + rng.integers(0, 3, 9)) % 4
            rows.append(r)
        # LD-correlated pair -> vrtype 2 (copy + small difflist)
        dense = rng.integers(0, 4, 700).astype(np.uint8)
        rows.append(dense)
        ld = dense.copy()
        ld[rng.choice(700, 5, replace=False)] = rng.integers(0, 4, 5)
        rows.append(ld)
        # inverted-LD pair -> vrtype 3
        inv = np.array([2, 1, 0, 3], np.uint8)[dense]
        inv[rng.choice(700, 4, replace=False)] = rng.integers(0, 4, 4)
        rows.append(dense.copy())
        rows.append(inv)
        # two-common-values + exceptions -> vrtype 1 (1-bit)
        ob = rng.choice([0, 2], 700).astype(np.uint8)
        ob[rng.choice(700, 60, replace=False)] = rng.integers(0, 4, 60)
        rows.append(ob)
        geno = np.stack(rows)
        write_pgen(str(tmp_path / "s"), geno, mode=mode)
        # writer actually exercised the compressed encodings
        raw = (tmp_path / "s.pgen").read_bytes()
        assert raw[2] == mode
        assert len(raw) < 3 + geno.shape[0] * (-(-geno.shape[1] // 4))
        back, _ = read_pgen(str(tmp_path / "s"))
        np.testing.assert_array_equal(back, geno)

    def test_pgen_standard_multiblock(self, tmp_path):
        """>65536 variants: per-block vrtype/length arrays + u64 block
        offsets; LD bases must not leak across block boundaries."""
        from genomicsbench_tpu.io.plink import read_pgen, write_pgen

        rng = np.random.default_rng(8)
        M, N = 65536 + 37, 16
        base = rng.integers(0, 4, N).astype(np.uint8)
        geno = np.tile(base, (M, 1))
        flip = rng.integers(0, N, M)
        geno[np.arange(M), flip] = rng.integers(0, 4, M)
        write_pgen(str(tmp_path / "mb"), geno, mode=0x10)
        back, _ = read_pgen(str(tmp_path / "mb"))
        np.testing.assert_array_equal(back, geno)

    def test_grm_from_standard_pgen(self, tmp_path):
        """Compressed .pgen feeds the GRM kernel identically to fixed-width."""
        from genomicsbench_tpu.io.plink import read_pgen, write_pgen
        from genomicsbench_tpu.ops.grm import grm

        rng = np.random.default_rng(9)
        geno = rng.integers(0, 3, size=(120, 24)).astype(np.uint8)
        geno[rng.random(geno.shape) < 0.7] = 0  # sparse: compressed records
        write_pgen(str(tmp_path / "fx"), geno, mode=0x02)
        write_pgen(str(tmp_path / "cp"), geno, mode=0x11)
        fx, _ = read_pgen(str(tmp_path / "fx"))
        cp, _ = read_pgen(str(tmp_path / "cp"))
        np.testing.assert_array_equal(fx, cp)
        g1, _ = grm(fx)
        g2, _ = grm(cp)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    def test_grm_from_pgen(self, tmp_path):
        from genomicsbench_tpu.io.plink import write_pgen, read_pgen
        from genomicsbench_tpu.ops.grm import grm, grm_oracle

        rng = np.random.default_rng(2)
        geno = rng.integers(0, 3, size=(60, 16)).astype(np.uint8)
        write_pgen(str(tmp_path / "g"), geno)
        loaded, _ = read_pgen(str(tmp_path / "g"))
        got, _ = grm(loaded)
        want, _ = grm_oracle(loaded)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
