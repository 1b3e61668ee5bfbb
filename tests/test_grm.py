"""GRM kernel vs NumPy oracle + plink .bed IO."""

import numpy as np

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
