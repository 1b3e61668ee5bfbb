"""Typed parameter groups for every kernel.

Defaults mirror the reference benchmark CLIs exactly, because the parameter
values are part of the output-parity contract (reference citations per field).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BswParams:
    """Banded Smith-Waterman seed extension.

    Reference: benchmarks/bsw/main_banded.cpp:49-53 (match/mismatch/open/
    extend/ambig defaults) and :250 (zdrop=100, w=100, end_bonus=5).
    """

    match: int = 1
    mismatch: int = 4          # penalty, stored positive
    ambig: int = -1            # score for any comparison involving base 4
    o_del: int = 6
    e_del: int = 1
    o_ins: int = 6
    e_ins: int = 1
    zdrop: int = 100
    w: int = 100               # band half-width
    end_bonus: int = 5

    def score_matrix(self):
        """5x5 substitution matrix, bwa_fill_scmat layout (main_banded.cpp:73-81)."""
        import numpy as np

        mat = np.full((5, 5), self.ambig, dtype=np.int32)
        for i in range(4):
            for j in range(4):
                mat[i, j] = self.match if i == j else -self.mismatch
        return mat


@dataclasses.dataclass(frozen=True)
class ChainParams:
    """minimap2 anchor chaining DP.

    Reference: benchmarks/chain/src/host_kernel.cpp:36-38 (gap_scale=1,
    max_iter=5000, max_skip=25); per-call fields (max_dist_x/y, bw, avg_qspan,
    n_segs) travel with the input records (host_data.h:24-30).
    """

    max_iter: int = 5000
    max_skip: int = 25
    gap_scale: float = 1.0
    is_cdna: bool = False


@dataclasses.dataclass(frozen=True)
class PairHmmParams:
    """GATK/GKL pair-HMM forward.

    Reference: benchmarks/phmm/pairhmm_common.h:16-18 (MIN_ACCEPTED=1e-28,
    5-letter alphabet, ambiguity char 4); quality normalization min 6 for the
    base-quality string only (PairHMMUnitTest.cpp:89-93,110-113).
    """

    min_accepted: float = 1e-28
    min_base_qual: int = 6
    # Scaling constants of the GKL/GATK "logless" formulation: the float pass
    # scales the initial deletion row by 2**120, the double pass by 2**1020.
    float_initial_exponent: int = 120
    double_initial_exponent: int = 1020


@dataclasses.dataclass(frozen=True)
class DbgParams:
    """Platypus de Bruijn graph construction.

    Reference: benchmarks/dbg/debruijn.cpp:1393-1403 (kmerSize=15 via
    assembleReadsAndDetectVariants args, minQual=20) and :1539-1555
    (1500bp windows, shift max(100, min(1000, 750)) = 750).
    """

    kmer_size: int = 15
    min_qual: int = 20
    window_size: int = 1500
    window_shift: int = 750


@dataclasses.dataclass(frozen=True)
class KmerParams:
    """Flye k-mer counting / minimizer index.

    Reference: benchmarks/kmer-cnt/config.h + Flye asm_raw_reads.cfg keys;
    hard counter saturation at 15 (4-bit) with overflow table
    (vertex_index.cpp:524-570).
    """

    kmer_size: int = 15
    use_minimizers: bool = True
    minimizer_window: int = 5
    sample_rate: int = 1
    hard_counter_max: int = 15


@dataclasses.dataclass(frozen=True)
class FmiParams:
    """FM-index SMEM seeding (bwa-mem2 kernel).

    Reference: benchmarks/fmi/fmi.cpp:56 CLI; canonical batch=512,
    min_seed_len=19 (run-cpu.sh:27); split_len = min_seed_len*1.5,
    split_width=10, max_mem_intv=20 (fmi.cpp:140,178,256-266 mirroring
    bwa-mem defaults).
    """

    min_seed_len: int = 19
    split_factor: float = 1.5
    split_width: int = 10
    max_mem_intv: int = 20
    batch_size: int = 512


@dataclasses.dataclass(frozen=True)
class PileupParams:
    """medaka pileup counts.

    Reference: benchmarks/pileup/medaka_counts.c:503 (num_homop=5 in main),
    medaka_counts.h:63-77 (featlen=10 over "acgtACGTdD"), 100kb region chunks
    (medaka_counts.c:526-538), mapQ >= 1 filter (medaka_bamiter.c).
    """

    num_dtypes: int = 1
    num_homop: int = 1
    min_mapq: int = 1
    chunk_size: int = 100_000


@dataclasses.dataclass(frozen=True)
class AbeaParams:
    """f5c adaptive banded event alignment.

    Reference: benchmarks/abea/src/f5c.h:28 (ALN_BANDWIDTH=100); events.c:37-52
    (t-test windows/thresholds); align.c:187-189 QC thresholds.
    """

    bandwidth: int = 100
    min_average_log_emission: float = -5.0
    max_gap_threshold: int = 50
    # event detection (events.c:37-52, r9.4 defaults)
    window_length1: int = 3
    window_length2: int = 6
    threshold1: float = 1.4
    threshold2: float = 9.0
    peak_height: float = 0.2


@dataclasses.dataclass(frozen=True)
class PoaParams:
    """spoa partial-order alignment.

    Reference: benchmarks/poa/msa_spoa_omp.cpp:157-162 defaults
    (m=2, x=-4, o1=-4, e1=-2, o2=-24, e2=-1), algorithm 1 = global NW.
    """

    match: int = 2
    mismatch: int = -4
    gap_open1: int = -4
    gap_ext1: int = -2
    gap_open2: int = -24
    gap_ext2: int = -1


@dataclasses.dataclass(frozen=True)
class GrmParams:
    """plink2 --make-grm-bin equivalent (run-cpu.sh:53,84)."""

    maf: float = 0.01
    block_size: int = 4096


def load_keyvalue_config(path) -> dict:
    """Flye-style key=value config with %include directives
    (kmer-cnt config.h:35-72).  Values are parsed as int/float/bool when
    possible; later keys override earlier ones; %include paths are
    resolved relative to the including file."""
    import pathlib

    path = pathlib.Path(path)
    out: dict = {}
    for raw in path.read_text().splitlines():
        line = raw.split(";")[0].split("#")[0].strip()
        if not line:
            continue
        if line.startswith("%include"):
            inc = line.split(None, 1)[1].strip().strip('"')
            out.update(load_keyvalue_config(path.parent / inc))
            continue
        if "=" not in line:
            continue
        key, val = (t.strip() for t in line.split("=", 1))
        for cast in (int, float):
            try:
                val = cast(val)
                break
            except (TypeError, ValueError):
                continue
        if val in ("true", "True"):
            val = True
        elif val in ("false", "False"):
            val = False
        out[key] = val
    return out


@dataclasses.dataclass(frozen=True)
class AbeaRunProfile:
    """f5c --profile equivalent (set_profile/set_opt_profile,
    f5c.c:1795-1844): runtime batching knobs for the eventalign pipeline.
    The CUDA heuristics map to their TPU analogs: max_readlen becomes the
    per-batch padded-length discipline, the events-per-kmer caps feed the
    same QC thresholds, ultra_thresh segregates ultra-long reads into
    their own batches (the analog of f5c's CPU fallback, f5c.cu:1026-1059,
    so one long read doesn't inflate every lane's padding)."""

    batch_size: int = 512           # reads per device batch
    batch_size_bases: int = 5_000_000
    num_workers: int = 4            # loader pool (the --iop analog)
    ultra_thresh: int = 100_000     # bases; longer reads batch separately
    max_readlen: float = 5.0        # f5c cuda_max_readlen (x average)
    avg_epk: float = 2.0            # cuda_avg_events_per_kmer
    max_epk: float = 5.0            # cuda_max_avg_events_per_kmer


ABEA_PROFILES = {
    # presets in the spirit of f5c's jetson-* machine table (f5c.c:1797-1803)
    "v5e": AbeaRunProfile(),
    "v5e-lite": AbeaRunProfile(batch_size=128, batch_size_bases=1_000_000,
                               num_workers=2),
    "cpu-test": AbeaRunProfile(batch_size=16, batch_size_bases=100_000,
                               num_workers=1, ultra_thresh=10_000),
}


def load_abea_profile(name_or_path: str) -> AbeaRunProfile:
    """Preset name, else a file in f5c's 7-field profile format
    (f5c.c:1810-1815: max_readlen avg_epk max_epk batch_size
    batch_size_bases num_thread ultra_thresh)."""
    if name_or_path in ABEA_PROFILES:
        return ABEA_PROFILES[name_or_path]
    toks = open(name_or_path).read().split()
    if len(toks) < 7:
        raise ValueError("Malformed profile config file.")  # f5c.c:1822
    return AbeaRunProfile(
        max_readlen=float(toks[0]), avg_epk=float(toks[1]),
        max_epk=float(toks[2]), batch_size=int(toks[3]),
        batch_size_bases=int(toks[4]), num_workers=int(toks[5]),
        ultra_thresh=int(toks[6]),
    )
