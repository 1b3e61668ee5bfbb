"""plink genotype input (.bed / simple .pgen) for the grm pipeline.

The reference invokes plink2 on .pgen (run-cpu.sh:53); this loader covers
the plink1 .bed layout (which plink2 also consumes) and the fixed-width
uncompressed .pgen subtype.  Genotypes come out as (M variants, N samples)
uint8 with 0/1/2 = ALT dosage and 3 = missing.
"""

from __future__ import annotations

import numpy as np

# .bed 2-bit codes (variant-major): 0=hom A1(alt*2), 1=missing, 2=het, 3=hom A2
_BED_TO_DOSAGE = np.array([2, 3, 1, 0], dtype=np.uint8)


def read_bed(prefix: str, n_samples: int | None = None, n_variants: int | None = None):
    """Read plink1 .bed(+.fam/.bim for dimensions).  Returns (geno, ids)."""
    if n_samples is None:
        with open(prefix + ".fam") as f:
            ids = [line.split()[1] for line in f if line.strip()]
        n_samples = len(ids)
    else:
        ids = [f"S{i}" for i in range(n_samples)]
    if n_variants is None:
        with open(prefix + ".bim") as f:
            n_variants = sum(1 for line in f if line.strip())
    raw = np.fromfile(prefix + ".bed", dtype=np.uint8)
    assert raw[0] == 0x6C and raw[1] == 0x1B, "not a .bed file"
    assert raw[2] == 0x01, "only variant-major .bed supported"
    body = raw[3:]
    bpv = -(-n_samples // 4)
    body = body[: n_variants * bpv].reshape(n_variants, bpv)
    # unpack 2-bit codes, little-endian within byte
    codes = np.zeros((n_variants, bpv * 4), np.uint8)
    for k in range(4):
        codes[:, k::4] = (body >> (2 * k)) & 3
    return _BED_TO_DOSAGE[codes[:, :n_samples]], ids


def write_bed(prefix: str, geno: np.ndarray, ids=None):
    """geno (M, N) uint8 dosage codes (3 = missing) -> .bed/.bim/.fam."""
    inv = np.array([3, 2, 0, 1], dtype=np.uint8)  # dosage -> bed code
    M, N = geno.shape
    bpv = -(-N // 4)
    codes = np.ones((M, bpv * 4), np.uint8)  # pad slots = bed 01 = missing
    codes[:, :N] = inv[geno]
    body = np.zeros((M, bpv), np.uint8)
    for k in range(4):
        body |= (codes[:, k::4] & 3) << (2 * k)
    with open(prefix + ".bed", "wb") as f:
        f.write(bytes([0x6C, 0x1B, 0x01]))
        f.write(body.tobytes())
    if ids is None:
        ids = [f"S{i}" for i in range(N)]
    with open(prefix + ".fam", "w") as f:
        for s in ids:
            f.write(f"{s} {s} 0 0 0 -9\n")
    with open(prefix + ".bim", "w") as f:
        for j in range(M):
            f.write(f"1\tv{j}\t0\t{j+1}\tA\tC\n")
