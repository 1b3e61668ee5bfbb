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


# ---------------------------------------------------------------------------
# plink2 .pgen / .pvar / .psam (the canonical grm invocation consumes
# chrN_phase3.pgen — run-cpu.sh:53,84)
# ---------------------------------------------------------------------------

def read_psam(path: str):
    """Sample IDs from .psam (header #FID/#IID; IID column)."""
    ids = []
    iid_col = 0
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("#"):
                cols = line[1:].split("\t") if "\t" in line else line[1:].split()
                iid_col = cols.index("IID") if "IID" in cols else 0
                continue
            toks = line.split()
            ids.append(toks[iid_col])
    return ids


def read_pvar(path: str):
    """Variant IDs from .pvar (skips ## metadata and the #CHROM header)."""
    out = []
    with open(path) as f:
        for line in f:
            if not line.strip() or line.startswith("#"):
                continue
            toks = line.split()
            out.append(toks[2] if len(toks) > 2 else toks[0])
    return out


def read_pgen(prefix: str):
    """Read a .pgen(+.pvar/.psam) genotype matrix.

    Supported storage modes: 0x01 (embedded plink1 variant-major .bed
    payload) and 0x02 (PLINK 2 fixed-width unphased hardcalls, 2-bit codes
    0/1/2 = ALT dosage, 3 = missing).  Compressed/variable-width modes
    (0x10+) raise — convert with `plink2 --make-pgen 'format=fixed'`.
    Returns (geno (M, N) uint8 dosages with 3 = missing, sample ids)."""
    import struct

    ids = read_psam(prefix + ".psam")
    n_samples = len(ids)
    n_variants = len(read_pvar(prefix + ".pvar"))
    raw = np.fromfile(prefix + ".pgen", dtype=np.uint8)
    assert raw[0] == 0x6C and raw[1] == 0x1B, "not a .pgen file"
    mode = raw[2]
    if mode == 0x01:
        body = raw[3:]
        bpv = -(-n_samples // 4)
        body = body[: n_variants * bpv].reshape(n_variants, bpv)
        codes = np.zeros((n_variants, bpv * 4), np.uint8)
        for k in range(4):
            codes[:, k::4] = (body >> (2 * k)) & 3
        return _BED_TO_DOSAGE[codes[:, :n_samples]], ids
    if mode == 0x02:
        vc, sc = struct.unpack_from("<II", raw.tobytes(), 3)
        assert vc == n_variants, f".pvar has {n_variants} variants, header {vc}"
        assert sc == n_samples, f".psam has {n_samples} samples, header {sc}"
        body = raw[11:]
        bpv = -(-n_samples // 4)
        body = body[: n_variants * bpv].reshape(n_variants, bpv)
        codes = np.zeros((n_variants, bpv * 4), np.uint8)
        for k in range(4):
            codes[:, k::4] = (body >> (2 * k)) & 3
        return codes[:, :n_samples].copy(), ids  # pgen codes ARE alt dosages
    raise NotImplementedError(
        f".pgen storage mode 0x{mode:02x} (compressed/variable-width) is not "
        "supported; re-encode with plink2 --make-pgen 'format=fixed'"
    )


def write_pgen(prefix: str, geno: np.ndarray, ids=None, mode: int = 0x02):
    """Write .pgen/.pvar/.psam (fixed-width mode 0x02 by default)."""
    import struct

    M, N = geno.shape
    bpv = -(-N // 4)
    if mode == 0x02:
        codes = np.full((M, bpv * 4), 3, np.uint8)
        codes[:, :N] = geno
    elif mode == 0x01:
        inv = np.array([3, 2, 0, 1], dtype=np.uint8)
        codes = np.ones((M, bpv * 4), np.uint8)
        codes[:, :N] = inv[geno]
    else:
        raise NotImplementedError(f"mode 0x{mode:02x}")
    body = np.zeros((M, bpv), np.uint8)
    for k in range(4):
        body |= (codes[:, k::4] & 3) << (2 * k)
    with open(prefix + ".pgen", "wb") as f:
        f.write(bytes([0x6C, 0x1B, mode]))
        if mode == 0x02:
            f.write(struct.pack("<II", M, N))
        f.write(body.tobytes())
    if ids is None:
        ids = [f"S{i}" for i in range(N)]
    with open(prefix + ".psam", "w") as f:
        f.write("#IID\tSEX\n")
        for s in ids:
            f.write(f"{s}\tNA\n")
    with open(prefix + ".pvar", "w") as f:
        f.write("#CHROM\tPOS\tID\tREF\tALT\n")
        for j in range(M):
            f.write(f"1\t{j+1}\tv{j}\tA\tC\n")
