"""Genetic relationship matrix — plink2 --make-grm-bin equivalent.

Capability: the grm benchmark (scripts/run-cpu.sh:53,84) runs
`plink2 --maf 0.01 --make-grm-bin` over 2-bit genotypes; the kernel is the
GCTA-style GRM over standardized dosages:

    x_ij = (g_ij - 2 p_j) / sqrt(2 p_j (1 - p_j)),  missing -> 0
    GRM_ik = (1 / M_ik) * sum_j x_ij x_kj
    M_ik   = #variants observed in both i and k

with the MAF filter applied on observed allele frequencies.  (plink-ng
itself is an empty submodule; semantics follow plink2's documented
--make-grm-bin / GCTA definition and are tested against a NumPy oracle.)

TPU-first design: this is the suite's pure-MXU kernel — two blocked
matmuls (X X^T for the numerator, mask mask^T for the denominators) tiled
over variants so X never exceeds HBM, f32 accumulation on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _grm_block_body(packed, maf_ok, acc_num, acc_den):
    """packed (Mb, N/4) uint8, four 2-bit genotype codes per byte
    (sample-major within a variant — plink2's own .pgen 2-bit layout):
    0/1/2 = dosage, 3 = missing.  Shipping packed bytes cuts the
    host->device transfer 4x (the e2e bottleneck on slow links) and is
    the natural hand-off from 2-bit .pgen records.  Accumulates the
    numerator (N, N) and pair-counts (N, N)."""
    Mb = packed.shape[0]
    lanes = [(packed >> (2 * l)) & 3 for l in range(4)]
    geno_block = jnp.stack(lanes, axis=2).reshape(Mb, -1).astype(jnp.int8)
    g = geno_block.astype(jnp.float32)
    miss = geno_block == 3
    obs = (~miss).astype(jnp.float32)
    g = jnp.where(miss, 0.0, g)
    n_obs = jnp.sum(obs, axis=1)
    p = jnp.sum(g, axis=1) / jnp.maximum(2.0 * n_obs, 1.0)
    denom = jnp.sqrt(jnp.maximum(2.0 * p * (1.0 - p), 1e-30))
    x = (g - 2.0 * p[:, None]) / denom[:, None]
    use = (maf_ok & (n_obs > 0))[:, None].astype(jnp.float32)
    x = x * use * obs
    # HIGHEST precision: the TPU MXU defaults to bf16 passes, which costs
    # ~1e-3 absolute error — too coarse for GRM entries (plink computes in
    # double).  HIGHEST uses 6-pass f32 on the MXU.
    acc_num = acc_num + jnp.dot(
        x.T, x, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    w = obs * use
    acc_den = acc_den + jnp.dot(
        w.T, w, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return acc_num, acc_den


@functools.partial(jax.jit, donate_argnums=(2, 3))
def _grm_block(packed, maf_ok, acc_num, acc_den):
    """Single-block entry (kept for incremental/streaming callers)."""
    return _grm_block_body(packed, maf_ok, acc_num, acc_den)


@jax.jit
def _grm_scan(packed3, maf2):
    """All blocks in ONE device program: packed3 (n_blocks, block, N/4),
    maf2 (n_blocks, block).  A host loop dispatching per block paid one
    tunnel upload round trip per block (49 blocks cost ~7 s of pure
    latency at chr22 scale); here the packed matrix uploads once and
    lax.scan accumulates on device."""
    Nb = packed3.shape[2] * 4
    acc = (jnp.zeros((Nb, Nb), jnp.float32), jnp.zeros((Nb, Nb), jnp.float32))

    def body(acc, xs):
        pk, ok = xs
        return _grm_block_body(pk, ok, *acc), None

    (num, den), _ = jax.lax.scan(body, acc, (packed3, maf2))
    return num, den


@jax.jit
def _grm_tril(num, den, rr, cc):
    """Elementwise GRM finish + lower-triangle gather, all on device."""
    out = num / jnp.maximum(den, 1.0)
    return out[rr, cc], den[rr, cc]


def grm(geno: np.ndarray, maf: float = 0.01, block: int = 2048):
    """geno (M, N) uint8: 0/1/2 dosage of the counted allele, 3 = missing.

    Returns (grm (N, N) float32, nobs (N, N) float32)."""
    M, N = geno.shape
    Nb = -(-N // 128) * 128
    n_blocks = -(-M // block)
    Mp = n_blocks * block
    # host-side per-variant maf filter (observed allele frequencies)
    miss = geno == 3
    n_obs = (~miss).sum(1)
    alt = np.where(miss, 0, geno).sum(1)
    p = alt / np.maximum(2 * n_obs, 1)
    maf_ok = (np.minimum(p, 1 - p) >= maf) & (n_obs > 0)
    # pad: extra samples AND extra variant rows are all-missing
    pad = np.full((Mp, Nb), 3, np.uint8)
    pad[:M, :N] = geno
    q = pad.reshape(Mp, Nb // 4, 4)
    packed = (q[..., 0] | (q[..., 1] << 2) | (q[..., 2] << 4)
              | (q[..., 3] << 6)).astype(np.uint8)
    maf_all = np.zeros(Mp, bool)
    maf_all[:M] = maf_ok
    num_d, den_d = _grm_scan(
        jnp.asarray(packed.reshape(n_blocks, block, Nb // 4)),
        jnp.asarray(maf_all.reshape(n_blocks, block)),
    )
    # divide on device and fetch only the lower triangle (what plink's
    # .grm.bin holds anyway): the (N, N) planes are the larger transfer of
    # this workload and the matrix is symmetric
    rr, cc = np.tril_indices(N)
    tri_o, tri_d = jax.device_get(_grm_tril(
        num_d, den_d, jnp.asarray(rr, jnp.int32), jnp.asarray(cc, jnp.int32)))
    out = np.zeros((N, N), np.float32)
    nobs = np.zeros((N, N), np.float32)
    out[rr, cc] = tri_o
    out[cc, rr] = tri_o
    nobs[rr, cc] = tri_d
    nobs[cc, rr] = tri_d
    return out, nobs


def grm_oracle(geno: np.ndarray, maf: float = 0.01):
    """Plain NumPy float64 oracle."""
    M, N = geno.shape
    miss = geno == 3
    g = np.where(miss, 0, geno).astype(np.float64)
    n_obs = (~miss).sum(1)
    p = g.sum(1) / np.maximum(2 * n_obs, 1)
    keep = (np.minimum(p, 1 - p) >= maf) & (n_obs > 0)
    x = (g - 2 * p[:, None]) / np.sqrt(np.maximum(2 * p * (1 - p), 1e-30))[:, None]
    x = np.where(miss, 0.0, x)
    x = x[keep]
    obs = (~miss)[keep].astype(np.float64)
    num = x.T @ x
    den = obs.T @ obs
    return num / np.maximum(den, 1.0), den


def write_grm_bin(prefix: str, grm_mat: np.ndarray, nobs: np.ndarray, ids):
    """plink --make-grm-bin output files: lower triangle row-major float32
    (.grm.bin), pair counts (.grm.N.bin), sample ids (.grm.id)."""
    N = grm_mat.shape[0]
    tri = np.concatenate(
        [grm_mat[i, : i + 1] for i in range(N)]
    ).astype("<f4")
    trin = np.concatenate(
        [nobs[i, : i + 1] for i in range(N)]
    ).astype("<f4")
    tri.tofile(prefix + ".grm.bin")
    trin.tofile(prefix + ".grm.N.bin")
    with open(prefix + ".grm.id", "w") as f:
        for s in ids:
            f.write(f"{s}\t{s}\n")
