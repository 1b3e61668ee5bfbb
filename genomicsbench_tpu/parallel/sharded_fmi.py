"""Index-SHARDED FM search: the occ table splits across the mesh.

fmi_sharded (data_parallel.py) shards READS and replicates the index —
right when the index fits one chip's HBM.  For genome-scale indexes that
don't (SURVEY §5.8: "FM-index occ-table shard-by-suffix-range with
all-to-all query routing if sharded"; BASELINE north-star config 4), this
module shards the checkpoint TABLE by block range instead: each device
holds one slab, every rank query is answered by a masked local gather +
psum over the axis (compute replicates, index memory shards), and the
monotone-jump SMEM kernel runs unchanged on top via ShardedOccTable.

Reference anchor: bwa-mem2 FMI_search loads the whole index into host
RAM (fmi.cpp:79-80); multi-chip TPU replaces "fits in RAM" with
"fits in the mesh's combined HBM".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pack_occ_table(index) -> np.ndarray:
    """The (n_blocks, 8) int32 checkpoint lines (same layout as
    FmdIndex.device, host-side)."""
    return np.concatenate([
        index.occ_cp.astype(np.int32),
        index.plane0.view(np.int32), index.plane1.view(np.int32),
    ], axis=1)


def shard_occ_table(mesh: Mesh, index):
    """Pad the checkpoint table to the axis size and lay one slab per
    device.  Returns (sharded table array, blocks-per-device)."""
    packed = pack_occ_table(index)
    n_dev = mesh.shape["data"]
    nb = packed.shape[0]
    pad = (-nb) % n_dev
    if pad:
        packed = np.concatenate(
            [packed, np.zeros((pad, packed.shape[1]), packed.dtype)])
    table = jax.device_put(
        jnp.asarray(packed), NamedSharding(mesh, P("data", None)))
    return table, packed.shape[0] // n_dev


def pass1_sharded_table(mesh: Mesh, index, query, qlen, min_seed_len=19):
    """SMEM pass 1 with the occ table sharded over the mesh's "data" axis.
    Same SMEMs as FmiPipeline.pass1 on one device."""
    from genomicsbench_tpu.ops.fmi import (
        ShardedOccTable, _mk_smem, _pass1_jump, _ragged_cols,
    )

    query = np.asarray(query)
    qlen = np.asarray(qlen, np.int32)
    B, L = query.shape
    table, slab_blocks = shard_occ_table(mesh, index)
    C = jnp.asarray(index.C.astype(np.int32))
    sent = jnp.int32(index.sentinel_row)
    max_rounds = 64 * L  # flat walk caps extension BASES

    def run(slab, q, ql):
        tab = ShardedOccTable(slab, slab_blocks, "data")
        return _pass1_jump(
            C, tab, sent, q, ql,
            jnp.ones(B, jnp.int32), jnp.zeros(B, jnp.int32),
            min_seed_len=min_seed_len, max_rounds=max_rounds,
        )

    out = jax.shard_map(
        run, mesh=mesh,
        in_specs=(P("data", None), P(None, None), P(None)),
        out_specs=P(),
        check_vma=False,
    )(table, jnp.asarray(query), jnp.asarray(qlen))
    sm_me, sm_k, sm_s, count, rounds = jax.device_get(out)
    assert int(rounds) < max_rounds
    sm_m, sm_e = sm_me & 0xFFFF, sm_me >> 16
    rid = np.repeat(np.arange(B), count)
    cols = _ragged_cols(count)
    m = sm_m[rid, cols]
    return _mk_smem(rid, m, sm_e[rid, cols] - 1, sm_k[rid, cols],
                    sm_s[rid, cols])
