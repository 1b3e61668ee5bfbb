"""Ultra-long-read banded alignment, sharded across chips.

The reference handles ultra-long reads by routing them to a separate CPU
path (f5c.cu:1026-1059 ultra-thresh split) because one GPU block cannot
hold their DP state.  The TPU-native answer (SURVEY.md §5.7) is
sequence parallelism: keep ONE read's banded DP on the whole mesh by
splitting the band across devices and exchanging the one-column halos
over ICI every anti-diagonal step.

This module implements that pattern for banded global alignment with
linear gaps (the shape shared by the suite's DP kernels):

* band coordinates: k in [0, W), query position j = i + k - W/2 for
  target row i — each row of the scan IS an anti-diagonal of the
  (target x query) matrix, so the band array is the wavefront.
* the band is sharded over the mesh's "data" axis (W/D lanes per chip).
* per row:
    - diag term      H[i-1, k]     — local,
    - up   term      H[i-1, k+1]   — one-lane halo from the RIGHT
      neighbor via `lax.ppermute`,
    - left chain     H[i, k-1] - g — the within-row recurrence, closed
      form max_{k'<=k} (B(k') + k' g) - k g: a local `cummax` plus a
      cross-device exclusive max of per-chip totals (one tiny
      all_gather) — the distributed version of the bsw/poa cummax
      trick.
* boundary/validity masks replace all data-dependent control flow.

Scores match the NumPy oracle `banded_nw_oracle` exactly (int32; tested
on the virtual 8-device CPU mesh in tests/test_longread.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG = -(1 << 30)


# --------------------------------------------------------------------- oracle
def banded_nw_oracle(query, target, band: int, match=1, mismatch=-1, gap=2):
    """Banded global NW, linear gaps, int32.  band = full width W; cell
    (i, j) is reachable iff |j - i + 0| < ... (k = j - i + W//2 in
    [0, W)).  Returns the alignment score (query fully consumed at the
    last target row), or None if the end cell is outside the band."""
    q = np.asarray(query)
    t = np.asarray(target)
    n, m = len(t), len(q)
    W = band
    W2 = W // 2
    kend = m - n + W2
    if not (0 <= kend < W):
        return None
    H = np.full(W, NEG, np.int64)
    for k in range(W):
        j = k - W2
        if 0 <= j <= m:
            H[k] = -gap * j
    for i in range(1, n + 1):
        Hn = np.full(W, NEG, np.int64)
        for k in range(W):
            j = i + k - W2
            if j < 0 or j > m:
                continue
            best = NEG
            if j >= 1 and H[k] > NEG:
                s = match if q[j - 1] == t[i - 1] else mismatch
                best = max(best, H[k] + s)
            if k + 1 < W and H[k + 1] > NEG:
                best = max(best, H[k + 1] - gap)
            if k >= 1 and Hn[k - 1] > NEG:
                best = max(best, Hn[k - 1] - gap)
            Hn[k] = best
        H = Hn
    return int(H[kend])


# -------------------------------------------------------------- sharded kernel
def sharded_banded_nw(mesh: Mesh, query, target, band: int,
                      match=1, mismatch=-1, gap=2, axis: str = "data"):
    """Band-sharded banded NW over the mesh; same score as the oracle."""
    D = mesh.shape[axis]
    q = np.asarray(query, np.int32)
    t = np.asarray(target, np.int32)
    n, m = len(t), len(q)
    W = band
    assert W % D == 0, "band width must divide over the mesh axis"
    W2 = W // 2
    kend = m - n + W2
    assert 0 <= kend < W, "end cell outside the band"
    # query padded so per-row dynamic slices never go out of range
    pad = W + n + 2
    qpad = np.full(m + 2 * pad, -1, np.int32)
    qpad[pad : pad + m] = q

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(None), P(None)),
        out_specs=P(axis),
    )
    def run(h0_local, qp, tt):
        Wl = h0_local.shape[0]
        d = jax.lax.axis_index(axis)
        klo = d * Wl
        kloc = jnp.arange(Wl, dtype=jnp.int32)
        kglob = klo + kloc
        right = [(i, i - 1) for i in range(1, D)]  # receive from right nbr

        def step(H, i):
            # halo: right neighbor's first lane of the previous row
            if D > 1:
                halo = jax.lax.ppermute(H[0], axis, right)
                # devices with no source receive zeros; the band's right
                # edge (last device) must see NEG, not 0
                halo = jnp.where(d == D - 1, jnp.int32(NEG), halo)
            else:
                halo = jnp.int32(NEG)
            up_src = jnp.concatenate([H[1:], jnp.array([halo], jnp.int32)])
            j = i + kglob - W2
            valid = (j >= 0) & (j <= m)
            # lane k compares q[j-1] with t[i-1], j = i + k - W2
            qrow = jax.lax.dynamic_slice(qp, (i + klo - W2 - 1 + pad,), (Wl,))
            s = jnp.where(qrow == tt[i - 1], match, mismatch)
            diag = jnp.where((j >= 1) & (H > NEG // 2), H + s, NEG)
            up = jnp.where(up_src > NEG // 2, up_src - gap, NEG)
            B = jnp.maximum(diag, up)
            # left chain, distributed closed form
            key = jnp.where(B > NEG // 2, B + kglob * gap, NEG)
            local = jax.lax.cummax(key)
            totals = jax.lax.all_gather(local[-1], axis)  # (D,)
            excl = jnp.max(
                jnp.where(jnp.arange(D) < d, totals, NEG), initial=NEG
            )
            pref = jnp.maximum(local, excl)
            left = jnp.where(pref > NEG // 2, pref - kglob * gap, NEG)
            Hn = jnp.maximum(B, left)
            Hn = jnp.where(valid, Hn, NEG)
            return Hn, None

        H, _ = jax.lax.scan(step, h0_local, jnp.arange(1, n + 1, dtype=jnp.int32))
        return H

    k = np.arange(W)
    j0 = k - W2
    h0 = np.where((j0 >= 0) & (j0 <= m), -gap * j0, NEG).astype(np.int32)
    h0 = jax.device_put(h0, NamedSharding(mesh, P(axis)))
    qp = jax.device_put(jnp.asarray(qpad), NamedSharding(mesh, P()))
    tt = jax.device_put(jnp.asarray(t), NamedSharding(mesh, P()))
    H = np.asarray(jax.jit(run)(h0, qp, tt))
    return int(H[kend])
