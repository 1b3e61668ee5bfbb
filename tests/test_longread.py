"""Band-sharded long-read DP (ops/longread.py): ppermute halo exchange +
distributed prefix-max vs the NumPy oracle on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from genomicsbench_tpu.ops.longread import banded_nw_oracle, sharded_banded_nw
from genomicsbench_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh():
    n = min(8, jax.device_count())
    return make_mesh(jax.devices()[:n])


def _pair(rng, n, div=0.1, indels=True):
    t = rng.integers(0, 4, n)
    q = []
    for c in t:
        r = rng.random()
        if indels and r < div / 3:
            continue
        if r < 2 * div / 3:
            q.append(int(rng.integers(0, 4)))
        elif indels and r < div:
            q.append(int(c)); q.append(int(rng.integers(0, 4)))
        else:
            q.append(int(c))
    return np.array(q), t


def test_matches_oracle_random(mesh):
    rng = np.random.default_rng(0)
    W = mesh.shape["data"] * 16
    for trial in range(4):
        q, t = _pair(rng, 300, div=0.08)
        want = banded_nw_oracle(q, t, W)
        if want is None:
            continue
        got = sharded_banded_nw(mesh, q, t, W)
        assert got == want, f"trial {trial}"


def test_identical_sequences_score_perfect(mesh):
    rng = np.random.default_rng(1)
    W = mesh.shape["data"] * 16
    s = rng.integers(0, 4, 500)
    assert sharded_banded_nw(mesh, s, s, W) == len(s)  # match=1 each


def test_single_device_path():
    mesh1 = make_mesh(jax.devices()[:1])
    rng = np.random.default_rng(2)
    q, t = _pair(rng, 200, div=0.05)
    W = 64
    want = banded_nw_oracle(q, t, W)
    if want is not None:
        assert sharded_banded_nw(mesh1, q, t, W) == want
