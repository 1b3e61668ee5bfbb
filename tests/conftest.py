"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on the CPU backend with
xla_force_host_platform_device_count (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Force-override: the machine image pins JAX_PLATFORMS=axon (real TPU) via
# sitecustomize; tests run on the virtual CPU mesh by default.  Set
# GENOMICSBENCH_TEST_TPU=1 to run the suite on the real chip instead
# (multi-device sharding tests then see a 1-device mesh).
_ON_TPU = bool(os.environ.get("GENOMICSBENCH_TEST_TPU"))
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN


def load_bsw_golden(name):
    """Parse a bsw golden fixture pair -> (cases, expected, params)."""
    cases = []
    with open(GOLDEN / f"bsw_{name}.in") as f:
        toks = f.read().split()
    n = int(toks[0])
    pos = 1
    for _ in range(n):
        h0, l1, l2 = int(toks[pos]), int(toks[pos + 1]), int(toks[pos + 2])
        t = np.frombuffer(toks[pos + 3].encode(), dtype=np.uint8) - ord("0")
        q = np.frombuffer(toks[pos + 4].encode(), dtype=np.uint8) - ord("0")
        assert len(t) == l1 and len(q) == l2
        cases.append((h0, t, q))
        pos += 5
    exp = np.loadtxt(GOLDEN / f"bsw_{name}.gold", dtype=np.int64).reshape(n, 6)
    return cases, exp


def load_chain_golden(name="default"):
    from genomicsbench_tpu.io.anchors import load_anchor_calls

    calls = load_anchor_calls(GOLDEN / f"chain_{name}.in")
    expected = []
    with open(GOLDEN / f"chain_{name}.gold") as f:
        toks = f.read().split()
    pos = 0
    for c in calls:
        rows = np.array(toks[pos : pos + 3 * c.n], dtype=np.int64).reshape(c.n, 3)
        pos += 3 * c.n
        assert toks[pos] == "EOR"
        pos += 1
        expected.append(rows)
    return calls, expected
