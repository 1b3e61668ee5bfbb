"""Multi-host helpers (parallel/multihost.py) in single-process mode."""

import jax
import numpy as np

from genomicsbench_tpu.parallel.multihost import (
    global_mesh, host_batch_bounds, host_shard, init_multihost,
)


def test_init_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_multihost() is False


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("data", "model")


def test_host_shard_partitions():
    items = list(range(10))
    shards = [host_shard(items, process_id=i, num_processes=3) for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert all(len(s) >= 3 for s in shards)


def test_host_batch_bounds_cover():
    spans = [host_batch_bounds(11, process_id=i, num_processes=4) for i in range(4)]
    covered = []
    for lo, hi in spans:
        covered.extend(range(lo, hi))
    assert covered == list(range(11))


def test_real_two_process_distributed_psum(tmp_path):
    """Spawn TWO actual processes with jax.distributed over the CPU
    backend: init via init_multihost, build the global mesh, and psum a
    per-process value across hosts — the end-to-end §5.8 path, not a
    simulation."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    prog = r"""
import os, sys
sys.path.insert(0, os.environ["GB_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from genomicsbench_tpu.parallel.multihost import (
    global_mesh, host_shard, init_multihost)
assert init_multihost() is True
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
mesh = global_mesh()
assert mesh.devices.size == jax.device_count()
pid = jax.process_index()

def f(_):
    return jax.lax.psum(jnp.float32(pid + 1), "data")

got = jax.shard_map(
    f, mesh=mesh, in_specs=P("data"), out_specs=P(),
    check_vma=False)(jnp.zeros((jax.device_count(),), jnp.float32))
# 2 procs x 2 local devices: psum over 4 shards = 2*(1) + 2*(2) = 6
assert float(np.asarray(jax.device_get(got))) == 6.0, got
assert host_shard(list(range(10))) == list(range(10))[pid::2]
print(f"PROC{pid}_OK")
"""
    import os as _os

    env_base = dict(_os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "GB_REPO": str(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__)))),
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "NUM_PROCESSES": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", prog], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (pid, out[-500:], err[-2000:])
        assert f"PROC{pid}_OK" in out, (pid, out, err[-500:])


def test_real_two_process_sharded_kmer_merge(tmp_path):
    """SURVEY §7.4 criterion 4 at N=2 REAL processes: the sharded k-mer
    count (shard_map + all_to_all key-range exchange) over a
    jax.distributed global mesh must equal the single-device count."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    prog = r"""
import os, sys
sys.path.insert(0, os.environ["GB_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from genomicsbench_tpu.parallel.multihost import global_mesh, init_multihost
assert init_multihost() is True
import numpy as np
from genomicsbench_tpu.ops.kmer import count_kmers
from genomicsbench_tpu.parallel.sharded_count import sharded_count_kmers

rng = np.random.default_rng(71)  # same data on every process
B, L, k = 8, 96, 15
seq = rng.integers(0, 4, (B, L)).astype(np.uint8)
lens = np.full(B, L, np.int32)
mesh = global_mesh(model=1)
u, c = sharded_count_kmers(mesh, seq, lens, k, replicate_out=True)
ru, rc = count_kmers(seq, lens, k)
assert np.array_equal(u, ru) and np.array_equal(c, rc), (
    len(u), len(ru), int(c.sum()), int(rc.sum()))
print(f"PROC{jax.process_index()}_OK {len(u)} uniques")
"""
    import os as _os

    env_base = dict(_os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "GB_REPO": str(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__)))),
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "NUM_PROCESSES": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", prog], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (pid, out[-500:], err[-2000:])
        assert f"PROC{pid}_OK" in out, (pid, out, err[-500:])


def test_real_two_process_sharded_occ_fmi(tmp_path):
    """SURVEY §7.4 criterion 4, fmi side: SMEM pass 1 with the occ TABLE
    sharded across TWO real jax.distributed processes (each host's
    devices hold only their slab; every rank query is a masked local
    gather + cross-host psum) must emit the single-device SMEM set."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    prog = r"""
import os, sys
sys.path.insert(0, os.environ["GB_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
from genomicsbench_tpu.parallel.multihost import global_mesh, init_multihost
assert init_multihost() is True
import numpy as np
from genomicsbench_tpu.ops.fmi import FmiPipeline, build_fmd_index
from genomicsbench_tpu.parallel.sharded_fmi import pass1_sharded_table

rng = np.random.default_rng(41)  # same data on every process
ref = rng.integers(0, 4, 700).astype(np.uint8)
idx = build_fmd_index(ref)
B, L = 8, 72
q = np.zeros((B, L), np.uint8)
qlen = np.zeros(B, np.int32)
for i in range(B):
    ln = int(rng.integers(30, L + 1))
    at = int(rng.integers(0, len(ref) - ln))
    q[i, :ln] = ref[at : at + ln]
    qlen[i] = ln
mesh = global_mesh(model=1)
got = pass1_sharded_table(mesh, idx, q, qlen, min_seed_len=19)
want = FmiPipeline(idx, min_seed_len=19).pass1(q, qlen)
assert got.sorted_tuples(with_interval=True) == \
    want.sorted_tuples(with_interval=True), (got.count, want.count)
assert got.count > 0
print(f"PROC{jax.process_index()}_OK {got.count} smems")
"""
    import os as _os

    env_base = dict(_os.environ)
    env_base.pop("JAX_PLATFORMS", None)
    env_base.update({
        "GB_REPO": str(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__)))),
        "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
        "NUM_PROCESSES": "2",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    })
    procs = []
    for pid in range(2):
        env = dict(env_base)
        env["PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", prog], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (pid, out[-500:], err[-2000:])
        assert f"PROC{pid}_OK" in out, (pid, out, err[-500:])
