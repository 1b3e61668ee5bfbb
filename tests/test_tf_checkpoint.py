"""TF tensor-bundle reader + Clair checkpoint restore.

No real Clair checkpoint exists in the reference snapshot (weights are
stripped), so these tests validate the reader against fixtures written
by an independent encoder below that follows the documented formats:
leveldb table (block handles, shared-prefix keys, restart arrays,
footer magic) and tensor_bundle.proto (BundleHeaderProto /
BundleEntryProto).  The encoder mirrors what TF's BundleWriter emits —
sorted keys, header at the empty key, raw little-endian shard bytes.
"""

import struct

import numpy as np
import pytest

from genomicsbench_tpu.io import tf_checkpoint as tfc


# ---------------------------------------------------------------------------
# fixture encoder (independent of the reader implementation)
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _leveldb_block(entries, restart_interval=4) -> bytes:
    """entries: sorted [(key bytes, value bytes)]; shared-prefix coding
    with a restart point every `restart_interval` entries."""
    out = bytearray()
    restarts = []
    prev = b""
    for i, (key, val) in enumerate(entries):
        if i % restart_interval == 0:
            restarts.append(len(out))
            shared = 0
        else:
            shared = 0
            while (shared < len(prev) and shared < len(key)
                   and prev[shared] == key[shared]):
                shared += 1
        out += _varint(shared) + _varint(len(key) - shared) \
            + _varint(len(val))
        out += key[shared:] + val
        prev = key
    for r in restarts:
        out += struct.pack("<I", r)
    out += struct.pack("<I", len(restarts))
    return bytes(out)


def _write_table(path, entries, block_size=2, compress=False,
                 restart_interval=4):
    """leveldb table: data blocks of `block_size` entries, an index block
    of last-key -> BlockHandle, an (empty) metaindex block, footer."""
    blob = bytearray()

    def emit_block(block: bytes):
        if compress:
            payload = _snappy_compress(block)
            ctype = 1
        else:
            payload = block
            ctype = 0
        off = len(blob)
        blob.extend(payload)
        blob.append(ctype)
        blob.extend(b"\x00\x00\x00\x00")  # crc (unverified by reader)
        return _varint(off) + _varint(len(payload))

    index_entries = []
    for i in range(0, len(entries), block_size):
        chunk = entries[i:i + block_size]
        handle = emit_block(_leveldb_block(chunk, restart_interval))
        index_entries.append((chunk[-1][0], handle))
    meta_handle = emit_block(_leveldb_block([]))
    index_handle = emit_block(_leveldb_block(index_entries))
    footer = meta_handle + index_handle
    footer += b"\x00" * (40 - len(footer))
    footer += struct.pack("<Q", 0xDB4775248B80FB57)
    blob.extend(footer)
    with open(path, "wb") as f:
        f.write(blob)


def _snappy_compress(data: bytes) -> bytes:
    """All-literal snappy stream (valid, uncompressed-size encoding)."""
    out = bytearray(_varint(len(data)))
    pos = 0
    while pos < len(data):
        chunk = data[pos:pos + 60]
        out.append((len(chunk) - 1) << 2)  # literal tag, len <= 60
        out += chunk
        pos += len(chunk)
    return bytes(out)


_TF_DTYPE = {np.dtype("float32"): 1, np.dtype("float64"): 2,
             np.dtype("int32"): 3, np.dtype("int64"): 9}


def _entry_proto(arr: np.ndarray, shard, offset) -> bytes:
    shape = b""
    for d in arr.shape:
        dim = b"\x08" + _varint(d)          # Dim.size = 1
        shape += b"\x12" + _varint(len(dim)) + dim  # TensorShapeProto.dim = 2
    out = b"\x08" + _varint(_TF_DTYPE[arr.dtype])   # dtype = 1
    out += b"\x12" + _varint(len(shape)) + shape    # shape = 2
    if shard:
        out += b"\x18" + _varint(shard)             # shard_id = 3
    if offset:
        out += b"\x20" + _varint(offset)            # offset = 4
    out += b"\x28" + _varint(arr.nbytes)            # size = 5
    return out


def write_bundle(prefix, tensors: dict, compress=False, block_size=2):
    """tensors: {name: np.ndarray}; single-shard TF V2 checkpoint."""
    data = bytearray()
    entries = [(b"", b"\x08" + _varint(1))]  # header: num_shards = 1
    for name in sorted(tensors):
        arr = np.asarray(tensors[name])  # NOT ascontiguousarray: it
        entries.append(                  # promotes 0-d scalars to (1,)
            (name.encode(), _entry_proto(arr, 0, len(data))))
        data += arr.tobytes()
    _write_table(prefix + ".index", entries, block_size=block_size,
                 compress=compress)
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(bytes(data))


# ---------------------------------------------------------------------------
# reader tests
# ---------------------------------------------------------------------------

def _demo_tensors():
    rng = np.random.default_rng(7)
    return {
        "layer1/kernel": rng.standard_normal((5, 3)).astype(np.float32),
        "layer1/bias": rng.standard_normal(3).astype(np.float32),
        "layer2/kernel": rng.standard_normal((3, 4, 2)).astype(np.float64),
        "step": np.array(1234, np.int64),
        "counts": rng.integers(0, 100, (7,)).astype(np.int32),
    }


def test_bundle_roundtrip(tmp_path):
    prefix = str(tmp_path / "model.ckpt")
    tensors = _demo_tensors()
    write_bundle(prefix, tensors)
    got = tfc.read_tensor_bundle(prefix)
    assert set(got) == set(tensors)
    for k in tensors:
        assert got[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(got[k], tensors[k])


def test_bundle_prefix_compression_and_blocks(tmp_path):
    # many shared-prefix keys, small blocks, restart interval 2: forces
    # the shared>0 path and multi-block index walks
    rng = np.random.default_rng(3)
    tensors = {f"scope/sub/var_{i:03d}": rng.standard_normal(
        (i + 1,)).astype(np.float32) for i in range(23)}
    prefix = str(tmp_path / "m.ckpt")
    _write_prefix_heavy(prefix, tensors)
    got = tfc.read_tensor_bundle(prefix)
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def _write_prefix_heavy(prefix, tensors):
    data = bytearray()
    entries = [(b"", b"\x08\x01")]
    for name in sorted(tensors):
        arr = np.asarray(tensors[name])
        entries.append((name.encode(), _entry_proto(arr, 0, len(data))))
        data += arr.tobytes()
    _write_table(prefix + ".index", entries, block_size=5,
                 restart_interval=2)
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(bytes(data))


def test_bundle_snappy_blocks(tmp_path):
    prefix = str(tmp_path / "s.ckpt")
    tensors = _demo_tensors()
    write_bundle(prefix, tensors, compress=True)
    got = tfc.read_tensor_bundle(prefix)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_snappy_copy_ops():
    # literal "abcd" + copy(offset=4, len=8) -> "abcdabcdabcd"
    # (overlapping copy: the canonical snappy run-length case)
    stream = bytes([12]) + bytes([(4 - 1) << 2]) + b"abcd" \
        + bytes([(1) | ((8 - 4) << 2)]) + bytes([4])
    assert tfc._snappy_decompress(stream) == b"abcdabcdabcd"


def test_list_tensors(tmp_path):
    prefix = str(tmp_path / "m.ckpt")
    write_bundle(prefix, _demo_tensors())
    info = tfc.list_tensors(prefix)
    assert info["layer1/kernel"] == (np.dtype("<f4"), (5, 3))
    assert info["step"] == (np.dtype("<i8"), ())


# ---------------------------------------------------------------------------
# Clair restore: TF variable names + fused (i,j,f,o) kernels -> our tree
# ---------------------------------------------------------------------------

def _params_to_tf_bundle(params, cfg):
    """Inverse of the converter, written from TF's documented layout:
    fused kernel rows = [inputs; recurrent], gate blocks (i, j, f, o)."""
    from genomicsbench_tpu.models.variant_caller import (
        HEAD_NAMES, _TF_HEAD_VARS)

    H = cfg.lstm_units
    inv = np.concatenate([  # ours (i,f,g,o) -> TF (i,j,f,o)
        np.arange(0, H), np.arange(2 * H, 3 * H),
        np.arange(H, 2 * H), np.arange(3 * H, 4 * H)])
    bundle = {}
    for li, scope in ((1, "LSTM1"), (2, "LSTM2")):
        for d in ("fw", "bw"):
            p = params[f"lstm{li}_{d}"]
            k = np.concatenate([np.asarray(p["wx"]), np.asarray(p["wh"])])
            base = (f"{scope}/stack_bidirectional_rnn/cell_0/"
                    f"bidirectional_rnn/{d}/cudnn_compatible_lstm_cell")
            bundle[f"{base}/kernel"] = k[:, inv]
            bundle[f"{base}/bias"] = np.asarray(p["b"])[inv]
    w3, b3 = np.asarray(params["l3"]["w"]), np.asarray(params["l3"]["b"])
    for i in range(2 * H):
        bundle[f"L3/Unit_{i}/kernel"] = w3[i]
        bundle[f"L3/Unit_{i}/bias"] = b3[i]
    bundle["L4/kernel"] = np.asarray(params["l4"]["w"])
    bundle["L4/bias"] = np.asarray(params["l4"]["b"])
    for i, name in enumerate(HEAD_NAMES):
        bundle[f"L5_{i+1}/kernel"] = np.asarray(params[f"l5_{name}"]["w"])
        bundle[f"L5_{i+1}/bias"] = np.asarray(params[f"l5_{name}"]["b"])
        bundle[f"Prediction/{_TF_HEAD_VARS[i]}/kernel"] = \
            np.asarray(params[f"head_{name}"]["w"])
        bundle[f"Prediction/{_TF_HEAD_VARS[i]}/bias"] = \
            np.asarray(params[f"head_{name}"]["b"])
    return bundle


def test_clair_tf_checkpoint_restore(tmp_path):
    import jax

    from genomicsbench_tpu.models import variant_caller as vc

    cfg = vc.ClairConfig.tiny()
    params = jax.device_get(vc.init_params(jax.random.key(11), cfg))
    prefix = str(tmp_path / "clair.ckpt")
    write_bundle(prefix, _params_to_tf_bundle(params, cfg), block_size=7)
    restored = vc.load_tf_checkpoint(prefix, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(restored))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]), err_msg=str(path))
    # and the restored tree drives the forward pass
    x = np.zeros((2, cfg.seq_len, cfg.rows, cfg.channels), np.float32)
    y = vc.forward(restored, x, cfg)
    assert y["gt21"].shape == (2, cfg.head_sizes[0])


def test_gate_permutation_is_involution():
    # the (i,j,f,o) <-> (i,f,g,o) block swap is its own inverse; a
    # double application must be identity (guards both converters)
    H = 5
    perm = np.concatenate([np.arange(0, H), np.arange(2 * H, 3 * H),
                           np.arange(H, 2 * H), np.arange(3 * H, 4 * H)])
    assert np.array_equal(perm[perm], np.arange(4 * H))


def test_sliced_and_unsupported_tensors_skipped(tmp_path):
    # a partitioned (sliced) entry and a DT_STRING bookkeeping variable
    # must not fail the whole restore; the numeric tensors still load
    # (a consumer missing a required tensor raises a KeyError by name)
    prefix = str(tmp_path / "m.ckpt")
    arr = np.zeros((2, 2), np.float32)
    good = rngd = np.arange(6, dtype=np.float32)
    sliced = _entry_proto(arr, 0, 0) + b"\x3a\x02\x08\x00"  # slices = 7
    string_ent = b"\x08\x07" + b"\x12\x00" + b"\x28\x00"  # DT_STRING
    entries = [(b"", b"\x08\x01"),
               (b"a_good", _entry_proto(good, 0, arr.nbytes)),
               (b"sliced_t", sliced),
               (b"str_var", string_ent)]
    _write_table(prefix + ".index", entries)
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(arr.tobytes() + good.tobytes())
    got = tfc.read_tensor_bundle(prefix)
    assert set(got) == {"a_good"}
    np.testing.assert_array_equal(got["a_good"], good)


def test_big_endian_bundle_rejected(tmp_path):
    prefix = str(tmp_path / "m.ckpt")
    arr = np.zeros(3, np.float32)
    entries = [(b"", b"\x08\x01\x10\x01"),  # num_shards=1, endianness=1
               (b"t", _entry_proto(arr, 0, 0))]
    _write_table(prefix + ".index", entries)
    with open(prefix + ".data-00000-of-00001", "wb") as f:
        f.write(arr.tobytes())
    with pytest.raises(NotImplementedError):
        tfc.read_tensor_bundle(prefix)
