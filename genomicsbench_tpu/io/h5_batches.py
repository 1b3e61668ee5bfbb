"""HDF5 mini-batch I/O for the nn-variant benchmark.

The reference (benchmarks/nn-variant/prediction.py:14-16) loads
deepdish-written HDF5 files holding a list of mini-batches, each a
(X, position-array) pair with X of shape (batch, 33, 8, 4).  deepdish
serialises a python list as groups 'data'/'i0', 'i1', ... with each
tuple element under 'i0/i0', 'i0/i1' (pytables layout); we read both
that layout and a plain {batch_000/X, ...} layout, and write the plain
layout.
"""

from __future__ import annotations

import numpy as np


def write_batches(path: str, batches):
    """Write a list of X arrays (or (X, aux) tuples) to HDF5."""
    import h5py

    with h5py.File(path, "w") as f:
        for i, b in enumerate(batches):
            x = b[0] if isinstance(b, (tuple, list)) else b
            g = f.create_group(f"batch_{i:05d}")
            g.create_dataset("X", data=np.asarray(x))
            if isinstance(b, (tuple, list)) and len(b) > 1:
                g.create_dataset("aux", data=np.asarray(b[1]))


def read_batches(path: str):
    """Read mini-batches; returns list of (X, aux|None)."""
    import h5py

    out = []
    with h5py.File(path, "r") as f:
        if "data" in f:  # deepdish/pytables list layout
            data = f["data"]
            for key in sorted(data.keys()):
                item = data[key]
                if hasattr(item, "keys"):
                    sub = sorted(item.keys())
                    x = np.asarray(item[sub[0]])
                    aux = np.asarray(item[sub[1]]) if len(sub) > 1 else None
                else:
                    x, aux = np.asarray(item), None
                out.append((x, aux))
        else:
            for key in sorted(f.keys()):
                g = f[key]
                aux = np.asarray(g["aux"]) if "aux" in g else None
                out.append((np.asarray(g["X"]), aux))
    return out
