"""Host-side input loaders.

Each loader parses one of the reference benchmark input formats into dense
NumPy arrays ready for bucketing and device upload.
"""

from genomicsbench_tpu.io.pairs import load_pairs, write_pairs, PairBatch
from genomicsbench_tpu.io.anchors import load_anchor_calls, write_anchor_calls, AnchorCall
from genomicsbench_tpu.io.phmm_text import load_phmm_testfile, write_phmm_testfile, PhmmBatch

__all__ = [
    "load_pairs",
    "write_pairs",
    "PairBatch",
    "load_anchor_calls",
    "write_anchor_calls",
    "AnchorCall",
    "load_phmm_testfile",
    "write_phmm_testfile",
    "PhmmBatch",
]
