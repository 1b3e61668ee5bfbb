"""NumPy reference oracles.

Each oracle re-states the semantics of a reference CPU kernel in plain
NumPy/Python (scalar control flow, exact integer arithmetic).  They are the
bit-exactness contract the TPU kernels are tested against, and they are
themselves validated against golden outputs produced by compiling the
reference C++ kernels (tests/golden/).
"""

from genomicsbench_tpu.oracle.bsw import banded_sw_oracle
from genomicsbench_tpu.oracle.chain import chain_dp_oracle
from genomicsbench_tpu.oracle.pairhmm import pairhmm_forward_oracle

__all__ = [
    "banded_sw_oracle",
    "chain_dp_oracle",
    "pairhmm_forward_oracle",
]
