"""Batch formation: length bucketing + padding policies.

Replaces the reference's dynamic OpenMP scheduling (e.g. fmi.cpp:180-193,
main_banded.cpp:279-291) and f5c's CPU/GPU outlier split (f5c.cu:1026-1059):
on TPU, load balance comes from sorting work items by cost and forming
fixed-shape padded batches, so every `jit` sees a small set of static shapes.
"""

from genomicsbench_tpu.batching.bucketing import bucket_by_length, Bucket

__all__ = ["bucket_by_length", "Bucket"]
