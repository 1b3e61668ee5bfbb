"""genomicsbench_tpu — a TPU-native genomics kernel engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of
arun-sub/genomicsbench: the twelve accelerator-relevant genomics pipeline
stages (banded Smith-Waterman seed extension, FM-index SMEM seeding,
minimap2-style anchor chaining, pair-HMM forward likelihood, partial-order
alignment, adaptive banded event alignment, k-mer counting, de Bruijn graph
construction, pileup counting, GRM, neural basecalling and neural variant
calling) re-designed TPU-first:

- batched, fixed-shape DP kernels on the VPU/MXU (lax.scan + Pallas),
- sharded/replicated reference tables over a jax.sharding.Mesh,
- collective merges (psum / all_gather / all-to-all) instead of atomics,
- length-bucketed batch formation instead of dynamic work-stealing.

Layering (see SURVEY.md §7.1):
    cli        — `gbench` entry points mirroring scripts/run-cpu.sh
    io/        — host-side loaders (FASTA/FASTQ, pair/anchor/phmm text, BAM)
    batching/  — bucketing + padding policies, host→device streaming
    parallel/  — mesh construction, shard_map wrappers, collective merges
    ops/       — the TPU compute kernels (JAX + Pallas)
    models/    — neural models (CTC basecaller, BiLSTM variant caller)
    oracle/    — NumPy reference semantics for parity testing
"""

__version__ = "0.1.0"
