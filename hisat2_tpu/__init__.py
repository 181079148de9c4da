"""hisat2_tpu — a TPU-native graph-genome spliced read aligner.

A brand-new JAX/XLA framework with the capabilities of HISAT2
(reference: /root/reference, hisat2 v2.1.0): FM-index based alignment of
DNA/RNA sequencing reads against a reference genome (+ variants), re-designed
for TPU hardware:

  - the FM index is laid out as dense integer arrays in HBM
    (packed 2-bit BWT words + rank checkpoints + sampled suffix array),
  - search runs as *batched wavefronts*: thousands of reads advance one
    LF-mapping step per fused device loop iteration (lax.scan; PERF.md
    documents the measured reasons a Pallas kernel does not beat XLA's
    gather floor on this path),
  - coordinate resolution, extension and scoring are batched gathers/compares
    over the packed reference,
  - multi-chip scaling shards the read stream over a jax.sharding.Mesh and
    merges summaries/splice tables with collectives (no mutexes, no threads).

Package layout:
  index/    index build + on-disk formats (.ht2 reader, native .npz format)
  ops/      device kernels: rank/LF, batched FM search, SA resolve, extension
  align/    alignment pipeline: policies, scoring, pairing, MAPQ, selection
  io/       host I/O: FASTA/FASTQ parsing, SAM formatting
  parallel/ mesh/sharding utilities, collective merge of summaries
  cli/      command-line front-ends (align / build / inspect)
"""

__version__ = "0.1.0"
