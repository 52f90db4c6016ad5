"""shrimp_tpu — a TPU-native short-read mapping framework.

A ground-up reimplementation of the capabilities of SHRiMP2 (the SHort Read
Mapping Package) designed for TPU hardware: batched, fixed-shape JAX/Pallas
compute kernels for the alignment funnel, a CSR spaced-seed genome index that
lives in device HBM, and `jax.sharding`-based scaling across chips and hosts
in place of the reference's OpenMP + file-merge cluster workflow.

Layer map (mirrors SURVEY.md):
  L0  dna, seeds, utils      — codecs, spaced seeds, stats/timers
  L1  io.fastx, index        — FASTA/FASTQ IO, genome index build/persist
  L2  ops.*                  — DP alignment kernels (vector SW, full SW,
                               colour-space SW, posterior HMM)
  L3  pipeline.candidates    — kmer→anchor→candidate-window generation
  L4  pipeline.mapper        — end-to-end batched mapping funnel
  L5  pipeline.paired        — paired-end mapping
  L6  parallel.*             — device mesh, index sharding, collective merge
  L7  tools.*, cli           — mergesam/probcalc/… parity tools, gmapper CLI
"""

__version__ = "0.1.0"

from shrimp_tpu import dna  # noqa: F401
from shrimp_tpu import seeds  # noqa: F401
