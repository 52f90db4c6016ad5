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


def _setup_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache so repeat CLI
    invocations skip XLA compiles (the reference binary cold-starts in
    milliseconds; without this every `python -m shrimp_tpu.gmapper` paid a
    tens-of-seconds JIT tax).  Opt out with SHRIMP_TPU_NO_COMPILE_CACHE=1."""
    import os
    if os.environ.get("SHRIMP_TPU_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get(
        "SHRIMP_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "shrimp_tpu",
                     "jax_cache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        # Some TPU environments force their platform back via a baked
        # sitecustomize; re-assert an explicitly user-requested platform
        # (JAX_PLATFORMS=cpu ...) so tests and tools can pin the backend.
        plat = os.environ.get("JAX_PLATFORMS", "")
        if plat and "axon" not in plat and "tpu" not in plat:
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass          # cache is an optimization; never block startup on it


_setup_compilation_cache()

from shrimp_tpu import dna  # noqa: F401,E402
from shrimp_tpu import seeds  # noqa: F401,E402
