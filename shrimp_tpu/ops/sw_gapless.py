"""Gapless (ungapped) extension kernel — the -U / mirna pass-1 engine.

Replicates `common/sw-gapless.c:sw_gapless` (:58-117): an optimal ungapped
alignment score along ONE genome diagonal fixed by the hit's anchor
(g_idx, r_idx).  The reference walks the diagonal once, accumulating
match/mismatch and resetting on negative (Kadane's max-subarray).  The
prefix-sum identity

    score_i   = prefix_i - min(0, min_{j<i} prefix_j)
    max_score = max(0, max_i score_i)

turns the sequential reset-scan into cumsum + cummax — O(R) fully parallel
VPU work per hit, batched over hits in rows.  This replaces the round-1
emulation (affine kernel with -255 gap opens), an O(G*R) detour for what
the reference computes in O(R).

Colour space: when the diagonal starts at read position 0, the first colour
is forcefully compared against lstocs(genome_ls[g], initbp): match scores
+match, mismatch skips the position entirely (contributes 0)
(sw-gapless.c:85-95).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from shrimp_tpu.ops.params import SWParams

GENOME_PAD = -1          # beyond-contig genome positions
READ_PAD = -2            # beyond-read positions (never equal to genome pad)


@functools.partial(jax.jit, static_argnames=("match", "mismatch"))
def _gapless_core(diag: jax.Array, reads: jax.Array, s0: jax.Array,
                  match: int, mismatch: int) -> jax.Array:
    """diag/reads: int8 [N, R] aligned along the anchor diagonal; s0 int32
    [N] override for column 0 (CS forced-colour rule; pass the computed
    s[0] for LS).  Returns int32 [N] max ungapped scores."""
    valid = (diag != GENOME_PAD) & (reads != READ_PAD)
    s = jnp.where(diag == reads, jnp.int32(match), jnp.int32(mismatch))
    s = jnp.where(valid, s, 0)
    s = s.at[:, 0].set(s0)
    prefix = jnp.cumsum(s, axis=1)
    # min over prefix_{j<i}, clamped at 0 (the empty-prefix case)
    runmin = jax.lax.associative_scan(jnp.minimum, prefix, axis=1)
    runmin = jnp.concatenate(
        [jnp.zeros((prefix.shape[0], 1), prefix.dtype), runmin[:, :-1]],
        axis=1)
    runmin = jnp.minimum(runmin, 0)
    return jnp.maximum(jnp.max(prefix - runmin, axis=1), 0)


def gapless_score_batch(diag: jax.Array, reads: jax.Array,
                        params: SWParams,
                        s0: jax.Array | None = None) -> jax.Array:
    """Batched sw_gapless over pre-gathered diagonals.

    diag:  int8 [N, R] genome codes at positions (g_idx - r_idx) + t
           (GENOME_PAD outside the contig).
    reads: int8 [N, R] read codes starting at position r_left
           (READ_PAD past the read end).
    s0:    int32 [N] column-0 score override (CS forced colour); None = LS
           (column 0 scored like any other).
    """
    if s0 is None:
        v0 = (diag[:, 0] != GENOME_PAD) & (reads[:, 0] != READ_PAD)
        s0 = jnp.where(
            v0, jnp.where(diag[:, 0] == reads[:, 0],
                          jnp.int32(params.match), jnp.int32(params.mismatch)),
            0)
    return _gapless_core(diag, reads, s0,
                         int(params.match), int(params.mismatch))
