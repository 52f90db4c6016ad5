"""Multi-chip sharding: the TPU-native replacement for split-db + mergesam.

The reference scales by (a) sharding reads across jobs and (b) sharding the
genome into RAM-sized pieces, then recombining mapping qualities exactly from
Z-field side channels (`SPLITTING_AND_MERGING`, `not_in_dist/MAPPING_QUALITIES`,
`mergesam/sam_reader.c:127-270`).  The merge algebra is associative:

    z1 (posterior sum)  -> psum over the genome-shard axis
    top-k hit selection -> all_gather scores + local top_k

so on TPU the whole cluster file-merge collapses into two collectives over the
ICI mesh.  This module provides the mesh plumbing and the collective merge
step used by the distributed mapper and by `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shrimp_tpu.ops.params import SWParams
from shrimp_tpu.ops.sw_vector import sw_score_batch

READS_AXIS = "reads"     # data-parallel axis (splitreads.py analogue)
GENOME_AXIS = "genome"   # index-shard axis (split-db.py analogue)


def make_mesh(n_devices: int | None = None,
              genome_shards: int = 1) -> Mesh:
    """Build a (reads x genome) device mesh.

    genome_shards devices along the index axis; the rest data-parallel.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if n % genome_shards != 0:
        raise ValueError(f"{n} devices not divisible by {genome_shards}")
    arr = np.array(devs).reshape(n // genome_shards, genome_shards)
    return Mesh(arr, (READS_AXIS, GENOME_AXIS))


def merge_scores_across_shards(scores: jax.Array, posteriors: jax.Array,
                               k: int):
    """Inside-shard_map collective merge (the mergesam reduce).

    Args:
      scores:     int32 [H] per-candidate scores on this genome shard.
      posteriors: float32 [H] per-candidate posteriors on this shard.
      k: top-k to keep globally.

    Returns (top_scores [k], z1 scalar): the cross-shard top-k candidate
    scores and the exact global posterior sum (Z1 of MAPPING_QUALITIES
    Part 1c: z1 := sum_j z1_j).
    """
    z1 = jax.lax.psum(jnp.sum(posteriors), GENOME_AXIS)
    all_scores = jax.lax.all_gather(scores, GENOME_AXIS, tiled=True)
    top, _ = jax.lax.top_k(all_scores, k)
    return top, z1


class ShardedMapper:
    """Maps reads against N genome-index shards and recombines mapping
    qualities exactly — the in-memory (single-host, multi-shard) form of the
    split-db + mergesam workflow.

    Each shard would live in one host's HBM on a real pod slice; the merge
    quantities here (z1 sums across shards, bounded top-k by score) are the
    same associative algebra `merge_scores_across_shards` expresses as
    psum/all_gather collectives on the device mesh.
    """

    def __init__(self, indexes, cfg=None):
        from shrimp_tpu.pipeline.mapper import Mapper
        from shrimp_tpu.pipeline.options import MapperConfig
        self.cfg = cfg or MapperConfig()
        self.mappers = [Mapper(idx, self.cfg) for idx in indexes]

    def map_batch(self, reads):
        """Returns (entry, hits) per read with cross-shard MQVs; hit contig
        numbers are remapped to (shard, cn) pairs via `contig_name`."""
        from shrimp_tpu import mapq

        per_shard = [m.map_batch(reads) for m in self.mappers]
        out = []
        for ri in range(len(reads)):
            entry = per_shard[0][ri][0]
            # z1 := sum_j z1_j (MAPPING_QUALITIES Part 1c); each shard's
            # kept-hit posterior sum plays z1_j
            z1 = 0.0
            merged = []
            for sn, shard in enumerate(per_shard):
                hits = shard[ri][1]
                if not hits:
                    continue
                z1 += sum(h.posterior for h in hits)
                for h in hits:
                    merged.append((sn, h))
            # bounded selection by score (the mergesam heap policy)
            merged.sort(key=lambda t: -t[1].score_full)
            merged = merged[:self.cfg.num_outputs]
            for sn, h in merged:
                h.z0 = h.posterior
                h.z1 = z1
                h.mqv = mapq.qv_from_pr_corr(h.posterior / z1) if z1 else 0
                if h.mqv < 4:
                    h.mqv = 0
            out.append((entry, merged))
        return out

    def contig_name(self, sn: int, cn: int) -> str:
        return self.mappers[sn].index.contig_names[cn]


def sharded_pass1_step(mesh: Mesh, params: SWParams = SWParams(), k: int = 10):
    """Build the jitted multi-chip pass-1 step.

    Reads are sharded over READS_AXIS; each GENOME_AXIS member scores its
    own candidate windows (gathered from its index shard) and the shards
    merge via collectives.  Returns a function

        step(windows[B, S, G], reads[B, 1, R]) -> (top[B', k], z1[B'])

    where B is the global read-batch, S the genome-shard axis extent, and
    B' = B / reads-axis-size per device.
    """
    from jax import shard_map

    from shrimp_tpu.ops.params import ScoreProbs

    probs = ScoreProbs.from_scores(params, False)
    a = jnp.float32(probs.alpha)
    bta = jnp.float32(2.0 * probs.alpha + probs.beta)

    def per_device(windows, reads):
        # windows: [b, 1, G] local; reads: [b, 1, R] local
        b, s, G = windows.shape
        _, _, R = reads.shape
        scores = sw_score_batch(windows.reshape(b * s, G),
                                reads.reshape(b * s, R), params)
        # LS posterior (hit_run_post_sw shortcut, mapping.c:1632-1634)
        post = jnp.exp2((scores.astype(jnp.float32) - R * bta) / a)
        sc = scores.reshape(b, s)
        pp = post.reshape(b, s)
        z1 = jax.lax.psum(jnp.sum(pp, axis=1), GENOME_AXIS)
        gathered = jax.lax.all_gather(sc, GENOME_AXIS, axis=1, tiled=True)
        top, _ = jax.lax.top_k(gathered, min(k, gathered.shape[1]))
        return top, z1

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(READS_AXIS, GENOME_AXIS, None),
                  P(READS_AXIS, None, None)),
        out_specs=(P(READS_AXIS, None), P(READS_AXIS)),
        check_vma=False,
    )  # check_vma off: scan carries start as unvarying constants
    return jax.jit(fn)


def sharded_map_step(mesh: Mesh, params: SWParams = SWParams()):
    """The FULL sharded mapping step: pass-1 vector filter per genome shard,
    mergesam-algebra collectives (psum of posteriors, cross-shard argmax),
    then the pass-2 full SW + fused traceback on each read's winning window.

    Returns step(windows[B, S, G], reads[B, 1, R]) ->
        (stats[B', 10], z1[B']) with B' = B / reads-axis extent.
    This is what `__graft_entry__.dryrun_multichip` compiles over the mesh.
    """
    from jax import shard_map

    from shrimp_tpu.ops.params import ScoreProbs
    from shrimp_tpu.ops.sw_full import sw_full_and_traceback_jax

    probs = ScoreProbs.from_scores(params, False)
    a = jnp.float32(probs.alpha)
    bta = jnp.float32(2.0 * probs.alpha + probs.beta)

    def per_device(windows, reads):
        b, s, G = windows.shape
        _, _, R = reads.shape
        w2 = windows.reshape(b * s, G)
        r2 = jnp.broadcast_to(reads, (b, s, R)).reshape(b * s, R)
        scores = sw_score_batch(w2, r2, params).reshape(b, s)

        # ls posterior per window (hit_run_post_sw LS shortcut) -> z1 psum
        post = jnp.exp2((scores.astype(jnp.float32) - R * bta) / a)
        z1 = jax.lax.psum(jnp.sum(post, axis=1), GENOME_AXIS)

        # cross-shard best window per read: argmax over gathered scores
        gathered = jax.lax.all_gather(scores, GENOME_AXIS, axis=1,
                                      tiled=True)                  # [b, S]
        best = jnp.argmax(gathered, axis=1)
        my_lo = jax.lax.axis_index(GENOME_AXIS) * s
        local = jnp.clip(best - my_lo, 0, s - 1)
        mine = (best >= my_lo) & (best < my_lo + s)
        win = windows[jnp.arange(b), local]                        # [b, G]
        # only the owning shard runs pass 2; others contribute zeros
        win = jnp.where(mine[:, None], win, -1)
        stats, _ops = sw_full_and_traceback_jax(
            win, reads[:, 0, :], jnp.zeros(b, bool), params,
            local_alignment=False)
        stats = jax.lax.psum(jnp.where(mine[:, None], stats, 0),
                             GENOME_AXIS)
        return stats, z1

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(READS_AXIS, GENOME_AXIS, None),
                  P(READS_AXIS, None, None)),
        out_specs=(P(READS_AXIS, None), P(READS_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)
