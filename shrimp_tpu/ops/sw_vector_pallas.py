"""Pallas TPU kernel for the pass-1 vector Smith-Waterman (L2a).

The SURVEY §7.4 L2 plan calls for the DP kernels in Pallas; this is the
row-scan formulation of `sw_vector.sw_score_batch_rows` as an explicit
VMEM kernel: the batch tiles over the sublane axis, genome positions live
in the 128-wide lane axis, and the within-row affine A-gap recurrence is
a tilted Hillis-Steele max-scan (log2(G) shift-max steps on the VPU).

Scores are bit-identical to `sw_score_batch` / `sw_score_batch_rows`,
including the colour-space row-0 genome plane (`genome_row0`).
Set `interpret=True` to run on CPU (tests/conftest's virtual platform).

Reference contract: `common/sw-vector.c:68-220` — local affine-gap
alignment, H floored at 0, score = max over all cells, padding never
matches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shrimp_tpu.ops.params import SWParams
from shrimp_tpu.ops.sw_vector import GENOME_PAD, NEG_INF, READ_PAD

_TB = 256        # batch rows per tile (measured: 3x the 8-row tile — a
                 # [TB, 128] plane op runs 32 vregs deep, amortizing the
                 # grid and pipelining the VPU; 1024 exceeds VMEM)
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _shift_right(x: jax.Array, s: int, fill: int) -> jax.Array:
    """Shift lanes right by s, filling vacated columns."""
    rolled = pltpu.roll(x, shift=s, axis=1)
    jj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(jj < s, jnp.int32(fill), rolled)


def _make_kernel(R: int, Gp: int, params: SWParams, has_row0: bool = False):
    # python ints fold into the kernel as literals (traced jnp scalars
    # would be captured constants, which pallas_call rejects)
    m = int(params.match)
    x_ = int(params.mismatch)
    aoe = -(params.a_gap_open + params.a_gap_extend)
    ae = -params.a_gap_extend
    boe = -(params.b_gap_open + params.b_gap_extend)
    be = -params.b_gap_extend

    n_scan = max(Gp - 1, 1).bit_length()     # Hillis-Steele steps

    def kernel(g_ref, r_ref, *rest):
        if has_row0:
            g0_ref, o_ref = rest
            g0 = g0_ref[:]                    # [TB, Gp] row-0 plane (CS)
        else:
            (o_ref,) = rest
        g = g_ref[:]                          # [TB, Gp]
        r = r_ref[:]                          # [TB, Rp]
        tilt = ae * jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)

        # static row unroll: Mosaic (via the tunnel toolchain) rejects
        # dynamic lane-offset slices inside fori_loop, and R is a
        # trace-time constant anyway
        H = jnp.zeros(g.shape, jnp.int32)
        Bg = jnp.full(g.shape, NEG_INF, jnp.int32)
        best = jnp.zeros(g.shape, jnp.int32)
        for i in range(R):
            rc = r[:, i:i + 1]                # [TB, 1] read char
            gplane = g0 if (has_row0 and i == 0) else g
            ms = jnp.where(gplane == rc, m, x_)
            Hdiag = _shift_right(H, 1, 0) + ms
            Bg_n = jnp.maximum(H - boe, Bg - be)
            H0 = jnp.maximum(jnp.maximum(Hdiag, 0), Bg_n)
            # A[j] = max_{k<j}(H0[k] + ae*k) - aoe - ae*(j-1): tilted scan
            t = H0 + tilt
            for p in range(n_scan):
                t = jnp.maximum(t, _shift_right(t, 1 << p, NEG_INF))
            A = _shift_right(t, 1, NEG_INF) - aoe - (tilt - ae)
            H_n = jnp.maximum(H0, A)
            # pad read rows contribute nothing
            is_pad = rc == READ_PAD
            H = jnp.where(is_pad, H, H_n)
            Bg = jnp.where(is_pad, Bg, Bg_n)
            best = jnp.maximum(best, H)
        o_ref[:] = jnp.broadcast_to(jnp.max(best, axis=1, keepdims=True),
                                    o_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def sw_score_batch_pallas(genome: jax.Array, read: jax.Array,
                          params: SWParams = SWParams(),
                          genome_row0: jax.Array | None = None,
                          interpret: bool = False) -> jax.Array:
    """Local affine SW scores, Pallas edition.

    genome: int8/int32 [B, G] (pad GENOME_PAD); read: int8/int32 [B, R]
    (pad READ_PAD).  genome_row0 (optional [B, G]) is the colour-space
    row-0 plane (`sw-vector.c:111-147`): read row 0 matches against it
    instead of `genome`.  Returns int32 [B]."""
    genome = genome.astype(jnp.int32)
    read = read.astype(jnp.int32)
    B, G = genome.shape
    _, R = read.shape
    Bp = _round_up(max(B, 1), _TB)
    Gp = _round_up(max(G, 1), _LANE)
    Rp = _round_up(max(R, 1), _LANE)
    genome = jnp.pad(genome, ((0, Bp - B), (0, Gp - G)),
                     constant_values=GENOME_PAD)
    read = jnp.pad(read, ((0, Bp - B), (0, Rp - R)),
                   constant_values=READ_PAD)
    operands = [genome, read]
    if genome_row0 is not None:
        operands.append(jnp.pad(genome_row0.astype(jnp.int32),
                                ((0, Bp - B), (0, Gp - G)),
                                constant_values=GENOME_PAD))

    kernel = _make_kernel(R, Gp, params, has_row0=genome_row0 is not None)
    gspec = pl.BlockSpec((_TB, Gp), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)
    in_specs = [gspec,
                pl.BlockSpec((_TB, Rp), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)]
    if genome_row0 is not None:
        in_specs.append(gspec)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // _TB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_TB, _LANE), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, _LANE), jnp.int32),
        interpret=interpret,
    )(*operands)
    return out[:B, 0]
