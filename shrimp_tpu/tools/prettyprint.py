"""prettyprint — re-align legacy hits and render pretty blocks
(prettyprint/prettyprint.c).

For each legacy record, re-runs the full Smith-Waterman (local, unbanded,
threshold = the recorded score) of the read against the recorded contig
range and prints the record line followed by the G/match/R (or G/|/T/R in
colour space) alignment block.

Usage:
    python -m shrimp_tpu.tools.prettyprint [--mode ls|cs] [-m/-i/-g/-q/-e/-f/-x N]
        [-R] [-T] shrimp_output_file genome_file reads_file
"""

from __future__ import annotations

import getopt
import sys

import numpy as np


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)
    prog = argv[0] if argv else "prettyprint"
    mode = "cs" if prog.endswith("-cs") else "ls"
    try:
        opts, args = getopt.gnu_getopt(argv[1:], "m:i:g:q:e:f:x:RT",
                                       ["mode="])
    except getopt.GetoptError as exc:
        sys.stderr.write(f"error: {exc}\n")
        return 1
    updates = {}
    rflag = False
    tflag = False
    for o, a in opts:
        if o == "--mode":
            mode = a
        elif o == "-m":
            updates["match"] = int(a)
        elif o == "-i":
            updates["mismatch"] = int(a)
        elif o == "-g":
            updates["a_gap_open"] = int(a)
        elif o == "-q":
            updates["b_gap_open"] = int(a)
        elif o == "-e":
            updates["a_gap_extend"] = int(a)
        elif o == "-f":
            updates["b_gap_extend"] = int(a)
        elif o == "-x":
            updates["crossover"] = int(a)
        elif o == "-R":
            rflag = True
        elif o == "-T":
            tflag = True
    if len(args) < 3:
        sys.stderr.write("usage: prettyprint [parameters] [options] "
                         "shrimp_output_file genome_file reads_file\n")
        return 1
    out_file, genome_file, reads_file = args[0], args[1], args[2]

    from shrimp_tpu import dna
    from shrimp_tpu.io import fastx, legacy
    from shrimp_tpu.ops import sw_full, sw_full_cs
    from shrimp_tpu.ops.params import SWParams
    from shrimp_tpu.ops.sw_vector import GENOME_PAD, READ_PAD
    from shrimp_tpu.pipeline.candidates import cs_read_ls4

    colour = mode == "cs"
    params = (SWParams.colour_space() if colour
              else SWParams.letter_space()).with_(**updates)

    contigs = {}
    for c in fastx.iter_contigs(genome_file):
        rc = dna.reverse_complement(c.codes)
        contigs[c.name] = (c.codes, rc)

    reads = {}
    for rec in fastx.iter_reads(reads_file):
        reads[rec.name] = rec.seq

    out = sys.stdout
    records = list(legacy.iter_records(out_file))
    seen_probs = any(not isinstance(r, str) and r.normodds is not None
                     for r in records)
    out.write(legacy.format_line(rflag)
              + (" normodds pgenome pchance" if seen_probs else "") + "\n")

    for rec in records:
        if isinstance(rec, str):
            continue
        if rec.contig not in contigs or rec.read not in reads:
            sys.stderr.write(f"warning: could not align read [{rec.read}] "
                             f"to contig [{rec.contig}] - missing data!\n")
            continue
        fw, rc = contigs[rec.contig]
        plane = rc if rec.revcmpl else fw
        clen = len(fw)
        gstart = rec.genome_start - 1
        glen = rec.genome_end - rec.genome_start + 1
        if rec.revcmpl:
            gstart = clen - (rec.genome_end - 1) - 1
        window = plane[gstart:gstart + glen]

        seq = reads[rec.read]
        revtie = np.array([rec.revcmpl and tflag])
        Gp = max(len(window), 8)
        gb = np.full((1, Gp), GENOME_PAD, np.int8)
        gb[0, :len(window)] = window

        if colour:
            initbp = int(dna.CHAR_TO_CODE[ord(seq[0])])
            colours = dna.encode(seq[1:])
            rlen = len(colours)
            qr4 = cs_read_ls4(colours, initbp)[None, :, :]
            xover = np.full((1, rlen), params.crossover, np.int32)
            stats, ops = sw_full_cs.sw_full_cs_and_traceback_jax(
                gb, qr4, xover, revtie, params, True, 0)
            stats = np.asarray(stats)[0]
            ops_row = np.asarray(ops)[0][:stats[9]]
            score = int(stats[0])
            dbal, qral = sw_full_cs.render_alignment_cs(
                ops_row, gb[0], qr4[0], int(stats[2]), int(stats[1]))
            read_len = rlen
            read_text = seq
        else:
            codes = dna.encode(seq)
            rlen = len(codes)
            rb = np.full((1, max(rlen, 8)), READ_PAD, np.int8)
            rb[0, :rlen] = codes
            stats, ops = sw_full.sw_full_and_traceback_jax(
                gb, rb, revtie, params, local_alignment=True)
            stats = np.asarray(stats)[0]
            ops_row = np.asarray(ops)[0][:stats[9]]
            score = int(stats[0])
            res = sw_full.SWAlignment(
                score=score, read_start=int(stats[1]),
                genome_start=int(stats[2]), ops=ops_row)
            sw_full.render_alignment(res, gb[0], rb[0])
            dbal, qral = res.dbalign, res.qralign
            read_len = rlen
            read_text = None

        if score != rec.score:
            sys.stderr.write(
                f"warning: score differs from input file "
                f"(read=\"{rec.read}\", genome=\"{rec.contig}\")\n")

        genome_start0 = gstart + int(stats[2])
        line = legacy.output_normal(
            rec.read, rec.contig, genome_start0=genome_start0,
            gmapped=int(stats[8]), read_start0=int(stats[1]),
            rmapped=int(stats[7]), read_length=read_len, score=score,
            dbalign=dbal, qralign=qral, genome_len=clen,
            revcmpl=rec.revcmpl,
            read_seq=(seq if rflag else None))
        out.write(line)
        if rec.normodds is not None:
            out.write(f"\t{rec.normodds:e}")
        if rec.pgenome is not None:
            out.write(f"\t{rec.pgenome:e}")
        if rec.pchance is not None:
            out.write(f"\t{rec.pchance:e}")
        out.write("\n\n")
        out.write(legacy.output_pretty(
            genome_plane=plane, genome_len=clen,
            genome_start0=genome_start0, gmapped=int(stats[8]),
            read_start0=int(stats[1]), rmapped=int(stats[7]),
            read_len=read_len, dbalign=dbal, qralign=qral,
            revcmpl=rec.revcmpl, colour_space=colour,
            read_text_cs=read_text))
        out.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
