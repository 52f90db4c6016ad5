"""Multi-host runtime — the cluster axis (reference README:1246-1474).

The reference scales across machines with shell scripts: shard reads
(`splitreads.py`), run independent gmapper jobs, merge SAM files
(`mergesam`).  The TPU-native equivalent is a `jax.distributed` process
group: each host takes an interleaved block of the read stream, maps it
against its (whole or host-sharded) index, writes a rank-ordered output
file, and rank 0 concatenates in rank order — deterministic final SAM,
identical to the single-process run (tests/test_multihost.py runs 2
simulated processes).

Usage (one command per host):
    python -m shrimp_tpu.parallel.multihost \
        --coordinator host0:9999 --num-processes 4 --process-id $RANK \
        --out out.sam -- -Q reads.fq genome.fa

The mapping arguments after `--` are standard gmapper arguments.
"""

from __future__ import annotations

import os
import sys


def init_distributed(coordinator: str, num_processes: int,
                     process_id: int) -> None:
    """jax.distributed.initialize — DCN process group (collectives ride
    ICI within a host's slice, DCN across hosts)."""
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)


def host_read_blocks(reads_iter, num_processes: int, process_id: int,
                     block: int = 1000, paired: bool = False):
    """Deterministic host-sharded read intake: the stream is cut into
    `block`-read chunks dealt round-robin to hosts (the reference's
    splitreads.py dealing, paired-aware so mates stay together)."""
    if paired and block % 2:
        block += 1
    buf = []
    chunk_id = 0
    for rec in reads_iter:
        buf.append(rec)
        if len(buf) == block:
            if chunk_id % num_processes == process_id:
                yield from buf
            buf = []
            chunk_id += 1
    if buf and chunk_id % num_processes == process_id:
        yield from buf


def rank_output_path(out: str, process_id: int) -> str:
    return f"{out}.rank{process_id:05d}"


def concat_rank_outputs(out: str, num_processes: int,
                        reads_order=None) -> None:
    """Rank-0 final assembly.  With `reads_order` (the read-name stream),
    records are re-interleaved into original read order — the exact
    analogue of mergesam's reads-file-driven ordering
    (mergesam/fastx_readnames.c); without it, rank files are concatenated
    in rank order (block-deterministic)."""
    parts = [rank_output_path(out, p) for p in range(num_processes)]
    if reads_order is None:
        with open(out, "w") as fh:
            for p in parts:
                with open(p) as pf:
                    fh.write(pf.read())
        return
    # read-order interleave: index each rank file by QNAME
    by_name: dict[str, list[str]] = {}
    header: list[str] = []
    for p in parts:
        with open(p) as pf:
            for line in pf:
                line = line.rstrip("\n")
                if line.startswith("@"):
                    if p == parts[0]:
                        header.append(line)
                    continue
                by_name.setdefault(line.split("\t", 1)[0], []).append(line)
    with open(out, "w") as fh:
        for line in header:
            fh.write(line + "\n")
        for name in reads_order:
            for line in by_name.get(name, ()):
                fh.write(line + "\n")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    coordinator = "127.0.0.1:9357"
    num_processes = 1
    process_id = 0
    out = "out.sam"
    block = 1000
    genome_axis = False
    rest = []
    it = iter(range(len(argv)))
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--coordinator":
            coordinator = argv[i + 1]; i += 2
        elif a == "--num-processes":
            num_processes = int(argv[i + 1]); i += 2
        elif a == "--process-id":
            process_id = int(argv[i + 1]); i += 2
        elif a == "--out":
            out = argv[i + 1]; i += 2
        elif a == "--block":
            block = int(argv[i + 1]); i += 2
        elif a == "--genome-axis":
            genome_axis = True; i += 1
        elif a == "--":
            rest = argv[i + 1:]
            break
        else:
            sys.stderr.write(f"error: unknown multihost option {a}\n")
            return 1
        continue

    if num_processes > 1:
        init_distributed(coordinator, num_processes, process_id)

    if genome_axis:
        # the GENOME mesh axis spans the processes: each rank holds one
        # index shard and maps the FULL read stream; z statistics cross
        # DCN (parallel/genome_axis.py)
        from shrimp_tpu.parallel import genome_axis as ga
        return ga.run(rest, out, num_processes, process_id)

    # run gmapper over this host's read share: shard the reads file up
    # front into a rank-local temp file, then delegate to the standard CLI
    import tempfile

    from shrimp_tpu.io import fastx

    reads_path = None
    for tok in rest:
        if not tok.startswith("-") and os.path.exists(tok):
            reads_path = tok
            break
    if reads_path is None:
        sys.stderr.write("error: no reads file found in gmapper args\n")
        return 1
    fastq = fastx.detect_fastq(reads_path)
    paired = ("-p" in rest or "--pair-mode" in rest)
    fd, shard_path = tempfile.mkstemp(
        suffix=".fq" if fastq else ".fa")
    os.close(fd)
    recs = host_read_blocks(
        fastx.iter_reads(reads_path, fastq=fastq),
        num_processes, process_id, block=block, paired=paired)
    if fastq:
        fastx.write_fastq(shard_path, recs)
    else:
        fastx.write_fasta(shard_path, list(recs))

    rank_out = rank_output_path(out, process_id)
    gm_args = ["gmapper" if True else ""] + [
        shard_path if t == reads_path else t for t in rest]
    from shrimp_tpu import gmapper
    with open(rank_out, "w") as fh:
        old = sys.stdout
        sys.stdout = fh
        try:
            rc = gmapper.main(gm_args)
        finally:
            sys.stdout = old
    os.unlink(shard_path)
    if rc != 0:
        return rc

    # completion marker + rank-0 assembly.  The barrier is file-based on
    # the shared filesystem (the reference's cluster assumption); the
    # jax.distributed process group above serves device collectives.
    # EVERY rank waits for all markers (not just rank 0): exiting early
    # would start the jax.distributed shutdown barrier while slower
    # ranks still map, tripping its timeout under heavy rank skew.
    with open(rank_out + ".done", "w") as fh:
        fh.write("ok\n")
    import time as _time
    deadline = _time.time() + 3600
    while _time.time() < deadline:
        if all(os.path.exists(rank_output_path(out, p) + ".done")
               for p in range(num_processes)):
            break
        _time.sleep(0.2)
    if process_id == 0:
        names = [r.name for r in fastx.iter_reads(reads_path, fastq=fastq)]
        if paired:
            # paired SAM lines carry the common-prefix-trimmed qname —
            # order by the same key the emitter used
            from shrimp_tpu.pipeline.paired import common_qname
            names = [common_qname(names[i], names[i + 1])
                     for i in range(0, len(names) - 1, 2)]
        concat_rank_outputs(out, num_processes, reads_order=names)
    return 0


if __name__ == "__main__":
    sys.exit(main())
