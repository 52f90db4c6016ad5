"""Deterministic colour-space paired-read generator (seed 8765).

Emits two corpora from the golden genome:
  * pairs_cs_opp-in.fq — opposing strands, inward-facing (Illumina-style)
  * pairs_cs_col-fw.fq — colinear forward (SOLiD mate-pair F3/R3-style)
Each mate is SNP/colour-noise mutated and CS-encoded (T primer + colours)
with PHRED+33 per-colour qualities.
"""
import random
import sys

out_dir = sys.argv[1] if len(sys.argv) > 1 else "."
bases = "ACGT"
CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def read_genome(path):
    seqs = {}
    name = None
    for line in open(path):
        line = line.strip()
        if line.startswith(">"):
            name = line[1:].split()[0]
            seqs[name] = []
        else:
            seqs[name].append(line)
    return {k: "".join(v) for k, v in seqs.items()}


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def to_cs(letters, primer="T"):
    out = [primer]
    last = CODE[primer]
    for ch in letters:
        c = CODE[ch] ^ last
        out.append(str(c))
        last = CODE[ch]
    return "".join(out)


def mutate(s, rng):
    r = list(s)
    if rng.random() < 0.5:
        for _ in range(rng.randint(1, 2)):
            q = rng.randrange(len(r))
            r[q] = rng.choice([b for b in bases if b != r[q]])
    return "".join(r)


def encode(s, rng):
    cs = list(to_cs(s))
    for j in range(1, len(cs)):
        if rng.random() < 0.02:
            cs[j] = rng.choice("0123")
    cs = "".join(cs)
    qual = "".join(chr(33 + rng.randint(15, 40)) for _ in range(len(cs) - 1))
    return cs, qual


g = read_genome(f"{out_dir}/golden_genome.fa")
g1, g2 = g["chrA"], g["chrB"]

for mode in ("opp-in", "col-fw"):
    rng = random.Random(8765)
    pairs = []
    for i in range(100):
        src = g1 if rng.random() < 0.6 else g2
        L = 35
        insert = rng.randint(150, 260)
        p = rng.randrange(0, len(src) - insert)
        frag = src[p:p + insert]
        m1 = frag[:L]
        if mode == "opp-in":
            m2 = revcomp(frag[-L:])
        else:  # col-fw: both forward, mate2 downstream
            m2 = frag[-L:]
        m1, m2 = mutate(m1, rng), mutate(m2, rng)
        pairs.append((encode(m1, rng), encode(m2, rng)))
    with open(f"{out_dir}/pairs_cs_{mode}.fq", "w") as f:
        for i, ((s1, q1), (s2, q2)) in enumerate(pairs):
            f.write(f"@cspair{i:03d}:1\n{s1}\n+\n{q1}\n")
            f.write(f"@cspair{i:03d}:2\n{s2}\n+\n{q2}\n")
