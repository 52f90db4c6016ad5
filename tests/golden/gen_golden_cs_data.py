"""Deterministic colour-space golden read generator (seed 4321).

Simulates AB SOLiD-style reads from the golden genome: letter-space
fragments (SNPs / indels / junk, both strands) encoded as a T primer base
followed by colour digits, with per-colour PHRED+33 qualities.
"""
import random
import sys

out_dir = sys.argv[1] if len(sys.argv) > 1 else "."
random.seed(4321)
bases = "ACGT"


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


g = read_genome(f"{out_dir}/golden_genome.fa")
g1, g2 = g["chrA"], g["chrB"]


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def to_cs(letters, primer="T"):
    out = [primer]
    last = CODE[primer]
    for ch in letters:
        c = CODE[ch] ^ last
        out.append(str(c))
        last = CODE[ch]
    return "".join(out)


reads = []
for i in range(200):
    src = g1 if random.random() < 0.6 else g2
    L = random.choice([35, 50])
    p = random.randrange(0, len(src) - L)
    r = list(src[p:p + L])
    kind = random.random()
    if kind < 0.35:
        pass
    elif kind < 0.6:
        for _ in range(random.randint(1, 2)):
            q = random.randrange(L)
            r[q] = random.choice([b for b in bases if b != r[q]])
    elif kind < 0.75:
        q = random.randrange(5, L - 5)
        del r[q]
    elif kind < 0.85:
        q = random.randrange(5, L - 5)
        r.insert(q, random.choice(bases))
    elif kind < 0.95:
        q = random.randrange(L)
        r[q] = random.choice([b for b in bases if b != r[q]])
        q = random.randrange(5, len(r) - 5)
        del r[q]
    else:
        r = [random.choice(bases) for _ in range(L)]
    s = "".join(r)
    if random.random() < 0.5:
        s = revcomp(s)
    cs = to_cs(s)
    # sprinkle raw colour errors so crossovers appear
    cs_list = list(cs)
    for j in range(1, len(cs_list)):
        if random.random() < 0.02:
            cs_list[j] = random.choice("0123")
    cs = "".join(cs_list)
    qual = "".join(chr(33 + random.randint(15, 40))
                   for _ in range(len(cs) - 1))
    reads.append((cs, qual))

with open(f"{out_dir}/golden_reads_cs.fq", "w") as f:
    for i, (s, q) in enumerate(reads):
        f.write(f"@csread{i:03d}\n{s}\n+\n{q}\n")
