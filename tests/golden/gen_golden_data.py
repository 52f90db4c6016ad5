"""Deterministic golden genome + read generator (seed 1234)."""
import random
import sys

out_dir = sys.argv[1] if len(sys.argv) > 1 else "."
random.seed(1234)
bases = "ACGT"
g1 = "".join(random.choice(bases) for _ in range(30000))
g2 = "".join(random.choice(bases) for _ in range(20000))
with open(f"{out_dir}/golden_genome.fa", "w") as f:
    f.write(">chrA\n")
    for i in range(0, len(g1), 70):
        f.write(g1[i:i + 70] + "\n")
    f.write(">chrB\n")
    for i in range(0, len(g2), 70):
        f.write(g2[i:i + 70] + "\n")


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


reads = []
for i in range(200):
    src = g1 if random.random() < 0.6 else g2
    L = random.choice([36, 50])
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
    reads.append(s)
with open(f"{out_dir}/golden_reads.fq", "w") as f:
    for i, s in enumerate(reads):
        f.write(f"@read{i:03d}\n{s}\n+\n{'h' * len(s)}\n")
