/* Native CSR index builder kernels.
 *
 * The reference builds its genomemap with per-kmer realloc'd lists
 * (gmapper/genome.c:1098-1186); the array reformulation here is a
 * counting sort: count keys, prefix-sum into offsets, then scatter each
 * window start to its bucket cursor.  NumPy's stable argsort on 24-bit
 * keys is a mergesort (minutes at Gbp scale); these two linear passes
 * replace it.  OpenMP parallelises the key computation; counting and
 * placement stay sequential (they are memory-bound single passes).
 */

#include <stdint.h>
#include <string.h>

/* mapidx for every window start in [0, n): acc |= (codes[i+ones[k]]&3)<<2k
 * (kmer_to_mapidx_orig, gmapper/gmapper.h:348-366).  Invalid windows
 * (marked in valid[] == 0) get key 0xFFFFFFFF. */
void index_mapidx(const int8_t *codes, int64_t n, const int32_t *ones,
                  int32_t w, const uint8_t *valid, uint32_t *out)
{
    int64_t i;
#pragma omp parallel for schedule(static)
    for (i = 0; i < n; i++) {
        if (!valid[i]) { out[i] = 0xFFFFFFFFu; continue; }
        uint32_t acc = 0;
        for (int32_t k = 0; k < w; k++)
            acc |= ((uint32_t)(codes[i + ones[k]] & 3)) << (2 * k);
        out[i] = acc;
    }
}

/* 64-bit finalizer mix (same as index.py::_mix64) for -H hashed seeds. */
void index_mix64(uint32_t *keys, int64_t n, int32_t hash_bits,
                 const uint8_t *valid)
{
    int64_t i;
    uint64_t mask = (1ull << hash_bits) - 1;
#pragma omp parallel for schedule(static)
    for (i = 0; i < n; i++) {
        if (!valid[i]) continue;
        uint64_t h = keys[i];
        h ^= h >> 33; h *= 0xFF51AFD7ED558CCDull;
        h ^= h >> 33; h *= 0xC4CEB9FE1A85EC53ull;
        h ^= h >> 33;
        keys[i] = (uint32_t)(h & mask);
    }
}

/* Window validity in one rolling pass: no N (code 15) inside the window
 * and the window does not span a contig boundary (genome.c:1104-1127's
 * skip rules).  contig_ends[] are the global end offsets (cumulative). */
void index_valid(const int8_t *codes, int64_t L, int32_t span,
                 const int64_t *contig_ends, int32_t n_contigs,
                 uint8_t *valid)
{
    int64_t nN = 0, i, ci = 0;
    (void)n_contigs;
    for (i = 0; i < span && i < L; i++)
        nN += (codes[i] == 15);
    for (i = 0; i + span <= L; i++) {
        if (i)
            nN += (codes[i + span - 1] == 15) - (codes[i - 1] == 15);
        while (i >= contig_ends[ci])
            ci++;
        valid[i] = (nN == 0) && (i + span <= contig_ends[ci]);
    }
}

/* counts[key]++ for every valid window (keys 0xFFFFFFFF skipped). */
void index_count(const uint32_t *keys, int64_t n, int64_t *counts)
{
    for (int64_t i = 0; i < n; i++)
        if (keys[i] != 0xFFFFFFFFu)
            counts[keys[i]]++;
}

/* Scatter window starts into their CSR buckets in genome order.
 * cursor[] must be a copy of the exclusive prefix sum of counts; it is
 * consumed.  out[cursor[key]++] = i. */
void index_place(const uint32_t *keys, int64_t n, int64_t *cursor,
                 uint32_t *out)
{
    for (int64_t i = 0; i < n; i++) {
        uint32_t k = keys[i];
        if (k != 0xFFFFFFFFu)
            out[cursor[k]++] = (uint32_t)i;
    }
}
