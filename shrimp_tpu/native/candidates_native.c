/*
 * candidates_native — host-side L3 hot loops in C.
 *
 * The NumPy host path's region-count filter sorts all posting keys
 * (np.unique on ~millions of int64) per batch-strand; this replaces it
 * with a dense (read, region) uint16 visit table — O(n) scatter + O(n)
 * lookup, the same data structure the reference uses per read
 * (region_map, gmapper.h:284-295, mapping.c:475-780).
 *
 * Exposed C ABI (ctypes):
 *   region_has2_filter(rid, x, n, region_bits, region_overlap,
 *                      n_regions, n_reads, keep_out) -> 0 ok / -1 alloc
 *     rid: int32[n] (ascending per batch, not required)
 *     x:   int64[n] global positions
 *     keep_out: uint8[n]
 *
 *   expand_postings(lens int64[L], lo int64[L], total,
 *                   out_src int64[total]) -> rows written
 *     CSR expansion: out_src[k] = lo[seg(k)] + (k - start(seg(k))),
 *     replacing np.repeat + cumsum temporaries.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

long long region_has2_filter(const int32_t *rid, const int64_t *x,
                             long long n, int region_bits,
                             int region_overlap, long long n_regions,
                             long long n_reads, uint8_t *table,
                             uint8_t *keep_out)
{
    /* `table` is a caller-owned zeroed workspace (n_reads * n_regions
     * uint8, saturating at 255 — has-2 only needs >= 2); touched cells
     * are re-zeroed before returning so the buffer can be reused
     * without an O(table) clear per call. */
    long long i;
    int64_t mask = ((int64_t)1 << region_bits) - 1;
    for (i = 0; i < n; i++) {
        int64_t reg = x[i] >> region_bits;
        long long k = (long long)rid[i] * n_regions + reg;
        if (table[k] < 0xFF)
            table[k]++;
        if ((x[i] & mask) < region_overlap && reg > 0)
            if (table[k - 1] < 0xFF)
                table[k - 1]++;
    }
    for (i = 0; i < n; i++) {
        int64_t reg = x[i] >> region_bits;
        long long k = (long long)rid[i] * n_regions + reg;
        uint8_t ok = table[k] >= 2;
        if (!ok && (x[i] & mask) < region_overlap && reg > 0)
            ok = table[k - 1] >= 2;
        keep_out[i] = ok;
    }
    for (i = 0; i < n; i++) {         /* clear touched cells only */
        int64_t reg = x[i] >> region_bits;
        long long k = (long long)rid[i] * n_regions + reg;
        table[k] = 0;
        if ((x[i] & mask) < region_overlap && reg > 0)
            table[k - 1] = 0;
    }
    return 0;
}

long long expand_postings(const int64_t *lens, const int64_t *lo,
                          long long n_lists, int64_t *out_src,
                          int64_t *out_seg)
{
    long long i, k = 0;
    for (i = 0; i < n_lists; i++) {
        int64_t j, L = lens[i], base = lo[i];
        for (j = 0; j < L; j++) {
            out_seg[k] = i;
            out_src[k++] = base + j;
        }
    }
    return k;
}

/* Fused expansion: emits x (gathered positions), rid and y directly,
 * replacing three separate fancy-gather passes on the Python side.
 *   positions: uint32[]; rows/kcols: per-list metadata
 *   out_x int64[total], out_rid int32[total], out_y int32[total] */
long long expand_postings_fused(const int64_t *lens, const int64_t *lo,
                                const int32_t *rows, const int32_t *kcols,
                                const int64_t *minpos,
                                long long n_lists,
                                const uint32_t *positions,
                                int64_t *out_x, int32_t *out_rid,
                                int32_t *out_y)
{
    long long i, k = 0;
    for (i = 0; i < n_lists; i++) {
        int64_t j, L = lens[i], base = lo[i];
        int32_t r = rows[i];
        int32_t y = (int32_t)(kcols[i] + minpos[r]);
        for (j = 0; j < L; j++) {
            out_x[k] = (int64_t)positions[base + j];
            out_rid[k] = r;
            out_y[k] = y;
            k++;
        }
    }
    return k;
}

/* Pass-1 window-overlap suppression scan (read_pass1_per_strand,
 * gmapper/mapping.c:1303-1330): sequential per (read, strand) group in
 * hit-list order — a window is suppressed when it overlaps the last
 * window that cleared the threshold by more than window_overlap.
 *   order: int64[n] iteration order (lexsort by (rid, st));
 *   ovl:   int64 per-read abs_or_pct(window_overlap, window_len);
 *   wlen:  int64 per-read window length. */
void pass1_suppress(const int64_t *order, long long n,
                    const int32_t *rid, const int8_t *st,
                    const int32_t *cn, const int64_t *goff,
                    const int64_t *scores, const int64_t *thr,
                    const int64_t *ovl_r, const int64_t *wlen_r,
                    uint8_t *suppressed)
{
    long long i;
    int64_t lg = -1;
    int32_t prev_r = -1;
    int8_t prev_s = -1;
    for (i = 0; i < n; i++) {
        int64_t k = order[i];
        int32_t r = rid[k];
        int8_t s = st[k];
        if (r != prev_r || s != prev_s) {
            lg = -1;
            prev_r = r;
            prev_s = s;
        }
        if (lg >= 0 && cn[k] == cn[lg]
            && goff[k] + ovl_r[r] <= goff[lg] + wlen_r[r]) {
            suppressed[k] = 1;
            continue;
        }
        suppressed[k] = 0;
        if (scores[k] >= thr[k])
            lg = k;
    }
}
