/* Rolling-hash MinHash / Count-Min fingerprint kernel — the C twin of
 * kernels._fp_padded_flat (same math, same IEEE-f64 op order, same
 * Barrett reduction with the round-up reciprocal), compiled on first
 * use by sz_spark.native and called through ctypes.  The NumPy kernel
 * stays the reference implementation and the automatic fallback; the
 * pinned compiled-reference vectors (tests/test_fp_reference_vectors)
 * and the native-vs-NumPy differential test gate bit-exactness.
 *
 * Numerical contract (shared with the NumPy kernel and the reference's
 * floating_rolling_hasher, fingerprints/serial.hpp:467-593):
 *   state' = state*mult + (byte_in+1) + disc*(byte_out+1)   (< 2^53, exact)
 *   t      = floor(state' * inv_mod)        inv_mod = nextafter(1/mod, +inf)
 *   state' = state' - t*mod                 in (-mod, mod); add mod if < 0
 * Compile with -ffp-contract=off: an FMA contraction would change
 * results at the ulp level and break bit-exactness vs NumPy.
 * (-fno-trapping-math only relaxes FP-exception flags so floor()
 * vectorizes; values are unchanged.)
 *
 * Dims arrive PERMUTED width-contiguous (the caller's argsort(widths));
 * group g covers dims [group_off[g], group_off[g+1]) sharing width
 * group_w[g].  Output arrays are in the permuted dim order; the caller
 * scatters back.  Each width group is walked in fixed-size dim TILES
 * whose state/min/count live in registers across the whole position
 * loop (the variable-length inner-loop version spent half its time on
 * state loads/stores and loop control at 16-24 dims per group).
 */

#include <math.h>
#include <stdint.h>

#define SZFP_MAX_HASH 0xFFFFFFFFu

/* One dim-tile of compile-time size GS over one row: three branch-free
 * phases (prefix / boundary / rolling).  len >= w guaranteed. */
#define DEF_TILE(NAME, GS)                                                   \
    static void NAME(const uint8_t *restrict text, int64_t len, int64_t w,   \
                     const double *restrict mu, const double *restrict mo,   \
                     const double *restrict im, const double *restrict di,   \
                     int32_t with_counts, uint32_t *restrict h_out,          \
                     uint32_t *restrict c_out)                               \
    {                                                                        \
        double st[GS], mv[GS], ct[GS];                                       \
        for (int d = 0; d < GS; ++d) st[d] = 0.0;                            \
        for (int64_t p = 0; p + 1 < w; ++p) {                                \
            const double term = (double)text[p] + 1.0;                       \
            for (int d = 0; d < GS; ++d) {                                   \
                double s = st[d] * mu[d] + term;                             \
                double t = floor(s * im[d]);                                 \
                s -= t * mo[d];                                              \
                s += (s < 0.0) ? mo[d] : 0.0;                                \
                st[d] = s;                                                   \
            }                                                                \
        }                                                                    \
        {                                                                    \
            const double term = (double)text[w - 1] + 1.0;                   \
            for (int d = 0; d < GS; ++d) {                                   \
                double s = st[d] * mu[d] + term;                             \
                double t = floor(s * im[d]);                                 \
                s -= t * mo[d];                                              \
                s += (s < 0.0) ? mo[d] : 0.0;                                \
                st[d] = s;                                                   \
                mv[d] = s;                                                   \
                ct[d] = 1.0;                                                 \
            }                                                                \
        }                                                                    \
        if (with_counts) {                                                   \
            for (int64_t p = w; p < len; ++p) {                              \
                const double term = (double)text[p] + 1.0;                   \
                const double oldt = (double)text[p - w] + 1.0;               \
                for (int d = 0; d < GS; ++d) {                               \
                    double s = st[d] * mu[d] + term + di[d] * oldt;          \
                    double t = floor(s * im[d]);                             \
                    s -= t * mo[d];                                          \
                    s += (s < 0.0) ? mo[d] : 0.0;                            \
                    st[d] = s;                                               \
                    const double m = mv[d];                                  \
                    ct[d] = ct[d] * (s >= m ? 1.0 : 0.0)                     \
                            + (s <= m ? 1.0 : 0.0);                          \
                    mv[d] = (s < m) ? s : m;                                 \
                }                                                            \
            }                                                                \
        } else {                                                             \
            for (int64_t p = w; p < len; ++p) {                              \
                const double term = (double)text[p] + 1.0;                   \
                const double oldt = (double)text[p - w] + 1.0;               \
                for (int d = 0; d < GS; ++d) {                               \
                    double s = st[d] * mu[d] + term + di[d] * oldt;          \
                    double t = floor(s * im[d]);                             \
                    s -= t * mo[d];                                          \
                    s += (s < 0.0) ? mo[d] : 0.0;                            \
                    st[d] = s;                                               \
                    const double m = mv[d];                                  \
                    mv[d] = (s < m) ? s : m;                                 \
                }                                                            \
            }                                                                \
        }                                                                    \
        for (int d = 0; d < GS; ++d) {                                       \
            h_out[d] = (uint32_t)((uint64_t)mv[d] & (uint64_t)SZFP_MAX_HASH);\
            c_out[d] = with_counts ? (uint32_t)ct[d] : 0u;                   \
        }                                                                    \
    }

DEF_TILE(szfp_tile32, 32)
DEF_TILE(szfp_tile16, 16)
DEF_TILE(szfp_tile8, 8)
DEF_TILE(szfp_tile4, 4)
DEF_TILE(szfp_tile2, 2)
DEF_TILE(szfp_tile1, 1)

/* Two-row tile: same math over two independent rows in one position
 * loop.  The Barrett update is a ~30-cycle latency chain per position;
 * a single 16-dim tile keeps only 2 vector chains in flight and runs
 * latency-bound (measured 2x slower per dim than the 32-dim tile).
 * Interleaving two rows doubles the independent chains at identical
 * per-row op order — results are bit-identical to the one-row tile.
 * Rows may differ in length: the loop runs jointly to min(lenA, lenB),
 * then finishes each row alone (the caller orders rows by length so
 * the solo tail is short). */
#define SZFP_TILE2_STEP(stv, mvv, ctv, text_, p_)                            \
    {                                                                        \
        const double term = (double)text_[p_] + 1.0;                         \
        const double oldt = (double)text_[p_ - w] + 1.0;                     \
        for (int d = 0; d < GS; ++d) {                                       \
            double s = stv[d] * mu[d] + term + di[d] * oldt;                 \
            double t = floor(s * im[d]);                                     \
            s -= t * mo[d];                                                  \
            s += (s < 0.0) ? mo[d] : 0.0;                                    \
            stv[d] = s;                                                      \
            const double m = mvv[d];                                         \
            if (WITH_COUNTS)                                                 \
                ctv[d] = ctv[d] * (s >= m ? 1.0 : 0.0)                       \
                         + (s <= m ? 1.0 : 0.0);                             \
            mvv[d] = (s < m) ? s : m;                                        \
        }                                                                    \
    }

#define DEF_TILE2(NAME, GS_CONST, WITH_COUNTS_CONST)                         \
    static void NAME(const uint8_t *restrict ta, int64_t la,                 \
                     const uint8_t *restrict tb, int64_t lb, int64_t w,      \
                     const double *restrict mu, const double *restrict mo,   \
                     const double *restrict im, const double *restrict di,   \
                     uint32_t *restrict ha, uint32_t *restrict ca,           \
                     uint32_t *restrict hb, uint32_t *restrict cb)           \
    {                                                                        \
        enum { GS = GS_CONST, WITH_COUNTS = WITH_COUNTS_CONST };             \
        double sa[GS], ma_[GS], ca_[GS], sb[GS], mb_[GS], cb_[GS];           \
        for (int d = 0; d < GS; ++d) { sa[d] = 0.0; sb[d] = 0.0; }           \
        for (int64_t p = 0; p + 1 < w; ++p) {                                \
            const double terma = (double)ta[p] + 1.0;                        \
            const double termb = (double)tb[p] + 1.0;                        \
            for (int d = 0; d < GS; ++d) {                                   \
                double s = sa[d] * mu[d] + terma;                            \
                double t = floor(s * im[d]);                                 \
                s -= t * mo[d];                                              \
                s += (s < 0.0) ? mo[d] : 0.0;                                \
                sa[d] = s;                                                   \
            }                                                                \
            for (int d = 0; d < GS; ++d) {                                   \
                double s2 = sb[d] * mu[d] + termb;                           \
                double t2 = floor(s2 * im[d]);                               \
                s2 -= t2 * mo[d];                                            \
                s2 += (s2 < 0.0) ? mo[d] : 0.0;                              \
                sb[d] = s2;                                                  \
            }                                                                \
        }                                                                    \
        {                                                                    \
            const double terma = (double)ta[w - 1] + 1.0;                    \
            const double termb = (double)tb[w - 1] + 1.0;                    \
            for (int d = 0; d < GS; ++d) {                                   \
                double s = sa[d] * mu[d] + terma;                            \
                double t = floor(s * im[d]);                                 \
                s -= t * mo[d];                                              \
                s += (s < 0.0) ? mo[d] : 0.0;                                \
                sa[d] = s; ma_[d] = s; ca_[d] = 1.0;                         \
            }                                                                \
            for (int d = 0; d < GS; ++d) {                                   \
                double s2 = sb[d] * mu[d] + termb;                           \
                double t2 = floor(s2 * im[d]);                               \
                s2 -= t2 * mo[d];                                            \
                s2 += (s2 < 0.0) ? mo[d] : 0.0;                              \
                sb[d] = s2; mb_[d] = s2; cb_[d] = 1.0;                       \
            }                                                                \
        }                                                                    \
        const int64_t lmin = (la < lb) ? la : lb;                            \
        for (int64_t p = w; p < lmin; ++p) {                                 \
            const double terma = (double)ta[p] + 1.0;                        \
            const double oldta = (double)ta[p - w] + 1.0;                    \
            const double termb = (double)tb[p] + 1.0;                        \
            const double oldtb = (double)tb[p - w] + 1.0;                    \
            for (int d = 0; d < GS; ++d) {                                   \
                double s = sa[d] * mu[d] + terma + di[d] * oldta;            \
                double t = floor(s * im[d]);                                 \
                s -= t * mo[d];                                              \
                s += (s < 0.0) ? mo[d] : 0.0;                                \
                sa[d] = s;                                                   \
                const double m = ma_[d];                                     \
                if (WITH_COUNTS)                                             \
                    ca_[d] = ca_[d] * (s >= m ? 1.0 : 0.0)                   \
                             + (s <= m ? 1.0 : 0.0);                         \
                ma_[d] = (s < m) ? s : m;                                    \
            }                                                                \
            for (int d = 0; d < GS; ++d) {                                   \
                double s2 = sb[d] * mu[d] + termb + di[d] * oldtb;           \
                double t2 = floor(s2 * im[d]);                               \
                s2 -= t2 * mo[d];                                            \
                s2 += (s2 < 0.0) ? mo[d] : 0.0;                              \
                sb[d] = s2;                                                  \
                const double m2 = mb_[d];                                    \
                if (WITH_COUNTS)                                             \
                    cb_[d] = cb_[d] * (s2 >= m2 ? 1.0 : 0.0)                 \
                             + (s2 <= m2 ? 1.0 : 0.0);                       \
                mb_[d] = (s2 < m2) ? s2 : m2;                                \
            }                                                                \
        }                                                                    \
        for (int64_t p = lmin; p < la; ++p)                                  \
            SZFP_TILE2_STEP(sa, ma_, ca_, ta, p)                             \
        for (int64_t p = lmin; p < lb; ++p)                                  \
            SZFP_TILE2_STEP(sb, mb_, cb_, tb, p)                             \
        for (int d = 0; d < GS; ++d) {                                       \
            ha[d] = (uint32_t)((uint64_t)ma_[d] & (uint64_t)SZFP_MAX_HASH);  \
            ca[d] = WITH_COUNTS ? (uint32_t)ca_[d] : 0u;                     \
            hb[d] = (uint32_t)((uint64_t)mb_[d] & (uint64_t)SZFP_MAX_HASH);  \
            cb[d] = WITH_COUNTS ? (uint32_t)cb_[d] : 0u;                     \
        }                                                                    \
    }

DEF_TILE2(szfp_tile2x24c, 24, 1)
DEF_TILE2(szfp_tile2x24n, 24, 0)
DEF_TILE2(szfp_tile2x16c, 16, 1)
DEF_TILE2(szfp_tile2x16n, 16, 0)
DEF_TILE2(szfp_tile2x8c, 8, 1)
DEF_TILE2(szfp_tile2x8n, 8, 0)

void szfp_batch(
    const uint8_t *data,
    const int64_t *starts,
    const int64_t *lengths,
    int64_t n_rows,
    int64_t ndim,
    const double *mult,
    const double *mod,
    const double *inv_mod,
    const double *disc,
    const int64_t *group_off, /* [n_groups+1] */
    const int64_t *group_w,   /* [n_groups]   */
    int64_t n_groups,
    int32_t with_counts,
    uint32_t *hashes, /* [n_rows*ndim] permuted dim order */
    uint32_t *counts) /* [n_rows*ndim] */
{
    for (int64_t i = 0; i < n_rows; i += 2) {
        const int paired = (i + 1 < n_rows);
        const uint8_t *ta = data + starts[i];
        const int64_t la = lengths[i];
        uint32_t *ha = hashes + i * ndim;
        uint32_t *ca = counts + i * ndim;
        const uint8_t *tb = paired ? data + starts[i + 1] : ta;
        const int64_t lb = paired ? lengths[i + 1] : 0;
        uint32_t *hb = paired ? hashes + (i + 1) * ndim : ha;
        uint32_t *cb = paired ? counts + (i + 1) * ndim : ca;

        for (int64_t g = 0; g < n_groups; ++g) {
            const int64_t d0 = group_off[g];
            const int64_t w = group_w[g];
            const int64_t G0 = group_off[g + 1] - d0;
            const int a_ok = la >= w, b_ok = paired && lb >= w;
            if (!a_ok)
                for (int64_t d = 0; d < G0; ++d) {
                    ha[d0 + d] = SZFP_MAX_HASH;
                    ca[d0 + d] = 0u;
                }
            if (paired && !b_ok)
                for (int64_t d = 0; d < G0; ++d) {
                    hb[d0 + d] = SZFP_MAX_HASH;
                    cb[d0 + d] = 0u;
                }
            int64_t d = d0, G = G0;
            if (G == 24 && a_ok && b_ok) { /* common: ndim 96 / 4 widths */
                if (with_counts)
                    szfp_tile2x24c(ta, la, tb, lb, w, mult + d, mod + d,
                                   inv_mod + d, disc + d,
                                   ha + d, ca + d, hb + d, cb + d);
                else
                    szfp_tile2x24n(ta, la, tb, lb, w, mult + d, mod + d,
                                   inv_mod + d, disc + d,
                                   ha + d, ca + d, hb + d, cb + d);
                continue;
            }
            while (G >= 16) {
                if (a_ok && b_ok) { /* paired 16-tile: 4 chains, best measured */
                    if (with_counts)
                        szfp_tile2x16c(ta, la, tb, lb, w, mult + d, mod + d,
                                       inv_mod + d, disc + d,
                                       ha + d, ca + d, hb + d, cb + d);
                    else
                        szfp_tile2x16n(ta, la, tb, lb, w, mult + d, mod + d,
                                       inv_mod + d, disc + d,
                                       ha + d, ca + d, hb + d, cb + d);
                    d += 16; G -= 16;
                    continue;
                }
                if (G >= 32) { /* unpaired: 32-dim tile keeps 4 chains */
                    if (a_ok)
                        szfp_tile32(ta, la, w, mult + d, mod + d, inv_mod + d,
                                    disc + d, with_counts, ha + d, ca + d);
                    if (b_ok)
                        szfp_tile32(tb, lb, w, mult + d, mod + d, inv_mod + d,
                                    disc + d, with_counts, hb + d, cb + d);
                    d += 32; G -= 32;
                } else {
                    if (a_ok)
                        szfp_tile16(ta, la, w, mult + d, mod + d, inv_mod + d,
                                    disc + d, with_counts, ha + d, ca + d);
                    if (b_ok)
                        szfp_tile16(tb, lb, w, mult + d, mod + d, inv_mod + d,
                                    disc + d, with_counts, hb + d, cb + d);
                    d += 16; G -= 16;
                }
            }
            if (G >= 8) {
                if (a_ok && b_ok) {
                    if (with_counts)
                        szfp_tile2x8c(ta, la, tb, lb, w, mult + d, mod + d,
                                      inv_mod + d, disc + d,
                                      ha + d, ca + d, hb + d, cb + d);
                    else
                        szfp_tile2x8n(ta, la, tb, lb, w, mult + d, mod + d,
                                      inv_mod + d, disc + d,
                                      ha + d, ca + d, hb + d, cb + d);
                } else {
                    if (a_ok)
                        szfp_tile8(ta, la, w, mult + d, mod + d, inv_mod + d,
                                   disc + d, with_counts, ha + d, ca + d);
                    if (b_ok)
                        szfp_tile8(tb, lb, w, mult + d, mod + d, inv_mod + d,
                                   disc + d, with_counts, hb + d, cb + d);
                }
                d += 8; G -= 8;
            }
            while (G > 0) {
                const int64_t step = (G >= 4) ? 4 : (G >= 2) ? 2 : 1;
                void (*fn)(const uint8_t *restrict, int64_t, int64_t,
                           const double *restrict, const double *restrict,
                           const double *restrict, const double *restrict,
                           int32_t, uint32_t *restrict, uint32_t *restrict) =
                    (step == 4) ? szfp_tile4 : (step == 2) ? szfp_tile2
                                                           : szfp_tile1;
                if (a_ok)
                    fn(ta, la, w, mult + d, mod + d, inv_mod + d, disc + d,
                       with_counts, ha + d, ca + d);
                if (b_ok)
                    fn(tb, lb, w, mult + d, mod + d, inv_mod + d, disc + d,
                       with_counts, hb + d, cb + d);
                d += step; G -= step;
            }
        }
    }
}

/* ------------------------------------------------------------------ */
/* Banded bounded Levenshtein — the C twin of kernels._bounded_lev_chunk.
 * Contract (integer-exact, so any correct band DP is bit-identical):
 * out[i] = exact byte-level edit distance when it is <= k, else k+1.
 * The caller (kernels.bounded_lev_flat) keeps the feasibility and
 * equality fast paths; only feasible, non-equal pairs arrive here.
 *
 * Layout: pairs are processed in SoA chunks of SZLEV_M lanes; the band
 * runs serially over slots d (the insertion scan is a d-recurrence)
 * while every statement is a lane-loop gcc vectorizes (int16 x 32 =
 * one AVX-512 vector).  a-bytes are pre-transposed with a +k+1 pad so
 * the byte needed at (row i, slot d) is one contiguous lane vector. */

#include <stdlib.h>
#include <string.h>

#define SZLEV_M 32
#define SZLEV_BIG 16000

int64_t szlev_bounded_batch(
    const uint8_t *da, const int64_t *sa, const int64_t *la,
    const uint8_t *db, const int64_t *sb, const int64_t *lb,
    int64_t n_pairs, int64_t k, int64_t *out)
{
    const int64_t W = 2 * k + 1;
    if (W > 4000) return -1; /* int16 cells need k + W + slack < 32767 */
    for (int64_t c0 = 0; c0 < n_pairs; c0 += SZLEV_M) {
        const int64_t m = (n_pairs - c0 < SZLEV_M) ? n_pairs - c0 : SZLEV_M;
        int64_t max_la = 0, max_lb = 0;
        for (int64_t j = 0; j < m; ++j) {
            if (la[c0 + j] > max_la) max_la = la[c0 + j];
            if (lb[c0 + j] > max_lb) max_lb = lb[c0 + j];
        }
        /* transposed, padded byte planes.  aT is indexed by i + d with
         * i <= max_lb and d < W, so size it by max_lb (feasible pairs
         * keep |la - lb| <= k, but the CHUNK max can differ). */
        const int64_t arows = ((max_la > max_lb ? max_la : max_lb)) + W + 2;
        const int64_t brows = max_lb + 1;
        uint8_t *aT = (uint8_t *)calloc((size_t)(arows > 1 ? arows : 1) * SZLEV_M, 1);
        uint8_t *bT = (uint8_t *)calloc((size_t)(brows > 1 ? brows : 1) * SZLEV_M, 1);
        int16_t *cur = (int16_t *)malloc((size_t)W * SZLEV_M * sizeof(int16_t));
        int16_t *nxt = (int16_t *)malloc((size_t)W * SZLEV_M * sizeof(int16_t));
        int32_t lav[SZLEV_M]; /* int32: la may exceed the int16 sentinel */
        if (!aT || !bT || !cur || !nxt) {
            free(aT); free(bT); free(cur); free(nxt);
            return -1;
        }
        for (int64_t j = 0; j < m; ++j) {
            const uint8_t *ap = da + sa[c0 + j];
            for (int64_t p = 0; p < la[c0 + j]; ++p)
                aT[(p + k + 1) * SZLEV_M + j] = ap[p];
            const uint8_t *bp = db + sb[c0 + j];
            for (int64_t p = 0; p < lb[c0 + j]; ++p)
                bT[p * SZLEV_M + j] = bp[p];
            lav[j] = (int32_t)((la[c0 + j] < 2000000000) ? la[c0 + j]
                                                          : 2000000000);
        }
        for (int64_t j = m; j < SZLEV_M; ++j) lav[j] = 0;
        /* row 0: cur[d] = j0 = d - k when 0 <= j0 <= la else BIG */
        for (int64_t d = 0; d < W; ++d) {
            const int64_t j0 = d - k;
            for (int64_t j = 0; j < SZLEV_M; ++j)
                cur[d * SZLEV_M + j] =
                    (j0 >= 0 && (int32_t)j0 <= lav[j] && j0 < SZLEV_BIG)
                        ? (int16_t)j0
                        : (int16_t)SZLEV_BIG;
        }
        /* b-empty pairs never enter the row loop */
        for (int64_t j = 0; j < m; ++j)
            if (lb[c0 + j] == 0)
                out[c0 + j] = (la[c0 + j] < k + 1) ? la[c0 + j] : k + 1;
        for (int64_t i = 1; i <= max_lb; ++i) {
            const uint8_t *bch = bT + (i - 1) * SZLEV_M;
            int16_t eprev[SZLEV_M];
            for (int64_t j = 0; j < SZLEV_M; ++j) eprev[j] = SZLEV_BIG;
            for (int64_t d = 0; d < W; ++d) {
                const int64_t js = i + d - k; /* column index of this slot */
                int16_t *t_row = nxt + d * SZLEV_M;
                if (js < 1) {
                    if (js == 0 && i <= k) {
                        /* boundary column j == 0 at d = k - i */
                        for (int64_t j = 0; j < SZLEV_M; ++j) t_row[j] = (int16_t)i;
                        for (int64_t j = 0; j < SZLEV_M; ++j) {
                            int16_t e = (int16_t)(eprev[j] + 1);
                            int16_t t = t_row[j];
                            e = (t < e) ? t : e;
                            e = (e < SZLEV_BIG) ? e : SZLEV_BIG;
                            t_row[j] = e;
                            eprev[j] = e;
                        }
                    } else {
                        for (int64_t j = 0; j < SZLEV_M; ++j) {
                            t_row[j] = SZLEV_BIG;
                            /* eprev unchanged through an all-BIG slot is
                             * wrong: e-scan must still +1 per slot.  BIG
                             * saturation keeps it correct: */
                            int16_t e = (int16_t)(eprev[j] + 1);
                            e = (e < SZLEV_BIG) ? e : SZLEV_BIG;
                            eprev[j] = e;
                        }
                    }
                    continue;
                }
                const uint8_t *ach = aT + (i + d) * SZLEV_M;
                const int16_t *c_d = cur + d * SZLEV_M;
                const int16_t *c_d1 = (d + 1 < W) ? cur + (d + 1) * SZLEV_M : 0;
                const int32_t jsv = (int32_t)js;
                for (int64_t j = 0; j < SZLEV_M; ++j) {
                    int16_t sub = (int16_t)(c_d[j] + (ach[j] != bch[j]));
                    int16_t del = (int16_t)((c_d1 ? c_d1[j] : SZLEV_BIG) + 1);
                    int16_t t = (sub < del) ? sub : del;
                    t = (jsv <= lav[j]) ? t : (int16_t)SZLEV_BIG;
                    int16_t e = (int16_t)(eprev[j] + 1);
                    e = (t < e) ? t : e;
                    e = (e < SZLEV_BIG) ? e : SZLEV_BIG;
                    t_row[j] = e;
                    eprev[j] = e;
                }
            }
            int16_t *tmpp = cur; cur = nxt; nxt = tmpp;
            for (int64_t j = 0; j < m; ++j) {
                if (lb[c0 + j] == i) {
                    const int64_t d_final = la[c0 + j] - i + k;
                    int64_t v = k + 1;
                    if (d_final >= 0 && d_final < W) {
                        v = cur[d_final * SZLEV_M + j];
                        if (v > k) v = k + 1;
                    }
                    out[c0 + j] = v;
                }
            }
        }
        free(aT); free(bT); free(cur); free(nxt);
    }
    return 0;
}
