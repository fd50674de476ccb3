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
