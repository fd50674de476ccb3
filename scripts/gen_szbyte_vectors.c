/* Ground-truth vector generator for the SS2.2 scalar byte kernels:
 * compiles the PUBLIC reference serial kernels (read-only checkout)
 * and prints JSON test vectors for
 *   sz_find_serial / sz_rfind_serial          (find.h:160-163)
 *   sz_find_byteset_serial / sz_rfind_byteset_serial (find.h:293-295)
 *   sz_lookup_serial (256-byte LUT translate)  (memory.h:162)
 *   sz_bytesum_serial                          (hash.h:303)
 *   sz_equal_serial / sz_order_serial          (compare.h:91-93)
 * Used ONLY to freeze vectors for the repo's own pytest suite; no
 * reference code is copied into the repo.
 *
 * Build + run:
 *   gcc -O2 -I/root/reference/include -o /tmp/gen_szbyte \
 *       scripts/gen_szbyte_vectors.c
 *   /tmp/gen_szbyte > tests/data/szbyte_vectors.json
 */
#include <stdio.h>
#include <string.h>
#include <stringzilla/types.h>
#include <stringzilla/find.h>
#include <stringzilla/compare.h>
#include <stringzilla/memory.h>
#include <stringzilla/hash.h>

/* deterministic corpus: splitmix64-driven bytes (same PRNG family as
 * gen_szhash_vectors.c so corpora are reproducible without Python) */
static unsigned long long sm_state;
static unsigned long long sm_next(void) {
    unsigned long long z = (sm_state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
}

static void print_hex(unsigned char const *buf, int len) {
    printf("\"");
    for (int i = 0; i < len; ++i) printf("%02x", buf[i]);
    printf("\"");
}

#define MAX_LEN 1100
static unsigned char hay[MAX_LEN];

/* alphabets: tiny (forces overlaps), vowel-ish ASCII, full byte range */
static char const *alpha_ab = "ab";
static char const *alpha_abc = "abc";
static char const *alpha_txt = "aeiou xyzBCD.,";
static void fill_hay(int len, int alpha_id, unsigned long long seed) {
    sm_state = seed;
    char const *alpha = alpha_id == 0 ? alpha_ab : alpha_id == 1 ? alpha_abc : alpha_id == 2 ? alpha_txt : NULL;
    int alen = alpha ? (int)strlen(alpha) : 0;
    for (int i = 0; i < len; ++i) {
        unsigned long long r = sm_next();
        hay[i] = alpha ? (unsigned char)alpha[r % (unsigned)alen] : (unsigned char)(r & 0xFF);
    }
}

static int first_case = 1;
static void sep(void) {
    if (!first_case) printf(",\n");
    first_case = 0;
}

/* one find/rfind case: offsets are -1 when absent */
static void emit_find_case(unsigned char const *h, int hl, unsigned char const *n, int nl) {
    sz_cptr_t f = sz_find_serial((sz_cptr_t)h, (sz_size_t)hl, (sz_cptr_t)n, (sz_size_t)nl);
    sz_cptr_t r = sz_rfind_serial((sz_cptr_t)h, (sz_size_t)hl, (sz_cptr_t)n, (sz_size_t)nl);
    sep();
    printf("    {\"h\": ");
    print_hex(h, hl);
    printf(", \"n\": ");
    print_hex(n, nl);
    printf(", \"find\": %lld, \"rfind\": %lld}",
           f ? (long long)(f - (sz_cptr_t)h) : -1ll,
           r ? (long long)(r - (sz_cptr_t)h) : -1ll);
}

static void emit_byteset_case(unsigned char const *h, int hl, char const *set_chars) {
    sz_byteset_t set, inv;
    sz_byteset_init(&set);
    for (char const *p = set_chars; *p; ++p) sz_byteset_add(&set, *p);
    inv = set;
    sz_byteset_invert(&inv);
    sz_cptr_t fo = sz_find_byteset_serial((sz_cptr_t)h, (sz_size_t)hl, &set);
    sz_cptr_t lo = sz_rfind_byteset_serial((sz_cptr_t)h, (sz_size_t)hl, &set);
    sz_cptr_t fn = sz_find_byteset_serial((sz_cptr_t)h, (sz_size_t)hl, &inv);
    sz_cptr_t ln = sz_rfind_byteset_serial((sz_cptr_t)h, (sz_size_t)hl, &inv);
    sep();
    printf("    {\"h\": ");
    print_hex(h, hl);
    printf(", \"set\": \"%s\", \"first_of\": %lld, \"last_of\": %lld, \"first_not\": %lld, \"last_not\": %lld}",
           set_chars,
           fo ? (long long)(fo - (sz_cptr_t)h) : -1ll, lo ? (long long)(lo - (sz_cptr_t)h) : -1ll,
           fn ? (long long)(fn - (sz_cptr_t)h) : -1ll, ln ? (long long)(ln - (sz_cptr_t)h) : -1ll);
}

int main(void) {
    int lengths[] = {0, 1, 2, 3, 7, 8, 9, 15, 16, 17, 31, 32, 33,
                     63, 64, 65, 127, 128, 129, 255, 256, 300, 1024};
    int n_lengths = (int)(sizeof(lengths) / sizeof(lengths[0]));

    /* ---------------- find / rfind ---------------- */
    printf("{\n  \"find\": [\n");
    first_case = 1;
    /* curated: overlap ladders, needle==haystack, absent, boundaries */
    {
        unsigned char const *h = (unsigned char const *)"aaaaaa";
        emit_find_case(h, 6, (unsigned char const *)"aa", 2);
        emit_find_case(h, 6, (unsigned char const *)"aaa", 3);
        emit_find_case(h, 6, (unsigned char const *)"aaaaaa", 6);
        emit_find_case(h, 6, (unsigned char const *)"aaaaaaa", 7); /* longer than hay */
        emit_find_case(h, 6, (unsigned char const *)"b", 1);
        emit_find_case(h, 0, (unsigned char const *)"a", 1); /* empty haystack */
    }
    {
        unsigned char const *h = (unsigned char const *)"tablecloth on the table, tablet";
        emit_find_case(h, 31, (unsigned char const *)"table", 5);
        emit_find_case(h, 31, (unsigned char const *)"t", 1);
        emit_find_case(h, 31, (unsigned char const *)"tablet", 6);
        emit_find_case(h, 31, (unsigned char const *)", ", 2);
        emit_find_case(h, 31, (unsigned char const *)"zebra", 5);
    }
    /* binary bytes incl. NUL and 0xFF */
    {
        unsigned char h[9] = {0x00, 0xFF, 0x00, 0x41, 0x00, 0xFF, 0xFE, 0x00, 0x41};
        unsigned char n1[2] = {0x00, 0xFF};
        unsigned char n2[2] = {0x00, 0x41};
        unsigned char n3[1] = {0xFE};
        emit_find_case(h, 9, n1, 2);
        emit_find_case(h, 9, n2, 2);
        emit_find_case(h, 9, n3, 1);
    }
    /* fuzz: every (alphabet, length); needles sliced from the haystack
     * (guaranteed hits at varied offsets) + one absent needle */
    for (int ai = 0; ai < 4; ++ai) {
        for (int li = 0; li < n_lengths; ++li) {
            int len = lengths[li];
            fill_hay(len, ai, 0xBEEF0000ull + (unsigned long long)(ai * 1000 + len));
            if (len >= 2) {
                int nl = len < 5 ? 1 : (len % 7) + 1;
                int off = (len - nl) / 2;
                emit_find_case(hay, len, hay + off, nl);          /* interior hit */
                emit_find_case(hay, len, hay, nl < len ? nl : len); /* prefix hit */
                emit_find_case(hay, len, hay + len - nl, nl);     /* suffix hit */
            }
            {
                unsigned char absent[3] = {0x7F, 0x01, 0x7F}; /* not in any alphabet */
                emit_find_case(hay, len, absent, 3);
            }
            /* long needles: every serial specialization tier — exact
             * 1..4-byte scans, Boyer-Moore-Horspool (<=256), and the
             * beyond-256 path (find/serial.h:446-488) */
            {
                int long_nls[] = {8, 9, 15, 16, 17, 31, 33, 64, 65, 100, 255, 256, 257, 300};
                for (unsigned k = 0; k < sizeof(long_nls) / sizeof(long_nls[0]); ++k) {
                    int nl = long_nls[k];
                    if (nl > len) continue;
                    int off = (len - nl) % 13;
                    emit_find_case(hay, len, hay + off, nl); /* guaranteed hit */
                    if (nl <= len - 1) {
                        /* near-miss: last byte corrupted (forces full-walk
                         * rejections through the shift table) */
                        static unsigned char miss[1100];
                        memcpy(miss, hay + off, (size_t)nl);
                        miss[nl - 1] ^= 0x55;
                        emit_find_case(hay, len, miss, nl);
                    }
                }
            }
        }
    }
    printf("\n  ],\n");

    /* ---------------- byteset ---------------- */
    printf("  \"byteset\": [\n");
    first_case = 1;
    emit_byteset_case((unsigned char const *)"", 0, "aeiou");
    emit_byteset_case((unsigned char const *)"aeiou", 5, "aeiou");
    emit_byteset_case((unsigned char const *)"xyz", 3, "aeiou");
    emit_byteset_case((unsigned char const *)"the quick brown fox", 19, "aeiou");
    for (int ai = 0; ai < 4; ++ai)
        for (int li = 0; li < n_lengths; ++li) {
            int len = lengths[li];
            fill_hay(len, ai, 0xCAFE0000ull + (unsigned long long)(ai * 1000 + len));
            emit_byteset_case(hay, len, "aeiou");
            emit_byteset_case(hay, len, "ab.,");
        }
    printf("\n  ],\n");

    /* ---------------- lookup (translate) + bytesum ---------------- */
    printf("  \"lookup\": [\n");
    first_case = 1;
    {
        unsigned char lut_rev[256], lut_upper[256], lut_vowel[256];
        for (int i = 0; i < 256; ++i) {
            lut_rev[i] = (unsigned char)(255 - i);
            lut_upper[i] = (i >= 'a' && i <= 'z') ? (unsigned char)(i - 32) : (unsigned char)i;
            lut_vowel[i] = (i == 'a' || i == 'e' || i == 'i' || i == 'o' || i == 'u')
                               ? (unsigned char)'*'
                               : (unsigned char)i;
        }
        unsigned char out[MAX_LEN];
        unsigned char const *luts[3] = {lut_rev, lut_upper, lut_vowel};
        char const *lut_names[3] = {"rev", "upper", "vowel"};
        for (int ai = 0; ai < 4; ++ai)
            for (int li = 0; li < n_lengths; ++li) {
                int len = lengths[li];
                if (len > 300) continue; /* keep the JSON small; 1024 covered by bytesum */
                fill_hay(len, ai, 0xF00D0000ull + (unsigned long long)(ai * 1000 + len));
                int lk = (ai + li) % 3;
                sz_lookup_serial((sz_ptr_t)out, (sz_size_t)len, (sz_cptr_t)hay, (sz_cptr_t)luts[lk]);
                sep();
                printf("    {\"h\": ");
                print_hex(hay, len);
                printf(", \"lut\": \"%s\", \"out\": ", lut_names[lk]);
                print_hex(out, len);
                printf("}");
            }
    }
    printf("\n  ],\n");

    printf("  \"bytesum\": [\n");
    first_case = 1;
    for (int ai = 0; ai < 4; ++ai)
        for (int li = 0; li < n_lengths; ++li) {
            int len = lengths[li];
            fill_hay(len, ai, 0xABBA0000ull + (unsigned long long)(ai * 1000 + len));
            unsigned long long s = sz_bytesum_serial((sz_cptr_t)hay, (sz_size_t)len);
            sep();
            printf("    {\"h\": ");
            print_hex(hay, len);
            printf(", \"sum\": %llu}", s);
        }
    printf("\n  ],\n");

    /* ---------------- sha256 (incremental, chunked) ---------------- */
    printf("  \"sha256\": [\n");
    first_case = 1;
    for (int li = 0; li < n_lengths; ++li) {
        int len = lengths[li];
        fill_hay(len, 3, 0x5AA50000ull + (unsigned long long)len);
        /* three chunking patterns must agree: one-shot, 1-byte drip,
         * and irregular 7/64/rest splits */
        int patterns[3][4] = {{len, 0, 0, 0}, {-1, 0, 0, 0}, {7, 64, len, 0}};
        for (int pi = 0; pi < 3; ++pi) {
            sz_sha256_state_t st;
            sz_sha256_state_init_serial(&st);
            if (patterns[pi][0] == -1) {
                for (int i = 0; i < len; ++i) sz_sha256_state_update_serial(&st, (sz_cptr_t)hay + i, 1);
            }
            else {
                int done = 0;
                for (int ci = 0; ci < 4 && done < len; ++ci) {
                    int take = patterns[pi][ci];
                    if (take <= 0 || take > len - done) take = len - done;
                    sz_sha256_state_update_serial(&st, (sz_cptr_t)hay + done, (sz_size_t)take);
                    done += take;
                }
            }
            sz_u8_t digest[32];
            sz_sha256_state_digest_serial(&st, digest);
            sep();
            printf("    {\"h\": ");
            print_hex(hay, len);
            printf(", \"chunks\": %d, \"digest\": ", pi);
            print_hex(digest, 32);
            printf("}");
        }
    }
    printf("\n  ],\n");

    /* ---------------- equal / order ---------------- */
    printf("  \"order\": [\n");
    first_case = 1;
    {
        /* curated: equal, prefix-of, divergent at head/mid/tail, empty */
        struct {
            char const *a;
            char const *b;
        } pairs[] = {
            {"", ""},           {"", "a"},         {"a", ""},        {"abc", "abc"},
            {"abc", "abcd"},    {"abcd", "abc"},   {"abc", "abd"},   {"zbc", "abc"},
            {"aaaaaaaaaaaaaaaa", "aaaaaaaaaaaaaaab"}, {"Table", "table"},
        };
        for (unsigned i = 0; i < sizeof(pairs) / sizeof(pairs[0]); ++i) {
            int al = (int)strlen(pairs[i].a), bl = (int)strlen(pairs[i].b);
            sz_ordering_t o = sz_order_serial(pairs[i].a, (sz_size_t)al, pairs[i].b, (sz_size_t)bl);
            sz_bool_t eq = (al == bl) ? sz_equal_serial(pairs[i].a, pairs[i].b, (sz_size_t)al) : sz_false_k;
            sep();
            printf("    {\"a\": ");
            print_hex((unsigned char const *)pairs[i].a, al);
            printf(", \"b\": ");
            print_hex((unsigned char const *)pairs[i].b, bl);
            printf(", \"order\": %d, \"equal\": %s}", (int)o, eq ? "true" : "false");
        }
        /* fuzz: same-length pairs diverging at one splitmix-chosen byte,
         * plus prefix pairs, across boundary lengths */
        unsigned char a[MAX_LEN], b[MAX_LEN];
        for (int li = 0; li < n_lengths; ++li) {
            int len = lengths[li];
            if (len == 0) continue;
            fill_hay(len, 3, 0xD1CE0000ull + (unsigned long long)len);
            memcpy(a, hay, (size_t)len);
            memcpy(b, hay, (size_t)len);
            int pos = (int)(sm_next() % (unsigned long long)len);
            b[pos] = (unsigned char)(b[pos] ^ 0x10);
            sz_ordering_t o = sz_order_serial((sz_cptr_t)a, (sz_size_t)len, (sz_cptr_t)b, (sz_size_t)len);
            sz_bool_t eq = sz_equal_serial((sz_cptr_t)a, (sz_cptr_t)b, (sz_size_t)len);
            sep();
            printf("    {\"a\": ");
            print_hex(a, len);
            printf(", \"b\": ");
            print_hex(b, len);
            printf(", \"order\": %d, \"equal\": %s}", (int)o, eq ? "true" : "false");
            /* prefix pair */
            int pl = len - 1;
            o = sz_order_serial((sz_cptr_t)a, (sz_size_t)len, (sz_cptr_t)a, (sz_size_t)pl);
            sep();
            printf("    {\"a\": ");
            print_hex(a, len);
            printf(", \"b\": ");
            print_hex(a, pl);
            printf(", \"order\": %d, \"equal\": false}", (int)o);
        }
    }
    printf("\n  ]\n}\n");
    return 0;
}
