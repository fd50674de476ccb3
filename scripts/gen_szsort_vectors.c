/* Ground-truth vector generator for the sequence ordering / set kernels:
 * compiles the PUBLIC reference serial kernels (read-only checkout)
 * and prints JSON test vectors for
 *   sz_sequence_argsort_serial          (sort.h:119 — stable byte-wise)
 *   sz_sequence_argsort_uncased_serial  (sort.h — stable case-folded,
 *       malformed bytes compared as raw one-byte units)
 *   top_count partial ordering + reverse flags
 *   sz_sequence_intersect_serial        (intersect.h:237 — strict
 *       distinct-set intersection with position pairs)
 * Used ONLY to freeze vectors for the repo's own pytest suite; no
 * reference code is copied into the repo.
 *
 * Build + run:
 *   gcc -O2 -I/root/reference/include -o /tmp/gen_szsort \
 *       scripts/gen_szsort_vectors.c
 *   /tmp/gen_szsort > tests/data/szsort_vectors.json
 */
#include <stdio.h>
#include <string.h>
#include <stringzilla/types.h>
#include <stringzilla/sort.h>
#include <stringzilla/intersect.h>

#define MAX_STRS 128

typedef struct {
    char const *ptr[MAX_STRS];
    sz_size_t len[MAX_STRS];
    sz_size_t count;
} strs_t;

static sz_cptr_t get_start(void const *handle, sz_size_t i) { return ((strs_t const *)handle)->ptr[i]; }
static sz_size_t get_length(void const *handle, sz_size_t i) { return ((strs_t const *)handle)->len[i]; }

static void as_sequence(strs_t const *s, sz_sequence_t *seq) {
    seq->handle = s;
    seq->count = s->count;
    seq->get_start = get_start;
    seq->get_length = get_length;
}

static void print_hex(char const *buf, sz_size_t len) {
    printf("\"");
    for (sz_size_t i = 0; i < len; ++i) printf("%02x", (unsigned char)buf[i]);
    printf("\"");
}

static void print_strs(strs_t const *s) {
    printf("[");
    for (sz_size_t i = 0; i < s->count; ++i) {
        if (i) printf(", ");
        print_hex(s->ptr[i], s->len[i]);
    }
    printf("]");
}

static void print_order(sz_sorted_idx_t const *order, sz_size_t count) {
    printf("[");
    for (sz_size_t i = 0; i < count; ++i) printf("%s%llu", i ? "," : "", (unsigned long long)order[i]);
    printf("]");
}

/* deterministic corpus PRNG */
static unsigned long long sm_state;
static unsigned long long sm_next(void) {
    unsigned long long z = (sm_state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
}

static char pool_buf[MAX_STRS][40];

/* random short strings over a tiny cased alphabet (forces dups and
 * case-collisions); every 7th gets a malformed byte appended */
static void fill_strs(strs_t *s, sz_size_t count, unsigned long long seed) {
    static char const alpha[] = "aAbBzZ \xC3\xA9"; /* includes e-acute lead+cont */
    sm_state = seed;
    s->count = count;
    for (sz_size_t i = 0; i < count; ++i) {
        sz_size_t len = sm_next() % 9;
        for (sz_size_t b = 0; b < len; ++b) pool_buf[i][b] = alpha[sm_next() % (sizeof(alpha) - 1)];
        if (i % 7 == 6 && len < 39) pool_buf[i][len++] = (char)0xE2; /* lone lead */
        s->ptr[i] = pool_buf[i];
        s->len[i] = len;
    }
}

static int first_case = 1;
static void emit_argsort_case(strs_t const *s, sz_size_t top, int reverse) {
    sz_sequence_t seq;
    as_sequence(s, &seq);
    sz_sorted_idx_t order[MAX_STRS], order_u[MAX_STRS];
    sz_status_t st = sz_sequence_argsort_serial(&seq, NULL, order, top, reverse ? sz_true_k : sz_false_k);
    sz_status_t st_u =
        sz_sequence_argsort_uncased_serial(&seq, NULL, order_u, top, reverse ? sz_true_k : sz_false_k);
    if (st != sz_success_k || st_u != sz_success_k) {
        fprintf(stderr, "argsort failed\n");
        return;
    }
    if (!first_case) printf(",\n");
    first_case = 0;
    printf("    {\"strs\": ");
    print_strs(s);
    printf(", \"top\": %llu, \"reverse\": %d, \"order\": ", (unsigned long long)top, reverse);
    print_order(order, s->count);
    printf(", \"order_uncased\": ");
    print_order(order_u, s->count);
    printf("}");
}

int main(void) {
    printf("{\n  \"argsort\": [\n");
    first_case = 1;
    /* curated: dups, case variants, prefixes, empties, malformed */
    {
        strs_t s;
        char const *items[] = {"banana", "Apple", "apple", "APPLE", "",      "cherry", "banana",
                               "ban",    "BAN",   "zz",    "Zz",    "\xFFxx", "a\xE2",  "a"};
        s.count = sizeof(items) / sizeof(items[0]);
        for (sz_size_t i = 0; i < s.count; ++i) {
            s.ptr[i] = items[i];
            s.len[i] = strlen(items[i]);
        }
        emit_argsort_case(&s, 0, 0);
        emit_argsort_case(&s, 0, 1);
        emit_argsort_case(&s, 5, 0);
        emit_argsort_case(&s, 5, 1);
    }
    /* fuzz: counts crossing the 32-element trivial-sort threshold */
    {
        sz_size_t counts[] = {1, 2, 3, 7, 16, 31, 32, 33, 64, 100, 128};
        for (unsigned ci = 0; ci < sizeof(counts) / sizeof(counts[0]); ++ci) {
            strs_t s;
            fill_strs(&s, counts[ci], 0x50B7ull + counts[ci]);
            emit_argsort_case(&s, 0, 0);
            emit_argsort_case(&s, 0, 1);
            if (counts[ci] > 8) emit_argsort_case(&s, 5, 0);
        }
    }
    printf("\n  ],\n  \"intersect\": [\n");
    first_case = 1;
    {
        /* distinct-set intersections; duplicates are rejected by
         * contract, so draw distinct strings per side */
        static char bufs[2][MAX_STRS][16];
        sz_size_t sizes[][2] = {{0, 5}, {5, 0}, {1, 1}, {8, 8}, {30, 7}, {64, 64}, {100, 33}};
        for (unsigned ci = 0; ci < sizeof(sizes) / sizeof(sizes[0]); ++ci) {
            strs_t a, b;
            a.count = sizes[ci][0];
            b.count = sizes[ci][1];
            /* build distinct strings: decimal of (side-salted) indices
             * with overlap on multiples of 3 */
            for (sz_size_t i = 0; i < a.count; ++i) {
                int n = (int)((i % 3 == 0) ? i : i + 1000);
                a.len[i] = (sz_size_t)snprintf(bufs[0][i], 16, "k%d", n);
                a.ptr[i] = bufs[0][i];
            }
            for (sz_size_t i = 0; i < b.count; ++i) {
                int n = (int)((i % 3 == 0) ? i : i + 2000);
                b.len[i] = (sz_size_t)snprintf(bufs[1][i], 16, "k%d", n);
                b.ptr[i] = bufs[1][i];
            }
            sz_sequence_t sa, sb;
            as_sequence(&a, &sa);
            as_sequence(&b, &sb);
            sz_size_t inter_size = 0;
            sz_sorted_idx_t first_pos[MAX_STRS], second_pos[MAX_STRS];
            sz_status_t st =
                sz_sequence_intersect_serial(&sa, &sb, NULL, 42ull, &inter_size, first_pos, second_pos);
            if (st != sz_success_k) {
                fprintf(stderr, "intersect failed on case %u\n", ci);
                continue;
            }
            if (!first_case) printf(",\n");
            first_case = 0;
            printf("    {\"a\": ");
            print_strs(&a);
            printf(", \"b\": ");
            print_strs(&b);
            printf(", \"size\": %llu, \"first_pos\": ", (unsigned long long)inter_size);
            print_order(first_pos, inter_size);
            printf(", \"second_pos\": ");
            print_order(second_pos, inter_size);
            printf("}");
        }
    }
    printf("\n  ]\n}\n");
    return 0;
}
