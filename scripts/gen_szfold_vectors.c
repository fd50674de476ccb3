/* Ground-truth case-folding / normalization vector generator: compiles
 * the PUBLIC reference serial kernels (read-only checkout) for
 * sz_utf8_uncased_fold / sz_utf8_norm (NFD/NFC/NFKD/NFKC) /
 * sz_utf8_uncased_order / sz_utf8_uncased_search and prints JSON
 * vectors.  Used ONLY to freeze oracle vectors for the repo's own
 * pytest suite; no reference code is copied into the repo.
 *
 * Input protocol (stdin): one text per line as whitespace-separated
 * decimal codepoints.  Lines before a literal "#SEARCH" marker are the
 * fold/norm/order corpus (order compares consecutive lines); after the
 * marker, lines alternate haystack / needle for the search cases.
 *
 * Build + run:
 *   gcc -O2 -I/root/reference/include -o /tmp/gen_szfold \
 *       scripts/gen_szfold_vectors.c
 *   python scripts/gen_szfold_inputs.py | /tmp/gen_szfold \
 *       > tests/data/szfold_vectors.json
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <stringzilla/types.h>
#include <stringzilla/utf8_norm.h>
#include <stringzilla/utf8_uncased.h>
#include <stringzilla/utf8_uncased_fold.h>

#define MAX_CPS 2048
#define MAX_BYTES (MAX_CPS * 4 + 8)
#define OUT_BYTES (MAX_BYTES * 32)

static int utf8_encode(unsigned long cp, unsigned char *out) {
    if (cp < 0x80) { out[0] = (unsigned char)cp; return 1; }
    if (cp < 0x800) {
        out[0] = (unsigned char)(0xC0 | (cp >> 6));
        out[1] = (unsigned char)(0x80 | (cp & 0x3F));
        return 2;
    }
    if (cp < 0x10000) {
        out[0] = (unsigned char)(0xE0 | (cp >> 12));
        out[1] = (unsigned char)(0x80 | ((cp >> 6) & 0x3F));
        out[2] = (unsigned char)(0x80 | (cp & 0x3F));
        return 3;
    }
    out[0] = (unsigned char)(0xF0 | (cp >> 18));
    out[1] = (unsigned char)(0x80 | ((cp >> 12) & 0x3F));
    out[2] = (unsigned char)(0x80 | ((cp >> 6) & 0x3F));
    out[3] = (unsigned char)(0x80 | (cp & 0x3F));
    return 4;
}

static int parse_line(char const *line, unsigned long *cps) {
    int n = 0;
    char const *p = line;
    while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\n' || *p == '\r' || *p == '\0') break;
        cps[n++] = strtoul(p, (char **)&p, 10);
        if (n >= MAX_CPS) { fprintf(stderr, "too many cps\n"); exit(2); }
    }
    return n;
}

static void print_bytes(unsigned char const *buf, size_t n) {
    printf("[");
    for (size_t i = 0; i < n; ++i) printf("%s%d", i ? "," : "", (int)buf[i]);
    printf("]");
}

static void print_cps(unsigned long const *cps, int n) {
    printf("[");
    for (int i = 0; i < n; ++i) printf("%s%lu", i ? "," : "", cps[i]);
    printf("]");
}

int main(void) {
    static unsigned long cps[MAX_CPS], prev_cps[MAX_CPS];
    static unsigned char buf[MAX_BYTES], prev_buf[MAX_BYTES];
    static unsigned char out[OUT_BYTES];
    char line[MAX_CPS * 8];
    size_t prev_len = 0;
    int prev_n = -1; /* -1: no previous line yet */
    int first = 1, in_search = 0, have_hay = 0;
    static unsigned long hay_cps[MAX_CPS];
    static unsigned char hay_buf[MAX_BYTES];
    size_t hay_len = 0;
    int hay_n = 0;

    printf("{\"cases\": [\n");
    while (fgets(line, sizeof(line), stdin)) {
        if (line[0] == '#') {
            if (strncmp(line, "#SEARCH", 7) == 0) { in_search = 1; prev_n = -1; }
            continue;
        }
        int n = parse_line(line, cps);
        size_t len = 0;
        for (int i = 0; i < n; ++i) len += (size_t)utf8_encode(cps[i], buf + len);

        if (in_search) {
            if (!have_hay) {
                memcpy(hay_cps, cps, sizeof(unsigned long) * (size_t)n);
                memcpy(hay_buf, buf, len);
                hay_len = len;
                hay_n = n;
                have_hay = 1;
                continue;
            }
            have_hay = 0;
            sz_utf8_uncased_needle_metadata_t meta;
            memset(&meta, 0, sizeof(meta));
            sz_size_t matched = 0;
            sz_cptr_t hit = sz_utf8_uncased_search_serial(
                (sz_cptr_t)hay_buf, hay_len, (sz_cptr_t)buf, len, &meta, &matched);
            if (!first) printf(",\n");
            first = 0;
            printf("  {\"kind\": \"search\", \"hay\": ");
            print_cps(hay_cps, hay_n);
            printf(", \"needle\": ");
            print_cps(cps, n);
            printf(", \"offset\": %ld, \"matched\": %ld}",
                   hit ? (long)(hit - (sz_cptr_t)hay_buf) : -1L,
                   hit ? (long)matched : -1L);
            continue;
        }

        if (!first) printf(",\n");
        first = 0;
        printf("  {\"kind\": \"text\", \"cps\": ");
        print_cps(cps, n);
        size_t fl = sz_utf8_uncased_fold_serial((sz_cptr_t)buf, len, (sz_ptr_t)out);
        printf(", \"fold\": ");
        print_bytes(out, fl);
        static char const *fname[4] = {"nfd", "nfc", "nfkd", "nfkc"};
        for (int f = 0; f < 4; ++f) {
            size_t nl = sz_utf8_norm_serial((sz_cptr_t)buf, len, (sz_normal_form_t)f, (sz_ptr_t)out);
            printf(", \"%s\": ", fname[f]);
            print_bytes(out, nl);
        }
        if (prev_n >= 0) {
            sz_ordering_t o = sz_utf8_uncased_order_serial(
                (sz_cptr_t)prev_buf, prev_len, (sz_cptr_t)buf, len);
            printf(", \"order_vs_prev\": %d",
                   o == sz_less_k ? -1 : (o == sz_greater_k ? 1 : 0));
        }
        printf("}");
        memcpy(prev_cps, cps, sizeof(unsigned long) * (size_t)n);
        memcpy(prev_buf, buf, len);
        prev_len = len;
        prev_n = n;
    }
    printf("\n]}\n");
    return 0;
}
