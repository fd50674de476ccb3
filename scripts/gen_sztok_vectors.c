/* Ground-truth vector generator for the UTF-8 rune mechanics and
 * token-scanning kernels: compiles the PUBLIC reference serial kernels
 * (read-only checkout) and prints JSON test vectors for
 *   sz_utf8_count_serial / sz_utf8_seek_serial   (utf8_runes.h:106-108)
 *   sz_utf8_decode_serial (U+FFFD maximal-subpart + resumable
 *       truncation contract)                      (utf8_runes.h:110)
 *   sz_utf8_newlines_serial / sz_utf8_whitespaces_serial /
 *   sz_utf8_delimiters_serial ((offset,length) match enumeration +
 *       bytes_consumed resume contract)           (utf8_tokens.h:148-156)
 * Used ONLY to freeze vectors for the repo's own pytest suite; no
 * reference code is copied into the repo.
 *
 * Input protocol (stdin): one text per line as hex bytes (binary-safe;
 * the corpus includes deliberately ill-formed UTF-8).
 *
 * Build + run:
 *   gcc -O2 -I/root/reference/include -o /tmp/gen_sztok \
 *       scripts/gen_sztok_vectors.c
 *   python scripts/gen_sztok_inputs.py | /tmp/gen_sztok \
 *       > tests/data/sztok_vectors.json
 */
#include <stdio.h>
#include <string.h>
#include <stringzilla/types.h>
#include <stringzilla/utf8_runes.h>
#include <stringzilla/utf8_tokens.h>

#define MAX_BYTES 4096
#define MAX_MATCHES 4096

static unsigned char text[MAX_BYTES];
static sz_size_t offs[MAX_MATCHES], lens[MAX_MATCHES];
static sz_rune_t runes[MAX_MATCHES];

static int hex_val(int c) {
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    if (c >= 'A' && c <= 'F') return c - 'A' + 10;
    return -1;
}

typedef sz_size_t (*scan_fn)(sz_cptr_t, sz_size_t, sz_size_t *, sz_size_t *, sz_size_t, sz_size_t *);

static void emit_scan(char const *key, scan_fn fn, int len, int trailing_comma) {
    sz_size_t consumed = 0;
    sz_size_t n = fn((sz_cptr_t)text, (sz_size_t)len, offs, lens, MAX_MATCHES, &consumed);
    printf("      \"%s\": {\"offs\": [", key);
    for (sz_size_t i = 0; i < n; ++i) printf("%s%llu", i ? "," : "", (unsigned long long)offs[i]);
    printf("], \"lens\": [");
    for (sz_size_t i = 0; i < n; ++i) printf("%s%llu", i ? "," : "", (unsigned long long)lens[i]);
    printf("], \"consumed\": %llu", (unsigned long long)consumed);
    /* capacity-limited call freezes the resume contract */
    if (n > 2) {
        sz_size_t c2 = 0;
        sz_size_t n2 = fn((sz_cptr_t)text, (sz_size_t)len, offs, lens, 2, &c2);
        printf(", \"cap2_n\": %llu, \"cap2_consumed\": %llu", (unsigned long long)n2, (unsigned long long)c2);
    }
    printf("}%s\n", trailing_comma ? "," : "");
}

int main(void) {
    char line[2 * MAX_BYTES + 16];
    int first = 1;
    printf("{\n  \"cases\": [\n");
    while (fgets(line, sizeof(line), stdin)) {
        /* A line longer than the buffer is split by fgets and would
         * parse as bogus extra cases; skip its continuation chunks. */
        if (!strchr(line, '\n')) {
            int c;
            while ((c = getchar()) != EOF && c != '\n') {}
            continue;
        }
        int len = 0;
        for (char const *p = line; p[0] && p[0] != '\n' && p[1] && p[1] != '\n'; p += 2) {
            int hi = hex_val(p[0]), lo = hex_val(p[1]);
            if (hi < 0 || lo < 0) break;
            if (len >= MAX_BYTES) break; /* bound text[] against oversized input */
            text[len++] = (unsigned char)((hi << 4) | lo);
        }
        if (!first) printf(",\n");
        first = 0;
        printf("    {\"h\": \"");
        for (int i = 0; i < len; ++i) printf("%02x", text[i]);
        printf("\",\n");

        /* count */
        sz_size_t cnt = sz_utf8_count_serial((sz_cptr_t)text, (sz_size_t)len);
        printf("      \"count\": %llu,\n", (unsigned long long)cnt);

        /* seek: byte offsets for a ladder of n values; -1 = NULL */
        {
            sz_size_t ns[7];
            ns[0] = 0;
            ns[1] = 1;
            ns[2] = 2;
            ns[3] = cnt / 2;
            ns[4] = cnt ? cnt - 1 : 0;
            ns[5] = cnt;
            ns[6] = cnt + 5;
            printf("      \"seek\": {");
            for (int i = 0; i < 7; ++i) {
                sz_cptr_t p = sz_utf8_seek_serial((sz_cptr_t)text, (sz_size_t)len, ns[i]);
                printf("%s\"%llu\": %lld", i ? ", " : "", (unsigned long long)ns[i],
                       p ? (long long)(p - (sz_cptr_t)text) : -1ll);
            }
            printf("},\n");
        }

        /* decode: full-capacity rune stream + resume cursor */
        {
            sz_size_t unpacked = 0;
            sz_cptr_t cur = sz_utf8_decode_serial((sz_cptr_t)text, (sz_size_t)len, runes, MAX_MATCHES, &unpacked);
            printf("      \"runes\": [");
            for (sz_size_t i = 0; i < unpacked; ++i)
                printf("%s%lu", i ? "," : "", (unsigned long)runes[i]);
            printf("], \"decode_consumed\": %lld,\n", (long long)(cur - (sz_cptr_t)text));
            /* capacity-3 call freezes fill-or-drain */
            if (unpacked > 3) {
                sz_size_t u3 = 0;
                sz_cptr_t c3 = sz_utf8_decode_serial((sz_cptr_t)text, (sz_size_t)len, runes, 3, &u3);
                printf("      \"cap3_runes\": [");
                for (sz_size_t i = 0; i < u3; ++i) printf("%s%lu", i ? "," : "", (unsigned long)runes[i]);
                printf("], \"cap3_consumed\": %lld,\n", (long long)(c3 - (sz_cptr_t)text));
            }
        }

        emit_scan("newlines", sz_utf8_newlines_serial, len, 1);
        emit_scan("whitespaces", sz_utf8_whitespaces_serial, len, 1);
        emit_scan("delimiters", sz_utf8_delimiters_serial, len, 0);
        printf("    }");
    }
    printf("\n  ]\n}\n");
    return 0;
}
