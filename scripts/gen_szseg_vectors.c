/* Ground-truth segmentation vector generator: compiles the PUBLIC
 * reference serial kernels (read-only checkout) for the four UAX
 * segmentation engines — sz_utf8_wordbreaks / sz_utf8_sentences /
 * sz_utf8_graphemes / sz_utf8_linebreaks — and prints JSON vectors.
 * Used ONLY to freeze oracle vectors for the repo's own pytest suite;
 * no reference code is copied into the repo.
 *
 * Input: one text per line on stdin, as whitespace-separated decimal
 * Unicode codepoints (an empty line is the empty text).  The corpus is
 * produced by scripts/gen_szseg_inputs.py so the C side stays dumb and
 * the Python side can reuse the repo's own differential-fuzz pool.
 *
 * Output: {"cases": [{"cps": [...], "words": [[byte_start, byte_len],
 * ...], "sentences": [...], "graphemes": [...], "lines": [...]}]} —
 * all offsets/lengths in UTF-8 BYTES, exactly as the reference kernels
 * report them.
 *
 * Build + run:
 *   gcc -O2 -I/root/reference/include -o /tmp/gen_szseg \
 *       scripts/gen_szseg_vectors.c
 *   python scripts/gen_szseg_inputs.py | /tmp/gen_szseg \
 *       > tests/data/szseg_vectors.json
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <stringzilla/types.h>
#include <stringzilla/utf8_graphemes.h>
#include <stringzilla/utf8_linebreaks.h>
#include <stringzilla/utf8_sentences.h>
#include <stringzilla/utf8_wordbreaks.h>

#define MAX_CPS 4096
#define MAX_BYTES (MAX_CPS * 4 + 8)

static int utf8_encode(unsigned long cp, unsigned char *out) {
    if (cp < 0x80) {
        out[0] = (unsigned char)cp;
        return 1;
    }
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

typedef sz_size_t (*seg_fn_t)(sz_cptr_t, sz_size_t, sz_size_t *, sz_size_t *, sz_size_t, sz_size_t *);

static void print_segments(char const *name, seg_fn_t fn, unsigned char const *buf, sz_size_t len) {
    static sz_size_t starts[MAX_BYTES], lengths[MAX_BYTES];
    sz_size_t consumed = 0;
    sz_size_t n = fn((sz_cptr_t)buf, len, starts, lengths, MAX_BYTES, &consumed);
    if (consumed != len) {
        fprintf(stderr, "kernel %s consumed %zu of %zu bytes\n", name, (size_t)consumed, (size_t)len);
        exit(3);
    }
    printf("\"%s\": [", name);
    for (sz_size_t i = 0; i < n; ++i)
        printf("%s[%zu,%zu]", i ? "," : "", (size_t)starts[i], (size_t)lengths[i]);
    printf("]");
}

int main(void) {
    static unsigned long cps[MAX_CPS];
    static unsigned char buf[MAX_BYTES];
    char line[MAX_CPS * 8];
    int first_case = 1;

    printf("{\"cases\": [\n");
    while (fgets(line, sizeof(line), stdin)) {
        int n_cps = 0;
        char *p = line;
        while (*p) {
            while (*p == ' ' || *p == '\t') ++p;
            if (*p == '\n' || *p == '\r' || *p == '\0') break;
            cps[n_cps++] = strtoul(p, &p, 10);
            if (n_cps >= MAX_CPS) {
                fprintf(stderr, "too many codepoints\n");
                return 2;
            }
        }
        sz_size_t len = 0;
        for (int i = 0; i < n_cps; ++i) len += (sz_size_t)utf8_encode(cps[i], buf + len);

        if (!first_case) printf(",\n");
        first_case = 0;
        printf("  {\"cps\": [");
        for (int i = 0; i < n_cps; ++i) printf("%s%lu", i ? "," : "", cps[i]);
        printf("], ");
        print_segments("words", sz_utf8_wordbreaks_serial, buf, len);
        printf(", ");
        print_segments("sentences", sz_utf8_sentences_serial, buf, len);
        printf(", ");
        print_segments("graphemes", sz_utf8_graphemes_serial, buf, len);
        printf(", ");
        print_segments("lines", sz_utf8_linebreaks_serial, buf, len);
        printf("}");
    }
    printf("\n]}\n");
    return 0;
}
