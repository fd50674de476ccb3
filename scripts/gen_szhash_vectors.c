/* Ground-truth vector generator: compiles the PUBLIC reference serial
 * kernels (read-only checkout) and prints JSON test vectors for
 * sz_hash / sz_hash_multiseed / sz_fill_random.  Used ONLY to freeze
 * vectors for the repo's own pytest suite; no reference code is copied
 * into the repo. */
#include <stdio.h>
#include <string.h>
#include <stdlib.h>
#include <stringzilla/types.h>
#include <stringzilla/hash.h>

/* deterministic corpus: splitmix64-driven bytes */
static unsigned long long sm_state;
static unsigned long long sm_next(void) {
    unsigned long long z = (sm_state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
}

/* settable from argv for fresh-corpus differential campaigns
 * (scripts/fuzz_hash_campaign.py); defaults reproduce the frozen
 * tests/data/szhash_vectors.json exactly. */
static unsigned long long g_seed_offset = 0;
static int g_n_extra = 0;

int main(int argc, char **argv) {
    unsigned char buf[1024];
    /* sz_u64_t (unsigned long on LP64) so the pointer passed to
     * sz_hash_multiseed_serial matches the reference API exactly —
     * `unsigned long long[]` compiled but tripped
     * -Wincompatible-pointer-types and would fail under -Werror. */
    sz_u64_t seeds[3] = {0ull, 42ull, 0xFEEDFACECAFEBEEFull};
    if (argc > 1) g_seed_offset = strtoull(argv[1], NULL, 10);
    if (argc > 2) g_n_extra = atoi(argv[2]);
    /* lengths chosen to cover every ladder branch + chunk boundaries */
    int base_lengths[] = {0, 1, 5, 15, 16, 17, 23, 31, 32, 33, 47, 48, 49, 63, 64,
                          65, 80, 127, 128, 129, 191, 192, 193, 255, 256, 300, 1024};
    int lengths[27 + 256];
    int n_lengths = (int)(sizeof(base_lengths) / sizeof(base_lengths[0]));
    memcpy(lengths, base_lengths, sizeof(base_lengths));
    if (g_n_extra > 256) g_n_extra = 256;
    sm_state = 0xC0FFEEull + g_seed_offset;
    for (int e = 0; e < g_n_extra; ++e) lengths[n_lengths++] = 1 + (int)(sm_next() % 1024);

    printf("{\n  \"hash\": [\n");
    int first = 1;
    for (int li = 0; li < n_lengths; ++li) {
        int len = lengths[li];
        sm_state = 0x1234567890ABCDEFull + g_seed_offset + (unsigned long long)len;
        for (int b = 0; b < len; ++b) buf[b] = (unsigned char)(sm_next() & 0xFF);
        for (int si = 0; si < 3; ++si) {
            unsigned long long h = sz_hash_serial((sz_cptr_t)buf, (sz_size_t)len, seeds[si]);
            if (!first) printf(",\n");
            first = 0;
            printf("    {\"len\": %d, \"seed\": %llu, \"hash\": %llu}", len,
                   (unsigned long long)seeds[si], h);
        }
    }
    printf("\n  ],\n  \"multiseed\": [\n");
    first = 1;
    for (int li = 0; li < n_lengths; ++li) {
        int len = lengths[li];
        if (len > 64) continue; /* prepared-lane path is <=64; >64 covered via hash */
        sm_state = 0x1234567890ABCDEFull + g_seed_offset + (unsigned long long)len;
        for (int b = 0; b < len; ++b) buf[b] = (unsigned char)(sm_next() & 0xFF);
        sz_u64_t hashes[3];
        sz_hash_multiseed_serial((sz_cptr_t)buf, (sz_size_t)len, seeds, 3, hashes);
        if (!first) printf(",\n");
        first = 0;
        printf("    {\"len\": %d, \"hashes\": [%llu, %llu, %llu]}", len,
               (unsigned long long)hashes[0], (unsigned long long)hashes[1],
               (unsigned long long)hashes[2]);
    }
    printf("\n  ],\n  \"fill_random\": [\n");
    first = 1;
    unsigned long long nonces[3] = {0ull, 7ull, 0xDEADBEEF12345678ull};
    int rlen[] = {1, 15, 16, 17, 64, 100};
    for (int ni = 0; ni < 3; ++ni) {
        for (int li = 0; li < 6; ++li) {
            memset(buf, 0xAA, sizeof(buf));
            sz_fill_random_serial((sz_ptr_t)buf, (sz_size_t)rlen[li], nonces[ni]);
            if (!first) printf(",\n");
            first = 0;
            printf("    {\"nonce\": %llu, \"len\": %d, \"bytes\": [", nonces[ni], rlen[li]);
            for (int b = 0; b < rlen[li]; ++b) printf("%s%d", b ? ", " : "", (int)buf[b]);
            printf("]}");
        }
    }
    printf("\n  ],\n  \"streaming\": [\n");
    /* streaming == one-shot at every chunk split for a few lengths */
    first = 1;
    int slens[] = {10, 40, 64, 65, 130, 300};
    for (int li = 0; li < 6; ++li) {
        int len = slens[li];
        sm_state = 0xABCDEF0123456789ull + g_seed_offset + (unsigned long long)len;
        for (int b = 0; b < len; ++b) buf[b] = (unsigned char)(sm_next() & 0xFF);
        int splits[] = {1, 7, 16, 64};
        for (int sp = 0; sp < 4; ++sp) {
            sz_hash_state_t st;
            sz_hash_state_init_serial(&st, 42ull);
            int off = 0;
            while (off < len) {
                int take = splits[sp] < (len - off) ? splits[sp] : (len - off);
                sz_hash_state_update_serial(&st, (sz_cptr_t)(buf + off), (sz_size_t)take);
                off += take;
            }
            unsigned long long h = sz_hash_state_digest_serial(&st);
            if (!first) printf(",\n");
            first = 0;
            printf("    {\"len\": %d, \"chunk\": %d, \"seed\": 42, \"hash\": %llu}", len, splits[sp], h);
        }
    }
    printf("\n  ]\n}\n");
    return 0;
}
