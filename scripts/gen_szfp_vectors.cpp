// Ground-truth fingerprint vector generator: compiles the PUBLIC reference
// header-only engine (read-only checkout) and prints JSON vectors for the
// MinHash+CMS fingerprints, replicating the szs_fingerprints_init dispatch
// (c/stringzillas/fingerprints.cuh:42-160): per-width slices of
// floating_rolling_hashers<serial, 64> when dims/width is a clean multiple
// of 64, else the per-dimension basic_rolling_hashers fallback.
// Used ONLY to freeze oracle vectors; no reference code enters the repo.
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

#include <stringzillas/fingerprints.hpp>

namespace szs = ashvardanian::stringzillas;
namespace sz = ashvardanian::stringzilla;

static unsigned long long sm_state;
static unsigned long long sm_next(void) {
    unsigned long long z = (sm_state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
}

static constexpr size_t slice_k = 64; // c/stringzillas/stringzillas.cuh:771

// One fingerprint with the same engine selection as szs_fingerprints_init.
static void fingerprint(std::vector<unsigned char> const &text, size_t dims,
                        std::vector<size_t> const &widths, unsigned long long seed,
                        std::vector<sz::u32_t> &hashes, std::vector<sz::u32_t> &counts,
                        bool *used_sliced) {
    hashes.assign(dims, 0);
    counts.assign(dims, 0);
    size_t const nw = widths.size();
    size_t const per_min = dims / nw, per_max = (dims + nw - 1) / nw;
    bool const sliced = (per_min == per_max) && (per_min % slice_k == 0);
    *used_sliced = sliced;
    sz::span<sz::byte_t const> tv(reinterpret_cast<sz::byte_t const *>(text.data()), text.size());
    if (sliced) {
        size_t const count_hashers = dims / slice_k;
        for (size_t i = 0; i < count_hashers; ++i) {
            szs::floating_rolling_hashers<sz_cap_serial_k, slice_k> h;
            h.try_seed(widths[i % nw], 256, i * slice_k, seed);
            sz::span<sz::u32_t, slice_k> hs(hashes.data() + i * slice_k);
            sz::span<sz::u32_t, slice_k> cs(counts.data() + i * slice_k);
            h.fingerprint(tv, hs, cs);
        }
    }
    else {
        szs::basic_rolling_hashers<szs::floating_rolling_hasher<sz::f64_t>, sz::u32_t> h;
        for (size_t d = 0; d < dims; ++d) h.try_extend(widths[d % nw], 1, 256, seed);
        sz::span<sz::u32_t> hs(hashes.data(), dims);
        sz::span<sz::u32_t> cs(counts.data(), dims);
        h.try_fingerprint(tv, hs, cs);
    }
}

struct config_t {
    char const *name;
    size_t dims;
    std::vector<size_t> widths;
    unsigned long long seed;
};

// settable from argv for fresh-corpus differential campaigns
// (scripts/fuzz_fp_campaign.py); defaults reproduce the frozen
// tests/data/szfp_vectors.json exactly.
static unsigned long long g_seed_offset = 0;
static int g_n_extra = 0;

int main(int argc, char **argv) {
    if (argc > 1) g_seed_offset = strtoull(argv[1], NULL, 10);
    if (argc > 2) g_n_extra = atoi(argv[2]);
    std::vector<size_t> const default_widths = {3, 4, 5, 7, 9, 11, 15, 31};
    std::vector<config_t> configs = {
        {"flagship_128_default_s0", 128, default_widths, 0ull},
        {"flagship_128_default_s42", 128, default_widths, 42ull},
        {"sliced_128_w5_9", 128, {5, 9}, 0ull},
        {"sliced_64_w4", 64, {4}, 7ull},
        {"sliced_256_w3_5_7_11", 256, {3, 5, 7, 11}, 0ull},
        {"ragged_100_w3_5_7", 100, {3, 5, 7}, 0ull},
        {"ragged_16_default", 16, default_widths, 1ull},
    };
    int const lengths[] = {0, 2, 3, 10, 31, 64, 200, 1000};

    printf("{\n  \"slice_k\": %zu,\n  \"configs\": [\n", slice_k);
    bool first_cfg = true;
    for (auto const &cfg : configs) {
        if (!first_cfg) printf(",\n");
        first_cfg = false;
        printf("    {\"name\": \"%s\", \"dims\": %zu, \"widths\": [", cfg.name, cfg.dims);
        for (size_t i = 0; i < cfg.widths.size(); ++i) printf("%s%zu", i ? ", " : "", cfg.widths[i]);
        printf("], \"seed\": %llu, \"texts\": [\n", cfg.seed);
        bool first_text = true;
        std::vector<int> all_lengths(lengths, lengths + 8);
        if (g_n_extra) {
            sm_state = 0xFEED00ull + g_seed_offset;
            for (int e = 0; e < g_n_extra; ++e) all_lengths.push_back(1 + (int)(sm_next() % 1200));
        }
        for (size_t li = 0; li < all_lengths.size(); ++li) {
            int len = all_lengths[li];
            sm_state = 0x5EED0F5EED0F5EEDull + g_seed_offset + (unsigned long long)len;
            std::vector<unsigned char> text(len);
            for (int b = 0; b < len; ++b) text[b] = (unsigned char)(sm_next() % 64 + 32);
            std::vector<sz::u32_t> hashes, counts;
            bool sliced = false;
            fingerprint(text, cfg.dims, cfg.widths, cfg.seed, hashes, counts, &sliced);
            if (!first_text) printf(",\n");
            first_text = false;
            printf("      {\"len\": %d, \"sliced\": %s, \"hashes\": [", len, sliced ? "true" : "false");
            for (size_t d = 0; d < cfg.dims; ++d) printf("%s%u", d ? "," : "", hashes[d]);
            printf("], \"counts\": [");
            for (size_t d = 0; d < cfg.dims; ++d) printf("%s%u", d ? "," : "", counts[d]);
            printf("]}");
        }
        // a repetitive text exercises the min-count tie accumulation
        {
            std::vector<unsigned char> text;
            for (int r = 0; r < 120; ++r) text.push_back("ab"[r % 2]);
            std::vector<sz::u32_t> hashes, counts;
            bool sliced = false;
            fingerprint(text, cfg.dims, cfg.widths, cfg.seed, hashes, counts, &sliced);
            printf(",\n      {\"len\": -120, \"sliced\": %s, \"hashes\": [", sliced ? "true" : "false");
            for (size_t d = 0; d < cfg.dims; ++d) printf("%s%u", d ? "," : "", hashes[d]);
            printf("], \"counts\": [");
            for (size_t d = 0; d < cfg.dims; ++d) printf("%s%u", d ? "," : "", counts[d]);
            printf("]}");
        }
        printf("\n    ]}");
    }
    printf("\n  ]\n}\n");
    return 0;
}
