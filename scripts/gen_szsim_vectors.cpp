// Ground-truth similarity-score vector generator: compiles the PUBLIC
// reference header-only template core (read-only checkout) and prints JSON
// vectors for Levenshtein (byte + UTF-8, linear + affine gaps),
// Needleman-Wunsch, and Smith-Waterman, through the same serial engine
// structs the product dispatches to.  Used ONLY to freeze oracle vectors
// for the repo's pytest suite; no reference code enters the repo.
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

#include <stringzillas/similarities/serial.hpp>

namespace szs = ashvardanian::stringzillas;
namespace sz = ashvardanian::stringzilla;

static unsigned long long sm_state;
static unsigned long long sm_next(void) {
    unsigned long long z = (sm_state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
}

// deterministic 16-letter ('a'..'p') corpus, regenerable in Python
static std::string corpus(int length, unsigned long long base) {
    sm_state = base;
    std::string out;
    for (int i = 0; i < length; ++i) out.push_back((char)('a' + (sm_next() % 16)));
    return out;
}

// deterministic text pairs crossing every DP tier: empty, tiny,
// horizontal (<16 diag), u8 cells, u16 cells (>255 total cost).
// g_seed_offset / g_n_pairs are settable from argv for fresh-corpus
// differential campaigns (scripts/fuzz_sim_campaign.py); the defaults
// reproduce the frozen tests/data/szsim_vectors.json exactly.
static unsigned long long g_seed_offset = 0;
static int g_n_pairs = 36;
static void make_pairs(std::vector<std::string> &as, std::vector<std::string> &bs) {
    int const lens[] = {0, 1, 3, 10, 16, 40, 100, 300, 1000};
    for (int k = 0; k < g_n_pairs; ++k) {
        int const la = lens[k % 9], lb = lens[(k * 3 + 1) % 9];
        std::string a = corpus(la, 0xA5EED0000ull + g_seed_offset + (unsigned long long)k);
        std::string b;
        if (k % 4 == 0) { // near-identical pair: copy with one byte bumped
            b = a;
            if (!b.empty()) b[b.size() / 2] = (char)('a' + ((b[b.size() / 2] - 'a' + 1) % 16));
        }
        else if (k % 4 == 1) { b = a.substr(0, a.size() / 2); } // prefix
        else { b = corpus(lb, 0xB5EED0000ull + g_seed_offset + (unsigned long long)k); }
        as.push_back(a);
        bs.push_back(b);
    }
}

template <typename engine_type_, typename result_type_>
static long long run_one(engine_type_ const &engine, std::string const &a, std::string const &b) {
    szs::dummy_executor_t exec;
    szs::cpu_specs_t specs;
    sz::span<char const> fa(a.data(), a.size());
    sz::span<char const> fb(b.data(), b.size());
    size_t const scratch_size = engine.scratch_space_needed(fa, fb, specs);
    std::vector<std::byte> scratch(scratch_size);
    result_type_ result = 0;
    auto status = engine(fa, fb, result, szs::scratch_space_t(scratch.data(), scratch.size()), exec, specs);
    if (status != sz::status_t::success_k) return -999999999LL;
    return (long long)result;
}

template <typename engine_type_, typename result_type_>
static void emit(char const *name, engine_type_ const &engine, std::vector<std::string> const &as,
                 std::vector<std::string> const &bs, bool *first) {
    if (!*first) printf(",\n");
    *first = false;
    printf("    {\"name\": \"%s\", \"results\": [", name);
    for (size_t i = 0; i < as.size(); ++i)
        printf("%s%lld", i ? "," : "", run_one<engine_type_, result_type_>(engine, as[i], bs[i]));
    printf("]}");
}

int main(int argc, char **argv) {
    if (argc > 1) g_seed_offset = strtoull(argv[1], NULL, 10);
    if (argc > 2) g_n_pairs = atoi(argv[2]);
    std::vector<std::string> as, bs;
    make_pairs(as, bs);

    // UTF-8 pairs: multi-byte runes crossing the rune/byte distinction
    std::vector<std::string> ua = {
        "", "abc", "\xce\xb1\xce\xb2\xce\xb3\xce\xb4", "\xce\xb1\xce\xb2\xce\xb3\xce\xb4",
        "caf\xc3\xa9 bar", "\xe4\xbd\xa0\xe5\xa5\xbd\xe4\xb8\x96\xe7\x95\x8c",
        "\xf0\x9f\x98\x80\xf0\x9f\x98\x81\xf0\x9f\x98\x82", "mixed \xce\xb1\xe4\xbd\xa0\xf0\x9f\x98\x80 tail",
        "long \xce\xb1\xce\xb2 run long \xce\xb1\xce\xb2 run long \xce\xb1\xce\xb2 run", "abcdefghij"};
    std::vector<std::string> ub = {
        "\xce\xb1", "abd", "\xce\xb1\xce\xb3\xce\xb4", "\xce\xb1\xce\xb2\xce\xb3\xce\xb4",
        "cafe bar", "\xe4\xbd\xa0\xe5\xa5\xbd\xe4\xb8\x96",
        "\xf0\x9f\x98\x80\xf0\x9f\x98\x82", "mixed \xce\xb1\xe4\xbd\xa0 tail",
        "long \xce\xb1\xce\xb2 run long \xce\xb2\xce\xb1 run long \xce\xb1\xce\xb2 run", "abcdefghik"};

    // vowel 2-class cost table from the repo's nw_class_costs query shape
    szs::error_costs_32x32_t vowel_costs;
    for (int b = 0; b < 256; ++b) vowel_costs.byte_to_class[b] = 0;
    for (char v : std::string("aeiou")) vowel_costs.byte_to_class[(unsigned char)v] = 1;
    for (int i = 0; i < 32; ++i)
        for (int j = 0; j < 32; ++j) vowel_costs.class_substitution_costs[i][j] = (i == j) ? 5 : -4;

    // identity 16-class table: match/mismatch on the 'a'..'p' corpus
    szs::error_costs_32x32_t unit01, unit1m1;
    for (int b = 0; b < 256; ++b) unit01.byte_to_class[b] = 0, unit1m1.byte_to_class[b] = 0;
    for (int i = 0; i < 16; ++i)
        unit01.byte_to_class['a' + i] = (sz::u8_t)i, unit1m1.byte_to_class['a' + i] = (sz::u8_t)i;
    for (int i = 0; i < 32; ++i)
        for (int j = 0; j < 32; ++j) {
            unit01.class_substitution_costs[i][j] = (i == j) ? 0 : -1;
            unit1m1.class_substitution_costs[i][j] = (i == j) ? 1 : -1;
        }

    printf("{\n  \"engines\": [\n");
    bool first = true;

    emit<szs::levenshtein_distance<char, szs::linear_gap_costs_t, sz_cap_serial_k>, size_t>(
        "lev_linear", {szs::uniform_substitution_costs_t {0, 1}, szs::linear_gap_costs_t {1}}, as, bs, &first);
    emit<szs::levenshtein_distance<char, szs::affine_gap_costs_t, sz_cap_serial_k>, size_t>(
        "lev_affine_2_1", {szs::uniform_substitution_costs_t {0, 1}, szs::affine_gap_costs_t {2, 1}}, as, bs, &first);
    emit<szs::levenshtein_distance<char, szs::affine_gap_costs_t, sz_cap_serial_k>, size_t>(
        "lev_affine_3_1", {szs::uniform_substitution_costs_t {0, 1}, szs::affine_gap_costs_t {3, 1}}, as, bs, &first);
    emit<szs::levenshtein_distance_utf8<szs::linear_gap_costs_t, sz_cap_serial_k>, size_t>(
        "lev_utf8_linear", {szs::uniform_substitution_costs_t {0, 1}, szs::linear_gap_costs_t {1}}, ua, ub, &first);
    emit<szs::levenshtein_distance_utf8<szs::affine_gap_costs_t, sz_cap_serial_k>, size_t>(
        "lev_utf8_affine_2_1", {szs::uniform_substitution_costs_t {0, 1}, szs::affine_gap_costs_t {2, 1}}, ua, ub,
        &first);
    emit<szs::needleman_wunsch_score<char, szs::error_costs_32x32_t, szs::linear_gap_costs_t, sz_cap_serial_k>,
         sz::ssize_t>("nw_unit_linear", {unit01, szs::linear_gap_costs_t {-1}}, as, bs, &first);
    emit<szs::needleman_wunsch_score<char, szs::error_costs_32x32_t, szs::affine_gap_costs_t, sz_cap_serial_k>,
         sz::ssize_t>("nw_vowel_affine_m2_m1", {vowel_costs, szs::affine_gap_costs_t {-2, -1}}, as, bs, &first);
    emit<szs::smith_waterman_score<char, szs::error_costs_32x32_t, szs::linear_gap_costs_t, sz_cap_serial_k>,
         sz::ssize_t>("sw_unit_linear", {unit1m1, szs::linear_gap_costs_t {-1}}, as, bs, &first);
    emit<szs::smith_waterman_score<char, szs::error_costs_32x32_t, szs::affine_gap_costs_t, sz_cap_serial_k>,
         sz::ssize_t>("sw_unit_affine_m2_m1", {unit1m1, szs::affine_gap_costs_t {-2, -1}}, as, bs, &first);

    printf("\n  ],\n  \"pair_count\": %zu,\n  \"utf8_pair_count\": %zu\n}\n", as.size(), ua.size());
    return 0;
}
