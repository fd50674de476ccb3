// Ground-truth vector generator for the Count-Min-Sketch merge law:
// compiles the PUBLIC reference header-only engine (read-only checkout)
// and prints JSON vectors for merge_count_min_sketches
// (stringzillas/fingerprints/serial.hpp:601-625) — elementwise min of
// hashes, counts add on ties — including chained merges that freeze
// associativity/commutativity against the compiled implementation.
// Used ONLY to freeze vectors for the repo's pytest suite; no reference
// code enters the repo.
//
// Build + run:
//   g++ -O2 -std=c++17 -I/root/reference/include -o /tmp/gen_szcms \
//       scripts/gen_szcms_vectors.cpp
//   /tmp/gen_szcms > tests/data/szcms_vectors.json
#include <cstdio>
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

using u32 = unsigned int;

static void fill_sketch(std::vector<u32> &hashes, std::vector<u32> &counts, unsigned long long seed,
                        unsigned tie_mod) {
    sm_state = seed;
    for (size_t i = 0; i < hashes.size(); ++i) {
        // small value range plants plenty of exact hash ties across sketches
        hashes[i] = (u32)(sm_next() % (tie_mod ? tie_mod : 0xFFFFFFFFull));
        counts[i] = (u32)(1 + sm_next() % 1000);
    }
}

static void print_arr(std::vector<u32> const &v) {
    printf("[");
    for (size_t i = 0; i < v.size(); ++i) printf("%s%u", i ? "," : "", v[i]);
    printf("]");
}

int main() {
    size_t dims_list[] = {1, 7, 64, 128, 257};
    unsigned tie_mods[] = {0, 16, 3}; // 0 = full range (rare ties), 16/3 = dense ties
    printf("{\n  \"cases\": [\n");
    int first = 1;
    for (size_t dims : dims_list)
        for (unsigned tm : tie_mods) {
            std::vector<u32> ah(dims), ac(dims), bh(dims), bc(dims), ch(dims), cc(dims);
            std::vector<u32> dh(dims), dc(dims), abc_h(dims), abc_c(dims);
            fill_sketch(ah, ac, 0xA000ull + dims * 7 + tm, tm);
            fill_sketch(bh, bc, 0xB000ull + dims * 7 + tm, tm);
            fill_sketch(dh, dc, 0xD000ull + dims * 7 + tm, tm);
            szs::merge_count_min_sketches<SZ_SIZE_MAX, u32, u32>(
                {ah.data(), dims}, {ac.data(), dims}, {bh.data(), dims}, {bc.data(), dims},
                {ch.data(), dims}, {cc.data(), dims});
            // chained: (a ⊕ b) ⊕ d — freezes the reference's own associativity path
            szs::merge_count_min_sketches<SZ_SIZE_MAX, u32, u32>(
                {ch.data(), dims}, {cc.data(), dims}, {dh.data(), dims}, {dc.data(), dims},
                {abc_h.data(), dims}, {abc_c.data(), dims});
            if (!first) printf(",\n");
            first = 0;
            printf("    {\"dims\": %zu, \"tie_mod\": %u,\n      \"a_h\": ", dims, tm);
            print_arr(ah);
            printf(", \"a_c\": ");
            print_arr(ac);
            printf(",\n      \"b_h\": ");
            print_arr(bh);
            printf(", \"b_c\": ");
            print_arr(bc);
            printf(",\n      \"d_h\": ");
            print_arr(dh);
            printf(", \"d_c\": ");
            print_arr(dc);
            printf(",\n      \"ab_h\": ");
            print_arr(ch);
            printf(", \"ab_c\": ");
            print_arr(cc);
            printf(",\n      \"abd_h\": ");
            print_arr(abc_h);
            printf(", \"abd_c\": ");
            print_arr(abc_c);
            printf("}");
        }
    printf("\n  ]\n}\n");
    return 0;
}
