#!/usr/bin/env python
"""Large-scale differential campaign for the similarity kernels: fresh
random pair corpora through the COMPILED reference engines vs the
repo's batched NumPy kernels — beyond the frozen fixtures (new seed
offsets and pair counts every run).

Usage:
  cp scripts/forkunion_stub.h /tmp/fustub/forkunion.h
  g++ -O2 -std=c++17 -I/tmp/fustub -I/root/reference/include \
      -o /tmp/gen_szsim scripts/gen_szsim_vectors.cpp
  python scripts/fuzz_sim_campaign.py [n_pairs] [seed_offset]

The generator reproduces tests/data/szsim_vectors.json bit-for-bit when
run with no arguments; with a seed offset it draws the same pair SHAPES
(empty / near-identical / prefix / random, every DP tier) from a fresh
corpus.  Exits nonzero on any divergence; campaign results are recorded
in COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

import numpy as np

_ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, _ROOT)

from sz_spark import kernels as K  # noqa: E402


def _sm_next(state):
    state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return state, (z ^ (z >> 31))


def _corpus(length: int, base: int) -> bytes:
    state, out = base, bytearray()
    for _ in range(length):
        state, z = _sm_next(state)
        out.append(ord("a") + z % 16)
    return bytes(out)


def _byte_pairs(n_pairs: int, seed_offset: int):
    """Mirror of the generator's make_pairs with the same seed offset."""
    lens = [0, 1, 3, 10, 16, 40, 100, 300, 1000]
    pairs_a, pairs_b = [], []
    for k in range(n_pairs):
        la, lb = lens[k % 9], lens[(k * 3 + 1) % 9]
        a = _corpus(la, 0xA5EED0000 + seed_offset + k)
        if k % 4 == 0:
            b = bytearray(a)
            if b:
                mid = len(b) // 2
                b[mid] = ord("a") + ((b[mid] - ord("a") + 1) % 16)
            b = bytes(b)
        elif k % 4 == 1:
            b = a[: len(a) // 2]
        else:
            b = _corpus(lb, 0xB5EED0000 + seed_offset + k)
        pairs_a.append(a)
        pairs_b.append(b)
    return pairs_a, pairs_b


def _vowel_class_subs() -> np.ndarray:
    byte_to_class = np.zeros(256, dtype=np.int64)
    for ch in b"aeiou":
        byte_to_class[ch] = 1
    class_costs = np.full((32, 32), -4, dtype=np.int64)
    np.fill_diagonal(class_costs, 5)
    return K.expand_class_costs(byte_to_class, class_costs)


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 360
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else random.SystemRandom().randrange(1 << 31)
    print(f"[campaign] {n_pairs} pairs, seed offset {seed}")
    gen = "/tmp/gen_szsim"
    if not os.path.exists(gen):
        sys.exit("build /tmp/gen_szsim first (see module docstring)")
    out = subprocess.run([gen, str(seed), str(n_pairs)], capture_output=True, text=True, check=True)
    ref = {e["name"]: e["results"] for e in json.loads(out.stdout)["engines"]}

    a, b = _byte_pairs(n_pairs, seed)
    cases = [
        ("lev_linear", lambda: K.levenshtein_batch(a, b)),
        ("lev_affine_2_1", lambda: K.levenshtein_batch(a, b, gap_open=2, gap_extend=1)),
        ("lev_affine_3_1", lambda: K.levenshtein_batch(a, b, gap_open=3, gap_extend=1)),
        ("nw_unit_linear", lambda: K.needleman_wunsch_batch(a, b)),
        ("nw_vowel_affine_m2_m1",
         lambda: K.needleman_wunsch_batch(a, b, substitution=_vowel_class_subs(),
                                          gap_open=-2, gap_extend=-1)),
        ("sw_unit_linear", lambda: K.smith_waterman_batch(a, b)),
        ("sw_unit_affine_m2_m1", lambda: K.smith_waterman_batch(a, b, gap_open=-2, gap_extend=-1)),
    ]
    bad = 0
    for name, fn in cases:
        got = [int(v) for v in fn()]
        want = ref[name]
        n_bad = sum(1 for g, w in zip(got, want) if g != w)
        if n_bad:
            for i, (g, w) in enumerate(zip(got, want)):
                if g != w:
                    print(f"  DIVERGENCE {name} pair {i}: ref={w} got={g} "
                          f"lens=({len(a[i])},{len(b[i])})")
                    break
        print(f"[campaign] {name}: {n_bad}/{n_pairs} divergences")
        bad += n_bad
    print(f"[campaign] TOTAL divergences: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
