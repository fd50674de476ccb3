"""Similarity kernels vs frozen vectors from the COMPILED reference engine.

scripts/gen_szsim_vectors.cpp compiles the reference's header-only
similarity template core (stringzillas/similarities/serial.hpp — the
same ``levenshtein_distance`` / ``levenshtein_distance_utf8`` /
``needleman_wunsch_score`` / ``smith_waterman_score`` structs the
product's serial backend dispatches to, including the Myers bit-parallel
fast path, the horizontal/diagonal walker tiers, and the u8→u16 cell
promotion) and freezes score vectors for nine engine configurations:

- byte Levenshtein: linear, affine open=2/extend=1, affine open=3/extend=1
- UTF-8 Levenshtein (rune-level): linear, affine 2/1 — over multi-byte
  Greek/CJK/emoji pairs
- Needleman-Wunsch: unit linear, and the vowel 2-class 32x32 cost table
  with affine open=-2/extend=-1 (the shape of the szs_nw_class_costs
  driver query)
- Smith-Waterman: unit linear and affine -2/-1

Pairs cross every DP tier (empty, <16 horizontal, u8 cells, u16 cells at
length 1000), plus near-identical, prefix, and random-vs-random shapes.
This pins the repo's cost conventions — gap of length L = open +
(L-1)*extend, NW/SW sign conventions, empty-side edges, rune-vs-byte
distinction — to the reference's own compiled arithmetic, independently
of the DuckDB Gotoh twins (which share this repo's reading of the spec).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from sz_spark import kernels as K

_VECTORS_PATH = os.path.join(os.path.dirname(__file__), "data", "szsim_vectors.json")

with open(_VECTORS_PATH) as _f:
    _VECTORS = {e["name"]: e["results"] for e in json.load(_f)["engines"]}


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


def _byte_pairs():
    """The harness corpus: 36 pairs over a 16-letter alphabet crossing
    every walker tier, with near-identical / prefix / random shapes."""
    lens = [0, 1, 3, 10, 16, 40, 100, 300, 1000]
    pairs_a, pairs_b = [], []
    for k in range(36):
        la, lb = lens[k % 9], lens[(k * 3 + 1) % 9]
        a = _corpus(la, 0xA5EED0000 + k)
        if k % 4 == 0:
            b = bytearray(a)
            if b:
                mid = len(b) // 2
                b[mid] = ord("a") + ((b[mid] - ord("a") + 1) % 16)
            b = bytes(b)
        elif k % 4 == 1:
            b = a[: len(a) // 2]
        else:
            b = _corpus(lb, 0xB5EED0000 + k)
        pairs_a.append(a)
        pairs_b.append(b)
    return pairs_a, pairs_b


_UTF8_A = ["", "abc", "αβγδ", "αβγδ", "café bar", "你好世界", "😀😁😂",
           "mixed α你😀 tail", "long αβ run long αβ run long αβ run", "abcdefghij"]
_UTF8_B = ["α", "abd", "αγδ", "αβγδ", "cafe bar", "你好世", "😀😂",
           "mixed α你 tail", "long αβ run long βα run long αβ run", "abcdefghik"]

_A, _B = _byte_pairs()


def _vowel_class_subs() -> np.ndarray:
    byte_to_class = np.zeros(256, dtype=np.int64)
    for ch in b"aeiou":
        byte_to_class[ch] = 1
    class_costs = np.full((32, 32), -4, dtype=np.int64)
    np.fill_diagonal(class_costs, 5)
    return K.expand_class_costs(byte_to_class, class_costs)


_CASES = [
    ("lev_linear", lambda: K.levenshtein_batch(_A, _B)),
    ("lev_affine_2_1", lambda: K.levenshtein_batch(_A, _B, gap_open=2, gap_extend=1)),
    ("lev_affine_3_1", lambda: K.levenshtein_batch(_A, _B, gap_open=3, gap_extend=1)),
    ("lev_utf8_linear", lambda: K.levenshtein_utf8_batch(_UTF8_A, _UTF8_B)),
    ("lev_utf8_affine_2_1",
     lambda: K.levenshtein_utf8_batch(_UTF8_A, _UTF8_B, gap_open=2, gap_extend=1)),
    ("nw_unit_linear", lambda: K.needleman_wunsch_batch(_A, _B)),
    ("nw_vowel_affine_m2_m1",
     lambda: K.needleman_wunsch_batch(_A, _B, substitution=_vowel_class_subs(),
                                      gap_open=-2, gap_extend=-1)),
    ("sw_unit_linear", lambda: K.smith_waterman_batch(_A, _B)),
    ("sw_unit_affine_m2_m1",
     lambda: K.smith_waterman_batch(_A, _B, gap_open=-2, gap_extend=-1)),
]


def test_vector_file_covers_all_engines():
    assert set(_VECTORS) == {name for name, _ in _CASES}
    assert -999999999 not in {r for v in _VECTORS.values() for r in v}  # no engine errors


@pytest.mark.parametrize("name,fn", _CASES, ids=[c[0] for c in _CASES])
def test_scores_bit_exact_vs_compiled_reference(name, fn):
    got = [int(x) for x in fn()]
    assert got == _VECTORS[name]
