"""Case-folding / normalization / uncased order+search vs frozen
vectors from the COMPILED reference serial kernels.

scripts/gen_szfold_vectors.c compiles the reference's serial kernels —
sz_utf8_uncased_fold_serial (utf8_uncased_fold.h), sz_utf8_norm_serial
for all four forms (utf8_norm.h), sz_utf8_uncased_order_serial and
sz_utf8_uncased_search_serial (utf8_uncased.h) — and freezes vectors
for 110 texts (ß/ẞ/İ/ı/ſ, final sigma, ligatures, ypogegrammeni,
Hangul jamo, compat ideographs, composition exclusions, canonical
reordering, Deseret/Cherokee astral case pairs, POOL fuzz) + 48 search
cases.

This measures the §2.2 contract the repo ships: Python's str.casefold
IS bit-identical to the reference's fold (the reference's own oracle,
test/uncased.py), unicodedata.normalize IS bit-identical for all four
forms, casefolded-bytes comparison reproduces sz_utf8_uncased_order,
and the fold-expansion search twin reproduces sz_utf8_uncased_search
offsets AND matched byte lengths — including matches that start inside
one codepoint's multi-char fold (e.g. needle "ι" inside fold(ᾳ) =
"αι": the reference reports the whole codepoint as matched).

The corpus stays within UCD <= 14.0 assignments (the sandbox Python's
unicodedata version); fold/normalization of assigned codepoints are
stability-policy frozen, so UCD-14 twins vs UCD-17 reference tables
are comparable.

Regenerate:
  gcc -O2 -I/root/reference/include -o /tmp/gen_szfold \
      scripts/gen_szfold_vectors.c
  python scripts/gen_szfold_inputs.py | /tmp/gen_szfold \
      > tests/data/szfold_vectors.json
"""

from __future__ import annotations

import json
import os
import unicodedata

import pytest

_VECTORS_PATH = os.path.join(os.path.dirname(__file__), "data", "szfold_vectors.json")

with open(_VECTORS_PATH) as _f:
    _CASES = json.load(_f)["cases"]

_TEXTS = [c for c in _CASES if c["kind"] == "text"]
_SEARCHES = [c for c in _CASES if c["kind"] == "search"]


def _s(cps) -> str:
    return "".join(chr(c) for c in cps)


def test_casefold_matches_compiled_reference():
    """str.casefold (the udfs.utf8_casefold_udf kernel) == the compiled
    sz_utf8_uncased_fold on every frozen text, byte for byte."""
    for c in _TEXTS:
        t = _s(c["cps"])
        assert list(t.casefold().encode()) == c["fold"], repr(t)


@pytest.mark.parametrize("form", ["nfd", "nfc", "nfkd", "nfkc"])
def test_normalize_matches_compiled_reference(form):
    """unicodedata.normalize (the make_utf8_norm_udf kernel) == the
    compiled sz_utf8_norm for every form on every frozen text."""
    for c in _TEXTS:
        t = _s(c["cps"])
        got = list(unicodedata.normalize(form.upper(), t).encode())
        assert got == c[form], f"{form}: {t!r}"


def test_uncased_order_matches_compiled_reference():
    """Lexicographic comparison of casefolded UTF-8 bytes (the repo's
    uncased sort key, str_sorted_topk) == sz_utf8_uncased_order on
    every consecutive frozen pair."""
    prev = None
    n_checked = 0
    for c in _TEXTS:
        t = _s(c["cps"])
        if prev is not None and "order_vs_prev" in c:
            a, b = prev.casefold().encode(), t.casefold().encode()
            exp = -1 if a < b else (1 if a > b else 0)
            assert exp == c["order_vs_prev"], (prev, t)
            n_checked += 1
        prev = t
    assert n_checked >= 100


def _search_twin(hay: str, needle: str):
    """Fold-expansion-aware uncased search: first occurrence of
    fold(needle) in the concatenated per-codepoint folds of `hay`,
    mapped back to whole source codepoints (byte offset + matched byte
    length) — the sz_utf8_uncased_search contract."""
    fn = needle.casefold()
    folds = [ch.casefold() for ch in hay]
    folded = "".join(folds)
    p = folded.find(fn)
    if p < 0 or not fn:
        return -1, -1
    spans, q = [], 0
    for f in folds:
        spans.append((q, q + len(f)))
        q += len(f)
    lo = next(k for k, (a, b) in enumerate(spans) if a <= p < b)
    hi = next(k for k, (a, b) in enumerate(spans) if a < p + len(fn) <= b)
    off = len(hay[:lo].encode())
    matched = len(hay[lo:hi + 1].encode())
    return off, matched


def test_uncased_search_matches_compiled_reference():
    for c in _SEARCHES:
        hay, needle = _s(c["hay"]), _s(c["needle"])
        assert _search_twin(hay, needle) == (c["offset"], c["matched"]), (
            hay,
            needle,
        )


def test_vector_file_shape():
    assert len(_TEXTS) >= 100 and len(_SEARCHES) >= 40
    # the corpus hits the famous divergence-from-lower() cases
    joined = "".join(_s(c["cps"]) for c in _TEXTS)
    for ch in ("ß", "İ", "ﬁ", "ς", "ẞ", "ͅ"):
        assert ch in joined, ch
    # and at least one search matched inside a fold expansion
    assert any(c["offset"] == 0 and c["matched"] == 3 for c in _SEARCHES)
