"""Sequence argsort / uncased argsort / set intersection vs frozen
vectors from the COMPILED reference serial kernels.

scripts/gen_szsort_vectors.c compiles the reference's serial kernels —
sz_sequence_argsort_serial, sz_sequence_argsort_uncased_serial
(sort.h:119-126; stable, reverse + top_count partial-order flags,
malformed bytes compared as raw one-byte units), and
sz_sequence_intersect_serial (intersect.h:237; strict distinct-set
intersection with position pairs) — over 33 argsort cases (dup / case /
prefix / empty / malformed zoo, counts crossing the 32-element
trivial-sort threshold) and 7 intersect cases.

Pinned contracts the repo's queries build on (str_sorted_topk's byte
and casefold-key orderings, str_intersect's distinct inner join):

- argsort IS the stable ascending sort by raw bytes; reverse=True is
  the stable descending sort (equal elements KEEP input order, exactly
  Python's sorted(reverse=True)); with top_count=k the first k entries
  equal the full stable sort's first k.
- uncased argsort IS the stable sort by the casefold-expansion
  CODEPOINT-VALUE key (str.casefold per the szfold pinning), with each
  byte that does not begin a well-formed codepoint contributing its raw
  byte value as one unit (lossless malformed handling).  Pinning found
  the comparison is over unit VALUES, not folded UTF-8 bytes: a raw
  0xC3 unit orders before é.  For valid strings (every Spark string)
  the two are byte-identical, so the product path is unaffected.
- intersect returns exactly the distinct-set intersection: every
  (first_positions[i], second_positions[i]) pair references equal
  strings, and the matched string set is set(a) & set(b).

Regenerate:
  gcc -O2 -I/root/reference/include -o /tmp/gen_szsort \
      scripts/gen_szsort_vectors.c
  /tmp/gen_szsort > tests/data/szsort_vectors.json
"""

from __future__ import annotations

import json
import os

import pytest

_DATA = os.path.join(os.path.dirname(__file__), "data", "szsort_vectors.json")


@pytest.fixture(scope="module")
def vectors():
    with open(_DATA) as f:
        return json.load(f)


def _fold_key(raw: bytes) -> tuple:
    """Casefolded comparison key with the reference's lossless malformed
    handling: well-formed codepoints contribute their casefold-expansion
    CODEPOINT VALUES, any other byte contributes its raw byte value as a
    single unit (with single-byte resync).  Units compare numerically —
    a raw 0xC3 unit (195) orders before é (233) even though é's UTF-8
    encoding starts with byte 0xC3; for fully valid strings this is
    byte-identical to comparing folded UTF-8 bytes."""
    out = []
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        ln = 1 if b < 0x80 else 2 if 0xC2 <= b <= 0xDF else 3 if 0xE0 <= b <= 0xEF else 4 if 0xF0 <= b <= 0xF4 else 0
        if ln and i + ln <= n:
            try:
                ch = raw[i : i + ln].decode("utf-8", "strict")
            except UnicodeDecodeError:
                ch = None
            if ch is not None:
                out.extend(ord(f) for f in ch.casefold())
                i += ln
                continue
        out.append(b)
        i += 1
    return tuple(out)


def test_argsort_matches_reference(vectors):
    for c in vectors["argsort"]:
        strs = [bytes.fromhex(h) for h in c["strs"]]
        idx = list(range(len(strs)))
        want_plain = sorted(idx, key=lambda i: strs[i], reverse=bool(c["reverse"]))
        want_uncased = sorted(idx, key=lambda i: _fold_key(strs[i]), reverse=bool(c["reverse"]))
        top = c["top"] or len(strs)
        assert c["order"][:top] == want_plain[:top], c
        assert c["order_uncased"][:top] == want_uncased[:top], c
        # even partial sorts must emit a valid permutation
        assert sorted(c["order"]) == idx
        assert sorted(c["order_uncased"]) == idx


def test_intersect_matches_reference(vectors):
    assert len(vectors["intersect"]) >= 5
    for c in vectors["intersect"]:
        a = [bytes.fromhex(h) for h in c["a"]]
        b = [bytes.fromhex(h) for h in c["b"]]
        want = set(a) & set(b)
        assert c["size"] == len(want), c
        assert len(c["first_pos"]) == len(c["second_pos"]) == c["size"]
        matched = set()
        for fp, sp in zip(c["first_pos"], c["second_pos"]):
            assert a[fp] == b[sp], c
            matched.add(a[fp])
        assert matched == want, c
        # positions are unique on both sides (strict distinct-set join)
        assert len(set(c["first_pos"])) == c["size"]
        assert len(set(c["second_pos"])) == c["size"]
