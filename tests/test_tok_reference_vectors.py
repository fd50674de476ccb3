"""UTF-8 rune mechanics + token scanning vs frozen vectors from the
COMPILED reference serial kernels.

scripts/gen_sztok_vectors.c compiles the reference's serial kernels —
sz_utf8_count_serial / sz_utf8_seek_serial / sz_utf8_decode_serial
(utf8_runes.h:106-110) and sz_utf8_newlines_serial /
sz_utf8_whitespaces_serial / sz_utf8_delimiters_serial
(utf8_tokens.h:148-156) — over 108 cases: the full 25-char White_Space
and 7-char newline (+CRLF merge) sets, P*/S*/Z* delimiter zoo, emoji /
astral / CJK, long single-width runs, and 35 deliberately ill-formed
byte strings (overlongs, surrogates, out-of-range, truncations, stray
continuations).

Pinned contracts the repo's queries build on (str_utf8_ops
n_codepoints, str_segmentation_ops separator-RUN extraction,
str_transform_ops splitlines/whitespace splits):

- sz_utf8_count counts non-continuation bytes (a truncated lead+conts
  group is ONE character); sz_utf8_seek returns the Nth start byte,
  NULL when n >= count (NULL for n=0 on empty input).
- sz_utf8_decode emits one U+FFFD per MAXIMAL ill-formed subpart
  (WHATWG rule — bit-identical to CPython's errors='replace') and
  leaves a well-formed truncated trailing prefix unconsumed
  (== CPython's incremental decoder with final=False).
- newline scanning merges CRLF into one length-2 match; whitespace
  matches are per-codepoint (no merging); delimiters are the general
  categories P*, S*, Z*; ill-formed bytes are skipped, never reported.
- capacity-limited calls satisfy the resume contract: re-scanning from
  bytes_consumed yields exactly the remaining matches.

Regenerate:
  gcc -O2 -I/root/reference/include -o /tmp/gen_sztok \
      scripts/gen_sztok_vectors.c
  python scripts/gen_sztok_inputs.py | /tmp/gen_sztok \
      > tests/data/sztok_vectors.json
"""

from __future__ import annotations

import codecs
import json
import os
import unicodedata

import pytest

_DATA = os.path.join(os.path.dirname(__file__), "data", "sztok_vectors.json")

_NEWLINES = frozenset(map(ord, "\n\x0b\x0c\r\x85  "))
_WHITESPACES = frozenset(
    map(
        ord,
        "\t\n\x0b\x0c\r \x85\xa0 "
        "           "
        "    　",
    )
)


@pytest.fixture(scope="module")
def cases():
    with open(_DATA) as f:
        return json.load(f)["cases"]


def _iter_codepoints(h: bytes):
    """Yield (offset, byte_length, codepoint) for every well-formed
    sequence; ill-formed bytes are stepped over one at a time (a valid
    sequence can never start on a continuation byte, so single-byte
    resync finds every well-formed match regardless of subpart
    grouping)."""
    i, n = 0, len(h)
    while i < n:
        b = h[i]
        ln = 1 if b < 0x80 else 2 if 0xC2 <= b <= 0xDF else 3 if 0xE0 <= b <= 0xEF else 4 if 0xF0 <= b <= 0xF4 else 0
        if ln and i + ln <= n:
            try:
                cp = h[i : i + ln].decode("utf-8", "strict")
            except UnicodeDecodeError:
                cp = None
            if cp is not None:
                yield i, ln, ord(cp)
                i += ln
                continue
        i += 1


def _scan(h: bytes, kind: str):
    """Twin of the utf8_tokens scanners: (offsets, lengths)."""
    offs, lens = [], []
    pend_cr = -1  # offset of a CR awaiting LF merge (newlines only)
    for off, ln, cp in _iter_codepoints(h):
        if kind == "newlines":
            if pend_cr >= 0:
                if cp == 0x0A and off == pend_cr + 1:
                    offs.append(pend_cr)
                    lens.append(2)
                    pend_cr = -1
                    continue
                offs.append(pend_cr)
                lens.append(1)
                pend_cr = -1
            if cp == 0x0D:
                pend_cr = off
            elif cp in _NEWLINES:
                offs.append(off)
                lens.append(ln)
        elif kind == "whitespaces":
            if cp in _WHITESPACES:
                offs.append(off)
                lens.append(ln)
        else:  # delimiters: general category P* / S* / Z* (+ every ws/nl)
            if unicodedata.category(chr(cp))[0] in "PSZ" or cp in _WHITESPACES:
                offs.append(off)
                lens.append(ln)
    if kind == "newlines" and pend_cr >= 0:
        offs.append(pend_cr)
        lens.append(1)
    return offs, lens


def test_count_and_seek_match_reference(cases):
    for c in cases:
        h = bytes.fromhex(c["h"])
        count = sum(1 for b in h if (b & 0xC0) != 0x80)
        assert count == c["count"], c["h"]
        starts = [i for i, b in enumerate(h) if (b & 0xC0) != 0x80]
        for n_str, want in c["seek"].items():
            n = int(n_str)
            got = starts[n] if n < count else -1
            assert got == want, (c["h"], n)


def test_decode_matches_reference(cases):
    for c in cases:
        h = bytes.fromhex(c["h"])
        dec = codecs.getincrementaldecoder("utf-8")("replace")
        s = dec.decode(h, final=False)
        pending = dec.getstate()[0]
        assert [ord(ch) for ch in s] == c["runes"], c["h"]
        assert len(h) - len(pending) == c["decode_consumed"], c["h"]
        if "cap3_runes" in c:
            assert c["cap3_runes"] == c["runes"][: len(c["cap3_runes"])], c["h"]
            # resume contract: decoding from the cursor yields the rest
            dec2 = codecs.getincrementaldecoder("utf-8")("replace")
            s2 = dec2.decode(h[c["cap3_consumed"] :], final=False)
            assert [ord(ch) for ch in s2] == c["runes"][len(c["cap3_runes"]) :], c["h"]


@pytest.mark.parametrize("kind", ["newlines", "whitespaces", "delimiters"])
def test_token_scans_match_reference(cases, kind):
    n_matches = 0
    for c in cases:
        h = bytes.fromhex(c["h"])
        offs, lens = _scan(h, kind)
        rec = c[kind]
        assert offs == rec["offs"], (c["h"], kind)
        assert lens == rec["lens"], (c["h"], kind)
        assert rec["consumed"] == len(h), (c["h"], kind)
        n_matches += len(offs)
        if "cap2_n" in rec:
            assert rec["cap2_n"] == 2
            cut = rec["cap2_consumed"]
            # resume contract: scanning the remainder yields the rest
            r_offs, r_lens = _scan(h[cut:], kind)
            assert [o + cut for o in r_offs] == rec["offs"][2:], (c["h"], kind)
            assert r_lens == rec["lens"][2:], (c["h"], kind)
    assert n_matches > 200  # the corpus genuinely exercises the scanner
