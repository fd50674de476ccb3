"""Corpus emitter for scripts/gen_sztok_vectors.c: UTF-8 rune mechanics
(count / seek / decode) and token scanning (newlines / whitespaces /
delimiters) exercisers, one text per line as hex bytes (binary-safe —
the corpus deliberately includes ill-formed UTF-8).

Codepoints are restricted to UCD <= 14.0 assignments so the repo's
Python twin for sz_utf8_delimiters (general category P*/S*/Z* via
unicodedata) is comparable with the reference's UCD-17 tables.

Usage:
  gcc -O2 -I/root/reference/include -o /tmp/gen_sztok \
      scripts/gen_sztok_vectors.c
  python scripts/gen_sztok_inputs.py | /tmp/gen_sztok \
      > tests/data/sztok_vectors.json
"""

from __future__ import annotations

import random
import sys
import unicodedata

# the reference's 7-char newline set (utf8_tokens.h:17-56)
NEWLINES = "\n\x0b\x0c\r\x85  "
# the reference's 25-char White_Space set (utf8_tokens.h:58-121)
WHITESPACES = (
    "\t\n\x0b\x0c\r\x20\x85\xa0 "
    "           "
    "    　"
)

CURATED = [
    "",
    "plain ascii text, nothing special.",
    "a\r\nb\rc\nd\x0be\x0cf",                      # CRLF merge vs bare CR/LF
    "\r\n\r\n\n\r",                                 # adjacent newline runs
    "x\x85y z w",                         # NEL / LS / PS
    "ends with CR\r",
    "\rstarts with CR",
    "tab\tand nbsp\xa0ideographic　ogham ",
    WHITESPACES,                                    # the whole 25-char set
    NEWLINES,
    "Hello, World! (parens) [brackets] {braces} — em-dash … ellipsis",
    "math: a+b=c, 2<3>1, 50% & 10$ ~ ^ | \xa7\xb6†‡",
    "quotes: \"double\" 'single' \xabguillemets\xbb ‹single› „low“",
    "ZWSP​ZWNJ‌ZWJ‍ are NOT whitespace",
    "USV seps \x1c\x1d\x1e\x1f are NOT newlines",
    "日本語のテキスト、句読点。と読点、",
    "한국어 텍스트 입니다. 쉼표, 마침표.",
    "Ωμέγα; ελληνικά·",
    "emoji \U0001f600 mixed \U0001f389 with 4-byte \U0001f30d runes",
    "é combining, pre-composed \xe9",
    "\U00010400\U00010428 astral letters (Deseret)",
    "a" * 130,                                       # long ASCII run
    ("ab " * 50).strip(),
    "　" * 40,                                   # long 3-byte ws run
    "\U0001f30d" * 33,                               # long 4-byte run
]

# ill-formed UTF-8: maximal-subpart substitution + resync behavior
MALFORMED_HEX = [
    "80",                          # stray continuation
    "618062",                      # valid, stray, valid
    "c0af",                        # overlong '/'
    "e08080",                      # overlong NUL
    "eda080",                      # surrogate half
    "f4908080",                    # > U+10FFFF
    "f888808080",                  # 5-byte form
    "fffe",                        # invalid leads
    "e282",                        # truncated 3-byte at end
    "f09f8c",                      # truncated 4-byte at end
    "61e28261",                    # truncated 3-byte mid-string
    "c3",                          # lone lead at end
    "61c328",                      # lead + non-continuation
    "e180e2f09192f1bf41",          # mixed truncations (WHATWG example)
    "2c8020e2822e",                # punctuation around ill-formed parts
]


def _is_safe(cp: int) -> bool:
    if 0xD800 <= cp <= 0xDFFF:
        return False
    return unicodedata.category(chr(cp)) != "Cn"


POOL = sorted(
    {
        cp
        for cp in (
            [ord(c) for c in "abcXYZ019 .,!?-()\t\n\r"]
            + list(map(ord, WHITESPACES))
            + list(map(ord, NEWLINES))
            + [0x00E9, 0x0301, 0x00AB, 0x2014, 0x2026, 0x00A7, 0x00B6, 0x20AC,
               0x3001, 0x3002, 0xFF0C, 0xFF01, 0x30A2, 0x4E2D, 0xAC00, 0x0985,
               0x05D0, 0x0627, 0x1F600, 0x1F30D, 0x10400, 0x00F7, 0x00D7,
               0x2260, 0x200B, 0x200C, 0x200D, 0x001C, 0x001F, 0x007F, 0x0000]
        )
        if _is_safe(cp)
    }
)


def main() -> None:
    rng = random.Random(0x5EED70C)
    out = sys.stdout
    for t in CURATED:
        out.write(t.encode("utf-8").hex() + "\n")
    for h in MALFORMED_HEX:
        out.write(h + "\n")
    # fuzz: SIMD-boundary byte lengths via codepoint draws
    for n_cps in [1, 2, 3, 5, 8, 13, 16, 21, 31, 33, 47, 64, 65, 90, 128, 200]:
        for _rep in range(3):
            cps = [rng.choice(POOL) for _ in range(n_cps)]
            out.write("".join(map(chr, cps)).encode("utf-8").hex() + "\n")
    # fuzz with injected ill-formed bytes
    for _rep in range(20):
        cps = [rng.choice(POOL) for _ in range(rng.randint(4, 40))]
        raw = bytearray("".join(map(chr, cps)).encode("utf-8"))
        for _ in range(rng.randint(1, 3)):
            pos = rng.randint(0, len(raw))
            raw[pos:pos] = bytes([rng.choice([0x80, 0xC0, 0xC3, 0xED, 0xF5, 0xFF])])
        out.write(raw.hex() + "\n")


if __name__ == "__main__":
    main()
