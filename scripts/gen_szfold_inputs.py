"""Corpus emitter for scripts/gen_szfold_vectors.c: case-folding /
normalization / uncased-order / uncased-search exercisers, one text per
line as decimal codepoints; after a "#SEARCH" marker, alternating
haystack / needle lines.

Codepoints are restricted to UCD <= 14.0 assignments so the repo's
Python twins (str.casefold, unicodedata.normalize — stability-policy
protected) are comparable with the reference's UCD-17 tables.

Usage:
  gcc -O2 -I/root/reference/include -o /tmp/gen_szfold \
      scripts/gen_szfold_vectors.c
  python scripts/gen_szfold_inputs.py | /tmp/gen_szfold \
      > tests/data/szfold_vectors.json
"""

from __future__ import annotations

import random
import sys

CURATED = [
    "",
    "Hello, World!",
    "Straße STRASSE straße",
    "İstanbul ı I i",                       # Turkish dotted/dotless
    "ſ long s ſs",                          # U+017F folds to s
    "ΣΊΣΥΦΟΣ σίσυφος Σίσυφος ς",            # final sigma
    "ﬁles ﬂow ﬀ ﬃ ﬆ ﬅ",                    # ligatures FB00-FB06
    "ẞ vs ß",                               # capital sharp s U+1E9E
    "Å Å Å",                          # U+212B vs U+00C5 vs A+ring
    "Ω vs Ω",                               # ohm U+2126 vs omega
    "①②③ ½ ¼ x²",                          # NFKC digits/fractions
    "ｱｲｳ ＡＢＣ",                            # half/full width
    "é é ȩ́ ȩ́",  # composition + reorder
    "q̣̇ q̣̇",          # canonical ordering (ccc 230/220)
    "क़ क़ क़",                     # composition exclusion
    "한 한 한국",            # Hangul jamo composition
    "각 각",      # syllable + trailing jamo
    "豈 豈 豈",                      # CJK compat ideograph
    "ᾳ ᾼ ᾳͅ",                     # ypogegrammeni folding
    "և և ﬓ",                           # Armenian ligatures
    "Ǆǅǆ ǈ Ǌ",                              # titlecase digraphs
    "ᏣᎳᎩ ꮳꮃꭹ",                              # Cherokee (fold direction)
    "𐐀𐐨 𐐁𐐩",                                # Deseret astral case pairs
    "MASSE Maße masse",
    "x‍̈y",                       # ZWJ + combining
    "İıIiı̇", # dotless+dot combos
    "aﬁb FIle fiLE",
    "ΐ ΰ ΐΰ",                     # special fold expansions
    "ŉ ŉ",                             # n preceded by apostrophe
    "ᾈ ᾀ ᾈ",                           # prosgegrammeni titlecase
]

POOL = (
    [ord(c) for c in "abcXYZ019 .,!?-"]
    + [0x00DF, 0x1E9E, 0x0130, 0x0131, 0x017F, 0x03A3, 0x03C2, 0x03C3,
       0xFB00, 0xFB01, 0xFB03, 0x212B, 0x2126, 0x00C5, 0x00E9, 0x0301,
       0x0300, 0x0308, 0x0327, 0x0323, 0x0345, 0x2460, 0x00BD, 0xFF21,
       0xFF71, 0x1100, 0x1161, 0x11A8, 0xAC00, 0xAC01, 0xF900, 0x0958,
       0x093C, 0x0915, 0x1FB3, 0x0587, 0x01C4, 0x01C5, 0x01C6, 0x13A0,
       0xAB70, 0x10400, 0x10428, 0x0390, 0x0149, 0x1F88, 0x200D, 0x2000]
)


def _fuzz(n, seed):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        hi = 80 if i % 5 == 4 else 24
        out.append("".join(chr(rng.choice(POOL)) for _ in range(rng.randrange(0, hi))))
    return out


SEARCH = [
    ("Hello World", "WORLD"),
    ("Straße", "STRASSE"),
    ("STRASSE", "straße"),
    ("the MASSE case", "maße"),
    ("İstanbul", "i̇stanbul"),
    ("ﬁle of ﬁles", "FI"),
    ("ΣΊΣΥΦΟΣ myth", "σίσυφος"),
    ("nothing here", "zebra"),
    ("ẞig ẞ", "ss"),
    ("aaaa ſs bbbb", "SS"),
    ("ΐΰ combo", "ΐ"),
    ("casefold at END", "end"),
    ("x" * 40 + "NeedLe" + "y" * 40, "needle"),
]


def main() -> None:
    texts = CURATED + _fuzz(80, 141421)
    w = sys.stdout.write
    for t in texts:
        w(" ".join(str(ord(c)) for c in t) + "\n")
    w("#SEARCH\n")
    rng = random.Random(271828)
    pairs = list(SEARCH)
    # fuzz searches: needle = a cased perturbation of a real slice
    for t in _fuzz(40, 161803):
        if len(t) < 4:
            continue
        i = rng.randrange(0, len(t) - 2)
        j = rng.randrange(i + 1, min(len(t), i + 8))
        needle = t[i:j].swapcase() or t[i:j]
        pairs.append((t, needle))
    for hay, needle in pairs:
        if not needle:
            continue
        w(" ".join(str(ord(c)) for c in hay) + "\n")
        w(" ".join(str(ord(c)) for c in needle) + "\n")


if __name__ == "__main__":
    main()
