"""Corpus emitter for scripts/gen_szseg_vectors.c: prints one text per
line as whitespace-separated decimal codepoints.

Reuses the EXACT differential-fuzz corpus from tests/test_uax_vec.py
(curated rule-interaction cases + the seeded POOL fuzz) plus
boundary-length sweeps in the reference test suite's style
(VECTOR_WIDTH_LENGTHS, SURVEY §5.3), so the frozen reference vectors
cover the same shapes the repo's own scalar<->vectorized differential
fuzz covers.

Usage:
  gcc -O2 -I/root/reference/include -o /tmp/gen_szseg \
      scripts/gen_szseg_vectors.c
  python scripts/gen_szseg_inputs.py | /tmp/gen_szseg \
      > tests/data/szseg_vectors.json
"""

from __future__ import annotations

import os
import random
import sys

_ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, _ROOT)  # sz_spark (imported by the test module)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
from test_uax_vec import CURATED, POOL, _fuzz_texts  # noqa: E402

# SIMD-register-boundary length sweep, reference test style
# (test/sz_helpers.py:1426) over a repeating mixed ASCII+mark+ideograph
# pattern so boundary effects near kernel block sizes are pinned.
_SWEEP_LENGTHS = [1, 2, 3, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65, 127, 128, 129]
_SWEEP_PATTERN = "ab c.D́ 中。x-1,5 \r\n\U0001F600"


def _sweep_texts():
    out = []
    for n in _SWEEP_LENGTHS:
        reps = (n // len(_SWEEP_PATTERN)) + 1
        out.append((_SWEEP_PATTERN * reps)[:n])
    return out


def main() -> None:
    rng = random.Random(90905)
    long_fuzz = [
        "".join(chr(rng.choice(POOL)) for _ in range(rng.randrange(200, 400)))
        for _ in range(12)
    ]
    texts = list(CURATED) + _sweep_texts() + _fuzz_texts(150, seed=909) + long_fuzz
    for t in texts:
        sys.stdout.write(" ".join(str(ord(c)) for c in t) + "\n")


if __name__ == "__main__":
    main()
