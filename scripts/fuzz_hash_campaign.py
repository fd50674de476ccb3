#!/usr/bin/env python
"""Large-scale differential campaign for the exact AES sz.hash: fresh
random lengths/corpora through the COMPILED reference serial kernel vs
the repo's sz_spark.szhash reimplementation — beyond the frozen
fixtures (new seed offsets and up to 256 extra lengths every run).

Usage:
  gcc -O2 -I/root/reference/include -o /tmp/gen_szhash \
      scripts/gen_szhash_vectors.c
  python scripts/fuzz_hash_campaign.py [n_extra_lengths] [seed_offset]

The generator reproduces tests/data/szhash_vectors.json bit-for-bit
when run with no arguments.  Exits nonzero on any divergence; campaign
results are recorded in COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

_ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, _ROOT)

from sz_spark.szhash import SzHasher, sz_hash, sz_hash_multiseed  # noqa: E402

_SEEDS = (0, 42, 0xFEEDFACECAFEBEEF)


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
        out.append(z & 0xFF)
    return bytes(out)


def main() -> int:
    n_extra = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else random.SystemRandom().randrange(1 << 31)
    print(f"[campaign] {n_extra} extra lengths, seed offset {seed}")
    gen = "/tmp/gen_szhash"
    if not os.path.exists(gen):
        sys.exit("build /tmp/gen_szhash first (see module docstring)")
    out = subprocess.run([gen, str(seed), str(n_extra)], capture_output=True, text=True, check=True)
    data = json.loads(out.stdout)

    bad = 0
    n = 0
    for row in data["hash"]:
        text = _corpus(row["len"], 0x1234567890ABCDEF + seed + row["len"])
        if sz_hash(text, row["seed"]) != row["hash"]:
            bad += 1
            if bad <= 3:
                print(f"  DIVERGENCE hash len={row['len']} seed={row['seed']}")
        n += 1
    print(f"[campaign] hash: {bad}/{n} divergences")

    m_bad = m_n = 0
    for row in data["multiseed"]:
        text = _corpus(row["len"], 0x1234567890ABCDEF + seed + row["len"])
        got = [int(v) for v in sz_hash_multiseed(text, _SEEDS)]
        if got != row["hashes"]:
            m_bad += 1
        m_n += 1
    print(f"[campaign] multiseed: {m_bad}/{m_n} divergences")

    s_bad = s_n = 0
    for row in data["streaming"]:
        text = _corpus(row["len"], 0xABCDEF0123456789 + seed + row["len"])
        h = SzHasher(seed=row["seed"])
        for i in range(0, len(text), row["chunk"]):
            h.update(text[i : i + row["chunk"]])
        if h.digest() != row["hash"]:
            s_bad += 1
        s_n += 1
    print(f"[campaign] streaming: {s_bad}/{s_n} divergences")

    total = bad + m_bad + s_bad
    print(f"[campaign] TOTAL divergences: {total}")
    return 1 if total else 0


if __name__ == "__main__":
    sys.exit(main())
