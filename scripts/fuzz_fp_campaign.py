#!/usr/bin/env python
"""Large-scale differential campaign for the fingerprint engine: fresh
random texts through the COMPILED reference MinHash+CMS engines vs the
repo's vectorized kernel — beyond the frozen fixtures (new seed offsets
and extra random lengths every run, both sliced and fallback layouts).

Usage:
  cp scripts/forkunion_stub.h /tmp/fustub/forkunion.h
  g++ -O2 -std=c++17 -I/tmp/fustub -I/root/reference/include \
      -o /tmp/gen_szfp scripts/gen_szfp_vectors.cpp
  python scripts/fuzz_fp_campaign.py [n_extra_lengths] [seed_offset]

The generator reproduces tests/data/szfp_vectors.json bit-for-bit when
run with no arguments.  Exits nonzero on any divergence; campaign
results are recorded in COVERAGE.md.
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


def _corpus_text(length: int, seed_offset: int) -> bytes:
    if length == -120:
        return b"ab" * 60
    state = (0x5EED0F5EED0F5EED + seed_offset + length) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    for _ in range(length):
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out.append((z ^ (z >> 31)) % 64 + 32)
    return bytes(out)


def main() -> int:
    n_extra = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else random.SystemRandom().randrange(1 << 31)
    print(f"[campaign] {n_extra} extra lengths per config, seed offset {seed}")
    gen = "/tmp/gen_szfp"
    if not os.path.exists(gen):
        sys.exit("build /tmp/gen_szfp first (see module docstring)")
    out = subprocess.run([gen, str(seed), str(n_extra)], capture_output=True, text=True, check=True)
    data = json.loads(out.stdout)

    bad = 0
    for cfg in data["configs"]:
        texts = [_corpus_text(t["len"], seed) for t in cfg["texts"]]
        want_h = np.array([t["hashes"] for t in cfg["texts"]], dtype=np.uint32)
        want_c = np.array([t["counts"] for t in cfg["texts"]], dtype=np.uint32)
        h, c = K.fingerprints(texts, ndim=cfg["dims"], widths=cfg["widths"], seed=cfg["seed"])
        n_bad = int((h != want_h).any(axis=1).sum() + (c != want_c).any(axis=1).sum())
        print(f"[campaign] {cfg['name']}: {n_bad} divergent rows / {len(texts)} texts "
              f"({h.shape[1]} dims)")
        bad += n_bad
    print(f"[campaign] TOTAL divergent rows: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
