"""Count-Min-Sketch merge law vs frozen vectors from the COMPILED
reference engine.

scripts/gen_szcms_vectors.cpp compiles the reference's
merge_count_min_sketches (stringzillas/fingerprints/serial.hpp:601-625)
and freezes 15 cases across dims {1,7,64,128,257} and three tie
densities (full-range u32 hashes, mod-16, mod-3 — the dense variants
plant many exact hash ties so the counts-add-on-tie branch is heavily
exercised), each with a chained (a ⊕ b) ⊕ d merge.

The repo's kernels.merge_count_min_sketches (the partial→final
aggregation law behind the streaming/chunked fingerprint path and the
cms_merge driver query) must reproduce every frozen output exactly.

Regenerate:
  cp scripts/forkunion_stub.h /tmp/fustub/forkunion.h
  g++ -O2 -std=c++17 -I/tmp/fustub -I/root/reference/include \
      -o /tmp/gen_szcms scripts/gen_szcms_vectors.cpp
  /tmp/gen_szcms > tests/data/szcms_vectors.json
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from sz_spark.kernels import merge_count_min_sketches

_DATA = os.path.join(os.path.dirname(__file__), "data", "szcms_vectors.json")


@pytest.fixture(scope="module")
def cases():
    with open(_DATA) as f:
        return json.load(f)["cases"]


def _arr(v):
    return np.asarray(v, dtype=np.uint32)


def test_merge_matches_reference(cases):
    assert len(cases) >= 15
    tie_total = 0
    for c in cases:
        ah, ac = _arr(c["a_h"]), _arr(c["a_c"])
        bh, bc = _arr(c["b_h"]), _arr(c["b_c"])
        dh, dc = _arr(c["d_h"]), _arr(c["d_c"])
        tie_total += int((ah == bh).sum())
        mh, mc = merge_count_min_sketches(ah, ac, bh, bc)
        assert mh.tolist() == c["ab_h"], c["dims"]
        assert mc.tolist() == c["ab_c"], c["dims"]
        m2h, m2c = merge_count_min_sketches(mh, mc, dh, dc)
        assert m2h.tolist() == c["abd_h"], c["dims"]
        assert m2c.tolist() == c["abd_c"], c["dims"]
        # commutativity holds on the same frozen data
        rh, rc = merge_count_min_sketches(bh, bc, ah, ac)
        assert np.array_equal(rh, mh) and np.array_equal(rc, mc)
    assert tie_total > 50  # the corpus genuinely exercises the tie branch
