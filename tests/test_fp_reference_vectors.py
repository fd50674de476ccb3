"""Fingerprint kernels vs frozen vectors from the COMPILED reference engine.

scripts/gen_szfp_vectors.cpp compiles the reference's header-only
fingerprint engine (stringzillas/fingerprints.hpp, serial backend — the
per-width ``floating_rolling_hashers<serial, 64>`` slices and the
per-dimension ``basic_rolling_hashers`` fallback, selected exactly as
``szs_fingerprints_init`` does in c/stringzillas/fingerprints.cuh:42-160)
and freezes MinHash+count vectors for seven configurations covering BOTH
engine layouts, the default width set, ragged dimension counts, several
seeds, every text-length regime (empty, shorter-than-window, one-window,
long), and a repetitive min-count-tie exerciser.

This is the strongest parity statement available for the flagship
operator: ``kernels.fingerprints`` is bit-exact BY MEASUREMENT against
the reference's own compiled f64-FMA/Barrett arithmetic — hashes AND
counts — not merely against the repo's independently-derived DuckDB
twins (which share this repo's reading of the spec).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from sz_spark import kernels as K

_VECTORS_PATH = os.path.join(os.path.dirname(__file__), "data", "szfp_vectors.json")

with open(_VECTORS_PATH) as _f:
    _VECTORS = json.load(_f)


def _corpus_text(length: int) -> bytes:
    """Regenerate the harness corpus: printable-ish splitmix64 bytes,
    state seeded with 0x5EED0F5EED0F5EED + length.  A sentinel length of
    -120 denotes the repetitive 'ab' * 60 min-count-tie exerciser."""
    if length == -120:
        return b"ab" * 60
    state = (0x5EED0F5EED0F5EED + length) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    for _ in range(length):
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        out.append((z ^ (z >> 31)) % 64 + 32)
    return bytes(out)


def test_vector_file_covers_both_engine_layouts():
    layouts = {cfg["texts"][0]["sliced"] for cfg in _VECTORS["configs"]}
    assert layouts == {True, False}
    assert _VECTORS["slice_k"] == K.FINGERPRINT_SLICE


@pytest.mark.parametrize(
    "cfg", _VECTORS["configs"], ids=[c["name"] for c in _VECTORS["configs"]]
)
def test_fingerprints_bit_exact_vs_compiled_reference(cfg):
    texts = [_corpus_text(t["len"]) for t in cfg["texts"]]
    expected_h = np.array([t["hashes"] for t in cfg["texts"]], dtype=np.uint32)
    expected_c = np.array([t["counts"] for t in cfg["texts"]], dtype=np.uint32)
    h, c = K.fingerprints(
        texts, ndim=cfg["dims"], widths=cfg["widths"], seed=cfg["seed"]
    )
    np.testing.assert_array_equal(h, expected_h)
    np.testing.assert_array_equal(c, expected_c)


@pytest.mark.parametrize(
    "cfg", _VECTORS["configs"], ids=[c["name"] for c in _VECTORS["configs"]]
)
def test_layout_dispatch_matches_reference_engine_selection(cfg):
    # the harness records which engine szs_fingerprints_init would pick;
    # dim_window_widths must make the same sliced-vs-fallback decision
    widths = K.dim_window_widths(cfg["dims"], cfg["widths"])
    n_w = len(cfg["widths"])
    per = cfg["dims"] // n_w
    sliced = (cfg["dims"] % n_w == 0) and (per % K.FINGERPRINT_SLICE == 0)
    assert sliced == cfg["texts"][0]["sliced"]
    if sliced:
        expect = [cfg["widths"][(d // K.FINGERPRINT_SLICE) % n_w] for d in range(cfg["dims"])]
    else:
        expect = [cfg["widths"][d % n_w] for d in range(cfg["dims"])]
    assert widths.tolist() == expect
