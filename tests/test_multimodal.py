"""Real-container codec tests: the WAV writer/reader against the stdlib
``wave`` module (an independent parser), PNG chunk/CRC structure checks,
tamper/truncation rejection, and the synthesis parameterization the SQL
oracle mirrors."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

from sz_spark import multimodal as mm


def test_wav_roundtrip_vs_stdlib():
    samples = ((np.arange(1000) * 3 + 11) % 256).astype(np.uint8)
    payload = mm.make_wav(16000, samples)
    # our decoder
    rate, n, mean, ok = mm.wav_decode(payload)
    assert (rate, n, ok) == (16000, 1000, True)
    assert mean == float(int(samples.sum(dtype=np.int64)) / 1000)
    # independent stdlib parser agrees on every header field + content
    with wave.open(io.BytesIO(payload)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        assert w.getnframes() == 1000
        assert w.readframes(1000) == samples.tobytes()


def test_png_structure_and_roundtrip():
    px = ((np.arange(12 * 9) * 13) % 256).astype(np.uint8)
    payload = mm.make_png(12, 9, px)
    assert payload[:8] == mm.PNG_SIG
    # IHDR is first chunk with correct dims; IEND terminates
    (ihdr_len,) = struct.unpack(">I", payload[8:12])
    assert payload[12:16] == b"IHDR" and ihdr_len == 13
    w, h = struct.unpack(">II", payload[16:24])
    assert (w, h) == (12, 9)
    assert payload[-8:-4] == b"IEND"
    # decode round-trips dims and content mean
    dw, dh, mean, ok = mm.png_decode(payload)
    assert (dw, dh, ok) == (12, 9, True)
    assert mean == float(int(px.sum(dtype=np.int64)) / px.size)
    # and the IDAT genuinely holds zlib-compressed filtered scanlines
    (idat_len,) = struct.unpack(">I", payload[33:37])
    raw = zlib.decompress(payload[41 : 41 + idat_len])
    assert len(raw) == 9 * (12 + 1)


def test_png_rejects_corruption():
    px = np.zeros(64, dtype=np.uint8)
    payload = bytearray(mm.make_png(8, 8, px))
    payload[20] ^= 0xFF  # flip a byte inside IHDR -> CRC must fail
    assert mm.png_decode(bytes(payload)) == (0, 0, 0.0, False)
    assert mm.png_decode(b"notapng") == (0, 0, 0.0, False)
    truncated = mm.make_png(8, 8, px)[:30]
    assert mm.png_decode(truncated)[3] is False


def test_wav_rejects_corruption():
    payload = mm.make_wav(8000, np.zeros(100, dtype=np.uint8))
    assert mm.wav_decode(payload[:20])[3] is False
    assert mm.wav_decode(b"RIFFxxxxNOPE")[3] is False
    # stereo/16-bit flags rejected (only PCM mono 8-bit supported)
    bad = bytearray(payload)
    bad[22] = 2  # channels = 2
    assert mm.wav_decode(bytes(bad))[3] is False


def test_synth_params_match_sql_parameterization():
    """The Python synthesis and the DuckDB oracle must share one
    parameterization — spot-check the formulas the SQL inlines."""
    for doc_id in (0, 1, 2, 7, 100, 101, 4999):
        p = mm._synth_params(doc_id)
        if doc_id % 2 == 0:
            assert p == {
                "format": "png",
                "width": doc_id % 24 + 8,
                "height": doc_id % 16 + 8,
            }
        else:
            assert p == {
                "format": "wav",
                "sample_rate": 8000 + (doc_id % 4) * 4000,
                "n_samples": doc_id % 500 + 100,
            }
        payload = mm._synth_payload(doc_id)
        if p["format"] == "png":
            w, h, _, ok = mm.png_decode(payload)
            assert ok and (w, h) == (p["width"], p["height"])
        else:
            rate, n, _, ok = mm.wav_decode(payload)
            assert ok and (rate, n) == (p["sample_rate"], p["n_samples"])
