"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Round 3 replaces the round-2 synthetic-header fake with REAL formats,
dependency-free (stdlib zlib/struct only):

* PNG — full spec-compliant files: 8-byte signature, IHDR (width,
  height, bit depth 8, grayscale), zlib-compressed IDAT scanlines with
  per-row filter bytes, IEND; every chunk CRC-32-stamped.  The decoder
  walks the chunk stream, verifies CRCs, inflates IDAT, strips filter
  bytes, and reports width/height/pixel stats.
* WAV — canonical RIFF/WAVE: fmt chunk (PCM, mono, 8-bit) + data
  chunk.  The decoder parses the chunk list and reports sample rate /
  sample count / amplitude stats (pytest cross-checks it against the
  stdlib ``wave`` reader).

Payload content is synthesized deterministically from doc_id so the
decoded metadata is ANALYTICALLY SQL-derivable — the DuckDB oracle
recomputes every exported column without any codec, which makes the
decode path a hard round-trip check (encode -> real container bytes ->
decode -> exact parameters + content mean).

Heavier codecs (JPEG/MP4 via Pillow/ffmpeg) are not in this container;
the Spark-side contract (Arrow-batched mapInPandas, bytes in, typed
struct out) is what they would plug into.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PNG_SIG = b"\x89PNG\r\n\x1a\n"

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("mean_e6", T.LongType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


# --- encoders (real containers, deterministic content) ---------------------


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def make_png(width: int, height: int, pixels: np.ndarray) -> bytes:
    """A valid 8-bit grayscale PNG of ``pixels`` (length width*height)."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    rows = pixels.reshape(height, width)
    raw = b"".join(b"\x00" + rows[r].tobytes() for r in range(height))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def make_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """A canonical mono 8-bit PCM WAV of ``samples`` (uint8)."""
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        # RIFF chunks are word-aligned: odd-length data gets a pad byte
        # (not counted in the chunk length) — wav_decode and stdlib wave
        # both already skip it (ADVICE r3: strict RIFF canonical form)
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


# --- decoders (header + content parsing, CRC/structure verified) ------------


def png_decode(payload: bytes) -> tuple[int, int, float, bool]:
    """Parse a PNG: verify signature and chunk CRCs, read IHDR
    dimensions, inflate IDAT, strip per-row filter bytes, return
    (width, height, pixel_mean, ok)."""
    if payload is None or len(payload) < 8 or payload[:8] != PNG_SIG:
        return 0, 0, 0.0, False
    pos, width, height, idat = 8, 0, 0, b""
    try:
        while pos + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            tag = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack(
                ">I", payload[pos + 8 + length : pos + 12 + length]
            )
            if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
                return 0, 0, 0.0, False
            if tag == b"IHDR":
                width, height, bit_depth, color = struct.unpack(">IIBB", data[:10])
                if bit_depth != 8 or color != 0:  # only grayscale-8 supported
                    return 0, 0, 0.0, False
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + length
        raw = zlib.decompress(idat)
    except (struct.error, zlib.error):
        return 0, 0, 0.0, False
    if len(raw) != height * (width + 1):
        return 0, 0, 0.0, False
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, width + 1)
    if (rows[:, 0] != 0).any():  # only filter type 0 supported
        return 0, 0, 0.0, False
    px = rows[:, 1:]
    mean = float(int(px.sum(dtype=np.int64)) / px.size) if px.size else 0.0
    return int(width), int(height), mean, True


def wav_decode(payload: bytes) -> tuple[int, int, float, bool]:
    """Parse a RIFF/WAVE: fmt (PCM mono 8-bit) + data chunks, return
    (sample_rate, n_samples, sample_mean, ok)."""
    if (
        payload is None
        or len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        return 0, 0, 0.0, False
    pos, rate, bits, channels, data = 12, 0, 0, 0, None
    try:
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + length]
            if tag == b"fmt ":
                fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
                (bits,) = struct.unpack("<H", body[14:16])
                if fmt_code != 1:
                    return 0, 0, 0.0, False
            elif tag == b"data":
                data = body
            pos += 8 + length + (length & 1)
    except struct.error:
        return 0, 0, 0.0, False
    if data is None or channels != 1 or bits != 8:
        return 0, 0, 0.0, False
    samples = np.frombuffer(data, dtype=np.uint8)
    mean = (
        float(int(samples.sum(dtype=np.int64)) / samples.size)
        if samples.size
        else 0.0
    )
    return int(rate), int(samples.size), mean, True


# --- deterministic synthesis (the SQL-oracle-able parameterization) ---------


def _synth_params(doc_id: int) -> dict:
    """The shared (Python == SQL) parameterization: even docs get a PNG,
    odd docs a WAV; dimensions/rates/content are pure doc_id math."""
    if doc_id % 2 == 0:
        w = doc_id % 24 + 8
        h = doc_id % 16 + 8
        return {"format": "png", "width": w, "height": h}
    return {
        "format": "wav",
        "sample_rate": 8000 + (doc_id % 4) * 4000,
        "n_samples": doc_id % 500 + 100,
    }


def _synth_payload(doc_id: int) -> bytes:
    p = _synth_params(doc_id)
    if p["format"] == "png":
        n = p["width"] * p["height"]
        px = ((doc_id * 7 + np.arange(n, dtype=np.int64) * 13) % 256).astype(
            np.uint8
        )
        return make_png(p["width"], p["height"], px)
    n = p["n_samples"]
    smp = ((doc_id * 11 + np.arange(n, dtype=np.int64) * 3) % 256).astype(np.uint8)
    return make_wav(p["sample_rate"], smp)


def synthesize_binary_column(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary): real PNG/WAV bytes per doc, generated
    in Arrow batches (no external data; content is doc_id math so the
    decode oracle can recompute it analytically)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_synth_payload(int(i)) for i in ids]}
            )

    return docs.select("doc_id").mapInPandas(run, schema)


def decode_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches of (doc_id, payload) ->
    DECODED_SCHEMA rows, format sniffed from the container signature.
    The mean is exported as floor(mean * 1e6) — both engines divide the
    same exact integers in IEEE double, so the value is bit-identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is not None and payload[:8] == PNG_SIG:
                    w, h, mean, ok = png_decode(payload)
                    rows.append(
                        (doc_id, "png", w, h, 0, 0, int(np.floor(mean * 1e6)), ok)
                    )
                elif payload is not None and payload[:4] == b"RIFF":
                    rate, n, mean, ok = wav_decode(payload)
                    rows.append(
                        (doc_id, "wav", 0, 0, rate, n, int(np.floor(mean * 1e6)), ok)
                    )
                else:
                    rows.append((doc_id, "unknown", 0, 0, 0, 0, 0, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "format",
                    "width",
                    "height",
                    "sample_rate",
                    "n_samples",
                    "mean_e6",
                    "ok",
                ],
            )

    return binary_df.mapInPandas(run, DECODED_SCHEMA)
