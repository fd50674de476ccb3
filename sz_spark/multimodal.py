"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container ships no image/audio codecs, so the DECODE step is a
deterministic fake (parse a tiny synthetic header) clearly marked below;
everything Spark-side — schema, partition sizing, mapInPandas batch
shape, metadata extraction — is real and tested.  Swapping
:func:`_fake_decode` for Pillow/torchaudio is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: synthetic 14-byte ASCII header: b'SZIM' + lpad(width,5,'0') +
#: lpad(height,5,'0') — see synthesize_binary_column / _fake_decode
MAGIC = b"SZIM"
HEADER_LEN = 14

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def synthesize_binary_column(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic binary payloads from the text corpus: a SZIM header
    (width/height derived from doc stats) + the UTF-8 bytes as 'pixels'.
    Stands in for real image bytes without external data."""
    w = (F.length(text_col) % 256 + 16).cast("int")
    h = (F.col("doc_id") % 64 + 16).cast("int")
    # 14-byte ASCII header: 'SZIM' + lpad(width,5) + lpad(height,5)
    header = F.concat(
        F.lit("SZIM"),
        F.lpad(w.cast("string"), 5, "0"),
        F.lpad(h.cast("string"), 5, "0"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.concat(header, F.col(text_col)), "utf-8").alias("payload"),
        w.alias("meta_width"),
        h.alias("meta_height"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, float, bool]:
    """DETERMINISTIC FAKE DECODER — stands in for a real image codec.

    A production build replaces this with e.g. PIL.Image.open; the
    Spark-side contract (bytes in, typed struct out) is unchanged.
    """
    if payload is None or len(payload) < HEADER_LEN or payload[:4] != MAGIC:
        return 0, 0, 0.0, False
    try:
        width = int(payload[4:9])
        height = int(payload[9:HEADER_LEN])
    except ValueError:
        return 0, 0, 0.0, False
    body = np.frombuffer(payload[HEADER_LEN:], dtype=np.uint8)
    # raw IEEE mean (sum/n), no rounding: consumers quantize; Python's
    # banker-rounding would diverge from SQL half-up on exact binary
    # ties (k/2^m byte means)
    mean = float(int(body.sum(dtype=np.int64)) / body.size) if body.size else 0.0
    return width, height, mean, True


def real_codec_decode(payload: bytes):  # pragma: no cover - documented stub
    """Placeholder for the real codec path (Pillow/libvips/ffmpeg)."""
    raise NotImplementedError(
        "image/audio codecs are not available in this container; "
        "see _fake_decode for the plumbing contract"
    )


def decode_metadata(binary_df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow batches of (doc_id, payload) ->
    DECODED_SCHEMA rows.  Batch shape and schema are production-real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows, columns=["width", "height", "mean_byte", "ok"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["n_bytes"] = [0 if p is None else len(p) for p in pdf["payload"]]
            yield out[["doc_id", "width", "height", "n_bytes", "mean_byte", "ok"]]

    return binary_df.mapInPandas(run, DECODED_SCHEMA)
