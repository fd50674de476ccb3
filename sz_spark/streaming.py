"""Structured Streaming variants of the pipeline's stateful pieces.

The reference has no streaming operators (SURVEY.md §2.10), but its
incremental hashers prove every sketch is chunk-mergeable
(fingerprints/serial.hpp:601-625 merge law; Hasher.update streaming,
hash.h:268).  These operators exploit that:

* :func:`stream_events_hourly` — watermarked tumbling-window counts over
  a streaming events table (late data handled by the watermark).
* :func:`stream_canonicalize` — stateful conversation assembly with
  ``applyInPandasWithState``: turns arrive in any order across
  micro-batches; state holds the (turn_idx, text) set per conv_id; a
  processing-time timeout emits the canonicalized doc once a
  conversation goes quiet.  At 10^12-turn scale this is the
  continuous-ingest front half of the ER pipeline; the batch pipeline
  then periodically re-blocks/re-scores the new docs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sz_spark.canonicalize import SEP

CANON_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("doc", T.StringType()),
        T.StructField("n_turns", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("turn_idxs", T.ArrayType(T.IntegerType())),
        T.StructField("texts", T.ArrayType(T.StringType())),
    ]
)


def stream_events_hourly(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event_type (append-ready)."""
    # watermarks need TIMESTAMP (with zone); parquet often carries NTZ
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            F.round("sum_value", 4).alias("sum_value"),
        )
    )


def _canonicalize_conv(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (turn_idx, text) per conv_id; emit on quiet-timeout.

    The merge step is order-insensitive (turns sort by turn_idx at emit),
    mirroring the batch canonicalizer's sort_array(collect_list(...)) —
    a streaming arrival order can never change the output doc.
    """
    (conv_id,) = key
    if state.hasTimedOut:
        (turn_idxs, texts) = state.get
        order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
        doc = SEP.join(texts[i] for i in order)
        state.remove()
        yield pd.DataFrame(
            {"conv_id": [conv_id], "doc": [doc], "n_turns": [len(turn_idxs)]}
        )
        return

    turn_idxs: list[int] = []
    texts: list[str] = []
    if state.exists:
        prev = state.get
        turn_idxs, texts = list(prev[0]), list(prev[1])
    seen = set(turn_idxs)
    for pdf in pdfs:
        for ti, tx in zip(pdf["turn_idx"], pdf["text"]):
            ti = int(ti)
            if ti not in seen:  # idempotent under replays
                seen.add(ti)
                turn_idxs.append(ti)
                texts.append(tx)
    state.update((turn_idxs, texts))
    state.setTimeoutDuration(2000)  # quiet period before emit (ms)
    yield pd.DataFrame({"conv_id": [], "doc": [], "n_turns": []}).astype(
        {"conv_id": "object", "doc": "object", "n_turns": "int64"}
    )


FP_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("min_hashes", T.ArrayType(T.LongType())),
        T.StructField("min_counts", T.ArrayType(T.LongType())),
    ]
)

FP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("seen_idxs", T.ArrayType(T.IntegerType())),
    ]
)


def make_stream_turn_fingerprints(ndim: int = 128, widths=None, seed: int = 0):
    """Streaming BAG-OF-TURNS MinHash/CMS sketch per conversation.

    Each arriving turn is fingerprinted independently and min-merged
    into the conversation's running sketch via the reference's sketch
    merge law (fingerprints/serial.hpp:601-625 — associative,
    commutative, idempotent-per-element), so the result is independent
    of arrival order and micro-batch boundaries BY CONSTRUCTION, with
    O(ndim) state per conversation.  This is deliberately the
    bag-of-turns sketch, not the concatenated-document fingerprint:
    rolling windows spanning turn boundaries cannot be formed until all
    earlier turns arrived, which would force O(doc) state
    (kernels.FingerprintStream covers that sequential-chunk contract);
    for blocking/dedup the turn-bag sketch is the standard streaming
    substitute.  Replayed turns dedup on turn_idx (exactly-once state)."""
    from sz_spark import kernels as K

    def _fp_conv(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (conv_id,) = key
        if state.hasTimedOut:
            hashes, counts, seen = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "n_turns": [len(seen)],
                    "min_hashes": [list(hashes)],
                    "min_counts": [list(counts)],
                }
            )
            return

        if state.exists:
            prev = state.get
            h = np.asarray(prev[0], dtype=np.uint32)
            c = np.asarray(prev[1], dtype=np.uint32)
            seen = set(prev[2])
        else:
            h = np.full(ndim, K.MAX_HASH_U32, dtype=np.uint32)
            c = np.zeros(ndim, dtype=np.uint32)
            seen = set()
        new_texts, new_idxs = [], []
        for pdf in pdfs:
            for ti, tx in zip(pdf["turn_idx"], pdf["text"]):
                ti = int(ti)
                if ti not in seen:
                    seen.add(ti)
                    new_idxs.append(ti)
                    new_texts.append(("" if tx is None else str(tx)).encode())
        if new_texts:
            th, tc = K.fingerprints(new_texts, ndim=ndim, widths=widths, seed=seed)
            for i in range(len(new_texts)):
                h, c = K.merge_count_min_sketches(h, c, th[i], tc[i])
        state.update(
            (
                [int(x) for x in h],
                [int(x) for x in c],
                sorted(seen),
            )
        )
        state.setTimeoutDuration(2000)
        yield pd.DataFrame(
            {"conv_id": [], "n_turns": [], "min_hashes": [], "min_counts": []}
        ).astype({"conv_id": "object", "n_turns": "int64"})

    return _fp_conv


def stream_turn_fingerprints(
    transcripts_stream: DataFrame, ndim: int = 128, widths=None, seed: int = 0
) -> DataFrame:
    """transcripts stream -> per-conversation bag-of-turns sketch."""
    fn = make_stream_turn_fingerprints(ndim=ndim, widths=widths, seed=seed)
    return (
        transcripts_stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FP_SCHEMA,
            stateStructType=FP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_canonicalize(transcripts_stream: DataFrame) -> DataFrame:
    """transcripts stream -> canonical conversation docs (update mode)."""
    return (
        transcripts_stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _canonicalize_conv,
            outputStructType=CANON_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
