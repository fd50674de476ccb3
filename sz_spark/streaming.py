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
