"""Pairwise scoring of candidate pairs.

Scores run in Arrow-batched pandas UDFs over the batched-DP kernels
(sz_spark.kernels) — the reference's candidate-lane design
(similarities/serial.hpp:613-693) with the Arrow batch as the lane axis.

Scale notes:
* pairs join back to the (much smaller) canonical-docs table twice —
  sort-merge joins on conv_id; the texts are NEVER carried through the
  band explosion (that would multiply text bytes by n_bands in the
  shuffle).
* a cheap JVM-side length-difference prune runs before the Python DP:
  |len(a)-len(b)| / max(len) > 1-τ already bounds similarity below τ
  (edit distance ≥ length difference), so those pairs never cross into
  Python.  This mirrors the reference's algorithm tiering by input size
  (serial.hpp:2948-2994).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sz_spark.udfs import (
    byte_histogram_udf,
    jaro_winkler_udf,
    levenshtein_udf,
    make_bounded_levenshtein_udf,
    norm_edit_sim_udf,
)


def attach_texts(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "doc",
    with_histogram: bool = False,
) -> DataFrame:
    """pairs(id_a, id_b) ⋈ docs -> (id_a, id_b, doc_a, doc_b, len_a, len_b
    [, hist_a, hist_b])."""
    slim = docs.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_doc"),
        F.length(text_col).alias("_len"),
        *(
            [byte_histogram_udf(F.encode(F.col(text_col), "utf-8")).alias("_hist")]
            if with_histogram
            else []
        ),
    )
    out = (
        pairs.join(slim.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_doc", "doc_a")
        .withColumnRenamed("_len", "len_a")
        .withColumnRenamed("_hist", "hist_a")
        .join(slim.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumnRenamed("_doc", "doc_b")
        .withColumnRenamed("_len", "len_b")
        .withColumnRenamed("_hist", "hist_b")
    )
    return out


def attach_prune_attrs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "doc",
    packed: bool = False,
    attrs_frame: DataFrame | None = None,
) -> DataFrame:
    """pairs(id_a, id_b) ⋈ docs -> + (len_a, len_b, hist_a, hist_b):
    the prune-only attributes, WITHOUT the texts.

    The production flow attaches these first, prunes, and only then
    attaches texts (attach_texts) to the survivors.  Measured funnel at
    bench scale 16 (133k docs, avg 666 B): 1.46M candidate pairs, of
    which the histogram prune drops 95.5% — attaching texts up front
    shuffled ~1.3 KB of doc bytes per candidate (2x666 B) that the prune
    then discarded, ~2/3 of the scored-stage join traffic.  The two
    extra survivor-side joins are broadcast-sized (66k pairs x 16 B).

    ``packed=True`` (the production pipeline setting) carries each
    histogram as a 192-byte binary blob (96 little-endian u16 bins,
    counts clamped at 65535) instead of an array<int> (~420 B in
    UnsafeRow format): the same decisions from ~55% fewer bytes through
    the two pair joins and the Arrow prune transport, and the histogram
    itself is computed over the Arrow binary column's flat buffers
    (mapInArrow) rather than per-row pandas objects.  Clamping is a
    contraction, so the clamped L1 stays a valid edit-distance lower
    bound for any document size; bins only saturate on documents where
    one byte value repeats > 65535 times (>= 64 KB docs), where the
    prune merely weakens, never misprunes.

    ``attrs_frame``: an optional precomputed (id, len, hist) frame —
    e.g. ``blocking.doc_features`` sliced to those columns — used
    instead of recomputing the histograms from the doc texts (the
    fused-feature path: one Python pass over the corpus serves both
    blocking and pruning).
    """
    if attrs_frame is not None:
        cols = attrs_frame.columns
        slim = attrs_frame.select(
            F.col(cols[0]).alias("_id"),
            F.col(cols[1]).alias("_len"),
            F.col(cols[2]).alias("_hist"),
        )
    elif packed:
        slim = _prune_attrs_packed(docs, id_col, text_col)
    else:
        slim = docs.select(
            F.col(id_col).alias("_id"),
            F.length(text_col).alias("_len"),
            byte_histogram_udf(F.encode(F.col(text_col), "utf-8")).alias("_hist"),
        )
    return (
        pairs.join(slim.withColumnRenamed("_id", "id_a"), "id_a")
        .withColumnRenamed("_len", "len_a")
        .withColumnRenamed("_hist", "hist_a")
        .join(slim.withColumnRenamed("_id", "id_b"), "id_b")
        .withColumnRenamed("_len", "len_b")
        .withColumnRenamed("_hist", "hist_b")
    )


def _prune_attrs_packed(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """docs -> (_id, _len, _hist binary): the packed prune-attr frame.

    The 96-bin printable-ASCII histogram (byte_histogram_udf math) packed
    as 96 little-endian u16s, computed from the Arrow binary column's
    (data, offsets) buffers with one flat bincount per batch — no
    per-row Python objects on either side of the boundary."""
    from pyspark.sql import types as T

    from sz_spark.udfs import arrow_binary_flat

    src = docs.select(
        F.col(id_col).alias("_id"),
        F.length(text_col).alias("_len"),
        F.encode(F.col(text_col), "utf-8").alias("_b"),
    )
    out_schema = T.StructType(
        [src.schema["_id"], src.schema["_len"],
         T.StructField("_hist", T.BinaryType(), False)]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            data, off = arrow_binary_flat(batch.column(2))
            data = data[off[0] : off[-1]]
            lens = np.diff(off)
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            mask = (data >= 32) & (data < 128)
            h = np.bincount(
                rows[mask] * 96 + (data[mask].astype(np.int64) - 32),
                minlength=n * 96,
            ).reshape(n, 96)
            h16 = np.minimum(h, 65535).astype("<u2")
            offs = np.arange(0, (n + 1) * 192, 192, dtype=np.int32)
            hist = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(h16.tobytes())],
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), hist], ["_id", "_len", "_hist"]
            )

    return src.mapInArrow(fn, out_schema)


def histogram_prune(pairs_with_hists: DataFrame, threshold: float) -> DataFrame:
    """Counting-filter prune: L1 distance of byte histograms / 2 is a
    lower bound on edit distance, so any pair whose histogram gap alone
    pushes similarity below τ is dropped JVM-side (whole-stage-codegen
    zip_with/aggregate, no Python).  At corpus scale this removes the
    bulk of band-collision candidates — near-identical content with
    different entity salts — before the expensive DP."""
    l1 = F.aggregate(
        F.zip_with("hist_a", "hist_b", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    max_len = F.greatest("len_a", "len_b")
    return pairs_with_hists.filter(
        (l1 / 2) <= ((F.lit(1.0) - F.lit(threshold)) * max_len)
    ).drop("hist_a", "hist_b")


def prune_pairs_arrow(attrs: DataFrame, threshold: float) -> DataFrame:
    """Fused length + histogram prune over the prune-attr frame —
    returns the surviving (id_a, id_b).

    Decision-identical to ``histogram_prune(length_prune(attrs, τ), τ)``:
    the same comparisons on the same values ((max-min) <= (1-τ)*max and
    L1(hist)/2 <= (1-τ)*max, both in f64 with the identical int→double
    widenings), evaluated vectorized in a mapInArrow batch.  The
    expression form walked two interpreted zip_with/aggregate lambdas
    over 96 bins per candidate pair — at the probe's 1.46M candidates
    that was the pipeline's largest remaining interpreted surface
    (guide §4.2), and it re-paid the JIT-warmup cliff per fresh JVM.
    SZ_JVM_PRUNE=1 forces the expression twin."""
    import os

    if os.environ.get("SZ_JVM_PRUNE") == "1":
        return histogram_prune(length_prune(attrs, threshold), threshold).select(
            "id_a", "id_b"
        )
    from pyspark.sql import types as T

    src = attrs.select("id_a", "id_b", "len_a", "len_b", "hist_a", "hist_b")
    out_schema = T.StructType([src.schema["id_a"], src.schema["id_b"]])
    lim = 1.0 - threshold
    hist_packed = src.schema["hist_a"].dataType.typeName() == "binary"

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        from sz_spark.udfs import arrow_binary_flat

        def unpack(col, n):
            if hist_packed:
                # 96 LE u16 bins per row (attach_prune_attrs packed=True)
                data, off = arrow_binary_flat(col)
                return (
                    data[off[0] : off[-1]]
                    .view("<u2")
                    .reshape(n, 96)
                    .astype(np.int64)
                )
            o = np.asarray(col.offsets, dtype=np.int64)
            return (
                np.asarray(col.values)[o[0] : o[-1]].reshape(n, -1).astype(np.int64)
            )

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            la = np.asarray(batch.column(2), dtype=np.int64)
            lb = np.asarray(batch.column(3), dtype=np.int64)
            A = unpack(batch.column(4), n)
            B = unpack(batch.column(5), n)
            maxlen = np.maximum(la, lb)
            minlen = np.minimum(la, lb)
            bound = lim * maxlen  # (1-τ)*max in f64, same as the JVM expr
            keep = (maxlen - minlen) <= bound
            l1 = np.abs(A - B).sum(axis=1)
            keep &= (l1 / 2.0) <= bound
            idx = pa.array(np.nonzero(keep)[0].astype(np.int32))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).take(idx), batch.column(1).take(idx)],
                ["id_a", "id_b"],
            )

    return src.mapInArrow(fn, out_schema)


# ---------------------------------------------------------------------------
# Gathered (broadcast) prune + score: the small-corpus fast tier
# ---------------------------------------------------------------------------
#
# The join-based prune/score path is the scale-correct design: per-pair
# attribute/text transport grows with the PAIR count and never assumes
# the doc table fits anywhere.  But when the deduplicated corpus is
# small enough that its feature table (208 B/doc) — and optionally its
# text bytes — fit comfortably in each Python worker, shipping the doc
# table ONCE per worker as a Spark broadcast and gathering per-pair
# attributes locally beats joining them onto every candidate row:
# at the 975k-turn probe the join path moved ~560 MB of per-pair
# histograms through two sort-merge joins plus the Arrow boundary,
# where the broadcast is 26 MB per worker, and the pair stream itself
# shrinks to 16 B/row.  This is the same two-tier trade Spark's own
# broadcast-hash join makes, and the same hybrid posture as
# clustering.connected_components' driver union-find fast path.
#
# Memory math for the default gates (SZ_GATHER_MAX_DOCS = 1M docs,
# SZ_GATHER_MAX_TEXT_MB = 256): prune broadcast <= 1M x 208 B = 208 MB,
# text broadcast <= 256 MB + 16 B/doc of offsets; each Python worker
# process holds one copy while it lives, so an executor running W
# workers pays <= W x ~0.5 GB — sized for standard 4-8 GB executors.
# Above the gates the join path runs unchanged (it is also the
# SZ_NO_GATHER=1 twin the differential tests compare against).


def gather_gate(feats: DataFrame) -> bool:
    """True when the corpus is small enough for the broadcast-gather
    PRUNE tier (one cheap count over the — checkpointed — feature
    table).  The prune broadcast is 208 B/doc regardless of text size,
    so only the doc count gates it; the text tier has its own
    byte-exact gate (:func:`text_gather_gate`)."""
    import os

    if os.environ.get("SZ_NO_GATHER") == "1":
        return False
    max_docs = int(os.environ.get("SZ_GATHER_MAX_DOCS", "1000000"))
    row = feats.agg(F.count(F.lit(1)).alias("n")).collect()[0]
    return row["n"] <= max_docs


def text_gather_gate(
    docs: DataFrame, text_col: str = "doc"
) -> bool:
    """True when the corpus's UTF-8 BYTES fit the text-broadcast budget
    (octet_length, not codepoints — a CJK-heavy corpus is up to 4 bytes
    per char, and the blob must match the documented per-worker memory
    math)."""
    import os

    max_bytes = int(os.environ.get("SZ_GATHER_MAX_TEXT_MB", "256")) * (1 << 20)
    row = docs.agg(
        F.sum(F.octet_length(F.col(text_col))).alias("b")
    ).collect()[0]
    return (row["b"] or 0) <= max_bytes


def build_prune_broadcast(feats: DataFrame):
    """Collect the (id, len, hist) doc-feature table to the driver,
    pack it as id-sorted NumPy arrays, and broadcast it.

    ``value = (ids_sorted i64, char_lens i64, hists (n, 96) u16)``.
    The hist bytes are exactly the packed u16 blobs doc_features /
    _prune_attrs_packed emit, so gathered prune decisions are
    value-identical to the join path's.  Collection is Arrow-native
    (DataFrame.toArrow); the hist matrix is a view over the collected
    Arrow buffer — no per-row Python objects on the driver (~0.25 s
    for the 133k-doc probe corpus)."""
    import numpy as np

    from sz_spark.udfs import arrow_binary_flat

    spark = feats.sparkSession
    cols = feats.columns
    ftbl = feats.select(cols[0], cols[1], cols[2]).toArrow()
    ids = ftbl.column(0).to_numpy().astype(np.int64, copy=False)
    lens = ftbl.column(1).to_numpy().astype(np.int64)
    hcol = ftbl.column(2).combine_chunks()
    hdata, hoff = arrow_binary_flat(hcol)
    if len(ids) and not (np.diff(hoff) == 192).all():  # pragma: no cover
        raise ValueError("doc_features hist blobs must be 96 u16 bins")
    hists = hdata[hoff[0] : hoff[-1]].view("<u2").reshape(len(ids), 96)
    order = np.argsort(ids, kind="stable")
    return spark.sparkContext.broadcast((ids[order], lens[order], hists[order]))


def build_text_broadcast(
    docs: DataFrame, id_col: str = "conv_id", text_col: str = "doc"
):
    """Collect the doc texts to the driver as one flat byte blob and
    broadcast them for :func:`score_pairs_gathered`.

    ``value = (ids_sorted i64, char_lens i64, starts i64, byte_lens
    i64, blob u8)``; char_lens are codepoint counts (== attach_texts'
    F.length), starts/byte_lens index into the blob.  Arrow-native like
    :func:`build_prune_broadcast` (a toPandas + .encode() loop measured
    3.3 s for the 89 MB probe corpus; this path ~2 s, most of it the
    unavoidable 89 MB collect + broadcast write)."""
    import numpy as np
    import pyarrow.compute as pc

    from sz_spark.udfs import arrow_binary_flat

    spark = docs.sparkSession
    ttbl = docs.select(id_col, text_col).toArrow()
    tids = ttbl.column(0).to_numpy().astype(np.int64, copy=False)
    tcol = ttbl.column(1).combine_chunks()
    char_lens = pc.utf8_length(tcol).to_numpy().astype(np.int64)
    blob, toff = arrow_binary_flat(tcol)
    torder = np.argsort(tids, kind="stable")
    return spark.sparkContext.broadcast(
        (
            tids[torder],
            char_lens[torder],
            toff[:-1][torder],
            np.diff(toff)[torder],
            blob,
        )
    )


def prune_pairs_gathered(
    pairs: DataFrame, prune_bc, threshold: float
) -> DataFrame:
    """Fused length + histogram prune gathering per-doc attributes from
    ``prune_bc`` instead of joining them onto each pair — the same f64
    comparisons on the same values as :func:`prune_pairs_arrow`, so the
    surviving pair set is identical (pairs whose id is missing from the
    feature table are dropped, matching the join path's inner joins)."""
    from pyspark.sql import types as T

    src = pairs.select("id_a", "id_b")
    out_schema = T.StructType([src.schema["id_a"], src.schema["id_b"]])
    lim = 1.0 - threshold

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        ids, lens, hists = prune_bc.value
        hi = len(ids) - 1
        for batch in batches:
            if batch.num_rows == 0:
                continue
            if hi < 0:
                # empty feature table: the join path's inner joins drop
                # every pair — emit nothing
                yield pa.RecordBatch.from_arrays(
                    [batch.column(0).slice(0, 0), batch.column(1).slice(0, 0)],
                    ["id_a", "id_b"],
                )
                continue
            a = np.asarray(batch.column(0), dtype=np.int64)
            b = np.asarray(batch.column(1), dtype=np.int64)
            ia = np.clip(np.searchsorted(ids, a), 0, hi)
            ib = np.clip(np.searchsorted(ids, b), 0, hi)
            la = lens[ia]
            lb = lens[ib]
            maxlen = np.maximum(la, lb)
            bound = lim * maxlen
            keep = (ids[ia] == a) & (ids[ib] == b)
            keep &= (maxlen - np.minimum(la, lb)) <= bound
            sub = np.nonzero(keep)[0]
            if len(sub):
                l1 = np.abs(
                    hists[ia[sub]].astype(np.int64)
                    - hists[ib[sub]].astype(np.int64)
                ).sum(axis=1)
                keep[sub] &= (l1 / 2.0) <= bound[sub]
            idx = pa.array(np.nonzero(keep)[0].astype(np.int32))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).take(idx), batch.column(1).take(idx)],
                ["id_a", "id_b"],
            )

    return src.mapInArrow(fn, out_schema)


def score_pairs_gathered(
    pairs: DataFrame, text_bc, bounded: float, chunk: int = 1024
) -> DataFrame:
    """Banded-DP scoring gathering BOTH documents of every pair from
    the broadcast text blob — no text join, no per-pair text transport;
    the kernel reads the two sides straight out of one shared buffer.

    Same math as the join path (make_bounded_lev_arrow_fn): pairs are
    byte-length-sorted and scored in chunks with a per-chunk band bound,
    so every kept (sim >= τ) pair's edit_distance/sim is identical; the
    clamped placeholder values of sub-τ pairs may differ by chunk
    composition, exactly as they already do between batch layouts (the
    chunk bound strictly exceeds (1-τ)*maxlen, so τ-decisions never
    depend on grouping).  Emits (id_a, id_b, edit_distance, sim); the
    sim expression is the join path's verbatim, on char lengths from
    the broadcast (== attach_texts' F.length values)."""
    from pyspark.sql import types as T

    from sz_spark import kernels as K

    src = pairs.select("id_a", "id_b").repartition(scoring_fanout(pairs))
    out_schema = T.StructType(
        [
            src.schema["id_a"],
            src.schema["id_b"],
            T.StructField("edit_distance", T.LongType(), False),
            T.StructField("len_a", T.LongType(), False),
            T.StructField("len_b", T.LongType(), False),
        ]
    )

    def fn(batches):
        import numpy as np
        import pyarrow as pa

        ids, char_lens, starts, byte_lens, blob = text_bc.value
        hi = len(ids) - 1
        for batch in batches:
            if batch.num_rows == 0:
                continue
            a = np.asarray(batch.column(0), dtype=np.int64)
            b = np.asarray(batch.column(1), dtype=np.int64)
            if hi < 0:
                # empty doc table: inner-join parity — drop every pair
                a = b = np.zeros(0, dtype=np.int64)
                ia = ib = np.zeros(0, dtype=np.int64)
            else:
                ia = np.clip(np.searchsorted(ids, a), 0, hi)
                ib = np.clip(np.searchsorted(ids, b), 0, hi)
                ok = (ids[ia] == a) & (ids[ib] == b)
                if not ok.all():
                    sel = np.nonzero(ok)[0]
                    a, b, ia, ib = a[sel], b[sel], ia[sel], ib[sel]
            n = len(a)
            out = np.zeros(n, dtype=np.int64)
            if n:
                sa, la = starts[ia], byte_lens[ia]
                sb, lb = starts[ib], byte_lens[ib]
                maxlen = np.maximum(la, lb)
                order = np.argsort(maxlen, kind="stable")
                for s in range(0, n, chunk):
                    idx = order[s : s + chunk]
                    m = int(maxlen[idx].max())
                    bnd = int((1.0 - bounded) * m) + 1
                    out[idx] = K.bounded_lev_ladder(
                        blob, sa[idx], la[idx], blob, sb[idx], lb[idx], bnd
                    )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(a, type=pa.int64()),
                    pa.array(b, type=pa.int64()),
                    pa.array(out, type=pa.int64()),
                    pa.array(char_lens[ia], type=pa.int64()),
                    pa.array(char_lens[ib], type=pa.int64()),
                ],
                ["id_a", "id_b", "edit_distance", "len_a", "len_b"],
            )

    out = src.mapInArrow(fn, out_schema)
    return out.withColumn(
        "sim",
        F.lit(1.0)
        - F.col("edit_distance") / F.greatest("len_a", "len_b").cast("double"),
    )


def length_prune(pairs_with_texts: DataFrame, threshold: float) -> DataFrame:
    """Drop pairs whose length gap alone caps similarity below threshold —
    a native-Spark filter that never enters Python."""
    max_len = F.greatest("len_a", "len_b")
    min_len = F.least("len_a", "len_b")
    # 1 - dist/max_len <= 1 - (max-min)/max  ⇒ prune if that bound < τ
    return pairs_with_texts.filter(
        (max_len - min_len) <= ((F.lit(1.0) - F.lit(threshold)) * max_len)
    )


def scoring_fanout(df: DataFrame) -> int:
    """Round-robin width for the DP scoring stage.

    The wave policy lives in the SESSION's shuffle-partition sizing
    (bench probes run 4x-cores shuffles precisely so uneven DP cost
    rides out in waves); re-fanning WIDER than both the session
    parallelism and the upstream width only multiplies Python task
    overhead (measured: 128 tasks for a 4.5k-pair frame at local[32]
    cost 1.8-9 s vs 0.75 s at the upstream's 32).  Under-partitioned
    inputs (a bare scan) still spread to 4x cores, matching
    udfs.spread_for_python — the optimizer cannot see Python CPU cost.
    The width probe (udfs.upstream_width) is plan-time only — no job
    runs (the naive .rdd probe would eagerly execute a shuffle-bearing
    plan's map stages under AQE and the real query would run them
    again)."""
    from sz_spark.udfs import upstream_width

    par = df.sparkSession.sparkContext.defaultParallelism
    n_in = upstream_width(df)
    if n_in < par:
        return 4 * par
    return min(4 * par, n_in)


def score_pairs(
    pairs_with_texts: DataFrame,
    threshold: float | None = None,
    add_jaro_winkler: bool = False,
    bounded: float | None = None,
) -> DataFrame:
    """Adds edit_distance + sim (normalized edit similarity in [0,1]).

    ``bounded``: when set, uses the banded DP exact below the τ-bound
    (the at-scale path — ~10x cheaper); distances of sub-τ pairs come
    back clamped, which only matters if you *keep* sub-τ pairs.

    Output columns: the bounded production path runs Arrow-native
    (mapInArrow over flat buffers) and deliberately DROPS doc_a/doc_b —
    shipping the texts back JVM-side would double the Arrow transfer for
    columns no consumer reads.  The pandas paths (exact lev /
    add_jaro_winkler) keep all input columns.
    """
    # AQE coalesces the (byte-wise tiny) pair shuffle down to a couple of
    # partitions, which would serialize the pandas-UDF DP — its CPU cost
    # is invisible to the optimizer.  Spread the batch explicitly across
    # the cluster before entering Python.
    # The repartition stays UNCONDITIONAL (unlike the band entrances'
    # adaptive spread): the pair stream arrives hash-partitioned by its
    # JOIN KEY (id_b), so one hot document's pairs — whose DP cost all
    # scales with that document's length — cluster into a single
    # partition; round-robin is the skew cure, not just a fan-out
    # (measured at the 8-core probe: skipping it cost ~2 s of straggler
    # wall).  The WIDTH adapts (scoring_fanout): it used to be a blind
    # 4x cores, which turned a 4.5k-pair registry query at local[32]
    # into 128 Python tasks — measured 1.8-9 s of pure task/scheduler
    # overhead vs 0.75 s at the upstream width.
    pairs_with_texts = pairs_with_texts.repartition(
        scoring_fanout(pairs_with_texts)
    )
    import os

    if (
        bounded is not None
        and not add_jaro_winkler
        and os.environ.get("SZ_PANDAS_TRANSPORT") != "1"
    ):
        # Arrow-native production path: the worker reads the binary
        # columns' flat buffers straight into the banded DP — no pandas
        # Series, no per-row bytes objects.  The texts do NOT ride back
        # to the JVM: the output batch carries only the carry columns +
        # edit_distance.
        from pyspark.sql import types as T

        from sz_spark.udfs import make_bounded_lev_arrow_fn

        carry = [c for c in pairs_with_texts.columns if c not in ("doc_a", "doc_b")]
        src = pairs_with_texts.select(
            *carry,
            F.encode(F.col("doc_a"), "utf-8").alias("_ba"),
            F.encode(F.col("doc_b"), "utf-8").alias("_bb"),
        )
        out_schema = T.StructType(
            [src.schema[c] for c in carry]
            + [T.StructField("edit_distance", T.LongType(), False)]
        )
        out = src.mapInArrow(make_bounded_lev_arrow_fn(bounded), out_schema)
    else:
        lev = (
            make_bounded_levenshtein_udf(bounded)
            if bounded is not None
            else levenshtein_udf
        )
        out = pairs_with_texts.withColumn(
            "edit_distance",
            # JVM-side encode: workers get bytes, skipping per-row re-encode
            lev(F.encode(F.col("doc_a"), "utf-8"), F.encode(F.col("doc_b"), "utf-8")),
        )
    out = out.withColumn(
        "sim",
        F.lit(1.0)
        - F.col("edit_distance") / F.greatest("len_a", "len_b").cast("double"),
    )
    if add_jaro_winkler:
        out = out.withColumn("jw_sim", jaro_winkler_udf(F.col("doc_a"), F.col("doc_b")))
    if threshold is not None:
        out = out.filter(F.col("sim") >= threshold)
    return out


def score_pairs_exact_udf(pairs_with_texts: DataFrame) -> DataFrame:
    """Variant computing sim fully inside Python (norm_edit_sim_udf) —
    used by conformance tests to check the two paths agree."""
    return pairs_with_texts.withColumn(
        "sim", norm_edit_sim_udf(F.col("doc_a"), F.col("doc_b"))
    )
