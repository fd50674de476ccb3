"""MinHash-LSH blocking: fingerprint -> band signatures -> candidate blocks.

Two interchangeable signature families:

* :func:`add_fingerprint` / :func:`bands_from_fingerprint` — the
  reference-conformant rolling-hash MinHash (sz_spark.kernels, byte-exact
  vs stringzillas' Fingerprints engine) computed in an Arrow-batched
  pandas UDF; banding itself is native Spark (F.slice + F.hash, JVM-side).
* :func:`minhash_bands_sql_variant` — an md5-over-shingles MinHash whose
  math is *also* expressible in ANSI SQL, used by the DuckDB correctness
  oracle so the whole blocking stage is value-checked end-to-end.

Scale design: banding is the pipeline's ONE deliberate shuffle before
pair scoring.  Oversized blocks (stop-band signatures) are capped — the
classic LSH guard; at 10^12 turns a single hot band would otherwise
generate O(n^2) pairs.  AQE skew-join handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sz_spark.udfs import make_fingerprint_udf

# Measured: with the layered prefix key, candidate recall is 1.00000 at
# sf0.001 AND sf0.1 for 64, 96, and 128 dims with near-identical
# candidate counts — 64 dims would halve the fingerprint cost on THIS
# corpus, but 128 stays the default: it is the robust setting for
# corpora without a strong prefix attribute, where the minhash bands
# carry recall alone.
DEFAULT_NDIM = 128
# Blocking fingerprints use LARGER window widths than the engine default
# {3..31}: tiny windows over a small vocabulary are shared by every
# document (zero discrimination), while 16-48-byte windows span multiple
# words/salts.  Measured on the sf0.001 corpus: default widths at r=4
# give 51k candidates; these widths give ~410 at 100% true-pair recall.
DEFAULT_FP_WIDTHS = (16, 24, 32, 48)
# 32 bands x 4 rows: at pair similarity ~0.95 the per-dim minhash
# agreement on SHORT docs can dip to ~0.7 (the edit window covers a
# large text fraction); r=8 then misses ~5-6% of true pairs while r=4
# keeps the measured miss rate at 0 with barely more candidates.
DEFAULT_BANDS = 32
DEFAULT_ROWS = 4


def add_fingerprint(
    docs: DataFrame,
    text_col: str = "doc",
    ndim: int = DEFAULT_NDIM,
    widths=DEFAULT_FP_WIDTHS,
    seed: int = 0,
) -> DataFrame:
    """docs + fp (array<long> of u32 min-hashes, reference math §2.8)."""
    fp_udf = make_fingerprint_udf(ndim=ndim, widths=widths, seed=seed)
    return docs.withColumn("_fp", fp_udf(F.col(text_col))).select(
        "*", F.col("_fp.hashes").alias("fp"), F.col("_fp.counts").alias("fp_counts")
    ).drop("_fp")


def minhash_bands(
    docs: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    ndim: int = DEFAULT_NDIM,
    widths=DEFAULT_FP_WIDTHS,
    seed: int = 0,
    n_bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS,
    prefix_len: int = 56,
) -> DataFrame:
    """docs -> (id, band_id, band_hash): the one-pass blocking stage.

    Fingerprint + band hashing run fused inside a single pandas UDF
    (see udfs.make_band_keys_arrow_fn) so only n_bands longs per doc
    cross the Arrow boundary; the explode is a cheap JVM posexplode.

    Layered blocking: a deterministic PREFIX key (band_id = -1, hash of
    the first ``prefix_len`` bytes) is unioned with the minhash bands —
    the ER-classic "block on a strong attribute" key.  Short documents
    have too few rolling windows for reliable band agreement (measured:
    14/3753 true pairs at sf0.1 were 2-turn docs missed by all 32
    bands); their shared conversation-handle prefix recovers them.

    ``prefix_len`` must COVER the strong attribute: the synthetic
    corpus's conversation handle is 49 bytes ('u' + 6 digits x 8), and
    the round-1 default of 32 cut it mid-handle — every block then
    mixed ~dozens of entities sharing leading digits, which was cheap
    only because salting silently dropped cross-salt pairs.  With
    recall-preserving salting (round 2) those precision-less blocks
    would pay full O(s^2); at 56 bytes each prefix block is one entity
    (its 2-3 conversation variants), recall is identical (same-entity
    variants share the WHOLE handle by construction), and the prefix
    layer's pair cost is O(n).  Block caps/salting still apply to
    prefix blocks like any other.  ``prefix_len=0`` disables the
    layer."""
    from pyspark.sql import types as T

    from sz_spark.udfs import make_band_keys_arrow_fn

    # Spread docs before entering Python when they arrive
    # under-partitioned — the fingerprint UDF's CPU cost per byte is
    # invisible to the optimizer (guide §2/§4).  4x cores when
    # spreading: per-doc fingerprint cost varies with length, so four
    # waves of smaller chunks keep the tail short.  When the upstream
    # (canonicalize's groupBy) already left >= parallelism partitions,
    # the extra round-robin exchange of the full doc bytes is skipped —
    # measured as pure overhead at bench scale.
    from sz_spark.udfs import spread_for_python

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    docs = spread_for_python(docs, 4 * parallelism)
    # encode JVM-side, then mapInArrow: the worker reads the Arrow binary
    # column's (data, offsets) buffers straight into the flat kernel —
    # no pandas Series, no per-row bytes objects (r4 measured the pandas
    # transport at ~60% of standalone kernel throughput).
    # SZ_PANDAS_TRANSPORT=1 flips back to the pandas twin — the bench
    # A/B switch (box noise demands same-window interleaving) and the
    # fallback if an Arrow buffer-layout assumption ever breaks.
    import os

    if os.environ.get("SZ_PANDAS_TRANSPORT") == "1":
        from sz_spark.udfs import make_band_keys_udf

        keys = make_band_keys_udf(
            ndim=ndim, widths=widths, seed=seed, n_bands=n_bands,
            rows_per_band=rows_per_band,
        )
        bands = docs.select(
            F.col(id_col), keys(F.encode(F.col(text_col), "utf-8")).alias("bk")
        )
    else:
        fn = make_band_keys_arrow_fn(
            ndim=ndim, widths=widths, seed=seed, n_bands=n_bands,
            rows_per_band=rows_per_band,
        )
        src = docs.select(
            F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("_t")
        )
        out_schema = T.StructType(
            [
                src.schema[id_col],
                T.StructField("bk", T.ArrayType(T.LongType()), False),
            ]
        )
        bands = src.mapInArrow(fn, out_schema)
    bands = bands.select(
        id_col,
        F.posexplode("bk").alias("band_id", "band_hash"),
    )
    if prefix_len > 0:
        prefix = docs.select(
            F.col(id_col),
            F.lit(-1).alias("band_id"),
            F.xxhash64(F.substring(F.col(text_col), 1, prefix_len)).alias(
                "band_hash"
            ),
        )
        bands = bands.unionByName(prefix)
    return bands


def doc_features(
    docs: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    ndim: int = DEFAULT_NDIM,
    widths=DEFAULT_FP_WIDTHS,
    seed: int = 0,
    n_bands: int = DEFAULT_BANDS,
    rows_per_band: int = DEFAULT_ROWS,
) -> DataFrame:
    """docs -> (id, len, bk array<long>, hist binary): the fused
    per-document feature table — LSH band keys (minhash_bands math) AND
    the packed prune histogram (scoring._prune_attrs_packed bytes) from
    ONE pass over the doc bytes.

    The pipeline materializes this narrow frame once and derives both
    the band explosion (:func:`bands_from_features`) and the prune
    attributes from it, so the corpus text crosses the JVM->Python
    boundary a single time (guide §4.1) and the checkpoint stores ~25
    longs + 192 B per document instead of the 3.3M-row exploded band
    table."""
    from pyspark.sql import types as T

    from sz_spark.udfs import make_doc_features_arrow_fn, spread_for_python

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    src = spread_for_python(
        docs.select(
            F.col(id_col),
            F.length(F.col(text_col)).alias("len"),
            F.encode(F.col(text_col), "utf-8").alias("_t"),
        ),
        4 * parallelism,
    )
    fn = make_doc_features_arrow_fn(
        ndim=ndim, widths=widths, seed=seed, n_bands=n_bands,
        rows_per_band=rows_per_band,
    )
    out_schema = T.StructType(
        [
            src.schema[id_col],
            src.schema["len"],
            T.StructField("bk", T.ArrayType(T.LongType()), False),
            T.StructField("hist", T.BinaryType(), False),
        ]
    )
    return src.mapInArrow(fn, out_schema)


def bands_from_features(
    feats: DataFrame,
    docs: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    prefix_len: int = 56,
) -> DataFrame:
    """(id, band_id, band_hash) derived from a :func:`doc_features`
    frame — the same rows minhash_bands emits (posexplode of the band
    keys + the layered prefix key, which stays a JVM-side xxhash64 over
    the doc text; see minhash_bands for the prefix rationale)."""
    bands = feats.select(
        id_col, F.posexplode("bk").alias("band_id", "band_hash")
    )
    if prefix_len > 0:
        prefix = docs.select(
            F.col(id_col),
            F.lit(-1).alias("band_id"),
            F.xxhash64(F.substring(F.col(text_col), 1, prefix_len)).alias(
                "band_hash"
            ),
        )
        bands = bands.unionByName(prefix)
    return bands


def cap_blocks(
    bands: DataFrame,
    max_block_size: int = 64,
    salt_up_to: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Tame oversized blocks (stop-bands).  Returns (kept, suppressed_stats).

    Mirrors the reference's refusal to let one giant work item starve the
    pool (similarities/serial.hpp:3296-3395 two-tier scheduling): a block
    of size s contributes O(s^2) candidate pairs with near-zero precision
    value.  Three tiers:

    * s <= max_block_size            — kept intact (salt 0, n_salts 1)
    * max < s <= salt_up_to          — SALTED: each member gets a
      deterministic salt (xxhash64 of the id mod ceil(s/max)) plus the
      block's n_salts.  candidate_pairs replicates ONE join side across
      all n_salts (classic salted self-join), so every in-block pair is
      still produced — salting loses NO recall; it redistributes a hot
      block's O(s^2) pair work across n_salts reducers (per-reducer
      work O(max * s) <= O(max * salt_up_to)) instead of one
    * s > salt_up_to                 — suppressed and *logged* (never
      silently); this tier, not salting, is the total-work bound

    ``salt_up_to=0`` disables salting (drop-only behavior).
    """
    sizes = bands.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("block_size")
    )
    joined = bands.join(sizes, ["band_id", "band_hash"])
    drop_above = salt_up_to if salt_up_to > max_block_size else max_block_size
    kept = joined.filter(F.col("block_size") <= drop_above)
    id_col = [c for c in bands.columns if c not in ("band_id", "band_hash")][0]
    n_salts = F.when(
        F.col("block_size") <= max_block_size, F.lit(1).cast("long")
    ).otherwise(F.ceil(F.col("block_size") / F.lit(max_block_size)).cast("long"))
    kept = (
        kept.withColumn("n_salts", n_salts)
        .withColumn(
            "salt",
            F.when(F.col("n_salts") == 1, F.lit(0).cast("long")).otherwise(
                F.pmod(F.xxhash64(F.col(id_col)), F.col("n_salts"))
            ),
        )
        .drop("block_size")
    )
    suppressed = sizes.filter(F.col("block_size") > drop_above)
    return kept, suppressed


def candidate_pairs(bands: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Within-block pairs, lower-triangle only (a < b — the reference's
    symmetric-mirror trick, serial.hpp:3356-3360), deduped across bands.

    When cap_blocks salted the input, this is the recall-preserving
    salted self-join: side a keeps its own salt; side b is REPLICATED to
    every salt of its block (explode over 0..n_salts-1), so a pair
    (x, y) in a salted block still meets — at exactly x's salt.  The
    shuffle key (band_id, band_hash, salt) splits a hot block across
    n_salts reducers; only salted rows replicate (n_salts == 1 explodes
    to a single row), so small blocks pay nothing."""
    if "salt" in bands.columns:
        keys = ["band_id", "band_hash", "salt"]
        a = bands.drop("n_salts").alias("a")
        # replicate ONLY the salted minority; the n_salts == 1 majority
        # keeps its row as-is (no per-row array allocation + explode)
        plain = bands.filter(F.col("n_salts") == 1).drop("n_salts")
        salted = (
            bands.filter(F.col("n_salts") > 1)
            .drop("salt")
            .withColumn(
                "salt",
                F.explode(
                    F.sequence(F.lit(0).cast("long"), F.col("n_salts") - 1)
                ),
            )
            .drop("n_salts")
        )
        b = plain.unionByName(salted).alias("b")
    else:
        keys = ["band_id", "band_hash"]
        a = bands.alias("a")
        b = bands.alias("b")
    return (
        a.join(b, keys)
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def block_pairs(
    bands: DataFrame,
    id_col: str = "conv_id",
    max_block_size: int = 64,
    salt_up_to: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Fused cap_blocks + candidate_pairs: the within-block pair set in
    TWO shuffles instead of the salted self-join's four-plus.

    Plan: one hash-partition on (band_id, band_hash) serves a window
    count (the cap filter — blocks above the cap are dropped BEFORE any
    list is collected, so a pathological stop-band can never OOM an
    aggregation task), the suppressed-stats agg, and a collect_list —
    Catalyst reuses the exchange for all three.  Lower-triangle pairs
    are then emitted JVM-side from each block's id array (nested
    ``transform``/``slice``, whole-stage codegen): per-block work is
    bounded by cap^2 cheap struct emissions in one task, which replaces
    the salting machinery — salting redistributed O(s^2) JOIN-reducer
    work, but with in-array emission the bound is the cap itself.  The
    global cross-band dedup is the second (unavoidable) shuffle.

    Same output contract as cap_blocks + candidate_pairs: every
    unordered in-block pair (id_a < id_b) from blocks of size <= the
    drop threshold (salt_up_to when set, else max_block_size), plus the
    suppressed-block stats frame (band_id, band_hash, block_size)."""
    from pyspark.sql import Window

    drop_above = salt_up_to if salt_up_to > max_block_size else max_block_size
    w = Window.partitionBy("band_id", "band_hash")
    sized = bands.withColumn("block_size", F.count(F.lit(1)).over(w))
    suppressed = (
        sized.filter(F.col("block_size") > drop_above)
        .groupBy("band_id", "band_hash")
        .agg(F.first("block_size").alias("block_size"))
    )
    blocks = (
        sized.filter(
            (F.col("block_size") <= drop_above) & (F.col("block_size") >= 2)
        )
        .groupBy("band_id", "band_hash")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
    )
    pairs = explode_lower_triangle(blocks, "ids").dropDuplicates(
        ["id_a", "id_b"]
    )
    return pairs, suppressed


def explode_lower_triangle(
    blocks: DataFrame, ids_col: str = "ids", out: tuple = ("id_a", "id_b")
) -> DataFrame:
    """All unordered element pairs (out[0] < out[1]) from each block's
    array — the in-array replacement for a block self-join.

    Primitive (long/string) element types run through a vectorized
    Arrow pair emitter (:func:`_triangle_arrow_fn`): NumPy triu index
    tables gather both pair sides straight from the list column's flat
    values buffer, so per-pair cost is a compiled gather + compare
    instead of an interpreted transform/slice/struct lambda per element
    (guide §4.2; the lambda path also paid the JIT-warmup cliff on
    every fresh JVM).  Output batches are chunked (<= ~256k pairs) so a
    near-cap block never materializes O(size^2) rows in one allocation.
    Struct elements (field-lexicographic ordering) and SZ_JVM_TRIANGLE=1
    keep the JVM expression twin below."""
    import os

    elem = blocks.schema[ids_col].dataType.elementType
    atomic = elem.typeName() in ("long", "integer", "string", "short", "byte")
    if os.environ.get("SZ_JVM_TRIANGLE") == "1" or not atomic:
        return explode_lower_triangle_exprs(blocks, ids_col, out)
    from pyspark.sql import types as T

    src = blocks.select(F.col(ids_col).alias("_ids"))
    out_schema = T.StructType(
        [T.StructField(out[0], elem, True), T.StructField(out[1], elem, True)]
    )
    return src.mapInArrow(_triangle_arrow_fn(out), out_schema)


def _triangle_arrow_fn(out: tuple, max_pairs_per_batch: int = 1 << 18):
    """RecordBatch (ids list<T>) -> (out0 T, out1 T): every unordered
    in-list pair, out0 = min, out1 = max — value-identical to the
    least/greatest of the expression twin (same total order for longs
    and UTF8 strings)."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        triu_cache: dict[int, tuple] = {}

        def triu(s: int):
            t = triu_cache.get(s)
            if t is None:
                ii, jj = np.triu_indices(s, 1)
                t = triu_cache[s] = (ii.astype(np.int64), jj.astype(np.int64))
            return t

        for batch in batches:
            col = batch.column(0)
            if isinstance(col, pa.ChunkedArray):  # pragma: no cover
                col = col.combine_chunks()
            # flatten() drops the list layer; offsets bound each block
            # ListArray.offsets respects the logical slice and indexes
            # into .values (the unsliced child), so absolute takes work
            offsets = np.asarray(col.offsets, dtype=np.int64)
            values = col.values
            starts = offsets[:-1]
            sizes = np.diff(offsets)
            emitted_any = False
            # group blocks by size so each group's pair indices come from
            # one broadcasted triu table (fully vectorized)
            order = np.argsort(sizes, kind="stable")
            pos = 0
            n_blocks = len(sizes)
            pend_a: list[np.ndarray] = []
            pend_b: list[np.ndarray] = []
            pend = 0

            def flush():
                nonlocal pend, pend_a, pend_b, emitted_any
                if not pend:
                    return None
                ia = np.concatenate(pend_a)
                ib = np.concatenate(pend_b)
                pend_a, pend_b, pend = [], [], 0
                va = values.take(pa.array(ia))
                vb = values.take(pa.array(ib))
                lt = pc.less_equal(va, vb)
                emitted_any = True
                return pa.RecordBatch.from_arrays(
                    [pc.if_else(lt, va, vb), pc.if_else(lt, vb, va)],
                    [out[0], out[1]],
                )

            while pos < n_blocks:
                s = int(sizes[order[pos]])
                end = pos
                while end < n_blocks and sizes[order[end]] == s:
                    end += 1
                if s >= 2:
                    ii, jj = triu(s)
                    npairs = len(ii)
                    group = starts[order[pos:end]]
                    # chunk the group so one flush stays bounded
                    rows_per = max(1, max_pairs_per_batch // max(npairs, 1))
                    for g0 in range(0, len(group), rows_per):
                        g = group[g0 : g0 + rows_per]
                        ia = (g[:, None] + ii[None, :]).ravel()
                        ib = (g[:, None] + jj[None, :]).ravel()
                        pend_a.append(ia)
                        pend_b.append(ib)
                        pend += len(ia)
                        if pend >= max_pairs_per_batch:
                            b = flush()
                            if b is not None:
                                yield b
                pos = end
            b = flush()
            if b is not None:
                yield b
            if not emitted_any:
                # mapInArrow tolerates empty output, but keep the stream
                # well-typed for readers that peek the first batch
                yield pa.RecordBatch.from_arrays(
                    [values.slice(0, 0), values.slice(0, 0)], [out[0], out[1]]
                )

    return fn


def explode_lower_triangle_exprs(
    blocks: DataFrame, ids_col: str = "ids", out: tuple = ("id_a", "id_b")
) -> DataFrame:
    """JVM expression twin of :func:`explode_lower_triangle`.

    Two CHAINED explodes, not one flattened pair array: peak per-row
    memory stays O(block size) (each generated row carries one element
    plus the slice of later elements), never O(size^2) — a single
    8 MB+ flattened value per near-cap block would churn the generate
    operator's allocator at scale.  Elements may be any orderable type
    incl. structs (ordering is field-lexicographic, so lead with the
    id)."""
    ids = F.col(ids_col)
    halves = blocks.select(
        F.explode(
            F.transform(
                ids,
                lambda x, i: F.struct(
                    x.alias("lhs"),
                    F.slice(ids, i + F.lit(2), F.size(ids)).alias("rest"),
                ),
            )
        ).alias("h")
    )
    return halves.select(
        F.col("h.lhs").alias("_lhs"), F.explode("h.rest").alias("_rhs")
    ).select(
        F.least("_lhs", F.col("_rhs")).alias(out[0]),
        F.greatest("_lhs", F.col("_rhs")).alias(out[1]),
    )


# ---------------------------------------------------------------------------
# SQL-expressible MinHash variant (oracle-checkable end to end)
# ---------------------------------------------------------------------------


def shingle_minhash_bands(
    docs: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    shingle_words: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """MinHash over word shingles using md5 as the hash family —
    deterministic and reproducible in DuckDB SQL (see
    :func:`shingle_minhash_bands_sql`).

    sig[k] = min over shingles s of md5(k || '|' || s) (hex string order);
    band j = hash-of-concat of its rows.

    Production transport is an Arrow-batched mapInArrow running
    hashlib's C md5 (guide §4.2): the JVM expression form below
    (:func:`shingle_minhash_bands_exprs`) evaluates 8 md5s per shingle
    through interpreted higher-order-function lambdas, and its first
    executions run before HotSpot has compiled those paths — measured
    11-13 s cold vs 2.3 s steady-state for dedup_minhash_lsh at sf0.1,
    with ~2 busy cores and zero steal/GC during the cold runs (pure
    JIT-warmup wall).  hashlib is compiled C from call one, so the cold
    and steady costs coincide.  Values are bit-identical (md5 hex is
    md5 hex; byte order == hex-string order), asserted by
    tests/test_blocking.py::test_minhash_bands_arrow_vs_exprs.
    SZ_JVM_MINHASH=1 forces the expression twin.
    """
    import os

    if os.environ.get("SZ_JVM_MINHASH") == "1":
        return shingle_minhash_bands_exprs(
            docs, text_col, id_col, shingle_words, n_hashes, n_bands
        )
    from pyspark.sql import types as T

    # Spread the md5 work before entering Python when the input is
    # under-partitioned: a small corpus scans as ONE parquet partition,
    # which would run the whole signature pass on a single core (guide
    # §2 — the optimizer cannot see Python CPU cost behind an opaque
    # mapInArrow; measured 1.36 -> 1.00 s on the 5k-doc sf0.1 scan).
    # When the upstream already spread the docs (e.g. canonicalize's
    # groupBy leaves one partition per core) the extra round-robin
    # exchange only costs (measured +0.3 s on the er_* chain), so it is
    # skipped — the partition probe is plan-time only, no job runs.
    from sz_spark.udfs import spread_for_python

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    src = spread_for_python(
        docs.select(id_col, F.col(text_col).alias("_t")), parallelism
    )
    out_schema = T.StructType(
        [src.schema[id_col]]
        + [T.StructField(f"band_{b}", T.StringType(), False) for b in range(n_bands)]
    )
    fn = _shingle_band_arrow_fn(shingle_words, n_hashes, n_bands)
    return src.mapInArrow(fn, out_schema)


def _shingle_band_arrow_fn(shingle_words: int, n_hashes: int, n_bands: int):
    """RecordBatch (id, text) -> (id, band_0..band_{n_bands-1}); rows
    with no shingles (fewer than ``shingle_words`` tokens) are dropped,
    matching the expression path's ``size(shingles) > 0`` filter.
    Digest-bytes are compared instead of hexdigest strings — hex
    rendering is byte-order-monotone, so the min is the same shingle."""
    rows_per_band = n_hashes // n_bands

    def fn(batches):
        import pyarrow as pa
        from hashlib import md5

        pre = [f"{k}|".encode() for k in range(n_hashes)]
        kr = range(n_hashes)
        br = range(n_bands)
        # Cross-document digest cache, kept for the whole task: corpora
        # repeat shingles heavily (measured 9.6x at sf0.1), and min over
        # a document's DISTINCT shingles equals min over all of them, so
        # each unique shingle's 8 digests are computed once per task
        # instead of once per occurrence.  Bounded so a pathological
        # vocabulary cannot grow it without limit (entries past the cap
        # are computed but not stored).
        cache: dict[str, tuple] = {}
        cache_cap = 1 << 20
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            keep: list[int] = []
            bands_out: list[list[str]] = [[] for _ in br]
            for i, t in enumerate(texts):
                toks = ("" if t is None else t).split(" ")
                m = len(toks) - shingle_words + 1
                if m < 1:
                    continue
                digs = []
                for j in range(m):
                    s = " ".join(toks[j : j + shingle_words])
                    d = cache.get(s)
                    if d is None:
                        sb = s.encode()
                        d = tuple(md5(pre[k] + sb).digest() for k in kr)
                        if len(cache) < cache_cap:
                            cache[s] = d
                    digs.append(d)
                mh = [min(d[k] for d in digs).hex() for k in kr]
                keep.append(i)
                for b in br:
                    bands_out[b].append(
                        md5(
                            "|".join(
                                mh[b * rows_per_band : (b + 1) * rows_per_band]
                            ).encode()
                        ).hexdigest()
                    )
            yield pa.RecordBatch.from_arrays(
                [ids.take(pa.array(keep, type=pa.int32()))]
                + [pa.array(c, type=pa.string()) for c in bands_out],
                [batch.schema.names[0]] + [f"band_{b}" for b in br],
            )

    return fn


def shingle_minhash_bands_exprs(
    docs: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    shingle_words: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> DataFrame:
    """JVM-expression twin of :func:`shingle_minhash_bands` (native
    Spark expressions end to end; the differential/fallback path).
    Shingling is the shared zip_with construction (textops.word_shingles)
    — the old transform-lambda form re-evaluated split(text) per element
    (guide §1.2; measured 8x on sf0.1)."""
    from sz_spark.textops import word_shingles

    rows_per_band = n_hashes // n_bands
    d = docs.select(
        id_col, word_shingles(text_col, shingle_words).alias("shingles")
    ).filter(F.size("shingles") > 0)
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("shingles"),
                lambda s: F.md5(F.concat(F.lit(f"{k}|"), s)),
            )
        ).alias(f"mh_{k}")
        for k in range(n_hashes)
    ]
    sigs = d.select(id_col, *sig_cols)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    return sigs.select(id_col, *band_cols)


def shingle_minhash_bands_ctes(
    docs_cte: str,
    shingle_words: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> str:
    """CTE chain (no leading WITH) ending in
    ``final_bands(conv_id, band_0..band_{n_bands-1})`` — composable into
    larger oracle statements."""
    rows_per_band = n_hashes // n_bands
    mh_exprs = ",\n       ".join(
        "list_min(list_transform(shingles, s -> md5('{k}|' || s))) AS mh_{k}".format(k=k)
        for k in range(n_hashes)
    )
    band_exprs = ",\n       ".join(
        "md5({parts}) AS band_{b}".format(
            parts=" || '|' || ".join(
                f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
            b=b,
        )
        for b in range(n_bands)
    )
    return f"""docs AS ({docs_cte}),
sh AS (
  SELECT conv_id,
         list_transform(
           range(1, len(string_split(doc, ' ')) - {shingle_words - 2}),
           i -> array_to_string(string_split(doc, ' ')[i : i + {shingle_words - 1}], ' ')
         ) AS shingles
  FROM docs
),
sigs AS (
  SELECT conv_id,
         {mh_exprs}
  FROM sh WHERE len(shingles) > 0
),
final_bands AS (
  SELECT conv_id,
         {band_exprs}
  FROM sigs
)"""


def shingle_minhash_bands_sql(
    docs_cte: str,
    shingle_words: int = 3,
    n_hashes: int = 8,
    n_bands: int = 4,
) -> str:
    """DuckDB twin of :func:`shingle_minhash_bands`."""
    ctes = shingle_minhash_bands_ctes(docs_cte, shingle_words, n_hashes, n_bands)
    return f"WITH {ctes}\nSELECT * FROM final_bands"
