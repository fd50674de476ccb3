"""Differential tests for the blocking transports: the Arrow-batched
md5-MinHash banding (production) must be value-identical to the JVM
expression twin it replaced (guide §4.2 move — same math, compiled
transport)."""

from __future__ import annotations

import pytest

from sz_spark import blocking

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sz_spark.session import build_session

    s = build_session(master="local[4]", shuffle_partitions=4, app_name="blocking-tests")
    yield s
    s.stop()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_bands_arrow_vs_exprs(spark):
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .withColumnRenamed("doc_id", "conv_id")
    )
    got = _rows(blocking.shingle_minhash_bands(d, text_col="text"))
    want = _rows(blocking.shingle_minhash_bands_exprs(d, text_col="text"))
    assert got == want
    assert len(got) > 0


def test_minhash_bands_arrow_vs_exprs_edges(spark):
    # short docs (< shingle_words tokens), empty and NULL text must be
    # dropped by both transports; 3-token docs produce one shingle
    edge = spark.createDataFrame(
        [
            (1, "a b"),
            (2, ""),
            (3, None),
            (4, "x y z"),
            (5, "one two three four"),
            (6, "a  b c d"),  # double space -> empty token, still valid
        ],
        "conv_id long, text string",
    )
    got = _rows(blocking.shingle_minhash_bands(edge, text_col="text"))
    want = _rows(blocking.shingle_minhash_bands_exprs(edge, text_col="text"))
    assert got == want
    assert {r[0] for r in got} == {4, 5, 6}


def test_minhash_bands_env_switch(spark, monkeypatch):
    monkeypatch.setenv("SZ_JVM_MINHASH", "1")
    d = spark.createDataFrame([(1, "p q r s")], "conv_id long, text string")
    out = blocking.shingle_minhash_bands(d, text_col="text")
    # expression path has no MapInArrow node
    assert "MapInArrow" not in out._jdf.queryExecution().executedPlan().toString()


def test_triangle_arrow_vs_exprs_longs(spark):
    import random

    random.seed(7)
    rows = [
        ([random.randrange(10**6) for _ in range(random.choice([0, 1, 2, 3, 5, 17, 64]))],)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "ids array<bigint>")
    got = sorted(map(tuple, blocking.explode_lower_triangle(df).collect()))
    want = sorted(map(tuple, blocking.explode_lower_triangle_exprs(df).collect()))
    assert got == want


def test_triangle_arrow_vs_exprs_strings(spark):
    import random

    random.seed(11)
    rows = [
        ([f"c{random.randrange(1000)}" for _ in range(random.choice([2, 3, 9]))],)
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "ids array<string>")
    got = sorted(map(tuple, blocking.explode_lower_triangle(df).collect()))
    want = sorted(map(tuple, blocking.explode_lower_triangle_exprs(df).collect()))
    assert got == want


def test_triangle_struct_elements_use_jvm_path(spark):
    df = spark.createDataFrame(
        [([(1, "x"), (2, "y"), (0, "z")],)],
        "ids array<struct<doc_id:bigint,simhash:string>>",
    )
    out = blocking.explode_lower_triangle(df, out=("pa", "pb"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan
    assert out.count() == 3


def test_triangle_chunked_large_block(spark):
    # one block far above the flush threshold exercises output chunking
    n = 1500  # ~1.1M pairs > the 256k flush bound
    df = spark.createDataFrame([(list(range(n)),)], "ids array<bigint>")
    assert blocking.explode_lower_triangle(df).count() == n * (n - 1) // 2


def test_cosine_arrow_vs_exprs(spark, monkeypatch):
    """attach_cosine_arrow must be BIT-identical to the _dot/_norm
    expression form (same sequential f64 op order), including the NULL
    contract for mismatched/empty/NULL lists."""
    from sz_spark import ann

    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, [0.5, -0.25, 0.125], [0.5, -0.25, 0.125]),
        (3, [1e-8, 2e8, -3.5], [7.25, 0.0, 1.0]),
        (4, [1.0, 2.0], [1.0, 2.0, 3.0]),  # length mismatch -> NULL
        (5, None, [1.0, 2.0, 3.0]),  # NULL list -> NULL
    ]
    df = spark.createDataFrame(rows, "k long, a array<double>, b array<double>")
    got = {
        r["k"]: r["_cos_raw"]
        for r in ann.attach_cosine_arrow(df, "a", "b").collect()
    }
    monkeypatch.setenv("SZ_JVM_COSINE", "1")
    want = {
        r["k"]: r["_cos_raw"]
        for r in ann.attach_cosine_arrow(df, "a", "b").collect()
    }
    assert got == want  # exact equality, float bits included
    assert want[4] is None and want[5] is None


def test_cosine_arrow_zero_norm_is_null(spark):
    # the ANSI expression form raises DIVIDE_BY_ZERO here; the Arrow
    # transport returns NULL (tolerant contract — no corpus hits this)
    from sz_spark import ann

    df = spark.createDataFrame(
        [(6, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]), (7, [], [])],
        "k long, a array<double>, b array<double>",
    )
    out = {r["k"]: r["_cos_raw"] for r in ann.attach_cosine_arrow(df, "a", "b").collect()}
    assert out == {6: None, 7: None}


def test_byte_histogram_batch_matches_per_row(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from sz_spark.udfs import byte_histogram_udf

    rows = [(1, "hello world!"), (2, ""), (3, "\x01\x7f\x80 abc"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", byte_histogram_udf(F.encode("text", "utf-8")).alias("h")
        ).collect()
    }
    for doc_id, text in rows:
        t = (text or "").encode()
        arr = np.frombuffer(t, dtype=np.uint8)
        ref = np.bincount(arr, minlength=256)[32:128].astype("int32").tolist()
        assert got[doc_id] == ref


def test_distinct_shingles_arrow_vs_exprs(spark, monkeypatch):
    from sz_spark import dedup

    edge = spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None), (4, "x y z"), (5, "r r r r r"), (6, "a  b c")],
        "doc_id long, text string",
    )
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for df in (edge, d):
        got = sorted(map(tuple, dedup._distinct_shingles_exploded(df).collect()))
        monkeypatch.setenv("SZ_JVM_SHINGLES", "1")
        want = sorted(map(tuple, dedup._distinct_shingles_exploded(df).collect()))
        monkeypatch.delenv("SZ_JVM_SHINGLES")
        assert got == want


def test_doc_features_matches_unfused_paths(spark):
    """blocking.doc_features must reproduce BOTH unfused outputs
    exactly: bands_from_features == minhash_bands (same rows), and the
    (len, hist) columns == scoring._prune_attrs_packed bytes."""
    from pyspark.sql import functions as F

    from sz_spark import blocking, canonicalize as canon, scoring
    from sz_spark.transcripts import build_transcripts

    docs = canon.canonicalize(
        build_transcripts(spark, "/root/testdata/sf0.001")
    ).withColumn("did", F.xxhash64("conv_id"))
    feats = blocking.doc_features(
        docs, id_col="did", ndim=96, n_bands=24
    )
    got_bands = sorted(
        map(tuple, blocking.bands_from_features(feats, docs, id_col="did").collect())
    )
    want_bands = sorted(
        map(tuple, blocking.minhash_bands(docs, id_col="did", ndim=96, n_bands=24).collect())
    )
    assert got_bands == want_bands

    got_attrs = sorted(
        map(tuple, feats.select("did", "len", "hist").collect())
    )
    want_attrs = sorted(
        map(tuple, scoring._prune_attrs_packed(docs, "did", "doc").collect())
    )
    assert got_attrs == want_attrs
    assert len(got_attrs) > 0
