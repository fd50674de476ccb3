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
