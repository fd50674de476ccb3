"""Mini-driver: run every queries() entry at sf0.001 and compare against
its oracle_sql() twin via DuckDB — the same check the real driver runs
at sf0.01 (row count + schema-ish + order-insensitive value equality).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="session")
def spark():
    from sz_spark.session import build_session

    s = build_session(master="local[8]", shuffle_partitions=8, app_name="tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(name, spark, con):
    q = ALL_QUERIES[name]
    got = q(spark, SF_DIR).toPandas()
    sql = ORACLES.get(name)
    if sql is None:
        # rows-only contract: runs, stable schema, deterministic
        again = q(spark, SF_DIR).toPandas()
        assert list(got.columns) == list(again.columns)
        assert len(got) == len(again)
        return
    exp = con.execute(sql).df()
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    assert list(g.columns) == list(e.columns), f"{name}: cols {list(g.columns)} vs {list(e.columns)}"
    if len(g) == 0:
        return
    for c in g.columns:
        if "float" in str(g[c].dtype) or "float" in str(e[c].dtype):
            assert (
                (g[c].astype(float) - e[c].astype(float)).abs().max() <= 1e-6
            ), f"{name}.{c} float mismatch"
        else:
            same = (g[c].astype(str).values == e[c].astype(str).values)
            assert same.all(), f"{name}.{c}: first diff at {list(same).index(False)}: {g[c][~same].head(3).tolist()} vs {e[c][~same].head(3).tolist()}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert set(df.columns) == {"conv_id", "cluster_id", "cluster_size"}


def test_embedding_lsh_recall(spark):
    """The registered LSH near-dup plan vs the brute-force baseline:
    every LSH pair must appear in the brute-force result (precision 1 —
    the exact re-rank guarantees it), and recall must be positive at
    the corpus's weak-similarity regime (cos <= 0.48; LSH is designed
    for >= 0.9 near-dups where per-table collision is ~100x higher)."""
    from sz_spark import dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_near_pairs_lsh(emb, threshold=0.4, dim=64).collect()
    }
    assert lsh <= brute  # exact re-rank: no false positives
    assert len(brute) == 0 or len(lsh) > 0


def test_simhash_bucket_cap(spark):
    """max_bucket_size drops stop-key buckets: identical signatures in
    an oversized bucket produce no pairs, small buckets are unaffected."""
    from sz_spark import dedup

    rows = [(i, 0) for i in range(50)] + [(100, 31), (101, 31)]
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    capped = dedup.simhash_near_pairs(sigs, max_hamming=3, max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}
    uncapped = dedup.simhash_near_pairs(sigs, max_hamming=3)
    # hamming(0, 31) = 5 > 3, so cross-group pairs are filtered
    assert uncapped.count() == 50 * 49 // 2 + 1
