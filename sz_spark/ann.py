"""Approximate-nearest-neighbor search over an embedding column.

* :func:`cosine_topk` — brute-force cosine top-k: the exactness baseline
  (oracle-checkable vs DuckDB's list_cosine_similarity).  The query set
  is broadcast; the corpus is scanned once; per-query top-k via a rank
  window partitioned by query.  Linear in corpus size — correct at any
  scale when the query set is small.
* :func:`random_hyperplane_buckets` / :func:`lsh_topk` — the scale path:
  sign-random-projection (SimHash-for-vectors) buckets; candidates only
  join within a bucket (multi-probe over H tables), then exact cosine
  re-ranking.  Hyperplanes derive from splitmix64 so the whole index is
  deterministic and reproducible across runs/executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from sz_spark.kernels import splitmix64


def _dot(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(x):
    return F.sqrt(
        F.aggregate(F.transform(x, lambda p: p * p), F.lit(0.0), lambda a, v: a + v)
    )


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    ``queries``: (query_id, embedding).  The broadcast hint keeps the
    corpus scan shuffle-free (queries << corpus by assumption).
    """
    from pyspark.sql import Window

    corpus = embeddings.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("emb_c")
    )
    q = queries.select(
        F.col("query_id"), F.col("embedding").cast("array<double>").alias("emb_q")
    )
    joined = corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("emb_c"), F.col("emb_q")) / (
        _norm(F.col("emb_c")) * _norm(F.col("emb_q"))
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cos, 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk_sql(n_queries: int = 10, k: int = 5) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(c.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings c JOIN q ON c.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {k}
"""


def hyperplanes(dim: int, n_bits: int, seed: int = 0) -> np.ndarray:
    """Deterministic ±1 hyperplanes from splitmix64 bit streams."""
    idx = np.arange(n_bits * dim, dtype=np.uint64) + np.uint64(seed * 1_000_003)
    bits = (splitmix64(idx) >> np.uint64(17)) & np.uint64(1)
    return np.where(bits.astype(bool), 1.0, -1.0).reshape(n_bits, dim)


def make_bucket_udf(dim: int, n_bits: int = 16, seed: int = 0):
    planes = hyperplanes(dim, n_bits, seed)
    weights = (1 << np.arange(n_bits, dtype=np.int64)).astype(np.int64)

    @pandas_udf(T.LongType())
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(e, dtype=np.float64) for e in embs])
        if mat.size == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        signs = (mat @ planes.T) > 0  # (n, n_bits)
        return pd.Series((signs.astype(np.int64) * weights).sum(axis=1))

    return bucket


def random_hyperplane_buckets(
    embeddings: DataFrame, dim: int, n_bits: int = 16, n_tables: int = 4, seed: int = 0
) -> DataFrame:
    """(vec_id, table, bucket) — one row per hash table."""
    out = None
    for t in range(n_tables):
        b = make_bucket_udf(dim, n_bits, seed=seed * 97 + t)
        part = embeddings.select(
            "vec_id",
            F.lit(t).alias("table"),
            b(F.col("embedding").cast("array<double>")).alias("bucket"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 0,
) -> DataFrame:
    """ANN: candidates share a bucket in >= 1 table, exact re-rank."""
    from pyspark.sql import Window

    cb = random_hyperplane_buckets(embeddings, dim, n_bits, n_tables, seed)
    qe = queries.select(
        F.col("query_id").alias("vec_id"), "embedding"
    )
    qb = random_hyperplane_buckets(qe, dim, n_bits, n_tables, seed).withColumnRenamed(
        "vec_id", "query_id"
    )
    cand = (
        cb.join(qb, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    withv = (
        cand.join(
            embeddings.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("emb_c")
            ),
            "vec_id",
        )
        .join(
            queries.select(
                "query_id", F.col("embedding").cast("array<double>").alias("emb_q")
            ),
            "query_id",
        )
    )
    cos = _dot(F.col("emb_c"), F.col("emb_q")) / (
        _norm(F.col("emb_c")) * _norm(F.col("emb_q"))
    )
    scored = withv.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), F.round(cos, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
