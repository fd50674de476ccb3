"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship record-linkage pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator registry of
sz_spark.queries (SURVEY.md §2 coverage + training-data operators),
each oracle being the exact ANSI-SQL twin runnable by DuckDB on the
pre-registered parquet views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: transcripts -> blocking -> scoring -> entity clusters,
    returned as (conv_id, cluster_id, sim stats) on sf0.001."""
    from pyspark.sql import functions as F

    from sz_spark.pipeline import PipelineConfig, run_pipeline
    from sz_spark.transcripts import build_transcripts

    transcripts = build_transcripts(spark, "/root/testdata/sf0.001")
    stages = run_pipeline(spark, transcripts, PipelineConfig())
    clusters = stages["clusters"]
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return clusters.join(sizes, "cluster_id").select(
        "conv_id", "cluster_id", "cluster_size"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sz_spark.queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from sz_spark.queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
