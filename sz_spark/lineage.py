"""Checkpointing, resume, and per-partition lineage/metric rows.

Every pipeline stage writes:
* its output to ``<root>/<stage>/data`` (parquet in the sandbox; set
  ``format='iceberg'`` + a table catalog on a real cluster — the call
  sites are format-agnostic),
* one metric row per partition to ``<root>/_metrics`` (stage, run_id,
  partition_id, rows, min/max key, wall ts) — the per-partition lineage
  required by BASELINE.json north_rule,
* a ``_SUCCESS`` marker (written by Spark) that makes the stage
  resumable: a rerun finds the marker and reads the stage back instead
  of recomputing it (kill/rerun ⇒ identical output, tested in
  tests/test_pipeline.py).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointManager:
    def __init__(
        self,
        spark: SparkSession,
        root: str | None,
        run_id: str | None = None,
        fmt: str = "parquet",
    ):
        self.spark = spark
        self.root = root
        # unique per run unless the caller pins one: resumed/repeated runs
        # append their own metric rows instead of duplicating (stage,
        # run_id, partition_id) keys
        self.run_id = run_id or f"run-{uuid.uuid4().hex[:12]}"
        self.fmt = fmt

    def _path(self, stage: str) -> str:
        return os.path.join(self.root, stage, "data")

    def is_done(self, stage: str) -> bool:
        """_SUCCESS probe through the Hadoop FileSystem API so resume
        works for cluster URIs (hdfs://, s3a://) as well as local paths —
        a driver-side os.path check would silently disable resume on a
        real cluster."""
        if not self.root:
            return False
        marker = os.path.join(self._path(stage), "_SUCCESS")
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(marker)
        fs = hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return bool(fs.exists(hpath))

    def read(self, stage: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self._path(stage))

    def materialize(self, stage: str, df: DataFrame) -> DataFrame:
        """Write-then-read: truncates lineage AND persists for resume.
        Without a root dir, falls back to localCheckpoint (no resume)."""
        if not self.root:
            return df.localCheckpoint(eager=True)
        path = self._path(stage)
        df.write.format(self.fmt).mode("overwrite").save(path)
        out = self.spark.read.format(self.fmt).load(path)
        self._write_metrics(stage, out)
        return out

    def stage(self, stage: str, build) -> DataFrame:
        """Resume-aware stage runner: reuse the checkpoint if present."""
        if self.is_done(stage):
            return self.read(stage)
        return self.materialize(stage, build())

    def _write_metrics(self, stage: str, df: DataFrame) -> None:
        """One row per partition: (stage, run_id, partition_id, rows,
        min_key, max_key, wall_ts).  min/max are over the stage's first
        column cast to string — the per-partition key-range lineage the
        docstring promises."""
        key = F.col(df.columns[0]).cast("string") if df.columns else F.lit(None)
        per_part = (
            df.select(
                F.spark_partition_id().alias("partition_id"), key.alias("_k")
            )
            .groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.min("_k").alias("min_key"),
                F.max("_k").alias("max_key"),
            )
        )
        per_part = per_part.withColumn("stage", F.lit(stage)).withColumn(
            "run_id", F.lit(self.run_id)
        ).withColumn("wall_ts", F.lit(time.time()))
        per_part.write.format(self.fmt).mode("append").save(
            os.path.join(self.root, "_metrics")
        )

    def metrics(self) -> DataFrame:
        return self.spark.read.format(self.fmt).load(os.path.join(self.root, "_metrics"))
