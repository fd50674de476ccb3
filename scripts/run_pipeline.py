#!/usr/bin/env python
"""spark-submit entry point for the ER pipeline.

Cluster usage (the north-rule deployment shape):

    zip -r sz_spark.zip sz_spark
    spark-submit --py-files sz_spark.zip scripts/run_pipeline.py \
        --sf-dir /data/testdata/sf0.1 \
        --output /data/out/clusters \
        --checkpoint-dir /data/ckpt/run1 \
        --threshold 0.94

Reads the documents table under --sf-dir (or a prebuilt transcripts
parquet via --transcripts), runs canonicalize -> blocking -> scoring ->
clustering with resumable checkpoints, writes cluster assignments to
--output, and prints a one-line JSON summary.

No local-mode assumptions: the session master/deploy mode comes from
spark-submit; only when run directly (python scripts/run_pipeline.py)
does it fall back to local[*].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow running from a repo checkout without --py-files: spark-submit puts
# scripts/ (not the repo root) on sys.path
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "sz_spark")) and _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", help="directory with documents.parquet (synth input)")
    p.add_argument("--transcripts", help="parquet path of a real transcripts table")
    p.add_argument("--output", required=True, help="output path for cluster assignments")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--threshold", type=float, default=0.94)
    p.add_argument("--ndim", type=int, default=128)
    p.add_argument("--max-block-size", type=int, default=64)
    args = p.parse_args()
    if not args.sf_dir and not args.transcripts:
        p.error("one of --sf-dir / --transcripts is required")

    from pyspark.sql import SparkSession

    # master/deploy mode come from spark-submit; these configs are
    # wanted everywhere (AQE skew-join + Arrow UDF transport; byte-driven
    # partition coalescing off because the heavy stages are CPU-bound
    # Arrow UDFs whose cost AQE cannot see — rationale + A/B in
    # sz_spark/session.py)
    spark = (
        SparkSession.builder.appName("sz_spark_pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from sz_spark.pipeline import PipelineConfig, run_pipeline
    from sz_spark.transcripts import build_transcripts

    if args.transcripts:
        transcripts = spark.read.parquet(args.transcripts)
    else:
        transcripts = build_transcripts(spark, args.sf_dir)

    cfg = PipelineConfig(
        ndim=args.ndim,
        threshold=args.threshold,
        max_block_size=args.max_block_size,
        checkpoint_dir=args.checkpoint_dir,
    )
    t0 = time.time()
    n_turns = transcripts.count()
    stages = run_pipeline(spark, transcripts, cfg)
    stages["clusters"].write.mode("overwrite").parquet(args.output)
    clusters = spark.read.parquet(args.output)
    summary = {
        "n_turns": n_turns,
        "n_conversations": clusters.count(),
        "n_clusters": clusters.select("cluster_id").distinct().count(),
        "suppressed_blocks": stages["suppressed_blocks"].count(),
        "wall_sec": round(time.time() - t0, 2),
        "output": args.output,
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
