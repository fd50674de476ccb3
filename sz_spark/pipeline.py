"""End-to-end record-linkage pipeline (BASELINE.json north_rule):

transcripts -> canonicalize -> MinHash fingerprints (reference math) ->
LSH bands -> capped blocks -> candidate pairs -> length prune ->
batched-DP edit-similarity scoring -> threshold -> large-star/small-star
connected components -> entity clusters.

Each stage is resumable via CheckpointManager; evaluation computes
pairwise precision/recall/F1 against the synthetic ground truth at a
fixed blocking key, per the BASELINE.json metric.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sz_spark import blocking, canonicalize as canon, clustering, scoring
from sz_spark.lineage import CheckpointManager
from sz_spark.transcripts import build_transcripts


@dataclass
class PipelineConfig:
    # r4 measured A/B at sf0.1 (BASELINE.md): recall/F1 = 1.000000 at
    # ndim 128/96/64 alike (the layered prefix key carries short docs),
    # while 96 dims cut the pipeline wall ~45% — promoted per VERDICT r3
    # #6.  64 also held on THIS corpus but 96 keeps a robustness margin
    # for corpora whose band agreement is weaker; the blocking library
    # default stays 128 for prefix-less corpora (blocking.DEFAULT_NDIM).
    ndim: int = 96
    fp_widths: tuple = blocking.DEFAULT_FP_WIDTHS
    n_bands: int = 24
    rows_per_band: int = blocking.DEFAULT_ROWS
    seed: int = 0
    # true variants sit >= 0.96, cross-entity pairs <= 0.905 by the salt
    # construction (sz_spark.transcripts docstring) — 0.94 splits with
    # guaranteed margin on both sides
    threshold: float = 0.94
    max_block_size: int = 64
    # blocks between max_block_size and salt_up_to get salted sub-keys
    # (bounded O(max^2) work per salt) instead of being dropped
    salt_up_to: int = 1024
    checkpoint_dir: str | None = None
    cc_max_iterations: int = 20
    # Fail loudly on an xxhash64 surrogate-key collision (ADVICE r4):
    # one cheap agg over the canonical-docs stage.  Runs whenever the
    # stage is checkpoint-materialized (re-reading it is one scan); in
    # lineage-only runs the agg would recompute the whole canonicalize,
    # so set True to force it anyway.
    verify_surrogate_keys: bool | None = None


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    """Returns {'docs', 'pairs', 'scored', 'clusters', 'suppressed_blocks'}."""
    cfg = cfg or PipelineConfig()
    ckpt = CheckpointManager(spark, cfg.checkpoint_dir)

    # Long surrogate key for every shuffle-heavy stage: the band table
    # and the candidate-pair set are shuffled several times each, and a
    # string conv_id costs ~3x the bytes of a long in UnsafeRow format.
    # xxhash64 is deterministic across runs/executors; the collision
    # probability for n docs is n^2/2^65 (~2e-9 at 1M docs — document,
    # don't handle).  conv_id reappears only in the (small) outputs.
    docs = ckpt.stage(
        "canonical_docs",
        lambda: canon.canonicalize(transcripts).withColumn(
            "did", F.xxhash64("conv_id")
        ),
    )

    # Collision guard (ADVICE r4): a did collision would silently merge
    # two conversations through blocking/scoring and FAN OUT rows at the
    # conv_id remap join — corrupting clusters instead of erroring.  One
    # agg makes it fail loudly.  canonicalize emits one row per conv_id
    # (groupBy), so count(*) == countDistinct(did) iff no collision.
    verify = cfg.verify_surrogate_keys
    if verify is None:
        verify = cfg.checkpoint_dir is not None
    if verify:
        row = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("did")).alias("n_did"),
        ).collect()[0]
        if row["n"] != row["n_did"]:
            raise RuntimeError(
                f"xxhash64(conv_id) surrogate-key collision: {row['n']} docs "
                f"-> {row['n_did']} distinct dids; rerun with a string key "
                "or a salted surrogate"
            )

    # Fused per-document features: band keys + prune len/histogram from
    # ONE Python pass over the corpus (blocking.doc_features) — the
    # text used to cross the JVM->Python boundary twice (fingerprint
    # bands, then prune histograms), and the checkpoint now stores the
    # narrow 133k-row feature table instead of the exploded band table.
    def _feats():
        return blocking.doc_features(
            docs,
            id_col="did",
            ndim=cfg.ndim,
            widths=cfg.fp_widths,
            seed=cfg.seed,
            n_bands=cfg.n_bands,
            rows_per_band=cfg.rows_per_band,
        )

    feats = ckpt.stage("doc_features", _feats)
    bands = blocking.bands_from_features(feats, docs, id_col="did")
    pairs_df, suppressed = blocking.block_pairs(
        bands, id_col="did", max_block_size=cfg.max_block_size,
        salt_up_to=cfg.salt_up_to,
    )
    pairs = ckpt.stage("pairs", lambda: pairs_df)

    id_map = docs.select("did", "conv_id")

    # broadcasts created by _scored(), released (executor blocks) once
    # the stage is materialized — the checkpoint truncates the lineage,
    # so nothing re-executes the UDFs that captured them; unpersist
    # (not destroy) keeps the driver copy as a safety net
    gather_bcs: list = []

    def _scored():
        # Two-tier prune+score (scoring.py "Gathered" block): when the
        # corpus passes the broadcast gates, per-doc attributes and
        # texts ship ONCE per worker and the candidate stream stays
        # (id_a, id_b) — no attribute/text joins, no per-pair histogram
        # transport.  Beyond the gates (or SZ_NO_GATHER=1) the
        # join-based path runs unchanged; both tiers make identical
        # τ-decisions (tests/test_pipeline.py gather-parity tests).
        if scoring.gather_gate(feats):
            prune_bc = scoring.build_prune_broadcast(
                feats.select("did", "len", "hist")
            )
            gather_bcs.append(prune_bc)
            pruned = scoring.prune_pairs_gathered(
                pairs, prune_bc, cfg.threshold
            )
            import os as _os

            if _os.environ.get("SZ_TEXT_GATHER") == "1" and scoring.text_gather_gate(
                docs
            ):
                # Full-gather twin: also broadcast the text blob and
                # score join-free.  Measured a wash at the probe (the
                # ~2 s driver collect+broadcast of the 89 MB corpus
                # cancels the ~0.6 s survivor text joins + transport it
                # removes), so the default scores the (tiny) survivor
                # set through attach_texts; the tier stays for corpora
                # whose survivor count is large relative to their text
                # bytes.
                text_bc = scoring.build_text_broadcast(docs, id_col="did")
                gather_bcs.append(text_bc)
                out = scoring.score_pairs_gathered(
                    pruned, text_bc, bounded=cfg.threshold
                ).select("id_a", "id_b", "edit_distance", "sim")
            else:
                with_texts = scoring.attach_texts(pruned, docs, id_col="did")
                out = scoring.score_pairs(
                    with_texts, threshold=None, bounded=cfg.threshold
                ).select("id_a", "id_b", "edit_distance", "sim")
        else:
            # prune BEFORE attaching texts: the length/histogram prunes
            # need only (len, hist) per side (~800 B/pair) and drop ~95%
            # of candidates; the doc bytes join only the survivors
            # (measured funnel in scoring.attach_prune_attrs docstring)
            attrs = scoring.attach_prune_attrs(
                pairs, docs, id_col="did",
                attrs_frame=feats.select("did", "len", "hist"),
            )
            pruned = scoring.prune_pairs_arrow(attrs, cfg.threshold)
            with_texts = scoring.attach_texts(pruned, docs, id_col="did")
            out = scoring.score_pairs(
                with_texts, threshold=None, bounded=cfg.threshold
            ).select("id_a", "id_b", "edit_distance", "sim")
        # map surrogates back to conv_ids on the (small) scored output
        return (
            out.join(id_map.withColumnRenamed("did", "id_a"), "id_a")
            .withColumnRenamed("conv_id", "conv_a")
            .join(id_map.withColumnRenamed("did", "id_b"), "id_b")
            .withColumnRenamed("conv_id", "conv_b")
            .select(
                F.col("conv_a").alias("id_a"),
                F.col("conv_b").alias("id_b"),
                "edit_distance",
                "sim",
            )
        )

    scored = ckpt.stage("scored", _scored)
    for bc in gather_bcs:
        bc.unpersist()

    edges = scored.filter(F.col("sim") >= cfg.threshold).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    cc_ckpt = (
        (lambda df, i: ckpt.materialize(f"cc_iter_{i}", df))
        if cfg.checkpoint_dir
        else None
    )
    assignments = clustering.connected_components(
        edges, max_iterations=cfg.cc_max_iterations, checkpoint=cc_ckpt
    )
    clusters = ckpt.stage(
        "clusters",
        lambda: clustering.clusters_with_singletons(assignments, docs, "conv_id"),
    )

    return {
        "docs": docs,
        "pairs": pairs,
        "scored": scored,
        "clusters": clusters,
        "suppressed_blocks": suppressed,
    }


def evaluate_pairs(
    scored: DataFrame,
    docs_with_entity: DataFrame,
    threshold: float,
) -> dict[str, float]:
    """Pairwise P/R/F1 on labeled pairs at the pipeline's blocking key.

    A candidate pair is labeled positive iff both conversations derive
    from the same ground-truth entity; predicted positive iff sim >= τ.
    Recall additionally counts ground-truth pairs the blocking missed
    (they are false negatives even though never scored).
    """
    ent = docs_with_entity.select("conv_id", "entity_id")
    labeled = (
        scored.join(ent.withColumnRenamed("conv_id", "id_a"), "id_a")
        .withColumnRenamed("entity_id", "ent_a")
        .join(ent.withColumnRenamed("conv_id", "id_b"), "id_b")
        .withColumnRenamed("entity_id", "ent_b")
        .withColumn("label", (F.col("ent_a") == F.col("ent_b")).cast("int"))
        .withColumn("pred", (F.col("sim") >= threshold).cast("int"))
    )
    agg = labeled.agg(
        F.sum(F.col("label") * F.col("pred")).alias("tp"),
        F.sum((1 - F.col("label")) * F.col("pred")).alias("fp"),
        F.sum(F.col("label") * (1 - F.col("pred"))).alias("fn_scored"),
    ).collect()[0]
    tp = agg["tp"] or 0
    fp = agg["fp"] or 0
    fn = agg["fn_scored"] or 0

    # ground-truth pairs missed by blocking entirely
    total_true = (
        ent.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("t"))
        .collect()[0]["t"]
        or 0
    )
    fn_missed = int(total_true) - tp - fn
    fn_total = fn + max(fn_missed, 0)

    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn_total) if tp + fn_total else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": float(tp),
        "fp": float(fp),
        "fn": float(fn_total),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def run_on_sf_dir(
    spark: SparkSession, sf_dir: str, cfg: PipelineConfig | None = None
) -> dict:
    """Convenience: synth transcripts from sf_dir docs, run, evaluate."""
    cfg = cfg or PipelineConfig()
    transcripts = build_transcripts(spark, sf_dir, with_entity_id=True)
    stages = run_pipeline(spark, transcripts.drop("entity_id"), cfg)
    docs_ent = canon.canonicalize(transcripts, carry=["entity_id"]).select(
        "conv_id", "entity_id"
    )
    metrics = evaluate_pairs(stages["scored"], docs_ent, cfg.threshold)
    return {"stages": stages, "metrics": metrics}
