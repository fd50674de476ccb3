"""End-to-end pipeline gates (BASELINE.json):
* pairwise F1 >= 0.99 on labeled pairs at the pipeline's blocking key
* deterministic output across parallelism levels (the reference's
  backend-differential sweep, test/sz_helpers.py:1360 — same clusters at
  local[2] vs local[8] / different shuffle-partition counts)
* checkpoint resume reproduces identical output
"""

from __future__ import annotations

import os
import shutil

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from sz_spark.session import build_session

    s = build_session(master="local[8]", shuffle_partitions=8, app_name="pipe-tests")
    yield s
    s.stop()


def test_f1_gate(spark):
    from sz_spark.pipeline import PipelineConfig, run_on_sf_dir

    res = run_on_sf_dir(spark, SF_DIR, PipelineConfig())
    m = res["metrics"]
    assert m["precision"] >= 0.99, m
    assert m["recall"] >= 0.99, m
    assert m["f1"] >= 0.99, m


def test_deterministic_across_parallelism(spark):
    """Same clusters regardless of shuffle-partition count (stand-in for
    executor-count invariance)."""
    from pyspark.sql import functions as F

    from sz_spark.pipeline import PipelineConfig, run_pipeline
    from sz_spark.transcripts import build_transcripts

    outs = []
    for n_part in (3, 17):
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        tr = build_transcripts(spark, SF_DIR)
        stages = run_pipeline(spark, tr, PipelineConfig())
        outs.append(
            stages["clusters"]
            .orderBy("conv_id")
            .toPandas()
            .reset_index(drop=True)
        )
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert outs[0].equals(outs[1])


def test_block_salting(spark):
    """Oversized blocks get salted sub-keys that spread the work across
    reducers WITHOUT losing any in-block pair (replicated-side salted
    self-join); small blocks stay intact; huge blocks are suppressed
    and logged."""
    from pyspark.sql import functions as F

    from sz_spark import blocking

    rows = (
        [("small%d" % i, 0, 111) for i in range(5)]
        + [("hot%02d" % i, 0, 222) for i in range(40)]
        + [("huge%d" % i, 0, 333) for i in range(200)]
    )
    bands = spark.createDataFrame(rows, "conv_id string, band_id int, band_hash long")
    kept, suppressed = blocking.cap_blocks(bands, max_block_size=8, salt_up_to=64)
    sup = suppressed.collect()
    assert len(sup) == 1 and sup[0]["block_size"] == 200
    k = kept.toPandas()
    assert (k[k.conv_id.str.startswith("small")]["salt"] == 0).all()
    assert (k[k.conv_id.str.startswith("small")]["n_salts"] == 1).all()
    hot = k[k.conv_id.str.startswith("hot")]
    assert hot["salt"].nunique() > 1  # split across salts
    assert (hot["n_salts"] == 5).all()  # ceil(40/8)
    pairs = blocking.candidate_pairs(kept).toPandas()
    # salting preserves recall exactly: ALL 40C2 hot pairs + 5C2 small
    n_hot_pairs = len(pairs[pairs.id_a.str.startswith("hot")])
    assert n_hot_pairs == 40 * 39 // 2
    n_small_pairs = len(pairs[pairs.id_a.str.startswith("small")])
    assert n_small_pairs == 5 * 4 // 2
    # suppressed block contributes no pairs at all
    assert not pairs.id_a.str.startswith("huge").any()


def test_block_pairs_fused_equals_salted_join(spark):
    """The fused two-shuffle block_pairs (window cap + in-array pair
    emission) produces EXACTLY the salted self-join's pair set and the
    same suppressed stats, on the skew fixture (intact block, salted-
    tier block, suppressed block) plus multi-band overlap for the
    cross-band dedup."""
    from sz_spark import blocking

    rows = (
        [("small%d" % i, 0, 111) for i in range(5)]
        + [("hot%02d" % i, 0, 222) for i in range(40)]
        + [("huge%d" % i, 0, 333) for i in range(200)]
        # same ids colliding again in another band: dedup must collapse
        + [("small%d" % i, 1, 444) for i in range(5)]
        + [("hot%02d" % i, 1, 555) for i in range(3)]
    )
    bands = spark.createDataFrame(rows, "conv_id string, band_id int, band_hash long")
    kept, sup_old = blocking.cap_blocks(bands, max_block_size=8, salt_up_to=64)
    old = blocking.candidate_pairs(kept).toPandas()
    new, sup_new = blocking.block_pairs(bands, max_block_size=8, salt_up_to=64)
    new = new.toPandas()
    key = lambda df: set(map(tuple, df[["id_a", "id_b"]].itertuples(index=False)))
    assert key(new) == key(old) and len(new) == len(old)  # set AND no dups
    assert (
        sup_new.orderBy("band_hash").toPandas().to_dict("records")
        == sup_old.orderBy("band_hash").toPandas().to_dict("records")
    )


def test_resume_identical(spark, tmp_path):
    from sz_spark.pipeline import PipelineConfig, run_pipeline
    from sz_spark.transcripts import build_transcripts

    ck = str(tmp_path / "ckpt")
    tr = build_transcripts(spark, SF_DIR)
    cfg = PipelineConfig(checkpoint_dir=ck)
    r1 = run_pipeline(spark, tr, cfg)
    c1 = r1["clusters"].orderBy("conv_id").toPandas().reset_index(drop=True)
    # simulated mid-run failure: later stages lost, earlier kept
    for stage in ("pairs", "scored", "clusters"):
        shutil.rmtree(os.path.join(ck, stage), ignore_errors=True)
    r2 = run_pipeline(spark, tr, cfg)
    c2 = r2["clusters"].orderBy("conv_id").toPandas().reset_index(drop=True)
    assert c1.equals(c2)
    # lineage metrics exist per stage
    metrics = r2["clusters"].sparkSession.read.parquet(os.path.join(ck, "_metrics"))
    stages_logged = {r["stage"] for r in metrics.select("stage").distinct().collect()}
    assert {"canonical_docs", "doc_features", "pairs", "scored"} <= stages_logged


def test_surrogate_collision_guard(spark, monkeypatch):
    """ADVICE r4: a did collision must fail loudly, not corrupt clusters.
    Real xxhash64 collisions are ~2e-9 at 1M docs, so force one by
    patching the surrogate to a constant and assert the guard raises."""
    from pyspark.sql import functions as F

    import sz_spark.pipeline as P
    from sz_spark.transcripts import build_transcripts

    tr = build_transcripts(spark, SF_DIR)
    monkeypatch.setattr(P.F, "xxhash64", lambda *cols: F.lit(7).cast("long"))
    with pytest.raises(RuntimeError, match="collision"):
        P.run_pipeline(spark, tr, P.PipelineConfig(verify_surrogate_keys=True))


def test_arrow_transport_parity(spark):
    """The r5 mapInArrow transport (flat-buffer kernels) must produce
    exactly the pandas-UDF twins' outputs: band keys from
    blocking.minhash_bands == make_band_keys_udf, and bounded-lev
    scoring == make_bounded_levenshtein_udf."""
    from pyspark.sql import functions as F

    from sz_spark import blocking, canonicalize as canon, scoring
    from sz_spark.transcripts import build_transcripts
    from sz_spark.udfs import make_band_keys_udf, make_bounded_levenshtein_udf

    docs = canon.canonicalize(build_transcripts(spark, SF_DIR)).limit(200)

    # bands: arrow path (production) vs pandas twin
    got = (
        blocking.minhash_bands(docs, ndim=32, n_bands=8, rows_per_band=4,
                               widths=None, prefix_len=0)
        .orderBy("conv_id", "band_id")
        .toPandas()
    )
    keys = make_band_keys_udf(ndim=32, n_bands=8, rows_per_band=4)
    exp = (
        docs.select(
            "conv_id", keys(F.encode(F.col("doc"), "utf-8")).alias("bk")
        )
        .select("conv_id", F.posexplode("bk").alias("band_id", "band_hash"))
        .orderBy("conv_id", "band_id")
        .toPandas()
    )
    assert got.reset_index(drop=True).equals(exp.reset_index(drop=True))

    # scoring: arrow bounded path vs pandas bounded twin
    pairs = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.conv_id").alias("id_a"), F.col("b.conv_id").alias("id_b")
        )
        .limit(500)
    )
    wt = scoring.attach_texts(pairs, docs)
    tau = 0.3  # low enough that pairs land on both sides of the bound
    got_s = (
        scoring.score_pairs(wt, bounded=tau)
        .select("id_a", "id_b", "edit_distance", F.round("sim", 9).alias("sim"))
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    lev = make_bounded_levenshtein_udf(tau)
    exp_s = (
        wt.withColumn(
            "edit_distance",
            lev(F.encode(F.col("doc_a"), "utf-8"), F.encode(F.col("doc_b"), "utf-8")),
        )
        .withColumn(
            "sim",
            F.round(
                F.lit(1.0)
                - F.col("edit_distance") / F.greatest("len_a", "len_b").cast("double"),
                9,
            ),
        )
        .select("id_a", "id_b", "edit_distance", "sim")
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    # bounded contract: sub-τ pairs come back CLAMPED, and the clamp value
    # depends on chunk composition (both paths chunk independently) — so
    # compare exactly what consumers rely on: identical pair set, and for
    # every pair either both sides agree exactly (kept pairs are exact
    # below the bound) or both sides score it below τ (dropped either way)
    m = got_s.merge(exp_s, on=["id_a", "id_b"], suffixes=("_a", "_p"))
    assert len(m) == len(got_s) == len(exp_s)
    kept = (m.sim_a >= tau) | (m.sim_p >= tau)
    assert (m.loc[kept, "edit_distance_a"] == m.loc[kept, "edit_distance_p"]).all()
    assert (m.loc[kept, "sim_a"] == m.loc[kept, "sim_p"]).all()
    assert ((m.sim_a < tau) == (m.sim_p < tau)).all()
    assert kept.sum() > 0  # the parity check must not be vacuous


def test_prune_first_scored_flow_parity(spark):
    """The production scored flow (attach_prune_attrs -> prunes ->
    attach_texts on survivors) must select exactly the pair set of the
    attach-everything-first flow, and score it identically — the
    restructure only moves WHEN the doc bytes join, never WHAT is
    scored."""
    from pyspark.sql import functions as F

    from sz_spark import canonicalize as canon, scoring
    from sz_spark.queries import _md5_band_pairs
    from sz_spark.transcripts import build_transcripts

    tau = 0.94
    docs = canon.canonicalize(build_transcripts(spark, SF_DIR))
    pairs = _md5_band_pairs(docs)

    # old flow: texts + hists attached up front
    wt_old = scoring.attach_texts(pairs, docs, with_histogram=True)
    pruned_old = scoring.histogram_prune(
        scoring.length_prune(wt_old, tau), tau
    )
    old = (
        scoring.score_pairs(pruned_old, bounded=tau)
        .select("id_a", "id_b", "edit_distance", F.round("sim", 9).alias("sim"))
        .orderBy("id_a", "id_b")
        .toPandas()
    )

    # production flow: prune on (len, hist) only, texts join survivors
    attrs = scoring.attach_prune_attrs(pairs, docs)
    pruned = scoring.histogram_prune(scoring.length_prune(attrs, tau), tau)
    wt_new = scoring.attach_texts(pruned.select("id_a", "id_b"), docs)
    new = (
        scoring.score_pairs(wt_new, bounded=tau)
        .select("id_a", "id_b", "edit_distance", F.round("sim", 9).alias("sim"))
        .orderBy("id_a", "id_b")
        .toPandas()
    )

    assert len(old) > 0  # non-vacuous
    m = old.merge(new, on=["id_a", "id_b"], suffixes=("_o", "_n"))
    assert len(m) == len(old) == len(new)
    # kept pairs (>= tau on either side) must agree exactly; sub-tau
    # pairs may clamp differently (chunk composition) but must agree on
    # which side of tau they land
    kept = (m.sim_o >= tau) | (m.sim_n >= tau)
    assert (m.loc[kept, "edit_distance_o"] == m.loc[kept, "edit_distance_n"]).all()
    assert (m.loc[kept, "sim_o"] == m.loc[kept, "sim_n"]).all()
    assert ((m.sim_o < tau) == (m.sim_n < tau)).all()


def test_prune_pairs_arrow_matches_expression_twin(spark):
    """Fused Arrow prune == histogram_prune(length_prune(...)) on the
    real candidate frame (same comparisons, f64-identical bounds)."""
    import os

    from pyspark.sql import functions as F

    from sz_spark import blocking, canonicalize as canon, scoring
    from sz_spark.transcripts import build_transcripts

    docs = canon.canonicalize(
        build_transcripts(spark, "/root/testdata/sf0.001")
    ).withColumn("did", F.xxhash64("conv_id"))
    bands = blocking.minhash_bands(docs, id_col="did", ndim=96, n_bands=24)
    pairs, _ = blocking.block_pairs(
        bands, id_col="did", max_block_size=64, salt_up_to=1024
    )
    attrs = scoring.attach_prune_attrs(pairs, docs, id_col="did")
    got = sorted(map(tuple, scoring.prune_pairs_arrow(attrs, 0.94).collect()))
    os.environ["SZ_JVM_PRUNE"] = "1"
    try:
        want = sorted(map(tuple, scoring.prune_pairs_arrow(attrs, 0.94).collect()))
    finally:
        del os.environ["SZ_JVM_PRUNE"]
    assert got == want
    assert len(got) > 0


def test_prune_packed_matches_array_path(spark):
    """attach_prune_attrs(packed=True) + prune must make the IDENTICAL
    keep/drop decisions as the array-histogram path on a real candidate
    frame: the u16 packing only clamps bins above 65535, which no
    document here reaches, so the L1 values (and the f64 bound
    comparisons) are the same numbers."""
    from pyspark.sql import functions as F

    from sz_spark import blocking, canonicalize as canon, scoring
    from sz_spark.transcripts import build_transcripts

    docs = canon.canonicalize(
        build_transcripts(spark, SF_DIR)
    ).withColumn("did", F.xxhash64("conv_id"))
    bands = blocking.minhash_bands(docs, id_col="did", ndim=96, n_bands=24)
    pairs, _ = blocking.block_pairs(
        bands, id_col="did", max_block_size=64, salt_up_to=1024
    )
    arr = scoring.attach_prune_attrs(pairs, docs, id_col="did")
    pk = scoring.attach_prune_attrs(pairs, docs, id_col="did", packed=True)
    got_arr = sorted(map(tuple, scoring.prune_pairs_arrow(arr, 0.94).collect()))
    got_pk = sorted(map(tuple, scoring.prune_pairs_arrow(pk, 0.94).collect()))
    assert got_arr == got_pk
    assert len(got_pk) > 0


def _gather_fixture(spark):
    """docs / feats / capped candidate pairs at SF_DIR — the inputs the
    gathered prune/score tier consumes."""
    from pyspark.sql import functions as F

    from sz_spark import blocking, canonicalize as canon
    from sz_spark.pipeline import PipelineConfig
    from sz_spark.transcripts import build_transcripts

    cfg = PipelineConfig()
    docs = canon.canonicalize(
        build_transcripts(spark, SF_DIR)
    ).withColumn("did", F.xxhash64("conv_id"))
    feats = blocking.doc_features(
        docs, id_col="did", ndim=cfg.ndim, widths=cfg.fp_widths,
        seed=cfg.seed, n_bands=cfg.n_bands, rows_per_band=cfg.rows_per_band,
    )
    bands = blocking.bands_from_features(feats, docs, id_col="did")
    pairs, _ = blocking.block_pairs(
        bands, id_col="did", max_block_size=cfg.max_block_size,
        salt_up_to=cfg.salt_up_to,
    )
    return cfg, docs, feats, pairs


def test_gathered_prune_matches_join_path(spark):
    """prune_pairs_gathered (broadcast doc-feature gather) must keep the
    IDENTICAL pair set as the join-based prune_pairs_arrow — same f64
    comparisons on the same len/hist values — and must drop pairs whose
    id is missing from the feature table, matching the inner joins."""
    from pyspark.sql import functions as F

    from sz_spark import scoring

    cfg, docs, feats, pairs = _gather_fixture(spark)
    # inject a pair with an id absent from feats: the join path drops it
    # (inner join); the gathered path must too (found-mask)
    bogus = spark.createDataFrame(
        [(int(-(1 << 60)), int(1 << 60))], "id_a long, id_b long"
    )
    pairs = pairs.unionByName(bogus)
    attrs = scoring.attach_prune_attrs(
        pairs, docs, id_col="did", attrs_frame=feats.select("did", "len", "hist")
    )
    want = sorted(
        map(tuple, scoring.prune_pairs_arrow(attrs, cfg.threshold).collect())
    )
    bc = scoring.build_prune_broadcast(feats.select("did", "len", "hist"))
    got = sorted(
        map(tuple, scoring.prune_pairs_gathered(pairs, bc, cfg.threshold).collect())
    )
    assert got == want
    assert len(got) > 0


def test_gathered_score_matches_join_path(spark):
    """score_pairs_gathered (broadcast text-blob gather) vs the
    attach_texts + score_pairs join path on the real pruned pair set:
    kept (>= tau) pairs must agree exactly on edit_distance and sim;
    sub-tau pairs may clamp differently (chunk composition) but must
    land on the same side of tau."""
    from sz_spark import scoring

    cfg, docs, feats, pairs = _gather_fixture(spark)
    tau = cfg.threshold
    bc = scoring.build_prune_broadcast(feats.select("did", "len", "hist"))
    pruned = scoring.prune_pairs_gathered(pairs, bc, tau)
    wt = scoring.attach_texts(pruned, docs, id_col="did")
    old = (
        scoring.score_pairs(wt, threshold=None, bounded=tau)
        .select("id_a", "id_b", "edit_distance", "sim")
        .toPandas()
    )
    tbc = scoring.build_text_broadcast(docs, id_col="did")
    new = (
        scoring.score_pairs_gathered(pruned, tbc, bounded=tau)
        .select("id_a", "id_b", "edit_distance", "sim")
        .toPandas()
    )
    m = old.merge(new, on=["id_a", "id_b"], suffixes=("_o", "_n"))
    assert len(m) == len(old) == len(new) > 0
    kept = (m.sim_o >= tau) | (m.sim_n >= tau)
    assert kept.any()
    assert (m.loc[kept, "edit_distance_o"] == m.loc[kept, "edit_distance_n"]).all()
    assert (m.loc[kept, "sim_o"] == m.loc[kept, "sim_n"]).all()
    assert ((m.sim_o < tau) == (m.sim_n < tau)).all()


def test_pipeline_gather_tiers_identical(spark):
    """run_pipeline with the gathered tier (default at this corpus
    size), the full-gather twin (SZ_TEXT_GATHER=1), and the join tier
    (SZ_NO_GATHER=1) must produce identical clusters and identical kept
    scored pairs."""
    import os

    from pyspark.sql import functions as F

    from sz_spark.pipeline import PipelineConfig, run_pipeline
    from sz_spark.transcripts import build_transcripts

    cfg = PipelineConfig()
    outs = {}
    knobs = ("SZ_NO_GATHER", "SZ_TEXT_GATHER")
    saved = {k: os.environ.get(k) for k in knobs}
    try:
        for label, env in (
            ("gather", {}),
            ("textgather", {"SZ_TEXT_GATHER": "1"}),
            ("join", {"SZ_NO_GATHER": "1"}),
        ):
            # each leg sets EXACTLY its own knobs: a pre-existing
            # SZ_NO_GATHER=1 in the environment must not silently turn
            # the gather legs into join-tier runs
            for k in knobs:
                os.environ.pop(k, None)
            for k, v in env.items():
                os.environ[k] = v
            tr = build_transcripts(spark, SF_DIR)
            stages = run_pipeline(spark, tr, cfg)
            kept = (
                stages["scored"]
                .filter(F.col("sim") >= cfg.threshold)
                .select("id_a", "id_b", "edit_distance", "sim")
            )
            outs[label] = (
                sorted(map(tuple, kept.collect())),
                sorted(map(tuple, stages["clusters"].collect())),
            )
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert outs["gather"][0] == outs["join"][0] == outs["textgather"][0]
    assert outs["gather"][1] == outs["join"][1] == outs["textgather"][1]
    assert len(outs["gather"][0]) > 0
