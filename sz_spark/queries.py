"""Registry backing __spark_entry__.queries() / oracle_sql().

Each entry: name -> (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None).
Oracle SQL runs in DuckDB over pre-registered views of the same parquet
tables; the driver hash-compares values column-name-sorted, so every
computed column is aliased identically on both sides and floats are
rounded to the same decimals on both sides.

Coverage maps SURVEY.md §2 (reference operator inventory) plus the
training-data-pipeline operators (dedup / similarity search / text
analysis / multimodal).  Entries with oracle None are genuinely
non-SQL-expressible (reference-exact fingerprints, affine-gap DP,
SimHash, hyperplane LSH) — their math is conformance-tested in
tests/test_kernels.py instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sz_spark import ann, blocking, clustering, dedup, multimodal, scoring, textops
from sz_spark import canonicalize as canon
from sz_spark.transcripts import build_transcripts, transcripts_sql
from sz_spark.udfs import (
    bytesum_udf,
    jaro_winkler_udf,
    levenshtein_udf,
    levenshtein_utf8_udf,
    make_fingerprint_udf,
    make_levenshtein_affine_udf,
    make_nw_udf,
    make_sw_udf,
)

ER_TAU = 0.94


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# relational / TPC-H-ish (scans, joins, aggregations, windows, top-k)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1995-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1995-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark, sf):
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q_region_revenue(spark, sf):
    li = _t(spark, sf, "lineitem")
    sup = _t(spark, sf, "supplier")
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


Q_REGION_SQL = """
SELECT r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_events_hourly(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


Q_EVENTS_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


def q_window_rank(spark, sf):
    from pyspark.sql import Window

    orders = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("price_rank", F.row_number().over(w))
        .filter(F.col("price_rank") <= 3)
        .select("o_custkey", "o_orderkey", "price_rank")
    )


Q_WINDOW_SQL = """
SELECT o_custkey, o_orderkey, CAST(price_rank AS INT) AS price_rank FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank
  FROM orders
) WHERE price_rank <= 3
"""


# ---------------------------------------------------------------------------
# scalar string kernels (SURVEY.md §2.2) — documents/part tables
# ---------------------------------------------------------------------------


def str_find_rfind(spark, sf):
    d = _t(spark, sf, "documents")
    needle = "table"
    m = len(needle)
    find_pos = F.instr("text", needle)
    pos_rev = F.instr(F.reverse(F.col("text")), needle[::-1])
    rfind_pos = F.when(pos_rev == 0, 0).otherwise(
        F.length("text") - pos_rev - F.lit(m) + 2
    )
    return d.select(
        "doc_id", find_pos.alias("find_pos"), rfind_pos.alias("rfind_pos")
    )


STR_FIND_SQL = """
SELECT doc_id,
       instr(text, 'table') AS find_pos,
       CASE WHEN instr(reverse(text), 'elbat') = 0 THEN 0
            ELSE length(text) - instr(reverse(text), 'elbat') - 5 + 2
       END AS rfind_pos
FROM documents
"""


def str_contains_filter(spark, sf):
    d = _t(spark, sf, "documents")
    return d.filter(
        F.col("text").contains("spark") & ~F.col("text").startswith("key")
    ).select("doc_id", "lang")


STR_CONTAINS_SQL = """
SELECT doc_id, lang FROM documents
WHERE contains(text, 'spark') AND NOT starts_with(text, 'key')
"""


def str_count_substring(spark, sf):
    d = _t(spark, sf, "documents")
    needle = "table"
    cnt = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")
    return d.select("doc_id", cnt.alias("n_occurrences"))


STR_COUNT_SQL = """
SELECT doc_id,
       CAST((length(text) - length(replace(text, 'table', ''))) / 5 AS BIGINT) AS n_occurrences
FROM documents
"""


def str_split_explode_tokens(spark, sf):
    d = _t(spark, sf, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )


STR_SPLIT_SQL = """
SELECT token, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT 20
"""


def str_partition(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.substring_index("text", "table", 1).alias("head"),
    )


STR_PARTITION_SQL = """
SELECT doc_id, split_part(text, 'table', 1) AS head FROM documents
"""


def str_strip_translate(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.trim(F.substring(F.translate("text", "aeiou", "AEIOU"), 1, 40)).alias(
            "translated_head"
        ),
    )


STR_TRANSLATE_SQL = """
SELECT doc_id, trim(substr(translate(text, 'aeiou', 'AEIOU'), 1, 40)) AS translated_head
FROM documents
"""


def str_sha256(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", F.sha2(F.col("text"), 256).alias("digest"))


STR_SHA256_SQL = "SELECT doc_id, sha256(text) AS digest FROM documents"


def str_bytesum(spark, sf):
    d = _t(spark, sf, "documents")
    return d.select("doc_id", bytesum_udf(F.col("text")).alias("byte_sum"))


STR_BYTESUM_SQL = """
SELECT doc_id,
       CAST(list_aggregate(list_transform(regexp_extract_all(text, '.'), x -> ord(x)), 'sum') AS BIGINT) AS byte_sum
FROM documents
"""


def str_sort_topk(spark, sf):
    d = _t(spark, sf, "documents")
    return d.orderBy(F.asc("text"), F.asc("doc_id")).limit(50).select("doc_id", "text")


STR_SORT_SQL = """
SELECT doc_id, text FROM documents ORDER BY text ASC, doc_id ASC LIMIT 50
"""


def str_case_fold_sort(spark, sf):
    """uncased ORDER (utf8_uncased_order analog): top-100 by full
    casefold, not lower() — fold == lower on this ASCII column so
    DuckDB's lower() stays an exact oracle, while the fold-vs-lower
    divergent chars are pinned by test_casefold_conformance."""
    from sz_spark.udfs import utf8_casefold_udf

    p = _t(spark, sf, "part")
    return (
        p.select("p_partkey", utf8_casefold_udf(F.col("p_name")).alias("folded"))
        .orderBy(F.asc("folded"), F.asc("p_partkey"))
        .limit(100)
    )


STR_CASEFOLD_SQL = """
SELECT p_partkey, lower(p_name) AS folded
FROM part ORDER BY folded ASC, p_partkey ASC LIMIT 100
"""


def str_intersect(spark, sf):
    d = _t(spark, sf, "documents")
    p = _t(spark, sf, "part")
    doc_tokens = d.select(
        F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    part_tokens = p.select(
        F.explode(F.split("p_name", " ")).alias("token")
    ).distinct()
    return doc_tokens.join(part_tokens, "token").select("token")


STR_INTERSECT_SQL = """
SELECT token FROM
  (SELECT DISTINCT unnest(string_split(text, ' ')) AS token FROM documents)
INTERSECT
SELECT token FROM
  (SELECT DISTINCT unnest(string_split(p_name, ' ')) AS token FROM part)
"""


def str_count_byteset(spark, sf):
    """count_byteset analog (find.h byteset ops): vowels per doc."""
    d = _t(spark, sf, "documents")
    cnt = F.length("text") - F.length(F.regexp_replace("text", "[aeiou]", ""))
    return d.select("doc_id", cnt.alias("n_vowels"))


STR_COUNT_BYTESET_SQL = """
SELECT doc_id,
       length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS n_vowels
FROM documents
"""


def str_find_first_last_of(spark, sf):
    """find_first_of / find_last_of analogs over the vowel byteset."""
    d = _t(spark, sf, "documents")
    has = F.col("text").rlike("[aeiou]")
    first_of = F.when(
        has, F.length(F.regexp_extract("text", "^[^aeiou]*", 0)) + 1
    ).otherwise(0)
    last_of = F.when(
        has,
        F.length("text")
        - F.length(F.regexp_extract(F.reverse(F.col("text")), "^[^aeiou]*", 0)),
    ).otherwise(0)
    return d.select(
        "doc_id", first_of.alias("first_of_pos"), last_of.alias("last_of_pos")
    )


STR_FIRST_LAST_OF_SQL = """
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[aeiou]')
            THEN length(regexp_extract(text, '^[^aeiou]*')) + 1 ELSE 0 END AS first_of_pos,
       CASE WHEN regexp_matches(text, '[aeiou]')
            THEN length(text) - length(regexp_extract(reverse(text), '^[^aeiou]*')) ELSE 0 END AS last_of_pos
FROM documents
"""


def str_split_byteset(spark, sf):
    """split_byteset analog: fragments between vowels (empties kept,
    matching both engines' trailing-empty semantics)."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id", F.size(F.split("text", "[aeiou]")).alias("n_fragments")
    )


STR_SPLIT_BYTESET_SQL = """
SELECT doc_id, len(string_split_regex(text, '[aeiou]')) AS n_fragments
FROM documents
"""


def str_utf8_counts(spark, sf):
    """utf8_count vs byte length (utf8_runes.h analog) on a synthesized
    Unicode column — codepoints and bytes must diverge."""
    d = _t(spark, sf, "documents")
    u = F.concat(F.substring("text", 1, 20), F.lit(" αβ∆"))
    return d.select(
        "doc_id",
        F.length(u).alias("n_codepoints"),
        F.octet_length(u).alias("n_bytes"),
    )


STR_UTF8_SQL = """
SELECT doc_id,
       length(substr(text, 1, 20) || ' αβ∆') AS n_codepoints,
       CAST(octet_length(encode(substr(text, 1, 20) || ' αβ∆')) AS INT) AS n_bytes
FROM documents
"""


def str_find_not_of(spark, sf):
    """find_first_not_of / find_last_not_of over the vowel byteset
    (find.h:563-611) — the not_of duals round 1 left unexercised."""
    d = _t(spark, sf, "documents")
    has = F.col("text").rlike("[^aeiou]")
    first_not = F.when(
        has, F.length(F.regexp_extract("text", "^[aeiou]*", 0)) + 1
    ).otherwise(0)
    last_not = F.when(
        has,
        F.length("text")
        - F.length(F.regexp_extract(F.reverse(F.col("text")), "^[aeiou]*", 0)),
    ).otherwise(0)
    return d.select(
        "doc_id",
        first_not.alias("first_not_pos"),
        last_not.alias("last_not_pos"),
    )


STR_FIND_NOT_OF_SQL = """
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[^aeiou]')
            THEN length(regexp_extract(text, '^[aeiou]*')) + 1 ELSE 0 END AS first_not_pos,
       CASE WHEN regexp_matches(text, '[^aeiou]')
            THEN length(text) - length(regexp_extract(reverse(text), '^[aeiou]*')) ELSE 0 END AS last_not_pos
FROM documents
"""


def str_utf8_whitespaces(spark, sf):
    """utf8_split_whitespaces (utf8_tokens.h 25-char White_Space set)
    over synthesized text mixing ASCII space, NBSP, ideographic space,
    and LINE SEPARATOR — split on an explicit literal-char class both
    engines share (round 1 tokenized on ASCII ' ' only)."""
    d = _t(spark, sf, "documents")
    u = F.concat(
        F.substring("text", 1, 20),
        F.lit("\u00a0x\u3000y\u2028z w"),
    )
    cls = "[ \u00A0\u3000\u2028\t]+"
    return d.select(
        "doc_id",
        F.size(F.split(u, cls)).alias("n_parts"),
        F.element_at(F.split(u, cls), -1).alias("last_part"),
    )


STR_UTF8_WS_SQL = """
SELECT doc_id,
       len(string_split_regex(substr(text, 1, 20) || chr(160) || 'x' || chr(12288) || 'y' || chr(8232) || 'z w',
           '[ ' || chr(160) || chr(12288) || chr(8232) || chr(9) || ']+')) AS n_parts,
       list_extract(string_split_regex(substr(text, 1, 20) || chr(160) || 'x' || chr(12288) || 'y' || chr(8232) || 'z w',
           '[ ' || chr(160) || chr(12288) || chr(8232) || chr(9) || ']+'), -1) AS last_part
FROM documents
"""


def q_sample_hash(spark, sf):
    """Deterministic PRF sampling: keep doc iff the shared md5-derived
    60-bit hash of its id ≡ 0 (mod 10).  Unlike RNG sampling (rows-only
    by nature), this is exactly reproducible across engines, executors,
    and retries — the property a 100 TB pipeline actually wants from
    `sample(seed)`."""
    d = _t(spark, sf, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("s42|"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return d.filter(h % 10 == 0).select("doc_id")


Q_SAMPLE_HASH_SQL = """
SELECT doc_id FROM documents
WHERE ('0x' || substr(md5('s42|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 = 0
"""


def q_shuffled(spark, sf):
    """Strs.shuffled(seed) analog (stringzilla.c:7544): a DETERMINISTIC
    seeded permutation — order by a seeded PRF of the id.  Unlike RNG
    shuffles this is reproducible across engines/executors/retries, so
    the permutation itself is value-checked (first 50 in permuted
    order, with the PRF rank exported to pin positions)."""
    d = _t(spark, sf, "documents")
    rank = F.conv(
        F.substring(F.md5(F.concat(F.lit("shuf42|"), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return (
        d.select("doc_id", rank.alias("shuffle_rank"))
        .orderBy("shuffle_rank")
        .limit(50)
    )


Q_SHUFFLED_SQL = """
SELECT doc_id,
       ('0x' || substr(md5('shuf42|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS shuffle_rank
FROM documents
ORDER BY shuffle_rank
LIMIT 50
"""


def str_fill_random(spark, sf):
    """sz.fill_random analog (stringzilla.c fill_random; bench
    README.md:188-215 generates alphabet-mapped strings): deterministic
    PRF-driven generation over the 'acgt' alphabet — 20 chars per doc,
    char i = alphabet[md5(doc_id|i) % 4].  All native expressions; the
    oracle regenerates the identical strings."""
    d = _t(spark, sf, "documents")
    alpha = F.array(F.lit("a"), F.lit("c"), F.lit("g"), F.lit("t"))
    gen = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda i: F.element_at(
                alpha,
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("doc_id").cast("string"),
                                    F.lit("|"),
                                    i.cast("string"),
                                )
                            ),
                            1,
                            4,
                        ),
                        16,
                        10,
                    ).cast("int")
                    % 4
                    + 1
                ),
            ),
        ),
        "",
    )
    return d.select("doc_id", gen.alias("random_str"))


STR_FILL_RANDOM_SQL = """
SELECT doc_id,
       array_to_string(list_transform(range(1, 21),
         i -> substr('acgt',
              ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || i), 1, 4))::BIGINT % 4) + 1)::INT,
              1)), '') AS random_str
FROM documents
"""


def str_utf8_graphemes(spark, sf):
    """utf8_graphemes analog (utf8_graphemes.h TR29 clusters): grapheme
    counting via Java regex \\X (Spark-native, whole-stage codegen) over
    synthesized decomposed text.  Oracle trick: the synthesized
    combining sequences (vowel + acute/grave/circumflex) all COMPOSE
    under NFC, so grapheme count == codepoint count of the NFC form —
    which DuckDB computes independently via nfc_normalize.  (Sequences
    that don't compose, e.g. b + U+0302, are exactly where this oracle
    would break — pinned Spark-side in test_graphemes_vs_codepoints.)"""
    d = _t(spark, sf, "documents")
    u = F.concat(
        F.substring("text", 1, 20),
        F.lit(" éàô"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(u, F.lit(r"\X")).alias("n_graphemes"),
        F.length(u).alias("n_codepoints"),
    )


STR_GRAPHEMES_SQL = """
SELECT doc_id,
       length(nfc_normalize(substr(text, 1, 20) || ' e' || chr(769) || 'a' || chr(768) || 'o' || chr(770))) AS n_graphemes,
       length(substr(text, 1, 20) || ' e' || chr(769) || 'a' || chr(768) || 'o' || chr(770)) AS n_codepoints
FROM documents
"""


def str_utf8_sentences(spark, sf):
    """utf8_sentences (UAX-29 sentence rules, core subset — see
    udfs.sentence_segments) over synthesized uppercase-starting
    sentences, where the rules reduce to terminator+space splits that
    DuckDB reproduces; the SB8 lowercase-continuation rule is pinned in
    test_sentences_core."""
    from sz_spark.udfs import utf8_sentences_udf

    d = _t(spark, sf, "documents")
    u = F.concat(
        F.lit("Alpha beta. Gamma delta! Epsilon? "),
        F.upper(F.substring("text", 1, 1)),
        F.substring("text", 2, 30),
        F.lit("."),
    )
    segs = utf8_sentences_udf(u)
    return d.select(
        "doc_id",
        F.size(segs).alias("n_sentences"),
        F.try_element_at(segs, F.lit(1)).alias("first_sentence"),
    )


STR_SENTENCES_SQL = """
WITH u AS (
  SELECT doc_id,
         'Alpha beta. Gamma delta! Epsilon? ' || upper(substr(text, 1, 1)) || substr(text, 2, 30) || '.' AS s
  FROM documents
)
SELECT doc_id,
       len(string_split_regex(rtrim(s, ' '), '(\\.|!|\\?)( )+')) AS n_sentences,
       string_split_regex(s, '(?:\\.|!|\\?)( )+')[1] || '. ' AS first_sentence
FROM u
"""


def str_utf8_linebreaks(spark, sf):
    """utf8_linebreaks analog (UAX-14 break OPPORTUNITIES, core
    subset): positions where a line may break — after space runs,
    after hyphens, mandatorily at newlines.  Native regex count on a
    synthesized column, identical class in both engines."""
    d = _t(spark, sf, "documents")
    u = F.concat(
        F.substring("text", 1, 60), F.lit(" pre-wrap hy-phen\nnext line")
    )
    return d.select(
        "doc_id",
        F.regexp_count(u, F.lit("[ \\t]+|-|\\n")).alias("n_break_opps"),
        F.regexp_count(u, F.lit("\\n")).alias("n_mandatory"),
    )


STR_LINEBREAKS_SQL = """
SELECT doc_id,
       len(regexp_extract_all(substr(text, 1, 60) || ' pre-wrap hy-phen' || chr(10) || 'next line',
           '[ \\t]+|-|\\n')) AS n_break_opps,
       len(regexp_extract_all(substr(text, 1, 60) || ' pre-wrap hy-phen' || chr(10) || 'next line',
           '\\n')) AS n_mandatory
FROM documents
"""


def str_utf8_wordbreaks(spark, sf):
    """utf8_wordbreaks (UAX-29 core-rules subset, utf8_wordbreaks.h):
    the cross-engine row checks the tiling invariant on letters+spaces
    (word segments == whitespace tokens there); the rules that make
    UAX-29 non-trivial (apostrophes, MidNum digits, ExtendNumLet,
    CRLF, combining marks) are pytest-checked in
    test_wordbreaks_uax29_core."""
    from sz_spark.udfs import utf8_wordbreaks_udf

    d = _t(spark, sf, "documents")
    clean = F.regexp_replace(F.substring("text", 1, 80), "[^a-z ]", "")
    segs = utf8_wordbreaks_udf(clean)
    words = F.filter(segs, lambda s: s != " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.try_element_at(words, F.lit(1)).alias("first_word"),
    )


STR_WORDBREAKS_SQL = """
SELECT doc_id,
       len(list_filter(string_split(regexp_replace(substr(text, 1, 80), '[^a-z ]', '', 'g'), ' '),
           x -> x != '')) AS n_words,
       list_filter(string_split(regexp_replace(substr(text, 1, 80), '[^a-z ]', '', 'g'), ' '),
           x -> x != '')[1] AS first_word
FROM documents
"""


# --- utf8 uncased / normalization (python/README.md:613-628; stringzilla.c:3986-4155)


def str_utf8_casefold(spark, sf):
    """utf8_uncased_fold over a synthesized non-ASCII column.  The test
    chars (Greek + accented Latin) are ones where casefold == lower, so
    DuckDB's lower() is an exact oracle; the chars where they DIVERGE
    (ß, İ, ligatures) are covered by test_casefold_conformance against
    Python's casefold — the reference's own oracle (test/uncased.py)."""
    from sz_spark.udfs import utf8_casefold_udf

    d = _t(spark, sf, "documents")
    u = F.concat(F.upper(F.substring("text", 1, 20)), F.lit(" ΑΒΓÉÜÇŁ"))
    return d.select("doc_id", utf8_casefold_udf(u).alias("folded"))


STR_CASEFOLD_UDF_SQL = """
SELECT doc_id, lower(upper(substr(text, 1, 20)) || ' ΑΒΓÉÜÇŁ') AS folded
FROM documents
"""


def str_uncased_search(spark, sf):
    """utf8_uncased_search analog: case-insensitive containment via
    casefold (not lower) — filter + match position on a mixed-case
    synthesized column."""
    from sz_spark.udfs import utf8_casefold_udf

    d = _t(spark, sf, "documents")
    mixed = F.concat(F.upper(F.substring("text", 1, 30)), F.substring("text", 31, 1000000))
    folded = utf8_casefold_udf(mixed)
    return d.select("doc_id", F.instr(folded, "table").alias("pos")).filter(
        F.col("pos") > 0
    )


STR_UNCASED_SEARCH_SQL = """
SELECT doc_id,
       instr(lower(upper(substr(text, 1, 30)) || substr(text, 31)), 'table') AS pos
FROM documents
WHERE instr(lower(upper(substr(text, 1, 30)) || substr(text, 31)), 'table') > 0
"""


def str_utf8_norm(spark, sf):
    """utf8_norm(NFC) over synthesized denormalized text (combining
    acute/grave sequences): normalization must change the codepoint
    count; DuckDB's nfc_normalize is the cross-engine oracle and
    unicodedata.normalize the pytest one (test/utf8_norm.py:84-87)."""
    norm = __import__("sz_spark.udfs", fromlist=["make_utf8_norm_udf"]).make_utf8_norm_udf("NFC")
    d = _t(spark, sf, "documents")
    u = F.concat(
        F.substring("text", 1, 10), F.lit(" éàô fin")
    )
    n = norm(u)
    return d.select(
        "doc_id",
        F.length(u).alias("len_raw"),
        F.length(n).alias("len_nfc"),
        n.alias("nfc"),
    )


STR_UTF8_NORM_SQL = """
SELECT doc_id,
       length(substr(text, 1, 10) || ' e' || chr(769) || 'a' || chr(768) || 'o' || chr(770) || ' fin') AS len_raw,
       length(nfc_normalize(substr(text, 1, 10) || ' e' || chr(769) || 'a' || chr(768) || 'o' || chr(770) || ' fin')) AS len_nfc,
       nfc_normalize(substr(text, 1, 10) || ' e' || chr(769) || 'a' || chr(768) || 'o' || chr(770) || ' fin') AS nfc
FROM documents
"""


def str_find_denormalized(spark, sf):
    """utf8_find_denormalized (python/stringzilla.c:3986-4155): detect
    text that is not NFC-normal and report the first denormalized
    position.  Every other doc gets a combining-mark injection so both
    outcomes are exercised; position = length of the common prefix of
    the raw and NFC forms + 1 (0 when already normal)."""
    norm = __import__("sz_spark.udfs", fromlist=["make_utf8_norm_udf"]).make_utf8_norm_udf("NFC")
    d = _t(spark, sf, "documents")
    u = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.substring("text", 1, 8), F.lit("e\u0301"), F.substring("text", 9, 12)
        ),
    ).otherwise(F.substring("text", 1, 20))
    d2 = d.select("doc_id", u.alias("_u")).withColumn("_n", norm(F.col("_u")))
    # first codepoint where raw and NFC diverge (0 = already normal):
    # array_position of the first prefix mismatch; substr beyond either
    # end yields '' so a pure length difference also registers
    pos = F.expr(
        "array_position(transform(sequence(1, greatest(length(_u), length(_n))), "
        "i -> substr(_u, i, 1) != substr(_n, i, 1)), true)"
    )
    return d2.select(
        "doc_id",
        (F.col("_u") != F.col("_n")).alias("is_denormalized"),
        pos.cast("long").alias("first_denorm_pos"),
    )


STR_FIND_DENORM_SQL = """
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN substr(text, 1, 8) || 'e' || chr(769) || substr(text, 9, 12)
              ELSE substr(text, 1, 20) END AS raw
  FROM documents
),
n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nrm FROM u)
SELECT doc_id,
       raw != nrm AS is_denormalized,
       COALESCE(list_position(list_transform(range(1, greatest(length(raw), length(nrm)) + 1),
                i -> substr(raw, i::INT, 1) != substr(nrm, i::INT, 1)), true), 0)::BIGINT AS first_denorm_pos
FROM n
"""


# --- small §2 gaps: hmac, overlapping count, rpartition/endswith,
#     256-byte-LUT translate, splitlines, delimiter splits, sampling


HMAC_KEY = b"sz-spark-demo-key"


def _hmac_pads() -> tuple[bytes, bytes]:
    k = HMAC_KEY.ljust(64, b"\x00")
    return bytes(b ^ 0x36 for b in k), bytes(b ^ 0x5C for b in k)


def str_hmac_sha256(spark, sf):
    """Keyed MAC built from two nested sha256 calls (hmac_sha256
    surface, reference hash.h:283-300).  DuckDB 1.0 can't hash blobs,
    so the cross-engine row checks the HMAC composition with the inner
    digest in hex form; the RFC-2104 byte-exact variant is
    pytest-checked against Python's hmac (test_hmac_rfc2104)."""
    ipad, opad = _hmac_pads()
    inner = F.sha2(F.concat(F.lit(ipad.decode("latin-1")), F.col("text")), 256)
    mac = F.sha2(F.concat(F.lit(opad.decode("latin-1")), inner), 256)
    d = _t(spark, sf, "documents")
    return d.select("doc_id", mac.alias("mac_hex"))


def _sql_str(b: bytes) -> str:
    return b.decode("latin-1").replace("'", "''")


def str_hmac_sha256_sql() -> str:
    ipad, opad = _hmac_pads()
    return f"""
SELECT doc_id,
       sha256('{_sql_str(opad)}' || sha256('{_sql_str(ipad)}' || text)) AS mac_hex
FROM documents
"""


def str_count_overlapping(spark, sf):
    """count(needle, allowoverlap=True) (stringzilla.c:6342): zero-width
    lookahead regex counts every start position.  The synthesized 'aaaa'
    tail guarantees the overlapping count (3) exceeds the
    non-overlapping one (2) so the semantics are actually exercised."""
    d = _t(spark, sf, "documents")
    t = F.concat(F.col("text"), F.lit(" aaaa"))
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit("(?=aa)")).alias("n_overlap"),
        ((F.length(t) - F.length(F.replace(t, F.lit("aa"), F.lit("")))) / 2)
        .cast("long")
        .alias("n_no_overlap"),
    )


STR_COUNT_OVERLAP_SQL = """
SELECT doc_id,
       CAST(len(list_filter(range(1, length(text || ' aaaa') ),
            i -> substr(text || ' aaaa', i::INT, 2) = 'aa')) AS BIGINT) AS n_overlap,
       CAST((length(text || ' aaaa') - length(replace(text || ' aaaa', 'aa', ''))) / 2 AS BIGINT) AS n_no_overlap
FROM documents
"""


def str_rpartition_endswith(spark, sf):
    """rpartition tail (text after the LAST needle occurrence,
    stringzilla.c:6361) + endswith predicate — the two §2.2/2.3 reverse
    variants round 1 left unexercised."""
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.substring_index("text", "table", -1).alias("rpart_tail"),
        F.col("text").endswith("n").alias("ends_n"),
    )


STR_RPARTITION_SQL = """
SELECT doc_id,
       split_part(text, 'table', -1) AS rpart_tail,
       ends_with(text, 'n') AS ends_n
FROM documents
"""


def _rot13_lut() -> bytes:
    lut = bytearray(range(256))
    for i in range(26):
        lut[ord("a") + i] = ord("a") + (i + 13) % 26
        lut[ord("A") + i] = ord("A") + (i + 13) % 26
    for i in range(10):
        lut[ord("0") + i] = ord("0") + (i + 3) % 10
    return bytes(lut)


def str_translate_lut(spark, sf):
    """Full 256-byte LUT translate (memory.h:153 sz_lookup — the
    reference's 21 GB/s headline): ROT13 + digit rotation via
    bytes.translate in an Arrow batch; DuckDB mirrors with a 95-char
    translate() map (identity outside printable ASCII, which the corpus
    never hits)."""
    from sz_spark.udfs import make_translate_lut_udf

    tr = make_translate_lut_udf(_rot13_lut())
    d = _t(spark, sf, "documents")
    return d.select("doc_id", tr(F.col("text")).alias("translated"))


def str_translate_lut_sql() -> str:
    lut = _rot13_lut()
    src = bytes(range(32, 127))
    dst = bytes(lut[b] for b in src)
    return f"""
SELECT doc_id, translate(text, '{_sql_str(src)}', '{_sql_str(dst)}') AS translated
FROM documents
"""


def str_splitlines(spark, sf):
    """splitlines analog over a synthesized newline-bearing column
    (first 60 chars with spaces -> \\n): line count + first line."""
    d = _t(spark, sf, "documents")
    ml = F.replace(F.substring("text", 1, 60), F.lit(" "), F.lit("\n"))
    lines = F.split(ml, "\n")
    return d.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.element_at(lines, 1).alias("first_line"),
    )


STR_SPLITLINES_SQL = """
SELECT doc_id,
       len(string_split(replace(substr(text, 1, 60), ' ', chr(10)), chr(10))) AS n_lines,
       string_split(replace(substr(text, 1, 60), ' ', chr(10)), chr(10))[1] AS first_line
FROM documents
"""


def str_split_delimiters(spark, sf):
    """utf8_split_delimiters analog (utf8_tokens.h): split on runs of
    punctuation/separator chars.  Cross-engine row uses the explicit
    ASCII class where Java and RE2 semantics coincide; the full Unicode
    punctuation class '[\\p{P}\\p{S}\\p{Z}]+' is Spark-native too but has
    no RE2 twin (kept out of the oracle, noted in COVERAGE.md)."""
    d = _t(spark, sf, "documents")
    ml = F.concat(F.substring("text", 1, 40), F.lit("a,b;c!d?e(f)g-h."))
    return d.select(
        "doc_id",
        F.size(F.split(ml, "[ ,.;:!?()-]+")).alias("n_segments"),
    )


STR_SPLIT_DELIM_SQL = """
SELECT doc_id,
       len(string_split_regex(substr(text, 1, 40) || 'a,b;c!d?e(f)g-h.', '[ ,.;:!?()-]+')) AS n_segments
FROM documents
"""


def q_sample_with_replacement(spark, sf):
    """Strs.sample(size, seed) analog WITH replacement
    (stringzilla.c:8016) — rows-only like all engine-specific sampling."""
    d = _t(spark, sf, "documents")
    return d.sample(withReplacement=True, fraction=0.2, seed=42).select("doc_id")


MULTISEED_SEEDS = (0, 1, 42, 314159)


def szs_hash_multiseed(spark, sf):
    """sz.hash_multiseed analog (hash.h:173): one text hashed under many
    seeds at once — the feature-hashing primitive.  Interchangeable-PRF
    semantics per SURVEY.md §2.7 (values are ours, not sz_hash's): the
    registered PRF is the low 60 bits of md5(seed || '|' || text), which
    both engines compute natively (JVM md5 + conv — zero Python), giving
    a hard cross-engine value check of the seeded-family contract.  A
    pure-JVM xxhash64 multiseed (udfs.hash_multiseed_xxhash) is the
    production feature-hashing path, property-tested in pytest.

    Output is one scalar row per (doc, seed) — array columns crash the
    driver canonicalizer (CORRECTNESS_r01)."""
    d = _t(spark, sf, "documents")
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("seed"),
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{s}|"), F.col("text"))), 1, 15
                        ),
                        16,
                        10,
                    )
                    .cast("long")
                    .alias("hash64"),
                )
                for s in MULTISEED_SEEDS
            ]
        )
    )
    return d.select("doc_id", pairs.alias("p")).select(
        "doc_id", F.col("p.seed").alias("seed"), F.col("p.hash64").alias("hash64")
    )


SZS_MULTISEED_SQL = f"""
SELECT doc_id, seed,
       ('0x' || substr(md5(CAST(seed AS VARCHAR) || '|' || text), 1, 15))::BIGINT AS hash64
FROM documents
CROSS JOIN (SELECT unnest([{", ".join(str(s) for s in MULTISEED_SEEDS)}]) AS seed)
"""


def q_sample_seeded(spark, sf):
    """Strs.sample analog: seeded deterministic sample (rows-only —
    sampling is engine-specific by nature)."""
    d = _t(spark, sf, "documents")
    return d.sample(fraction=0.1, seed=42).select("doc_id")


# ---------------------------------------------------------------------------
# ER pipeline queries (transcripts -> clusters), all oracle-checked
# ---------------------------------------------------------------------------


def _docs_cte() -> str:
    return canon.canonicalize_sql(transcripts_sql()).strip()


def tr_transcripts(spark, sf):
    return build_transcripts(spark, sf)


def tr_canonicalize(spark, sf):
    return canon.canonicalize(build_transcripts(spark, sf))


TR_CANON_SQL = canon.canonicalize_sql(transcripts_sql())


def er_minhash_bands(spark, sf):
    docs = canon.canonicalize(build_transcripts(spark, sf))
    return blocking.shingle_minhash_bands(docs)


def _md5_band_pairs(docs: DataFrame) -> DataFrame:
    # cached: the long band table is both sides of the self-join, and
    # recomputing it means re-min-hashing every shingle twice
    bands = blocking.shingle_minhash_bands(docs)
    long = bands.select(
        "conv_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band_id"), F.col(f"band_{i}").alias("bh"))
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("conv_id", F.col("b.band_id").alias("band_id"), F.col("b.bh").alias("bh")).cache()
    a, b = long.alias("a"), long.alias("b")
    return (
        a.join(b, ["band_id", "bh"])
        .filter(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(F.col("a.conv_id").alias("id_a"), F.col("b.conv_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def er_candidate_pairs(spark, sf):
    docs = canon.canonicalize(build_transcripts(spark, sf))
    return _md5_band_pairs(docs)


def er_pair_scores_lev(spark, sf):
    docs = canon.canonicalize(build_transcripts(spark, sf))
    pairs = _md5_band_pairs(docs)
    wt = scoring.attach_texts(pairs, docs)
    scored = scoring.score_pairs(wt, bounded=ER_TAU)
    return scored.filter(F.col("sim") >= ER_TAU).select(
        "id_a", "id_b", "edit_distance", F.round("sim", 6).alias("sim")
    )


def er_pair_scores_jw(spark, sf):
    docs = canon.canonicalize(build_transcripts(spark, sf))
    pairs = _md5_band_pairs(docs)
    wt = scoring.attach_texts(pairs, docs)
    return wt.select(
        "id_a",
        "id_b",
        F.round(jaro_winkler_udf(F.col("doc_a"), F.col("doc_b")), 6).alias("jw_sim"),
    )


def er_clusters(spark, sf):
    docs = canon.canonicalize(build_transcripts(spark, sf))
    pairs = _md5_band_pairs(docs)
    wt = scoring.attach_texts(pairs, docs)
    scored = scoring.score_pairs(wt, bounded=ER_TAU)
    edges = scored.filter(F.col("sim") >= ER_TAU).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    asg = clustering.connected_components(edges)
    return clustering.clusters_with_singletons(asg, docs, "conv_id")


def er_clusters_production(spark, sf):
    """The DEPLOYED pipeline plan — reference-fingerprint MinHash
    blocking (blocking.minhash_bands + layered prefix key), capped and
    salted blocks, histogram/length prunes, bounded banded DP, hybrid
    connected components — NOT the md5-shingle SQL stand-in the other
    er_* rows run.  The oracle is the analytic GROUND TRUTH: every
    conversation variant of doc_id clusters to 'c<doc_id>' because
    true-variant similarity >= 0.96 and cross-entity <= 0.905 by the
    salt construction (sz_spark.transcripts), so a pipeline with
    pairwise P=R=1.0 must reproduce the entity partition exactly; a
    hash mismatch means the production blocking/salting/scoring path
    regressed."""
    from sz_spark.pipeline import PipelineConfig, run_pipeline

    tr = build_transcripts(spark, sf)
    stages = run_pipeline(spark, tr, PipelineConfig())
    return stages["clusters"]


def er_ground_truth_clusters_oracle() -> str:
    """Analytic entity partition of the synthetic transcripts: variants
    c/d/e of doc_id form one cluster whose id is min(conv_id) =
    'c<doc_id>' ('c' < 'd' < 'e')."""
    from sz_spark.transcripts import TURN_TOKENS

    return f"""
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
variants AS (
  SELECT 'c' || CAST(doc_id AS VARCHAR) AS conv_id, doc_id FROM docs
  UNION ALL
  SELECT 'd' || CAST(doc_id AS VARCHAR), doc_id FROM docs WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'e' || CAST(doc_id AS VARCHAR), doc_id
  FROM docs WHERE doc_id % 5 = 0 AND len(toks) >= {3 * TURN_TOKENS}
)
SELECT conv_id, 'c' || CAST(doc_id AS VARCHAR) AS cluster_id FROM variants
"""


def er_cluster_sizes(spark, sf):
    return (
        er_clusters(spark, sf)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


def er_bands_oracle() -> str:
    docs = _docs_cte()
    full = blocking.shingle_minhash_bands_sql(docs)
    return full


def er_pairs_oracle() -> str:
    return f"""
WITH {_er_pairs_cte()}
SELECT id_a, id_b FROM cand
"""


def _er_pairs_cte() -> str:
    """CTE chain ending in cand(id_a, id_b) + docs(conv_id, doc, ...)."""
    docs = _docs_cte()
    return f"""{blocking.shingle_minhash_bands_ctes(docs)},
long AS (
  SELECT conv_id, 0 AS band_id, band_0 AS bh FROM final_bands
  UNION ALL SELECT conv_id, 1, band_1 FROM final_bands
  UNION ALL SELECT conv_id, 2, band_2 FROM final_bands
  UNION ALL SELECT conv_id, 3, band_3 FROM final_bands
),
cand AS (
  SELECT DISTINCT a.conv_id AS id_a, b.conv_id AS id_b
  FROM long a JOIN long b USING (band_id, bh)
  WHERE a.conv_id < b.conv_id
)"""


def er_scores_oracle() -> str:
    return f"""
WITH {_er_pairs_cte()}
SELECT id_a, id_b,
       levenshtein(da.doc, db.doc) AS edit_distance,
       round(1.0 - levenshtein(da.doc, db.doc)
             / CAST(greatest(length(da.doc), length(db.doc)) AS DOUBLE), 6) AS sim
FROM cand
JOIN docs da ON da.conv_id = id_a
JOIN docs db ON db.conv_id = id_b
WHERE 1.0 - levenshtein(da.doc, db.doc)
      / CAST(greatest(length(da.doc), length(db.doc)) AS DOUBLE) >= {ER_TAU}
"""


def er_jw_oracle() -> str:
    return f"""
WITH {_er_pairs_cte()}
SELECT id_a, id_b,
       round(jaro_winkler_similarity(da.doc, db.doc), 6) AS jw_sim
FROM cand
JOIN docs da ON da.conv_id = id_a
JOIN docs db ON db.conv_id = id_b
"""


def er_clusters_oracle() -> str:
    return f"""
WITH RECURSIVE {_er_pairs_cte()},
edges AS (
  SELECT id_a AS src, id_b AS dst
  FROM cand
  JOIN docs da ON da.conv_id = id_a
  JOIN docs db ON db.conv_id = id_b
  WHERE 1.0 - levenshtein(da.doc, db.doc)
        / CAST(greatest(length(da.doc), length(db.doc)) AS DOUBLE) >= {ER_TAU}
),
sym AS (
  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
),
reach AS (
  SELECT conv_id AS id, conv_id AS comp FROM docs
  UNION
  SELECT s.dst AS id, r.comp
  FROM reach r JOIN sym s ON r.id = s.src
  WHERE r.comp < s.dst
)
SELECT id AS conv_id, min(comp) AS cluster_id
FROM reach GROUP BY id
"""


def er_cluster_sizes_oracle() -> str:
    inner = er_clusters_oracle().strip()
    return f"""
SELECT size, count(*) AS n_clusters FROM (
  SELECT cluster_id, count(*) AS size FROM ({inner}) GROUP BY cluster_id
) GROUP BY size
"""


# ---------------------------------------------------------------------------
# reference-exact similarity engines (rows-only or DuckDB-oracled)
# ---------------------------------------------------------------------------


def _adjacent_doc_pairs(spark, sf) -> DataFrame:
    d = _t(spark, sf, "documents").select("doc_id", "text")
    d2 = d.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("text_b")
    )
    return (
        d.join(d2, "doc_id")
        .select("doc_id", F.col("text").alias("text_a"), "text_b")
    )


def szs_levenshtein(spark, sf):
    p = _adjacent_doc_pairs(spark, sf)
    return p.select(
        "doc_id", levenshtein_udf(F.col("text_a"), F.col("text_b")).alias("dist")
    )


SZS_LEV_SQL = """
SELECT a.doc_id, levenshtein(a.text, b.text) AS dist
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""


def szs_levenshtein_utf8(spark, sf):
    p = _adjacent_doc_pairs(spark, sf)
    return p.select(
        "doc_id", levenshtein_utf8_udf(F.col("text_a"), F.col("text_b")).alias("dist")
    )


def szs_levenshtein_affine(spark, sf):
    lev = make_levenshtein_affine_udf(gap_open=2, gap_extend=1)
    p = _adjacent_doc_pairs(spark, sf)
    return p.select("doc_id", lev(F.col("text_a"), F.col("text_b")).alias("dist"))


def szs_levenshtein_affine_unit(spark, sf):
    """Affine-gap engine at gap_open == gap_extend == 1: the affine
    recurrences must then collapse to plain unit-cost Levenshtein — a
    hard cross-engine identity check of the Gotoh path (the full 2/1
    parameterization keeps its big-int pytest oracle)."""
    lev = make_levenshtein_affine_udf(gap_open=1, gap_extend=1)
    p = _adjacent_doc_pairs(spark, sf)
    return p.select("doc_id", lev(F.col("text_a"), F.col("text_b")).alias("dist"))


def szs_needleman_wunsch(spark, sf):
    """Default NW (match=0, mismatch=-1, gaps=-1): score == -levenshtein
    by the classic duality, which the DuckDB oracle checks exactly."""
    nw = make_nw_udf()
    p = _adjacent_doc_pairs(spark, sf)
    return p.select("doc_id", nw(F.col("text_a"), F.col("text_b")).alias("score"))


SZS_NW_SQL = """
SELECT a.doc_id, -levenshtein(a.text, b.text) AS score
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""


def szs_smith_waterman(spark, sf):
    """Default SW (match=+1, mismatch=-1, gaps=-1) scoring each doc
    against an exact 40-byte substring of itself: the best local
    alignment is then provably the substring itself, so
    score == length(substring) — SQL-expressible, making the local-DP
    engine driver-checkable (arbitrary-pair SW keeps its pytest
    oracle in tests/test_kernels.py)."""
    sw = make_sw_udf()
    d = _t(spark, sf, "documents")
    return d.select(
        "doc_id",
        sw(F.col("text"), F.substring("text", 11, 40)).alias("score"),
    )


SZS_SW_SQL = """
SELECT doc_id, CAST(length(substr(text, 11, 40)) AS BIGINT) AS score
FROM documents
"""


def szs_nw_class_costs(spark, sf):
    """NW with a byte->class compacted substitution matrix — the
    error_costs_32x32_t surface (stringzillas.h:339-397; presets like
    BLOSUM62/NUC.4.4 plug in the same way).  Here: a DNA-style 2-class
    alphabet (vowels vs consonants) with NUC.4.4-style +5/-4 costs."""
    import numpy as np

    from sz_spark.kernels import expand_class_costs

    byte_to_class = np.zeros(256, dtype=np.int64)
    for ch in b"aeiou":
        byte_to_class[ch] = 1
    class_costs = np.full((32, 32), -4, dtype=np.int64)
    np.fill_diagonal(class_costs, 5)
    subs = expand_class_costs(byte_to_class, class_costs)
    nw = make_nw_udf(substitution=subs, gap_open=-2, gap_extend=-1)
    p = _adjacent_doc_pairs(spark, sf)
    return p.select("doc_id", nw(F.col("text_a"), F.col("text_b")).alias("score"))


def szs_fingerprints(spark, sf):
    """Flagship Fingerprints engine (stringzillas.h:516-580 semantics) at
    reference defaults (ndim=128, widths {3..31}, seed 0), posexploded to
    one scalar row per (doc, dim) — the driver canonicalizer cannot sort
    array<long> columns (CORRECTNESS_r01), and per-dimension rows are a
    stronger check anyway."""
    d = _t(spark, sf, "documents")
    fp = make_fingerprint_udf(ndim=128, widths=None, seed=0)  # reference defaults
    return _explode_fp_rows(d.withColumn("_fp", fp(F.col("text"))))


def _explode_fp_rows(with_fp: DataFrame) -> DataFrame:
    return (
        with_fp.select(
            "doc_id",
            F.col("_fp.hashes").alias("h"),
            F.col("_fp.counts").alias("c"),
        )
        .select("doc_id", F.posexplode(F.arrays_zip("h", "c")).alias("dim", "hc"))
        .select(
            "doc_id",
            "dim",
            F.col("hc.h").alias("min_hash"),
            F.col("hc.c").alias("min_count"),
        )
    )


FP_ORACLE_NDIM = 8
FP_ORACLE_MAXLEN = 256
FP_ORACLE_DOC_MOD = 8


def szs_fingerprints_small(spark, sf):
    """Hash-green twin of the flagship: the SAME production kernel
    (sz_spark.kernels.fingerprints) at ndim=8 over a truncated ASCII
    subset, checked value-for-value against an independent DuckDB
    re-implementation of the rolling min-hash (list_reduce polynomial
    mod per window — see szs_fingerprints_small_oracle).  This gives the
    §2.8 Fingerprints math a hard cross-engine CORRECTNESS row; the
    full-width variant above evidences shape/rows at scale."""
    d = _t(spark, sf, "documents").filter(
        (F.col("doc_id") % FP_ORACLE_DOC_MOD == 0)
        & F.col("text").rlike("^[ -~]*$")
    )
    d = d.select("doc_id", F.substring("text", 1, FP_ORACLE_MAXLEN).alias("t"))
    fp = make_fingerprint_udf(ndim=FP_ORACLE_NDIM, widths=None, seed=0)
    return _explode_fp_rows(d.withColumn("_fp", fp(F.col("t"))))


def szs_fingerprints_small_oracle() -> str:
    """DuckDB re-implementation of the rolling min-hash fingerprint
    (fingerprints/serial.hpp semantics): per dimension d a width-w[d]
    polynomial hash  h(window) = fold(acc*mult[d] + byte+1 mod m[d])
    over every window; export (min & 0xFFFFFFFF, count-of-min), or
    (0xFFFFFFFF, 0) when the text is shorter than w[d].  Window hashes
    are recomputed directly (no rolling update) — mathematically equal
    to the kernel's rolled states, via an independent code path.
    Constants are the engine's seeded per-dim parameters, inlined."""
    from sz_spark.kernels import MAX_HASH_U32, fingerprint_params

    p = fingerprint_params(FP_ORACLE_NDIM, None, 0)
    per_dim = []
    for d in range(FP_ORACLE_NDIM):
        w = int(p.widths[d])
        m = int(p.mod[d])
        mul = int(p.mult[d])
        per_dim.append(
            f"""SELECT doc_id, {d} AS dim,
       CASE WHEN hs IS NULL THEN {MAX_HASH_U32}
            ELSE list_min(hs) & {MAX_HASH_U32} END AS min_hash,
       CASE WHEN hs IS NULL THEN 0
            ELSE len(list_filter(hs, h -> h = list_min(hs))) END AS min_count
FROM (
  SELECT doc_id,
         CASE WHEN len(bs) >= {w}
              THEN list_transform(range(1, len(bs) - {w} + 2),
                   i -> list_reduce(bs[i : i + {w - 1}], (a, x) -> (a * {mul} + x) % {m}))
         END AS hs
  FROM bytes
)"""
        )
    union = "\nUNION ALL\n".join(per_dim)
    return f"""
WITH src AS (
  SELECT doc_id, substr(text, 1, {FP_ORACLE_MAXLEN}) AS t
  FROM documents
  WHERE doc_id % {FP_ORACLE_DOC_MOD} = 0 AND regexp_matches(text, '^[ -~]*$')
),
bytes AS (
  SELECT doc_id,
         list_transform(range(1, length(t) + 1),
                        j -> (ord(substr(t, j::INT, 1)) + 1)::BIGINT) AS bs
  FROM src
)
{union}
"""


# ---------------------------------------------------------------------------
# dedup / similarity search / text analysis / multimodal
# ---------------------------------------------------------------------------


def dedup_exact(spark, sf):
    return dedup.exact_duplicates(_t(spark, sf, "documents"))


def dedup_ngram_jaccard(spark, sf):
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf, "documents"), threshold=0.5, max_shingle_freq=10**9
    )


def dedup_minhash_lsh(spark, sf):
    d = _t(spark, sf, "documents").withColumnRenamed("doc_id", "conv_id")
    bands = blocking.shingle_minhash_bands(d, text_col="text")
    long = bands.select(
        "conv_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band_id"), F.col(f"band_{i}").alias("bh"))
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("conv_id", F.col("b.band_id").alias("band_id"), F.col("b.bh").alias("bh")).cache()
    a, b = long.alias("a"), long.alias("b")
    return (
        a.join(b, ["band_id", "bh"])
        .filter(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(F.col("a.conv_id").alias("id_a"), F.col("b.conv_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def dedup_minhash_lsh_oracle() -> str:
    docs = "SELECT doc_id AS conv_id, text AS doc FROM documents"
    return f"""
WITH {blocking.shingle_minhash_bands_ctes(docs)},
long AS (
  SELECT conv_id, 0 AS band_id, band_0 AS bh FROM final_bands
  UNION ALL SELECT conv_id, 1, band_1 FROM final_bands
  UNION ALL SELECT conv_id, 2, band_2 FROM final_bands
  UNION ALL SELECT conv_id, 3, band_3 FROM final_bands
)
SELECT DISTINCT a.conv_id AS id_a, b.conv_id AS id_b
FROM long a JOIN long b USING (band_id, bh)
WHERE a.conv_id < b.conv_id
"""


def dedup_simhash(spark, sf):
    """Native 60-bit md5-PRF SimHash (zero Python; DuckDB-twinned)."""
    return dedup.simhash_docs(_t(spark, sf, "documents"))


def dedup_simhash_pairs(spark, sf):
    """Block-combination LSH over the SimHash: 20 tables of 30-bit keys
    at the defaults (exact recall for hamming <= 3 by pigeonhole; 2^30
    key space per table — see dedup.simhash_near_pairs scale math)."""
    sigs = dedup.simhash_docs(_t(spark, sf, "documents"))
    return dedup.simhash_near_pairs(sigs, max_hamming=3)


def dedup_embedding_cosine(spark, sf):
    # corpus max pairwise cosine is ~0.48 — 0.4 keeps the check non-trivial.
    # LSH-bucketed plan (no cartesian join); the brute-force baseline is
    # pytest-only (test_embedding_lsh_recall).
    return dedup.embedding_near_pairs_lsh(
        _t(spark, sf, "embeddings"), threshold=0.4, dim=64
    )


def ann_cosine_topk(spark, sf):
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.cosine_topk(e, q, k=5)


def ann_lsh_topk(spark, sf):
    """Single-scan multi-table hyperplane LSH + exact re-rank, with an
    exact DuckDB twin of the whole index (md5-parity planes, integer
    sign tests — see ann.hyperplane_buckets_sql_cte)."""
    e = _t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ann.lsh_topk(e, q, dim=64, k=5)


def text_lang_id(spark, sf):
    return textops.lang_id(_t(spark, sf, "documents"))


def text_quality(spark, sf):
    return textops.quality_score(_t(spark, sf, "documents"))


def text_token_count(spark, sf):
    return textops.token_counts(_t(spark, sf, "documents"))


def text_doc_fingerprint(spark, sf):
    return textops.doc_fingerprint(_t(spark, sf, "documents"))


def mm_decode_metadata(spark, sf):
    """Binary-payload decode roundtrip, now ORACLE-CHECKED: the payload
    is synthesized deterministically from documents, so every decoded
    field (width, height, n_bytes, body byte-mean) is SQL-derivable and
    DuckDB recomputes them from the raw text.  mean is exported as
    floor(mean * 1e6) — both engines divide the same integers in IEEE
    double and floor it, so the value is bit-identical (round() would
    tie-break differently on exact k/2^m means)."""
    d = _t(spark, sf, "documents")
    payloads = multimodal.synthesize_binary_column(d)
    dec = multimodal.decode_metadata(payloads.select("doc_id", "payload"))
    return dec.select(
        "doc_id",
        "width",
        "height",
        "n_bytes",
        F.floor(F.col("mean_byte") * 1e6).cast("long").alias("mean_byte_e6"),
        "ok",
    )


MM_DECODE_SQL = """
SELECT doc_id,
       CAST(length(text) % 256 + 16 AS INT) AS width,
       CAST(doc_id % 64 + 16 AS INT) AS height,
       CAST(14 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(floor(CAST(list_aggregate(list_transform(regexp_extract_all(text, '.'), x -> ord(x)), 'sum') AS DOUBLE)
                  / octet_length(encode(text)) * 1000000.0) AS BIGINT) AS mean_byte_e6,
       TRUE AS ok
FROM documents
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

REGISTRY: dict[str, tuple] = {
    # relational
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_orders": (q3_top_orders, Q3_SQL),
    "q_region_revenue": (q_region_revenue, Q_REGION_SQL),
    "q_events_hourly": (q_events_hourly, Q_EVENTS_SQL),
    "q_window_rank": (q_window_rank, Q_WINDOW_SQL),
    "q_sample_seeded": (q_sample_seeded, None),
    # scalar string kernels
    "str_find_rfind": (str_find_rfind, STR_FIND_SQL),
    "str_contains_filter": (str_contains_filter, STR_CONTAINS_SQL),
    "str_count_substring": (str_count_substring, STR_COUNT_SQL),
    "str_split_explode_tokens": (str_split_explode_tokens, STR_SPLIT_SQL),
    "str_partition": (str_partition, STR_PARTITION_SQL),
    "str_strip_translate": (str_strip_translate, STR_TRANSLATE_SQL),
    "str_sha256": (str_sha256, STR_SHA256_SQL),
    "str_bytesum": (str_bytesum, STR_BYTESUM_SQL),
    "str_sort_topk": (str_sort_topk, STR_SORT_SQL),
    "str_case_fold_sort": (str_case_fold_sort, STR_CASEFOLD_SQL),
    "str_intersect": (str_intersect, STR_INTERSECT_SQL),
    "str_count_byteset": (str_count_byteset, STR_COUNT_BYTESET_SQL),
    "str_find_first_last_of": (str_find_first_last_of, STR_FIRST_LAST_OF_SQL),
    "str_split_byteset": (str_split_byteset, STR_SPLIT_BYTESET_SQL),
    "str_utf8_counts": (str_utf8_counts, STR_UTF8_SQL),
    "str_utf8_casefold": (str_utf8_casefold, STR_CASEFOLD_UDF_SQL),
    "str_uncased_search": (str_uncased_search, STR_UNCASED_SEARCH_SQL),
    "str_utf8_norm": (str_utf8_norm, STR_UTF8_NORM_SQL),
    "str_find_denormalized": (str_find_denormalized, STR_FIND_DENORM_SQL),
    "str_hmac_sha256": (str_hmac_sha256, str_hmac_sha256_sql()),
    "str_count_overlapping": (str_count_overlapping, STR_COUNT_OVERLAP_SQL),
    "str_rpartition_endswith": (str_rpartition_endswith, STR_RPARTITION_SQL),
    "str_translate_lut": (str_translate_lut, str_translate_lut_sql()),
    "str_splitlines": (str_splitlines, STR_SPLITLINES_SQL),
    "str_split_delimiters": (str_split_delimiters, STR_SPLIT_DELIM_SQL),
    "q_sample_with_replacement": (q_sample_with_replacement, None),
    "str_find_not_of": (str_find_not_of, STR_FIND_NOT_OF_SQL),
    "str_utf8_whitespaces": (str_utf8_whitespaces, STR_UTF8_WS_SQL),
    "q_sample_hash": (q_sample_hash, Q_SAMPLE_HASH_SQL),
    "str_utf8_wordbreaks": (str_utf8_wordbreaks, STR_WORDBREAKS_SQL),
    "str_utf8_sentences": (str_utf8_sentences, STR_SENTENCES_SQL),
    "str_utf8_linebreaks": (str_utf8_linebreaks, STR_LINEBREAKS_SQL),
    "str_utf8_graphemes": (str_utf8_graphemes, STR_GRAPHEMES_SQL),
    "q_shuffled": (q_shuffled, Q_SHUFFLED_SQL),
    "str_fill_random": (str_fill_random, STR_FILL_RANDOM_SQL),
    "szs_hash_multiseed": (szs_hash_multiseed, SZS_MULTISEED_SQL),
    # ER pipeline
    "tr_transcripts": (tr_transcripts, transcripts_sql()),
    "tr_canonicalize": (tr_canonicalize, TR_CANON_SQL),
    "er_minhash_bands": (er_minhash_bands, er_bands_oracle()),
    "er_candidate_pairs": (er_candidate_pairs, er_pairs_oracle()),
    "er_pair_scores_lev": (er_pair_scores_lev, er_scores_oracle()),
    "er_pair_scores_jw": (er_pair_scores_jw, er_jw_oracle()),
    "er_clusters": (er_clusters, er_clusters_oracle()),
    "er_clusters_production": (er_clusters_production, er_ground_truth_clusters_oracle()),
    "er_cluster_sizes": (er_cluster_sizes, er_cluster_sizes_oracle()),
    # reference-exact engines
    "szs_levenshtein": (szs_levenshtein, SZS_LEV_SQL),
    "szs_levenshtein_utf8": (szs_levenshtein_utf8, SZS_LEV_SQL),  # ASCII corpus
    "szs_levenshtein_affine": (szs_levenshtein_affine, None),
    "szs_levenshtein_affine_unit": (szs_levenshtein_affine_unit, SZS_LEV_SQL),
    "szs_needleman_wunsch": (szs_needleman_wunsch, SZS_NW_SQL),
    "szs_smith_waterman": (szs_smith_waterman, SZS_SW_SQL),
    "szs_nw_class_costs": (szs_nw_class_costs, None),
    "szs_fingerprints": (szs_fingerprints, None),
    "szs_fingerprints_small": (szs_fingerprints_small, szs_fingerprints_small_oracle()),
    # dedup / ANN / text analysis / multimodal
    "dedup_exact": (dedup_exact, dedup.EXACT_DUP_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_jaccard, dedup.ngram_jaccard_sql(threshold=0.5)),
    "dedup_minhash_lsh": (dedup_minhash_lsh, dedup_minhash_lsh_oracle()),
    "dedup_simhash": (dedup_simhash, dedup.SIMHASH_SQL),
    "dedup_simhash_pairs": (dedup_simhash_pairs, dedup.simhash_near_pairs_sql()),
    "dedup_embedding_cosine": (
        dedup_embedding_cosine,
        dedup.embedding_near_pairs_lsh_sql(0.4, dim=64),
    ),
    "ann_cosine_topk": (ann_cosine_topk, ann.cosine_topk_sql(10, 5)),
    "ann_lsh_topk": (ann_lsh_topk, ann.lsh_topk_sql(10, 5, dim=64)),
    "text_lang_id": (text_lang_id, textops.LANG_ID_SQL),
    "text_quality": (text_quality, textops.QUALITY_SQL),
    "text_token_count": (text_token_count, textops.TOKEN_COUNTS_SQL),
    "text_doc_fingerprint": (text_doc_fingerprint, textops.DOC_FINGERPRINT_SQL),
    "mm_decode_metadata": (mm_decode_metadata, MM_DECODE_SQL),
}
