"""Text-analysis operators for a large-scale training-data pipeline:
language-ID heuristic, quality scoring, token counting, document
fingerprinting.  Everything here is native Spark SQL expressions
(JVM-side, whole-stage-codegen'd) — no Python in the hot path — and
each has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny deterministic stopword sets for the n-gram language heuristic
STOPWORDS = {
    "en": ("the", "a", "of"),
    "fr": ("le", "la", "et"),
    "es": ("el", "de", "que"),
}


def _hits(toks: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stopword-hit language heuristic."""
    toks = F.split(F.col(text_col), " ")
    en, fr, es = (_hits(toks, STOPWORDS[k]) for k in ("en", "fr", "es"))
    pred = (
        F.when((en >= fr) & (en >= es) & (en > 0), "en")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("unk")
    )
    return docs.select(
        "doc_id",
        en.alias("en_hits"),
        fr.alias("fr_hits"),
        es.alias("es_hits"),
        pred.alias("pred_lang"),
    )


LANG_ID_SQL = """
SELECT doc_id,
       len(list_intersect(string_split(text, ' '), ['the','a','of'])) AS en_hits,
       len(list_intersect(string_split(text, ' '), ['le','la','et'])) AS fr_hits,
       len(list_intersect(string_split(text, ' '), ['el','de','que'])) AS es_hits,
       CASE
         WHEN len(list_intersect(string_split(text,' '), ['the','a','of'])) >= len(list_intersect(string_split(text,' '), ['le','la','et']))
          AND len(list_intersect(string_split(text,' '), ['the','a','of'])) >= len(list_intersect(string_split(text,' '), ['el','de','que']))
          AND len(list_intersect(string_split(text,' '), ['the','a','of'])) > 0 THEN 'en'
         WHEN len(list_intersect(string_split(text,' '), ['le','la','et'])) >= len(list_intersect(string_split(text,' '), ['el','de','que']))
          AND len(list_intersect(string_split(text,' '), ['le','la','et'])) > 0 THEN 'fr'
         WHEN len(list_intersect(string_split(text,' '), ['el','de','que'])) > 0 THEN 'es'
         ELSE 'unk'
       END AS pred_lang
FROM documents
"""


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/stopword-ratio quality features + a bounded linear score."""
    toks = F.split(F.col(text_col), " ")
    n_tok = F.size(toks)
    stop_hits = _hits(toks, ("the", "a", "of"))
    stop_ratio = stop_hits / n_tok.cast("double")
    quality = F.least(F.lit(1.0), n_tok / F.lit(100.0)) * (F.lit(1.0) - stop_ratio)
    return docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars_obs"),
        n_tok.alias("n_tokens"),
        F.round(F.length(text_col) / n_tok.cast("double"), 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(quality, 6).alias("quality"),
    )


QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars_obs,
       len(string_split(text, ' ')) AS n_tokens,
       round(length(text) / CAST(len(string_split(text,' ')) AS DOUBLE), 6) AS avg_token_len,
       round(len(list_intersect(string_split(text,' '), ['the','a','of']))
             / CAST(len(string_split(text,' ')) AS DOUBLE), 6) AS stopword_ratio,
       round(least(1.0, len(string_split(text,' ')) / 100.0)
             * (1.0 - len(list_intersect(string_split(text,' '), ['the','a','of']))
                / CAST(len(string_split(text,' ')) AS DOUBLE)), 6) AS quality
FROM documents
"""


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex piece count."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).alias(
            "bpe_pieces"
        ),
    )


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_pieces
FROM documents
"""


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Array of word n-grams (shared by dedup + fingerprinting)."""
    toks = F.split(F.col(text_col), " ")
    cnt = F.size(toks)
    return F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_fingerprint(docs: DataFrame, text_col: str = "text", k: int = 4) -> DataFrame:
    """Min-k document fingerprint: the k smallest md5 values over word
    3-shingles (a winnowing-style sketch, SQL-reproducible)."""
    hashes = F.array_sort(
        F.transform(word_shingles(text_col), lambda s: F.md5(s))
    )
    # try_element_at: NULL out of range (matching DuckDB list indexing)
    # where ANSI element_at would throw INVALID_ARRAY_INDEX on docs with
    # fewer than k shingles
    return docs.select(
        "doc_id",
        *[F.try_element_at(hashes, F.lit(i + 1)).alias(f"fp_{i}") for i in range(k)],
    )


DOC_FINGERPRINT_SQL = """
WITH sh AS (
  SELECT doc_id,
         list_sort(list_transform(
           list_transform(
             range(1, len(string_split(text,' ')) - 1),
             i -> array_to_string(string_split(text,' ')[i : i + 2], ' ')
           ), s -> md5(s))) AS hs
  FROM documents
)
SELECT doc_id, hs[1] AS fp_0, hs[2] AS fp_1, hs[3] AS fp_2, hs[4] AS fp_3
FROM sh
"""
