"""Deterministic synthesis of the pipeline's input table.

BASELINE.json input_hint fixes the input shape:
``transcripts(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``.

The sandbox has no Iceberg transcripts, so we derive the table
*deterministically* from the driver-provided ``documents`` parquet —
no external or random data.  Every transformation here is expressible
identically in ANSI SQL so the DuckDB oracle can replay it
(see __spark_entry__.oracle_sql).

Derivation (word-salad docs -> multi-turn conversations):

* tokens = split(text, ' '); turns of TURN_TOKENS tokens each
* every turn is prefixed with a conversation-entity salt token — the
  analog of the session/user handles real transcripts carry.  The salt
  is a repetition code of the 5-digit zero-padded doc_id (each digit
  repeated 8x), so any two distinct entities differ by >= 8 bytes in
  EVERY turn: cross-entity similarity is *analytically* bounded at
  <= 1 - 8/(len per turn) ~= 0.905 even for the byte-identical
  near-duplicate documents the test corpus plants, while true variants
  (few-byte edits) stay >= 0.96.  This makes the pairwise-F1 ground
  truth separable by construction (FIXTURES.md §1: mutated clones with
  analytically-known edit distances).
* base conversation  ``c<doc_id>``  — every document
* near-dup variant   ``d<doc_id>``  — doc_id % 2 == 0: token #4 of the
  document replaced by the literal ``zz`` (edit of <= ~6 bytes)
* tail-edit variant  ``e<doc_id>``  — doc_id % 5 == 0 and >= 24 tokens:
  last token replaced by ``q`` (edit of <= ~8 bytes; substitution, not
  truncation — dropping a token could shift the turn split and delete a
  whole salted turn, blowing the analytic edit bound)
* role = user/assistant alternating by turn_idx; tool = 'search' on
  every 5th turn (turn_idx % 5 == 2); ts = 2025-01-01 + turn_idx min

Ground-truth entity of a conversation is its doc_id — used for the
pairwise-F1 gate (BASELINE.json metric).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TURN_TOKENS = 8
SALT_REPEAT = 8
#: digits in the zero-padded entity id inside the salt.  Spark's lpad
#: TRUNCATES longer strings, which would collapse distinct entities onto
#: one salt and void the cross-entity separation guarantee — so doc_ids
#: must stay below 10**SALT_DIGITS (asserted by consumers, see bench.py).
SALT_DIGITS = 6
BASE_TS = "2025-01-01 00:00:00"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _salt_col() -> Column:
    """'u' + each digit of lpad(doc_id, SALT_DIGITS, '0') repeated
    SALT_REPEAT times."""
    padded = F.lpad(F.col("doc_id").cast("string"), SALT_DIGITS, "0")
    parts = [
        F.repeat(F.substring(padded, i + 1, 1), SALT_REPEAT)
        for i in range(SALT_DIGITS)
    ]
    return F.concat(F.lit("u"), *parts)


def _turns_from_tokens(docs_with_tokens: DataFrame, prefix: str) -> DataFrame:
    """Explode token arrays into (conv_id, turn_idx, role, text, tool, ts)."""
    n_turns = F.ceil(F.size("toks") / F.lit(TURN_TOKENS)).cast("int")
    d = docs_with_tokens.withColumn("n_turns", n_turns)
    d = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    return d.select(
        F.concat(F.lit(prefix), F.col("doc_id").cast("string")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
        F.concat(
            _salt_col(),
            F.lit(" "),
            F.array_join(
                F.slice(
                    F.col("toks"), F.col("turn_idx") * TURN_TOKENS + 1, TURN_TOKENS
                ),
                " ",
            ),
        ).alias("text"),
        F.when(F.col("turn_idx") % 5 == 2, "search").otherwise("").alias("tool"),
        F.expr(
            f"timestamp '{BASE_TS}' + make_interval(0, 0, 0, 0, 0, turn_idx, 0)"
        ).alias("ts"),
        F.col("doc_id").alias("entity_id"),
    )


def build_transcripts(
    spark: SparkSession, sf_dir: str, with_entity_id: bool = False
) -> DataFrame:
    """The synthetic transcripts table (see module docstring).

    ``with_entity_id=True`` additionally carries the ground-truth
    ``entity_id`` column for evaluation; the production pipeline never
    reads it.
    """
    return build_transcripts_from_documents(
        load_documents(spark, sf_dir), with_entity_id
    )


def build_transcripts_from_documents(
    documents: DataFrame, with_entity_id: bool = False
) -> DataFrame:
    """Same derivation over an arbitrary documents(doc_id, text) frame —
    the bench uses this with a replicated corpus to scale the input."""
    docs = documents.select("doc_id", F.split("text", " ").alias("toks"))

    base = _turns_from_tokens(docs, "c")

    # near-dup variant: token #4 -> 'zz'
    dup_docs = docs.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.concat(
            F.slice("toks", 1, 3),
            F.array(F.lit("zz")),
            # greatest(...,0): Spark's slice raises on negative lengths
            # for <4-token docs, while the DuckDB twin's toks[5:] is
            # empty — match the SQL semantics exactly
            F.slice(
                F.col("toks"),
                F.lit(5),
                F.greatest(F.size("toks") - F.lit(4), F.lit(0)),
            ),
        ).alias("toks"),
    )
    dup = _turns_from_tokens(dup_docs, "d")

    # tail-edit variant: replace the final token with 'q'
    trunc_docs = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .filter(F.size("toks") >= 3 * TURN_TOKENS)
        .select(
            "doc_id",
            F.concat(
                F.slice("toks", F.lit(1), F.size("toks") - F.lit(1)),
                F.array(F.lit("q")),
            ).alias("toks"),
        )
    )
    trunc = _turns_from_tokens(trunc_docs, "e")

    out = base.unionByName(dup).unionByName(trunc)
    if not with_entity_id:
        out = out.drop("entity_id")
    return out


def _salt_sql() -> str:
    parts = " || ".join(
        f"repeat(substr(lpad(CAST(doc_id AS VARCHAR), {SALT_DIGITS}, '0'), {i + 1}, 1), {SALT_REPEAT})"
        for i in range(SALT_DIGITS)
    )
    return f"'u' || {parts}"


def transcripts_sql(with_entity_id: bool = False) -> str:
    """The *identical* derivation in ANSI SQL for the DuckDB oracle.

    DuckDB list slicing is 1-based inclusive like Spark's ``slice``.
    """
    ent = ", entity_id" if with_entity_id else ""
    return f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents
),
variants AS (
  SELECT 'c' || CAST(doc_id AS VARCHAR) AS conv_id, doc_id AS entity_id, doc_id, toks FROM docs
  UNION ALL
  SELECT 'd' || CAST(doc_id AS VARCHAR), doc_id, doc_id,
         list_concat(list_concat(toks[1:3], ['zz']), toks[5:])
  FROM docs WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'e' || CAST(doc_id AS VARCHAR), doc_id, doc_id,
         list_concat(toks[1 : len(toks) - 1], ['q'])
  FROM docs
  WHERE doc_id % 5 = 0 AND len(toks) >= {3 * TURN_TOKENS}
),
turns AS (
  SELECT conv_id, entity_id, doc_id, toks,
         CAST(unnest(range(CAST(CEIL(len(toks) / {TURN_TOKENS}.0) AS INT))) AS INT) AS turn_idx
  FROM variants
)
SELECT conv_id,
       turn_idx,
       CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
       {_salt_sql()} || ' ' ||
         array_to_string(toks[turn_idx * {TURN_TOKENS} + 1 : turn_idx * {TURN_TOKENS} + {TURN_TOKENS}], ' ') AS text,
       CASE WHEN turn_idx % 5 = 2 THEN 'search' ELSE '' END AS tool,
       TIMESTAMP '{BASE_TS}' + turn_idx * INTERVAL 1 MINUTE AS ts{ent}
FROM turns
"""
