"""Transitive clustering: connected components over the match-pair graph.

Implements the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) with plain DataFrame joins/aggregations — each round is two
shuffles, converges in O(log^2 n) rounds, and every round can be
checkpointed so a failed run resumes mid-stage.

Deterministic output: cluster_id = min conv_id (lexicographic) of the
component, matching union-find-with-min semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to
    min(N(u) ∪ {u}).  Input/output: undirected edge list (src, dst)."""
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    m = sym.groupBy("src").agg(F.min("dst").alias("m"))
    m = m.withColumn("m", F.least("src", "m"))
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u, connect every neighbor <= u to min(N≤(u) ∪ {u})."""
    directed = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    m = directed.groupBy("src").agg(F.min("dst").alias("m"))
    joined = directed.join(m, "src")
    out = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        m.select(F.col("src"), F.col("m").alias("dst"))
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def union_find_local(edge_rows: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find with path compression + union by rank,
    min-id roots.  The small-graph fast path of
    :func:`connected_components`; also the test oracle (FIXTURES.md §4)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for s, d in edge_rows:
        rs, rd = find(s), find(d)
        if rs != rd:
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    checkpoint=None,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """edges(src, dst) -> assignments(id, cluster_id).

    Hybrid execution, mirroring the reference's two-tier small/large
    scheduling (similarities/serial.hpp:3296-3395): the *match graph* of
    an ER run is orders of magnitude smaller than the input (only
    above-threshold pairs), so when it fits comfortably on the driver
    (< local_threshold edges) a union-find there beats dozens of
    distributed rounds.  Driver-memory math for the default 2M-edge
    threshold: ~200 B/edge for the collected (src, dst) string tuples
    plus ~150 B/entry for the parent dict over <= 2 * edges nodes ->
    ~1 GB peak worst-case, inside a standard 4-8 GB driver with margin;
    raise local_threshold only with driver memory to back it.  Beyond
    that, alternating large-star/small-star rounds run fully
    distributed, each round checkpointed so a failed run resumes
    mid-stage.

    ``checkpoint``: optional callable ``(df, round_idx) -> df`` that
    persists the intermediate edge set and returns a lineage-truncated
    DataFrame (see sz_spark.lineage.CheckpointManager) — at 10^12-turn
    scale the iterative plan would otherwise grow unboundedly.
    """
    spark = edges.sparkSession
    cur = edges.select(
        F.col("src").cast("string"), F.col("dst").cast("string")
    ).filter(F.col("src") != F.col("dst")).distinct()

    n_edges = cur.limit(local_threshold + 1).count()
    if n_edges <= local_threshold:
        # Arrow transport both ways: toPandas() and a pandas-backed
        # createDataFrame move ~100k-2M edges in tens of ms, vs seconds
        # of driver-serial Row/pickle conversion — this path sits on the
        # critical path of every probe/pipeline run (r5 Amdahl work).
        import pandas as pd

        pdf = cur.toPandas()
        mapping = union_find_local(
            list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
        )
        if not mapping:
            return spark.createDataFrame([], "id string, cluster_id string")
        out = pd.DataFrame(
            {"id": list(mapping.keys()), "cluster_id": list(mapping.values())}
        )
        return spark.createDataFrame(out, "id string, cluster_id string")

    prev_sig = None
    for i in range(max_iterations):
        nxt = _small_star(_large_star(cur))
        if checkpoint is not None:
            nxt = checkpoint(nxt, i)
        else:
            nxt = nxt.localCheckpoint(eager=True)
        # cheap convergence signature: one aggregate instead of two
        # anti-joins (count + order-insensitive XOR-hash of the distinct
        # edge set; XOR cannot overflow under ANSI mode)
        sig = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(src, dst))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig

    # after convergence every edge points node -> component minimum
    members = cur.select(
        F.col("src").alias("id"), F.col("dst").alias("cluster_id")
    ).groupBy("id").agg(F.min("cluster_id").alias("cluster_id"))
    roots = members.select(F.col("cluster_id").alias("id")).distinct().withColumn(
        "cluster_id", F.col("id")
    )
    return members.unionByName(roots).groupBy("id").agg(
        F.min("cluster_id").alias("cluster_id")
    )


def clusters_with_singletons(
    assignments: DataFrame, all_ids: DataFrame, id_col: str = "conv_id"
) -> DataFrame:
    """Add singleton clusters for ids that matched nothing.

    The match-graph assignments are usually orders of magnitude smaller
    than the corpus; the broadcast-vs-shuffle decision is left to AQE,
    which sizes the built side by actual BYTES at runtime (round 1
    probed with limit(3M).count() — an extra job, and a row count is
    the wrong unit: 3M wide rows can blow the broadcast memory a byte
    threshold would have rejected)."""
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(assignments, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cluster_id", F.col("id")).alias("cluster_id"),
        )
    )


def connected_components_sql(edges_cte: str, node_cte: str) -> str:
    """DuckDB-oracle twin: min-label reachability via a recursive CTE.
    Correct for the oracle's small scale; the Spark path uses
    large-star/small-star for 10^12-turn scale."""
    return f"""
WITH RECURSIVE edges AS ({edges_cte}),
nodes AS ({node_cte}),
sym AS (
  SELECT src, dst FROM edges
  UNION
  SELECT dst AS src, src AS dst FROM edges
),
reach AS (
  SELECT id, id AS comp FROM nodes
  UNION
  SELECT s.dst AS id, r.comp
  FROM reach r JOIN sym s ON r.id = s.src
  WHERE r.comp < s.dst
)
SELECT id AS conv_id, min(comp) AS cluster_id
FROM reach
GROUP BY id
"""
