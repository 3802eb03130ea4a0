"""Iterative graph algorithms over edge-list DataFrames.

The dedup tier already covers component-finding (label propagation and
large-star/small-star in pipeline/dedup.py); this module adds the other
canonical message-passing shape — fixed-iteration score propagation
(PageRank) — in an exact integer fixed-point form, so a bounded chain
of SQL CTEs replays it bit-for-bit (the float form would need a
cross-engine-pinned sum order per vertex, which aggregation cannot
give).

Scale shape: each iteration is one co-partitioned join
(edges ⋈ scores on src) plus one aggregation (sum of contributions by
dst) — the classic Pregel superstep expressed as DataFrame ops.  The
static side (edges + out-degrees) is computed once and persisted; the
evolving side (scores, one row per vertex) is localCheckpoint-ed each
round to truncate lineage, the standard Spark discipline for iterative
algorithms (without it the plan doubles per iteration).  On a real
cluster both sides hash-partition on the join key, so a superstep is
a single shuffle of the small scores table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-iteration PageRank in scaled integer arithmetic.

    ``edges`` must have columns ``src`` and ``dst``; duplicates are
    dropped.  Every vertex starts at ``scale`` and each superstep
    computes::

        score'(v) = floor(scale·(den−num)/den)
                    + Σ_{u→v} floor(num·score(u) / (den·outdeg(u)))

    All state is BIGINT and division is integral (positive operands, so
    Spark ``div`` and SQL ``//`` agree exactly) — no float fold order
    to pin, which is what makes the result value-matchable against a
    chained-CTE SQL replay.  Dangling mass (vertices with no outgoing
    edge) is dropped, the common simplification; scores are therefore a
    ranking signal, not a normalized distribution.

    Magnitude bound: Σscores ≤ scale·|V| stays far under 2⁶³ for any
    realistic vertex count, and the per-edge product num·score(u)
    inherits the same headroom (≤ 85·scale·|V|).

    Returns one row per vertex: ``(node, score)``.
    """
    # Persist the distinct edge list FIRST: nodes, out-degrees, and the
    # degree-annotated edges all derive from it, and without the persist
    # each derivation would recompute the (potentially expensive)
    # upstream edge construction — measured 3x the build cost on the
    # part co-purchase graph.
    edges = edges.select("src", "dst").distinct().persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(outdeg, "src").persist()
    base = scale * (damping_den - damping_num) // damping_den
    scores = nodes.withColumn("score", F.lit(scale).cast("long"))
    for _ in range(iters):
        contrib = (
            ed.join(scores.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                F.expr(
                    f"({damping_num}L * score) div ({damping_den}L * outdeg)"
                ).alias("__c"),
            )
            .groupBy("dst")
            .agg(F.sum("__c").alias("__in"))
        )
        scores = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("__in"), F.lit(0)))
                .cast("long")
                .alias("score"),
            )
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    ed.unpersist()
    edges.unpersist()
    return scores


def pagerank_oracle_sql(
    edges_cte: str,
    iters: int = 3,
    scale: int = 1_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """Chained-CTE DuckDB replay of :func:`pagerank_int` — one
    MATERIALIZED CTE per superstep (without MATERIALIZED DuckDB
    re-inlines each round into the next and the replay goes
    exponential, the same pathology the BPE-train oracle hit).
    ``edges_cte`` is a SELECT producing distinct ``(src, dst)``.
    Yields the final scores relation named ``r{iters}``; callers append
    their own final SELECT.
    """
    base = scale * (damping_den - damping_num) // damping_den
    parts = [
        f"edges AS MATERIALIZED ({edges_cte})",
        "deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1)",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges"
        " UNION SELECT DISTINCT dst FROM edges)",
        f"r0 AS MATERIALIZED (SELECT node, {scale}::BIGINT AS score FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"""r{i + 1} AS MATERIALIZED (
      SELECT n.node, ({base} + coalesce(s.in_sum, 0))::BIGINT AS score
      FROM nodes n LEFT JOIN (
        SELECT e.dst,
               sum(({damping_num} * r.score) // ({damping_den} * d.outdeg)) AS in_sum
        FROM edges e JOIN deg d ON d.src = e.src
                     JOIN r{i} r ON r.node = e.src
        GROUP BY 1) s ON s.dst = n.node)"""
        )
    return "WITH " + ",\n    ".join(parts)
