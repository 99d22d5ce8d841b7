"""Graph analytics over edge frames (iterative dataflow, DataFrame-only).

Connected components (near-dup cluster resolution) lives in
``operators.dedup.dedup_clusters``; this module holds the rank-propagation
family. Same design stance: iterations are unrolled into ONE SQL
statement (bounded, known iteration counts) or chunked with
``localCheckpoint`` between chunks for open-ended runs — Spark's
DataFrame lineage replaces a specialized graph engine, and every round is
an ordinary join + hash aggregate that AQE/skew-join handling applies to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    iterations: int = 2,
    damping: float = 0.85,
    k: int = 20,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge frame, returning the
    top-``k`` nodes — the influence/centrality pass a curation pipeline
    runs over a link or citation graph to weight sources.

    Simplified-dangling variant (mass from sink nodes is dropped, the
    common formulation for fixed-iteration SQL PageRank): ranks start at
    1.0 and each round computes ``rank'(n) = (1 − d) + d · Σ_{s→n}
    rank(s) / out_degree(s)``.

    Scale shape: one statement, iterations unrolled (bounded, plan depth
    ∝ iterations — the same contract as ``dedup_clusters``' lazy mode,
    which checkpoints past ~8 rounds). Per round: the edge frame joins
    the rank frame on ``src`` (both shuffle-keyed on src — co-partitioned
    by Catalyst across rounds since the edge subtree is identical) and
    hash-aggregates contributions keyed by ``dst`` (map-side combined:
    the shuffle carries ≤ |nodes| rows, not |edges|). Out-degrees ride
    the src join; no per-round driver action, no collect. The final
    top-k is a distributed TakeOrdered on the ROUNDED rank (6 dp) so the
    cut is engine-stable — raw doubles differ in the last bits across
    engines and would make the boundary of the top-k nondeterministic.

    Output: (node, rank) — ≤ k rows, rank rounded to 6 dp.
    """
    from obsplus_spark.util import ensure_parallelism, sql_over

    d = float(damping)
    parts = [
        f"""
        edges AS (
          SELECT DISTINCT {src_col} AS src, {dst_col} AS dst FROM {{e}}
        ),
        deg AS (
          SELECT src, CAST(count(1) AS DOUBLE) AS deg
          FROM edges GROUP BY src
        ),
        nodes AS (
          SELECT src AS node FROM edges UNION SELECT dst FROM edges
        ),
        r0 AS (SELECT node, 1.0D AS rank FROM nodes)"""
    ]
    for i in range(int(iterations)):
        parts.append(
            f"""
        c{i + 1} AS (
          SELECT e.dst AS node, sum(r.rank / g.deg) AS contrib
          FROM edges e
          JOIN r{i} r ON e.src = r.node
          JOIN deg g ON e.src = g.src
          GROUP BY e.dst
        ),
        r{i + 1} AS (
          SELECT n.node,
                 {1.0 - d!r}D + {d!r}D * coalesce(c.contrib, 0.0D) AS rank
          FROM nodes n LEFT JOIN c{i + 1} c ON n.node = c.node
        )"""
        )
    body = ",".join(parts)
    return sql_over(
        {"e": ensure_parallelism(edges)},
        f"""
        WITH {body}
        SELECT node, round(rank, 6) AS rank
        FROM r{int(iterations)}
        ORDER BY round(rank, 6) DESC, node
        LIMIT {int(k)}
        """,
    )
