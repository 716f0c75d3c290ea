"""Triangle counting & local clustering coefficients over pair graphs.

Near-duplicate pipelines emit candidate PAIRS; connected components
(`operators/components.py`) collapses them into clusters. Triangle
statistics answer the question in between: how *cohesive* is the pair
graph? A duplicate cluster whose members all match each other is a
clique (local clustering coefficient ≈ 1); a chain of borderline
matches stitched together by transitivity has few triangles — exactly
the clusters worth re-verifying before a destructive dedup. The same
statistic is the standard community-structure / link-spam signal on
web graphs.

Spark-first shape — the degree-oriented node-iterator of Suri &
Vassilvitskii, "Counting triangles and the curse of the last reducer"
(WWW 2011):

- canonicalize the undirected edge list (least, greatest) + distinct;
- orient every edge from its lower-(degree, id) endpoint to the
  higher one. Orientation caps the out-degree at O(sqrt(m)), so the
  wedge join below is bounded by Σ_v d_out(v)² ≤ m^{3/2} — the
  published bound — instead of Σ_v d(v)², which a hub node turns
  quadratic ("the curse of the last reducer");
- wedges: self-join the oriented list on the source; each wedge
  (v, w) closes iff the oriented edge v→w exists — one left-semi
  equi-join. Every triangle is found exactly once, at its
  lowest-order apex;
- per-node counts: explode the three corners, hash-aggregate.

Shuffle budget: (node, long) degree rows, oriented (src, dst) id
pairs, and (corner-id, 1) triangle rows — never payloads. The degree
join is a plain shuffled hash join (the degree table is |V| rows —
larger than a broadcast at web scale). No driver state, no collect.

The oracle twin (:func:`triangles_oracle_sql`) replays the identical
orientation + wedge-close construction in ANSI SQL, using row-value
comparison ``(deg, id) < (deg, id)`` for the total order exactly as
the Spark side compares ``struct(deg, id)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_stats", "triangles_oracle_sql"]


def triangle_stats(
    pairs: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """``(node, degree, triangles, clustering_coeff)`` for every node
    of the undirected pair graph, coefficient = 2T / (d·(d−1)) for
    degree ≥ 2 else 0.0, rounded to 6 digits (cross-engine float
    convention)."""
    # Materialize the canonical edge list ONCE. `e` is consumed by the
    # degree count (twice, via unionAll) and the orientation join, and
    # `oriented` below by three self-join branches — without lineage
    # truncation a lazy plan re-evaluates the (often expensive) pair
    # generator once per branch, multiplying upstream cost ~50×
    # (measured: 70 s → 2 s at sf0.01 over the SimHash pair graph).
    # Same localCheckpoint discipline as operators/components.py; the
    # blocks are (long, long) id rows, never payloads.
    e = (
        pairs.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    # Attach both endpoint degrees, orient low-(deg, id) → high.
    du = deg.select(
        F.col("node").alias("u"), F.col("degree").alias("du")
    )
    dv = deg.select(
        F.col("node").alias("v"), F.col("degree").alias("dv")
    )
    ranked = e.join(du, "u").join(dv, "v")
    lo_first = F.struct(F.col("du"), F.col("u")) < F.struct(
        F.col("dv"), F.col("v")
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lo_first, F.col("dv")).otherwise(F.col("du")).alias(
            "dst_deg"
        ),
    ).localCheckpoint()
    # Wedges at the lowest-order apex: (src, d1, d2) with d1 before d2
    # in the SAME total order the orientation used, so the closing
    # edge — if present — is oriented d1 → d2.
    o1 = oriented.select(
        F.col("src"),
        F.col("dst").alias("d1"),
        F.col("dst_deg").alias("deg1"),
    )
    o2 = oriented.select(
        F.col("src"),
        F.col("dst").alias("d2"),
        F.col("dst_deg").alias("deg2"),
    )
    wedges = o1.join(o2, "src").where(
        F.struct(F.col("deg1"), F.col("d1"))
        < F.struct(F.col("deg2"), F.col("d2"))
    )
    closing = oriented.select(
        F.col("src").alias("d1"), F.col("dst").alias("d2")
    )
    tris = wedges.join(closing, ["d1", "d2"], "left_semi").select(
        "src", "d1", "d2"
    )
    corner = (
        tris.select(F.col("src").alias("node"))
        .unionAll(tris.select(F.col("d1").alias("node")))
        .unionAll(tris.select(F.col("d2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return (
        deg.join(corner, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce(F.col("triangles"), F.lit(0))
                    / (
                        F.col("degree").cast("double")
                        * (F.col("degree") - F.lit(1))
                    ),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
        .orderBy("node")
    )


def triangles_oracle_sql(pairs_sql: str, a: str = "id_a", b: str = "id_b") -> str:
    """DuckDB twin: identical orientation + wedge-close construction
    over ``pairs_sql`` (any SELECT producing the pair columns)."""
    # pairs/e/deg/oriented are MATERIALIZED: DuckDB inlines plain
    # CTEs and `oriented` is referenced three times (wedge sides +
    # close test), which would re-expand the pair generator per
    # reference.
    return f"""
    WITH pairs AS MATERIALIZED ({pairs_sql}),
    e AS MATERIALIZED (
        SELECT DISTINCT least({a}, {b}) AS u, greatest({a}, {b}) AS v
        FROM pairs WHERE {a} <> {b}
    ),
    deg AS MATERIALIZED (
        SELECT node, count(*) AS degree FROM (
            SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
        ) GROUP BY node
    ),
    oriented AS MATERIALIZED (
        SELECT CASE WHEN (du.degree, e.u) < (dv.degree, e.v)
                    THEN e.u ELSE e.v END AS src,
               CASE WHEN (du.degree, e.u) < (dv.degree, e.v)
                    THEN e.v ELSE e.u END AS dst,
               CASE WHEN (du.degree, e.u) < (dv.degree, e.v)
                    THEN dv.degree ELSE du.degree END AS dst_deg
        FROM e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ),
    tri AS (
        SELECT o1.src, o1.dst AS d1, o2.dst AS d2
        FROM oriented o1
        JOIN oriented o2
          ON o1.src = o2.src
         AND (o1.dst_deg, o1.dst) < (o2.dst_deg, o2.dst)
        WHERE EXISTS (
            SELECT 1 FROM oriented c
            WHERE c.src = o1.dst AND c.dst = o2.dst
        )
    ),
    corner AS (
        SELECT node, count(*) AS triangles FROM (
            SELECT src AS node FROM tri
            UNION ALL SELECT d1 AS node FROM tri
            UNION ALL SELECT d2 AS node FROM tri
        ) GROUP BY node
    )
    SELECT deg.node, deg.degree,
           COALESCE(corner.triangles, 0) AS triangles,
           CASE WHEN deg.degree >= 2
                THEN round(2.0 * COALESCE(corner.triangles, 0)
                           / (CAST(deg.degree AS DOUBLE)
                              * (deg.degree - 1)), 6)
                ELSE 0.0 END AS clustering_coeff
    FROM deg LEFT JOIN corner ON corner.node = deg.node
    ORDER BY deg.node
    """
