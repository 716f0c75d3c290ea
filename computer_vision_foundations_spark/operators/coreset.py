"""k-center coreset selection — farthest-point greedy over embeddings.

The data-selection primitive for "cover the space with a budget":
Gonzalez's farthest-point traversal (1985) greedily picks the point
farthest from the selected set, giving the classic 2-approximation to
the k-center objective. In LLM-data terms it is the diversity-first
complement to MMR (relevance-diverse, za22), DSIR (distribution-
matched, q12) and curriculum ordering (z39): a k-center coreset is
the smallest "spanning sample" used for fast eval sets, dedup probes
and annotation budgets (Sener & Savarese 2018 use exactly this for
active learning).

Determinism & exactness (the za50/q46 discipline): components quantize
to the 1e-6 grid, so squared L2 distances are EXACT BIGINT integers;
the seed is the smallest id; each round's argmax ties break by
smallest id — the whole selection SEQUENCE is a pure function of the
table and is replayed by the oracle as one unrolled CTE per round
with identical integer algebra. No rounding anywhere in the output.

Spark-first shape: k rounds, each ONE narrow scan computing the
running min-distance to the (broadcast, ≤k-row) selected set in
codegen via ``least()`` over unrolled literals, reduced by a
TakeOrderedAndProject(1) — never a global sort, never a pairwise
materialization. Driver state is the k selected rows (model-sized,
the MMR/BPE precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kcenter_coreset", "kcenter_oracle_sql"]

_GRID = 1_000_000.0


def _quant(col):
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * _GRID + 0.5).cast("long")
    )


def kcenter_coreset(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
) -> DataFrame:
    """``(round, vec_id, d2)`` for rounds 1..k: the selection sequence
    of farthest-point traversal seeded at the smallest id. ``d2`` is
    the EXACT squared grid distance from the chosen point to the
    previously selected set (NULL for the seed)."""
    base = df.select(
        F.col(id_col).alias("vid"), _quant(F.col(vec_col)).alias("q")
    ).localCheckpoint()  # quantize once; k scans reuse the block

    # each squared term accumulates in DECIMAL(38,0): long*long
    # silently wraps in non-ANSI Spark once components reach
    # ~1e3 raw (1e9 on the grid, 1e18 per term) while the DuckDB
    # oracle's sum promotes to HUGEINT — the skewstats/emd
    # overflow pattern (round-9 advice)
    dec = "decimal(38,0)"

    def _dist(vec):
        return F.aggregate(
            F.zip_with(
                F.col("q"),
                F.array(*[F.lit(int(v)) for v in vec]),
                lambda a, b: (a - b).cast(dec) * (a - b).cast(dec),
            ),
            F.lit(0).cast(dec),
            lambda acc, v: acc + v,
        )

    seed = base.orderBy("vid").limit(1).collect()[0]
    chosen: list[tuple] = [(seed["vid"], seed["q"], None)]
    # INCREMENTAL running min (round-12): d_r(x) = min(d_{r-1}(x),
    # dist(x, newest center)) — min-of-mins equals the min over all
    # selected centers, and the distances are EXACT integers, so the
    # selection sequence is bit-identical to the re-evaluate-all form
    # while each round evaluates ONE distance term per row instead of
    # r−1 (Σ r ≈ k²/2 → k evaluations; the codegen tree also stays
    # O(dim) literals instead of O(k·dim)). Each round's frame is
    # persisted and materialized by the TakeOrdered collect itself
    # (one job per round, same as before); the previous round's cache
    # is released once superseded.
    cur = base.where(F.col("vid") != seed["vid"]).select(
        "vid", "q", _dist(seed["q"]).alias("d2")
    )
    prev_cached = None
    for _ in range(1, k):
        cur = cur.persist()
        nxt = (
            cur.orderBy(F.col("d2").desc(), F.col("vid").asc())
            .limit(1)
            .collect()
        )
        if prev_cached is not None:
            prev_cached.unpersist()
        prev_cached = cur
        if not nxt:
            break
        chosen.append((nxt[0]["vid"], nxt[0]["q"], nxt[0]["d2"]))
        cur = cur.where(F.col("vid") != nxt[0]["vid"]).select(
            "vid",
            "q",
            F.least(F.col("d2"), _dist(nxt[0]["q"])).alias("d2"),
        )
    if prev_cached is not None:
        prev_cached.unpersist()
    spark = df.sparkSession
    out = spark.createDataFrame(
        [
            (r + 1, int(vid), None if d2 is None else int(d2))
            for r, (vid, _, d2) in enumerate(chosen)
        ],
        "round int, vec_id long, d2 long",
    )
    return out.orderBy("round")


def kcenter_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
) -> str:
    """DuckDB twin: identical grid quantization; one MATERIALIZED CTE
    per round (the MMR/LPA unroll convention) — round r's pick is the
    argmax of min exact squared distance to rounds 1..r-1."""
    rounds = []
    sel_union = f"SELECT 1 AS round, vec_id, CAST(NULL AS BIGINT) AS d2 FROM c1"
    for r in range(2, k + 1):
        prev_sel = " UNION ALL ".join(
            f"SELECT vec_id FROM c{i}" for i in range(1, r)
        )
        rounds.append(
            f"""c{r} AS MATERIALIZED (
        SELECT vid AS vec_id, CAST(md AS BIGINT) AS d2 FROM (
            SELECT vid, min(pd) AS md FROM (
                SELECT a.vid AS vid, s.vec_id AS sid,
                       sum(CAST(a.q - b.q AS HUGEINT)
                           * CAST(a.q - b.q AS HUGEINT)) AS pd
                FROM qx a
                CROSS JOIN ({prev_sel}) s
                JOIN qx b ON b.vid = s.vec_id AND b.i = a.i
                WHERE a.vid NOT IN ({prev_sel})
                GROUP BY a.vid, s.vec_id
            ) GROUP BY vid
        ) ORDER BY md DESC, vid ASC LIMIT 1
    )"""
        )
        sel_union += (
            f" UNION ALL SELECT {r} AS round, vec_id, d2 FROM c{r}"
        )
    return f"""
    WITH qx AS MATERIALIZED (
        SELECT {id_col} AS vid, CAST(u.i AS INTEGER) AS i,
               CAST(floor(CAST({vec_col}[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                          * {_GRID!r} + 0.5) AS BIGINT) AS q
        FROM {table}, unnest(range(len({vec_col}))) u(i)
    ),
    c1 AS MATERIALIZED (
        SELECT min(vid) AS vec_id FROM qx
    ),
    {", ".join(rounds)}
    SELECT round, vec_id, d2 FROM ({sel_union}) ORDER BY round
    """
