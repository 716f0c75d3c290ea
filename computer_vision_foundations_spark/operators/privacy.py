"""Privacy auditing: k-anonymity over quasi-identifier combinations.

Training corpora carry governance obligations before they carry
tokens: a release is k-ANONYMOUS over a set of quasi-identifier (QI)
columns when every observed QI combination is shared by at least k
rows (Sweeney 2002) — smaller equivalence classes re-identify. The
audit is a pure relational aggregate, which is exactly why it belongs
in the engine: at 100 TB it is one hash aggregate over the QI
projection, and the at-risk row set is a semi-join against the small
violating-class table.

Reference parity: the reference's corpus carries per-image metadata
(camera make/model, timestamps — `02_Data Ingest.py` EXIF struct)
that IS a quasi-identifier set; auditing class sizes before release
is the standard pre-publication step.

Scale shape: one hash aggregate over narrow QI columns (map-side
partials); ``suppression_candidates`` joins the violating classes
back — the violating table is at most (k−1)·|violations| rows and
usually broadcastable; payloads never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "k_anonymity_report",
    "suppression_candidates",
    "t_closeness_report",
    "t_closeness_oracle_sql",
    "l_diversity_report",
    "l_diversity_oracle_sql",
]


def k_anonymity_report(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per-equivalence-class audit: ``qi_cols + (class_size,
    at_risk)`` — one row per observed QI combination, ``at_risk``
    when the class holds fewer than ``k`` rows."""
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size")
    ).select(
        *qi_cols,
        "class_size",
        (F.col("class_size") < k).alias("at_risk"),
    )


def suppression_candidates(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """The rows that must be suppressed (or generalized) to reach
    k-anonymity: every row whose QI class is smaller than ``k`` —
    ``(id, qi_cols...)``. Violating classes are broadcast (≤ (k−1)
    rows each), so the corpus is filtered map-side. The join is
    null-safe: a NULL QI value forms an equivalence class like any
    other (groupBy semantics), so its rows must match their violating
    class too — plain equality would silently exempt them."""
    bad = (
        k_anonymity_report(df, qi_cols, k)
        .where("at_risk")
        .select(*[F.col(c).alias(f"_b_{c}") for c in qi_cols])
    )
    cond = None
    for c in qi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_b_{c}"))
        cond = eq if cond is None else (cond & eq)
    return df.join(F.broadcast(bad), cond, "left_semi").select(
        id_col, *qi_cols
    )


def t_closeness_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
    n_bins: int = 64,
    scale: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    the distributional upgrade of ``k_anonymity_report``: a QI
    equivalence class leaks when the SENSITIVE attribute's
    distribution inside the class sits far from the global one, even
    if the class is large. Distance is the 1-D earth mover's distance
    over an ordered ``n_bins`` equi-width binning of the sensitive
    values (the standard numeric-attribute EMD of the paper),
    normalized by ``n_bins - 1`` so t ∈ [0, 1]. One row per class:
    ``qi_cols + (class_size, t_dist, t_close)``.

    Exactness (the emd.py discipline): sensitive values quantize to
    integers (``floor(v·scale + 0.5)``), bins come from the exact
    global (lo, hi), and the CDF gap |cumC·n_g − cumG·n_c| is an exact
    DECIMAL(38,0) integer — ONE divide by n_c·n_g·(B−1) at the end, so
    the report is reduction-order free and bit-replayable in SQL.

    Scale shape: one hash aggregate to (class, bin) counts, a
    broadcast of the ≤ n_bins-row global histogram crossed with the
    |classes|-row table (|classes|·n_bins rows of audit state — never
    data), one per-class cumulative window. Payloads never shuffle."""
    q = F.floor(F.col(sensitive_col).cast("double") * scale + 0.5).cast(
        "long"
    )
    # Injective class key: to_json(struct(...)) with nulls kept —
    # concat_ws SKIPS NULLs, so ('a', NULL) and (NULL, 'a') would
    # collide into one class (and an embedded separator char would
    # merge distinct tuples); JSON keeps the field names, quotes and
    # escapes values, and writes explicit nulls, so the encoding is
    # injective on the QI tuple and matches the oracle's
    # IS NOT DISTINCT FROM grouping.
    cls_key = F.to_json(
        F.struct(
            *[
                F.col(c).cast("string").alias(f"c{i}")
                for i, c in enumerate(qi_cols)
            ]
        ),
        {"ignoreNullFields": "false"},
    )
    rows = df.select(
        cls_key.alias("_cls"),
        *[F.col(c) for c in qi_cols],
        q.alias("_q"),
    ).where(F.col("_q").isNotNull())
    ext = rows.agg(
        F.min("_q").alias("lo"),
        F.max("_q").alias("hi"),
        F.count(F.lit(1)).alias("n_g"),
    )
    binw = (F.col("hi").cast("double") - F.col("lo").cast("double")) / F.lit(
        float(n_bins)
    )
    bin_expr = (
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("_q").cast("double") - F.col("lo").cast("double"))
                    / binw
                ),
                F.lit(n_bins - 1),
            )
        )
        .cast("int")
        .alias("bin")
    )
    binned = rows.join(F.broadcast(ext)).select(
        "_cls", *[F.col(c) for c in qi_cols], bin_expr
    )
    wg = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wnext = Window.orderBy("bin")
    gbins = (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cg"))
        .select(
            "bin",
            F.sum("cg").over(wg).alias("cum_g"),
            # gap to the next PRESENT bin (the emd.py lead-gap): CDFs
            # are constant between support points, so each term weighs
            # by the bin distance it spans; the last point spans none
            (F.lead("bin").over(wnext) - F.col("bin")).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
    )
    classes = binned.groupBy(
        "_cls", *[F.col(c) for c in qi_cols]
    ).agg(F.count(F.lit(1)).alias("class_size"))
    cbins = binned.groupBy("_cls", "bin").agg(
        F.count(F.lit(1)).alias("cc")
    )
    spine = classes.select("_cls", "class_size").join(
        F.broadcast(gbins)
    )  # |classes| x (<= n_bins present bins): the audit-state cross
    wc = (
        Window.partitionBy("_cls")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dec = "decimal(38,0)"
    cdf = (
        spine.join(cbins, ["_cls", "bin"], "left")
        .select(
            "_cls",
            "class_size",
            "bin",
            "cum_g",
            "gap",
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
        .select(
            "_cls",
            "class_size",
            "bin",
            "cum_g",
            "gap",
            F.sum("cc").over(wc).alias("cum_c"),
        )
    )
    num = (
        cdf.join(F.broadcast(ext.select("n_g")))
        .groupBy("_cls", "class_size", "n_g")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_c").cast(dec) * F.col("n_g").cast(dec)
                    - F.col("cum_g").cast(dec)
                    * F.col("class_size").cast(dec)
                )
                * F.col("gap").cast(dec)
            ).alias("_num")
        )
    )
    t_dist = F.round(
        F.col("_num").cast("double")
        / (
            F.col("class_size").cast("double")
            * F.col("n_g").cast("double")
            * F.lit(float(n_bins - 1))
        ),
        round_digits,
    ) + 0.0
    return (
        num.join(classes.drop("class_size"), "_cls")
        .select(
            *qi_cols,
            "class_size",
            t_dist.alias("t_dist"),
            (t_dist <= F.lit(float(t))).alias("t_close"),
        )
        .orderBy(*qi_cols)
    )


def t_closeness_oracle_sql(
    table: str,
    qi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
    n_bins: int = 64,
    scale: int = 100,
    round_digits: int = 6,
) -> str:
    """DuckDB twin — identical quantization, binning, exact-integer
    CDF algebra (HUGEINT for DECIMAL(38,0))."""
    qi = ", ".join(qi_cols)
    return f"""
    WITH rows_q AS (
        SELECT {qi},
               CAST(floor(CAST({sensitive_col} AS DOUBLE) * {scale} + 0.5)
                    AS BIGINT) AS q
        FROM {table}
        WHERE {sensitive_col} IS NOT NULL
    ), ext AS (
        SELECT min(q) AS lo, max(q) AS hi, count(*) AS n_g FROM rows_q
    ), binned AS (
        SELECT {qi},
               CAST(CASE WHEN ext.hi = ext.lo THEN 0
                    ELSE least(floor((CAST(q AS DOUBLE) - CAST(lo AS DOUBLE))
                               / ((CAST(hi AS DOUBLE) - CAST(lo AS DOUBLE))
                                  / {float(n_bins)!r})),
                               {n_bins - 1})
               END AS INT) AS bin
        FROM rows_q CROSS JOIN ext
    ), gbins0 AS (
        SELECT bin, sum(count(*)) OVER (ORDER BY bin
                                        ROWS UNBOUNDED PRECEDING) AS cum_g
        FROM binned GROUP BY bin
    ), gbins AS (
        SELECT bin, cum_g,
               lead(bin) OVER (ORDER BY bin) - bin AS gap
        FROM gbins0
        QUALIFY lead(bin) OVER (ORDER BY bin) IS NOT NULL
    ), classes AS (
        SELECT {qi}, count(*) AS class_size FROM binned GROUP BY {qi}
    ), cbins AS (
        SELECT {qi}, bin, count(*) AS cc FROM binned GROUP BY {qi}, bin
    ), cdf AS (
        SELECT c.*, g.bin AS bin, g.cum_g AS cum_g, g.gap AS gap,
               sum(coalesce(cb.cc, 0)) OVER (
                   PARTITION BY {", ".join("c." + x for x in qi_cols)}
                   ORDER BY g.bin ROWS UNBOUNDED PRECEDING) AS cum_c
        FROM classes c
        CROSS JOIN gbins g
        LEFT JOIN cbins cb
          ON g.bin = cb.bin
         AND {" AND ".join(f"c.{x} IS NOT DISTINCT FROM cb.{x}" for x in qi_cols)}
    ), num AS (
        SELECT {qi}, class_size,
               sum(abs(CAST(cum_c AS HUGEINT) * CAST(n_g AS HUGEINT)
                       - CAST(cum_g AS HUGEINT)
                         * CAST(class_size AS HUGEINT))
                   * CAST(gap AS HUGEINT)) AS nm,
               max(n_g) AS n_g
        FROM cdf CROSS JOIN ext
        GROUP BY {qi}, class_size
    )
    SELECT {qi}, class_size,
           round(CAST(nm AS DOUBLE)
                 / (CAST(class_size AS DOUBLE) * CAST(n_g AS DOUBLE)
                    * {float(n_bins - 1)!r}), {round_digits}) + 0.0 AS t_dist,
           (round(CAST(nm AS DOUBLE)
                  / (CAST(class_size AS DOUBLE) * CAST(n_g AS DOUBLE)
                     * {float(n_bins - 1)!r}), {round_digits}) + 0.0)
               <= {float(t)!r} AS t_close
    FROM num
    ORDER BY {qi}
    """


def l_diversity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., ICDE 2006) — the
    gap k-anonymity leaves open: a large QI equivalence class whose
    SENSITIVE attribute is (nearly) constant still discloses it. One
    row per class: ``qi_cols + (class_size, distinct_l, entropy_l,
    distinct_ok, entropy_ok)`` where ``distinct_l`` is the number of
    distinct sensitive values in the class (distinct l-diversity
    holds when ≥ l) and ``entropy_l = exp(H)`` is the effective
    number of values under the class's sensitive-value entropy
    (entropy l-diversity holds when exp(H) ≥ l — the paper's
    stricter test: a class with 10 values but one at 99 % fails).

    Completes the privacy kit's escalation: k-anonymity (class
    sizes) → l-diversity (value variety) → t-closeness
    (distributional distance, :func:`t_closeness_report`).

    Scale shape: ONE (class, sensitive) hash aggregate with map-side
    partials, then a |classes·values-per-class|-row aggregate to
    class rows — payloads never shuffle, no windows. Entropy uses
    exact integer counts; the only floats are the per-class
    p·ln(p) fold and one exp, both deterministic for fixed integer
    inputs (no reduction-order hazard at round 6 on class-sized
    sums). NULL sensitive values count as a value of their own
    (groupBy semantics — a class that is all-NULL is exactly as
    undiverse as a constant one); NULL QI values form their own
    class like the k-anonymity report."""
    vc = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("_sv")
    ).agg(F.count(F.lit(1)).alias("_n"))
    per_cls = vc.groupBy(*qi_cols).agg(
        F.sum("_n").alias("class_size"),
        F.count(F.lit(1)).alias("distinct_l"),
        # H = ln(N) - (1/N)·Σ n·ln(n): exact-integer inner sums, one
        # divide — the decomposition avoids forming p = n/N per row
        F.sum(
            F.col("_n").cast("double") * F.log(F.col("_n").cast("double"))
        ).alias("_nlogn"),
    )
    n = F.col("class_size").cast("double")
    h = F.log(n) - F.col("_nlogn") / n
    ent = F.round(F.exp(h), round_digits) + 0.0
    return per_cls.select(
        *qi_cols,
        "class_size",
        "distinct_l",
        ent.alias("entropy_l"),
        (F.col("distinct_l") >= l).alias("distinct_ok"),
        (ent >= F.lit(float(l))).alias("entropy_ok"),
    ).orderBy(*qi_cols)


def l_diversity_oracle_sql(
    table: str,
    qi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    round_digits: int = 6,
) -> str:
    """DuckDB twin — identical grouping, the same ln-decomposed
    entropy expression tree, same rounding."""
    qi = ", ".join(qi_cols)
    return f"""
    WITH vc AS (
        SELECT {qi}, {sensitive_col} AS sv, count(*) AS n
        FROM {table} GROUP BY {qi}, {sensitive_col}
    ), per_cls AS (
        SELECT {qi},
               CAST(sum(n) AS BIGINT) AS class_size,
               count(*) AS distinct_l,
               sum(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS nlogn
        FROM vc GROUP BY {qi}
    )
    SELECT {qi}, class_size, distinct_l,
           round(exp(ln(CAST(class_size AS DOUBLE))
                     - nlogn / CAST(class_size AS DOUBLE)),
                 {round_digits}) + 0.0 AS entropy_l,
           distinct_l >= {l} AS distinct_ok,
           round(exp(ln(CAST(class_size AS DOUBLE))
                     - nlogn / CAST(class_size AS DOUBLE)),
                 {round_digits}) + 0.0 >= {float(l)!r} AS entropy_ok
    FROM per_cls ORDER BY {qi}
    """
