"""Distributed sketches with cross-engine bit parity.

Spark ships ``approx_count_distinct`` (HLL++) and DuckDB ships
``approx_distinct``, but their internals differ, so a differential
oracle can never check one against the other. These operators instead
implement the sketch ALGORITHM as portable relational algebra —
md5-derived integer hashing (functions/hashing.md5_hash_pair), exact
integer register math, one float formula at the very end — so the
same definition runs on both engines and hash-matches.

Structurally each sketch is the scale-correct shape: a single
hash-aggregate over the raw data producing a FIXED-SIZE register
table (2^p rows for HLL, d×w for Count-Min) regardless of input
size, with map-side partial aggregation doing most of the work before
the shuffle. Register tables are mergeable (max for HLL, sum for CM)
— union two register tables and re-aggregate to sketch a union of
datasets, the property that makes sketches work on 100 TB.

HyperLogLog here is the classic Flajolet-Fortin-Gandouet-Meunier
estimator (alpha_m · m² / Σ2^-M_j with linear counting below 2.5m),
not the HLL++ bias-corrected variant: every branch is reproducible in
plain SQL, which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.hashing import md5_hash_pair

__all__ = [
    "hll_estimate_from_registers",
    "hll_merge",
    "hll_registers",
    "hll_count_distinct",
    "HLL_ORACLE_TEMPLATE",
    "count_min_registers",
    "count_min_estimate",
    "CM_SLOT_SQL",
    "bloom_bits",
    "bloom_membership",
    "kmv_registers",
    "kmv_distinct",
    "kmv_theta",
    "KMV_FRAC_SQL",
]


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(
    df: DataFrame, col: str, p: int = 10, keys: list[str] | None = None
) -> DataFrame:
    """Per-group HLL register table: ``keys + (bucket, m)`` with at
    most 2^p rows per group. bucket = h1 mod 2^p; register value =
    max over values of (29 - bitlength(h2)) — leading zeros of the
    28-bit h2 plus one. All integer ops; ``conv(h2, 10, 2)`` is the
    portable bit-length (DuckDB: ``length(bin(h2))``)."""
    keys = keys or []
    m = 1 << p
    h1, h2 = md5_hash_pair(F.col(col).cast("string"))
    rho = F.lit(29) - F.length(F.conv(h2.cast("string"), 10, 2))
    return (
        df.select(*keys, (h1 % m).alias("bucket"), rho.alias("rho"))
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate_from_registers(
    regs: DataFrame,
    p: int = 10,
    keys: list[str] | None = None,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """FFGM estimate from a register table (the second half of
    :func:`hll_count_distinct`, exposed so MERGED registers — see
    :func:`hll_merge` — can be estimated with the identical
    expression tree)."""
    keys = keys or []
    m = 1 << p
    agg = regs.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("_s_nonempty"),
        F.count("*").alias("_nonempty"),
    )
    zeros = F.lit(m) - F.col("_nonempty")
    s = F.col("_s_nonempty") + zeros.cast("double")
    raw = F.lit(_alpha(m) * m * m) / s
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return agg.select(*keys, F.round(est, 4).alias(out_col))


def hll_merge(
    regs: DataFrame, group_keys: list[str] | None = None
) -> DataFrame:
    """Merge register tables by max-per-bucket — HLL's defining
    property (max is associative/commutative/idempotent), which is
    what makes the sketch shardable across a cluster: union the
    per-shard register tables, one bucket-keyed max aggregate.
    ``group_keys`` are the OUTPUT keys to keep (drop the shard key to
    merge everything)."""
    group_keys = group_keys or []
    return regs.groupBy(*group_keys, "bucket").agg(
        F.max("m_j").alias("m_j")
    )


def hll_count_distinct(
    df: DataFrame,
    col: str,
    p: int = 10,
    keys: list[str] | None = None,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate distinct ``col`` per ``keys`` group (std error
    ~1.04/sqrt(2^p), ~3.3% at p=10). Two hash aggregates: raw →
    registers (fixed 2^p rows/group), registers → one row/group."""
    regs = hll_registers(df, col, p=p, keys=keys)
    return hll_estimate_from_registers(regs, p=p, keys=keys, out_col=out_col)


# DuckDB mirror of the full pipeline; format with src (a FROM-able
# relation aliased t with columns {col} and {keys}), col, keys
# (comma-separated, may be ''), p-derived constants.
def HLL_ORACLE_TEMPLATE(
    src: str, col: str, keys: list[str], p: int = 10, out_col: str = "approx_distinct"
) -> str:
    m = 1 << p
    alpha = _alpha(m)
    ksel = ", ".join(keys)
    kpre = f"{ksel}, " if keys else ""
    return f"""
    WITH hashed AS (
      SELECT {kpre}
             ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 7))::BIGINT % {m} AS bucket,
             29 - length(bin(('0x' || substr(md5(CAST({col} AS VARCHAR)), 8, 7))::BIGINT)) AS rho
      FROM {src}
    ),
    regs AS (
      SELECT {kpre}bucket, max(rho) AS m_j FROM hashed GROUP BY {kpre}bucket
    ),
    agg AS (
      SELECT {kpre}sum(power(2.0, -m_j)) AS s_nonempty, count(*) AS nonempty
      FROM regs{f" GROUP BY {ksel}" if keys else ""}
    )
    SELECT {kpre}
           round(CASE WHEN CAST({alpha!r} AS DOUBLE) * {m} * {m}
                          / (s_nonempty + ({m} - nonempty)) <= 2.5 * {m}
                       AND {m} - nonempty > 0
                 THEN {m} * ln(CAST({m} AS DOUBLE) / ({m} - nonempty))
                 ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m}
                      / (s_nonempty + ({m} - nonempty))
                 END, 4) AS {out_col}
    FROM agg
    """


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def count_min_registers(
    df: DataFrame, col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Count-Min sketch of ``col``'s frequency distribution: a fixed
    d×w counter table ``(row, slot, cnt)``. Each value increments one
    counter per row, at slot ``perm_row(h1, h2) mod w`` using the same
    seeded 2-universal family as MinHash (portable integer math).

    One explode (d rows per input value, d is 4-8) into one hash
    aggregate with map-side combine: the shuffle carries at most d×w
    rows per map partition regardless of input size. Sketches built on
    disjoint data merge by summing counters."""
    from computer_vision_foundations_spark.functions.hashing import double_hash

    h1, h2 = md5_hash_pair(F.col(col).cast("string"))
    hashed = df.select(h1.alias("_h1"), h2.alias("_h2"))
    slots = [
        F.struct(
            F.lit(i).alias("row"),
            (double_hash(F.col("_h1"), F.col("_h2"), i) % w).alias("slot"),
        )
        for i in range(d)
    ]
    return (
        hashed.select(F.explode(F.array(*slots)).alias("rs"))
        .groupBy(F.col("rs.row").alias("row"), F.col("rs.slot").alias("slot"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_estimate(
    registers: DataFrame,
    items: DataFrame,
    col: str,
    d: int = 4,
    w: int = 1024,
    out_col: str = "cm_estimate",
) -> DataFrame:
    """Point-frequency estimates for ``items[col]`` from a register
    table: min over the d counters the item hashes to (>= true count
    always; over-count bounded by N·e/w with prob 1-e^-d). The d×w
    register table is tiny and broadcast onto the probe side."""
    from computer_vision_foundations_spark.functions.hashing import double_hash

    h1, h2 = md5_hash_pair(F.col(col).cast("string"))
    slots = [
        F.struct(
            F.lit(i).alias("row"),
            (double_hash(h1, h2, i) % w).alias("slot"),
        )
        for i in range(d)
    ]
    probes = items.select(
        "*", F.explode(F.array(*slots)).alias("rs")
    ).select("*", F.col("rs.row").alias("row"), F.col("rs.slot").alias("slot"))
    return (
        probes.join(F.broadcast(registers), on=["row", "slot"], how="left")
        .groupBy(*items.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col))
    )


def CM_SLOT_SQL(col_sql: str, seed: int, w: int) -> str:
    """DuckDB expression for the row-``seed`` Count-Min slot of
    ``col_sql`` — literal replay of ``double_hash``'s seeded (a, b, c)
    over the md5 28-bit pair."""
    from computer_vision_foundations_spark.functions.hashing import (
        MINHASH_PRIME,
        hash_family_constants,
    )

    a, b, c = hash_family_constants(seed)
    h1 = f"('0x' || substr(md5(CAST({col_sql} AS VARCHAR)), 1, 7))::BIGINT"
    h2 = f"('0x' || substr(md5(CAST({col_sql} AS VARCHAR)), 8, 7))::BIGINT"
    return f"((({a} * {h1} + {b} * {h2} + {c}) % {MINHASH_PRIME}) % {w})"


def _bloom_positions(col, m: int, k: int):
    """The k double-hashed bit positions of a value (Kirsch–
    Mitzenmacher: pos_i = (h1 + i·h2) mod m) as an array column —
    duplicates removed, because membership requires each DISTINCT
    position to be set."""
    h1, h2 = md5_hash_pair(col)
    return F.array_distinct(
        F.array(*[((h1 + F.lit(i) * h2) % m) for i in range(k)])
    )


def bloom_bits(df: DataFrame, col: str, m: int = 65536, k: int = 5) -> DataFrame:
    """Bloom filter over ``df[col]`` as a relational register table:
    the DISTINCT set bit positions (≤ m rows of one int). Mergeable by
    union+distinct — the property that lets a 1000-executor job build
    per-partition filters and OR them. One explode + one distinct
    (hash-agg with map-side partials); sized for broadcast (m=2^16 →
    ≤ 0.5 MB)."""
    return (
        df.select(F.explode(_bloom_positions(F.col(col), m, k)).alias("bit"))
        .distinct()
    )


def bloom_membership(
    df: DataFrame,
    col: str,
    bits: DataFrame,
    keys: list[str],
    m: int = 65536,
    k: int = 5,
    out_col: str = "maybe_member",
) -> DataFrame:
    """``keys + maybe_member`` — true iff every bit position of
    ``df[col]`` is set in ``bits`` (Bloom semantics: no false
    negatives; false-positive rate ~(1-e^{-kn/m})^k). The filter side
    is broadcast; the probe side explodes to ≤ k rows per input and
    re-aggregates on ``keys`` — corpus rows never shuffle their
    payload, only (keys, int) probes."""
    pos = _bloom_positions(F.col(col), m, k)
    probes = df.select(
        *keys, F.size(pos).alias("_need"), F.explode(pos).alias("bit")
    )
    hit = F.broadcast(bits.withColumn("_hit", F.lit(1)))
    return (
        probes.join(hit, "bit", "left")
        .groupBy(*keys, "_need")
        .agg(F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("_got"))
        .select(*keys, (F.col("_got") == F.col("_need")).alias(out_col))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum values / bottom-k theta) distinct sketch
# ---------------------------------------------------------------------------
# The third classic mergeable sketch next to HLL (distinct counts) and
# Count-Min (frequencies): keep the k SMALLEST hash values of a set
# (Bar-Yossef et al. 2002; the Theta sketch of Dasgupta et al. 2016).
# Unlike HLL, the retained hash SAMPLE supports set algebra — union by
# re-taking the bottom-k of the merged sample, intersection/Jaccard by
# counting shared hashes inside the merged bottom-k — which is what
# cross-corpus overlap estimation needs. md5 hex ordering is identical
# in Spark and DuckDB (lowercase, fixed 32 chars), and the fraction
# uses the first 13 hex digits (52 bits — exactly a double mantissa),
# so every estimate is bit-reproducible across engines.


def kmv_theta(hash_col) -> "F.Column":
    """Normalized position of an md5 hex string in [0, 1): first 13
    hex digits over 16^13 (exact in a double; 16^13 = 2^52)."""
    return F.conv(F.substring(hash_col, 1, 13), 16, 10).cast(
        "long"
    ) / F.lit(float(16**13))


def KMV_FRAC_SQL(hash_sql: str) -> str:
    """DuckDB twin of :func:`kmv_theta`."""
    return f"(('0x' || substr({hash_sql}, 1, 13))::BIGINT / {float(16**13)!r})"


def kmv_registers(
    df: DataFrame, col: str, k: int = 256, keys: list[str] | None = None
) -> DataFrame:
    """Per-group KMV sketch as a relational register table:
    ``keys + (pos, h)`` — the ``k`` smallest distinct md5 hashes of
    ``col``, 1-based ``pos`` in hash order. Mergeable: the sketch of a
    union is the bottom-k of the concatenated register tables (dedup +
    re-rank), so per-partition/per-day sketches compose without
    touching raw data again. Cost: one distinct on a narrow
    (keys, 16-byte) projection with map-side partials, then a per-group
    top-k window over ≤ |distinct| rows."""
    keys = keys or []
    h = F.md5(F.col(col).cast("string"))
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy("h")
    return (
        # NULL values hash to NULL, which Spark's window would rank
        # FIRST (nulls-first asc) while SQL engines rank it last —
        # exclude NULLs entirely: a NULL is not a set member
        df.where(F.col(col).isNotNull())
        .select(*keys, h.alias("h"))
        .distinct()
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
    )


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 256,
    keys: list[str] | None = None,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Approximate distinct ``col`` per group (relative error
    ~1/sqrt(k-2)): exact when the group holds fewer than ``k``
    distinct values (the sketch saw everything), else the KMV
    estimator (k-1)/theta_k."""
    keys = keys or []
    regs = kmv_registers(df, col, k=k, keys=keys)
    agg = regs.groupBy(*keys).agg(
        F.count("*").alias("_n"),
        F.max(F.when(F.col("pos") == k, kmv_theta(F.col("h")))).alias(
            "_theta"
        ),
    )
    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / F.col("_theta")
    )
    return agg.select(*keys, F.round(est, 4).alias(out_col))
