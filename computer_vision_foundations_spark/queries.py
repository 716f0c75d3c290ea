"""Query registry: every implemented operator as (PySpark impl, DuckDB oracle).

This is the engine's differential-test surface (SURVEY §5): each entry
pairs a DataFrame pipeline built from the package's operators with an
ANSI-SQL equivalent the driver runs on DuckDB over the same parquet
tables. Column names and types are aligned on both sides; floating
aggregates are rounded identically so order-insensitive value hashes
match across engines.

Conventions:
- every callable takes ``(spark, sf_dir)`` and returns a DataFrame
- every computed column is aliased identically in Spark and SQL
- sums rounded to 2, averages to 4, ratios/similarities to 6 digits
- deterministic total order is never required (driver hash is
  order-insensitive) but ties in top-k/rank are always broken by id
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.filename import with_parsed_filename
from computer_vision_foundations_spark.functions.text import (
    STOPWORDS,
    language_score_columns,
    quality_columns,
)
from computer_vision_foundations_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_from_hashes,
)
from computer_vision_foundations_spark.operators.score import score_with
from computer_vision_foundations_spark.operators.similarity import brute_force_knn
from computer_vision_foundations_spark.operators.split import (
    deterministic_split,
    train_test_split,
)
from computer_vision_foundations_spark.sources.tables import load_table
from computer_vision_foundations_spark.streaming.windows import (
    sessionized,
    tumbling_counts,
)

QuerySpec = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QuerySpec] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn: QuerySpec) -> QuerySpec:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, QuerySpec]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.2-§2.6)
# ---------------------------------------------------------------------------


@_register(
    "q78_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q78_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan→filter→hash-agg; partial aggregation map-side,
    one shuffle on the 2-column group key. Filter and the 7-column
    projection push down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_register(
    "q02_class_balance_split",
    """
    SELECT CASE WHEN o_orderkey % 100 < 80 THEN 'train' ELSE 'test' END AS eval_set,
           o_orderkey % 2 AS label,
           count(*) AS instances
    FROM orders
    GROUP BY 1, 2
    """,
)
def q02_class_balance_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's train/test class-balance sanity query
    (`03a_Model Training.py:74-96`) — deterministic stratified split →
    left-anti-join complement → union → grouped count. Exercises SA1
    (as deterministic split), J1 (anti join), U1 (union), A1 (agg)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "label", F.pmod(F.col("o_orderkey"), F.lit(2))
    )
    tagged = deterministic_split(orders, "o_orderkey", train_pct=80)
    train = tagged.filter(F.col("eval_set") == "train").drop("eval_set")
    # complement via anti join, exactly the reference's idiom
    test = orders.join(train.select("o_orderkey"), on="o_orderkey", how="left_anti")
    unioned = train.select(F.lit("train").alias("eval_set"), "label").unionByName(
        test.select(F.lit("test").alias("eval_set"), "label")
    )
    return unioned.groupBy("eval_set", "label").agg(
        F.count(F.lit(1)).alias("instances")
    )


@_register(
    "q79_top_revenue_orders",
    """
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q79_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + total-order top-k. Ties on rounded revenue break on
    o_orderkey so LIMIT is deterministic cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@_register(
    "q75_region_revenue",
    """
    SELECT r_name, n_name, round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    GROUP BY r_name, n_name
    """,
)
def q75_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast of the small dims — at 100 TB
    the fact side never shuffles for the dim joins."""
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@_register(
    "q80_customer_order_profile",
    """
    SELECT c_mktsegment,
           count(DISTINCT c.c_custkey)            AS n_customers,
           count(o.o_orderkey)                    AS n_orders,
           round(sum(coalesce(o.o_totalprice, 0)), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def q80_customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers + distinct agg."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias(
                "total_spend"
            ),
        )
    )


@_register(
    "q51_semi_anti_customers",
    """
    SELECT
      (SELECT count(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_active,
      (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_inactive
    """,
)
def q51_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) and left-anti (NOT EXISTS) joins."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    active = c.join(o, on="c_custkey", how="left_semi").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    inactive = c.join(o, on="c_custkey", how="left_anti").agg(
        F.count(F.lit(1)).alias("n_inactive")
    )
    return active.crossJoin(inactive)


@_register(
    "q81_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def q81_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window row_number top-N per group (the reference's 'latest run'
    pattern, SURVEY §2.5 W1, as a relational operator)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@_register(
    "q76_events_running_window",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
             AS running_value,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_type
    FROM events
    """,
)
def q76_events_running_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag over an event stream (ordered window frame)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            4,
        ).alias("running_value"),
        F.lag("event_type").over(w).alias("prev_type"),
    )


@_register(
    "q52_distinct_aggs",
    """
    SELECT count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def q52_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@_register(
    "q53_rollup_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q53_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "q54_cube_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           round(sum(o_totalprice), 2) AS total, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q54_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "q55_setops_customers",
    """
    SELECT 'both' AS tag, count(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'only_highbal' AS tag, count(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      EXCEPT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'either' AS tag, count(*) AS n FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      UNION SELECT o_custkey FROM orders)
    """,
)
def q55_setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union(distinct) — SURVEY §2.5 set ops."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").cast("long").alias("k"))
    )
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    both = c.intersect(o).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("tag"), "n"
    )
    only = c.subtract(o).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_highbal").alias("tag"), "n"
    )
    either = c.union(o).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("either").alias("tag"), "n"
    )
    return both.unionByName(only).unionByName(either)


@_register(
    "q56_filename_parse",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') || '_dev_' || (o_custkey % 10)
             || '_' || (o_orderkey % 2) || '.jpg'               AS file_name,
           strftime(o_orderdate, '%Y-%m-%d')                    AS date,
           'dev_' || (o_custkey % 10)                           AS device_id,
           CAST(o_orderkey % 2 AS INT)                          AS label
    FROM orders
    """,
)
def q56_filename_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's filename-parse stage (`02_Data Ingest.py:93-100`)
    verified end-to-end: synthesize `<ts>_<device>_<label>.jpg` paths
    from orders, run the parse operator, emit the parsed columns. The
    oracle reconstructs the expected values directly."""
    o = load_table(spark, sf_dir, "orders")
    path = F.concat(
        F.lit("/landing/"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.lit("_dev_"),
        F.pmod(F.col("o_custkey"), F.lit(10)),
        F.lit("_"),
        F.pmod(F.col("o_orderkey"), F.lit(2)),
        F.lit(".jpg"),
    )
    parsed = with_parsed_filename(o.withColumn("path", path))
    return parsed.select(
        "o_orderkey",
        "file_name",
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        "device_id",
        "label",
    )


@_register(
    "q57_conditional_agg",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_discount > 0.05
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
             AS discounted_rev,
           CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
           round(max(l_extendedprice), 2) AS max_price,
           round(min(l_extendedprice), 2) AS min_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q57_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.col("l_extendedprice") * (1 - F.col("l_discount")),
                ).otherwise(F.lit(0.0))
            ),
            2,
        ).alias("discounted_rev"),
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("n_bulk"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
    )


@_register(
    "q58_monthly_orders",
    """
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders GROUP BY 1
    """,
)
def q58_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@_register(
    "q77_events_hourly_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q77_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming tumbling-window operator (streaming/windows.py) run
    in batch mode — F.window('1 hour').start ≡ date_trunc('hour')."""
    e = load_table(spark, sf_dir, "events")
    out = tumbling_counts(e, ts_col="ts", duration="1 hour", group_cols=("event_type",))
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).alias("sum_value"),
    )


@_register(
    "q82_sessionization",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM tagged)
    SELECT user_id, count(DISTINCT session_id) AS n_sessions, count(*) AS n_events
    FROM sess GROUP BY user_id
    """,
)
def q82_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (streaming/windows.sessionized) reduced
    to per-user session counts."""
    e = load_table(spark, sf_dir, "events")
    s = sessionized(e, gap_seconds=1800)
    return s.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@_register(
    "q59_value_share",
    """
    SELECT event_id, event_type,
           round(value / sum(value) OVER (PARTITION BY event_type), 6) AS share
    FROM events
    """,
)
def q59_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered analytic window: each event's share of its type total."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    return e.select(
        "event_id",
        "event_type",
        F.round(F.col("value") / F.sum("value").over(w), 6).alias("share"),
    )


@_register(
    "q60_status_pivot",
    """
    SELECT o_orderpriority,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_total,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS filled_total,
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS partial_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def q60_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (portable form of
    df.groupBy().pivot())."""
    o = load_table(spark, sf_dir, "orders")

    def tot(status: str):
        return F.round(
            F.sum(
                F.when(F.col("o_orderstatus") == status, F.col("o_totalprice")).otherwise(
                    F.lit(0.0)
                )
            ),
            2,
        )

    return o.groupBy("o_orderpriority").agg(
        tot("O").alias("open_total"),
        tot("F").alias("filled_total"),
        tot("P").alias("partial_total"),
    )


@_register(
    "q61_stats_by_flag",
    """
    SELECT l_returnflag,
           round(median(l_quantity), 4) AS med_qty,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(min(l_quantity), 2) AS min_qty,
           round(max(l_quantity), 2) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q61_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 4).alias("med_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.min("l_quantity"), 2).alias("min_qty"),
        F.round(F.max("l_quantity"), 2).alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# Dedup / text analysis / similarity (north-star, SURVEY §2.10)
# ---------------------------------------------------------------------------


@_register(
    "q83_dedup_exact",
    """
    SELECT md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS n_dupes
    FROM documents GROUP BY 1
    """,
)
def q83_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via canonical-text md5 fingerprint (operators/dedup)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_duplicates(docs, "text", "doc_id", canonicalize=True)


@_register(
    "q66_text_quality",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_measured,
           round((length(text) - (len(string_split(text, ' ')) - 1))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS avg_token_len,
           round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                 / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
           round(len(list_filter(string_split(text, ' '),
                     x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                 / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS en_stopword_ratio
    FROM documents
    """,
)
def q66_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score columns (token stats, punctuation, stopword ratio)."""
    docs = load_table(spark, sf_dir, "documents")
    out = quality_columns(docs, "text")
    return out.select(
        "doc_id",
        "n_tokens",
        "n_chars_measured",
        F.round("avg_token_len", 4).alias("avg_token_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("en_stopword_ratio", 6).alias("en_stopword_ratio"),
    )


def _lang_score_sql(words: list[str]) -> str:
    lst = ",".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(string_split(text, ' '), x -> list_contains([{lst}], x)))"
        " / CAST(len(string_split(text, ' ')) AS DOUBLE)"
    )


@_register(
    "q62_language_guess",
    f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql(STOPWORDS['de'])} AS score_de,
             {_lang_score_sql(STOPWORDS['en'])} AS score_en,
             {_lang_score_sql(STOPWORDS['es'])} AS score_es,
             {_lang_score_sql(STOPWORDS['fr'])} AS score_fr
      FROM documents)
    SELECT lang, lang_guess, count(*) AS n FROM (
      SELECT doc_id, lang,
             CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
                  WHEN score_fr = greatest(score_de, score_en, score_es, score_fr) THEN 'fr'
                  WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
                  WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
                  ELSE 'de' END AS lang_guess
      FROM scored) t
    GROUP BY lang, lang_guess
    """,
)
def q62_language_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID vs the labeled lang column —
    confusion-matrix counts."""
    docs = load_table(spark, sf_dir, "documents")
    out = language_score_columns(docs, "text")
    return out.groupBy("lang", "lang_guess").agg(F.count(F.lit(1)).alias("n"))


_SHINGLES_SQL = """
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 2, 1) + 1),
               i -> array_to_string(string_split(text,' ')[i:i+2], '|'))) AS shingles
      FROM documents
"""


@_register(
    "q90_ngram_jaccard_pairs",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS shingle FROM sh),
    exf AS (SELECT * FROM ex
            QUALIFY count(*) OVER (PARTITION BY shingle) <= 100)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(count(*) / CAST(a.sz + b.sz - count(*) AS DOUBLE), 6) AS jaccard
    FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
    HAVING count(*) / CAST(a.sz + b.sz - count(*) AS DOUBLE) >= 0.1
    """,
)
def q90_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-duplicate pairs (operators/dedup), with
    the hot-shingle skew cap on in the measured path (the QUALIFY
    mirrors the operator's broadcast anti-join of stop-shingles)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.1, max_shingle_freq=100,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


def _minhash_perm_sql(seed: int) -> str:
    """DuckDB twin of functions/hashing.double_hash over md5_hash_pair:
    ``(a·h1 + b·h2 + c) mod p`` with h1/h2 = 28-bit slices of one md5
    and (a, b, c) the same seeded constants the Spark side uses."""
    from computer_vision_foundations_spark.functions.hashing import (
        hash_family_constants,
    )

    a, b, c = hash_family_constants(seed)
    return (
        "list_min(list_transform(shingles, s -> "
        f"({a} * CAST(('0x' || substr(md5(s),1,7)) AS BIGINT) "
        f"+ {b} * CAST(('0x' || substr(md5(s),8,7)) AS BIGINT) "
        f"+ {c}) % 2147483647))"
    )


@_register(
    "q63_minhash_signatures",
    f"""
    WITH sh AS ({_SHINGLES_SQL})
    SELECT doc_id,
           array_to_string([
             {", ".join(_minhash_perm_sql(s) for s in range(8))}
           ], ',') AS signature_key
    FROM sh
    """,
)
def q63_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (portable md5 double-hash family) —
    bit-identical across engines, emitted as one joined string column."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        docs, "text", "doc_id", k=3, n_hashes=8, hash_fn="md5",
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    return sigs.select(
        "doc_id",
        F.array_join(
            F.transform("signature", lambda x: x.cast("string")), ","
        ).alias("signature_key"),
    )


@_register(
    "q26_lsh_candidate_pairs",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sig AS (
      SELECT doc_id, [
        {", ".join(_minhash_perm_sql(s) for s in range(8))}
      ] AS sig FROM sh),
    banded AS (
      SELECT doc_id, 0 AS band_idx, array_to_string(sig[1:2], ',') AS band_key FROM sig
      UNION ALL
      SELECT doc_id, 1, array_to_string(sig[3:4], ',') FROM sig
      UNION ALL
      SELECT doc_id, 2, array_to_string(sig[5:6], ',') FROM sig
      UNION ALL
      SELECT doc_id, 3, array_to_string(sig[7:8], ',') FROM sig),
    capped AS (SELECT * FROM banded
               QUALIFY count(*) OVER (PARTITION BY band_idx, band_key) <= 1000)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM capped a JOIN capped b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
     AND a.doc_id < b.doc_id
    """,
)
def q26_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding: candidate pairs sharing ≥1 of 4 bands of an
    8-hash signature (operators/dedup.minhash_lsh_candidate_pairs),
    with the hot-bucket cap on (mirrored by the oracle's QUALIFY)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidate_pairs(
        docs,
        "text",
        "doc_id",
        k=3,
        n_hashes=8,
        bands=4,
        hash_fn="md5",
        max_bucket_size=1_000,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


@_register(
    "q27_knn_cosine",
    """
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5)
    SELECT probe_id, neighbor_id, cos_sim, rank FROM (
      SELECT p.probe_id, e.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(p.pv AS DOUBLE[])), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                     CAST(p.pv AS DOUBLE[])), 6) DESC,
                        e.vec_id) AS rank
      FROM embeddings e CROSS JOIN probes p
      WHERE e.vec_id <> p.probe_id) t
    WHERE rank <= 10
    """,
)
def q27_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact top-10 cosine neighbors for probes vec_id<5
    (operators/similarity.brute_force_knn): broadcast probes, JVM-side
    vector math, single window shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return brute_force_knn(emb, probes, k=10)


@_register(
    "q91_embedding_near_dup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.5
    """,
)
def q91_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-duplicates blocked by label (the block
    column stands in for an LSH bucket at scale)."""
    from computer_vision_foundations_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_duplicates(
        emb, "embedding", "vec_id", block_col="label", threshold=0.5
    )


@_register(
    "q64_scored_documents",
    """
    SELECT doc_id, round(length(text) / 1000.0, 6) AS score
    FROM documents
    """,
)
def q64_scored_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scoring operator (operators/score.score_with — reference U3
    semantics: Arrow-batched iterator UDF, struct input, base64
    sniffing) with a deterministic byte-length model so the result is
    SQL-checkable."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "content", F.col("text").cast("binary")
    )
    scored = score_with(
        docs,
        lambda pdf: pdf["content"].map(lambda b: len(b) / 1000.0),
        input_cols=["content"],
    )
    return scored.select("doc_id", F.round("score", 6).alias("score"))


# ---------------------------------------------------------------------------
# Rows-only entries (no SQL oracle — driver records weaker check)
# ---------------------------------------------------------------------------


@_register("q65_sampleby_split")
def q65_sampleby_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded sampleBy stratified split (reference SA1/J1 semantics,
    `03a_Model Training.py:74-96`). Sampling PRNGs differ per engine so
    this entry is rows-only; the complement/determinism properties are
    pytest-verified in tests/test_split.py."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "label", F.pmod(F.col("o_orderkey"), F.lit(2))
    )
    train, test = train_test_split(o, "label", "o_orderkey", 0.8, seed=42)
    return (
        train.select(F.lit("train").alias("eval_set"), "label")
        .unionByName(test.select(F.lit("test").alias("eval_set"), "label"))
        .groupBy("eval_set", "label")
        .agg(F.count(F.lit(1)).alias("instances"))
        .orderBy("eval_set", "label")
    )


def _simhash_oracle_sql(bits: int = 32) -> str:
    """DuckDB twin of the portable-md5 SimHash: one 56-bit hash per
    distinct token (two 28-bit md5 slices, same parse as
    functions/hashing.md5_hash_pair), then per-bit majority votes."""
    hash_expr = (
        "CAST(('0x' || substr(md5(t), 1, 7)) AS BIGINT) * 268435456 "
        "+ CAST(('0x' || substr(md5(t), 8, 7)) AS BIGINT)"
    )
    bit_terms = " + ".join(
        f"CASE WHEN 2 * len(list_filter(hs, h -> (h >> {i}) & 1 = 1)) >= len(hs) "
        f"THEN {2 ** i} ELSE 0 END"
        for i in range(bits)
    )
    return f"""
    WITH toked AS (
      SELECT doc_id,
             list_transform(list_distinct(string_split(text, ' ')),
                            t -> {hash_expr}) AS hs
      FROM documents
    )
    SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM toked
    """


@_register("q92_simhash", _simhash_oracle_sql())
def q92_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints over the PORTABLE md5 hash family (two
    28-bit slices of one digest per distinct token, combined to a
    56-bit hash; operators/dedup.simhash_from_hashes does the bit
    votes) — the same construction as the MinHash oracle path, so the
    32-bit fingerprints are value-hash-checked bit-for-bit against
    DuckDB. The xxhash64 variant (simhash_column) remains the
    engine-internal scale default and is pytest-covered."""
    docs = load_table(spark, sf_dir, "documents")
    tok = F.array_distinct(F.split("text", " "))
    d = lambda t: F.md5(t.cast("binary"))
    hashed = docs.select(
        "doc_id",
        F.transform(
            tok,
            lambda t: F.conv(F.substring(d(t), 1, 7), 16, 10).cast("long")
            * F.lit(268435456).cast("long")
            + F.conv(F.substring(d(t), 8, 7), 16, 10).cast("long"),
        ).alias("_hashes"),
    )
    return hashed.select(
        "doc_id", simhash_from_hashes("_hashes", bits=32).alias("simhash")
    )


@_register(
    "q22_image_statistics",
    """
    WITH chars AS (
        SELECT doc_id, ord(u.c) AS v
        FROM documents, unnest(string_split(text, '')) u(c)
        WHERE length(text) >= 9
    ), hist AS (
        SELECT doc_id, v, count(*) AS c FROM chars GROUP BY doc_id, v
    ), tot AS (
        SELECT doc_id, sum(c) AS n,
               round(sum(v * c) / sum(c), 6)   AS mean_band0,
               CAST(min(v) AS BIGINT)          AS min_band0,
               CAST(max(v) AS BIGINT)          AS max_band0
        FROM hist GROUP BY doc_id
    ), med AS (
        SELECT h.doc_id, CAST(min(h.v) AS BIGINT) AS median_band0
        FROM (SELECT doc_id, v,
                     sum(c) OVER (PARTITION BY doc_id ORDER BY v) AS cum
              FROM hist) h
        JOIN tot t ON t.doc_id = h.doc_id
        WHERE h.cum > t.n // 2
        GROUP BY h.doc_id
    ), ent AS (
        SELECT h.doc_id,
               round(-sum((h.c * 1.0 / t.n) * log2(h.c * 1.0 / t.n)), 6) AS entropy
        FROM hist h JOIN tot t ON t.doc_id = h.doc_id
        GROUP BY h.doc_id
    ), jchars AS (
        -- JPEG fixture: first 9 bytes as flat 8x8 blocks; each byte
        -- appears 64x in the decoded image, so stats over the 9 chars
        -- equal stats over the pixels (the uniform 64x multiplicity
        -- cancels in mean/median/entropy/extrema).
        SELECT doc_id, ord(u.c) AS v
        FROM documents, unnest(string_split(substr(text, 1, 9), '')) u(c)
        WHERE length(text) >= 9
    ), jhist AS (
        SELECT doc_id, v, count(*) AS c FROM jchars GROUP BY doc_id, v
    ), jtot AS (
        SELECT doc_id, sum(c) AS n,
               round(sum(v * c) / sum(c), 6)   AS jpeg_mean,
               CAST(min(v) AS BIGINT)          AS jpeg_min,
               CAST(max(v) AS BIGINT)          AS jpeg_max
        FROM jhist GROUP BY doc_id
    ), jmed AS (
        SELECT h.doc_id, CAST(min(h.v) AS BIGINT) AS jpeg_median
        FROM (SELECT doc_id, v,
                     sum(c) OVER (PARTITION BY doc_id ORDER BY v) AS cum
              FROM jhist) h
        JOIN jtot t ON t.doc_id = h.doc_id
        WHERE h.cum > t.n // 2
        GROUP BY h.doc_id
    ), jent AS (
        SELECT h.doc_id,
               round(-sum((h.c * 1.0 / t.n) * log2(h.c * 1.0 / t.n)), 6) AS jpeg_entropy
        FROM jhist h JOIN jtot t ON t.doc_id = h.doc_id
        GROUP BY h.doc_id
    )
    SELECT t.doc_id, ent.entropy, t.mean_band0, med.median_band0,
           t.min_band0, t.max_band0,
           jent.jpeg_entropy, jtot.jpeg_mean, jmed.jpeg_median,
           jtot.jpeg_min, jtot.jpeg_max
    FROM tot t
    JOIN med ON med.doc_id = t.doc_id
    JOIN ent ON ent.doc_id = t.doc_id
    JOIN jtot ON jtot.doc_id = t.doc_id
    JOIN jmed ON jmed.doc_id = t.doc_id
    JOIN jent ON jent.doc_id = t.doc_id
    """,
)
def q22_image_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-statistics pandas UDF (reference U2 schema,
    `02_Data Ingest.py:242-249`) over REAL image bytes in BOTH
    dependency-free codecs: each document's UTF-8 text becomes (a) a
    1×N grayscale PNG (``encode_text_png``, lossless zlib path) and
    (b) a 24×24 flat-block grayscale JPEG at quality=100
    (``encode_text_jpeg`` — DC-only spectrum + all-ones quant tables
    make the Huffman→dequant→IDCT chain bit-exact). Both are decoded
    by ``get_image_statistics`` (``functions/png.py`` /
    ``functions/jpeg.py``), so the pixel statistics equal byte
    statistics of the text — which the DuckDB oracle computes directly
    from characters (``ord(c) == byte`` on this ASCII corpus). A full
    value-hash differential check of BOTH encode→entropy-decode→stats
    chains. Scale shape: narrow Arrow-batched projections only; no
    shuffle at all."""
    from computer_vision_foundations_spark.functions.image import (
        encode_text_jpeg,
        encode_text_png,
        get_image_statistics,
    )

    # >= 9 serves the 9-byte JPEG fixture; the corpus's minimum text
    # length is 48 chars (TESTDATA), so this excludes NO documents —
    # the PNG chain's coverage is unchanged from its length>0 form.
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 9)
    out = docs.withColumn(
        "statistics", get_image_statistics(encode_text_png(F.col("text")))
    ).withColumn(
        "jstats", get_image_statistics(encode_text_jpeg(F.col("text")))
    )
    return out.select(
        "doc_id",
        F.round("statistics.entropy", 6).alias("entropy"),
        F.round(F.element_at("statistics.mean", 1), 6).alias("mean_band0"),
        F.element_at("statistics.median", 1).cast("long").alias("median_band0"),
        F.element_at(F.element_at("statistics.extrema", 1), 1)
        .cast("long")
        .alias("min_band0"),
        F.element_at(F.element_at("statistics.extrema", 1), 2)
        .cast("long")
        .alias("max_band0"),
        F.round("jstats.entropy", 6).alias("jpeg_entropy"),
        F.round(F.element_at("jstats.mean", 1), 6).alias("jpeg_mean"),
        F.element_at("jstats.median", 1).cast("long").alias("jpeg_median"),
        F.element_at(F.element_at("jstats.extrema", 1), 1)
        .cast("long")
        .alias("jpeg_min"),
        F.element_at(F.element_at("jstats.extrema", 1), 2)
        .cast("long")
        .alias("jpeg_max"),
    )


# ---------------------------------------------------------------------------
# LSH ANN with a full differential oracle (VERDICT r01 item 7)
# ---------------------------------------------------------------------------

_LSH_DIM, _LSH_PLANES, _LSH_TABLES, _LSH_SEED = 64, 8, 2, 42


def _lsh_oracle_sql() -> str:
    """Replay the seeded random hyperplanes of ``lsh_bucketed_knn`` as
    DuckDB literals (same trick as q25's seeded MinHash): bucket id =
    bit vector of sign(v . plane_i), candidates = same-(table, bucket)
    pairs, then exact cosine + per-probe top-10. Dot products run in
    f64 on both engines, so bucket assignment only diverges if a dot
    product sits within float noise of zero (measure-zero for gaussian
    planes)."""
    from computer_vision_foundations_spark.operators.similarity import (
        _random_planes,
    )

    arms = []
    for t in range(_LSH_TABLES):
        planes = _random_planes(_LSH_DIM, _LSH_PLANES, _LSH_SEED + t * 7919)
        terms = []
        for i, plane in enumerate(planes):
            lits = ", ".join(repr(x) for x in plane)
            terms.append(
                f"(CASE WHEN list_dot_product(v, [{lits}]) >= 0 "
                f"THEN {2 ** i} ELSE 0 END)"
            )
        bucket = " + ".join(terms)
        arms.append(
            f"SELECT vec_id, v, {t} AS tbl, CAST({bucket} AS BIGINT) AS bucket FROM emb"
        )
    union = "\n      UNION ALL\n      ".join(arms)
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    b AS (
      {union}
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                      p.v AS pv, c.v AS cv
      FROM b p JOIN b c
        ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
      WHERE p.vec_id < 5
    )
    SELECT probe_id, neighbor_id, cos_sim, rank FROM (
      SELECT probe_id, neighbor_id,
             round(list_cosine_similarity(pv, cv), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY probe_id
               ORDER BY round(list_cosine_similarity(pv, cv), 6) DESC,
                        neighbor_id ASC) AS rank
      FROM cand) t
    WHERE rank <= 10
    """


_LSH_FLIPS = 2


def _multiprobe_oracle_sql() -> str:
    """Replay ``multiprobe_lsh_knn``: the q33 construction plus probe-
    side bucket fan-out — flip the ``n_flip`` sign bits with the
    smallest |margin| (stable order on (|dot|, plane index), exactly
    numpy's stable argsort). Corpus arms are unchanged."""
    from computer_vision_foundations_spark.operators.similarity import (
        _random_planes,
    )

    corpus_arms, probe_arms = [], []
    for t in range(_LSH_TABLES):
        planes = _random_planes(_LSH_DIM, _LSH_PLANES, _LSH_SEED + t * 7919)
        dots = ", ".join(
            f"list_dot_product(v, [{', '.join(repr(x) for x in p)}])"
            for p in planes
        )
        base = " + ".join(
            f"(CASE WHEN dots[{i + 1}] >= 0 THEN {2 ** i} ELSE 0 END)"
            for i in range(_LSH_PLANES)
        )
        corpus_arms.append(
            f"""SELECT vec_id, v, {t} AS tbl, base AS bucket FROM (
        SELECT vec_id, v, CAST({base} AS BIGINT) AS base
        FROM (SELECT vec_id, v, [{dots}] AS dots FROM emb) d{t}) c{t}"""
        )
        probe_arms.append(
            f"""SELECT vec_id, v, {t} AS tbl, unnest(
          list_prepend(base, list_transform(
            list_transform(list_sort(list_transform(
                range(1, {_LSH_PLANES + 1}),
                i -> {{'m': abs(dots[i]), 'i': i - 1}})),
              x -> x.i)[1:{_LSH_FLIPS}],
            bb -> xor(base, CAST(1 << bb AS BIGINT))))) AS bucket
        FROM (
          SELECT vec_id, v, dots, CAST({base} AS BIGINT) AS base
          FROM (SELECT vec_id, v, [{dots}] AS dots FROM emb
                WHERE vec_id < 5) pd{t}) p{t}"""
        )
    cu = "\n      UNION ALL\n      ".join(corpus_arms)
    pu = "\n      UNION ALL\n      ".join(probe_arms)
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cb AS (
      {cu}
    ),
    pb AS (
      {pu}
    ),
    cand AS (
      SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
                      p.v AS pv, c.v AS cv
      FROM pb p JOIN cb c
        ON p.tbl = c.tbl AND p.bucket = c.bucket AND p.vec_id <> c.vec_id
    )
    SELECT probe_id, neighbor_id, cos_sim, rank FROM (
      SELECT probe_id, neighbor_id,
             round(list_cosine_similarity(pv, cv), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY probe_id
               ORDER BY round(list_cosine_similarity(pv, cv), 6) DESC,
                        neighbor_id ASC) AS rank
      FROM cand) t
    WHERE rank <= 10
    """


@_register("z32_multiprobe_lsh_ann", _multiprobe_oracle_sql())
def z32_multiprobe_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-10 (operators/similarity.multiprobe_lsh_knn):
    probes additionally visit the 2 neighboring buckets with the
    tightest hyperplane margins — the recall of more tables at the
    index cost of fewer (corpus index unchanged, probe stream fans out
    ×3). Same (table, bucket) equi-join scale shape as q33; the flip
    choice is deterministic, so the oracle replays the whole probe set
    bit-for-bit."""
    from computer_vision_foundations_spark.operators.similarity import (
        multiprobe_lsh_knn,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return multiprobe_lsh_knn(
        emb,
        probes,
        dim=_LSH_DIM,
        k=10,
        n_planes=_LSH_PLANES,
        n_tables=_LSH_TABLES,
        n_flip=_LSH_FLIPS,
        seed=_LSH_SEED,
    )


@_register("z29_lsh_ann", _lsh_oracle_sql())
def z29_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-10 neighbors for probes vec_id<5
    (operators/similarity.lsh_bucketed_knn). The scale path for huge
    probe sets: bucketed equi-join on (table, bucket) — never a cross
    product. The oracle replays the seeded hyperplanes as SQL literals,
    so bucket assignment, candidate generation, and ranking are all
    differentially checked."""
    from computer_vision_foundations_spark.operators.similarity import (
        lsh_bucketed_knn,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return lsh_bucketed_knn(
        emb,
        probes,
        dim=_LSH_DIM,
        k=10,
        n_planes=_LSH_PLANES,
        n_tables=_LSH_TABLES,
        seed=_LSH_SEED,
    )


@_register(
    "q67_training_batches",
    """
    SELECT doc_id,
           least(length(text), 256) AS n_features,
           CAST(list_sum(list_transform(
                 range(1, least(length(text), 256) + 1),
                 i -> ascii(substr(text, i, 1)))) AS BIGINT) AS byte_sum
    FROM documents
    """,
)
def q67_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The U4 batch-transform operator (operators/transform
    .to_training_batches — reference Petastorm TransformSpec,
    `03a_Model Training.py:136-178`) run through its real mapInPandas
    path, reduced to an integer invariant the oracle can replay: the
    decoded feature count and the de-normalized byte sum of each
    feature vector (features are byte/255 in float32; *255 and
    rounding recovers the exact integers)."""
    import numpy as np
    import pandas as pd

    from computer_vision_foundations_spark.operators.transform import (
        default_transform,
        to_training_batches,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "content", F.col("text").cast("binary")
    )

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = default_transform(batch, content_col="content", label_col="label")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_features": [len(f) for f in out["features"]],
                "byte_sum": [
                    int(round(float(np.sum(np.asarray(f, dtype=np.float64) * 255.0))))
                    for f in out["features"]
                ],
            }
        )

    return to_training_batches(
        docs.select("doc_id", "content"),
        transform_fn=fn,
        schema="doc_id long, n_features int, byte_sum long",
    )


@_register("q68_bernoulli_sample")
def q68_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA2: seeded Bernoulli sample (reference `04a_Model
    Deployment.py:313`). Spark's per-partition XORShift sampler is not
    replayable in SQL, so this entry is rows-only; determinism and
    fraction bounds are pytest-verified in tests/test_transform_sinks.py."""
    from computer_vision_foundations_spark.operators.split import bernoulli_sample

    orders = load_table(spark, sf_dir, "orders")
    return bernoulli_sample(orders, 0.1, seed=7).select(
        "o_orderkey", "o_orderstatus"
    )


# ---------------------------------------------------------------------------
# IVF-Flat ANN (inverted-file index, the FAISS-style scale path)
# ---------------------------------------------------------------------------

_IVF_DIM, _IVF_CELLS, _IVF_PROBE_CELLS, _IVF_SEED = 64, 16, 4, 42


def _ivf_oracle_sql() -> str:
    """Replay ``ivf_flat_knn``'s seeded centroids as DuckDB literals:
    per-vector distance array ``||c||² − 2·v·c``, cell = first argmin
    (list_position of list_min, matching Spark's array_position), probe
    fans out to its 4 nearest cells, equi-join on cell, exact cosine +
    per-probe top-10. Distances are f64 with matching summation order
    on both engines."""
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    cents = random_centroids(_IVF_DIM, _IVF_CELLS, _IVF_SEED)
    dists = ", ".join(
        f"({sum(x * x for x in c)!r} - 2.0 * list_dot_product(v, "
        f"[{', '.join(repr(x) for x in c)}]))"
        for c in cents
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    d AS (
      SELECT vec_id, v, [{dists}] AS dists FROM emb
    ),
    assigned AS (
      SELECT vec_id AS neighbor_id, v AS cv,
             CAST(list_position(dists, list_min(dists)) - 1 AS INT) AS cell
      FROM d
    ),
    probe_fan AS (
      SELECT vec_id AS probe_id, v AS pv, i - 1 AS cell, dists[i] AS dist,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY dists[i] ASC, i ASC) AS cell_rank
      FROM d CROSS JOIN generate_series(1, {_IVF_CELLS}) AS t(i)
      WHERE vec_id < 5
    )
    SELECT probe_id, neighbor_id, cos_sim, rank FROM (
      SELECT p.probe_id, a.neighbor_id,
             round(list_cosine_similarity(p.pv, a.cv), 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY round(list_cosine_similarity(p.pv, a.cv), 6) DESC,
                        a.neighbor_id ASC) AS rank
      FROM probe_fan p
      JOIN assigned a ON p.cell = a.cell AND p.probe_id <> a.neighbor_id
      WHERE p.cell_rank <= {_IVF_PROBE_CELLS}) t
    WHERE rank <= 10
    """


@_register("q89_ivf_ann", _ivf_oracle_sql())
def q89_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat approximate top-10 neighbors for probes vec_id<5
    (operators/similarity.ivf_flat_knn). The inverted-file scale path:
    corpus partitioned once by nearest-centroid cell (at 100 TB: the
    bucketing you persist), probes scan only their 4 nearest cells —
    the cell equi-join touches 1/4 of the corpus. Centroids are seeded
    literals so the DuckDB oracle replays assignment, fan-out, and
    ranking exactly."""
    from computer_vision_foundations_spark.operators.similarity import (
        ivf_flat_knn,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    return ivf_flat_knn(
        emb,
        probes,
        dim=_IVF_DIM,
        k=10,
        n_cells=_IVF_CELLS,
        n_probe_cells=_IVF_PROBE_CELLS,
        seed=_IVF_SEED,
    )


# ---------------------------------------------------------------------------
# Rolling-hash fingerprinting + BPE-ish tokenization (training-data ops)
# ---------------------------------------------------------------------------

_WINNOW_K, _WINNOW_W = 5, 8


@_register(
    "q93_winnow_fingerprints",
    f"""
    WITH padded AS (
      SELECT doc_id,
             rpad(text, CAST(greatest(length(text), {_WINNOW_K}) AS INTEGER), chr(0)) AS s
      FROM documents
    ),
    kg AS (
      SELECT doc_id,
             list_transform(
               range(1, length(s) - {_WINNOW_K} + 2),
               i -> (
                 {" + ".join(
                     f"ascii(substring(s, i + {j}, 1)) * {257 ** (_WINNOW_K - 1 - j)}"
                     for j in range(_WINNOW_K)
                 )}
               ) % 2147483647
             ) AS hs
      FROM padded
    ),
    mins AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= {_WINNOW_W} THEN
               list_transform(
                 range(1, len(hs) - {_WINNOW_W} + 2),
                 j -> list_min(list_slice(hs, j, j + {_WINNOW_W - 1})))
             ELSE [list_min(hs)] END AS m
      FROM kg
    )
    SELECT doc_id, unnest(list_distinct(m)) AS fingerprint FROM mins
    """,
)
def q93_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (rolling k-gram hash + min-of-
    window selection, the MOSS scheme) exploded to (doc_id,
    fingerprint) — the join-able form: near-duplicate detection at
    scale is an equi-join on fingerprint. Integer-exact in both
    engines (polynomial hash mod 2^31−1 in int64)."""
    from computer_vision_foundations_spark.functions.text import (
        with_winnow_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = with_winnow_fingerprints(
        docs, "text", k=_WINNOW_K, w=_WINNOW_W, out_col="_fps"
    )
    return fp.select("doc_id", F.explode("_fps").alias("fingerprint"))


def _bpe_pattern_sql_literal() -> str:
    from computer_vision_foundations_spark.functions.text import (
        BPE_ISH_PATTERN,
    )

    return "'" + BPE_ISH_PATTERN.replace("'", "''") + "'"


@_register(
    "q69_token_stats",
    f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, {_bpe_pattern_sql_literal()}))
             AS n_bpe_tokens,
           length(text) AS n_chars_measured
    FROM documents
    """,
)
def q69_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways — whitespace split and a BPE-ish
    pre-tokenizer regex (GPT-2-flavored, dialect-portable core) — the
    cheap cost/length accounting every training-data pipeline runs.
    All-Catalyst (split/regexp_count), whole-stage codegen."""
    from computer_vision_foundations_spark.functions.text import (
        bpe_ish_token_count,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_ws_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


# ---------------------------------------------------------------------------
# Audio / video multimodal plumbing (functions/media.py)
# ---------------------------------------------------------------------------


@_register(
    "q70_video_frame_sample",
    """
    WITH v AS (
      SELECT doc_id, text, length(text) AS len,
             8 + length(text) % 8 AS n_frames
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(i AS DOUBLE) / 24.0 AS ts_sec,
           CAST(CASE WHEN len > 0
                     THEN ascii(substring(text, CAST(i * len // n_frames AS INTEGER) + 1, 1))
                     ELSE 0 END AS INTEGER) AS frame_key
    FROM v CROSS JOIN generate_series(0, 14, 2) AS t(i)
    WHERE i < n_frames
    """,
)
def q70_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling through the real mapInPandas fan-out
    (functions/media.sample_video_frames): every 2nd frame of the fake
    decoder (n_frames = 8 + len mod 8 @ 24 fps; frame key = the byte at
    the frame's offset). The oracle replays the integer byte/offset
    arithmetic over the ASCII payload — plumbing (schema, Arrow batch
    shape, narrow fan-out) is identical to a real codec build."""
    from computer_vision_foundations_spark.functions.media import (
        sample_video_frames,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    return sample_video_frames(docs, "content", "doc_id", every_n=2)


@_register(
    "q71_audio_frame_energy",
    """
    WITH a AS (
      SELECT doc_id, text, length(text) // 64 AS n_windows
      FROM documents
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS window_idx,
           CAST(list_sum(list_transform(
                  range(1, 65),
                  j -> ascii(substring(text, CAST(w * 64 + j AS INTEGER), 1)) - 128
                )) AS BIGINT) AS energy
    FROM a CROSS JOIN generate_series(0, 63) AS t(w)
    WHERE w < n_windows
    """,
)
def q71_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window audio energy through the Arrow-batched fake PCM
    decoder (functions/media.audio_frame_energies): unsigned bytes
    centered at 128, summed over non-overlapping 64-sample windows —
    integer-exact, replayed by the oracle over the ASCII payload."""
    from computer_vision_foundations_spark.functions.media import (
        audio_frame_energies,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("content")
    )
    return docs.select(
        "doc_id",
        F.posexplode(audio_frame_energies(64)(F.col("content"))).alias(
            "window_idx", "energy"
        ),
    ).select(
        "doc_id",
        F.col("window_idx").cast("int").alias("window_idx"),
        "energy",
    )


@_register(
    "q72_tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents
    ),
    toks_f AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    tc AS (
      SELECT doc_id, term, count(*) AS _tc
      FROM toks_f GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, count(*) AS _dl FROM toks_f GROUP BY doc_id),
    dfreq AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tc.doc_id, tc.term,
             round(CAST(tc._tc AS DOUBLE) / dl._dl
                   * (ln((1.0 + n.n_docs) / (1.0 + dfreq.df)) + 1.0),
                   6) AS tfidf
      FROM tc
      JOIN dl ON tc.doc_id = dl.doc_id
      JOIN dfreq ON tc.term = dfreq.term
      CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored) t
    WHERE rank <= 5
    """,
)
def q72_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (functions/text.tfidf_scores —
    SURVEY §2.10's tf-idf as pure DataFrame ops, no mllib): exploded
    hash-aggs keyed on (doc, term)/term, document-frequency table
    broadcast back. Smoothed idf = ln((1+N)/(1+df)) + 1; rounded to 6
    so cross-engine ln noise can't flip ranks (ties break on term)."""
    from computer_vision_foundations_spark.functions.text import (
        tfidf_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = tfidf_scores(docs, "text", "doc_id").select(
        "doc_id", "term", F.round("tfidf", 6).alias("tfidf")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "term", "tfidf", "rank")
    )


@_register(
    "z57_winnow_near_dup_pairs",
    f"""
    WITH padded AS (
      SELECT doc_id,
             rpad(text, CAST(greatest(length(text), {_WINNOW_K}) AS INTEGER), chr(0)) AS s
      FROM documents
    ),
    kg AS (
      SELECT doc_id,
             list_transform(
               range(1, length(s) - {_WINNOW_K} + 2),
               i -> (
                 {" + ".join(
                     f"ascii(substring(s, i + {j}, 1)) * {257 ** (_WINNOW_K - 1 - j)}"
                     for j in range(_WINNOW_K)
                 )}
               ) % 2147483647
             ) AS hs
      FROM padded
    ),
    mins AS (
      SELECT doc_id,
             CASE WHEN len(hs) >= {_WINNOW_W} THEN
               list_transform(
                 range(1, len(hs) - {_WINNOW_W} + 2),
                 j -> list_min(list_slice(hs, j, j + {_WINNOW_W - 1})))
             ELSE [list_min(hs)] END AS m
      FROM kg
    ),
    fps AS (
      SELECT doc_id, list_distinct(m) AS fp, len(list_distinct(m)) AS fp_size
      FROM mins
    ),
    ex0 AS (SELECT doc_id, fp_size, unnest(fp) AS f FROM fps),
    freq AS (SELECT f, count(*) AS c FROM ex0 GROUP BY f),
    ex AS (
      SELECT ex0.doc_id, ex0.fp_size, ex0.f
      FROM ex0 JOIN freq ON ex0.f = freq.f
      WHERE freq.c <= 100
    )
    SELECT id_a, id_b, n_shared,
           round(CAST(n_shared AS DOUBLE) / (size_a + size_b - n_shared), 6)
             AS resemblance
    FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             any_value(a.fp_size) AS size_a, any_value(b.fp_size) AS size_b,
             count(*) AS n_shared
      FROM ex a JOIN ex b ON a.f = b.f AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id) t
    WHERE n_shared >= 2
    """,
)
def z57_winnow_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document near-duplicate pairs by shared winnowing
    fingerprints (operators/dedup.winnow_near_duplicates): local
    substring matching robust to edits/reorderings, as a fingerprint
    equi-join — never an all-pairs product. Resemblance =
    |A∩B|/|A∪B| over the FULL fingerprint sets; the frequency cap
    (here 100 — the synthetic docs are template-generated, so
    boilerplate fingerprints hit most of the corpus) drops
    non-discriminative fingerprints from the join exactly as the
    stop-shingle cap does in q24. The oracle replicates the cap."""
    from computer_vision_foundations_spark.operators.dedup import (
        winnow_near_duplicates,
    )

    docs = load_table(spark, sf_dir, "documents")
    return winnow_near_duplicates(
        docs,
        "text",
        "doc_id",
        k=_WINNOW_K,
        w=_WINNOW_W,
        min_shared=2,
        max_fingerprint_freq=100,
    )


@_register(
    "q84_asof_enrich",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts, value AS click_value
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.click_id, c.click_ts, c.click_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
)
def q84_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment (operators/asof.as_of_join): each
    purchase event picks up the user's most recent click at-or-before
    it — the as-of join the brief names as a required custom operator
    (Spark has no native equivalent; pandas merge_asof / DuckDB ASOF
    JOIN semantics). Union-merge formulation: ONE shuffle on user_id,
    running last(ignorenulls) window, no range self-join. (user_id,
    ts) is unique in the fixture, satisfying the determinism contract.
    """
    from computer_vision_foundations_spark.operators.asof import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    return as_of_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_id", "click_ts", "click_value"],
    ).select(
        "event_id", "user_id", "ts", "value",
        "click_id", "click_ts", "click_value",
    )


@_register(
    "q85_range_join_error_window",
    """
    WITH e AS (
      SELECT event_id AS error_id, ts AS error_ts FROM events
      WHERE event_type = 'error'
    ),
    p AS (
      SELECT event_id AS purchase_id, ts AS purchase_ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT e.error_id, p.purchase_id,
           epoch_us(p.purchase_ts) - epoch_us(e.error_ts) AS gap_us,
           p.value
    FROM e JOIN p
      ON p.purchase_ts >= e.error_ts
     AND p.purchase_ts <= e.error_ts + INTERVAL 5 MINUTE
    """,
)
def q85_range_join_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless range join (operators/ranges.range_join): purchases
    landing within 5 minutes after any error event. Spark's native
    plan for a pure range predicate is BroadcastNestedLoopJoin
    (quadratic); the operator bucketizes time into 300 s buckets,
    explodes each error window into the <=2 buckets it touches, and
    hash-joins on the bucket id with the exact predicate as residual —
    the Flink/Trino interval-join strategy. Gap is exact integer
    microseconds (unix_micros both engines), so the hash needs no
    float discipline."""
    from computer_vision_foundations_spark.operators.ranges import range_join

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("error_ts")
    )
    windows = errors.withColumn(
        "window_end", F.col("error_ts") + F.expr("INTERVAL 5 MINUTE")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "value",
    )
    return range_join(
        purchases,
        windows,
        point="purchase_ts",
        start="error_ts",
        end="window_end",
        bucket_width=300,
    ).select(
        "error_id",
        "purchase_id",
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("error_ts").cast("timestamp"))
        ).alias("gap_us"),
        "value",
    )


@_register(
    "q86_time_rollup",
    """
    WITH g AS (
      SELECT 'hour' AS granularity, date_trunc('hour', ts) AS bucket,
             count(*) AS n_events, round(sum(value), 2) AS sum_value,
             min(value) AS min_value, max(value) AS max_value
      FROM events GROUP BY 2
      UNION ALL
      SELECT 'day', date_trunc('day', ts),
             count(*), round(sum(value), 2), min(value), max(value)
      FROM events GROUP BY 2
      UNION ALL
      SELECT 'month', date_trunc('month', ts),
             count(*), round(sum(value), 2), min(value), max(value)
      FROM events GROUP BY 2
    )
    SELECT granularity, bucket, n_events, sum_value, min_value, max_value
    FROM g
    """,
)
def q86_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup (operators/rollup
    .time_rollup): hour + day + month aggregates in ONE raw-data pass
    — days merge 24 hourly partials, months merge ~30 daily partials,
    so only the hourly agg ever shuffles raw rows. The oracle computes
    each level independently from raw data, which also proves the
    partial-merge is lossless. Sums rounded AFTER the final merge
    (rounding partials would drift); min/max/count are exact."""
    from computer_vision_foundations_spark.operators.rollup import time_rollup

    ev = load_table(spark, sf_dir, "events")
    out = time_rollup(
        ev,
        "ts",
        aggs={
            "n_events": ("event_id", "count"),
            "sum_value": ("value", "sum"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
        granularities=("hour", "day", "month"),
    )
    return out.select(
        "granularity",
        "bucket",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        "min_value",
        "max_value",
    )


def _hll_oracle_sql() -> str:
    from computer_vision_foundations_spark.functions.sketches import (
        HLL_ORACLE_TEMPLATE,
    )

    hll = HLL_ORACLE_TEMPLATE(
        "lineitem", "l_partkey", ["l_returnflag"], p=10
    )
    return f"""
    WITH approx AS ({hll}),
    exact AS (
      SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT e.l_returnflag, e.n_exact, a.approx_distinct,
           round(abs(a.approx_distinct - e.n_exact) / e.n_exact, 4)
             AS rel_err
    FROM exact e JOIN approx a ON e.l_returnflag = a.l_returnflag
    """


@_register("q87_hll_distinct", _hll_oracle_sql())
def q87_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (functions/sketches): same
    md5-derived registers and FFGM estimator on both engines, so the
    approximation itself hash-matches — unlike approx_count_distinct
    vs approx_distinct, whose internals differ. Register sums are
    powers of two (exact in f64 in any order), so the only rounding
    is the final estimate. Reported next to the exact distinct count
    with relative error (~3.3% expected at p=10)."""
    from computer_vision_foundations_spark.functions.sketches import (
        hll_count_distinct,
    )

    li = load_table(spark, sf_dir, "lineitem")
    approx = hll_count_distinct(li, "l_partkey", p=10, keys=["l_returnflag"])
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_exact")
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            "n_exact",
            "approx_distinct",
            F.round(
                F.abs(F.col("approx_distinct") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_err"),
        )
    )


_CM_D, _CM_W = 4, 1024


def _cm_oracle_sql() -> str:
    from computer_vision_foundations_spark.functions.sketches import (
        CM_SLOT_SQL,
    )

    reg_rows = "\n      UNION ALL\n".join(
        f"      SELECT {i} AS row, {CM_SLOT_SQL('term', i, _CM_W)} AS slot FROM toks"
        for i in range(_CM_D)
    )
    probe_rows = "\n      UNION ALL\n".join(
        f"      SELECT term, n_exact, {i} AS row,"
        f" {CM_SLOT_SQL('term', i, _CM_W)} AS slot FROM top_terms"
        for i in range(_CM_D)
    )
    return f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
    ),
    toks_f AS (SELECT term FROM toks WHERE term <> ''),
    regs AS (
      SELECT row, slot, count(*) AS cnt FROM (
{reg_rows.replace("FROM toks", "FROM toks_f")}
      ) GROUP BY row, slot
    ),
    top_terms AS (
      SELECT term, count(*) AS n_exact FROM toks_f GROUP BY term
      ORDER BY n_exact DESC, term ASC LIMIT 10
    ),
    probes AS (
{probe_rows}
    )
    SELECT p.term, p.n_exact, min(r.cnt) AS cm_estimate,
           min(r.cnt) - p.n_exact AS overcount
    FROM probes p JOIN regs r ON p.row = r.row AND p.slot = r.slot
    GROUP BY p.term, p.n_exact
    """


@_register("q88_count_min_heavy_hitters", _cm_oracle_sql())
def q88_count_min_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (functions/sketches): d×w counter
    table built in ONE exploded hash-aggregate, point estimates for
    the exact top-10 tokens via a broadcast join against the (tiny)
    register table. Same seeded 2-universal integer hashing on both
    engines, so estimates — including the overcount — hash-match
    exactly. overcount >= 0 always (CM never undercounts)."""
    from computer_vision_foundations_spark.functions.sketches import (
        count_min_estimate,
        count_min_registers,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    regs = count_min_registers(toks, "term", d=_CM_D, w=_CM_W)
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("term").asc())
        .limit(10)
    )
    est = count_min_estimate(regs, top, "term", d=_CM_D, w=_CM_W)
    return est.select(
        "term",
        "n_exact",
        "cm_estimate",
        (F.col("cm_estimate") - F.col("n_exact")).alias("overcount"),
    )


def _cc_oracle_sql() -> str:
    pairs_sql = _ORACLES["q26_lsh_candidate_pairs"]
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.node
    )
    SELECT node AS doc_id, min(r) AS component,
           node = min(r) AS is_canonical
    FROM reach GROUP BY node
    """


@_register("q94_dedup_clusters", _cc_oracle_sql())
def q94_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-duplicate clusters (operators/components):
    q26's LSH candidate pairs closed under connectivity by iterative
    min-label propagation + pointer jumping, canonical copy = the
    cluster's smallest doc_id. The oracle computes the same closure
    with a recursive CTE over the identical pair set — checking both
    the pair generation AND the clustering."""
    from computer_vision_foundations_spark.operators.components import (
        dedup_clusters,
    )

    pairs = q26_lsh_candidate_pairs(spark, sf_dir)
    return dedup_clusters(pairs)


@_register(
    "q73_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def q73_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (DataFrame.groupingSets, Spark >= 4.0)
    — the general form of q10's rollup / q11's cube, one Expand +
    hash-agg, no repeated scans. Null grouping columns mark the
    subtotal rows identically in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@_register(
    "q74_unpivot_stats",
    """
    WITH wide AS (
      SELECT l_returnflag,
             round(avg(l_quantity), 4)      AS avg_qty,
             round(avg(l_discount), 4)      AS avg_disc,
             round(avg(l_extendedprice), 4) AS avg_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value FROM wide
    UNPIVOT (value FOR metric IN (avg_qty, avg_disc, avg_price))
    """,
)
def q74_unpivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (DataFrame.unpivot): wide per-flag averages to
    long (flag, metric, value) — the inverse of q19's pivot. The
    Expand operator emits one row per metric with zero shuffles
    beyond the feeding aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["avg_qty", "avg_disc", "avg_price"],
        "metric",
        "value",
    )


@_register(
    "z02_json_props",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           round(avg(value), 4) AS avg_value,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def z02_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column (events.props): ``from_json`` with
    an explicit schema — parsed ONCE per row in a single projection,
    then plain relational ops on the extracted field (Catalyst prunes
    unused JSON fields via schema pruning). Oracle uses DuckDB
    json_extract; integer field so no float discipline needed."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.from_json("props", "k BIGINT").alias("p"), "value"
    )
    return (
        parsed.groupBy((F.col("p.k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.max("p.k").alias("max_k"),
        )
    )


@_register(
    "z03_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def z03_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (F.percentile — Spark's exact
    sort-based aggregate, NOT approx_percentile): matches DuckDB
    quantile_cont's linear interpolation bit-for-bit at 4-digit
    rounding. The exact form shuffles per-group values; at 100 TB
    swap in approx_percentile (t-digest) — kept exact here because
    the differential gate demands determinism."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(
                F.percentile("l_extendedprice", F.lit(q)), 4
            ).alias(f"p{int(q * 100):02d}")
            for q in (0.25, 0.50, 0.75, 0.95)
        ]
    )


@_register(
    "z04_exists_decorrelated",
    """
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def z04_exists_decorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape) through the engine's SQL
    surface: Catalyst decorrelates the subquery into a left-semi
    hash join — no per-row subquery execution. Exercises S4/P4 (the
    reference drives everything through SQL expression strings) at
    the query level."""
    from computer_vision_foundations_spark.sources.tables import register_views

    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o.o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o.o_orderpriority
        """
    )


@_register(
    "z05_analytic_windows",
    """
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             round(sum(value), 2) AS day_value
      FROM events GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT user_id, day, day_value,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist()    OVER w, 6) AS cdist,
           round(day_value - lag(day_value, 1) OVER
                 (PARTITION BY user_id ORDER BY day), 2) AS delta_prev
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day_value, day)
    """,
)
def z05_analytic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window battery beyond q07/q08's rank/rolling:
    ntile, percent_rank, cume_dist over a value ordering (day as
    tiebreak — rank functions need a total order for determinism)
    plus lag over a time ordering, all sharing ONE shuffle on
    user_id (two sorts, zero extra exchanges)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    w = Window.partitionBy("user_id").orderBy("day_value", "day")
    wt = Window.partitionBy("user_id").orderBy("day")
    return daily.select(
        "user_id",
        "day",
        "day_value",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(
            F.col("day_value") - F.lag("day_value", 1).over(wt), 2
        ).alias("delta_prev"),
    )


@_register(
    "z06_array_hof_stats",
    """
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) / len(embedding), 6)     AS mean_elem,
           len(list_filter(embedding, x -> x > 0))                 AS n_positive
    FROM embeddings
    """,
)
def z06_array_hof_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over array<float> embeddings:
    aggregate (fold), transform, filter — per-element math without
    ever exploding (no Generate, no row blow-up; see the HOF-inlining
    trap that forbids explode-after-HOF pipelines). Elements cast to
    double BEFORE squaring on both engines so f32→f64 widening order
    can't change the sums; ascending fold matches DuckDB list_sum
    order at 6-digit rounding."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    el_sum = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(el_sum / F.size("embedding"), 6).alias("mean_elem"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


_CHUNK_N, _CHUNK_OV = 32, 8


@_register(
    "z07_chunk_documents",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    st AS (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t) - {_CHUNK_OV}, 1) + 1,
                          {_CHUNK_N - _CHUNK_OV})) AS s
      FROM toks
    )
    SELECT doc_id,
           (s - 1) // {_CHUNK_N - _CHUNK_OV} AS chunk_idx,
           array_to_string(list_slice(t, s, s + {_CHUNK_N - 1}), ' ')
             AS chunk_text,
           len(list_slice(t, s, s + {_CHUNK_N - 1})) AS n_tokens
    FROM st
    """,
)
def z07_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking with overlap (operators/chunking
    .chunk_documents): 32-token chunks sharing 8 tokens, sequence +
    posexplode + slice on the token array — row-local, zero shuffles,
    the step before tokenize-and-train in an LLM pipeline."""
    from computer_vision_foundations_spark.operators.chunking import (
        chunk_documents,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "text", "doc_id", chunk_tokens=_CHUNK_N, overlap=_CHUNK_OV
    )


@_register(
    "z08_redact_text",
    """
    WITH salted AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@example.com or https://ex.com/' || doc_id ||
             ' ref ' || repeat('9', 8) AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g'),
               'https?://[^ ]+', '<URL>', 'g'),
             '[0-9]{6,}', '<NUM>', 'g') AS text
    FROM salted
    """,
)
def z08_redact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction (operators/chunking.redact_text): emails →
    URLs → long digit runs replaced by placeholder tokens in one
    codegen'd regexp_replace chain. Each document is salted with a
    synthetic email/URL/number (same construction both engines) so
    every pattern actually fires; the patterns are restricted to
    syntax Java regex and RE2 treat identically."""
    from computer_vision_foundations_spark.operators.chunking import redact_text

    docs = load_table(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or https://ex.com/"),
            F.col("doc_id").cast("string"),
            F.lit(" ref "),
            F.lit("9" * 8),
        ).alias("text"),
    )
    return redact_text(salted, "text")


@_register(
    "z09_pack_sequences",
    """
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 32
               AS shard
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens, shard,
             sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens, shard,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS bin,
           CAST(cum - n_tokens - ((cum - n_tokens) // 256) * 256 AS BIGINT)
             AS offset
    FROM c
    """,
)
def z09_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/chunking.pack_sequences):
    documents sharded by a portable md5 hash, running token sum per
    shard assigns each doc a ~256-token training bin + its offset in
    the bin — greedy packing as ONE window over ONE shuffle, each
    shard packing independently (the property that scales)."""
    from computer_vision_foundations_spark.functions.hashing import md5_hash_pair
    from computer_vision_foundations_spark.operators.chunking import (
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents")
    h1, _ = md5_hash_pair(F.col("doc_id").cast("string"))
    with_counts = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    return pack_sequences(
        with_counts,
        "n_tokens",
        id_col="doc_id",
        seq_len=256,
        shard_col=h1 % 32,
    ).select("doc_id", "n_tokens", "shard", "bin", "offset")


@_register(
    "z10_fuzzy_name_pairs",
    """
    WITH s AS (SELECT s_suppkey, s_name FROM supplier)
    SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
           levenshtein(a.s_name, b.s_name) AS distance
    FROM s a JOIN s b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def z10_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string-match self-join (operators/fuzzy): supplier names
    within edit distance 1, found by q-gram blocking + distinct-gram
    count bound + levenshtein verify — never the quadratic
    nested-loop Spark would plan for a bare levenshtein predicate.
    The oracle IS the quadratic form (fine for DuckDB at fixture
    scale), so the check proves the filter-and-verify pipeline loses
    no pairs."""
    from computer_vision_foundations_spark.operators.fuzzy import (
        fuzzy_match_pairs,
    )

    sup = load_table(spark, sf_dir, "supplier")
    return fuzzy_match_pairs(
        sup, "s_name", "s_suppkey", max_distance=1, q=3, max_gram_freq=None
    )


_Z_BITS = 10


def _zorder_oracle_sql() -> str:
    terms = " + ".join(
        f"(((ux >> {b}) & 1) << {2 * b}) + (((vx >> {b}) & 1) << {2 * b + 1})"
        for b in range(_Z_BITS)
    )
    return f"""
    WITH q AS (
      SELECT event_id,
             user_id % 1024 AS ux,
             CAST(floor(value * 10) AS BIGINT) % 1024 AS vx
      FROM events
    ),
    z AS (SELECT event_id, {terms} AS zkey FROM q)
    SELECT zkey >> 14 AS zbucket,
           count(*) AS n,
           min(zkey) AS min_z,
           max(zkey) AS max_z
    FROM z GROUP BY 1
    """


@_register("z11_zorder_layout", _zorder_oracle_sql())
def z11_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key (operators/zorder.zorder_key): Morton
    interleave of (user_id, quantized value) as pure codegen'd bit
    arithmetic, bucketed to the 64 file-sized z-ranges a
    layout_by_zorder write would produce — per-bucket min/max show
    each range is compact in BOTH dimensions, which is what lets
    multi-column filters prune files. Oracle replays the identical
    shift/mask expression."""
    from computer_vision_foundations_spark.operators.zorder import zorder_key

    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_id",
        (F.col("user_id") % 1024).alias("ux"),
        (F.floor(F.col("value") * 10).cast("long") % 1024).alias("vx"),
    )
    z = q.select(
        "event_id", zorder_key(["ux", "vx"], bits=_Z_BITS).alias("zkey")
    )
    return z.groupBy(
        F.shiftright("zkey", 14).alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("zkey").alias("min_z"),
        F.max("zkey").alias("max_z"),
    )


def _training_corpus_oracle_sql() -> str:
    """End-to-end DuckDB twin of q20's full pipeline configuration —
    every stage's individually-verified oracle fragment composed as
    MATERIALIZED CTEs (the z13/q97 pattern), with the iterative
    near-dup clustering expressed as the q94 recursive closure.

    Stage map (and the per-stage oracle each fragment is lifted from):
    quality gate (q66/q38) → surprisal gate over the surviving corpus
    (q47, 6-digit-rounded threshold) → domain cap 1M = identity at
    every tested SF (row_number ≤ cap is vacuous; documented, not
    modeled) → exact dedup keep-min (q83) → MinHash-LSH pairs with the
    portable md5 family (q26) → connected components via recursive CTE
    (q94) → exact decontamination (q35; the engine's bloom pre-screen
    has no false negatives so it is result-invariant) → redaction
    (q14) → chunking (q13) → shard/pack (q15)."""

    def _sh(table: str) -> str:
        return _SHINGLES_SQL.replace("FROM documents", f"FROM {table}")

    perms = ", ".join(_minhash_perm_sql(s) for s in range(8))
    return f"""
    WITH RECURSIVE
    train AS MATERIALIZED (
      SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
    ),
    q1 AS MATERIALIZED (
      SELECT doc_id, text FROM train
      WHERE len(string_split(text, ' ')) >= 20
        AND (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
            / CAST(length(text) AS DOUBLE) <= 0.25
    ),
    tok AS MATERIALIZED (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM q1
    ),
    freq AS MATERIALIZED (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
    tot AS MATERIALIZED (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM freq),
    surv AS MATERIALIZED (
      SELECT t.doc_id
      FROM tok t JOIN freq f USING (token) CROSS JOIN tot
      GROUP BY t.doc_id
      HAVING round(avg(-log2(f.cnt / tot.n_total)), 6) <= 14.0
    ),
    k2 AS MATERIALIZED (SELECT q1.* FROM q1 JOIN surv USING (doc_id)),
    ex AS MATERIALIZED (
      SELECT min(doc_id) AS doc_id FROM k2
      GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
    ),
    k3 AS MATERIALIZED (SELECT k2.* FROM k2 JOIN ex USING (doc_id)),
    sh AS MATERIALIZED ({_sh("k3")}),
    sig AS MATERIALIZED (SELECT doc_id, [{perms}] AS sig FROM sh),
    banded AS MATERIALIZED (
      SELECT doc_id, 0 AS band_idx, array_to_string(sig[1:2], ',') AS band_key FROM sig
      UNION ALL
      SELECT doc_id, 1, array_to_string(sig[3:4], ',') FROM sig
      UNION ALL
      SELECT doc_id, 2, array_to_string(sig[5:6], ',') FROM sig
      UNION ALL
      SELECT doc_id, 3, array_to_string(sig[7:8], ',') FROM sig
    ),
    capped AS MATERIALIZED (
      SELECT * FROM banded
      QUALIFY count(*) OVER (PARTITION BY band_idx, band_key) <= 1000
    ),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM capped a JOIN capped b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id
    ),
    sym AS MATERIALIZED (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT u, u FROM sym
      UNION
      SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.node
    ),
    losers AS MATERIALIZED (
      SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> min(r)
    ),
    k4 AS MATERIALIZED (
      SELECT * FROM k3 WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    ),
    esh AS MATERIALIZED (
      SELECT doc_id AS eval_id, len(shingles) AS esize,
             unnest(shingles) AS s
      FROM ({_sh("documents")}) WHERE doc_id % 50 = 0
    ),
    tsh AS MATERIALIZED (
      SELECT doc_id AS train_id, unnest(shingles) AS s
      FROM ({_sh("k4")})
    ),
    contam AS MATERIALIZED (
      SELECT DISTINCT train_id AS doc_id FROM (
        SELECT train_id, eval_id, esize, count(*) AS common
        FROM tsh JOIN esh USING (s)
        GROUP BY 1, 2, 3
        HAVING CAST(count(*) AS DOUBLE) / CAST(esize AS DOUBLE) >= 0.5
      )
    ),
    red AS MATERIALIZED (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                   '<EMAIL>', 'g'),
                 'https?://[^ ]+', '<URL>', 'g'),
               '[0-9]{{6,}}', '<NUM>', 'g') AS text
      FROM k4 WHERE doc_id NOT IN (SELECT doc_id FROM contam)
    ),
    toks2 AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS t FROM red
    ),
    st AS MATERIALIZED (
      SELECT doc_id, t,
             unnest(range(1, greatest(len(t) - 8, 1) + 1, 24)) AS s
      FROM toks2
    ),
    chunks AS MATERIALIZED (
      SELECT doc_id,
             CAST((s - 1) // 24 AS INT) AS chunk_idx,
             array_to_string(list_slice(t, s, s + 31), ' ') AS chunk_text,
             CAST(len(list_slice(t, s, s + 31)) AS INT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT % 32
               AS BIGINT) AS shard,
             doc_id * 10000 + ((s - 1) // 24) AS _chunk_id
      FROM st
    ),
    c AS MATERIALIZED (
      SELECT *, sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY _chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM chunks
    )
    SELECT doc_id, chunk_idx, chunk_text, n_tokens, shard,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS bin,
           CAST(cum - n_tokens - ((cum - n_tokens) // 256) * 256 AS BIGINT)
             AS offset
    FROM c
    """


@_register("q20_training_corpus", _training_corpus_oracle_sql())
def q20_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition (operators/corpus.prepare_training_corpus)
    with the FULL stage list: quality filter → surprisal gate →
    per-domain cap → exact dedup → near-dup clustering → benchmark
    decontamination (bloom pre-screen + exact verify; eval set = every
    50th doc) → redaction → chunking → sequence packing — every stage
    an operator whose correctness is individually oracle-verified, and
    (round 4) the COMPOSITION verified end-to-end against a DuckDB
    twin that chains the per-stage oracle fragments as MATERIALIZED
    CTEs, with the near-dup clustering as a recursive closure. The
    portable md5 MinHash family replaces xxhash64 here so the oracle
    rebuilds identical signatures (production callers keep the faster
    default); composition-level invariants remain in
    tests/test_corpus.py."""
    from computer_vision_foundations_spark.operators.corpus import (
        prepare_training_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return prepare_training_corpus(
        train,
        max_surprisal=14.0,
        domain_col="source",
        domain_cap=1_000_000,
        eval_df=eval_df,
        decontaminate_min_frac=0.5,
        lsh_hash_fn="md5",
    )


@_register(
    "z13_udtf_sentences",
    """
    WITH synth AS (
      SELECT doc_id,
             regexp_replace(text, ' (value|table) ', '. ', 'g') AS text
      FROM documents
    ),
    marked AS (
      SELECT doc_id,
             string_split(
               regexp_replace(text, '([.!?]) +', '\\1' || chr(1), 'g'),
               chr(1)) AS parts
      FROM synth
    ),
    sents AS (
      SELECT doc_id, trim(unnest(parts)) AS sentence FROM marked
    )
    SELECT doc_id, sentence,
           len(string_split(sentence, ' ')) AS n_words
    FROM sents WHERE sentence <> ''
    """,
)
def z13_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (functions/udtfs.SplitSentences) driven
    through SQL LATERAL: sentence punctuation is synthesized
    deterministically (same regexp_replace both engines), the UDTF
    segments each document, and the oracle reproduces the split with
    RE2-safe replace-then-split (no lookbehind in DuckDB). sent_idx
    is omitted from the result on purpose — the driver hash is
    order-insensitive and the index is positional noise."""
    from computer_vision_foundations_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents")
    docs.select(
        "doc_id",
        F.regexp_replace("text", " (value|table) ", ". ").alias("text"),
    ).createOrReplaceTempView("_q62_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence, s.n_words
        FROM _q62_docs d, LATERAL split_sentences(d.text) s
        """
    )


# ---------------------------------------------------------------------------
# Product quantization (the IVF-PQ compression layer)
# ---------------------------------------------------------------------------

_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED = 64, 8, 16, 42


def _pq_dist_arrays_sql() -> list[str]:
    """One DuckDB ``[dist, ...]`` literal-codebook array per subvector:
    ``||c||² − 2 · slice(v)·c``. The ``||c||²`` constants are emitted
    from the SAME numpy computation the Spark operator uses, so both
    engines share identical f64 constants; the dots are sequential
    ascending-index on both sides (operators/quantization._seq_scores
    vs DuckDB list_dot_product)."""
    import numpy as np

    from computer_vision_foundations_spark.operators.quantization import (
        pq_codebooks,
    )

    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    sub_dim = _PQ_DIM // _PQ_SUBS
    arrays = []
    for s, cb in enumerate(cbs):
        c_norms = (np.asarray(cb, dtype=np.float64) ** 2).sum(axis=1)
        dists = ", ".join(
            f"({float(c_norms[i])!r} - 2.0 * list_dot_product("
            f"list_slice(v, {s * sub_dim + 1}, {(s + 1) * sub_dim}), "
            f"[{', '.join(repr(float(x)) for x in cb[i])}]))"
            for i in range(len(cb))
        )
        arrays.append(f"[{dists}]")
    return arrays


def _pq_codes_cte() -> str:
    ds = _pq_dist_arrays_sql()
    d_cols = ", ".join(f"{a} AS d{s}" for s, a in enumerate(ds))
    code_cols = ", ".join(
        f"CAST(list_position(d{s}, list_min(d{s})) - 1 AS INT)"
        for s in range(_PQ_SUBS)
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    d AS (
      SELECT vec_id, v, {d_cols} FROM emb
    ),
    codes AS (
      SELECT vec_id, [{code_cols}] AS codes FROM d
    )"""


def _pq_codes_oracle_sql() -> str:
    return f"""
    {_pq_codes_cte()}
    SELECT vec_id, array_to_string(codes, ',') AS codes_key FROM codes
    """


def _pq_adc_oracle_sql() -> str:
    score = " + ".join(
        f"p.d{s}[c.codes[{s + 1}] + 1]" for s in range(_PQ_SUBS)
    )
    return f"""
    {_pq_codes_cte()}
    SELECT probe_id, neighbor_id, adc_score, rank FROM (
      SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             round({score}, 6) AS adc_score,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round({score}, 6) ASC, c.vec_id ASC) AS rank
      FROM d p JOIN codes c ON p.vec_id < 5 AND c.vec_id <> p.vec_id) t
    WHERE rank <= 10
    """


@_register("z21_pq_codes", _pq_codes_oracle_sql())
def z21_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode (operators/quantization.pq_encode):
    every embedding compressed to 8 nearest-centroid codes from seeded
    per-subvector codebooks — the representation the ADC scan reads at
    scale. The oracle replays the codebooks as SQL literals with
    matching f64 constants and summation order, so the codes are
    hash-checked bit-for-bit."""
    from computer_vision_foundations_spark.operators.quantization import (
        pq_codebooks,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    return pq_encode(emb, cbs).select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda x: x.cast("string")), ","
        ).alias("codes_key"),
    )


@_register("z26_pq_adc_knn", _pq_adc_oracle_sql())
def z26_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10 per probe
    (operators/quantization.pq_adc_topk): probes precompute a 128-entry
    distance LUT, candidates are scored by 8 array lookups over their
    codes — the corpus-side scan never touches a float vector. The
    oracle recomputes LUT and scores from the same literal codebooks."""
    from computer_vision_foundations_spark.operators.quantization import (
        pq_adc_topk,
        pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    return pq_adc_topk(emb, probes, cbs, k=10)


_MIX_WEIGHTS = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0, "src4": 1.0, "src5": 1.0}
_MIX_BUDGET, _MIX_SEED = 20_000.0, 42


def _mixture_oracle_sql() -> str:
    total_w = sum(_MIX_WEIGHTS.values())
    values = ", ".join(f"('{k}', {v!r})" for k, v in _MIX_WEIGHTS.items())
    return f"""
    WITH sizes AS (
      SELECT source AS domain, CAST(sum(n_chars) AS DOUBLE) AS n_tokens
      FROM documents GROUP BY 1
    ),
    fracs AS (
      SELECT domain,
             least(1.0, {_MIX_BUDGET!r} * w / {total_w!r} / n_tokens) AS keep_frac
      FROM sizes JOIN (VALUES {values}) AS wt(domain, w) USING (domain)
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d JOIN fracs f ON d.source = f.domain
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':{_MIX_SEED}'), 1, 7)) AS BIGINT)
          / 268435456.0 < f.keep_frac
    """


@_register("z14_mixture_sample", _mixture_oracle_sql())
def z14_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture sampling (operators/mixture.mixture_sample): six
    weighted sources re-balanced to a 20k-char budget, membership
    decided by a seeded md5 hash threshold — deterministic across
    cluster layouts and replayed exactly by the oracle (same 28-bit
    md5 slice, same left-to-right double math). Unweighted sources
    drop out; over-subscribed ones cap at keep_frac 1.0."""
    from computer_vision_foundations_spark.operators.mixture import (
        mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        docs,
        _MIX_WEIGHTS,
        _MIX_BUDGET,
        domain_col="source",
        id_col="doc_id",
        token_col="n_chars",
        seed=_MIX_SEED,
    ).select("doc_id", "source", "n_chars")


_EPOCH_WEIGHTS = {"src0": 3.0, "src1": 1.0}
_EPOCH_BUDGET, _EPOCH_MAX = 40_000.0, 4.0


def _mixture_epochs_oracle_sql() -> str:
    total_w = sum(_EPOCH_WEIGHTS.values())
    values = ", ".join(f"('{k}', {v!r})" for k, v in _EPOCH_WEIGHTS.items())
    return f"""
    WITH sizes AS (
      SELECT source AS domain, CAST(sum(n_chars) AS DOUBLE) AS n_tokens
      FROM documents GROUP BY 1
    ),
    fracs AS (
      SELECT domain,
             least({_EPOCH_MAX!r}, {_EPOCH_BUDGET!r} * w / {total_w!r} / n_tokens) AS f
      FROM sizes JOIN (VALUES {values}) AS wt(domain, w) USING (domain)
    ),
    sel AS (
      SELECT d.doc_id, d.source, d.n_chars,
             CAST(floor(f.f) AS INT)
             + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':42'), 1, 7)) AS BIGINT)
                         / 268435456.0 < f.f - floor(f.f)
                    THEN 1 ELSE 0 END AS n
      FROM documents d JOIN fracs f ON d.source = f.domain
    )
    SELECT doc_id, source, n_chars,
           CAST(unnest(generate_series(1, n)) AS INT) AS epoch
    FROM sel WHERE n >= 1
    """


@_register("z28_mixture_epochs", _mixture_epochs_oracle_sql())
def z28_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling WITH repetition
    (operators/mixture.mixture_sample_with_repetition): under-target
    domains upsample by whole epochs plus a hash-selected remainder,
    so expected tokens hit the target exactly; replication is map-side
    explode, no shuffle. Oracle replays fraction math, hash remainder,
    and epoch fan-out via generate_series."""
    from computer_vision_foundations_spark.operators.mixture import (
        mixture_sample_with_repetition,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample_with_repetition(
        docs,
        _EPOCH_WEIGHTS,
        _EPOCH_BUDGET,
        domain_col="source",
        id_col="doc_id",
        token_col="n_chars",
        seed=42,
        max_repeat=_EPOCH_MAX,
    ).select("doc_id", "source", "n_chars", "epoch")


def _ann_recall_oracle_sql(approx_key: str = "z29_lsh_ann") -> str:
    """Recall of an ANN index against brute-force ground truth,
    composed from the two queries' own oracle bodies (nested-WITH
    derived tables are standard SQL; DuckDB executes them as-is)."""
    exact = _ORACLES["q27_knn_cosine"]
    approx = _ORACLES[approx_key]
    return f"""
    SELECT p.probe_id, coalesce(h.n_hits, 0) AS n_hits,
           round(coalesce(h.n_hits, 0)
                 / CAST(least(10, p.n_exact) AS DOUBLE), 6) AS recall
    FROM (SELECT probe_id, count(*) AS n_exact
          FROM ({exact}) e0 GROUP BY probe_id) p
    LEFT JOIN (
      SELECT a.probe_id, count(*) AS n_hits
      FROM ({approx}) a JOIN ({exact}) e USING (probe_id, neighbor_id)
      GROUP BY a.probe_id
    ) h USING (probe_id)
    """


@_register("z31_ann_recall", _ann_recall_oracle_sql())
def z31_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation as a relational operator
    (operators/evaluation.ann_recall): recall@10 of the hyperplane-LSH
    index (q33) against brute-force ground truth (q27), per probe.
    The oracle composes both queries' own oracle SQL, so retrieval AND
    evaluation are differentially checked end-to-end."""
    from computer_vision_foundations_spark.operators.evaluation import (
        ann_recall,
    )

    return ann_recall(
        z29_lsh_ann(spark, sf_dir), q27_knn_cosine(spark, sf_dir), k=10
    )


@_register(
    "q35_decontamination_pairs",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    e AS (SELECT doc_id AS eval_id, len(shingles) AS esize, shingles
          FROM sh WHERE doc_id % 50 = 0),
    t AS (SELECT doc_id AS train_id, shingles FROM sh WHERE doc_id % 50 <> 0),
    te AS (SELECT train_id, unnest(shingles) AS s FROM t),
    ee AS (SELECT eval_id, esize, unnest(shingles) AS s FROM e),
    pairs AS (
      SELECT train_id, eval_id, esize, count(*) AS common
      FROM te JOIN ee USING (s) GROUP BY 1, 2, 3
    )
    SELECT train_id, eval_id, common,
           round(CAST(common AS DOUBLE) / CAST(esize AS DOUBLE), 6) AS overlap_frac
    FROM pairs
    WHERE CAST(common AS DOUBLE) / CAST(esize AS DOUBLE) >= 0.04
    """,
)
def q35_decontamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination
    (operators/decontaminate.contamination_pairs): training docs
    sharing >=4% of an eval doc's 3-gram shingles (eval set = every
    50th doc; the low threshold is sized to the synthetic corpus's
    overlap tail so the check exercises ~55 pairs). The eval shingle set is broadcast, so the corpus is
    scanned once map-side and shuffles only (train, eval) id pairs —
    the 100 TB shape for corpus-vs-benchmark screening."""
    from computer_vision_foundations_spark.operators.decontaminate import (
        contamination_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_pairs(train, eval_df, k=3, min_frac=0.04)


@_register(
    "z17_quality_gate",
    """
    WITH scored AS (
      SELECT doc_id, source,
             round(len(list_filter(string_split(text, ' '),
                       x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS quality
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, quality,
             percent_rank() OVER (
               PARTITION BY source
               ORDER BY quality DESC, doc_id ASC) AS pr
      FROM scored
    )
    SELECT doc_id, source, quality, round(pr, 6) AS pct_rank
    FROM r WHERE pr <= 0.25
    """,
)
def z17_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality gate
    (operators/mixture.top_fraction_per_group): keep the top 25% of
    documents per source by stopword-density quality score. The
    percent_rank runs over a total order (score desc, doc_id asc), so
    both engines select the identical rows."""
    from computer_vision_foundations_spark.functions.text import (
        STOPWORDS,
        stopword_ratio,
    )
    from computer_vision_foundations_spark.operators.mixture import (
        top_fraction_per_group,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.round(stopword_ratio(F.col("text"), STOPWORDS["en"]), 6).alias(
            "quality"
        ),
    )
    return top_fraction_per_group(
        docs, "source", "quality", 0.25, tiebreak_col="doc_id"
    )


@_register(
    "z18_shard_assignment",
    """
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 7)) AS BIGINT) AS hv
      FROM documents
    )
    SELECT doc_id, CAST(hv % 32 AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY hv % 32 ORDER BY hv ASC, doc_id ASC) AS INT) AS pos
    FROM h
    """,
)
def z18_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding
    (operators/chunking.shard_assignment): every document gets a
    reproducible (shard, position) from the seeded md5 hash — the
    training-order assignment that must replay identically across
    reruns and cluster layouts. The oracle recomputes the identical
    hash, modulo, and per-shard rank."""
    from computer_vision_foundations_spark.operators.chunking import (
        shard_assignment,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = shard_assignment(docs, "doc_id", n_shards=32, seed=42)
    return out.select("doc_id", "shard", F.col("pos").cast("int").alias("pos"))


@_register(
    "z51_vocab_coverage",
    """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, count(*) AS n FROM toks WHERE token <> '' GROUP BY 1
    ),
    top AS (
      SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 100
    )
    SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT) AS rank,
           round(CAST(sum(n) OVER (ORDER BY n DESC, token ASC
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / (SELECT CAST(sum(n) AS DOUBLE) FROM counts), 6) AS cum_share
    FROM top
    """,
)
def z51_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 vocabulary with cumulative corpus coverage
    (operators/vocab.vocab_top_k). The top-V runs as
    TakeOrderedAndProject (per-partition heaps, no global sort of the
    corpus-sized count table); the cumulative window sees only V rows."""
    from computer_vision_foundations_spark.operators.vocab import vocab_top_k

    docs = load_table(spark, sf_dir, "documents")
    out = vocab_top_k(docs, "text", k=100)
    return out.select("token", "n", F.col("rank").cast("int").alias("rank"), "cum_share")


@_register(
    "z54_pmi_bigrams",
    """
    WITH toked AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toked
    ),
    uni AS (
      SELECT token, count(*) AS n_u
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY 1
    ),
    big AS (
      SELECT bigram, count(*) AS n_ab FROM pairs GROUP BY 1
    )
    SELECT bigram, n_ab,
           round(ln((CAST(n_ab AS DOUBLE) / (SELECT CAST(sum(n_ab) AS DOUBLE) FROM big))
                    / ((CAST(a.n_u AS DOUBLE) / (SELECT CAST(sum(n_u) AS DOUBLE) FROM uni))
                       * (CAST(b.n_u AS DOUBLE) / (SELECT CAST(sum(n_u) AS DOUBLE) FROM uni)))),
                 6) AS pmi
    FROM big
    JOIN uni a ON string_split(bigram, ' ')[1] = a.token
    JOIN uni b ON string_split(bigram, ' ')[2] = b.token
    WHERE n_ab >= 5
    ORDER BY pmi DESC, bigram ASC LIMIT 50
    """,
)
def z54_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PMI collocations over adjacent token pairs
    (operators/vocab.pmi_bigrams): two hash aggregates + two equi-joins
    on token; only (token, count) rows shuffle. Both engines compute
    the identical ln-ratio expression, rounded to 6."""
    from computer_vision_foundations_spark.operators.vocab import pmi_bigrams

    docs = load_table(spark, sf_dir, "documents")
    return pmi_bigrams(docs, "text", min_count=5, k=50)


def _simhash_pairs_oracle_sql(bits: int = 32, bands: int = 4, max_hamming: int = 3) -> str:
    """Hamming-LSH pairs over the portable-md5 SimHash CTE: band
    equi-join candidates, exact bit_count(xor) filter."""
    width = bits // bands
    mask = (1 << width) - 1
    base = _simhash_oracle_sql(bits)
    return f"""
    WITH sh AS ({base}),
    banded AS (
      SELECT doc_id, simhash, i AS band_idx,
             (simhash >> (i * {width})) & {mask} AS band_val
      FROM sh CROSS JOIN generate_series(0, {bands - 1}) AS g(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


@_register("q49_simhash_near_dup_pairs", _simhash_pairs_oracle_sql())
def q49_simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (operators/dedup.simhash_pairs):
    Hamming-LSH pigeonhole banding — fingerprints within Hamming
    distance bands-1 must share a band, so candidates come from an
    equi-join on (band_idx, band_val), never all-pairs. Both the
    portable fingerprints (the simhash query's md5 family) and the pairing are
    replayed by the oracle."""
    from computer_vision_foundations_spark.operators.dedup import (
        simhash_pairs,
    )

    fingerprints = q92_simhash(spark, sf_dir)
    return simhash_pairs(
        fingerprints, "simhash", "doc_id", bits=32, bands=4, max_hamming=3
    )


def _ivf_pq_oracle_sql() -> str:
    """IndexIVFPQ composed oracle: the IVF centroid-distance literals
    (q36's construction) pick each vector's cell and each probe's
    n_probe_cells nearest cells; the PQ codebook literals (q63/q64's
    construction) give codes and the probe LUT; ADC score = 8 list
    lookups, ranked per probe."""
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    cents = random_centroids(_IVF_DIM, _IVF_CELLS, _IVF_SEED)
    cdists = ", ".join(
        f"({sum(x * x for x in c)!r} - 2.0 * list_dot_product(v, "
        f"[{', '.join(repr(x) for x in c)}]))"
        for c in cents
    )
    ds = _pq_dist_arrays_sql()
    d_cols = ", ".join(f"{a} AS d{s}" for s, a in enumerate(ds))
    code_cols = ", ".join(
        f"CAST(list_position(d{s}, list_min(d{s})) - 1 AS INT)"
        for s in range(_PQ_SUBS)
    )
    score = " + ".join(f"p.d{s}[c.codes[{s + 1}] + 1]" for s in range(_PQ_SUBS))
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    d AS (
      SELECT vec_id, v, [{cdists}] AS cdists, {d_cols} FROM emb
    ),
    corpus AS (
      SELECT vec_id AS neighbor_id,
             CAST(list_position(cdists, list_min(cdists)) - 1 AS INT) AS cell,
             [{code_cols}] AS codes
      FROM d
    ),
    probe_fan AS (
      SELECT *, vec_id AS probe_id, i - 1 AS cell,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY cdists[i] ASC, i ASC) AS cell_rank
      FROM d CROSS JOIN generate_series(1, {_IVF_CELLS}) AS t(i)
      WHERE vec_id < 5
    )
    SELECT probe_id, neighbor_id, adc_score, rank FROM (
      SELECT p.probe_id, c.neighbor_id,
             round({score}, 6) AS adc_score,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY round({score}, 6) ASC, c.neighbor_id ASC) AS rank
      FROM probe_fan p
      JOIN corpus c ON p.cell = c.cell AND p.probe_id <> c.neighbor_id
      WHERE p.cell_rank <= {_IVF_PROBE_CELLS}) t
    WHERE rank <= 10
    """


@_register("q50_ivf_pq_ann", _ivf_pq_oracle_sql())
def q50_ivf_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed index (operators/quantization.ivf_pq_topk, the
    FAISS IndexIVFPQ shape): corpus persisted as (id, cell, codes) in
    one Arrow projection, probes fan out to their 4 nearest cells with
    a precomputed ADC LUT, candidates scored by 8 array lookups inside
    the cell equi-join — float vectors never cross a shuffle. Both the
    coarse quantizer (q36's centroid literals) and the codebooks
    (q63/q64's) are replayed by the oracle, so the composition is
    hash-checked end-to-end."""
    from computer_vision_foundations_spark.operators.quantization import (
        ivf_pq_topk,
        pq_codebooks,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    cents = random_centroids(_IVF_DIM, _IVF_CELLS, _IVF_SEED)
    return ivf_pq_topk(
        emb, probes, cbs, cents, k=10, n_probe_cells=_IVF_PROBE_CELLS
    )





_BM25_QUERIES = [
    (0, ["hash", "join", "scan"]),
    (1, ["vector", "data", "column"]),
    (2, ["customer", "order", "merge", "window"]),
]


def _bm25_oracle_sql(k1: float = 1.2, b: float = 0.75) -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return f"""
    WITH q(query_id, term) AS (VALUES {values}),
    stats AS (
      SELECT count(*)::DOUBLE AS n_docs,
             avg(len(string_split(text, ' '))) AS avgdl
      FROM documents
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term <> '' AND term IN (SELECT DISTINCT term FROM q)
      GROUP BY 1, 2
    ),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    dl AS (
      SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl FROM documents
    )
    SELECT query_id, doc_id, bm25, rank FROM (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
               * (tf.tf * {k1 + 1.0})
               / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / s.avgdl))
             ), 4) AS bm25,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY round(sum(
                 ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * (tf.tf * {k1 + 1.0})
                 / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / s.avgdl))
               ), 4) DESC, tf.doc_id ASC) AS rank
      FROM tf
      JOIN dft USING (term)
      JOIN dl USING (doc_id)
      JOIN q USING (term)
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id) t
    WHERE rank <= 10
    """


@_register("q04_bm25_search", _bm25_oracle_sql())
def q04_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per query (operators/retrieval.bm25_topk) —
    sparse ranked retrieval over the documents table, the keyword
    sibling of the ANN family. The token stream is semi-joined against
    the broadcast query vocabulary BEFORE the tf aggregate, df/idf
    stats are broadcast back, and corpus N/avgdl ride a single-row
    broadcast cross join (no driver collect). The oracle recomputes
    tf/df/idf and the exact scoring formula in SQL."""
    from computer_vision_foundations_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, terms array<string>"
    )
    return bm25_topk(docs, queries_df, k=10)


@_register(
    "q08_repetition_signals",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    b AS (
      SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      FROM t
    )
    SELECT doc_id,
      CASE WHEN len(toks) > 0 THEN round(
        (len(toks) - len(list_distinct(toks))) / CAST(len(toks) AS DOUBLE), 6)
        ELSE 0.0 END AS dup_token_frac,
      CASE WHEN len(toks) > 0 THEN round(
        list_max(list_transform(list_distinct(toks),
                 d -> len(list_filter(toks, x -> x = d))))
        / CAST(len(toks) AS DOUBLE), 6) ELSE 0.0 END AS top_token_frac,
      CASE WHEN len(bigrams) > 0 THEN round(
        (len(bigrams) - len(list_distinct(bigrams)))
        / CAST(len(bigrams) AS DOUBLE), 6) ELSE 0.0 END AS dup_bigram_frac,
      CASE WHEN len(bigrams) > 0 THEN round(
        list_max(list_transform(list_distinct(bigrams),
                 d -> len(list_filter(bigrams, x -> x = d))))
        / CAST(len(bigrams) AS DOUBLE), 6) ELSE 0.0 END AS top_bigram_frac
    FROM b
    """,
)
def q08_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate quality signals
    (functions/text.repetition_columns): duplicate-token, top-token,
    duplicate-bigram and top-bigram fractions per document — the
    standard gates for dropping repetitive low-value training text.
    All-Catalyst HOF expressions; the oracle mirrors them with DuckDB
    list functions."""
    from computer_vision_foundations_spark.functions.text import (
        repetition_columns,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repetition_columns(docs).select(
        "doc_id",
        "dup_token_frac",
        "top_token_frac",
        "dup_bigram_frac",
        "top_bigram_frac",
    )


_KM_DIM, _KM_CLUSTERS, _KM_SEED = 64, 8, 42


def _kmeans_step_oracle_sql() -> str:
    """One Lloyd update from the seeded init centroids, replayed as SQL
    literals (the IVF oracle's distance construction): assignment =
    first argmin, new centroid = per-dimension member mean."""
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    cents = random_centroids(_KM_DIM, _KM_CLUSTERS, _KM_SEED)
    dists = ", ".join(
        f"({sum(x * x for x in c)!r} - 2.0 * list_dot_product(v, "
        f"[{', '.join(repr(x) for x in c)}]))"
        for c in cents
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    d AS (
      SELECT vec_id, v, [{dists}] AS dists FROM emb
    ),
    assigned AS (
      SELECT v, CAST(list_position(dists, list_min(dists)) - 1 AS INT) AS cluster
      FROM d
    )
    SELECT cluster, CAST(i - 1 AS INT) AS pos,
           round(avg(v[i]), 6) AS mean, count(*) AS n_members
    FROM assigned CROSS JOIN generate_series(1, {_KM_DIM}) AS t(i)
    GROUP BY cluster, i
    """


@_register("q16_kmeans_step", _kmeans_step_oracle_sql())
def q16_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd k-means update
    (operators/clustering.kmeans_update_table): Arrow-batched
    nearest-centroid assignment + ONE hash aggregate of unrolled
    per-dimension sums (map-side combine; vectors never shuffle),
    flattened to (cluster, pos, mean, n_members) so the oracle can
    hash-check the step. kmeans_fit iterates exactly this aggregate to
    train real IVF/IVF-PQ coarse quantizers in-engine."""
    from computer_vision_foundations_spark.operators.clustering import (
        kmeans_update_table,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = random_centroids(_KM_DIM, _KM_CLUSTERS, _KM_SEED)
    return kmeans_update_table(emb, cents, round_digits=6)

def _rrf_oracle_sql(k: int = 10, rrf_k: int = 60, recency_n: int = 50) -> str:
    """Fusion oracle: the BM25 oracle body (top-10 per query) RRF-fused
    with a recency prior (top-50 newest doc_ids per query). Two addends
    per (query, doc) — IEEE order-insensitive — so round 6 hash-matches."""
    bm25 = _bm25_oracle_sql()
    return f"""
    WITH bm AS ({bm25}),
    recency AS (
      SELECT q.query_id, d.doc_id,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY d.doc_id DESC) AS rank
      FROM (SELECT DISTINCT query_id FROM bm) q
      CROSS JOIN documents d
      QUALIFY rank <= {recency_n}
    ),
    u AS (
      SELECT query_id, doc_id, 1.0 / ({rrf_k} + rank) AS c FROM bm
      UNION ALL
      SELECT query_id, doc_id, 1.0 / ({rrf_k} + rank) AS c FROM recency
    ),
    fused AS (
      SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score,
             count(*) AS n_rankers
      FROM u GROUP BY 1, 2
    )
    SELECT query_id, doc_id, rrf_score, n_rankers, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_score DESC, doc_id ASC) AS rank
      FROM fused) t
    WHERE rank <= {k}
    """


@_register("q01_rrf_fusion", _rrf_oracle_sql())
def q01_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion (operators/retrieval.rrf_fuse):
    reciprocal-rank fusion of the BM25 top-10 (q04) with a recency
    prior (50 newest docs per query) — rank-only combination, no score
    calibration. Union of two top-k lists + one hash aggregate + one
    window; both input rankings and the fusion replay in the oracle."""
    from computer_vision_foundations_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )

    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, terms array<string>"
    )
    bm = bm25_topk(docs, queries_df, k=10)
    w = Window.partitionBy("query_id").orderBy(F.col("doc_id").desc())
    recency = (
        docs.select("doc_id")
        .crossJoin(queries_df.select("query_id").distinct())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
    )
    return rrf_fuse([bm, recency], k=10)


@_register("z19_ivf_pq_recall", _ann_recall_oracle_sql("q50_ivf_pq_ann"))
def z19_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the composed IVF-PQ index (q50) against brute-force
    cosine ground truth (q27) via operators/evaluation.ann_recall — the
    quality dial a real deployment tunes (n_probe_cells × codebook
    size). Both retrievals AND the evaluation replay in the oracle."""
    from computer_vision_foundations_spark.operators.evaluation import (
        ann_recall,
    )

    return ann_recall(
        q50_ivf_pq_ann(spark, sf_dir), q27_knn_cosine(spark, sf_dir), k=10
    )


@_register(
    "z20_multiprobe_recall", _ann_recall_oracle_sql("z32_multiprobe_lsh_ann")
)
def z20_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of multi-probe LSH (q36) against brute-force ground
    truth (q27): the evidence that probe-side bucket fan-out buys
    recall without touching the corpus index (compare with q34, the
    single-probe LSH recall). Oracle composes both queries' own oracle
    bodies end-to-end."""
    from computer_vision_foundations_spark.operators.evaluation import (
        ann_recall,
    )

    return ann_recall(
        z32_multiprobe_lsh_ann(spark, sf_dir), q27_knn_cosine(spark, sf_dir), k=10
    )


@_register(
    "z01_trailing_hour_window",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
             AS avg_1h,
           count(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS n_1h
    FROM events
    """,
)
def z01_trailing_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frames (RANGE BETWEEN INTERVAL ... PRECEDING):
    the event-time sibling of the ROWS frames in q76 — trailing-hour
    mean and count per user, evaluated by Catalyst's range-frame window
    exec (one shuffle on user_id, ordered frame scan; no self-join).
    The driver fixtures surface ts as TIMESTAMP_NTZ, where interval
    arithmetic is zone-free wall-clock math — identical to DuckDB's
    TIMESTAMP, so the frames agree without any zone pinning."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_q80_events")
    return spark.sql(
        """
        SELECT event_id, user_id,
               round(avg(value) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
                 AS avg_1h,
               count(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS n_1h
        FROM _q80_events
        """
    )



# ---------------------------------------------------------------------------
# Link-graph quality signals (LLM-pipeline: page-authority scoring)
# ---------------------------------------------------------------------------

_PR_EDGES_SQL = """
        SELECT l_suppkey AS src, -o_custkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey, o_custkey
        UNION ALL
        SELECT -o_custkey AS src, l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey, o_custkey
        HAVING count(*) >= 2
"""


def _pagerank_oracle() -> str:
    from computer_vision_foundations_spark.operators.pagerank import (
        pagerank_oracle_sql,
    )

    return pagerank_oracle_sql(
        _PR_EDGES_SQL, damping=0.85, n_iter=5, round_digits=9
    )


@_register("q07_pagerank", _pagerank_oracle())
def q07_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (`operators/pagerank.py`) over the
    supplier→customer trade graph: an edge per trading pair, plus the
    reverse edge for repeat business (≥2 lineitems), so some customer
    nodes stay dangling and the dangling-mass redistribution path is
    exercised. Customer node ids are negated to keep the two keyspaces
    disjoint. 5 damped power iterations as ONE lazy unrolled plan —
    per round: broadcast degree join, shuffle on src, hash-agg on dst
    carrying (node, double) only; dangling mass rides a broadcast
    1-row crossJoin, never a driver collect. Oracle: the same
    recurrence unrolled as r0..r5 CTEs with identical double
    arithmetic; ranks rounded to 9 digits (values ~1/N; noise from
    summation order is ~1e-15)."""
    from computer_vision_foundations_spark.operators.pagerank import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count("*").alias("n_items"))
    )
    fwd = pairs.select(
        F.col("l_suppkey").alias("src"), (-F.col("o_custkey")).alias("dst")
    )
    back = pairs.filter(F.col("n_items") >= 2).select(
        (-F.col("o_custkey")).alias("src"), F.col("l_suppkey").alias("dst")
    )
    pr = pagerank(fwd.unionByName(back), damping=0.85, n_iter=5)
    return pr.select("node", F.round("rank", 9).alias("rank"))


_SD_K, _SD_SEED, _SD_THRESHOLD = 32, 42, 0.3
_SD_HASH_SQL = (
    "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':42'), 1, 7)) "
    "AS BIGINT)"
)


def _semantic_dedup_oracle_sql() -> str:
    """Replay the SemDeDup composition end-to-end in SQL: seed
    centroids = the 32 embeddings with the smallest seeded hash units
    (no literals needed — the oracle derives them from the data like
    the engine does), first-argmin assignment, then within-cluster
    cosine pairs (the q28 construction)."""
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT row_number() OVER (ORDER BY {_SD_HASH_SQL}, vec_id) - 1 AS cid, v
      FROM emb
      ORDER BY {_SD_HASH_SQL}, vec_id
      LIMIT {_SD_K}
    ),
    d AS (
      SELECT e.vec_id, e.v, c.cid,
             list_dot_product(c.v, c.v)
             - 2.0 * list_dot_product(e.v, c.v) AS dist
      FROM emb e CROSS JOIN cent c
    ),
    assigned AS (
      SELECT vec_id, v, CAST(cid AS INT) AS cluster FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d) t
      WHERE rn = 1
    )
    SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM assigned a JOIN assigned b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= {_SD_THRESHOLD}
    """


@_register("q17_semantic_dedup", _semantic_dedup_oracle_sql())
def q17_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    k-means cluster assignment over embeddings
    (operators/clustering.kmeans_assign, Arrow-batched matmul — one
    narrow projection, no shuffle) becomes the BLOCKING column for
    cosine near-duplicate pairing
    (operators/dedup.embedding_near_duplicates — equi-join within
    cluster, norms precomputed per side). At 100 TB this is the
    standard answer to "embedding near-dup without O(n²)": candidate
    pairs only form inside a cluster, and cluster count tunes the
    block size.

    Seed centroids are ACTUAL data points — the 32 embeddings with the
    smallest seeded hash units (a model-sized driver collect, the same
    rule ``bottom_k_sample`` uses) — because synthetic gaussian
    centroids cover real data poorly: with 8 random centroids one
    cluster held 73% of the corpus and the pair join both skewed and
    lost parallelism (measured 12.6 s at sf0.1; data-point seeding at
    k=32 balances the blocks, ~0.6 s). Deterministic, so the oracle
    re-derives the SAME centroids in SQL and the whole composition
    hash-matches — no literals."""
    from computer_vision_foundations_spark.operators.clustering import (
        kmeans_assign,
    )
    from computer_vision_foundations_spark.operators.dedup import (
        embedding_near_duplicates,
    )
    from computer_vision_foundations_spark.operators.mixture import hash_unit

    emb = load_table(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.select("vec_id", "embedding", hash_unit("vec_id", _SD_SEED).alias("_h"))
        .orderBy("_h", "vec_id")
        .limit(_SD_K)
        .collect()
    )  # model-sized (k × dim floats), the engine's allowed collect class
    cents = [[float(x) for x in r.embedding] for r in seed_rows]
    clustered = kmeans_assign(emb, cents, "embedding", "cluster")
    return embedding_near_duplicates(
        clustered,
        "embedding",
        "vec_id",
        block_col="cluster",
        threshold=_SD_THRESHOLD,
        keep_block=True,
    )


_HASH_UNIT_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 7)) "
    "AS BIGINT) / 268435456.0"
)


@_register(
    "z12_bottom_k_sample",
    f"""
    SELECT doc_id, source, {_HASH_UNIT_SQL} AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id
    LIMIT 100
    """,
)
def z12_bottom_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size deterministic uniform sample
    (operators/sample.bottom_k_sample): the 100 smallest seeded hash
    units. Plans TakeOrderedAndProject — per-partition top-k, k-row
    exchange — never a full sort; reproducible across engines and
    cluster layouts, and consistent (a larger k is a superset)."""
    from computer_vision_foundations_spark.operators.sample import (
        bottom_k_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return bottom_k_sample(docs, "doc_id", 100, seed=42)


@_register(
    "za08_domain_cap",
    f"""
    SELECT doc_id, source, sample_rank FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_HASH_UNIT_SQL}, doc_id) AS sample_rank
      FROM documents) t
    WHERE sample_rank <= 15
    """,
)
def za08_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (operators/sample.group_cap_sample):
    at most 15 docs per source, picked by seeded hash order — the
    head-domain bound every web-corpus mixture applies before
    weighting. One shuffle on the group key + rank window."""
    from computer_vision_foundations_spark.operators.sample import (
        group_cap_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = group_cap_sample(docs, "source", "doc_id", 15, seed=42)
    return out.select(
        "doc_id", "source", F.col("sample_rank").cast("long").alias("sample_rank")
    )


@_register(
    "za11_weighted_sample",
    f"""
    SELECT doc_id, source, n_chars,
           round(pow({_HASH_UNIT_SQL}, 1.0 / n_chars), 7) AS sample_key
    FROM documents
    ORDER BY pow({_HASH_UNIT_SQL}, 1.0 / n_chars) DESC, doc_id
    LIMIT 100
    """,
)
def za11_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted fixed-size sample
    (operators/sample.weighted_sample_k): Efraimidis–Spirakis A-ES
    keyed on the seeded hash unit (key = u^(1/n_chars), keep the 100
    largest), so longer documents enter the pilot at rate ∝ length
    while the draw stays a pure function of (id, seed). Plans
    TakeOrderedAndProject like q83 — no full sort, no RNG state."""
    from computer_vision_foundations_spark.operators.sample import (
        weighted_sample_k,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = weighted_sample_k(docs, "doc_id", "n_chars", 100, seed=42)
    return out.select(
        "doc_id", "source", "n_chars", F.round("sample_key", 7).alias("sample_key")
    )


_BLOOM_M, _BLOOM_K = 65536, 5
_BLOOM_H1 = "('0x' || substr(md5(s), 1, 7))::BIGINT"
_BLOOM_H2 = "('0x' || substr(md5(s), 8, 7))::BIGINT"


@_register(
    "za10_bloom_decontaminate",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    e AS (SELECT unnest(shingles) AS s FROM sh WHERE doc_id % 50 = 0),
    eh AS (SELECT DISTINCT s FROM e),
    bits AS (
      SELECT DISTINCT ({_BLOOM_H1} + i * {_BLOOM_H2}) % {_BLOOM_M} AS bit
      FROM eh, generate_series(0, {_BLOOM_K - 1}) g(i)
    ),
    t AS (SELECT doc_id AS train_id, unnest(shingles) AS s
          FROM sh WHERE doc_id % 50 <> 0),
    tposd AS (
      SELECT DISTINCT s,
             ({_BLOOM_H1} + i * {_BLOOM_H2}) % {_BLOOM_M} AS bit
      FROM (SELECT DISTINCT s FROM t), generate_series(0, {_BLOOM_K - 1}) g(i)
    ),
    mem AS (
      SELECT p.s, count(*) AS need, count(b.bit) AS got
      FROM tposd p LEFT JOIN bits b USING (bit)
      GROUP BY p.s
    ),
    hits AS (
      SELECT t.train_id, count(*) AS n_shingles,
             CAST(sum(CASE WHEN m.got = m.need THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_hits
      FROM t JOIN mem m USING (s)
      GROUP BY t.train_id
    )
    SELECT train_id, n_shingles, n_bloom_hits,
           round(CAST(n_bloom_hits AS DOUBLE) / n_shingles, 6) AS hit_frac
    FROM hits
    """,
)
def za10_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-screen
    (functions/sketches.bloom_bits/bloom_membership): the eval set's
    3-gram shingles populate a 2^16-bit Bloom filter (Kirsch–
    Mitzenmacher double hashing over the portable md5 pair, k=5);
    every training document reports how many of its shingles MAYBE hit
    the filter. At 100 TB this is the cheap first pass before the
    exact q35 join: the filter is ≤ 0.5 MB broadcast however large
    the eval set, the corpus never shuffles text (probes are (id, int)
    pairs), and no-false-negatives means a zero-hit document is
    provably clean. Bit construction replays exactly in SQL, so hits
    hash-match bit-for-bit."""
    from computer_vision_foundations_spark.functions.sketches import (
        bloom_bits,
        bloom_membership,
    )
    from computer_vision_foundations_spark.operators.dedup import _with_shingles

    docs = load_table(spark, sf_dir, "documents")
    eval_sh = (
        _with_shingles(docs.filter(F.col("doc_id") % 50 == 0), "text", "doc_id", "eval_id", 3)
        .select(F.explode("_shingles").alias("s"))
    )
    bits = bloom_bits(eval_sh, "s", m=_BLOOM_M, k=_BLOOM_K)
    train_sh = (
        _with_shingles(docs.filter(F.col("doc_id") % 50 != 0), "text", "doc_id", "train_id", 3)
        .select("train_id", F.explode("_shingles").alias("s"))
    )
    mem = bloom_membership(
        train_sh.select("s").distinct(), "s", bits, keys=["s"],
        m=_BLOOM_M, k=_BLOOM_K,
    )
    return (
        train_sh.join(mem, "s")
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("maybe_member"), 1).otherwise(0))
            .cast("long")
            .alias("n_bloom_hits"),
        )
        .select(
            "train_id",
            "n_shingles",
            "n_bloom_hits",
            F.round(
                F.col("n_bloom_hits") / F.col("n_shingles"), 6
            ).alias("hit_frac"),
        )
    )


@_register(
    "za12_incremental_dedup",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fingerprint
      FROM documents
    ),
    old AS (SELECT fingerprint, min(doc_id) AS old_id
            FROM fp WHERE doc_id % 5 = 0 GROUP BY 1),
    batch AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id % 5 <> 0),
    bmin AS (SELECT fingerprint, min(doc_id) AS batch_min
             FROM batch GROUP BY 1)
    SELECT b.doc_id, b.fingerprint,
           CASE WHEN o.old_id IS NOT NULL THEN 'dup_of_snapshot'
                WHEN b.doc_id <> m.batch_min THEN 'dup_in_batch'
                ELSE 'new' END AS status,
           coalesce(o.old_id, m.batch_min) AS canonical_id
    FROM batch b
    JOIN bmin m USING (fingerprint)
    LEFT JOIN old o USING (fingerprint)
    """,
)
def za12_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup
    (operators/dedup.incremental_exact_duplicates): the daily-crawl
    flow — an existing fingerprint snapshot (here: every 5th doc,
    deduped by q83's operator) classifies a new batch into
    dup-of-snapshot / dup-in-batch / new WITHOUT rescanning old text.
    Joins carry 16-byte fingerprints only; the snapshot at 100 TB is
    one row per distinct historical document."""
    from computer_vision_foundations_spark.operators.dedup import (
        exact_duplicates,
        incremental_exact_duplicates,
    )

    docs = load_table(spark, sf_dir, "documents")
    snapshot = exact_duplicates(
        docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id"
    )
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_exact_duplicates(batch, snapshot, "text", "doc_id")


@_register(
    "q47_unigram_surprisal",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM freq)
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(-log2(f.cnt / tot.n_total)), 6) AS surprisal
    FROM tok t JOIN freq f USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def q47_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring
    (operators/perplexity.unigram_logprob_scores): mean unigram
    surprisal per document under the corpus's own token distribution —
    the cheap relational stand-in for CCNet's LM-perplexity filter
    (boilerplate and gibberish both rank as outliers). One hash agg
    builds the |vocab|-row frequency model, the token stream joins it
    (the TF-IDF shuffle budget), total-count rides a broadcast 1-row
    crossJoin."""
    from computer_vision_foundations_spark.operators.perplexity import (
        unigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = unigram_logprob_scores(docs, "text", "doc_id")
    return out.select(
        "doc_id", "n_tokens", F.round("surprisal", 6).alias("surprisal")
    )


_SQ_DIM = 64


@_register(
    "z22_sq8_ann",
    f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (
      SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
      FROM emb, generate_series(1, {_SQ_DIM}) g(i)
      GROUP BY i
    ),
    params AS (
      SELECT list(mn ORDER BY i) AS mins,
             list(CASE WHEN mx > mn THEN 255.0 / (mx - mn) ELSE 0.0 END
                  ORDER BY i) AS scales,
             list(CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 0.0 END
                  ORDER BY i) AS steps
      FROM dims
    ),
    codes AS (
      SELECT vec_id,
             list_transform(range(1, {_SQ_DIM + 1}),
               i -> least(255, greatest(0, CAST(floor(
                      (v[i] - mins[i]) * scales[i] + 0.5) AS INT)))) AS c
      FROM emb, params
    ),
    probes AS (SELECT vec_id AS probe_id, v AS pv FROM emb WHERE vec_id < 5),
    scored AS (
      SELECT p.probe_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, {_SQ_DIM + 1}),
               i -> (pv[i] - (mins[i] + c.c[i] * steps[i]))
                  * (pv[i] - (mins[i] + c.c[i] * steps[i])))), 6) AS sq_dist
      FROM probes p, codes c, params
      WHERE p.probe_id <> c.vec_id
    )
    SELECT probe_id, neighbor_id, sq_dist, rank FROM (
      SELECT *, row_number() OVER (
               PARTITION BY probe_id
               ORDER BY sq_dist ASC, neighbor_id ASC) AS rank
      FROM scored) t
    WHERE rank <= 10
    """,
)
def z22_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization (SQ8, FAISS IndexScalarQuantizer shape):
    per-dimension min/max from ONE unrolled aggregate (model-sized
    collect), uint8 encode as a narrow codegen projection, then top-10
    by squared L2 against DEQUANTIZED codes — the corpus scan reads
    uint8 codes only, the simplest compression tier below PQ (q25/q29).
    The oracle derives the same min/max from the data, so train,
    encode, and scoring all hash-match with no literals."""
    from computer_vision_foundations_spark.operators.quantization import (
        sq8_encode,
        sq8_minmax,
        sq8_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    mins, maxs = sq8_minmax(emb, "embedding", _SQ_DIM)
    codes = sq8_encode(emb, mins, maxs, "embedding")
    probes = emb.filter(F.col("vec_id") < 5)
    return sq8_topk(codes, probes, mins, maxs, k=10)


_FUNNEL_STEPS = ["view", "click", "purchase"]


@_register(
    "z15_event_funnel",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    s1 AS (SELECT user_id, min(us) AS t1 FROM e
           WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = '{_FUNNEL_STEPS[1]}' AND us > t1 GROUP BY 1),
    s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
           WHERE event_type = '{_FUNNEL_STEPS[2]}' AND us > t2 GROUP BY 1),
    c AS (
      SELECT 1 AS step, count(*) AS n_users FROM s1
      UNION ALL SELECT 2, count(*) FROM s2
      UNION ALL SELECT 3, count(*) FROM s3
    )
    SELECT step,
           (['{_FUNNEL_STEPS[0]}', '{_FUNNEL_STEPS[1]}',
             '{_FUNNEL_STEPS[2]}'])[step] AS step_name,
           n_users,
           round(n_users * 1.0 / max(n_users) OVER (), 6) AS conversion
    FROM c
    """,
)
def z15_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (operators/funnel.funnel_counts): users doing
    view → click → purchase with strictly increasing timestamps — the
    MATCH_RECOGNIZE-style analysis Spark lacks natively, re-expressed
    as scan-pruned filter + ONE shuffle on user + a linear sorted-fold
    state machine per user (codegen). The oracle computes the same
    max-step via the greedy min-after-min join chain, which is
    provably the same predicate (exchange argument)."""
    from computer_vision_foundations_spark.operators.funnel import (
        funnel_counts,
    )

    events = load_table(spark, sf_dir, "events")
    return funnel_counts(events, _FUNNEL_STEPS)


@_register(
    "z16_kfold_assignment",
    """
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
                1, 7)) AS BIGINT) % 5 AS INT) AS fold
    FROM documents
    """,
)
def z16_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold CV assignment
    (operators/split.kfold_assignment): fold = seeded md5 slice mod 5,
    a pure function of (id, seed) — stable across engines,
    partitionings, and reruns; no shuffle, no RNG state."""
    from computer_vision_foundations_spark.operators.split import (
        kfold_assignment,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return kfold_assignment(docs, "doc_id", k=5, seed=42)


def _verified_pairs_oracle_sql() -> str:
    """Compose the q26 candidate oracle with the levenshtein verify
    stage (prefix-capped, both engines' classic DP distance)."""
    cand = _ORACLES["q26_lsh_candidate_pairs"]
    return f"""
    WITH cand AS ({cand}),
    t AS (SELECT doc_id, substr(text, 1, 200) AS txt FROM documents)
    SELECT c.id_a, c.id_b,
           round(CASE WHEN greatest(length(a.txt), length(b.txt)) = 0
                 THEN 1.0
                 ELSE 1.0 - levenshtein(a.txt, b.txt)
                      / CAST(greatest(length(a.txt), length(b.txt)) AS DOUBLE)
                 END, 6) AS edit_sim
    FROM cand c
    JOIN t a ON a.doc_id = c.id_a
    JOIN t b ON b.doc_id = c.id_b
    """


@_register("za16_lsh_verified_pairs", _verified_pairs_oracle_sql())
def za16_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate verification (operators/dedup.edit_similarity_pairs):
    the MinHash-LSH candidates of q26 scored by normalized edit
    similarity over 200-char prefixes — the verify-before-drop stage a
    production dedup pipeline runs after banding. O(len²) Levenshtein
    is affordable exactly because it runs on candidate PAIRS, not the
    corpus square; JVM-side, two (id, prefix) joins."""
    from computer_vision_foundations_spark.operators.dedup import (
        edit_similarity_pairs,
        minhash_lsh_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(
        docs,
        "text",
        "doc_id",
        k=3,
        n_hashes=8,
        bands=4,
        hash_fn="md5",
        max_bucket_size=1_000,
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    out = edit_similarity_pairs(pairs, docs, "text", "doc_id", max_chars=200)
    return out.select("id_a", "id_b", "edit_sim")


@_register(
    "q95_gap_fill_locf",
    """
    WITH e AS (
      SELECT user_id AS key,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS b,
             value
      FROM events
    ),
    pb AS (SELECT key, b, avg(value) AS vb FROM e GROUP BY 1, 2),
    spans AS (SELECT key, min(b) AS lo, max(b) AS hi FROM pb GROUP BY 1),
    grid AS (SELECT key, unnest(generate_series(lo, hi)) AS b FROM spans),
    j AS (SELECT g.key, g.b, pb.vb FROM grid g LEFT JOIN pb USING (key, b))
    SELECT key,
           TIMESTAMP '1970-01-01' + b * 86400 * INTERVAL 1 SECOND AS bucket_ts,
           round(last_value(vb IGNORE NULLS) OVER (
             PARTITION BY key ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value,
           vb IS NULL AS filled
    FROM j
    """,
)
def q95_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill (operators/rollup.gap_fill_locf):
    per-user daily buckets with last-observation-carried-forward over
    the empty days — ``time_bucket_gapfill + locf``. Each key's grid
    spans only its own [min, max] bucket (sequence explode — never a
    global calendar cross-join); one agg shuffle on (key, bucket) +
    one window shuffle on key."""
    from computer_vision_foundations_spark.operators.rollup import (
        gap_fill_locf,
    )

    events = load_table(spark, sf_dir, "events")
    out = gap_fill_locf(events, "ts", "user_id", "value", 86_400)
    return out.select(
        "key",
        F.col("bucket_ts").cast("timestamp_ntz").alias("bucket_ts"),
        F.round("value", 6).alias("value"),
        "filled",
    )


@_register(
    "q96_retention_cohorts",
    """
    WITH acts AS (
      SELECT user_id AS u,
             CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS p
      FROM events
    ),
    first AS (SELECT u, min(p) AS cohort FROM acts GROUP BY 1),
    active AS (
      SELECT DISTINCT a.u, f.cohort, a.p - f.cohort AS off
      FROM acts a JOIN first f USING (u)
    ),
    counts AS (
      SELECT cohort, off, count(*) AS n_active
      FROM active GROUP BY 1, 2
    )
    SELECT c.cohort, c.off AS period_offset, c.n_active,
           round(c.n_active * 1.0 / s.n_active, 6) AS retention
    FROM counts c
    JOIN (SELECT cohort, n_active FROM counts WHERE off = 0) s
      USING (cohort)
    """,
)
def q96_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/funnel.retention_cohorts):
    users bucketed by first-seen week, tracked by activity in later
    weeks — the standard product-analytics matrix, as two hash
    aggregates + one join on (user, int) pairs. Events never shuffle
    payloads."""
    from computer_vision_foundations_spark.operators.funnel import (
        retention_cohorts,
    )

    events = load_table(spark, sf_dir, "events")
    return retention_cohorts(events, period_seconds=7 * 86_400)


def _dedup_prf_oracle_sql() -> str:
    """Candidate-generation quality: LSH candidates (q26's oracle)
    against exact Jaccard≥0.5 ground truth (the jaccard query's
    oracle), composed end-to-end."""
    truth = _ORACLES["q90_ngram_jaccard_pairs"]
    cand = _ORACLES["q26_lsh_candidate_pairs"]
    return f"""
    WITH truth AS (SELECT id_a, id_b FROM ({truth}) t0),
    cand AS (SELECT id_a, id_b FROM ({cand}) c0),
    hit AS (SELECT count(*) AS n FROM truth JOIN cand USING (id_a, id_b))
    SELECT (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM cand) AS n_candidates,
           hit.n AS n_hit,
           round(hit.n * 1.0 / nullif((SELECT count(*) FROM truth), 0), 6)
             AS recall,
           round(hit.n * 1.0 / nullif((SELECT count(*) FROM cand), 0), 6)
             AS precision
    FROM hit
    """


@_register("q98_dedup_candidate_prf", _dedup_prf_oracle_sql())
def q98_dedup_candidate_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup candidate-generation quality: precision/recall of the
    MinHash-LSH candidate pairs against exact Jaccard≥0.5 ground truth
    — the evaluation a pipeline runs before trusting an approximate
    dedup config at scale (band/row counts tune this curve). Purely
    relational composition of two already-verified queries; the oracle
    composes both oracle bodies."""
    # Each pair generator is consumed twice (the hit join and its own
    # count) — materialize the id-pair tables once instead of
    # re-running shingling + banding per consumer (triangles.py
    # discipline; the blocks are (long, long) rows).
    truth = (
        q90_ngram_jaccard_pairs(spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    cand = (
        q26_lsh_candidate_pairs(spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    hit = truth.join(cand, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(F.broadcast(hit))
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.round(
                F.col("n_hit")
                / F.when(F.col("n_truth") > 0, F.col("n_truth")),
                6,
            ).alias("recall"),
            F.round(
                F.col("n_hit")
                / F.when(F.col("n_candidates") > 0, F.col("n_candidates")),
                6,
            ).alias("precision"),
        )
    )


def _dhash_oracle_sql() -> str:
    """Replay decode→dHash: pixel (r, c) is byte r·9+c of the text
    (zero-padded to 72 — PNG is lossless and the grid needs no
    resize), bit (r, c) set when the left pixel is darker."""
    rows = []
    for r in range(8):
        terms = " + ".join(
            f"(CASE WHEN p[{r * 9 + c + 1}] < p[{r * 9 + c + 2}] "
            f"THEN {1 << c} ELSE 0 END)"
            for c in range(8)
        )
        rows.append(f"({terms})")
    fmt = "%02x" * 8
    args = ", ".join(rows)
    return f"""
    WITH px AS (
      SELECT doc_id,
             list_transform(range(1, 74),
               i -> CASE WHEN i <= length(text)
                    THEN ascii(substr(text, i, 1)) ELSE 0 END) AS p
      FROM documents
    )
    SELECT doc_id, printf('{fmt}', {args}) AS dhash FROM px
    """


@_register("q99_image_dhash", _dhash_oracle_sql())
def q99_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing (functions/image.image_dhash): each
    document's leading bytes become a REAL 8×9 grayscale PNG, the
    dependency-free codec decodes it, and the 64-bit difference hash
    (adjacent-pixel darkness comparisons, the standard CV near-dup
    fingerprint) comes back as 16 hex chars — the image-dedup
    fingerprint that feeds Hamming-LSH banding at scale. PNG is
    lossless and the grid needs no resize, so the oracle replays
    decode→hash exactly from character codes."""
    from computer_vision_foundations_spark.functions.image import (
        encode_text_png_8x9,
        image_dhash,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        image_dhash(encode_text_png_8x9(F.col("text"))).alias("dhash"),
    )


def _bpe_oracle_sql(n_merges: int = 30) -> str:
    """Unrolled BPE training in SQL (one MATERIALIZED CTE pair per
    round — plain CTEs inline and the plan doubles per round, the same
    trap PageRank hit in Spark). The greedy left-to-right
    non-overlapping merge is expressed as a string ``replace`` over a
    DOUBLE-separator symbol encoding: each symbol is wrapped in two
    chr(31)s, the pattern consumes one boundary separator on each side
    and the replacement restores one — so adjacent occurrences chain
    correctly and cross-symbol substring matches are impossible.
    Verified equal to the pure-Python reference in tests/test_bpe.py's
    construction."""
    sep = "chr(31)"
    parts = [
        f"""w0 AS MATERIALIZED (
      SELECT {sep} || {sep}
             || array_to_string(string_split(word, ''), {sep} || {sep})
             || {sep} || {sep} AS w, cnt
      FROM (SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE length(word) > 0 GROUP BY word) t0)"""
    ]
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""m{r} AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT syms[i] AS a, syms[i + 1] AS b, sum(cnt) AS n
        FROM (SELECT list_filter(string_split(w, {sep}), x -> x <> '') AS syms,
                     cnt
              FROM {prev}) s,
             unnest(range(1, greatest(len(syms), 1))) t(i)
        GROUP BY 1, 2) p
      WHERE n >= 2
      ORDER BY n DESC, a ASC, b ASC LIMIT 1)"""
        )
        parts.append(
            f"""w{r} AS MATERIALIZED (
      SELECT replace(w, {sep} || m.a || {sep} || {sep} || m.b || {sep},
                     {sep} || m.a || m.b || {sep}) AS w, cnt
      FROM {prev}, m{r} m)"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT {r - 1} AS merge_idx, a AS left_sym, b AS right_sym, "
        f"a || b AS merged FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT * FROM (\n      {union}) t"
    )


@_register("q97_bpe_merges", _bpe_oracle_sql())
def q97_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (operators/bpe.bpe_train): the 30 most
    frequent adjacent-symbol merges learned from the corpus's
    word-frequency table — ONE corpus scan, then vocab-sized rounds
    (Sennrich et al. 2016 shape). Deterministic (lexicographic tie
    break), so even this iterative-argmax training has a FULL
    differential oracle: 30 unrolled MATERIALIZED-CTE rounds whose
    greedy rewrite is a double-separator string replace — the whole
    merge sequence hash-matches. Exact agreement with a pure-Python
    reference is additionally pytest-verified (tests/test_bpe.py)."""
    from computer_vision_foundations_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=30)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "merge_idx int, left_sym string, right_sym string, merged string",
    )


# ---------------------------------------------------------------------------
# Round-3 wave three: substring-span dedup, JL projection, distributed PCA
# (z-prefix => sorts after q99: stays OUT of the driver's 50-slot window
# this round — every current q01–q50 occupant still awaits its first
# driver verification — and rotates in next round per README.)
# ---------------------------------------------------------------------------

_SPAN_N, _SPAN_MIN_DF = 8, 2


@_register(
    "q05_duplicated_spans",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), occ AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               array_to_string(list_slice(t, u.i + 1, u.i + {_SPAN_N}), ' ')
                   AS span
        FROM toks, unnest(range(len(t) - {_SPAN_N} + 1)) u(i)
        WHERE len(t) >= {_SPAN_N}
    ), freq AS (
        SELECT span FROM occ
        GROUP BY span HAVING count(DISTINCT doc_id) >= {_SPAN_MIN_DF}
    ), dup AS (
        SELECT o.doc_id, o.pos FROM occ o JOIN freq f USING (span)
    ), flagged AS (
        SELECT doc_id, pos,
               CASE WHEN coalesce(pos > max(pos + {_SPAN_N}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    TRUE)
               THEN 1 ELSE 0 END AS new_island
        FROM dup
    ), islands AS (
        SELECT doc_id, pos,
               sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM flagged
    ), agg AS (
        SELECT doc_id, island, min(pos) AS s, max(pos) + {_SPAN_N} AS e
        FROM islands GROUP BY doc_id, island
    ), per_doc AS (
        SELECT doc_id, count(*) AS dup_islands, sum(e - s) AS dup_tokens
        FROM agg GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(coalesce(p.dup_islands, 0) AS BIGINT) AS dup_islands,
           CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(coalesce(p.dup_tokens, 0) * 1.0
                 / len(string_split(d.text, ' ')), 6) AS dup_fraction
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def q05_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup profile (Lee et al. 2021 semantics,
    fixed-n formulation — `operators/spans.py`): every {n}-token window
    occurring in ≥2 distinct documents marks its positions duplicated;
    overlapping windows merge into maximal islands per document
    (gaps-and-islands window), yielding a duplicated-token fraction.
    Scale shape: text never leaves the map-side shingle projection;
    the frequency agg runs on 16-byte hashes; the frequent-span
    semi-join is LINEAR (no pair formation, so no quadratic risk on
    hot spans); islands window partitions by document. Oracle replays
    the whole chain on raw span strings."""
    from computer_vision_foundations_spark.operators.spans import (
        duplicated_span_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_stats(
        docs, n=_SPAN_N, min_doc_freq=_SPAN_MIN_DF
    )


_JL_OUT_DIM, _JL_SEED = 8, 42


def _jl_oracle_sql() -> str:
    """Replay the seeded ±1/√k sign matrix as DuckDB literals (the
    LSH-planes / PQ-codebook pattern): p_j = list_dot_product of the
    f64-cast embedding with row j, rounded to 6 — both engines
    accumulate the dot sequentially ascending, so values agree."""
    from computer_vision_foundations_spark.operators.projection import (
        jl_sign_matrix,
    )

    rows = jl_sign_matrix(64, _JL_OUT_DIM, _JL_SEED)
    cols = ",\n           ".join(
        f"round(list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(x) for x in row)}]), 6) AS p{j}"
        for j, row in enumerate(rows)
    )
    return f"SELECT vec_id,\n           {cols}\n    FROM embeddings"


@_register("q06_random_projection", _jl_oracle_sql())
def q06_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64→8 dims
    (`operators/projection.py`): seeded ±1/√k sign matrix embedded as
    plan literals, projection as a JVM HOF fold — one narrow codegen
    projection, no shuffle, no Python. The md5-derived matrix is
    re-derived bit-for-bit by the oracle generator."""
    from computer_vision_foundations_spark.operators.projection import (
        random_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = random_projection(
        emb, "embedding", out_dim=_JL_OUT_DIM, seed=_JL_SEED
    )
    return out.select(
        "vec_id",
        *[
            F.element_at("projected", j + 1).alias(f"p{j}")
            for j in range(_JL_OUT_DIM)
        ],
    )


@_register(
    "q09_pca_covariance",
    """
    WITH x AS (
        -- same 1e-6 fixed-point grid as operators/projection.py
        -- (_GRAM_SCALE): floor(x*1e6 + 0.5) = round-half-up, then all
        -- sums are exact integers, so the result is reduction-order
        -- free on BOTH engines.
        SELECT vec_id, CAST(u.i AS INTEGER) AS i,
               CAST(floor(CAST(embedding[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                          * 1000000.0 + 0.5) AS BIGINT) AS q
        FROM embeddings, unnest(range(len(embedding))) u(i)
    ), n AS (
        SELECT count(*) AS n FROM embeddings
    ), m AS (
        SELECT i, sum(q) AS sq FROM x GROUP BY i
    ), g AS (
        SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS sxy
        FROM x a JOIN x b USING (vec_id)
        GROUP BY a.i, b.i
    )
    SELECT g.i, g.j,
           round(CAST(g.sxy AS DOUBLE) / CAST(n.n AS DOUBLE) / 1e12
                 - (CAST(mi.sq AS DOUBLE) / CAST(n.n AS DOUBLE) / 1e6)
                   * (CAST(mj.sq AS DOUBLE) / CAST(n.n AS DOUBLE) / 1e6),
                 6) AS cov
    FROM g
    CROSS JOIN n
    JOIN m mi ON mi.i = g.i
    JOIN m mj ON mj.i = g.j
    """,
)
def q09_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed stage of PCA (`operators/projection.py`): the
    64×64 population covariance of the embedding corpus via ONE
    Arrow-batched partial-Gramian pass (`mapInPandas` emits d² partial
    sums per PARTITION — model-sized rows, never per-document) and a
    (i, j) hash aggregate. Accumulation is EXACT fixed-point (1e-6
    grid, int64 partials, DECIMAL(38,0) cross-partition sums), so the
    driver hash cannot flip with partition order — the round-4 flake
    class is structurally closed. The driver-side eigensolve that consumes
    this matrix is pytest-verified (orthonormality, variance order,
    reconstruction); this query differential-checks the part that
    actually touches 100 TB. Oracle computes the same covariance by
    dimension explode + self-join (the small-scale SQL shape)."""
    from computer_vision_foundations_spark.operators.projection import (
        covariance_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return covariance_matrix(emb, "embedding")


def _hits_oracle() -> str:
    from computer_vision_foundations_spark.operators.hits import (
        hits_oracle_sql,
    )

    return hits_oracle_sql(_PR_EDGES_SQL, n_iter=5, round_digits=6)


@_register("q10_hits_scores", _hits_oracle())
def q10_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (`operators/hits.py`) over the same
    supplier↔customer trade graph as q07: the second link-graph
    curation signal (authorities = canonical pages, hubs = link-farm
    boilerplate). 5 L2-normalized power iterations; per half-step
    localCheckpoint (the PageRank discipline — a lazy unroll is 2^n);
    shuffles carry (node, double) only; norms are broadcast 1-row
    aggregates. Oracle unrolls the identical recurrence as CTEs."""
    from computer_vision_foundations_spark.operators.hits import hits

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count("*").alias("n_items"))
    )
    fwd = pairs.select(
        F.col("l_suppkey").alias("src"), (-F.col("o_custkey")).alias("dst")
    )
    back = pairs.filter(F.col("n_items") >= 2).select(
        (-F.col("o_custkey")).alias("src"), F.col("l_suppkey").alias("dst")
    )
    out = hits(fwd.unionByName(back), n_iter=5)
    return out.select(
        "node",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


@_register(
    "q11_bigram_surprisal",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               t[CAST(u.i AS INTEGER) + 1] AS token,
               CASE WHEN u.i > 0 THEN t[CAST(u.i AS INTEGER)] END AS prev
        FROM toks, unnest(range(len(t))) u(i)
    ), uni AS (
        SELECT token, count(*) AS ucnt FROM pos GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(ucnt) AS DOUBLE) AS n FROM uni
    ), bi AS (
        SELECT prev, token, count(*) AS bcnt FROM pos
        WHERE prev IS NOT NULL GROUP BY 1, 2
    ), ptot AS (
        SELECT prev, CAST(sum(bcnt) AS DOUBLE) AS pcnt FROM bi GROUP BY 1
    )
    SELECT p.doc_id, count(*) AS n_tokens,
           round(avg(-log2(CASE WHEN p.prev IS NULL THEN u.ucnt / tot.n
               ELSE {0.75!r} * coalesce(b.bcnt / pt.pcnt, 0.0)
                    + {1.0 - 0.75!r} * (u.ucnt / tot.n) END)), 6)
               AS surprisal
    FROM pos p
    JOIN uni u USING (token)
    CROSS JOIN tot
    LEFT JOIN bi b ON b.prev = p.prev AND b.token = p.token
    LEFT JOIN ptot pt ON pt.prev = p.prev
    GROUP BY p.doc_id
    """,
)
def q11_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram surprisal
    (operators/perplexity.bigram_logprob_scores): the Jelinek-Mercer
    step up from q47's unigram proxy — p = λ·p(t|prev) + (1−λ)·p(t),
    first token unigram-only. Still all-relational: two model
    aggregates (|vocab| and |distinct bigrams| rows), three hash joins
    on the (id, pos, prev, token) stream, interpolation in codegen.
    The oracle replays the identical λ literals."""
    from computer_vision_foundations_spark.operators.perplexity import (
        bigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = bigram_logprob_scores(docs, "text", "doc_id", lam=0.75)
    return out.select(
        "doc_id", "n_tokens", F.round("surprisal", 6).alias("surprisal")
    )


@_register(
    "q12_dsir_weights",
    """
    WITH raw_tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), tgt_tok AS (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM documents WHERE lang = 'en'
    ), raw_freq AS (
        SELECT token, count(*) AS raw_cnt FROM raw_tok GROUP BY 1
    ), tgt_freq AS (
        SELECT token, count(*) AS tgt_cnt FROM tgt_tok GROUP BY 1
    ), vocab AS (
        SELECT coalesce(r.token, t.token) AS token,
               coalesce(r.raw_cnt, 0) AS raw_cnt,
               coalesce(t.tgt_cnt, 0) AS tgt_cnt
        FROM raw_freq r FULL OUTER JOIN tgt_freq t USING (token)
    ), consts AS (
        SELECT CAST(sum(raw_cnt) AS DOUBLE) AS raw_n,
               CAST(sum(tgt_cnt) AS DOUBLE) AS tgt_n,
               CAST(count(*) AS DOUBLE) AS v
        FROM vocab
    ), ratio AS (
        SELECT token,
               log2((tgt_cnt + 1.0) / (c.tgt_n + 1.0 * c.v))
               - log2((raw_cnt + 1.0) / (c.raw_n + 1.0 * c.v)) AS logratio
        FROM vocab CROSS JOIN consts c
    )
    SELECT rt.doc_id, count(*) AS n_tokens,
           round(avg(r.logratio), 6) AS dsir_weight
    FROM raw_tok rt JOIN ratio r USING (token)
    GROUP BY rt.doc_id
    """,
)
def q12_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (`operators/dsir.py` — Xie et al. 2023
    shape): mean per-token log-likelihood ratio of a TARGET unigram
    model (here the lang='en' slice stands in for a curated corpus)
    over the RAW model, Laplace-smoothed on the union vocabulary.
    Feed the weight column to `weighted_sample_k` (q45's seeded A-ES)
    for the resampling step. Two |vocab|-row model aggregates + one
    stream join — the TF-IDF shuffle budget; oracle replays the exact
    smoothing literals."""
    from computer_vision_foundations_spark.operators.dsir import (
        dsir_logratio_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_logratio_weights(
        docs, docs.filter(F.col("lang") == "en"), "text", "doc_id"
    )
    return out.select(
        "doc_id", "n_tokens", F.round("dsir_weight", 6).alias("dsir_weight")
    )


@_register(
    "q13_incremental_lsh",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sig AS (
      SELECT doc_id, [
        {", ".join(_minhash_perm_sql(s) for s in range(8))}
      ] AS sig FROM sh),
    banded AS (
      SELECT doc_id, 0 AS band_idx, array_to_string(sig[1:2], ',') AS band_key FROM sig
      UNION ALL
      SELECT doc_id, 1, array_to_string(sig[3:4], ',') FROM sig
      UNION ALL
      SELECT doc_id, 2, array_to_string(sig[5:6], ',') FROM sig
      UNION ALL
      SELECT doc_id, 3, array_to_string(sig[7:8], ',') FROM sig
    ),
    lab AS (
      SELECT doc_id, band_idx, band_key,
             CASE WHEN doc_id % 5 = 0 THEN 'snapshot' ELSE 'batch' END AS side
      FROM banded
    )
    SELECT DISTINCT p.doc_id AS batch_id, b.doc_id AS match_id,
           b.side AS origin
    FROM lab p JOIN lab b USING (band_idx, band_key)
    WHERE p.side = 'batch'
      AND (b.side = 'snapshot'
           OR (b.side = 'batch' AND p.doc_id < b.doc_id))
    """,
)
def q13_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup flow
    (operators/dedup.incremental_lsh_candidates): the daily-crawl
    sibling of q46 — a new batch (doc_id%5!=0) is banded against a
    persisted MinHash-signature snapshot of the indexed corpus
    (doc_id%5==0, built by `minhash_signatures`) WITHOUT rescanning
    old text. Snapshot side carries index-sized rows (id + 8 minima);
    only the batch runs the shingle→hash→agg pipeline. Portable md5
    double-hash family so the oracle rebuilds identical signatures and
    replays the band join + side classification."""
    from computer_vision_foundations_spark.operators.dedup import (
        incremental_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    snapshot = minhash_signatures(
        docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id",
        k=3, n_hashes=8, hash_fn="md5",
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    # max_bucket_size=None matches the oracle, which models no bucket
    # cap: a band bucket exceeding the default 1000-doc cap at a larger
    # scale factor would otherwise silently diverge the differential
    # check (production callers keep the cap ON).
    return incremental_lsh_candidates(
        batch, snapshot, "text", "doc_id",
        k=3, n_hashes=8, bands=4, hash_fn="md5",
        max_bucket_size=None,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


@_register(
    "q14_cdc_dedup",
    """
    WITH d AS (
        SELECT doc_id, text, length(text) AS n FROM documents
        WHERE length(text) >= 1
    ), b AS (
        SELECT doc_id, CAST(u.i AS INTEGER) AS pos
        FROM d, unnest(range(8, n + 1)) u(i)
        WHERE CAST(('0x' || substr(md5(substr(text,
                  CAST(u.i AS INTEGER) - 7, 8)), 1, 7)) AS BIGINT) % 32 = 0
          AND u.i < n
    ), starts AS (
        SELECT doc_id, 1 AS s FROM d
        UNION ALL
        SELECT doc_id, pos + 1 FROM b
    ), chunks AS (
        SELECT s.doc_id, s.s AS cs,
               coalesce(lead(s.s) OVER (PARTITION BY s.doc_id ORDER BY s.s),
                        d.n + 1) - s.s AS cl
        FROM starts s JOIN d USING (doc_id)
    ), hashed AS (
        SELECT c.doc_id, c.cl,
               md5(substr(d.text, c.cs, c.cl)) AS h
        FROM chunks c JOIN d USING (doc_id)
    ), shared AS (
        SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), flagged AS (
        SELECT hashed.doc_id, count(*) AS shared_chunks,
               sum(cl) AS shared_chars
        FROM hashed JOIN shared USING (h)
        GROUP BY hashed.doc_id
    ), totals AS (
        SELECT doc_id, count(*) AS n_chunks, sum(cl) AS total_chars
        FROM hashed GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(t.n_chunks AS BIGINT) AS n_chunks,
           CAST(coalesce(f.shared_chunks, 0) AS BIGINT) AS shared_chunks,
           CAST(coalesce(f.shared_chars, 0) AS BIGINT) AS shared_chars,
           round(coalesce(f.shared_chars, 0) * 1.0 / t.total_chars, 6)
               AS dedup_fraction
    FROM totals t LEFT JOIN flagged f USING (doc_id)
    """,
)
def q14_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup profile (`operators/cdc.py`):
    rsync/LBFS-style storage dedup — chunk boundaries where an 8-char
    window hash ≡ 0 (mod 32), so identical regions across documents
    produce identical chunk hashes regardless of what precedes them.
    Per-document fraction of characters a content-addressed store
    would deduplicate. Boundary detection is a map-side array
    expression; the only shuffle carries (doc, chunk_hash) rows.
    The oracle replays the identical window-hash boundary rule."""
    from computer_vision_foundations_spark.operators.cdc import (
        chunk_dedup_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chunk_dedup_stats(
        docs, "text", "doc_id", w=8, modulus=32,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


@_register(
    "q15_temperature_mixture",
    """
    WITH sizes AS (
        SELECT source AS domain, CAST(count(*) AS DOUBLE) AS n
        FROM documents GROUP BY source
    ), powed AS (
        SELECT domain, n, pow(n, 1.0 / 2.0) AS pw FROM sizes
    ), z AS (
        SELECT sum(pw) AS z FROM powed
    )
    SELECT domain, CAST(n AS BIGINT) AS n_tokens,
           round(pw / z.z, 6) AS mix_weight,
           round(least(1.0, 300.0 * (pw / z.z) / n), 6) AS keep_frac
    FROM powed CROSS JOIN z
    """,
)
def q15_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights
    (operators/mixture.temperature_fractions — the UniMax/mT5
    multilingual sampling recipe): mixing weight ∝ size^(1/T) with
    T=2, keep fractions for a 300-doc budget. One |domains|-row
    aggregate + broadcast normalizer; the corpus never shuffles."""
    from computer_vision_foundations_spark.operators.mixture import (
        temperature_fractions,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_fractions(docs, temperature=2.0, budget=300.0)
    return out.select(
        "domain",
        "n_tokens",
        F.round("mix_weight", 6).alias("mix_weight"),
        F.round("keep_frac", 6).alias("keep_frac"),
    )


@_register(
    "q18_skew_profile",
    """
    WITH counts AS (
        SELECT o_custkey AS key, count(*) AS n_rows
        FROM orders GROUP BY o_custkey
    ), totals AS (
        SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
               greatest(avg(n_rows), 1.0) AS mean_rows
        FROM counts
    )
    SELECT key, n_rows, round(n_rows / t.total, 6) AS share,
           greatest(1, CAST(ceil(n_rows / t.mean_rows) AS BIGINT))
               AS suggested_salt
    FROM counts CROSS JOIN totals t
    ORDER BY n_rows DESC, key
    LIMIT 10
    """,
)
def q18_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (operators/skew.skew_profile): the
    top-10 heaviest orders.o_custkey values with their row share and a
    suggested salt factor — the pre-flight check before deciding
    between a plain join, `salted_join`, or trusting AQE skew
    handling. One hash agg + TakeOrdered top-n."""
    from computer_vision_foundations_spark.operators.skew import skew_profile

    orders = load_table(spark, sf_dir, "orders")
    return skew_profile(orders, "o_custkey", top_n=10)


@_register(
    "q23_corpus_report",
    """
    WITH tok AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
               md5(text) AS fp
        FROM documents
    ), dup AS (
        SELECT source,
               count(*) - count(DISTINCT fp) AS dup_docs
        FROM tok GROUP BY source
    ), stream AS (
        SELECT t.doc_id, t.source, u.token
        FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
              FROM documents) AS u
        JOIN tok t USING (doc_id)
    ), freq AS (
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) x
        GROUP BY token
    ), tot AS (
        SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM freq
    ), surp AS (
        SELECT s.doc_id, s.source,
               avg(-log2(f.cnt / tot.n)) AS doc_surprisal
        FROM stream s JOIN freq f USING (token) CROSS JOIN tot
        GROUP BY s.doc_id, s.source
    )
    SELECT t.source,
           count(*) AS n_docs,
           CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
           round(avg(t.n_tokens), 6) AS mean_tokens,
           CAST(max(d.dup_docs) AS BIGINT) AS dup_docs,
           round(avg(s.doc_surprisal), 6) AS mean_surprisal,
           round(quantile_cont(s.doc_surprisal, 0.5), 6) AS median_surprisal
    FROM tok t
    JOIN dup d ON d.source = t.source
    JOIN surp s ON s.doc_id = t.doc_id
    GROUP BY t.source
    """,
)
def q23_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation dashboard — the summary a data lead
    reads before a training run: document/token volumes, exact-dup
    count, and the surprisal distribution (mean + exact median), all
    composed from the individually-verified signal operators in ONE
    query. Shuffle budget: the md5 dedup agg, the token-stream model
    join (q47's budget), and a final per-source agg with an exact
    median (percentile on doc-level rows — |docs| per source, fine at
    any corpus scale since the doc-level stats frame is already
    reduced)."""
    from computer_vision_foundations_spark.operators.perplexity import (
        unigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("text").cast("binary")).alias("fp"),
    )
    dup = base.groupBy("source").agg(
        (F.count(F.lit(1)) - F.count_distinct("fp")).alias("dup_docs")
    )
    surp = unigram_logprob_scores(docs, "text", "doc_id").select(
        "doc_id", F.col("surprisal").alias("doc_surprisal")
    )
    joined = base.join(surp, "doc_id").join(F.broadcast(dup), "source")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
        F.max("dup_docs").cast("long").alias("dup_docs"),
        F.round(F.avg("doc_surprisal"), 6).alias("mean_surprisal"),
        F.round(
            F.expr("percentile(doc_surprisal, 0.5)"), 6
        ).alias("median_surprisal"),
    )


@_register(
    "q30_volume_drift",
    """
    WITH daily AS (
        SELECT event_type AS category,
               strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               count(*) AS n_events
        FROM events GROUP BY 1, 2, 3
    ), win AS (
        SELECT category, day, n_events,
               avg(n_events) OVER w AS m,
               stddev_samp(CAST(n_events AS DOUBLE)) OVER w AS sd,
               count(*) OVER w AS prior
        FROM daily
        WINDOW w AS (PARTITION BY category ORDER BY day_num
                     RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT category, day, n_events,
           round(m, 6) AS trail_mean,
           round(CASE WHEN prior >= 2 AND sd > 0
                      THEN (n_events - m) / sd END, 6) AS z,
           coalesce(abs(CASE WHEN prior >= 2 AND sd > 0
                             THEN (n_events - m) / sd END) > 3.0,
                    FALSE) AS is_anomaly,
           (prior >= 2 AND sd = 0 AND n_events <> m) AS constant_jump
    FROM win
    """,
)
def q30_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category daily-volume drift detection
    (operators/drift.volume_drift): trailing-7-day z-score with the
    current day EXCLUDED from its own baseline — the standard cheap
    ingest-monitoring alarm. One hash agg to daily counts (the
    reduction — category×day rows are tiny at any corpus scale) + one
    window shuffle on the category key."""
    from computer_vision_foundations_spark.operators.drift import (
        volume_drift,
    )

    events = load_table(spark, sf_dir, "events")
    out = volume_drift(events, "ts", "event_type", window_days=7)
    return out.withColumn("day", F.date_format("day", "yyyy-MM-dd"))


@_register(
    "q31_corpus_diff",
    """
    WITH old AS (
        SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 11 <> 3
    ), new AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                        ELSE text END) AS fp
        FROM documents WHERE doc_id % 17 <> 5
    )
    SELECT CASE WHEN o.fp IS NULL THEN 'added'
                WHEN n.fp IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'modified'
                ELSE 'unchanged' END AS status,
           count(*) AS n
    FROM old o FULL OUTER JOIN new n USING (doc_id)
    GROUP BY 1
    """,
)
def q31_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (operators/diff.py): the added / removed /
    modified / unchanged audit between two dataset versions — here the
    old version drops every doc_id ≡ 3 (mod 11) and the new version
    rewrites every doc_id ≡ 0 (mod 13). Bodies hash map-side; the
    full-outer join shuffles (id, fingerprint) pairs only."""
    from computer_vision_foundations_spark.operators.diff import (
        snapshot_diff_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 3)
    new = docs.filter(F.col("doc_id") % 17 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff_counts(old, new)


@_register(
    "q37_temporal_split",
    """
    SELECT CASE WHEN ts <= TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
                WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 'test'
                ELSE 'purged' END AS split,
           count(*) AS n,
           CAST(min(event_id) AS BIGINT) AS min_event,
           CAST(max(event_id) AS BIGINT) AS max_event
    FROM events
    GROUP BY 1
    """,
)
def q37_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged temporal split (operators/split.temporal_split): train ≤
    2024-01-20, test ≥ 2024-01-22, the 2-day embargo gap 'purged' so
    boundary leakage cannot contaminate evaluation — the leakage-free
    eval split a time-series pipeline needs. Pure projection, no
    shuffle before the audit aggregate."""
    from computer_vision_foundations_spark.operators.split import (
        temporal_split,
    )

    events = load_table(spark, sf_dir, "events")
    out = temporal_split(
        events, "ts", "2024-01-20 00:00:00", "2024-01-22 00:00:00"
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").cast("long").alias("min_event"),
        F.max("event_id").cast("long").alias("max_event"),
    )


@_register(
    "q38_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ), counts AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6)
               AS p_transition
    FROM counts
    """,
)
def q38_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between consecutive events per
    user (operators/funnel.event_transition_matrix): counts +
    per-from_type probabilities — the behavioral twin of the text
    bigram LM (z05). One lead window on the per-user timeline
    (deterministic ts, event_id ordering) + one hash aggregate."""
    from computer_vision_foundations_spark.operators.funnel import (
        event_transition_matrix,
    )

    events = load_table(spark, sf_dir, "events")
    return event_transition_matrix(events)


@_register(
    "q39_image_metadata",
    """
    SELECT doc_id,
           24 AS height, 24 AS width, 1 AS layers,
           'L' AS mode, 'JPEG' AS format,
           source AS exif_make, lang AS exif_model
    FROM documents
    WHERE length(text) >= 9
    """,
)
def q39_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-metadata pandas UDF (reference U1 schema,
    `02_Data Ingest.py:191-199`) over REAL JPEG bytes with REAL EXIF:
    each document becomes a 24×24 JPEG whose APP1/TIFF segment carries
    Make=source, Model=lang (`functions/png.build_exif_app1` writes
    genuine TIFF IFD layout; `parse_jpeg_exif` reads it back inside
    `get_image_metadata`). The oracle states what the round trip must
    recover — upgrading U1 from schema-verified to a full value-hash
    differential check of the encode→EXIF-write→SOF/TIFF-parse chain.
    Narrow Arrow projections only; no shuffle."""
    from computer_vision_foundations_spark.functions.image import (
        encode_doc_jpeg_with_exif,
        get_image_metadata,
    )

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 9)
    out = docs.withColumn(
        "metadata",
        get_image_metadata(
            encode_doc_jpeg_with_exif(
                F.col("text"), F.col("source"), F.col("lang")
            )
        ),
    )
    return out.select(
        "doc_id",
        F.col("metadata.height").alias("height"),
        F.col("metadata.width").alias("width"),
        F.col("metadata.layers").alias("layers"),
        F.col("metadata.mode").alias("mode"),
        F.col("metadata.format").alias("format"),
        F.col("metadata.exif.Make").alias("exif_make"),
        F.col("metadata.exif.Model").alias("exif_model"),
    )


def _mmr_oracle() -> str:
    from computer_vision_foundations_spark.operators.mmr import mmr_oracle_sql

    src = (
        "SELECT vec_id, list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
        ") AS relevance, embedding FROM embeddings "
        "WHERE vec_id > 0 AND vec_id <= 200"
    )
    return mmr_oracle_sql(
        src, k=10, lam=0.7, id_expr="vec_id", out_id="vec_id"
    )


@_register("q21_mmr_diverse_topk", _mmr_oracle())
def q21_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diverse top-k (`operators/mmr.py` — Carbonell & Goldstein
    1998): greedy λ·relevance − (1−λ)·max-sim selection, k=10 λ=0.7,
    relevance = cosine to probe vec_id=0 over candidates 1..200.
    One-scan execution (round 4): a single TakeOrderedAndProject pulls
    the top-M candidates by relevance, the greedy recurrence runs
    driver-side over the model-sized M×dim slice, and a per-round
    score bound PROVES equivalence to full greedy (growing M and
    rescanning when it can't — never silent approximation); the oracle
    unrolls all 10 rounds as MATERIALIZED CTEs with the identical
    rounded-score tie-break, so the greedy SEQUENCE replays exactly."""
    from computer_vision_foundations_spark.functions.vectors import (
        cosine_similarity,
    )
    from computer_vision_foundations_spark.operators.mmr import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    probe_lit = F.array(*[F.lit(float(x)) for x in probe])
    cand = emb.filter((F.col("vec_id") > 0) & (F.col("vec_id") <= 200)).select(
        "vec_id",
        "embedding",
        cosine_similarity(F.col("embedding"), probe_lit).alias("relevance"),
    )
    return mmr_select(
        cand, k=10, lam=0.7, relevance_col="relevance",
        vec_col="embedding", id_col="vec_id",
    )


@_register("q19_persisted_ivf_pq", _ivf_pq_oracle_sql())
def q19_persisted_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index lifecycle (`operators/ann_index.py`): build
    the IVF-PQ index to disk (codes parquet PARTITIONED BY cell +
    model-sized META.json), then answer q50's exact query by reading
    the STORED codes — the cell equi-join plans a dynamic
    partition-pruning subquery, so unprobed cells' files are never
    read. Same parameters as q50, so its oracle verifies the entire
    build→persist→load→query round trip hash-for-hash."""
    import tempfile

    from computer_vision_foundations_spark.operators.ann_index import (
        build_ivf_pq_index,
        query_ivf_pq_index,
    )
    from computer_vision_foundations_spark.operators.quantization import (
        pq_codebooks,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    cents = random_centroids(_IVF_DIM, _IVF_CELLS, _IVF_SEED)
    path = build_ivf_pq_index(
        emb, tempfile.mkdtemp(prefix="ivfpq_idx_"), cbs, cents
    )
    return query_ivf_pq_index(
        spark, path, probes, k=10, n_probe_cells=_IVF_PROBE_CELLS
    )


@_register(
    "q03_time_travel",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders WHERE o_orderkey % 4 IN (0, 1)
    GROUP BY o_orderstatus
    """,
)
def q03_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional-table time travel (`sources/acid.py` — the
    Delta-shaped log-structured format over plain parquet): create a
    table from orders with o_orderkey%4==0 (v1), ACID-append the
    %4==1 slice (v2), then DELETE half of it (v3) — and read AS OF
    version 2, which must bypass the later delete and resolve to
    exactly v1+v2's immutable files. The oracle aggregates the same
    two slices straight from the source table, so a time-travel read
    that leaked v3's delete (or missed v2's append) hash-fails."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        delete_where,
        read_table,
        write_append,
    )

    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="acid_tt_")
    create_table(spark, root, orders.filter(F.col("o_orderkey") % 4 == 0))
    write_append(spark, root, orders.filter(F.col("o_orderkey") % 4 == 1))
    delete_where(spark, root, F.col("o_orderkey") % 8 == 1)
    snap = read_table(spark, root, version=2)
    return snap.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@_register(
    "q24_acid_upsert",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN 'PLATINUM'
                ELSE c_mktsegment END AS c_mktsegment,
           round(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000.0
                 ELSE c_acctbal END, 2) AS c_acctbal
    FROM customer
    UNION ALL
    SELECT -1 AS c_custkey, 'PLATINUM' AS c_mktsegment, 0.0 AS c_acctbal
    """,
)
def q24_acid_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE (`sources/acid.py:upsert` — the batch twin
    of the streaming foreachBatch upsert): customers land as a
    transactional table, an update batch promotes every 10th customer
    (same key -> replace) and inserts one new key (-1); only files
    containing a matched key are rewritten (found by ONE broadcast
    semi-join over input_file_name, no table shuffle). The oracle
    replays the merge as a CASE projection + the inserted row."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        read_table,
        upsert,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    root = tempfile.mkdtemp(prefix="acid_up_")
    create_table(spark, root, cust)
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.lit("PLATINUM").alias("c_mktsegment"),
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        )
        .unionByName(
            spark.createDataFrame(
                [(-1, "PLATINUM", 0.0)],
                "c_custkey long, c_mktsegment string, c_acctbal double",
            )
        )
    )
    upsert(spark, root, updates, ["c_custkey"])
    out = read_table(spark, root)
    return out.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )


@_register(
    "q25_wav_audio_stats",
    """
    WITH samples AS (
        SELECT doc_id, length(text) AS n, u.i AS i,
               (ord(substr(text, CAST(u.i + 1 AS INTEGER), 1)) - 128) * 256 AS s
        FROM documents, unnest(range(length(text))) u(i)
        WHERE length(text) >= 32
    ), seq AS (
        SELECT doc_id, n, i, s, i // 32 AS widx,
               lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM samples
    ), wstats AS (
        SELECT doc_id, n, widx,
               sum(s * s) AS energy,
               sum(CASE WHEN i % 32 <> 0
                         AND ((s >= 0) <> (prev >= 0))
                   THEN 1 ELSE 0 END) AS zcr,
               max(abs(s)) AS peak
        FROM seq
        WHERE widx < n // 32
        GROUP BY doc_id, n, widx
    )
    SELECT doc_id,
           CAST(8000 AS BIGINT)            AS sample_rate,
           CAST(n AS BIGINT)               AS n_samples,
           round(n / 8000.0, 6)            AS duration_sec,
           CAST(count(*) AS BIGINT)        AS n_windows,
           CAST(sum(energy) AS BIGINT)     AS total_energy,
           CAST(sum(zcr) AS BIGINT)        AS total_zcr,
           CAST(max(peak) AS BIGINT)       AS max_peak,
           round(sqrt(sum(energy) * 1.0 / (count(*) * 32)), 6) AS rms
    FROM wstats
    GROUP BY doc_id, n
    """,
)
def q25_wav_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality with a REAL codec end-to-end: each document's
    text becomes 16-bit PCM (sample = (byte−128)·256), is serialized
    as a canonical RIFF/WAVE file (``functions/wav.py`` — from-scratch
    struct packing, the audio twin of the PNG/JPEG codecs), then
    DECODED back: ``with_audio_metadata`` does a real header-only
    fmt/data-chunk parse and ``wav_window_stats`` computes per-window
    energy / zero-crossing / peak over the decoded samples. All
    integer-exact, so the DuckDB oracle replays the whole
    encode→decode→stats chain straight from characters — a WAV writer
    or parser bug (header sizes, alignment pad, sample width,
    channel interleave) hash-fails. Reference parity: the typed-
    metadata-over-binary model of `02_Data Ingest.py:191-199`,
    extended to audio.

    Scale shape: THREE narrow Arrow projections + per-row HOF
    aggregation — no explode, no groupBy, zero shuffle; the WAV bytes
    never leave the executor that made them."""
    from computer_vision_foundations_spark.functions.media import (
        encode_text_wav,
        wav_window_stats,
        with_audio_metadata,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 32
    )
    wav = docs.select(
        "doc_id", encode_text_wav(F.col("text")).alias("content")
    )
    md = with_audio_metadata(wav)
    ws = md.withColumn("ws", wav_window_stats(32)(F.col("content")))
    zero = F.lit(0).cast("long")
    return ws.select(
        "doc_id",
        F.col("audio_meta.sample_rate").cast("long").alias("sample_rate"),
        F.col("audio_meta.n_samples").alias("n_samples"),
        F.round("audio_meta.duration_sec", 6).alias("duration_sec"),
        F.size("ws").cast("long").alias("n_windows"),
        F.aggregate("ws", zero, lambda a, s: a + s["energy"]).alias(
            "total_energy"
        ),
        F.aggregate("ws", zero, lambda a, s: a + s["zcr"]).alias(
            "total_zcr"
        ),
        F.array_max(F.transform("ws", lambda s: s["peak"]))
        .cast("long")
        .alias("max_peak"),
        F.round(
            F.sqrt(
                F.aggregate("ws", zero, lambda a, s: a + s["energy"])
                / (F.size("ws") * F.lit(32))
            ),
            6,
        ).alias("rms"),
    )


@_register(
    "q28_gif_frame_sample",
    """
    WITH v AS (
        SELECT doc_id, text, length(text) // 16 AS nf
        FROM documents WHERE length(text) >= 16
    ), fr AS (
        SELECT doc_id, text, CAST(u.i AS INTEGER) AS i
        FROM v, unnest(range(nf)) u(i)
        WHERE u.i % 2 = 0
    ), px AS (
        SELECT doc_id, i,
               ord(substr(text, CAST(i * 16 + j.j + 1 AS INTEGER), 1)) AS val
        FROM fr, unnest(range(16)) j(j)
    )
    SELECT doc_id,
           i                               AS frame_idx,
           CAST(i * 5 AS DOUBLE) / 100.0   AS ts_sec,
           CAST(sum(val) AS INTEGER)       AS frame_key
    FROM px GROUP BY doc_id, i
    """,
)
def q28_gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video modality with a REAL codec end-to-end: each document's
    text becomes an animated GIF89a (``functions/gif.py`` — the
    from-scratch LZW codec; one 4×4 grayscale frame per 16 bytes,
    5 cs delay), then ``sample_video_frames`` DECODES it (variable-
    width LZW, sub-block walk, palette, compositing) and keeps every
    2nd frame, emitting ``(doc_id, frame_idx, ts_sec, frame_key)``
    with frame_key = the channel-0 pixel sum. The grayscale identity
    palette makes decoded pixels equal text bytes, so the DuckDB
    oracle replays the whole chain as character arithmetic — any LZW
    bit-packing, code-width, palette or frame-layout bug hash-fails.
    Reference parity: the frame-extraction shape of the reference's
    media model (`02_Data Ingest.py:191-199`), video flavor.

    Scale shape: one narrow Arrow projection (encode) + one narrow
    ``mapInPandas`` fan-out (decode + sample) — no shuffle; GIF bytes
    never leave the executor that built them."""
    from computer_vision_foundations_spark.functions.media import (
        encode_text_gif,
        sample_video_frames,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 16
    )
    gif = docs.select(
        "doc_id", encode_text_gif(F.col("text")).alias("content")
    )
    return sample_video_frames(gif, "content", "doc_id", every_n=2)


@_register(
    "z23_audio_spectrum",
    """
    WITH samples AS (
        SELECT doc_id, length(text) AS n, u.i AS i,
               CAST(ord(substr(text, CAST(u.i + 1 AS INTEGER), 1)) - 128
                    AS DOUBLE) AS s
        FROM documents, unnest(range(length(text))) u(i)
        WHERE length(text) >= 8
    ), framed AS (
        SELECT doc_id, n, i // 8 AS fidx, i % 8 AS k, s
        FROM samples WHERE i // 8 < n // 8
    ), quad AS (
        SELECT doc_id, fidx, fr.f AS f,
               sum(s * cos(2 * pi() * k * fr.f / 8)) AS re,
               sum(s * sin(2 * pi() * k * fr.f / 8)) AS im
        FROM framed, (SELECT unnest(range(5)) AS f) fr
        GROUP BY doc_id, fidx, fr.f
    ), p AS (
        SELECT doc_id, f, re * re + im * im AS pw FROM quad
    )
    SELECT doc_id,
           CAST(count(*) / 5 AS BIGINT)                    AS n_frames,
           round(sum(f * pw) / sum(pw), 6)                 AS centroid,
           round(sum(CASE WHEN f <= 1 THEN pw ELSE 0 END)
                 / sum(pw), 6)                             AS low_ratio
    FROM p GROUP BY doc_id
    """,
)
def z23_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real spectral feature extraction (``functions/dsp.py``): text →
    small-amplitude PCM (byte−128) → REAL WAV encode→decode
    (``functions/wav.py``) → rectangular-window rfft power spectra on
    8-sample frames → per-doc spectral centroid and low-band ratio.
    The UDF returns raw power SUMS and the centroid/ratio derive
    relationally (one division each, O(1) magnitudes), so the DuckDB
    oracle can replay the DFT as explicit cos/sin quadrature sums —
    numpy's FFT and the naive trig DFT agree to ~1e-14 relative,
    far inside the round-6 comparison. Ratios (not raw powers) are
    compared precisely because raw power totals grow with corpus text
    length and would eat the rounding margin.

    Scale shape: two narrow Arrow projections (encode, spectra) —
    no shuffle; fixed-width feature rows are all that leaves the
    UDF."""
    from computer_vision_foundations_spark.functions.dsp import (
        audio_spectral_features,
    )
    from computer_vision_foundations_spark.functions.media import (
        encode_text_wav,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 8
    )
    wav = docs.select(
        "doc_id",
        encode_text_wav(F.col("text"), scale=1).alias("content"),
    )
    feats = wav.withColumn(
        "sp", audio_spectral_features(8)(F.col("content"))
    )
    return feats.select(
        "doc_id",
        F.col("sp.n_frames").alias("n_frames"),
        F.round(F.col("sp.weighted_power") / F.col("sp.total_power"), 6)
        .alias("centroid"),
        F.round(F.col("sp.low_power") / F.col("sp.total_power"), 6)
        .alias("low_ratio"),
    )


@_register(
    "z24_bucketed_join",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)        AS n_orders,
           round(sum(o_totalprice), 2)     AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def z24_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed tables
    (``sources/bucketed.py``): orders and customer are written
    ``bucketBy(8, custkey)`` + ``sortBy`` into a scratch database,
    then sort-merge-joined on the bucket key — the join itself plans
    with NO Exchange on either side (pinned by
    ``tests/test_bucketed.py``); the only shuffle left is the final
    5-row segment aggregate. This is the pay-once-at-ingest answer
    for repeated 100 TB fact⋈dim joins on a stable key; the oracle is
    the plain relational join, so the bucketed layout must be
    result-invisible."""
    import os
    import tempfile

    from computer_vision_foundations_spark.sources.bucketed import (
        colocated_join,
        write_bucketed,
    )
    from computer_vision_foundations_spark.sources.tables import (
        create_database,
    )

    root = tempfile.mkdtemp(prefix="bkt_")
    db = "bkt_" + os.path.basename(root)[4:]
    create_database(spark, db, location=root)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    write_bucketed(
        orders, f"{db}.orders_b", 8, ["o_custkey"], ["o_custkey"]
    )
    write_bucketed(
        cust, f"{db}.customer_b", 8, ["o_custkey"], ["o_custkey"]
    )
    joined = colocated_join(
        spark, f"{db}.orders_b", f"{db}.customer_b", on="o_custkey"
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@_register(
    "z25_table_profile",
    """
    SELECT 'o_orderkey' AS column,
           CAST(count(*) AS BIGINT)                       AS n_rows,
           CAST(count(*) - count(o_orderkey) AS BIGINT)   AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT)     AS n_distinct,
           round(CAST(min(o_orderkey) AS DOUBLE), 6)      AS min_num,
           round(CAST(max(o_orderkey) AS DOUBLE), 6)      AS max_num,
           CAST(NULL AS VARCHAR)                          AS min_str,
           CAST(NULL AS VARCHAR)                          AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(CAST(min(o_custkey) AS DOUBLE), 6),
           round(CAST(max(o_custkey) AS DOUBLE), 6),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 6), round(max(o_totalprice), 6),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    """,
)
def z25_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiling (``operators/profile.py``): per-column
    row/null/exact-distinct counts and extrema over orders in a SINGLE
    aggregation job (multi-DISTINCT via one Expand; the 1-row wide
    result reshapes to one-row-per-column with ``stack``). The oracle
    is the per-column UNION ALL of direct aggregates, so Expand
    semantics, null accounting and the numeric/string extrema split
    are all hash-checked. At 100 TB the ``exact_ndv=False`` switch
    swaps the Expand for HLL++ map-side sketches."""
    from computer_vision_foundations_spark.operators.profile import (
        profile_table,
    )

    orders = load_table(spark, sf_dir, "orders")
    return profile_table(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )


@_register(
    "q29_multimodal_manifest",
    """
    WITH base AS (
        SELECT doc_id, text, length(text) AS n_chars
        FROM documents WHERE length(text) >= 32
    ), chars AS (
        SELECT doc_id, ord(u.c) AS v
        FROM base, unnest(string_split(text, '')) u(c)
    ), hist AS (
        SELECT doc_id, v, count(*) AS c FROM chars GROUP BY doc_id, v
    ), tot AS (
        SELECT doc_id, sum(c) AS n FROM hist GROUP BY doc_id
    ), ent AS (
        SELECT h.doc_id,
               round(-sum((h.c * 1.0 / t.n) * log2(h.c * 1.0 / t.n)), 6)
                   AS png_entropy
        FROM hist h JOIN tot t ON t.doc_id = h.doc_id
        GROUP BY h.doc_id
    ), samples AS (
        SELECT doc_id, n_chars, u.i AS i,
               (ord(substr(text, CAST(u.i + 1 AS INTEGER), 1)) - 128) * 256
                   AS s
        FROM base, unnest(range(length(text))) u(i)
    ), seq AS (
        SELECT doc_id, n_chars, i, s, i // 32 AS widx,
               lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM samples
    ), zcr AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN i % 32 <> 0 AND widx < n_chars // 32
                              AND ((s >= 0) <> (prev >= 0))
                        THEN 1 ELSE 0 END) AS BIGINT) AS audio_zcr
        FROM seq GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_chars AS BIGINT)            AS n_chars,
           ent.png_entropy                      AS png_entropy,
           zcr.audio_zcr                        AS audio_zcr,
           CAST(b.n_chars // 16 AS INTEGER)     AS video_n_frames,
           (ent.png_entropy >= 3.0 AND b.n_chars >= 64) AS keep
    FROM base b
    JOIN ent ON ent.doc_id = b.doc_id
    JOIN zcr ON zcr.doc_id = b.doc_id
    """,
)
def q29_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal training-data manifest: ONE pass over documents
    exercises all three real from-scratch codecs side by side — text
    renders to a PNG whose decoded pixel entropy is the image-quality
    signal (``functions/png.py``), to a WAV whose decoded per-window
    zero-crossing total is the audio signal (``functions/wav.py``),
    and to an animated GIF whose REAL header walk yields the frame
    count (``functions/gif.py``) — then a composite keep/drop gate
    (entropy ≥ 3 on the ROUNDED value, per the cross-engine float
    filter rule; ≥ 64 chars) emits the curation manifest. Every
    signal is replayed by the DuckDB oracle from characters, so the
    full three-codec composition is hash-checked end to end.

    Scale shape: four narrow Arrow projections over one scan — zero
    shuffle, zero joins (all signals derive in-row); the Spark plan
    is a single codegen+Arrow pipeline per partition."""
    from computer_vision_foundations_spark.functions.image import (
        encode_text_png,
        get_image_statistics,
    )
    from computer_vision_foundations_spark.functions.media import (
        encode_text_gif,
        encode_text_wav,
        wav_window_stats,
        with_video_metadata,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 32
    )
    df = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            get_image_statistics(encode_text_png(F.col("text")))["entropy"],
            6,
        ).alias("png_entropy"),
        wav_window_stats(32)(encode_text_wav(F.col("text"))).alias("ws"),
        encode_text_gif(F.col("text")).alias("gif"),
    )
    df = with_video_metadata(df, "gif", "vm")
    return df.select(
        "doc_id",
        "n_chars",
        "png_entropy",
        F.aggregate(
            "ws", F.lit(0).cast("long"), lambda a, s: a + s["zcr"]
        ).alias("audio_zcr"),
        F.col("vm.n_frames").alias("video_n_frames"),
        ((F.col("png_entropy") >= 3.0) & (F.col("n_chars") >= 64)).alias(
            "keep"
        ),
    )


def _pq_rerank_oracle_sql() -> str:
    score = " + ".join(
        f"p.d{s}[c.codes[{s + 1}] + 1]" for s in range(_PQ_SUBS)
    )
    return f"""
    {_pq_codes_cte()}
    , short AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY round({score}, 6) ASC, c.vec_id ASC) AS rank
        FROM d p JOIN codes c ON p.vec_id < 5 AND c.vec_id <> p.vec_id) t
      WHERE rank <= 50
    )
    SELECT probe_id, neighbor_id, cos_sim, rank FROM (
      SELECT s.probe_id, s.neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(pe.embedding AS DOUBLE[])),
                   6) AS cos_sim,
             row_number() OVER (
               PARTITION BY s.probe_id
               ORDER BY round(list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(pe.embedding AS DOUBLE[])), 6) DESC,
                        s.neighbor_id ASC) AS rank
      FROM short s
      JOIN embeddings e  ON e.vec_id  = s.neighbor_id
      JOIN embeddings pe ON pe.vec_id = s.probe_id) t
    WHERE rank <= 10
    """


@_register("z27_pq_rerank", _pq_rerank_oracle_sql())
def z27_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: PQ asymmetric-distance shortlist (top-50 per
    probe over compressed codes — vectors never read) followed by an
    exact-cosine re-rank of ONLY the shortlist rows
    (``operators/quantization.pq_rerank_topk``; the IVFADC+R pattern,
    Jégou et al. 2011). The oracle replays both stages — literal
    codebooks for the ADC stage, ``list_cosine_similarity`` for the
    re-rank — so shortlist membership AND final exact ranking are
    hash-checked. Schema matches ``brute_force_knn`` (q27), making
    two-stage recall directly measurable against the exact baseline."""
    from computer_vision_foundations_spark.operators.quantization import (
        pq_codebooks,
        pq_rerank_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    return pq_rerank_topk(emb, probes, cbs, k=10, shortlist=50)


@_register(
    "q32_zorder_optimize",
    """
    SELECT o_orderkey % 64 AS zx, count(*) AS n,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderkey % 64 < 8 AND o_custkey % 64 < 8
    GROUP BY o_orderkey % 64
    """,
)
def q32_zorder_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`OPTIMIZE ... ZORDER BY` on the transactional table format
    (``sources/acid.py:optimize_zorder`` + ``operators/zorder.py``):
    orders land scattered across small files, then one remove+add
    commit rewrites the snapshot clustered by the Morton key of
    (orderkey, custkey) buckets; the query then filters a z-box and
    aggregates. The oracle replays the filter+aggregate straight from
    the source table, so the rewrite must be exactly data-invariant —
    a dropped/duplicated row or a bad interleave-driven partition
    boundary hash-fails. Multi-column min/max pruning on the
    clustered files is pinned by ``tests/test_acid.py``."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        optimize_zorder,
        read_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 64).alias("zx"),
        (F.col("o_custkey") % 64).alias("zy"),
        "o_totalprice",
    )
    root = tempfile.mkdtemp(prefix="acid_zo_")
    create_table(spark, root, orders.repartition(16))
    optimize_zorder(spark, root, ["zx", "zy"], bits=6,
                    target_file_bytes=64 * 1024)
    snap = read_table(spark, root)
    return (
        snap.filter((F.col("zx") < 8) & (F.col("zy") < 8))
        .groupBy("zx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@_register(
    "q33_data_skipping",
    """
    SELECT o_orderstatus,
           count(*)                    AS n,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 3000
    GROUP BY o_orderstatus
    """,
)
def q33_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-log data skipping (``sources/acid.py:prune_files``):
    orders land range-partitioned into many files, each commit records
    per-file min/max footer stats in the transaction log, and the read
    prunes non-intersecting files DRIVER-SIDE before Spark plans the
    scan — the Delta-shaped file-statistics ledger. The query filter
    re-applies the predicate, so pruning must be exactly conservative:
    a file wrongly skipped loses rows and hash-fails against the plain
    source-table oracle. Composes with ``optimize_zorder`` (z28),
    which makes multi-column ranges tight."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        read_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="acid_ds_")
    create_table(
        spark, root, orders.repartitionByRange(16, "o_orderkey")
    )
    snap = read_table(spark, root, prune={"o_orderkey": (1000, 3000)})
    return (
        snap.filter(F.col("o_orderkey").between(1000, 3000))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@_register(
    "z30_knn_join",
    """
    SELECT qid, nid, cos_sim, rank FROM (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])),
                   6) AS cos_sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                            CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])), 6) DESC,
                        b.vec_id ASC) AS rank
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id <> b.vec_id) t
    WHERE rank <= 3
    """,
)
def z30_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked self kNN join (``operators/similarity.knn_join_blocked``):
    every vector gets its top-3 cosine neighbors WITHIN its label
    block — pairs never form across blocks, so cost is Σ|block|², not
    n² (swap in LSH buckets / IVF cells as the block when no natural
    key exists; identical join shape). The oracle replays the
    block-join + exact cosine + deterministic tie-break, so the window
    top-k over the blocked pair stream is hash-checked for every row
    of the corpus, not just a probe set."""
    from computer_vision_foundations_spark.operators.similarity import (
        knn_join_blocked,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join_blocked(emb, k=3, block_col="label")


@_register(
    "q34_change_data_feed",
    """
    SELECT o_orderkey, 'insert' AS _change_type
    FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 8 <> 1
    UNION ALL
    SELECT o_orderkey, 'update'
    FROM orders WHERE o_orderkey % 16 = 0
    UNION ALL
    SELECT o_orderkey, 'delete'
    FROM orders WHERE o_orderkey % 16 = 8
    """,
)
def q34_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed (``sources/acid.py:table_changes``) across a
    four-commit history: create (orderkey%4==0), append the %4==1
    slice, delete the %8==1 rows of it, upsert a status change onto
    %16==0 and delete %16==8. The feed between version 1 and the tip
    must classify exactly: inserts = surviving appended keys, updates
    = rewritten-status keys, deletes = removed create-time keys —
    with rows inserted-then-deleted WITHIN the window correctly
    absent. The oracle replays the set algebra straight from the
    source table, so snapshot resolution, fingerprint comparison and
    the insert/update/delete classification are all hash-checked."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        delete_where,
        table_changes,
        upsert,
        write_append,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="acid_cdf_")
    create_table(spark, root, orders.filter(F.col("o_orderkey") % 4 == 0))
    write_append(
        spark, root, orders.filter(F.col("o_orderkey") % 4 == 1)
    )
    delete_where(spark, root, F.col("o_orderkey") % 8 == 1)
    upsert(
        spark,
        root,
        orders.filter(F.col("o_orderkey") % 16 == 0).select(
            "o_orderkey",
            F.lit("REVISED").alias("o_orderstatus"),
            "o_totalprice",
        ),
        ["o_orderkey"],
    )
    delete_where(spark, root, F.col("o_orderkey") % 16 == 8)
    return table_changes(
        spark, root, 1, 5, ["o_orderkey"], "o_orderstatus"
    )


def _image_near_dup_oracle_sql(max_hamming: int = 6) -> str:
    """Replay decode→dHash-rows→Hamming-band pairing. Bands are the 8
    per-row bytes of the 64-bit dHash (band equality ⇔ row-byte
    equality, same candidate set as the Spark fingerprint banding);
    hamming sums per-row xor popcounts."""
    row_exprs = []
    for r in range(8):
        terms = " + ".join(
            f"(CASE WHEN p[{r * 9 + c + 1}] < p[{r * 9 + c + 2}] "
            f"THEN {1 << c} ELSE 0 END)"
            for c in range(8)
        )
        row_exprs.append(f"({terms})")
    rows_arr = ", ".join(row_exprs)
    ham = " + ".join(f"bit_count(xor(ra[{j}], rb[{j}]))" for j in range(1, 9))
    return f"""
    WITH px AS (
      SELECT doc_id,
             list_transform(range(1, 74),
               i -> CASE WHEN i <= length(text)
                    THEN ascii(substr(text, i, 1)) ELSE 0 END) AS p
      FROM documents WHERE length(text) >= 72
    ),
    rws AS (
      SELECT doc_id, [{rows_arr}] AS rows FROM px
    ),
    banded AS (
      SELECT doc_id, rows, g.i AS band_idx,
             rows[CAST(g.i + 1 AS INTEGER)] AS band_val
      FROM rws CROSS JOIN generate_series(0, 7) AS g(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.rows AS ra, b.rows AS rb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST({ham} AS INT) AS hamming
    FROM cand WHERE {ham} <= {max_hamming}
    """


@_register("q36_image_near_dup", _image_near_dup_oracle_sql())
def q36_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE near-duplicate pairs — the CV-side dedup the
    reference's domain needs: real 8×9 PNG encode → real decode →
    64-bit dHash (q99's chain, full-grid docs only so no padding) →
    Hamming-LSH banding via the generic ``simhash_pairs`` machinery
    (8 byte-wide bands over the fingerprint; pigeonhole exact for
    hamming ≤ 7, reported threshold 6). ``max_band_freq=None``
    matches the oracle's uncapped pigeonhole (the cap stays ON by
    default for corpus-scale callers — the z07 lesson). The oracle
    replays decode, hash, banding and popcount from character codes,
    so codec, fingerprint packing and pairing are all hash-checked.

    Scale shape: identical to q49 — fingerprints collapse to DISTINCT
    before banding, candidates are a (band, value) equi-join, and only
    (id, 8-byte fp) rows shuffle."""
    from computer_vision_foundations_spark.functions.image import (
        encode_text_png_8x9,
        image_dhash,
    )
    from computer_vision_foundations_spark.operators.dedup import (
        simhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 72
    )
    dh = docs.select(
        "doc_id",
        image_dhash(encode_text_png_8x9(F.col("text"))).alias("dhash"),
    )
    fp = dh.select(
        "doc_id",
        (
            F.shiftleft(
                F.conv(F.substring("dhash", 1, 8), 16, 10).cast("long"), 32
            ).bitwiseOR(
                F.conv(F.substring("dhash", 9, 8), 16, 10).cast("long")
            )
        ).alias("fp"),
    )
    return simhash_pairs(
        fp,
        "fp",
        "doc_id",
        bits=64,
        bands=8,
        max_hamming=6,
        max_band_freq=None,
    )


@_register(
    "z33_gopher_rules",
    r"""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks,
               string_split(text, chr(10)) AS lines,
               len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\.\.\.')) AS n_sym
        FROM documents
    ), s AS (
        SELECT doc_id,
               len(toks) AS n_words,
               len(lines) AS n_lines,
               list_sum(list_transform(toks, x -> length(x))) * 1.0
                   / greatest(len(toks), 1) AS mean_wl,
               n_sym * 1.0 / greatest(len(toks), 1) AS symbol_ratio,
               len(list_filter(lines,
                   ln -> regexp_matches(ln, '^\s*[-*•]'))) * 1.0
                   / greatest(len(lines), 1) AS bullet_ratio,
               len(list_filter(lines,
                   ln -> regexp_matches(ln, '(\.\.\.|…)\s*$'))) * 1.0
                   / greatest(len(lines), 1) AS ellipsis_ratio,
               len(list_filter(toks,
                   w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
                   / greatest(len(toks), 1) AS alpha_ratio,
               len(list_filter(toks,
                   w -> list_contains(
                       ['the','be','to','of','and','that',
                        'have','with','a','in','is','it'],
                       lower(w)))) AS n_stop
        FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT)   AS n_words,
           round(mean_wl, 4)         AS mean_word_len,
           round(symbol_ratio, 6)    AS symbol_ratio,
           round(bullet_ratio, 6)    AS bullet_ratio,
           round(ellipsis_ratio, 6)  AS ellipsis_ratio,
           round(alpha_ratio, 6)     AS alpha_word_ratio,
           CAST(n_stop AS BIGINT)    AS n_stopwords,
           n_words >= 40 AND n_words <= 100000          AS rule_word_count,
           mean_wl >= 3.0 AND mean_wl <= 10.0           AS rule_mean_word_len,
           symbol_ratio < 0.1                           AS rule_symbol_ratio,
           bullet_ratio < 0.9                           AS rule_bullet_lines,
           ellipsis_ratio < 0.3                         AS rule_ellipsis_lines,
           alpha_ratio >= 0.8                           AS rule_alpha_words,
           n_stop >= 2                                  AS rule_stopwords,
           (n_words >= 40 AND n_words <= 100000
            AND mean_wl >= 3.0 AND mean_wl <= 10.0
            AND symbol_ratio < 0.1
            AND bullet_ratio < 0.9
            AND ellipsis_ratio < 0.3
            AND alpha_ratio >= 0.8
            AND n_stop >= 2)                            AS passes_gopher
    FROM s
    """,
)
def z33_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality battery (Rae et al. 2021, appendix A)
    over the documents table: all seven published rules — word count,
    mean word length, symbol ratio, bullet/ellipsis line fractions,
    alphabetic-word fraction, stopword floor — as per-rule flags plus
    the conjunction, with every underlying statistic emitted for
    corpus-QA reporting (``operators/quality_rules.py``). The word
    floor is tuned to the fixture (40) so both outcomes appear; every
    other threshold is the published default. Reference parity: the
    metadata-predicate input gating of `03_Model Training.py`,
    generalized to the text-corpus rule battery.

    Scale shape: ZERO shuffles — the whole battery is higher-order
    Catalyst expressions over ``split()`` arrays in one narrow
    WholeStageCodegen projection; only flag rows leave the scan."""
    from computer_vision_foundations_spark.operators.quality_rules import (
        gopher_quality_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs, min_words=40)


@_register(
    "z34_paragraph_dedup",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), p AS (
        SELECT doc_id, CAST(u.i AS INTEGER) AS idx,
               array_to_string(tk[u.i*3+1 : u.i*3+3], ' ') AS para
        FROM toks, unnest(range((len(tk) + 2) // 3)) u(i)
    ), h AS (
        SELECT doc_id, idx, para, md5(para) AS ph FROM p
    ), f AS (
        SELECT doc_id, idx, para,
               row_number() OVER (
                   PARTITION BY ph ORDER BY doc_id, idx) = 1 AS kept
        FROM h
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                     AS n_paras,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END)
                AS BIGINT)                              AS n_kept,
           coalesce(string_agg(para, ' ' ORDER BY idx)
                    FILTER (WHERE kept), '')            AS cleaned_text,
           CAST(length(coalesce(string_agg(para, ' ' ORDER BY idx)
                    FILTER (WHERE kept), '')) AS BIGINT) AS cleaned_len
    FROM f GROUP BY doc_id
    """,
)
def z34_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with document reassembly (CCNet,
    Wenzek et al. 2020; RefinedWeb, Penedo et al. 2023): documents are
    segmented into fixed 3-token paragraphs, only the first occurrence
    of each paragraph corpus-wide (smallest doc_id, then position)
    survives — within-doc repeats cut too — and every document
    is rebuilt from its surviving paragraphs in original order
    (``operators/paragraphs.py``). The oracle replays segmentation,
    keeper vote and ordered reassembly relationally, so the HOF
    slicing, hash, join and array_sort reassembly are all value-checked
    including the rebuilt text itself. Reference parity: sub-document
    dedup is the text generalization of the reference's
    duplicate-image screening stage.

    Scale shape: keeper vote on a narrow (md5, id) projection — 16-byte
    keys shuffle, bodies don't; bodies cross exactly two keyed shuffles
    (hash equi-join + per-doc reassembly), the floor for reassembling
    sub-document dedup."""
    from computer_vision_foundations_spark.operators.paragraphs import (
        paragraph_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return paragraph_dedup(docs, para_words=3)


@_register(
    "z35_scene_cuts",
    """
    WITH v AS (
        SELECT doc_id, text, length(text) // 16 AS nf
        FROM documents WHERE length(text) >= 32
    ), fr AS (
        SELECT doc_id, text, CAST(u.i AS INTEGER) AS i
        FROM v, unnest(range(nf)) u(i)
    ), px AS (
        SELECT doc_id, i,
               ord(substr(text, CAST(i * 16 + j.j + 1 AS INTEGER), 1)) AS val
        FROM fr, unnest(range(16)) j(j)
    ), k AS (
        SELECT doc_id, i, CAST(sum(val) AS INTEGER) AS fk
        FROM px GROUP BY doc_id, i
    ), l AS (
        SELECT doc_id, i, fk,
               lag(fk) OVER (PARTITION BY doc_id ORDER BY i) AS pk
        FROM k
    )
    SELECT doc_id,
           i                                AS frame_idx,
           CAST(i * 5 AS DOUBLE) / 100.0    AS ts_sec,
           pk                               AS prev_key,
           fk                               AS frame_key,
           abs(fk - pk)                     AS delta
    FROM l
    WHERE pk IS NOT NULL AND abs(fk - pk) >= 150
    """,
)
def z35_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video shot-boundary detection over the REAL GIF decode chain:
    text → animated GIF89a (``functions/gif.py``) → full-frame decode
    (``sample_video_frames`` with ``every_n=1``) → cut rows where the
    channel-0 pixel-sum key jumps by ≥ 150 between consecutive frames
    (``operators/video.py`` — the intensity-statistic comparison of
    Boreczky & Rowe 1996). The identity grayscale palette makes decoded
    pixels equal text bytes, so the oracle replays decode, frame keys,
    lag and thresholding as character arithmetic — an LZW, palette,
    compositing or window-ordering bug hash-fails. Reference parity:
    the one-frame-per-shot reduction a video corpus needs before the
    reference's featurization stage.

    Scale shape: narrow encode + narrow decode fan-out, then ONE keyed
    shuffle (per-video lag window over (id, idx, key) rows); pixels
    never shuffle."""
    from computer_vision_foundations_spark.functions.media import (
        encode_text_gif,
        sample_video_frames,
    )
    from computer_vision_foundations_spark.operators.video import (
        detect_scene_cuts,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 32
    )
    gif = docs.select(
        "doc_id", encode_text_gif(F.col("text")).alias("content")
    )
    frames = sample_video_frames(gif, "content", "doc_id", every_n=1)
    return detect_scene_cuts(frames, threshold=150)


@_register(
    "z36_audio_fingerprint_pairs",
    """
    WITH samples AS (
        SELECT doc_id, length(text) AS n, u.i AS i,
               (ord(substr(text, CAST(u.i + 1 AS INTEGER), 1)) - 128) AS s
        FROM documents, unnest(range(length(text))) u(i)
        WHERE length(text) >= 96
    ), wstats AS (
        SELECT doc_id, i // 32 AS widx, sum(s * s) AS e
        FROM samples WHERE i // 32 < n // 32
        GROUP BY doc_id, i // 32
    ), nb AS (
        SELECT doc_id, widx, e,
               lag(e) OVER w AS pe, lead(e) OVER w AS ne
        FROM wstats WINDOW w AS (PARTITION BY doc_id ORDER BY widx)
    ), pk AS (
        SELECT doc_id, widx, e FROM nb
        WHERE pe IS NOT NULL AND ne IS NOT NULL AND e > pe AND e >= ne
    ), tr AS (
        SELECT doc_id, widx, e,
               lead(widx, 1) OVER w AS w1, lead(widx, 2) OVER w AS w2,
               lead(e, 1) OVER w AS e1, lead(e, 2) OVER w AS e2
        FROM pk WINDOW w AS (PARTITION BY doc_id ORDER BY widx)
    ), fp AS (
        SELECT DISTINCT doc_id,
               md5(concat(CAST(w1 - widx AS VARCHAR), '_',
                          CAST(w2 - w1 AS VARCHAR), '_',
                          CAST(length(bin(e)) AS VARCHAR), '_',
                          CAST(length(bin(e1)) AS VARCHAR), '_',
                          CAST(length(bin(e2)) AS VARCHAR))) AS f
        FROM tr WHERE w2 IS NOT NULL
    ), cap AS (
        SELECT f FROM fp GROUP BY f HAVING count(*) <= 64
    ), j AS (
        SELECT a.doc_id AS da, b.doc_id AS db
        FROM fp a JOIN cap USING (f) JOIN fp b USING (f)
        WHERE a.doc_id < b.doc_id
    )
    SELECT da AS id_a, db AS id_b,
           CAST(count(*) AS BIGINT) AS n_matches
    FROM j GROUP BY da, db HAVING count(*) >= 2
    """,
)
def z36_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs by energy-landmark constellation
    hashing (Wang 2003's delta-time scheme over integer-exact
    features): text → REAL WAV encode→decode (``functions/wav.py``,
    scale=1) → per-window integer energies → local-max peaks →
    md5(dt1_dt2_m0_m1_m2) fingerprints over peak triples → capped
    fingerprint equi-join → pairs sharing ≥ 2 fingerprints
    (``operators/audio_fp.py``). Everything integer-exact, so the
    oracle replays decode, windowing, peak picking, gap/magnitude
    hashing, the ≤64 frequency cap and the match count — a codec,
    window or banding bug hash-fails. Reference parity: the audio twin
    of the duplicate-screening the reference does for images.

    Scale shape: same discipline as MinHash/SimHash pairing — narrow
    (id, md5) landmark rows, skew cap BEFORE the join, and only the
    two per-clip analytic windows (one partitioning) plus the capped
    equi-join shuffle; waveforms never leave the decode stage."""
    from computer_vision_foundations_spark.functions.media import (
        encode_text_wav,
        wav_window_stats,
    )
    from computer_vision_foundations_spark.operators.audio_fp import (
        audio_energy_landmarks,
        audio_fingerprint_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 96
    )
    wav = docs.select(
        "doc_id",
        encode_text_wav(F.col("text"), scale=1).alias("content"),
    )
    ws = wav.withColumn("ws", wav_window_stats(32)(F.col("content")))
    win = ws.select("doc_id", F.explode("ws").alias("s")).select(
        "doc_id",
        F.col("s.widx").alias("widx"),
        F.col("s.energy").alias("energy"),
    )
    lm = audio_energy_landmarks(win)
    return audio_fingerprint_pairs(lm, min_matches=2, max_fp_freq=64)


@_register(
    "z37_kmv_source_overlap",
    """
    WITH sh AS (
        SELECT source, array_to_string(tk[u.i : u.i+2], '|') AS v
        FROM (SELECT source, string_split(text, ' ') AS tk
              FROM documents) t,
             unnest(range(1, greatest(len(tk) - 2, 1) + 1)) u(i)
    ), hx AS (
        SELECT DISTINCT source, md5(v) AS h FROM sh
    ), regs AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS pos
        FROM hx QUALIFY pos <= 256
    ), stats AS (
        SELECT source, count(*) AS n,
               max(CASE WHEN pos = 256 THEN
                   ('0x' || substr(h, 1, 13))::BIGINT
                   / 4503599627370496.0 END) AS tk
        FROM regs GROUP BY source
    ), st AS (
        SELECT source, n,
               CASE WHEN n < 256 THEN 1.0 ELSE tk END AS theta,
               CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                    ELSE 255.0 / tk END AS est
        FROM stats
    ), sj AS (
        SELECT a.source AS ga, b.source AS gb,
               ('0x' || substr(a.h, 1, 13))::BIGINT
               / 4503599627370496.0 AS frac
        FROM regs a JOIN regs b ON a.h = b.h AND a.source < b.source
    ), w AS (
        SELECT sj.ga, sj.gb, sj.frac,
               sa.theta AS ta, sa.est AS ea,
               sb.theta AS tb, sb.est AS eb
        FROM sj JOIN st sa ON sj.ga = sa.source
                JOIN st sb ON sj.gb = sb.source
    ), g AS (
        SELECT ga, gb, count(*) AS c,
               any_value(ea) AS ea, any_value(eb) AS eb,
               any_value(least(ta, tb)) AS tmin
        FROM w WHERE frac < least(ta, tb) GROUP BY ga, gb
    )
    SELECT ga AS group_a, gb AS group_b,
           CAST(c AS BIGINT)                        AS n_shared,
           round(ea, 4)                             AS distinct_a,
           round(eb, 4)                             AS distinct_b,
           round(c / tmin, 4)                       AS intersect_est,
           round(ea + eb - c / tmin, 4)             AS union_est,
           round((c / tmin) / (ea + eb - c / tmin), 6) AS jaccard
    FROM g
    """,
)
def z37_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source corpus overlap from KMV/theta sketches: distinct
    word-3-gram estimates per source plus pairwise intersection /
    union / Jaccard estimates via the theta-sketch set algebra
    (Bar-Yossef et al. 2002; Dasgupta et al. 2016) —
    ``functions/sketches.kmv_registers`` + ``operators/overlap.py``.
    The sketch keeps the 256 smallest md5 hashes per source; hash hex
    ordering and the 52-bit hash fraction are bit-identical across
    engines, so the oracle replays sketch construction, per-group
    estimators, the shared-hash join below min-theta, and all three
    set estimates exactly. This is the scale answer to "how redundant
    are my crawl sources?" — no raw shingle set ever joins.

    Scale shape: raw shingles are seen once by a narrow distinct;
    everything downstream touches ≤ 256 rows per source (model-sized).
    The pairwise stage is a hash equi-join of register tables plus a
    broadcast of per-source scalars — never a group×group grid."""
    from computer_vision_foundations_spark.functions.text import (
        shingles_from_tokens,
    )
    from computer_vision_foundations_spark.operators.overlap import (
        kmv_pairwise_overlap,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.split(F.col("text"), " ").alias("tk"))
    items = toks.select(
        "source", F.explode(shingles_from_tokens(F.col("tk"), 3)).alias("v")
    )
    return kmv_pairwise_overlap(items, "v", "source", k=256)


@_register(
    "z38_token_budget_select",
    """
    WITH s AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
    ), q AS (
        SELECT doc_id, source,
               len(toks) AS n_tokens,
               round(len(list_filter(toks,
                   w -> list_contains(
                       ['the','be','to','of','and','that',
                        'have','with','a','in','is','it'],
                       lower(w)))) * 1.0
                   / greatest(len(toks), 1), 6) AS quality
        FROM s
    ), w AS (
        SELECT doc_id, source, quality, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM q
    )
    SELECT doc_id, source, quality,
           CAST(n_tokens AS BIGINT)  AS n_tokens,
           CAST(cum AS BIGINT)       AS cum_tokens,
           cum <= 600                AS selected
    FROM w
    """,
)
def z38_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget selection (the "best N tokens per
    source" specification every pretraining mix uses — FineWeb /
    DataComp-LM style): documents rank best-first inside their source
    by a stopword-density quality proxy (ties broken by id), and
    ``selected`` marks the maximal greedy prefix whose cumulative
    token count stays within the 600-token budget
    (``operators/selection.py``). The oracle replays scoring, ranking
    and the running-sum prefix rule exactly. Reference parity: the
    capped/ordered training-input sampling of `03_Model Training.py`,
    made distributed and deterministic.

    Scale shape: ONE keyed shuffle — a per-domain cumulative-sum
    window over narrow (id, domain, score, tokens) rows; bodies never
    move, no joins, no driver state."""
    from computer_vision_foundations_spark.operators.selection import (
        quality_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sw = F.array(
        *[
            F.lit(w)
            for w in [
                "the", "be", "to", "of", "and", "that",
                "have", "with", "a", "in", "is", "it",
            ]
        ]
    )
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.filter(toks, lambda w: F.array_contains(sw, F.lower(w))))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("quality"),
    )
    return quality_budget_select(
        scored,
        domain_col="source",
        quality_col="quality",
        tokens_col="n_tokens",
        token_budget=600,
    )


@_register(
    "z39_curriculum_order",
    """
    WITH b AS (
        SELECT doc_id, n_chars AS difficulty,
               1 + CAST(n_chars > 150 AS INTEGER)
                 + CAST(n_chars > 250 AS INTEGER)
                 + CAST(n_chars > 350 AS INTEGER) AS bucket
        FROM documents
    ), r AS (
        SELECT doc_id, difficulty, bucket,
               row_number() OVER (
                   PARTITION BY bucket
                   ORDER BY difficulty, doc_id) AS rnk
        FROM b
    )
    SELECT doc_id,
           CAST(difficulty AS BIGINT)      AS difficulty,
           CAST(bucket AS BIGINT)          AS bucket,
           CAST(rnk AS BIGINT)             AS rank_in_bucket,
           CAST(rnk * 4 + bucket AS BIGINT) AS curriculum_rank
    FROM r
    """,
)
def z39_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved curriculum ordering (easy→hard with bucket
    round-robin, the standard curriculum-learning data order): length
    is the difficulty proxy, buckets come from explicit boundary
    literals (150/250/350 chars) — NEVER a global ntile, which would
    be a single-partition window — and ``curriculum_rank`` cycles the
    four buckets once per round so any training prefix stays mixed
    while average difficulty rises (``operators/selection.py``). The
    oracle replays bucketing, per-bucket ranking and the interleave
    formula exactly.

    Scale shape: bucket assignment is a narrow codegen expression; the
    only shuffle is the B-way per-bucket rank window; compose with the
    deterministic shard assignment inside buckets at extreme scale."""
    from computer_vision_foundations_spark.operators.selection import (
        curriculum_order,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = curriculum_order(
        docs,
        [150, 250, 350],
        difficulty_col=F.col("n_chars"),
    )
    return out.select(
        "doc_id",
        F.col("difficulty").cast("long").alias("difficulty"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("rank_in_bucket").cast("long").alias("rank_in_bucket"),
        "curriculum_rank",
    )


@_register(
    "z40_curation_pipeline",
    """
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks,
               string_split(text, chr(10)) AS lines, text
        FROM documents
    ), g AS (
        SELECT doc_id, source, text FROM t
        WHERE len(toks) BETWEEN 40 AND 100000
          AND list_sum(list_transform(toks, x -> length(x))) * 1.0
              / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0
          AND (len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\\.\\.\\.'))) * 1.0
              / greatest(len(toks), 1) < 0.1
          AND len(list_filter(lines,
                  ln -> regexp_matches(ln, '^\\s*[-*•]'))) * 1.0
              / greatest(len(lines), 1) < 0.9
          AND len(list_filter(lines,
                  ln -> regexp_matches(ln, '(\\.\\.\\.|…)\\s*$'))) * 1.0
              / greatest(len(lines), 1) < 0.3
          AND len(list_filter(toks,
                  w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
              / greatest(len(toks), 1) >= 0.8
          AND len(list_filter(toks,
                  w -> list_contains(
                      ['the','be','to','of','and','that',
                       'have','with','a','in','is','it'],
                      lower(w)))) >= 2
    ), tk AS (
        SELECT doc_id, source, string_split(text, ' ') AS tks FROM g
    ), p AS (
        SELECT doc_id, source, CAST(u.i AS INTEGER) AS idx,
               array_to_string(tks[u.i*3+1 : u.i*3+3], ' ') AS para
        FROM tk, unnest(range((len(tks) + 2) // 3)) u(i)
    ), h AS (
        SELECT doc_id, source, idx, para, md5(para) AS ph FROM p
    ), f AS (
        SELECT doc_id, source, idx, para,
               row_number() OVER (
                   PARTITION BY ph ORDER BY doc_id, idx) = 1 AS kept
        FROM h
    ), d AS (
        SELECT doc_id, source,
               count(*) AS n_paras,
               sum(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept,
               coalesce(string_agg(para, ' ' ORDER BY idx)
                        FILTER (WHERE kept), '') AS cleaned
        FROM f GROUP BY doc_id, source
    ), s AS (
        SELECT doc_id, source, n_paras, n_kept,
               CASE WHEN length(cleaned) = 0 THEN 0
                    ELSE len(string_split(cleaned, ' ')) END AS n_tokens,
               round(n_kept * 1.0 / n_paras, 6) AS quality
        FROM d
    ), w AS (
        SELECT *, sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM s
    )
    SELECT doc_id, source,
           CAST(n_paras AS BIGINT)  AS n_paras,
           CAST(n_kept AS BIGINT)   AS n_kept,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           quality,
           CAST(cum AS BIGINT)      AS cum_tokens,
           cum <= 400               AS selected
    FROM w
    """,
)
def z40_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline with a COMPLETE end-to-end oracle
    (unlike q20's iterative composition, every stage here is closed-
    form SQL): Gopher rule gate (line rules vacuous on the fixture's
    single-line docs, so the battery reduces to its five active
    rules) → cross-document paragraph dedup with reassembly → per-
    source token-budget selection ranked by dedup-survival quality.
    Exercises three new operators (``quality_rules``, ``paragraphs``,
    ``selection``) composing through joins and windows exactly as a
    production curation DAG would. Reference parity: the multi-stage
    prepare-then-select flow of `02_Data Ingest.py` +
    `03_Model Training.py`, text-corpus flavor.

    Scale shape: the union of its stages' budgets — zero-shuffle rule
    gate, two body shuffles + narrow keeper vote for the dedup, one
    window for the budget; nothing new beyond the parts."""
    from computer_vision_foundations_spark.operators.paragraphs import (
        paragraph_dedup,
    )
    from computer_vision_foundations_spark.operators.quality_rules import (
        gopher_quality_flags,
    )
    from computer_vision_foundations_spark.operators.selection import (
        quality_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs, min_words=40)
    kept = docs.join(
        flags.where("passes_gopher").select("doc_id"), "doc_id"
    )
    deduped = paragraph_dedup(kept, para_words=3)
    src = docs.select("doc_id", "source")
    scored = deduped.join(src, "doc_id").select(
        "doc_id",
        "source",
        "n_paras",
        "n_kept",
        F.when(F.col("cleaned_len") == 0, F.lit(0))
        .otherwise(F.size(F.split("cleaned_text", " ")))
        .cast("long")
        .alias("n_tokens"),
        F.round(F.col("n_kept") / F.col("n_paras"), 6).alias("quality"),
    )
    # quality_budget_select passes every input column through, so the
    # stage columns (n_paras, n_kept) survive without re-joining the
    # dedup lineage
    return quality_budget_select(
        scored,
        domain_col="source",
        quality_col="quality",
        tokens_col="n_tokens",
        token_budget=400,
    ).select(
        "doc_id",
        "source",
        "n_paras",
        "n_kept",
        "n_tokens",
        "quality",
        "cum_tokens",
        "selected",
    )


@_register(
    "z41_hard_negatives",
    """
    SELECT anchor_id, negative_id, cos_sim, rank FROM (
      SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])),
                   6) AS cos_sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                            CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])), 6) DESC,
                        b.vec_id ASC) AS rank
      FROM embeddings a JOIN embeddings b ON a.label <> b.label
      WHERE a.vec_id < 20) t
    WHERE rank <= 10
    """,
)
def z41_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (DPR/ANCE shape):
    for each anchor vector, the 10 most cosine-similar corpus vectors
    with a DIFFERENT label — the negatives that actually move a
    retriever (``operators/negatives.py``, reusing the broadcast
    brute-force join discipline of ``similarity.brute_force_knn``
    plus the label-inequality pair filter). Exact, total-order
    deterministic, fully oracled. Reference parity: the class-aware
    pair construction the reference's training stage implies for its
    labeled image corpus.

    Scale shape: anchors broadcast (model-sized probe set), one corpus
    scan, one per-anchor top-k window — the ANN-family contract; swap
    the exact scan for the IVF/PQ index at corpus scale."""
    from computer_vision_foundations_spark.operators.negatives import (
        hard_negative_mining,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 20)
    return hard_negative_mining(emb, anchors, k=10)


@_register(
    "z42_label_noise",
    """
    WITH nn AS (
      SELECT qid, cos_sim, rank FROM (
        SELECT a.vec_id AS qid,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])),
                     6) AS cos_sim,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(
                              CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])), 6) DESC,
                          b.vec_id ASC) AS rank
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id) t
      WHERE rank <= 3
    ), agg AS (
      SELECT qid, max(rank) AS n_neighbors, min(cos_sim) AS weakest
      FROM nn GROUP BY qid
    )
    SELECT e.vec_id                      AS vec_id,
           e.label                       AS label,
           weakest                       AS kth_sim,
           CAST(n_neighbors AS BIGINT)   AS n_neighbors,
           weakest < 0.2                 AS suspect
    FROM agg JOIN embeddings e ON agg.qid = e.vec_id
    """,
)
def z42_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label-noise audit (deep k-NN auditing shape):
    each vector's similarity to its 3rd-nearest SAME-label neighbor;
    points weakly attached to their own class (``kth_sim < 0.2``, the
    fixture's median) are suspect mislabels
    (``operators/negatives.py`` over the blocked self-kNN join, so
    pairs form only within classes — Σ|class|², never n²). Exact and
    fully oracled end-to-end.

    Scale shape: the blocked self-join's budget plus one per-point
    aggregate; vectors shuffle only within their class block."""
    from computer_vision_foundations_spark.operators.negatives import (
        label_noise_scores,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return label_noise_scores(emb, k=3, threshold=0.2)


@_register(
    "z43_image_augment",
    """
    WITH px AS (
        SELECT doc_id,
               ord(substr(text,
                   CAST(2*(u.j // 4)*9 + 7 - 2*(u.j % 4) + 1 AS INTEGER),
                   1)) AS v
        FROM documents, unnest(range(16)) u(j)
        WHERE length(text) >= 72
    ), r AS (
        SELECT doc_id, v,
               row_number() OVER (PARTITION BY doc_id ORDER BY v) AS rn
        FROM px
    )
    SELECT doc_id,
           round(avg(v), 4)                           AS mean,
           CAST(max(CASE WHEN rn = 9 THEN v END)
                AS INTEGER)                           AS median,
           CAST(min(v) AS INTEGER)                    AS pmin,
           CAST(max(v) AS INTEGER)                    AS pmax
    FROM r GROUP BY doc_id
    """,
)
def z43_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic image augmentation with TWO full codec round
    trips: text → REAL 8×9 PNG → decode → center-crop 8×8 →
    horizontal flip → nearest-neighbor resize to 4×4 → RE-ENCODE as a
    real PNG → decode again → pixel statistics
    (``functions/augment.py`` — the data-side subset of the
    reference's resize-to-model-input step, `03_Model Training.py`).
    Every transform is integer index arithmetic, so the oracle replays
    the whole chain as character picks ``byte[2r·9 + (7−2c)]`` — a
    crop-offset, flip-direction, resize-index or re-encode bug
    hash-fails. Statistics follow ImageStat definitions (median = 9th
    smallest of the 16 pixels).

    Scale shape: two narrow Arrow projections (augment, stats) — no
    shuffle; augmented bytes are smaller than inputs and never leave
    the executor."""
    from computer_vision_foundations_spark.functions.augment import (
        augment_png_udf,
    )
    from computer_vision_foundations_spark.functions.image import (
        encode_text_png_8x9,
        with_image_statistics,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 72
    )
    png = docs.select(
        "doc_id", encode_text_png_8x9(F.col("text")).alias("content")
    )
    aug = png.select(
        "doc_id",
        augment_png_udf((8, 8), True, (4, 4))(F.col("content")).alias(
            "content"
        ),
    )
    st = with_image_statistics(aug)
    return st.select(
        "doc_id",
        F.round(F.col("statistics.mean")[0], 4).alias("mean"),
        F.col("statistics.median")[0].alias("median"),
        F.col("statistics.extrema")[0][0].alias("pmin"),
        F.col("statistics.extrema")[0][1].alias("pmax"),
    )


@_register(
    "z44_k_anonymity",
    """
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS class_size,
           count(*) < 5             AS at_risk
    FROM documents GROUP BY source, lang
    """,
)
def z44_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifier combinations (Sweeney
    2002): every observed (source, lang) equivalence class with its
    size and an ``at_risk`` flag for classes below k=5
    (``operators/privacy.py``). The governance gate a corpus release
    runs before publication; the reference's EXIF metadata (camera
    make/model/timestamp) is exactly such a QI set. Oracle is the
    direct relational replay.

    Scale shape: ONE hash aggregate over narrow QI columns with
    map-side partials; suppression joins the ≤(k−1)·|violations|-row
    class table back broadcast (tested, not in this query)."""
    from computer_vision_foundations_spark.operators.privacy import (
        k_anonymity_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    return k_anonymity_report(docs, ["source", "lang"], k=5)


@_register(
    "z45_zipf_fit",
    """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), c AS (
        SELECT token, count(*) AS n FROM toks
        WHERE token <> '' GROUP BY token
    ), top AS (
        SELECT token, n,
               row_number() OVER (ORDER BY n DESC, token) AS rank
        FROM c QUALIFY rank <= 50
    ), l AS (
        SELECT ln(CAST(rank AS DOUBLE)) AS x,
               ln(CAST(n AS DOUBLE)) AS y
        FROM top
    ), a AS (
        SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
               sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        FROM l
    )
    SELECT CAST(m AS BIGINT) AS n_terms,
           round((sxy - sx*sy/m) / (sxx - sx*sx/m), 6) AS slope,
           round((sy - (sxy - sx*sy/m) / (sxx - sx*sx/m) * sx) / m, 6)
               AS intercept,
           round(((sxy - sx*sy/m) * (sxy - sx*sy/m))
                 / ((sxx - sx*sx/m) * (syy - sy*sy/m)), 6) AS r2
    FROM a
    """,
)
def z45_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic over the top-50 vocabulary: log-log
    rank-frequency least-squares slope, intercept and r² — the
    corpus-health number (natural text ≈ −1; boilerplate and
    synthetic spam bend it) — ``operators/vocab.py:zipf_fit``. The
    oracle replays the top-V ranking and the closed-form regression
    with identical expression structure so the doubles agree at
    round-6.

    Scale shape: the corpus-sized token-count table is never globally
    sorted (TakeOrderedAndProject top-V); the regression is a scalar
    aggregate over V rows."""
    from computer_vision_foundations_spark.operators.vocab import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    return zipf_fit(docs, v=50)


def _consensus_oracle_sql() -> str:
    """Composed oracle: the three modality pair sets are the already-
    registered z32 / z36 / q49 oracles verbatim (each with its own
    WITH chain, nested as subqueries), full-outer-merged on the pair
    key. Consensus = present in ≥ 2 modalities."""
    img = _ORACLES["q36_image_near_dup"]
    aud = _ORACLES["z36_audio_fingerprint_pairs"]
    txt = _ORACLES["q49_simhash_near_dup_pairs"]
    return f"""
    WITH img AS (SELECT id_a, id_b FROM ({img})),
         aud AS (SELECT id_a, id_b FROM ({aud})),
         txt AS (SELECT id_a, id_b FROM ({txt})),
         u AS (SELECT id_a, id_b FROM img
               UNION SELECT id_a, id_b FROM aud
               UNION SELECT id_a, id_b FROM txt)
    SELECT u.id_a, u.id_b,
           i.id_a IS NOT NULL AS in_image,
           a.id_a IS NOT NULL AS in_audio,
           t.id_a IS NOT NULL AS in_text,
           CAST((i.id_a IS NOT NULL)::INT
                + (a.id_a IS NOT NULL)::INT
                + (t.id_a IS NOT NULL)::INT AS BIGINT) AS n_modalities
    FROM u LEFT JOIN img i USING (id_a, id_b)
           LEFT JOIN aud a USING (id_a, id_b)
           LEFT JOIN txt t USING (id_a, id_b)
    WHERE (i.id_a IS NOT NULL)::INT + (a.id_a IS NOT NULL)::INT
          + (t.id_a IS NOT NULL)::INT >= 2
    """


@_register("z46_multimodal_consensus_pairs", _consensus_oracle_sql())
def z46_multimodal_consensus_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal duplicate consensus — the capstone composition of
    the three modality-specific near-dup generators over the SAME
    corpus: image dHash Hamming pairs (z32, real PNG decode), audio
    energy-landmark fingerprint pairs (z36, real WAV decode), and
    text SimHash pairs (q49). A pair flagged by ≥ 2 independent
    modalities is a high-precision duplicate (the standard ensemble
    trick: modality-specific false positives rarely coincide);
    ``n_modalities`` grades confidence. The oracle nests the three
    already-verified oracles verbatim and replays the consensus merge,
    so this query re-verifies all three chains plus the merge in one
    hash.

    Scale shape: the union of the three generators' budgets; the
    consensus itself joins PAIR tables (outputs, orders of magnitude
    smaller than the corpus) on the pair key — three small hash
    joins, nothing corpus-sized."""
    t = F.lit(True)
    img = q36_image_near_dup(spark, sf_dir).select(
        "id_a", "id_b", t.alias("in_image")
    )
    aud = z36_audio_fingerprint_pairs(spark, sf_dir).select(
        "id_a", "id_b", t.alias("in_audio")
    )
    txt = q49_simhash_near_dup_pairs(spark, sf_dir).select(
        "id_a", "id_b", t.alias("in_text")
    )
    # chained FULL OUTER joins (key columns coalesce under list-form
    # join keys) evaluate each generator subtree exactly once — the
    # union-then-left-join formulation would run every leg twice
    out = (
        img.join(aud, ["id_a", "id_b"], "full")
        .join(txt, ["id_a", "id_b"], "full")
        .select(
            "id_a",
            "id_b",
            F.coalesce("in_image", F.lit(False)).alias("in_image"),
            F.coalesce("in_audio", F.lit(False)).alias("in_audio"),
            F.coalesce("in_text", F.lit(False)).alias("in_text"),
        )
    )
    n = (
        F.col("in_image").cast("int")
        + F.col("in_audio").cast("int")
        + F.col("in_text").cast("int")
    )
    return out.withColumn("n_modalities", n.cast("long")).where(
        F.col("n_modalities") >= 2
    )


@_register(
    "z47_hashed_features",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents
    ), h AS (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 7))::BIGINT % 64 AS bucket,
               CASE WHEN ('0x' || substr(md5(t), 8, 7))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM toks WHERE t <> ''
    )
    SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS weight
    FROM h GROUP BY doc_id, bucket HAVING sum(sgn) <> 0
    """,
)
def z47_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009; the
    HashingVectorizer / Vowpal Wabbit shape): signed 64-bucket hashed
    bag-of-words as sparse ``(doc_id, bucket, weight)`` triples
    (``functions/feature_hash.py``), the zero-coordination featurizer
    — no vocabulary fit, no broadcast dictionary, so it is the one
    text featurizer that needs NOTHING shared at 100 TB. Buckets and
    signs use the portable md5 pair family, so the oracle replays the
    featurization bit-for-bit.

    Scale shape: one narrow token projection + ONE (id, bucket) hash
    aggregate with map-side partials; only sparse triples shuffle."""
    from computer_vision_foundations_spark.functions.feature_hash import (
        hashed_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return hashed_features(docs, d=64)


@_register(
    "z48_class_compactness",
    """
    WITH el AS (
        SELECT vec_id, label, u.i AS i,
               CAST(embedding[CAST(u.i + 1 AS INTEGER)] AS DOUBLE) AS x
        FROM embeddings, unnest(range(len(embedding))) u(i)
    ), cent AS (
        SELECT label, i, avg(x) AS c FROM el GROUP BY label, i
    ), j AS (
        SELECT el.vec_id, el.label, el.x, cent.c
        FROM el JOIN cent USING (label, i)
    ), pv AS (
        SELECT vec_id, label,
               sum(x * c) AS dot, sum(x * x) AS vv, sum(c * c) AS cc
        FROM j GROUP BY vec_id, label
    ), cz AS (
        SELECT vec_id, label, cc,
               CASE WHEN vv > 0 AND cc > 0
                    THEN dot / (sqrt(vv) * sqrt(cc)) ELSE 0.0 END AS cos
        FROM pv
    )
    SELECT label,
           CAST(count(*) AS BIGINT)          AS n,
           round(sqrt(max(cc)), 6)           AS centroid_norm,
           round(avg(cos), 6)                AS mean_cos
    FROM cz GROUP BY label
    """,
)
def z48_class_compactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health report: per-class centroid norm and mean
    member-to-centroid cosine (``operators/embedding_stats.py``) —
    the separability diagnostic run before training and after every
    re-embedding (compact classes predict linear-probe accuracy;
    diffuse ones flag drift or label noise — the aggregate companion
    to z42's per-point audit). Pure relational explode arithmetic
    with floats promoted to double BEFORE any product, so the oracle
    replays the identical expression shapes at round-6.

    Scale shape: two keyed shuffles of narrow element rows; the
    (|labels|·dim)-row centroid table is broadcast; vectors never
    move whole."""
    from computer_vision_foundations_spark.operators.embedding_stats import (
        class_compactness,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return class_compactness(emb)


@_register(
    "z49_kmv_user_distinct",
    """
    WITH hx AS (
        SELECT DISTINCT event_type,
               md5(CAST(user_id AS VARCHAR)) AS h
        FROM events WHERE user_id IS NOT NULL
    ), regs AS (
        SELECT event_type, h,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY h) AS pos
        FROM hx QUALIFY pos <= 64
    ), agg AS (
        SELECT event_type, count(*) AS n,
               max(CASE WHEN pos = 64 THEN
                   ('0x' || substr(h, 1, 13))::BIGINT
                   / 4503599627370496.0 END) AS tk
        FROM regs GROUP BY event_type
    )
    SELECT event_type,
           round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                      ELSE 63.0 / tk END, 4) AS approx_distinct
    FROM agg
    """,
)
def z49_kmv_user_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users via the KMV bottom-k
    sketch (``functions/sketches.kmv_distinct``, k=64) — the batch
    twin of the streaming state-store sketch
    (``streaming/stateful.approx_distinct_stateful``, identical hash
    math). With more distinct users per type than k the ESTIMATOR path is
    active (unlike exact-below-k fixtures), so the oracle checks the
    (k−1)/theta formula itself, bit-for-bit via the 52-bit hash
    fraction. This is the per-key cardinality report (DAU per surface,
    uniques per domain) that exact distinct cannot afford at stream
    scale.

    Scale shape: one narrow distinct over (key, 16-byte md5) with
    map-side partials; everything after touches ≤ k rows per key."""
    from computer_vision_foundations_spark.functions.sketches import (
        kmv_distinct,
    )

    ev = load_table(spark, sf_dir, "events")
    return kmv_distinct(
        ev, "user_id", k=64, keys=["event_type"]
    )


def _ndcg_oracle_sql() -> str:
    """Composed oracle: the verified q04 BM25 ranking nested verbatim,
    graded relevance = count of query terms present in the document,
    then the nDCG@10 metric replayed relationally."""
    qv = ", ".join(
        "({}, [{}])".format(
            qid, ", ".join(f"'{t}'" for t in terms)
        )
        for qid, terms in _BM25_QUERIES
    )
    return f"""
    WITH ranked AS (
        SELECT query_id, doc_id, rank FROM ({_bm25_oracle_sql()})
    ), qv(query_id, terms) AS (VALUES {qv}),
    qrp AS (
        SELECT * FROM (
            SELECT qv.query_id, d.doc_id,
                   len(list_filter(qv.terms,
                       t -> list_contains(
                           string_split(d.text, ' '), t))) AS rel
            FROM documents d CROSS JOIN qv) t
        WHERE rel > 0
    ), hits AS (
        SELECT r.query_id, r.rank, coalesce(q.rel, 0) AS rel
        FROM ranked r LEFT JOIN qrp q
          ON r.query_id = q.query_id AND r.doc_id = q.doc_id
        WHERE r.rank <= 10
    ), dcg AS (
        SELECT query_id,
               sum((power(2.0, rel) - 1) / log2(rank + 1)) AS dcg
        FROM hits GROUP BY 1
    ), ideal AS (
        SELECT query_id,
               sum((power(2.0, rel) - 1) / log2(rk + 1)) AS idcg
        FROM (
            SELECT query_id, rel,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY rel DESC, doc_id) AS rk
            FROM qrp) t
        WHERE rk <= 10 GROUP BY 1
    )
    SELECT d.query_id,
           round(d.dcg, 6)                    AS dcg,
           round(coalesce(i.idcg, 0.0), 6)    AS idcg,
           round(CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg
                      ELSE 0.0 END, 6)        AS ndcg
    FROM dcg d LEFT JOIN ideal i USING (query_id)
    """


@_register("z50_bm25_ndcg", _ndcg_oracle_sql())
def z50_bm25_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-retrieval quality metric: nDCG@10 of the BM25 ranking
    (q04's exact pipeline) against graded relevance = how many of the
    query's terms the document contains (Järvelin & Kekäläinen 2002;
    ``operators/ir_eval.py``). Completes the evaluation family —
    recall@k grades the ANN engines, PRF grades dedup candidates,
    nDCG grades ranked text retrieval. The oracle nests the verified
    BM25 oracle verbatim and replays judgment construction, the
    discounted gains and the ideal re-ranking, so ranking AND metric
    are one hash.

    Scale shape: the BM25 budget plus joins over top-k rankings and
    |queries|·|matching docs| judgment rows — model-sized metric
    tables; one narrow hash join + a |queries|-row aggregate."""
    from computer_vision_foundations_spark.operators.ir_eval import (
        ndcg_at_k,
    )
    from computer_vision_foundations_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, terms array<string>"
    )
    ranked = bm25_topk(docs, queries_df, k=10)
    toks = docs.select("doc_id", F.split("text", " ").alias("tk"))
    qrels = (
        toks.crossJoin(F.broadcast(queries_df))
        .select(
            "query_id",
            "doc_id",
            F.size(
                F.filter(
                    "terms",
                    lambda t: F.array_contains(F.col("tk"), t),
                )
            ).alias("rel"),
        )
        .where(F.col("rel") > 0)
    )
    return ndcg_at_k(ranked, qrels, k=10)


def _triangle_oracle_sql() -> str:
    """Composed oracle: the verified q49 SimHash pair oracle is the
    edge list, fed verbatim into the shared orientation + wedge-close
    SQL twin (``operators/triangles.py``)."""
    from computer_vision_foundations_spark.operators.triangles import (
        triangles_oracle_sql,
    )

    return triangles_oracle_sql(
        f"SELECT id_a, id_b FROM ({_ORACLES['q49_simhash_near_dup_pairs']})"
    )


@_register("q40_triangle_stats", _triangle_oracle_sql())
def q40_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficients over the
    SimHash near-duplicate pair graph (q49's exact edges) — the
    cohesion audit between pair generation and destructive cluster
    collapse: clique-like clusters (coefficient ≈ 1) are safe to
    dedup, transitivity-stitched chains (few triangles) deserve
    re-verification. Runs the structural-equivalence COLLAPSED path
    (``operators/triangles.triangle_stats_collapsed``): SimHash
    adjacency is a pure function of the fingerprint, so same-
    fingerprint nodes collapse to weighted super-nodes, the
    degree-oriented node-iterator (Suri & Vassilvitskii, WWW 2011)
    enumerates triangles on the tiny quotient graph, and per-node
    counts expand in closed form — the clique blowup of dedup graphs
    (c³/6 triangles per c-clique) never materializes (194 s → ~3 s at
    sf0.1). The oracle replays the NAIVE per-node construction, so
    the closed form is value-hash-verified end to end.

    Scale shape: shuffles carry (node, long) degrees and quotient id
    pairs only; the close test is one left-semi equi-join; the
    expansion is one join of class-level stats onto the class map."""
    from computer_vision_foundations_spark.operators.triangles import (
        triangle_stats_collapsed,
    )

    pairs = q49_simhash_near_dup_pairs(spark, sf_dir)
    fingerprints = q92_simhash(spark, sf_dir)
    return triangle_stats_collapsed(
        pairs, fingerprints, node_col="doc_id", cls_col="simhash"
    )


def _nb_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_oracle_sql,
    )

    return nb_oracle_sql()


@_register("z52_naive_bayes_lang", _nb_oracle_sql())
def z52_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained in one
    corpus pass and applied to every document — the closed-form
    member of the fastText-style quality/domain filter family every
    curation pipeline runs (CCNet's language filter, GPT-3's
    WebText-vs-CommonCrawl classifier) — ``operators/nbayes.py``.
    Laplace α=1, resubstitution scoring, deterministic
    (score DESC, class ASC) argmax.

    Scale shape: the model is a |V|·|classes| broadcast; the token
    stream shuffles once into per-doc bags; scoring is a broadcast
    join + one keyed hash aggregate; the argmax is a |classes|-row
    per-doc window. No driver state."""
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_train_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    return nb_train_score(docs)


@_register(
    "z53_kneser_ney_surprisal",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               t[CAST(u.i AS INTEGER) + 1] AS token,
               CASE WHEN u.i > 0 THEN t[CAST(u.i AS INTEGER)] END AS prev
        FROM toks, unnest(range(len(t))) u(i)
    ), uni AS (
        SELECT token, count(*) AS ucnt FROM pos GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(ucnt) AS DOUBLE) AS n FROM uni
    ), bi AS (
        SELECT prev, token, count(*) AS bcnt FROM pos
        WHERE prev IS NOT NULL GROUP BY 1, 2
    ), pstats AS (
        SELECT prev, CAST(sum(bcnt) AS DOUBLE) AS pcnt,
               CAST(count(*) AS DOUBLE) AS fanout
        FROM bi GROUP BY 1
    ), cont AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS ccnt FROM bi GROUP BY 1
    ), ctot AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_bigrams FROM bi
    )
    SELECT p.doc_id, count(*) AS n_tokens,
           round(avg(-log2(CASE WHEN p.prev IS NULL THEN u.ucnt / tot.n
               ELSE greatest(coalesce(CAST(b.bcnt AS DOUBLE), 0.0)
                             - {0.75!r}, 0.0) / ps.pcnt
                    + {0.75!r} * ps.fanout / ps.pcnt
                      * (coalesce(c.ccnt, 0.0) / ctot.n_bigrams)
               END)), 6) AS surprisal
    FROM pos p
    JOIN uni u USING (token)
    CROSS JOIN tot
    LEFT JOIN bi b ON b.prev = p.prev AND b.token = p.token
    LEFT JOIN pstats ps ON ps.prev = p.prev
    LEFT JOIN cont c ON c.token = p.token
    CROSS JOIN ctot
    GROUP BY p.doc_id
    """,
)
def z53_kneser_ney_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram surprisal
    (operators/perplexity.kneser_ney_logprob_scores) — the smoothing
    KenLM/SRILM made standard (Chen & Goodman 1999), completing the
    LM-filter ladder: q47 unigram → q11 Jelinek-Mercer → KN, whose
    continuation-probability backoff separates genuinely productive
    tokens from frequent-but-frozen collocation tails. D=0.75,
    first token unigram-MLE. The oracle replays identical count
    algebra and discount literals.

    Scale shape: three bigram-table aggregates for the model, four
    hash joins on the (id, pos, prev, token) stream, one per-doc
    aggregate — the exact q11 budget plus one |vocab|-row join."""
    from computer_vision_foundations_spark.operators.perplexity import (
        kneser_ney_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = kneser_ney_logprob_scores(docs, "text", "doc_id", discount=0.75)
    return out.select(
        "doc_id", "n_tokens", F.round("surprisal", 6).alias("surprisal")
    )


def _lpa_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.lpa import (
        lpa_oracle_sql,
    )

    return lpa_oracle_sql(
        f"SELECT id_a, id_b FROM ({_ORACLES['q49_simhash_near_dup_pairs']})",
        n_rounds=4,
    )


@_register("q41_lpa_communities", _lpa_oracle_sql())
def q41_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al.
    2007) over the SimHash near-duplicate pair graph — the
    majority-vote refinement of connected components: a bridge edge
    between two dense duplicate families no longer merges them, so
    communities are the safer unit for destructive dedup than raw
    components (``operators/lpa.py``; z51's triangle audit flags the
    same risk, this operator resolves it). Deterministic smallest-
    label tie-break; 4 fixed rounds; oracle unrolls the identical
    recurrence one CTE per round.

    Scale shape: per round ONE edge-list shuffle carrying (node,
    label) longs + a per-node window over its label histogram;
    label tables localCheckpoint with explicit release (the
    components.py discipline)."""
    from computer_vision_foundations_spark.operators.lpa import (
        label_propagation,
    )

    pairs = q49_simhash_near_dup_pairs(spark, sf_dir)
    return label_propagation(pairs, "id_a", "id_b", n_rounds=4)


def _novelty_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.novelty import (
        novelty_oracle_sql,
    )

    return novelty_oracle_sql(
        cand_where="doc_id % 2 = 1", ref_where="doc_id % 2 = 0", k=3
    )


@_register("z55_ngram_novelty", _novelty_oracle_sql())
def z55_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty of a candidate half-corpus against
    the reference half (odd vs even doc ids as the stand-in snapshot
    split): fraction of distinct word-3-gram shingles unseen in the
    reference — the keep/drop signal for incoming crawl dumps and the
    dual of decontamination (``operators/novelty.py``; Lee et al.
    2022's train-set novelty at shingle granularity).

    Scale shape: both sides reduce to (id, shingle) projections via
    the shared zip_with shingle fold; novelty is ONE left-anti hash
    join + a per-doc aggregate; bodies never shuffle."""
    from computer_vision_foundations_spark.operators.novelty import (
        ngram_novelty,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        "text",
        "doc_id",
        k=3,
    )


@_register(
    "z56_containment_pairs",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS shingle FROM sh),
    exf AS (SELECT * FROM ex
            QUALIFY count(*) OVER (PARTITION BY shingle) <= 100)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(count(*) / CAST(least(a.sz, b.sz) AS DOUBLE), 6) AS overlap,
           round(count(*) / CAST(a.sz AS DOUBLE), 6) AS containment_a,
           round(count(*) / CAST(b.sz AS DOUBLE), 6) AS containment_b
    FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
    HAVING count(*) / CAST(least(a.sz, b.sz) AS DOUBLE) >= 0.5
    """,
)
def z56_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-subset pairs by shingle containment
    (operators/dedup.containment_pairs) — Broder-1997's second
    resemblance measure, catching the doc-inside-doc duplicates
    symmetric Jaccard (q90) misses: a paragraph quoted inside a 100×
    longer page is Jaccard ≈ 1% but containment ≈ 100%. Same
    candidate machinery and hot-shingle cap as q90; only the scoring
    expression differs (overlap coefficient + both directional
    containments), so the two queries differ exactly where the
    operators do."""
    from computer_vision_foundations_spark.operators.dedup import (
        containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs,
        "text",
        "doc_id",
        k=3,
        threshold=0.5,
        max_shingle_freq=100,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


def _kcore_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.kcore import (
        kcore_oracle_sql,
    )

    return kcore_oracle_sql(
        f"SELECT id_a, id_b FROM ({_ORACLES['q49_simhash_near_dup_pairs']})",
        k=3,
        n_rounds=8,
    )


@_register("q42_kcore_members", _kcore_oracle_sql())
def q42_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the SimHash near-duplicate pair graph — iterative
    degree peeling (Batagelj & Zaveršnik 2003) until every surviving
    node keeps ≥ 3 neighbors: the "hard kernel" of each duplicate
    family after weakly-attached stragglers are stripped, completing
    the graph-cohesion kit (z51 triangles, z54 communities) —
    ``operators/kcore.py``. Runs the structural-equivalence COLLAPSED
    peel (same contract as z51): same-fingerprint nodes always share
    a degree, so whole classes peel together and the rounds run on
    the weighted quotient graph with a fixpoint early-stop — the
    clique-dense edge list never re-materializes per round. The
    oracle unrolls the identical NAIVE peel one CTE per round, so the
    quotient simulation is value-hash-verified.

    Scale shape: per round one quotient degree aggregate + one
    left-semi + weight join, all on class ids; quotient tables
    localCheckpoint with explicit release."""
    from computer_vision_foundations_spark.operators.kcore import (
        k_core_collapsed,
    )

    pairs = q49_simhash_near_dup_pairs(spark, sf_dir)
    fingerprints = q92_simhash(spark, sf_dir)
    return k_core_collapsed(
        pairs,
        fingerprints,
        node_col="doc_id",
        cls_col="simhash",
        k=3,
        n_rounds=8,
    )


_PHRASES = [
    (0, ["hash", "join"]),
    (1, ["table", "scan"]),
    (2, ["sort", "merge", "join"]),
]


def _phrase_oracle_sql() -> str:
    """Per-phrase list scan: count positions where k consecutive
    tokens equal the phrase — the closed-form twin of the positional-
    postings join chain."""
    parts = []
    for pid, terms in _PHRASES:
        k = len(terms)
        conds = " AND ".join(
            f"t[CAST(i AS INTEGER) + {j}] = '{t}'"
            for j, t in enumerate(terms)
        )
        parts.append(
            f"""SELECT {pid} AS phrase_id, doc_id,
               len(list_filter(range(1, len(t) + 1 - {k - 1}),
                               i -> {conds})) AS n_matches
        FROM toks"""
        )
    body = "\n        UNION ALL\n        ".join(parts)
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), m AS (
        {body}
    )
    SELECT phrase_id, doc_id, CAST(n_matches AS BIGINT) AS n_matches
    FROM m WHERE n_matches > 0
    ORDER BY phrase_id, doc_id
    """


@_register("z58_phrase_search", _phrase_oracle_sql())
def z58_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index
    (operators/retrieval.phrase_search) — the retrieval primitive
    bag-of-words BM25 cannot express (positional postings, Manning
    et al. IIR §2.4); mixed 2- and 3-term phrases verify the
    variable-length join chain. The oracle counts consecutive-token
    matches with a per-phrase list scan — same semantics, closed
    form.

    Scale shape: the token stream is semi-joined against the
    broadcast phrase vocabulary BEFORE any shuffle (the BM25
    discipline), then |terms|−1 co-partitioned (doc, pos) hash
    joins; postings shuffle is bounded by phrase-term document
    frequency."""
    from computer_vision_foundations_spark.operators.retrieval import (
        phrase_search,
    )

    docs = load_table(spark, sf_dir, "documents")
    phrases = spark.createDataFrame(
        _PHRASES, "phrase_id int, terms array<string>"
    )
    return phrase_search(docs, phrases)


def _nb_report_oracle_sql() -> str:
    return f"""
    WITH preds AS MATERIALIZED ({_ORACLES["z52_naive_bayes_lang"]}),
    pairs AS (
        SELECT lang AS actual, predicted, count(*) AS n
        FROM preds GROUP BY 1, 2
    ),
    tp AS (SELECT actual AS cls, n AS tp FROM pairs
           WHERE actual = predicted),
    at AS (SELECT actual AS cls, sum(n) AS support FROM pairs GROUP BY 1),
    pt AS (SELECT predicted AS cls, sum(n) AS pred_n FROM pairs GROUP BY 1),
    per0 AS (
        SELECT COALESCE(at.cls, pt.cls) AS cls,
               COALESCE(at.support, 0) AS support,
               COALESCE(tp.tp, 0) AS tp,
               COALESCE(pt.pred_n, 0) - COALESCE(tp.tp, 0) AS fp,
               COALESCE(at.support, 0) - COALESCE(tp.tp, 0) AS fn
        FROM at FULL JOIN pt ON at.cls = pt.cls
        LEFT JOIN tp ON tp.cls = COALESCE(at.cls, pt.cls)
    ),
    pr AS (
        SELECT cls, support, tp, fp, fn,
               CASE WHEN tp + fp > 0
                    THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END AS p,
               CASE WHEN tp + fn > 0
                    THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END AS r
        FROM per0
    ),
    per AS (
        SELECT cls, support, tp, fp, fn,
               round(p, 6) AS precision, round(r, 6) AS recall,
               round(CASE WHEN p + r > 0
                          THEN 2 * p * r / (p + r) ELSE 0.0 END, 6) AS f1
        FROM pr
    )
    SELECT cls, CAST(support AS BIGINT) AS support,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, precision, recall, f1
    FROM per
    UNION ALL
    SELECT '__macro__', CAST(sum(support) AS BIGINT),
           CAST(sum(tp) AS BIGINT), CAST(sum(fp) AS BIGINT),
           CAST(sum(fn) AS BIGINT),
           round(avg(precision), 6), round(avg(recall), 6),
           round(avg(f1), 6)
    FROM per
    ORDER BY cls
    """


@_register("z59_nb_classification_report", _nb_report_oracle_sql())
def z59_nb_classification_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-class precision/recall/F1 + macro summary for the z52
    Naive Bayes language classifier
    (operators/cls_eval.classification_report) — the confusion-margin
    metrics any classifier-as-corpus-filter needs before its keep/
    drop decisions are trusted; completes the evaluation family
    (recall@k → ANN, nDCG → ranking, PRF → dedup candidates, this →
    classifiers). The oracle nests the verified z52 oracle and
    replays the margin algebra.

    Scale shape: corpus shuffles once as (actual, predicted) pairs;
    everything after is |classes|²-row algebra."""
    from computer_vision_foundations_spark.operators.cls_eval import (
        classification_report,
    )
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_train_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    preds = nb_train_score(docs)
    return classification_report(preds, "lang", "predicted")


def _auc_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.cls_eval import (
        auc_oracle_sql,
    )

    return auc_oracle_sql(
        f"""SELECT (d.lang = 'zh') AS label, s.surprisal AS score
            FROM ({_ORACLES["z53_kneser_ney_surprisal"]}) s
            JOIN documents d ON d.doc_id = s.doc_id"""
    )


@_register("z60_surprisal_auc", _auc_oracle_sql())
def z60_surprisal_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free ROC-AUC (Mann-Whitney rank-sum identity, ½
    credit for ties) of the z53 Kneser-Ney surprisal score as a
    detector of zh-language documents
    (operators/cls_eval.auc_score) — does the LM actually separate
    the distribution it would gate? The oracle nests the verified
    z53 oracle and replays the histogram cumulative fold.

    Scale shape: the corpus contributes ONE hash aggregate into a
    (score, n_pos, n_neg) histogram; the ordered fold runs over
    distinct rounded scores — model-sized regardless of corpus."""
    from computer_vision_foundations_spark.operators.cls_eval import (
        auc_score,
    )

    scored = z53_kneser_ney_surprisal(spark, sf_dir).join(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang"),
        "doc_id",
    )
    return auc_score(
        scored.select(
            (F.col("lang") == "zh").alias("label"),
            F.col("surprisal").alias("score"),
        )
    )


def _dbscan_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.dbscan import (
        dbscan_oracle_sql,
    )

    return dbscan_oracle_sql(eps=1.2, min_pts=5)


@_register("z61_dbscan_clusters", _dbscan_oracle_sql())
def z61_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked DBSCAN (Ester et al. 1996) over the embedding
    table — density clustering with an explicit NOISE label, the
    off-manifold-junk detector the centroid family can't express
    (``operators/dbscan.py``). ε=1.2, min_pts=5, blocking on the
    first two dims; clusters close through the engine's own
    connected-components operator; border points take the smallest
    core-neighbor label (determinism rule). The oracle runs the
    UNBLOCKED quadratic join + a recursive-CTE closure, so the hash
    also proves the grid join loses no ε-pair.

    Scale shape: vectors cross once through the 3^p adjacent-cell
    equi-join; core test and labels are id-pair algebra; components
    ride the checkpointed min-label loop."""
    from computer_vision_foundations_spark.operators.dbscan import dbscan

    emb = load_table(spark, sf_dir, "embeddings")
    return dbscan(emb, "embedding", "vec_id", eps=1.2, min_pts=5)


@_register(
    "z62_heaps_fit",
    """
    WITH toks AS (
        SELECT doc_id AS d, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), t AS (
        SELECT * FROM toks WHERE token <> ''
    ), per_doc AS (
        SELECT d, count(*) AS n_toks FROM t GROUP BY d
    ), first_doc AS (
        SELECT token, min(d) AS d FROM t GROUP BY token
    ), new_types AS (
        SELECT d, count(*) AS n_new FROM first_doc GROUP BY d
    ), cum AS (
        SELECT p.d,
               sum(p.n_toks) OVER (ORDER BY p.d) AS cum_toks,
               sum(COALESCE(nt.n_new, 0)) OVER (ORDER BY p.d) AS cum_types
        FROM per_doc p LEFT JOIN new_types nt ON nt.d = p.d
    ), l AS (
        SELECT ln(CAST(cum_toks AS DOUBLE)) AS x,
               ln(CAST(cum_types AS DOUBLE)) AS y
        FROM cum
    ), a AS (
        SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
               sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        FROM l
    )
    SELECT CAST(m AS BIGINT) AS n_points,
           round((sxy - sx*sy/m) / (sxx - sx*sx/m), 6) AS beta,
           round((sy - (sxy - sx*sy/m) / (sxx - sx*sx/m) * sx) / m, 6)
               AS log_k,
           round(((sxy - sx*sy/m) * (sxy - sx*sy/m))
                 / ((sxx - sx*sx/m) * (syy - sy*sy/m)), 6) AS r2
    FROM a
    """,
)
def z62_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (operators/vocab.heaps_fit) —
    the companion corpus-health number to z45's Zipf slope: β near 0
    means the crawl is saturating (re-crawls add tokens, no types);
    β near 1 means tokenizer-hostile never-repeating vocabulary. One
    cumulative pass over the DOC-level table in doc_id order; the
    oracle replays the identical first-occurrence algebra and
    closed-form regression.

    Scale shape: three token-stream hash aggregates (per-doc counts,
    vocab first-docs, per-doc new types); the window runs over |docs|
    narrow rows, never tokens."""
    from computer_vision_foundations_spark.operators.vocab import heaps_fit

    docs = load_table(spark, sf_dir, "documents")
    return heaps_fit(docs)


def _calibration_oracle_sql() -> str:
    return f"""
    WITH preds AS MATERIALIZED ({_ORACLES["z52_naive_bayes_lang"]}),
    s AS (
        SELECT (predicted = lang) AS label, log_score AS score
        FROM preds
    )
    SELECT CAST(floor(score / 10.0) AS BIGINT) AS bin,
           round(CAST(floor(score / 10.0) AS BIGINT) * 10.0, 6) AS bin_lo,
           count(*) AS n,
           CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
           round(sum(CASE WHEN label THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS frac_pos
    FROM s GROUP BY 1 ORDER BY 1
    """


@_register("z63_nb_calibration", _calibration_oracle_sql())
def z63_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the z52 Naive Bayes classifier
    (operators/cls_eval.calibration_bins): correctness rate per
    fixed-width joint-log-likelihood bin — does higher model
    confidence actually mean more correct predictions? Fixed-width
    bins (plan literals) rather than quantiles by design: no global
    rank of the corpus, ONE hash aggregate. The oracle nests the
    verified z52 oracle."""
    from computer_vision_foundations_spark.operators.cls_eval import (
        calibration_bins,
    )
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_train_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    preds = nb_train_score(docs)
    return calibration_bins(
        preds.select(
            (F.col("predicted") == F.col("lang")).alias("label"),
            F.col("log_score").alias("score"),
        ),
        bin_width=10.0,
    )


def _best_of_cluster_oracle_sql() -> str:
    return f"""
    WITH clusters AS MATERIALIZED ({_ORACLES["q94_dedup_clusters"]}),
    q AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
               CAST(d.n_chars AS DOUBLE) AS score
        FROM documents d
        LEFT JOIN clusters c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, component, score,
           row_number() OVER (
               PARTITION BY component ORDER BY score DESC, doc_id ASC
           ) = 1 AS keep
    FROM q ORDER BY doc_id
    """


@_register("z64_keep_best_of_cluster", _best_of_cluster_oracle_sql())
def z64_keep_best_of_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection
    (operators/selection.keep_best_per_cluster): for each q94
    near-duplicate cluster keep the highest-quality member (here:
    longest document, the RefinedWeb keep-the-fullest-copy policy)
    instead of the smallest-id default; unclustered docs are
    singleton keepers. The oracle nests the verified q94
    recursive-closure oracle.

    Scale shape: one id equi-join + one per-cluster window — the
    min-id rule's exact budget."""
    from computer_vision_foundations_spark.operators.components import (
        dedup_clusters,
    )
    from computer_vision_foundations_spark.operators.selection import (
        keep_best_per_cluster,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = q26_lsh_candidate_pairs(spark, sf_dir)
    clusters = dedup_clusters(pairs).select("doc_id", "component")
    quality = docs.select(
        "doc_id", F.col("n_chars").cast("double").alias("score")
    )
    return keep_best_per_cluster(
        clusters, quality, "doc_id", "component", "score"
    )


def _jsd_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.divergence import (
        jsd_oracle_sql,
    )

    return jsd_oracle_sql()


@_register("z65_source_divergence", _jsd_oracle_sql())
def z65_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the sources' unigram
    distributions (operators/divergence.source_jsd) — the
    information-theoretic mixture diagnostic: which domains actually
    differ, and by how much, before z14/q15 assign them separate
    weights. Laplace-smoothed over the shared vocabulary; natural-log
    JSD ≤ ln 2.

    Scale shape: one token-stream hash aggregate; the distribution
    grid and its token self-join are |V|·|sources|(²) rows —
    model-sized; one final pair aggregate."""
    from computer_vision_foundations_spark.operators.divergence import (
        source_jsd,
    )

    docs = load_table(spark, sf_dir, "documents")
    return source_jsd(docs)


def _nb_cv_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_cv_oracle_sql,
    )

    return nb_cv_oracle_sql(k=3, seed=7)


@_register("z66_nb_crossval", _nb_cv_oracle_sql())
def z66_nb_crossval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-fold cross-validated Naive Bayes accuracy
    (operators/nbayes.nb_fit_score over
    operators/split.kfold_assignment folds) — the evaluation hygiene
    resubstitution (z52) can't give: each fold is scored by a model
    that never saw it, with the OOV smoothing floor exercised for
    real. Per-fold ``(fold, n, n_correct, accuracy)``. The oracle
    replays all three train/score pipelines as MATERIALIZED blocks
    with the portable md5 fold split.

    Scale shape: k model builds (each the z52 budget over (k−1)/k of
    the corpus); the folds are a pure hash function — no shuffle to
    split."""
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_fit_score,
    )
    from computer_vision_foundations_spark.operators.split import (
        kfold_assignment,
    )

    docs = load_table(spark, sf_dir, "documents")
    folded = kfold_assignment(docs, "doc_id", k=3, seed=7)
    parts = []
    for i in range(3):
        preds = nb_fit_score(
            folded.where(F.col("fold") != i),
            folded.where(F.col("fold") == i),
        )
        parts.append(
            preds.agg(
                F.lit(i).alias("fold"),
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(
                        F.col("predicted") == F.col("lang"), 1
                    ).otherwise(0)
                ).alias("n_correct"),
            )
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res.select(
        "fold",
        "n",
        "n_correct",
        F.round(
            F.col("n_correct") / F.col("n").cast("double"), 6
        ).alias("accuracy"),
    ).orderBy("fold")


def _mad_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.outliers import (
        mad_outlier_oracle_sql,
    )

    return mad_outlier_oracle_sql()


@_register("z67_mad_outliers", _mad_oracle_sql())
def z67_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier summary
    (operators/outliers.mad_outlier_summary): exact median + MAD and
    the modified-z-score flag counts — the monitoring aggregate whose
    location/scale the outliers themselves cannot corrupt.

    Scale shape: two exact-percentile hash aggregates over the narrow
    (key, value) projection, each joined back by BROADCAST; the
    percentile buffers are per-key — switch to percentile_approx for
    unbounded keys (documented in the module)."""
    from computer_vision_foundations_spark.operators.outliers import (
        mad_outlier_summary,
    )

    events = load_table(spark, sf_dir, "events")
    return mad_outlier_summary(events)


def _ewma_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.smoothing import (
        ewma_oracle_sql,
    )

    return ewma_oracle_sql()


@_register("z68_ewma_level", _ewma_oracle_sql())
def z68_ewma_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA level after the last event
    (operators/smoothing.ewma_by_key) — the sequential recursion
    s_t = αx_t + (1−α)s_{t−1} run as its ONE-PASS closed form
    (window weights + keyed aggregate), no loop, no UDF.

    Scale shape: a single shuffle on the key shared by the window
    sort and the final aggregate."""
    from computer_vision_foundations_spark.operators.smoothing import (
        ewma_by_key,
    )

    events = load_table(spark, sf_dir, "events")
    return ewma_by_key(events)


def _walks_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.walks import (
        seeded_walks_oracle_sql,
    )

    return seeded_walks_oracle_sql()


@_register("z69_seeded_walks", _walks_oracle_sql())
def z69_seeded_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-seeded deterministic random walks over the observed
    event-type transition graph (operators/walks.seeded_walks) — the
    replayable sampling primitive behind DeepWalk/node2vec: the
    per-step choice is argmin md5(seed|step|src|dst), so a 100 TB walk
    job is exactly reproducible and differential-testable.

    Scale shape: one window pass builds the edge list; each step is a
    node-sized min_by choice table broadcast-joined to the frontier."""
    from computer_vision_foundations_spark.operators.walks import (
        seeded_walks,
        transition_edges,
    )

    events = load_table(spark, sf_dir, "events")
    return seeded_walks(transition_edges(events), steps=4, seed=7)


def _kappa_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.agreement import (
        kappa_algebra_sql,
    )

    labeled = f"""
    WITH scored AS (
      SELECT lang,
             {_lang_score_sql(STOPWORDS['de'])} AS score_de,
             {_lang_score_sql(STOPWORDS['en'])} AS score_en,
             {_lang_score_sql(STOPWORDS['es'])} AS score_es,
             {_lang_score_sql(STOPWORDS['fr'])} AS score_fr
      FROM documents),
    labeled AS (
      SELECT lang AS a,
             CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
                  WHEN score_fr = greatest(score_de, score_en, score_es, score_fr) THEN 'fr'
                  WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
                  WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
                  ELSE 'de' END AS b
      FROM scored)"""
    return labeled + kappa_algebra_sql("labeled")


@_register("z70_kappa_agreement", _kappa_oracle_sql())
def z70_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the labeled lang column and the stopword
    language-ID heuristic (operators/agreement.cohens_kappa over
    functions/text.language_score_columns) — chance-corrected
    agreement, the honest version of q62's confusion matrix.

    Scale shape: one shuffle of a two-column projection; marginals are
    |classes|-sized and broadcast."""
    from computer_vision_foundations_spark.operators.agreement import (
        cohens_kappa,
    )

    docs = load_table(spark, sf_dir, "documents")
    labeled = language_score_columns(docs, "text")
    return cohens_kappa(labeled, "lang", "lang_guess")


def _diversity_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.diversity import (
        diversity_oracle_sql,
    )

    return diversity_oracle_sql()


@_register("z71_source_diversity", _diversity_oracle_sql())
def z71_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity indices per source
    (operators/diversity.group_diversity): Shannon entropy, normalized
    entropy, Simpson index over each slice's unigram distribution —
    detects boilerplate-heavy sources before they get mixture weight.

    Scale shape: one token-stream shuffle into (grp, tok) counts, one
    |groups|-row aggregate."""
    from computer_vision_foundations_spark.operators.diversity import (
        group_diversity,
    )

    docs = load_table(spark, sf_dir, "documents")
    return group_diversity(docs)


def _spearman_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.rank_corr import (
        spearman_oracle_sql,
    )

    return spearman_oracle_sql()


@_register("z72_trend_spearman", _spearman_oracle_sql())
def z72_trend_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Spearman correlation between event time and
    value (operators/rank_corr.spearman_by_group) — the monotonic
    trend detector (Mann-Kendall's practical cousin): average ranks
    for ties, Pearson over the rank pairs.

    Scale shape: two rank windows + one correlation aggregate, all
    partitioned by the same key — one shuffle total, no UDF."""
    from computer_vision_foundations_spark.operators.rank_corr import (
        spearman_by_group,
    )

    events = load_table(spark, sf_dir, "events")
    return spearman_by_group(events, "ts", "value")


def _benford_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.benford import (
        benford_oracle_sql,
    )

    return benford_oracle_sql()


@_register("z73_benford_values", _benford_oracle_sql())
def z73_benford_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit histogram of event values vs Benford's
    law with per-digit chi-square contributions
    (operators/benford.benford_digits) — the forensic data-quality
    screen for fabricated/truncated numeric columns.

    Scale shape: one projection + one 9-row aggregate; the
    expectation grid is a broadcast 9-row sequence."""
    from computer_vision_foundations_spark.operators.benford import (
        benford_digits,
    )

    events = load_table(spark, sf_dir, "events")
    return benford_digits(events, "value")


def _autocorr_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.timeseries import (
        autocorr_oracle_sql,
    )

    return autocorr_oracle_sql()


@_register("z74_hourly_autocorr", _autocorr_oracle_sql())
def z74_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's hourly-count series
    (operators/timeseries.lag1_autocorr) — does the volume have
    momentum/seasonality, i.e. does the anomaly detector need a
    seasonal baseline?

    Scale shape: one shuffle into (key, hour) counts; the lag window
    reuses the same partitioning."""
    from computer_vision_foundations_spark.operators.timeseries import (
        lag1_autocorr,
    )

    events = load_table(spark, sf_dir, "events")
    return lag1_autocorr(events)


def _cusum_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.timeseries import (
        cusum_oracle_sql,
    )

    return cusum_oracle_sql()


@_register("z75_cusum_changepoint", _cusum_oracle_sql())
def z75_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline max-CUSUM changepoint per event type
    (operators/timeseries.cusum_changepoint): the hour maximizing
    |Σ(x−x̄)| over the hourly-count series plus the σ̂√n-normalized
    statistic — Page's test in its batch form, the drift family's
    "WHEN did it change" answer.

    Scale shape: one shuffle into (key, hour) counts; global-stat and
    prefix-sum windows share the key partitioning; sequential window
    sums are bit-identical across engines."""
    from computer_vision_foundations_spark.operators.timeseries import (
        cusum_changepoint,
    )

    events = load_table(spark, sf_dir, "events")
    return cusum_changepoint(events)


def _km_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.survival import (
        km_oracle_sql,
    )

    return km_oracle_sql()


@_register("z76_kaplan_meier", _km_oracle_sql())
def z76_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve over user activity spans
    (operators/survival.kaplan_meier): lifetimes = hours between a
    user's first and last event, censored when the last event is
    within 24 h of the corpus horizon — the censoring-correct version
    of the cohort retention grid.

    Scale shape: one keyed aggregate builds spans; the life table is
    |distinct durations| rows, so its windows are model-sized."""
    from computer_vision_foundations_spark.operators.survival import (
        activity_spans,
        kaplan_meier,
    )

    events = load_table(spark, sf_dir, "events")
    return kaplan_meier(activity_spans(events))


# Cluster-evaluation centroids: the seeded-gaussian stand-ins scaled
# to the embedding table's data range (σ ≈ 0.12) so the partition is
# non-degenerate. Deterministic → the oracle embeds the same literals.
_CE_DIM, _CE_K, _CE_SEED, _CE_SCALE = 64, 8, 42, 0.15


def _ce_centroids() -> list[list[float]]:
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    return [
        [_CE_SCALE * x for x in c]
        for c in random_centroids(_CE_DIM, _CE_K, _CE_SEED)
    ]


def _silhouette_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.cluster_eval import (
        silhouette_oracle_sql,
    )

    return silhouette_oracle_sql("embeddings", "embedding", _ce_centroids())


@_register("z77_silhouette", _silhouette_oracle_sql())
def z77_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per cluster (Hruschka 2004 centroid form;
    operators/cluster_eval.simplified_silhouette) — the one-pass
    validation loop for the clustering family: s=(b−a)/max(a,b) from
    own-centroid vs nearest-other-centroid distance, averaged per
    cluster. Centroids are plan literals (the IVF/PQ convention).

    Scale shape: one narrow codegen pass computes (cluster, a, b); one
    |k|-row aggregate. The corpus shuffles once as three columns."""
    from computer_vision_foundations_spark.operators.cluster_eval import (
        simplified_silhouette,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return simplified_silhouette(emb, _ce_centroids(), "embedding")


def _db_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.cluster_eval import (
        davies_bouldin_oracle_sql,
    )

    return davies_bouldin_oracle_sql(
        "embeddings", "embedding", _ce_centroids()
    )


@_register("z78_davies_bouldin", _db_oracle_sql())
def z78_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-quality report
    (operators/cluster_eval.davies_bouldin): per-cluster scatter S_i
    and R_i = max_j (S_i+S_j)/M_ij over the literal centroid-distance
    table; avg(r) is the DB index (lower = tighter/better separated).

    Scale shape: the same one-pass (cluster, a) aggregate as z77 plus
    a |k|² broadcast join of literals."""
    from computer_vision_foundations_spark.operators.cluster_eval import (
        davies_bouldin,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return davies_bouldin(emb, _ce_centroids(), "embedding")


_IF_TREES, _IF_DEPTH, _IF_SEED = 8, 6, 7


def _if_trees() -> list[dict]:
    from computer_vision_foundations_spark.operators.iforest import (
        random_cut_trees,
    )

    return random_cut_trees(
        _CE_DIM, n_trees=_IF_TREES, max_depth=_IF_DEPTH, seed=_IF_SEED
    )


def _iforest_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.iforest import (
        isolation_oracle_sql,
    )

    return isolation_oracle_sql(_if_trees())


@_register("z79_isolation_scores", _iforest_oracle_sql())
def z79_isolation_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolation-forest anomaly scores over the embedding table
    (operators/iforest.isolation_scores, Liu 2008 scoring): ensemble-
    mean random-cut leaf depth → 2^(−avg/c(256)). The registered
    member uses seeded DATA-INDEPENDENT box-refined cuts so the eight
    trees are plan literals and the oracle replays them as nested
    CASEs; the classic sample-trained construction (iforest_fit) is
    pytest-verified.

    Scale shape: one narrow projection per row — no shuffle, no UDF,
    no join; the model is codegen'd literal comparisons."""
    from computer_vision_foundations_spark.operators.iforest import (
        isolation_scores,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return isolation_scores(emb, _if_trees(), "embedding", "vec_id")


def _qnorm_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.qnorm import (
        qnorm_oracle_sql,
    )

    return qnorm_oracle_sql()


@_register("z80_quantile_norm", _qnorm_oracle_sql())
def z80_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document lengths
    (operators/qnorm.quantile_normalize, Bolstad 2003): each value is
    replaced by the GLOBAL distribution's value at its within-source
    rank fraction, making one quality threshold mean the same thing
    in every source before mixture weighting.

    Scale shape: one per-source rank window, one global sort window
    over the score projection, two integer equi-joins for the lerp —
    no UDF, no collect."""
    from computer_vision_foundations_spark.operators.qnorm import (
        quantile_normalize,
    )

    docs = load_table(spark, sf_dir, "documents")
    return quantile_normalize(docs, "n_chars", "source", "doc_id")


def _char_entropy_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.diversity import (
        char_entropy_oracle_sql,
    )

    return char_entropy_oracle_sql()


@_register("z81_char_entropy", _char_entropy_oracle_sql())
def z81_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy
    (operators/diversity.doc_char_entropy) — the byte-level junk
    detector (binary blobs, keyboard mash, constant padding) that
    complements the token-level quality battery (q66, z33).

    Scale shape: the character stream shuffles once into (id, char)
    counts; one per-doc aggregate."""
    from computer_vision_foundations_spark.operators.diversity import (
        doc_char_entropy,
    )

    docs = load_table(spark, sf_dir, "documents")
    return doc_char_entropy(docs)


def _mutual_knn_oracle_sql() -> str:
    return f"""
    WITH knn AS MATERIALIZED ({_ORACLES['z30_knn_join']})
    SELECT a.qid AS id_a, a.nid AS id_b, a.cos_sim
    FROM knn a JOIN knn b ON b.qid = a.nid AND b.nid = a.qid
    WHERE a.qid < a.nid
    ORDER BY 1, 2
    """


@_register("z82_mutual_knn", _mutual_knn_oracle_sql())
def z82_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-kNN pairs over the blocked self-kNN join
    (operators/similarity.mutual_knn_pairs): keep (a, b) only when
    EACH is in the other's top-3 — the de-hubbed high-precision edge
    set retrieval systems use for re-ranking and dedup
    canonicalization. The oracle nests z30's verified kNN twin and
    replays the reciprocity join.

    Scale shape: z30's blocked-join budget + one id-pair self-join;
    vectors never cross the reciprocity join."""
    from computer_vision_foundations_spark.operators.similarity import (
        mutual_knn_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return mutual_knn_pairs(emb, k=3, block_col="label")


@_register(
    "z83_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def z83_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): the classic
    3-table star join + grouped revenue + top-10, the OLAP pattern
    every relational engine is graded on. Deterministic tie-break by
    (o_orderdate, l_orderkey).

    Scale shape: customer/orders dimensions broadcast against the
    lineitem fact scan; ship/order-date filters push into parquet;
    one grouped aggregate + TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                ),
                2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), "o_orderdate", "l_orderkey"
        )
        .limit(10)
    )


@_register(
    "z84_returned_item_losses",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def z84_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): which customers
    drive return losses — dimension joins + a selective fact filter +
    grouped top-20.

    Scale shape: the l_returnflag filter pushes into the fact scan;
    customer/orders broadcast; one grouped aggregate +
    TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                ),
                2,
            ).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "z85_small_qty_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN (
        SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    ) t ON l_partkey = t.pk
    WHERE l_quantity < t.qty_cut
    """,
)
def z85_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the classic
    correlated-aggregate-decorrelated-to-a-join pattern — revenue of
    line items below 20 % of their part's average quantity.

    Scale shape: the correlated subquery runs ONCE as a per-part
    aggregate (|parts| rows) and joins back on the part key — the
    decorrelation Catalyst is trusted for elsewhere (q04 exists)
    spelled explicitly; the fact scans twice, never quadratically."""
    li = load_table(spark, sf_dir, "lineitem")
    cut = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(cut, li["l_partkey"] == cut["pk"])
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias(
                "avg_yearly"
            )
        )
    )


def _basket_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.basket import (
        basket_oracle_sql,
    )

    return basket_oracle_sql(
        "lineitem", "l_orderkey", "l_partkey", min_pair_count=2
    )


@_register("z86_market_basket", _basket_oracle_sql())
def z86_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order line items
    (operators/basket.basket_pair_rules): support, confidence, lift
    for part pairs co-purchased in ≥2 orders — pair formation only
    INSIDE a basket (the join is output-bound; mega-baskets capped).

    Scale shape: one basket-key self-join + three hash aggregates;
    item/basket totals broadcast back."""
    from computer_vision_foundations_spark.operators.basket import (
        basket_pair_rules,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return basket_pair_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=2
    )


def _chi2_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.feature_select import (
        chi2_oracle_sql,
    )

    return chi2_oracle_sql()


@_register("z87_chi2_tokens", _chi2_oracle_sql())
def z87_chi2_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square token-vs-language feature relevance
    (operators/feature_select.chi2_tokens): the top-50 tokens whose
    document-level presence/absence contingency against the class
    column carries label signal — the feature-selection gate in
    front of the z52/z47 classifier featurizers.

    Scale shape: one tokenize shuffle into (token, class) presence
    counts; everything after is |V|·|classes| model-sized grid
    algebra; top-k via TakeOrderedAndProject."""
    from computer_vision_foundations_spark.operators.feature_select import (
        chi2_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chi2_tokens(docs)


_INC_CUTOFF = "2024-01-15"


def _incremental_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.incremental import (
        incremental_oracle_sql,
    )

    return incremental_oracle_sql()


@_register("z88_incremental_agg", _incremental_oracle_sql())
def z88_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance
    (operators/incremental.merge_grouped): the per-event-type
    count/sum snapshot over events BEFORE the cutoff merged with the
    delta aggregate of events AFTER it. The oracle is deliberately
    the FULL RECOMPUTE over all rows — the strongest differential
    statement available: any drift between the incremental path and
    ground truth hash-fails.

    Scale shape: each side partial-aggregates map-side; the merge is
    one |groups|-sized full-outer join; history is scanned once."""
    from computer_vision_foundations_spark.operators.incremental import (
        grouped_snapshot,
        merge_grouped,
    )

    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp_ntz")
    snap = grouped_snapshot(
        events.where(F.col("ts") < cutoff), ["event_type"], "value"
    )
    delta = grouped_snapshot(
        events.where(F.col("ts") >= cutoff), ["event_type"], "value"
    )
    merged = merge_grouped(snap, delta, ["event_type"])
    return merged.select(
        "event_type",
        "n",
        F.round("total", 2).alias("total"),
    ).orderBy("event_type")


def _scd2_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.scd import (
        scd2_oracle_sql,
    )

    return scd2_oracle_sql()


@_register("z89_scd2_history", _scd2_oracle_sql())
def z89_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity-interval history of each user's event-type
    observations (operators/scd.scd2_history): consecutive unchanged
    observations collapse into one episode; ``valid_to`` closes at the
    next episode's start, NULL while current — the warehouse
    dimensional pattern next to the CDC reader (z31).

    Scale shape: one shuffle on the entity key shared by the
    change-flag (lag) and interval-close (lead) windows."""
    from computer_vision_foundations_spark.operators.scd import (
        scd2_history,
    )

    events = load_table(spark, sf_dir, "events")
    return scd2_history(events)


def _abtest_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.abtest import (
        abtest_oracle_sql,
    )

    return abtest_oracle_sql()


@_register("z90_ab_ztest", _abtest_oracle_sql())
def z90_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over deterministic hash-bucketed A/B
    groups (operators/abtest.ab_conversion_ztest): assignment =
    salted-md5 parity of the user id (coordination-free, replayable),
    conversion = any purchase event, pooled-variance z — the
    experimentation readout, assignment replayed in the oracle.

    Scale shape: one keyed aggregate (user → converted), one 2-row
    aggregate, scalar algebra."""
    from computer_vision_foundations_spark.operators.abtest import (
        ab_conversion_ztest,
    )

    events = load_table(spark, sf_dir, "events")
    return ab_conversion_ztest(events)


def _theil_sen_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.timeseries import (
        theil_sen_oracle_sql,
    )

    return theil_sen_oracle_sql()


@_register("z91_theil_sen_trend", _theil_sen_oracle_sql())
def z91_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope per event type
    (operators/timeseries.theil_sen_slope): the exact median of all
    pairwise hourly-count slopes — the magnitude companion to the
    z72 Spearman direction test, immune to single outlier buckets.

    Scale shape: pair formation is within-key over BUCKET-COUNT rows
    (granularity-bounded, executor-local quadratic), one exact-
    percentile aggregate."""
    from computer_vision_foundations_spark.operators.timeseries import (
        theil_sen_slope,
    )

    events = load_table(spark, sf_dir, "events")
    return theil_sen_slope(events)


def _seasonality_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.timeseries import (
        seasonality_oracle_sql,
    )

    return seasonality_oracle_sql()


@_register("z92_seasonality_strength", _seasonality_oracle_sql())
def z92_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality strength per event type
    (operators/timeseries.seasonality_strength): mean-per-slot
    profile, strength = max(0, 1 − var(residual)/var(series)) — the
    FPP decomposition-strength number that decides whether the z75
    changepoint detector needs a seasonal baseline first.

    Scale shape: two keyed aggregates after the hourly reduction."""
    from computer_vision_foundations_spark.operators.timeseries import (
        seasonality_strength,
    )

    events = load_table(spark, sf_dir, "events")
    return seasonality_strength(events)


def _abc_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.concentration import (
        abc_oracle_sql,
    )

    return abc_oracle_sql("lineitem", "l_partkey", "l_extendedprice")


@_register("z93_pareto_abc", _abc_oracle_sql())
def z93_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification of parts by revenue
    (operators/concentration.abc_classes): rank by value, cumulative
    share, A/B/C at 80 %/95 % with the inclusive first-crossing rule —
    the inventory classic, and the corpus question "which domains do
    80 % of my tokens come from".

    Scale shape: one per-unit reduction, scale-safe global ranking
    (range-partition + offsets), one |units|-row cumulative window."""
    from computer_vision_foundations_spark.operators.concentration import (
        abc_classes,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return abc_classes(li, "l_partkey", "l_extendedprice")


def _gini_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.concentration import (
        gini_oracle_sql,
    )

    return gini_oracle_sql("lineitem", "l_partkey", "l_extendedprice")


@_register("z94_gini_revenue", _gini_oracle_sql())
def z94_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini index of revenue concentration across parts
    (operators/concentration.gini_index, sorted form
    Σ(2i−n−1)xᵢ/(n·Σx)) — 0 = even, →1 = winner-takes-all; the
    scalar summary of z93's Lorenz curve.

    Scale shape: per-unit reduction + the scale-safe global ranking +
    one aggregate."""
    from computer_vision_foundations_spark.operators.concentration import (
        gini_index,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return gini_index(li, "l_partkey", "l_extendedprice")


def _richness_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.diversity import (
        richness_oracle_sql,
    )

    return richness_oracle_sql()


@_register("z95_lexical_richness", _richness_oracle_sql())
def z95_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax ratio + Yule's K per source
    (operators/diversity.lexical_richness) — the frequency-spectrum
    richness pair (length-robust, unlike raw type-token ratios) that
    separates natural text from template spam before mixture
    weighting.

    Scale shape: one token-stream shuffle, one spectrum aggregate."""
    from computer_vision_foundations_spark.operators.diversity import (
        lexical_richness,
    )

    docs = load_table(spark, sf_dir, "documents")
    return lexical_richness(docs)


_FS_FIELDS_SQL = [
    ("a.s_name = b.s_name", 0.95, 0.001),
    ("a.s_nationkey = b.s_nationkey", 0.9, 0.04),
    ("abs(a.s_acctbal - b.s_acctbal) <= 100", 0.8, 0.05),
]


def _linkage_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.linkage import (
        fs_weight_sql,
    )

    w = fs_weight_sql(_FS_FIELDS_SQL)
    return f"""
    WITH pairs AS MATERIALIZED ({_ORACLES['z10_fuzzy_name_pairs']}),
    scored AS (
        SELECT pairs.id_a, pairs.id_b, round({w}, 6) AS weight
        FROM pairs
        JOIN supplier a ON a.s_suppkey = pairs.id_a
        JOIN supplier b ON b.s_suppkey = pairs.id_b
    )
    SELECT id_a, id_b, weight,
           CASE WHEN weight >= 2.0 THEN 'match'
                WHEN weight >= 0.0 THEN 'review'
                ELSE 'reject' END AS decision
    FROM scored ORDER BY id_a, id_b
    """


@_register("z96_record_linkage", _linkage_oracle_sql())
def z96_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over the blocked
    fuzzy candidate pairs (operators/linkage.fs_link_scores composing
    z10's generator): per-field agreement bits weighted by literal
    log2(m/u) evidence, summed into match/review/reject — the Splink
    decision model. The oracle nests z10's verified quadratic twin and
    replays the weight algebra.

    Scale shape: candidates stay blocked (never quadratic); scoring
    is two id equi-joins + codegen algebra."""
    from computer_vision_foundations_spark.operators.linkage import (
        fs_link_scores,
    )

    sup = load_table(spark, sf_dir, "supplier")
    pairs = z10_fuzzy_name_pairs(spark, sf_dir).select("id_a", "id_b")
    fields = [
        (F.col("s_name_a") == F.col("s_name_b"), 0.95, 0.001, "name"),
        (
            F.col("s_nationkey_a") == F.col("s_nationkey_b"),
            0.9,
            0.04,
            "nation",
        ),
        (
            F.abs(F.col("s_acctbal_a") - F.col("s_acctbal_b"))
            <= F.lit(100),
            0.8,
            0.05,
            "acctbal",
        ),
    ]
    return fs_link_scores(pairs, sup, "s_suppkey", fields)


def _laplace_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.resample import (
        laplace_oracle_sql,
    )

    return laplace_oracle_sql()


@_register("z97_dp_noisy_counts", _laplace_oracle_sql())
def z97_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy grouped counts
    (operators/resample.laplace_noisy_counts): sensitivity-1 counts
    plus b=1/ε Laplace noise from a seeded hash uniform — the
    privacy-ACCOUNTING plumbing (a real deployment swaps the public
    seed for a secret noise source; documented in the module).

    Scale shape: one grouped count + one hash expression per group
    row."""
    from computer_vision_foundations_spark.operators.resample import (
        laplace_noisy_counts,
    )

    events = load_table(spark, sf_dir, "events")
    return laplace_noisy_counts(events, "event_type")


def _bootstrap_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.resample import (
        bootstrap_oracle_sql,
    )

    return bootstrap_oracle_sql(n_replicas=50)


@_register("z98_poisson_bootstrap", _bootstrap_oracle_sql())
def z98_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap confidence intervals for per-event-type
    mean value via the POISSON bootstrap (Chamandy 2012 — the
    distributed bootstrap: per-row Poisson(1) replica weights from a
    seeded hash, i.i.d., no global resample coordinate), 50 replicas.

    Scale shape: the replica explode is map-side narrow rows into one
    (key, replica) aggregate; the CI is an exact percentile over
    |replicas| means per key — no shuffle carries more than
    (key, b, double)."""
    from computer_vision_foundations_spark.operators.resample import (
        poisson_bootstrap_ci,
    )

    events = load_table(spark, sf_dir, "events")
    return poisson_bootstrap_ci(
        events, "value", "event_id", "event_type", n_replicas=50
    )


@_register(
    "z99_waiting_suppliers",
    """
    SELECT l1.l_suppkey AS suppkey, count(*) AS n_waiting
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY l1.l_suppkey
    ORDER BY n_waiting DESC, suppkey
    LIMIT 25
    """,
)
def z99_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS + NOT-EXISTS double correlated-subquery pattern — the
    hardest standard decorrelation an OLAP engine is graded on — here
    expressed as one left-semi and one left-anti join against
    per-order extremes, never a per-row subquery.

    Scale shape: the multi-supplier test is a per-order aggregate
    (count distinct suppliers) semi-joined back; the "last to ship"
    test compares against the per-order max OTHER-supplier shipdate —
    both are |orders|-sized aggregates, the fact scans a bounded
    number of times, no nested loops."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    l1 = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    # EXISTS other-supplier rows: orders with >= 2 distinct suppliers
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("_ns"))
        .where(F.col("_ns") >= 2)
        .select("l_orderkey")
    )
    l1 = l1.join(multi, "l_orderkey", "left_semi")
    # NOT EXISTS a later-shipping OTHER supplier == this row's
    # shipdate >= max shipdate among OTHER suppliers of the order.
    # "max excluding self" over per-supplier maxes: reduce to one row
    # per (order, supplier) first, then top-1 / runner-up per order —
    # the argmax-supplier trick breaks on raw rows when a supplier
    # ships an order on several dates.
    smax = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("_smax")
    )
    top1 = smax.groupBy("l_orderkey").agg(
        F.max(F.struct("_smax", "l_suppkey")).alias("_m1")
    ).select(
        "l_orderkey",
        F.col("_m1._smax").alias("_d1"),
        F.col("_m1.l_suppkey").alias("_s1"),
    )
    runner = (
        smax.join(top1, "l_orderkey")
        .where(F.col("l_suppkey") != F.col("_s1"))
        .groupBy("l_orderkey")
        .agg(F.max("_smax").alias("_d2"))
    )
    cand = l1.join(top1, "l_orderkey").join(
        runner, "l_orderkey", "left"
    )
    other_max = F.when(
        F.col("_s1") != F.col("l_suppkey"), F.col("_d1")
    ).otherwise(F.col("_d2"))
    kept = cand.where(
        other_max.isNull() | (other_max <= F.col("l_shipdate"))
    )
    return (
        kept.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("n_waiting"))
        .orderBy(F.col("n_waiting").desc(), "suppkey")
        .limit(25)
    )


def _attribution_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.attribution import (
        attribution_oracle_sql,
    )

    return attribution_oracle_sql()


@_register("za01_markov_attribution", _attribution_oracle_sql())
def za01_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect channel attribution (Anderl 2014;
    operators/attribution.markov_attribution): user journeys truncate
    at first purchase, a first-order chain with absorbing CONV/NULL
    is estimated, and each channel is credited by how much start→CONV
    reach drops when transitions into it retarget NULL — computed for
    ALL removal scenarios at once as a scenario dimension through 12
    fixed value-iteration rounds (the PageRank unroll convention).

    Scale shape: one corpus-scale window pass + transition aggregate;
    the scenario grid and every iteration round are |channels|²-sized
    broadcast joins."""
    from computer_vision_foundations_spark.operators.attribution import (
        markov_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    return markov_attribution(events)


# Synthetic user coordinates: ~20 city clusters derived from user_id
# with pure integer/decimal arithmetic (identical in both engines);
# |lat| <= 50 keeps the radius-join cell bound valid.
_GEO_EXPR = (
    "CAST(-50.0 + (user_id % 20) * 5.0 + (user_id % 83) / 100.0 "
    "AS DOUBLE) AS lat, "
    "CAST(-100.0 + (user_id % 20) * 9.0 + (user_id % 79) / 100.0 "
    "AS DOUBLE) AS lon"
)
_GEO_PTS_SPARK = (
    "SELECT user_id AS id, " + _GEO_EXPR
    + " FROM (SELECT DISTINCT user_id FROM {events})"
)
_GEO_PTS_SQL = (
    "SELECT user_id AS id, " + _GEO_EXPR
    + " FROM (SELECT DISTINCT user_id FROM events)"
)


def _geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("_geo_events")
    return spark.sql(_GEO_PTS_SPARK.format(events="_geo_events"))


def _geohash_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.geo import (
        geohash_sql,
    )

    gh = geohash_sql("lat", "lon", precision=6)
    return f"""
    WITH pts AS ({_GEO_PTS_SQL})
    SELECT id, round(lat, 6) AS lat, round(lon, 6) AS lon,
           {gh} AS gh
    FROM pts ORDER BY id
    """


@_register("za02_geohash_cells", _geohash_oracle_sql())
def za02_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding of per-user coordinates
    (operators/geo.geohash): the closed-form Morton-interleaved
    base32 cell key (no loop, no UDF) — sortable, prefix-joinable,
    truncation-coarsenable. The oracle replays the identical integer
    algebra bit for bit.

    Scale shape: one codegen projection."""
    from computer_vision_foundations_spark.operators.geo import geohash

    pts = _geo_points(spark, sf_dir)
    return pts.select(
        "id",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
        geohash(F.col("lat"), F.col("lon"), precision=6).alias("gh"),
    ).orderBy("id")


def _radius_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.geo import (
        radius_oracle_sql,
    )

    return radius_oracle_sql(_GEO_PTS_SQL, radius_km=60.0)


@_register("za03_geo_radius_pairs", _radius_oracle_sql())
def za03_geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users within 60 km of each other
    (operators/geo.radius_pairs): the DBSCAN grid discipline on the
    globe — latitude/longitude cells sized for the radius at the
    data's worst latitude, 3×3 adjacent-cell equi-join, exact
    haversine verify. The oracle runs the QUADRATIC haversine join,
    so a hash match proves the blocking loses no pair.

    Scale shape: (cell, id, coords) rows with 9× one-side
    replication; no cross-cell candidates."""
    from computer_vision_foundations_spark.operators.geo import (
        radius_pairs,
    )

    pts = _geo_points(spark, sf_dir)
    return radius_pairs(
        pts, "id", "lat", "lon", radius_km=60.0, max_abs_lat=55.0
    ).orderBy("id_a", "id_b")


_KDE_GRID = [float(g) for g in range(0, 201, 20)]
_KDE_H = 15.0


def _kde_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.density import (
        kde_oracle_sql,
    )

    return kde_oracle_sql(
        "events", "value", "event_type", _KDE_GRID, _KDE_H
    )


@_register("za04_kde_density", _kde_oracle_sql())
def za04_kde_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian kernel density estimate of event values per type at a
    literal grid (operators/density.kde_at_grid) — the bin-artifact-
    free distribution curve, distributed as |grid| unrolled aggregate
    sums with map-side combine (the k-means/bootstrap unroll
    pattern). Fixed bandwidth keeps the estimate a pure literal
    function (Silverman's rule would need a per-key σ pre-pass).

    Scale shape: one shuffle of (key, value); everything else is
    codegen."""
    from computer_vision_foundations_spark.operators.density import (
        kde_at_grid,
    )

    events = load_table(spark, sf_dir, "events")
    return kde_at_grid(events, "value", "event_type", _KDE_GRID, _KDE_H)


def _wilson_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.stats_tests import (
        wilson_oracle_sql,
    )

    return wilson_oracle_sql()


@_register("za05_wilson_intervals", _wilson_oracle_sql())
def za05_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate per entry channel with Wilson score intervals
    (operators/stats_tests.wilson_intervals) — the binomial CI that
    stays honest at small n and extreme rates, the bar every
    funnel/conversion dashboard should draw instead of the Wald
    interval.

    Scale shape: one user-key window pass for (entry channel,
    converted), one keyed aggregate, scalar algebra."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        wilson_intervals,
    )

    events = load_table(spark, sf_dir, "events")
    return wilson_intervals(events)


def _ols_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.stats_tests import (
        ols_oracle_sql,
    )

    return ols_oracle_sql()


@_register("za06_ols_trend", _ols_oracle_sql())
def za06_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of value on time
    (operators/stats_tests.ols_by_key): closed-form slope/intercept/R²
    from population moments — the classical estimator beside the
    robust Theil-Sen (z91) and the rank Spearman (z72); slope per
    hour for comparability.

    Scale shape: one keyed moments aggregate; everything else is
    scalar algebra in codegen."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        ols_by_key,
    )

    events = load_table(spark, sf_dir, "events")
    return ols_by_key(events)


def _ks_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.stats_tests import (
        ks_oracle_sql,
    )

    return ks_oracle_sql("events", "value", "event_type", "click", "error")


@_register("za07_ks_two_sample", _ks_oracle_sql())
def za07_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    error value distributions (operators/stats_tests.ks_two_sample) —
    the distribution-free drift test behind data-quality monitors:
    max pooled-ECDF gap, ties collapsed per distinct value.

    Scale shape: the two-column stream shuffles once into per-value
    counts; two same-ordered cumulative windows over the distinct
    values; one max aggregate."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        ks_two_sample,
    )

    events = load_table(spark, sf_dir, "events")
    return ks_two_sample(events, "value", "event_type", "click", "error")


_BFS_SEEDS = [1, 2, 3]
_BFS_HOPS = 4


def _bfs_oracle() -> str:
    from computer_vision_foundations_spark.operators.bfs import (
        bfs_oracle_sql,
    )

    return bfs_oracle_sql(_PR_EDGES_SQL, _BFS_SEEDS, _BFS_HOPS)


@_register("q43_bfs_distances", _bfs_oracle())
def q43_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source 4-hop BFS distances (operators/bfs.bfs_distances)
    over the q07 supplier↔customer trade graph from literal seed
    suppliers {1,2,3} — the TrustRank-style "hops from a trusted
    seed" quality prior. Level-synchronous frontier expansion with a
    visited-set anti-join so no node re-expands; the oracle replays
    the equivalent min-over-unrolled-levels formulation, so a hash
    match proves the pruning drops nothing.

    Scale shape: per level one (node)-keyed equi-join shuffle + one
    distinct + one anti-join; frontiers are localCheckpoint'd, never
    collected."""
    from computer_vision_foundations_spark.operators.bfs import (
        bfs_distances,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count("*").alias("n_items"))
    )
    fwd = pairs.select(
        F.col("l_suppkey").alias("src"), (-F.col("o_custkey")).alias("dst")
    )
    back = pairs.filter(F.col("n_items") >= 2).select(
        (-F.col("o_custkey")).alias("src"), F.col("l_suppkey").alias("dst")
    )
    return bfs_distances(
        fwd.unionByName(back), _BFS_SEEDS, n_hops=_BFS_HOPS
    )


def _textrank_oracle() -> str:
    from computer_vision_foundations_spark.operators.textrank import (
        textrank_oracle_sql,
    )

    return textrank_oracle_sql()


@_register("za09_textrank_keywords", _textrank_oracle())
def za09_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (operators/textrank.py): weighted
    PageRank over the word-adjacency graph (Mihalcea & Tarau 2004) —
    the unsupervised topical-keyword signal for corpus curation.
    Top-20 words, rank rounded 6, word-ascending tiebreak; the oracle
    unrolls the identical recurrence as r0..r5 CTEs.

    Scale shape: one zip_with adjacency explode + one hash aggregate
    builds the graph (checkpointed once); each round is one
    (word)-keyed equi-join + hash aggregate carrying (word, double)
    only."""
    from computer_vision_foundations_spark.operators.textrank import (
        textrank_keywords,
    )

    docs = load_table(spark, sf_dir, "documents")
    return textrank_keywords(docs)


def _ppjoin_oracle() -> str:
    from computer_vision_foundations_spark.operators.ppjoin import (
        prefix_jaccard_oracle_sql,
    )

    return prefix_jaccard_oracle_sql(_SHINGLES_SQL, threshold=0.5)


@_register("q44_prefix_jaccard_pairs", _ppjoin_oracle())
def q44_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard≥0.5 near-dup pairs via PPJoin prefix filtering
    (operators/ppjoin.py): rarest-first prefixes + length filter prune
    candidates WITHOUT the q90 frequency-cap approximation — hot
    stop-shingles leave every prefix by construction. The oracle runs
    the reference QUADRATIC all-shingle join (no cap, no prefix), so
    a hash match proves the pruning lossless.

    Scale shape: one freq aggregate + one shingle-keyed annotate join
    + per-DOC window (never global) + prefix self-equi-join; exact
    verify joins carry only candidate ids + shingle arrays."""
    from computer_vision_foundations_spark.operators.ppjoin import (
        prefix_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.5,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


@_register(
    "q45_salted_skew_join",
    """
    WITH dim AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS type_n,
             CAST(avg(value) AS DOUBLE) AS type_avg
      FROM events GROUP BY event_type)
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value / d.type_n), 6) AS ipw_activity,
           round(sum(e.value - d.type_avg), 4) AS excess_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.user_id
    """,
)
def q45_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inverse-propensity activity via a SALTED shuffle join
    (operators/skewjoin.salted_join): events join their event-type
    stats dim on (event_type, salt) with the dim replicated 8×, so a
    hot event type spreads over 8 reducers instead of stalling one.
    The oracle is the PLAIN join — a hash match certifies salting
    changes nothing but the shuffle layout.

    Scale shape: fact shuffle keys are (type, salt); dim replication
    is explode(sequence) — 8 rows per dim row, no driver loop; final
    user aggregate is an independent shuffle."""
    from computer_vision_foundations_spark.operators.skewjoin import (
        salted_join,
    )

    events = load_table(spark, sf_dir, "events")
    dim = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_n"),
        F.avg("value").alias("type_avg"),
    )
    joined = salted_join(
        events, dim, "event_type", salt_from="event_id", n_salts=8
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value") / F.col("type_n")), 6
        ).alias("ipw_activity"),
        F.round(
            F.sum(F.col("value") - F.col("type_avg")), 4
        ).alias("excess_value"),
    )


def _maxsim_oracle() -> str:
    from computer_vision_foundations_spark.operators.late_interaction import (
        maxsim_oracle_sql,
    )

    return maxsim_oracle_sql()


@_register("q46_maxsim_topk", _maxsim_oracle())
def q46_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval
    (operators/late_interaction.maxsim_topk): each 64-float embedding
    is read as 8 pseudo-token vectors × 8 dims (flat array + shape,
    SURVEY §1.2) and scored MaxSim = Σ_i max_j cos(q_i, d_j) against
    3 probe docs; top-10 per probe. The 8×8 cosine grid is a static
    JVM expression over array slices — no explode, no Python.

    Scale shape: map-side corpus scan ⋈ broadcast probes; the only
    shuffle is the per-probe top-k window."""
    from computer_vision_foundations_spark.operators.late_interaction import (
        maxsim_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    return maxsim_topk(emb, probes, n_tokens=8, dim=8, k=10)


def _seqmine_oracle() -> str:
    from computer_vision_foundations_spark.operators.seqmine import (
        consecutive_patterns_oracle_sql,
    )

    return consecutive_patterns_oracle_sql()


@_register("za13_sequential_patterns", _seqmine_oracle())
def za13_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive event-type 2- and 3-gram patterns per user timeline
    (operators/seqmine.consecutive_patterns) with occurrence counts
    and distinct-user support — the ORDERED counterpart of the z86
    basket rules (PrefixSpan level-1/2 shapes).

    Scale shape: one per-user lead window + one pattern aggregate —
    two shuffles regardless of pattern length; no time self-joins,
    no explode."""
    from computer_vision_foundations_spark.operators.seqmine import (
        consecutive_patterns,
    )

    events = load_table(spark, sf_dir, "events")
    return consecutive_patterns(events)


def _coverage_oracle() -> str:
    from computer_vision_foundations_spark.operators.intervals import (
        interval_coverage_oracle_sql,
    )

    return interval_coverage_oracle_sql(
        "SELECT user_id AS k, epoch_us(ts) AS st,"
        " epoch_us(ts) + 300 * 1000000 AS en, event_id AS tb FROM events"
    )


@_register("za14_active_coverage", _coverage_oracle())
def za14_active_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user active wall-clock via interval merge
    (operators/intervals.interval_coverage): each event opens a 5-min
    activity interval; overlaps are merged into islands (running-max
    gaps-and-islands) so coverage never double-counts. Exact BIGINT
    microsecond arithmetic — no float drift.

    Scale shape: one per-user sort shared by both window passes, one
    island aggregate, one key aggregate; no time-range self-join."""
    from computer_vision_foundations_spark.operators.intervals import (
        interval_coverage,
    )

    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("st"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.lit(300 * 1_000_000)
        ).alias("en"),
        "event_id",
    )
    return interval_coverage(iv, "user_id", "st", "en", "event_id")


def _rfm_oracle() -> str:
    from computer_vision_foundations_spark.operators.rfm import (
        rfm_oracle_sql,
    )

    return rfm_oracle_sql()


@_register("za15_rfm_segments", _rfm_oracle())
def za15_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/rfm.rfm_segments):
    quintile scores for recency/frequency/monetary via the scale-safe
    global row numbering of qnorm (range partition + broadcast
    offsets — never a single-task global window), exact integer
    quintile formula, segment rollup.

    Scale shape: one orders→customer aggregate; three range
    partitionings of the small customer table; one (r,f,m) hash
    aggregate."""
    from computer_vision_foundations_spark.operators.rfm import (
        rfm_segments,
    )

    orders = load_table(spark, sf_dir, "orders")
    return rfm_segments(orders)


_LOGREG_SRC_SQL = """
    SELECT l_quantity / 50.0 AS qty_s,
           l_discount * 10.0 AS disc_s,
           l_extendedprice / 100000.0 AS price_s,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
    FROM lineitem
"""


def _logreg_oracle() -> str:
    from computer_vision_foundations_spark.operators.logreg import (
        logistic_gd_oracle_sql,
    )

    return logistic_gd_oracle_sql(
        _LOGREG_SRC_SQL,
        ["qty_s", "disc_s", "price_s"],
        "y",
        lr=0.5,
        n_iter=5,
        feature_names=["qty_s", "disc_s", "price_s"],
    )


@_register("q48_logistic_gd", _logreg_oracle())
def q48_logistic_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression (operators/logreg.logistic_gd):
    5 exact full-batch GD steps predicting l_returnflag='R' from
    scaled quantity/discount/price. Per step, executors compute the
    batch gradient as one map-side-combined aggregate; only the 4
    weights visit the driver (the allreduce shape of
    ml/distributed.py). The oracle replays the ENTIRE training run as
    unrolled w0..w5 SQL CTEs — gradient, fold, and log-loss certified
    cross-engine.

    Scale shape: n_iter scans with partial aggregation; no shuffle of
    data rows at all (aggregate-only); model state is 4 doubles."""
    from computer_vision_foundations_spark.operators.logreg import (
        logistic_gd,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / 50.0).alias("qty_s"),
        (F.col("l_discount") * 10.0).alias("disc_s"),
        (F.col("l_extendedprice") / 100000.0).alias("price_s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    return logistic_gd(
        li, ["qty_s", "disc_s", "price_s"], "y", lr=0.5, n_iter=5
    )


def _holt_oracle() -> str:
    from computer_vision_foundations_spark.operators.holt import (
        holt_oracle_sql,
    )

    return holt_oracle_sql(
        "SELECT event_type AS key, date_trunc('hour', ts) AS ord,"
        " avg(value) AS y FROM events GROUP BY 1, 2"
    )


@_register("za17_holt_trend", _holt_oracle())
def za17_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing (operators/holt.holt_linear) over
    each event type's hourly mean-value series — level + slope + one-
    step forecast. The coupled recurrence is genuinely sequential
    (no finite windowable closed form), so this is the documented
    Arrow case: applyInPandas per key over pre-aggregated buckets;
    the oracle walks the identical recurrence with a RECURSIVE CTE.

    Scale shape: one (key, hour) pre-aggregate shrinks events to one
    row per bucket BEFORE the Python stage; keys distribute across
    executors; per-key state is two doubles."""
    from computer_vision_foundations_spark.operators.holt import (
        holt_linear,
    )

    events = load_table(spark, sf_dir, "events")
    series = events.groupBy(
        F.col("event_type").alias("key"),
        F.date_trunc("hour", "ts").alias("ord"),
    ).agg(F.avg("value").alias("y"))
    out = holt_linear(series, "key", "ord", "y")
    return out.select(
        "key",
        "n_points",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("forecast", 6).alias("forecast"),
    )


_SKYLINE_SRC_SQL = """
    SELECT o_custkey AS key,
           datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
             AS ord,
           o_totalprice AS val,
           o_orderkey AS order_key
    FROM orders
"""


def _skyline_oracle() -> str:
    from computer_vision_foundations_spark.operators.skyline import (
        skyline_oracle_sql,
    )

    return skyline_oracle_sql(
        _SKYLINE_SRC_SQL,
        "key, ord, round(val, 2) AS val, order_key",
    )


@_register("za18_skyline", _skyline_oracle())
def za18_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 2-D skyline (operators/skyline.skyline_2d): the
    orders on each customer's Pareto frontier of (earliest date,
    highest price) — no other order of the same customer is both
    at-least-as-early and at-least-as-expensive with one strict. The
    window rewrite (RANGE frame to 1 PRECEDING + same-ord MAX) is
    hash-verified against the oracle's quadratic NOT-EXISTS truth.

    Scale shape: one (key)-partitioned sort feeds both window passes
    (Catalyst collapses them into one shuffle); no self-join — the
    naive formulation is O(k²) per key and exists only oracle-side."""
    from computer_vision_foundations_spark.operators.skyline import (
        skyline_2d,
    )

    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.col("o_custkey").alias("key"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1992-01-01").cast("date"),
        ).alias("ord"),
        F.col("o_totalprice").alias("val"),
        F.col("o_orderkey").alias("order_key"),
    )
    out = skyline_2d(src, "key", "ord", "val")
    return out.select(
        "key", "ord", F.round("val", 2).alias("val"), "order_key"
    )


# ---------------------------------------------------------------------------
# Registry finalization
# ---------------------------------------------------------------------------
# The driver's correctness gate records at most the first 50 registry
# entries, so slot order is part of the contract. Round 3 renumbered the
# registry (see README "Registry numbering") to pull every operator
# family that had only local verification (PQ, IVF-PQ, mixture,
# decontamination, vocab/PMI, chunk/pack/redact, SimHash pairing, fuzzy,
# z-order, UDTF, percentile/JSON/HOF relational) into q01–q50, demoting
# long-driver-green simple relational entries and the three rows-only
# sampling/image entries to q51+. Sorting here makes dict insertion
# order == numeric order, so the "first 50" are the same set whether the
# driver iterates insertion order or sorts keys.
# dict.update of existing keys keeps old positions — rebuild instead
_sorted_q = dict(sorted(_QUERIES.items()))
_QUERIES.clear()
_QUERIES.update(_sorted_q)
_sorted_o = dict(sorted(_ORACLES.items()))
_ORACLES.clear()
_ORACLES.update(_sorted_o)
