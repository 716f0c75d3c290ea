"""Registry slice — see computer_vision_foundations_spark/queries/__init__.py."""
from __future__ import annotations

from computer_vision_foundations_spark.queries.common import (  # noqa: F401
    DataFrame,
    F,
    STOPWORDS,
    SparkSession,
    Window,
    _ORACLES,
    _register,
    brute_force_knn,
    deterministic_split,
    exact_duplicates,
    language_score_columns,
    load_table,
    minhash_lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_columns,
    score_with,
    sessionized,
    simhash_from_hashes,
    train_test_split,
    tumbling_counts,
    with_parsed_filename,
)



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
    "za23_lsh_candidate_pairs",
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
def za23_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "za24_knn_cosine",
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
def za24_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    56-bit hash; operators/dedup.simhash_grouped does the bit votes
    as one codegen aggregate) — the same construction as the MinHash
    oracle path, so the
    32-bit fingerprints are value-hash-checked bit-for-bit against
    DuckDB. The xxhash64 variant (simhash_column) remains the
    engine-internal scale default and is pytest-covered."""
    from computer_vision_foundations_spark.operators.parallelism import (
        widen_if_under_parallel,
    )

    from computer_vision_foundations_spark.operators.dedup import (
        simhash_grouped,
    )

    # fingerprinting is CPU-bound (|tokens| md5s + 32 bit votes/doc):
    # widen a single-split scan so it uses every core (no-op at scale)
    docs = widen_if_under_parallel(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    # round-12: explode the distinct tokens and run the bit votes as
    # ONE codegen hash aggregate (simhash_grouped) instead of 32
    # interpreted filter passes over a per-row array — identical
    # integer votes, one md5 per token instead of two, map-side
    # partial aggregation; split() always yields >= 1 element so no
    # doc drops out of the explode
    ex = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("_t"),
    )
    dig = F.md5(F.col("_t").cast("binary"))
    hashed = ex.select(
        "doc_id",
        (
            F.conv(F.substring(dig, 1, 7), 16, 10).cast("long")
            * F.lit(268435456).cast("long")
            + F.conv(F.substring(dig, 8, 7), 16, 10).cast("long")
        ).alias("_h"),
    )
    return simhash_grouped(hashed, "doc_id", "_h", bits=32)


@_register(
    "za60_image_statistics",
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
def za60_image_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    from computer_vision_foundations_spark.operators.parallelism import (
        widen_if_under_parallel,
    )

    # two pure-Python codecs per row: widen a single-split scan first
    # (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(
        load_table(spark, sf_dir, "documents")
    ).filter(F.length("text") >= 9)
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


@_register(
    "q68_bernoulli_sample",
    """
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':7'), 1, 13))
               AS BIGINT) < 0.1 * 4503599627370496.0
    """,
)
def q68_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SA2: seeded Bernoulli sample (reference `04a_Model
    Deployment.py:313`). Membership is a pure function of
    (o_orderkey, seed) — keep iff the 52-bit md5 slice falls under
    fraction·2^52 (`operators/split.py` bernoulli_sample id_col path),
    so the row SET is identical under any partitioning or engine —
    the r5 determinism sweep flagged the previous `df.sample` wrapper
    as partition-dependent (1497 vs 1451 rows). Full SQL oracle
    (upgraded from rows-only); fraction bounds pytest-verified in
    tests/test_transform_sinks.py."""
    from computer_vision_foundations_spark.operators.split import bernoulli_sample

    orders = load_table(spark, sf_dir, "orders")
    return bernoulli_sample(orders, 0.1, seed=7, id_col="o_orderkey").select(
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
    pairs_sql = _ORACLES["za23_lsh_candidate_pairs"]
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
    za23's LSH candidate pairs closed under connectivity by iterative
    min-label propagation + pointer jumping, canonical copy = the
    cluster's smallest doc_id. The oracle computes the same closure
    with a recursive CTE over the identical pair set — checking both
    the pair generation AND the clustering."""
    from computer_vision_foundations_spark.operators.components import (
        dedup_clusters,
    )

    pairs = za23_lsh_candidate_pairs(spark, sf_dir)
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
    — the general form of q53's rollup / q54's cube, one Expand +
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
    quality gate (q66/z17) → surprisal gate over the surviving corpus
    (za30, 6-digit-rounded threshold) → domain cap 1M = identity at
    every tested SF (row_number ≤ cap is vacuous; documented, not
    modeled) → exact dedup keep-min (q83) → MinHash-LSH pairs with the
    portable md5 family (za23) → connected components via recursive CTE
    (q94) → exact decontamination (za27; the engine's bloom pre-screen
    has no false negatives so it is result-invariant) → redaction
    (q33) → chunking (z07) → shard/pack (z09)."""

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
