"""Per-file stats (minValues/maxValues/nullCount) and stats-based
data skipping: writer records sound bounds, reader prunes files a
predicate cannot match, and `read_delta(where=)` always equals
`read_delta().filter(where)` — the soundness contract."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw
from computer_vision_foundations_spark.sources import skipping


def _root():
    return tempfile.mkdtemp(prefix="delta_skip_")


def _ranged(spark, n=1000, files=4):
    """n rows split into `files` files with disjoint k-ranges."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.5).alias("x"),
            F.concat(F.lit("name_"), F.format_string("%04d", F.col("id"))).alias("s"),
            F.date_add(F.lit("2020-01-01").cast("date"), F.col("id").cast("int") % 365).alias("d"),
            F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 7).alias("nullable"),
        )
        .repartitionByRange(files, "k")
        .sortWithinPartitions("k")
    )


def _first_commit_adds(root):
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as fh:
        return [
            json.loads(line)["add"]
            for line in fh
            if line.strip() and "add" in json.loads(line)
        ]


def test_writer_records_bounds(spark):
    root = _root()
    dw.delta_create(spark, root, _ranged(spark))
    adds = _first_commit_adds(root)
    assert len(adds) == 4
    tot = 0
    glo_lo, glo_hi = 10**9, -1
    for a in adds:
        st = json.loads(a["stats"])
        tot += st["numRecords"]
        assert st["minValues"]["k"] <= st["maxValues"]["k"]
        assert st["minValues"]["s"].startswith("name_")
        assert st["minValues"]["d"] >= "2020-01-01"
        assert st["nullCount"]["k"] == 0
        assert st["nullCount"]["nullable"] > 0
        glo_lo = min(glo_lo, st["minValues"]["k"])
        glo_hi = max(glo_hi, st["maxValues"]["k"])
    assert tot == 1000 and glo_lo == 0 and glo_hi == 999
    # ranges are disjoint-ish (repartitionByRange) => skipping can work
    snap = dr.delta_snapshot(root, spark)
    kept = skipping.matching_files(snap, "k >= 900")
    assert 0 < len(kept) < 4


def test_nan_and_long_string_bounds_omitted(spark):
    root = _root()
    dw.delta_create(
        spark,
        root,
        spark.createDataFrame(
            [(1, 1.5, "a" * 40), (2, float("nan"), "b" * 40)],
            "k long, x double, s string",
        ).coalesce(1),
    )
    st = json.loads(_first_commit_adds(root)[0]["stats"])
    assert "x" not in st.get("maxValues", {})  # NaN max dropped
    assert "s" not in st.get("minValues", {})  # >32 chars dropped
    assert "s" not in st.get("maxValues", {})
    assert st["minValues"]["k"] == 1
    # NaN file must survive any range predicate on x (sound)
    snap = dr.delta_snapshot(root, spark)
    assert len(skipping.matching_files(snap, "x > 1e9")) == 1


PREDICATES = [
    "k >= 900",
    "k < 10",
    "k = 250",
    "250 > k",
    "k != 0",
    "k BETWEEN 100 AND 120",
    "k NOT BETWEEN 5 AND 995",
    "k IN (3, 500, 997)",
    "k NOT IN (3, 500, 997)",
    "NOT (k < 900)",
    "k < 10 OR k >= 990",
    "k < 10 AND x > 1.0",
    "x <= 25.0",
    "s = 'name_0042'",
    "s >= 'name_0990'",
    "d = DATE '2020-01-05'",
    "d < '2020-02-01'",
    "nullable IS NULL",
    "nullable IS NOT NULL",
    "nullable = 3",
    "k = 50 AND s = 'name_0050'",
    "NOT (k IN (1, 2) OR k > 500)",
]


@pytest.mark.parametrize("where", PREDICATES)
def test_where_matches_residual_filter(spark, where, _skip_table):
    root = _root.cached  # set by fixture below
    got = sorted(
        dr.read_delta(spark, root, where=where).select("k").toPandas()["k"]
    )
    want = sorted(
        dr.read_delta(spark, root)
        .filter(F.expr(where))
        .select("k")
        .toPandas()["k"]
    )
    assert got == want


@pytest.fixture(scope="module")
def _skip_table(spark):
    root = _root()
    dw.delta_create(spark, root, _ranged(spark))
    _root.cached = root
    return root


def test_skipping_actually_prunes(spark, _skip_table):
    snap = dr.delta_snapshot(_skip_table, spark)
    assert len(snap.files) == 4
    assert len(skipping.matching_files(snap, "k = 250")) == 1
    assert len(skipping.matching_files(snap, "k < 0")) == 0
    assert len(skipping.matching_files(snap, "k >= 0")) == 4
    # unsupported shapes keep everything (sound fallback)
    assert len(skipping.matching_files(snap, "length(s) > 2")) == 4
    assert len(skipping.matching_files(snap, "k + 1 = 5")) == 4


def test_null_semantics(spark, _skip_table):
    snap = dr.delta_snapshot(_skip_table, spark)
    # comparison with NULL literal matches nothing
    assert len(skipping.matching_files(snap, "k = NULL")) == 0
    # NOT IN with a NULL literal is never TRUE
    assert len(skipping.matching_files(snap, "k NOT IN (1, NULL)")) == 0
    # k is never null -> IS NULL skips all files
    assert len(skipping.matching_files(snap, "k IS NULL")) == 0
    assert len(skipping.matching_files(snap, "nullable IS NULL")) == 4


def test_partition_pruning_via_stats_layer(spark):
    root = _root()
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("p")
    )
    dw.delta_create(spark, root, df, partition_by=["p"])
    snap = dr.delta_snapshot(root, spark)
    kept = skipping.matching_files(snap, "p = '2'")
    assert kept and all(r.startswith("p=2/") for r in kept)
    got = dr.read_delta(spark, root, where="p = '2' AND k < 50").count()
    assert got == df.filter("p = '2' AND k < 50").count()


def test_stats_survive_checkpoint(spark):
    root = _root()
    dw.delta_create(spark, root, _ranged(spark, 400, 2), checkpoint_every=3)
    for i in range(4):
        dw.delta_append(
            spark,
            root,
            spark.range(1000 + i * 10, 1005 + i * 10).select(
                F.col("id").alias("k"),
                (F.col("id") * 2.5).alias("x"),
                F.lit("zzz").alias("s"),
                F.lit("2021-06-01").cast("date").alias("d"),
                F.lit(1).cast("long").alias("nullable"),
            ),
            checkpoint_every=3,
        )
    snap = dr.delta_snapshot(root, spark)
    assert snap.checkpoint_version is not None
    # every live file still carries stats after checkpoint replay
    assert all((snap.stats or {}).get(rel) for rel in snap.files)
    kept = skipping.matching_files(snap, "k >= 1030")
    assert 0 < len(kept) < len(snap.files)
    got = dr.read_delta(spark, root, where="k >= 1030").count()
    assert got == 5


def test_dv_delete_keeps_sound_skipping(spark):
    root = _root()
    dw.delta_create(spark, root, _ranged(spark, 500, 2))
    dw.delta_delete_where(spark, root, F.col("k") % 5 == 0, use_dvs=True)
    snap = dr.delta_snapshot(root, spark)
    # re-added DV files keep their stats
    assert all((snap.stats or {}).get(rel) for rel in snap.files)
    got = sorted(
        r["k"]
        for r in dr.read_delta(spark, root, where="k < 20").collect()
    )
    assert got == [k for k in range(20) if k % 5 != 0]


def test_restore_carries_stats(spark):
    root = _root()
    dw.delta_create(spark, root, _ranged(spark, 300, 2))
    v0 = dr.delta_snapshot(root, spark).version
    dw.delta_overwrite(
        spark,
        root,
        spark.range(5).select(
            F.col("id").alias("k"),
            F.lit(0.0).alias("x"),
            F.lit("a").alias("s"),
            F.lit("2020-01-01").cast("date").alias("d"),
            F.lit(None).cast("long").alias("nullable"),
        ),
    )
    dw.delta_restore(spark, root, v0)
    snap = dr.delta_snapshot(root, spark)
    assert all((snap.stats or {}).get(rel) for rel in snap.files)
    assert dr.read_delta(spark, root, where="k >= 290").count() == 10


# ---------------------------------------------------------------------------
# OPTIMIZE ZORDER BY
# ---------------------------------------------------------------------------


def _two_dim(spark, n=100_000):
    """Two independent uniform columns; linear layout clusters only a."""
    return (
        spark.range(n)
        .select(
            (F.col("id") % 447).alias("a"),
            ((F.col("id") * 7919) % 631).alias("b"),
            F.col("id").alias("payload"),
        )
        .repartitionByRange(8, "a")
    )


def test_zorder_enables_multicolumn_skipping(spark):
    root = _root()
    df = _two_dim(spark)
    dw.delta_create(spark, root, df)
    snap0 = dr.delta_snapshot(root, spark)
    # linear layout: b-predicates skip nothing
    assert len(skipping.matching_files(snap0, "b BETWEEN 100 AND 110")) == len(
        snap0.files
    )
    dw.delta_optimize(
        spark, root, target_file_bytes=120_000, zorder_by=["a", "b"]
    )
    snap1 = dr.delta_snapshot(root, spark)
    n_files = len(snap1.files)
    assert n_files >= 4
    kept_a = len(skipping.matching_files(snap1, "a BETWEEN 100 AND 110"))
    kept_b = len(skipping.matching_files(snap1, "b BETWEEN 100 AND 110"))
    # BOTH clustering columns now prune files
    assert kept_a < n_files and kept_b < n_files
    # and the data is unchanged
    for where in ("a BETWEEN 100 AND 110", "b BETWEEN 100 AND 110 AND a < 50"):
        got = (
            dr.read_delta(spark, root, where=where)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
            .collect()[0]
        )
        want = (
            df.filter(where)
            .agg(F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s"))
            .collect()[0]
        )
        assert tuple(got) == tuple(want)


def test_zorder_refuses_string_columns(spark):
    root = _root()
    dw.delta_create(
        spark,
        root,
        spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string"),
    )
    with pytest.raises(ValueError, match="zorder_by column 's'"):
        dw.delta_optimize(spark, root, zorder_by=["s"])


def test_zorder_purges_deletion_vectors(spark):
    root = _root()
    dw.delta_create(spark, root, _two_dim(spark, 10_000))
    dw.delta_delete_where(spark, root, F.col("payload") % 3 == 0, use_dvs=True)
    dw.delta_optimize(spark, root, target_file_bytes=60_000, zorder_by=["a", "b"])
    snap = dr.delta_snapshot(root, spark)
    assert not snap.dvs  # rewrite purged every DV
    got = dr.read_delta(spark, root).count()
    assert got == sum(1 for i in range(10_000) if i % 3 != 0)


def test_zorder_with_dates_and_partitions(spark):
    root = _root()
    df = spark.range(20_000).select(
        (F.col("id") % 3).cast("string").alias("p"),
        F.date_add(
            F.lit("2020-01-01").cast("date"), (F.col("id") % 500).cast("int")
        ).alias("d"),
        ((F.col("id") * 31) % 997).alias("v"),
        F.col("id").alias("payload"),
    )
    dw.delta_create(spark, root, df, partition_by=["p"])
    dw.delta_optimize(
        spark, root, target_file_bytes=50_000, zorder_by=["d", "v"]
    )
    where = "p = '1' AND d < '2020-03-01' AND v BETWEEN 200 AND 300"
    got = sorted(
        r["payload"]
        for r in dr.read_delta(spark, root, where=where).collect()
    )
    want = sorted(r["payload"] for r in df.filter(where).collect())
    assert got == want
    snap = dr.delta_snapshot(root, spark)
    kept = skipping.matching_files(snap, where)
    assert 0 < len(kept) < len(snap.files)


def test_exact_integer_and_decimal_coercion(spark):
    """!= / NOT IN skips must not be fooled by float collapse on
    longs beyond 2^53 or high-precision decimals."""
    from pyspark.sql import types as T

    from computer_vision_foundations_spark.sources.skipping import _coerce

    big = 9_007_199_254_740_993  # 2^53 + 1
    assert _coerce(big, T.LongType()) == big
    assert _coerce(str(big), T.LongType()) == big
    assert _coerce(big, T.LongType()) != big - 1  # float() would equate
    import decimal

    d = _coerce("123456789.123456789", T.DecimalType(27, 9))
    assert d == decimal.Decimal("123456789.123456789")
    assert d != decimal.Decimal("123456789.123456788")
    # end to end: a partition value at 2^53+1 must not be !=-skipped
    root = _root()
    df = spark.createDataFrame(
        [(big, 1), (big + 2, 2)], "p long, v int"
    )
    dw.delta_create(spark, root, df, partition_by=["p"])
    snap = dr.delta_snapshot(root, spark)
    kept = skipping.matching_files(snap, f"p != {big - 1}")
    assert len(kept) == len(snap.files)  # nothing equals big-1
    kept2 = skipping.matching_files(snap, f"p = {big}")
    assert len(kept2) == 1
