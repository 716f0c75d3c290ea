"""Compaction planner + histogram-sketch mergeability tests."""

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.compaction import (
    compaction_plan,
)


def test_compaction_groups_are_contiguous_and_sized(spark):
    # 10 files of 40 bytes, target 100: exclusive-prefix binning ->
    # groups of cum0 {0,40,80}, {120,160,200... }
    rows = [(f"f{i:02d}", 40) for i in range(10)]
    df = spark.createDataFrame(rows, ["key", "bytes"])
    out = compaction_plan(df, "key", "bytes", 100).collect()
    assert [r.group_id for r in out] == [0, 1, 2, 3]
    assert [r.n_files for r in out] == [3, 2, 3, 2]
    assert sum(r.group_bytes for r in out) == 400
    # contiguity: every group's key range precedes the next group's
    for a, b in zip(out, out[1:]):
        assert a.max_key < b.min_key


def test_compaction_one_big_file_gets_own_group(spark):
    rows = [("a", 10), ("b", 500), ("c", 10)]
    df = spark.createDataFrame(rows, ["key", "bytes"])
    out = {r.group_id: r for r in compaction_plan(df, "key", "bytes", 100).collect()}
    # 'b' starts at cum0=10 (group 0 with 'a'), 'c' starts at 510 -> group 5
    assert out[0].n_files == 2
    assert out[5].min_key == "c"


def test_histogram_sketch_merges(spark):
    """Mergeability: bin counts from two halves add to the whole —
    the property that makes the sketch a sketch (map-side combine /
    cross-cluster merge)."""
    from computer_vision_foundations_spark.operators.quantile_sketch import (
        histogram_quantiles,
    )

    whole = spark.range(1, 2001).select(F.col("id").cast("double").alias("v"))
    # same extrema on both halves (1 and 2000 pinned) so bin edges match
    h1 = whole.where((F.col("v") <= 1000) | (F.col("v") == 2000))
    h2 = whole.where((F.col("v") > 1000) | (F.col("v") == 1))
    q_whole = histogram_quantiles(whole, "v", n_bins=64, qs=(0.5,)).collect()[0]
    # merged = union of the two halves minus the duplicated pins
    merged = h1.unionByName(h2).exceptAll(
        spark.createDataFrame([(1.0,), (2000.0,)], ["v"])
    )
    q_merged = histogram_quantiles(merged, "v", n_bins=64, qs=(0.5,)).collect()[0]
    assert (q_whole.bin, q_whole.est, q_whole.n) == (
        q_merged.bin,
        q_merged.est,
        q_merged.n,
    )


def test_grouped_quantiles_matches_single_group(spark):
    """A single-group input must reproduce histogram_quantiles."""
    from computer_vision_foundations_spark.operators.quantile_sketch import (
        grouped_histogram_quantiles,
        histogram_quantiles,
    )

    df = spark.range(1, 501).select(
        F.lit("g").alias("grp"), F.col("id").cast("double").alias("v")
    )
    a = histogram_quantiles(df, "v", n_bins=64, qs=(0.5, 0.99)).collect()
    b = grouped_histogram_quantiles(
        df, "v", "grp", n_bins=64, qs=(0.5, 0.99)
    ).collect()
    assert [(r.q, r.bin, r.est, r.n) for r in a] == [
        (r.q, r.bin, r.est, r.n) for r in b
    ]


def test_grouped_quantiles_brackets_per_group(spark):
    from computer_vision_foundations_spark.operators.quantile_sketch import (
        grouped_histogram_quantiles,
    )

    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(i)) for i in range(1000, 1101)
    ]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {
        (r.grp, r.q): r
        for r in grouped_histogram_quantiles(
            df, "v", "grp", n_bins=32, qs=(0.5,)
        ).collect()
    }
    assert out[("a", 0.5)].lo_edge <= 50 <= out[("a", 0.5)].hi_edge
    assert out[("b", 0.5)].lo_edge <= 1050 <= out[("b", 0.5)].hi_edge


def test_hll_merge_equals_direct(spark):
    """Shard-merge losslessness: per-shard registers max-merged give
    EXACTLY the single-pass sketch (max associativity)."""
    from computer_vision_foundations_spark.functions.sketches import (
        hll_estimate_from_registers,
        hll_merge,
        hll_registers,
    )

    df = spark.createDataFrame(
        [(i % 3, f"v{i}") for i in range(500)], ["shard", "v"]
    )
    merged = hll_estimate_from_registers(
        hll_merge(hll_registers(df, "v", p=6, keys=["shard"])), p=6
    ).collect()[0][0]
    direct = hll_estimate_from_registers(
        hll_registers(df, "v", p=6), p=6
    ).collect()[0][0]
    assert merged == direct
