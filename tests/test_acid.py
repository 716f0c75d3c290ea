"""Transactional parquet tables (sources/acid.py): ACID commits, time
travel, copy-on-write delete/upsert, OPTIMIZE, VACUUM, log
checkpoints, and the optimistic-concurrency conflict path."""

import os

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources.acid import (
    TxnConflict,
    create_table,
    delete_where,
    optimize,
    read_table,
    table_history,
    upsert,
    vacuum,
    write_append,
    write_overwrite,
)


def _df(spark, ids, tag):
    return spark.createDataFrame(
        [(i, tag, float(i)) for i in ids], "id long, tag string, v double"
    )


def _rows(df):
    return sorted((r.id, r.tag, r.v) for r in df.collect())


def test_create_append_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = create_table(spark, root, _df(spark, range(3), "a"))
    v2 = write_append(spark, root, _df(spark, range(3, 5), "b"))
    assert (v1, v2) == (1, 2)
    assert read_table(spark, root).count() == 5
    assert read_table(spark, root, version=1).count() == 3
    # timestamp travel: as-of v1's commit time resolves to v1
    hist = table_history(root)
    assert [h["action"] for h in hist] == ["create", "append"]
    assert read_table(spark, root, as_of_ts=hist[0]["ts"]).count() == 3


def test_overwrite_is_atomic_snapshot(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, range(4), "old"))
    write_overwrite(spark, root, _df(spark, range(100, 102), "new"))
    latest = read_table(spark, root)
    assert _rows(latest) == _rows(_df(spark, range(100, 102), "new"))
    # the pre-overwrite snapshot is intact
    assert read_table(spark, root, version=1).count() == 4


def test_delete_where_copy_on_write(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, range(10), "a"))
    write_append(spark, root, _df(spark, range(10, 20), "b"))
    v = delete_where(spark, root, F.col("id") % 2 == 0)
    out = read_table(spark, root)
    assert out.count() == 10
    assert out.filter(F.col("id") % 2 == 0).count() == 0
    # untouched-file skipping: deleting from only one tag's rows must
    # not rewrite the other tag's files
    hist = table_history(root)
    assert hist[-1]["action"] == "delete"
    # time travel still sees the deleted rows
    assert read_table(spark, root, version=v - 1).count() == 20


def test_delete_skips_untouched_files(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, range(5), "a"))
    write_append(spark, root, _df(spark, range(100, 105), "b"))
    before = set(table_history(root)[-1]["added"])
    delete_where(spark, root, F.col("id") >= 100)
    removed = set(table_history(root)[-1]["removed"])
    # only the second commit's files were rewritten
    assert removed == before


def test_upsert_merge(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, range(5), "a"))
    updates = spark.createDataFrame(
        [(3, "UPD", 33.0), (4, "UPD", 44.0), (9, "NEW", 9.0)],
        "id long, tag string, v double",
    )
    upsert(spark, root, updates, ["id"])
    out = {r.id: (r.tag, r.v) for r in read_table(spark, root).collect()}
    assert out[3] == ("UPD", 33.0) and out[4] == ("UPD", 44.0)
    assert out[9] == ("NEW", 9.0)
    assert out[0] == ("a", 0.0)
    assert len(out) == 6


def test_optimize_compacts_preserving_data_and_history(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, range(4), "a").repartition(4))
    for k in range(3):
        write_append(
            spark, root, _df(spark, range(10 * (k + 1), 10 * (k + 1) + 4), "b").repartition(4)
        )
    before = _rows(read_table(spark, root))
    n_files_before = len(
        [f for f in os.listdir(os.path.join(root, "data")) if f.endswith(".parquet")]
    )
    v = optimize(spark, root, target_file_bytes=1 << 30)
    assert _rows(read_table(spark, root)) == before  # data unchanged
    hist = table_history(root)
    assert hist[-1]["action"] == "optimize"
    assert len(hist[-1]["added"]) < len(hist[-1]["removed"])
    # pre-optimize version still resolves to the original files
    assert _rows(read_table(spark, root, version=v - 1)) == before


def test_vacuum_retains_window(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, range(3), "a"))
    for k in range(4):
        write_overwrite(spark, root, _df(spark, range(3), f"v{k}"))
    removed = vacuum(root, retain_last=2)
    assert removed  # old overwritten files were reclaimed
    # the retained versions still read fine
    assert read_table(spark, root).count() == 3
    assert read_table(spark, root, version=4).count() == 3
    # beyond the horizon the files are gone (documented trade)
    with pytest.raises(Exception):
        read_table(spark, root, version=1).count()


def test_checkpoint_replay(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, [0], "a"))
    for i in range(1, 13):
        write_append(spark, root, _df(spark, [i], "a"))
    log = os.path.join(root, "_txn_log")
    assert any(f.endswith(".ckpt.json") for f in os.listdir(log))
    assert read_table(spark, root).count() == 13
    assert read_table(spark, root, version=11).count() == 11


def test_concurrent_commit_conflict(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, range(3), "a"))
    # writer A reads snapshot v1, writer B commits v2 first; A's
    # read-dependent commit must fail with TxnConflict, not publish
    write_append(spark, root, _df(spark, [100], "b"))  # B wins the race
    from computer_vision_foundations_spark.sources import acid

    added = acid._write_data_files(_df(spark, [200], "c"), root)
    with pytest.raises(TxnConflict):
        acid._commit(root, "overwrite", added, [], expected_version=1)
    # blind appends never conflict — they rebase automatically
    write_append(spark, root, _df(spark, [300], "d"))
    assert read_table(spark, root).count() == 5


def test_create_refuses_existing(spark, tmp_path):
    root = str(tmp_path / "t")
    create_table(spark, root, _df(spark, range(2), "a"))
    with pytest.raises(FileExistsError):
        create_table(spark, root, _df(spark, range(2), "a"))


def test_optimize_zorder_clusters_without_changing_data(spark, tmp_path):
    """OPTIMIZE ZORDER: one remove+add commit, identical data, earlier
    versions untouched, and per-file min/max ranges on the z-ordered
    columns are genuinely narrower than the global range."""
    import pyarrow.parquet as pq

    from computer_vision_foundations_spark.sources.acid import (
        optimize_zorder,
    )

    root = str(tmp_path / "tz")
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 7) % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    # scatter across many small files so the rewrite has work to do
    v1 = create_table(spark, root, df.repartition(16))
    before = sorted(r.payload for r in read_table(spark, root).collect())
    v2 = optimize_zorder(
        spark, root, ["x", "y"], bits=6, target_file_bytes=8 * 1024
    )
    assert v2 == v1 + 1
    hist = table_history(root)
    assert hist[-1]["action"] == "optimize_zorder"
    assert hist[-1]["meta"]["zorder_by"] == ["x", "y"]
    after = read_table(spark, root)
    assert sorted(r.payload for r in after.collect()) == before
    # time travel bypasses the rewrite
    assert read_table(spark, root, version=v1).count() == 4096
    # clustering evidence from parquet footers: mean per-file x-range
    # is well under the global range (random layout would be ~full)
    data_files = {
        f for f in os.listdir(os.path.join(root, "data"))
        if f.endswith(".parquet")
    }
    current = {os.path.basename(f) for f in hist[-1]["added"]}
    widths = []
    for f in current:
        md = pq.ParquetFile(os.path.join(root, "data", f)).metadata
        lo, hi = 64, -1
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # x
            lo = min(lo, col.statistics.min)
            hi = max(hi, col.statistics.max)
        widths.append(hi - lo)
    assert len(widths) > 2
    assert sum(widths) / len(widths) < 0.6 * 63
    assert current <= data_files


def test_data_skipping_prunes_files_same_results(spark, tmp_path):
    """Commit-log file statistics: a pruned read scans strictly fewer
    files yet filters to identical rows; files without stats are kept
    (conservative), and skipping composes with OPTIMIZE ZORDER."""
    from computer_vision_foundations_spark.sources.acid import (
        optimize_zorder,
        prune_files,
        read_table,
        write_append,
    )
    from computer_vision_foundations_spark.sources.acid import (
        _resolve_version,
        _snapshot_files,
    )

    root = str(tmp_path / "ds")
    lo = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("b")
    )
    hi = spark.range(5000, 6000).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("b")
    )
    create_table(spark, root, lo.repartition(4))
    write_append(spark, root, hi.repartition(4))

    v = _resolve_version(root, None, None)
    all_files = _snapshot_files(root, v)
    kept = prune_files(root, v, all_files, {"k": (0, 999)})
    assert len(kept) < len(all_files)  # the hi files are skipped

    pruned = read_table(spark, root, prune={"k": (0, 999)}).filter(
        F.col("k") <= 999
    )
    plain = read_table(spark, root).filter(F.col("k") <= 999)
    assert sorted(r.k for r in pruned.collect()) == sorted(
        r.k for r in plain.collect()
    )

    # z-order the table on (b, k-bucket): pruning on b now works too
    t2 = str(tmp_path / "ds2")
    df = spark.range(0, 2048).select(
        (F.col("id") % 64).alias("zx"),
        ((F.col("id") * 13) % 64).alias("zy"),
        F.col("id").alias("payload"),
    )
    create_table(spark, t2, df.repartition(8))
    optimize_zorder(spark, t2, ["zx", "zy"], bits=6,
                    target_file_bytes=4 * 1024)
    v2 = _resolve_version(t2, None, None)
    files2 = _snapshot_files(t2, v2)
    kept2 = prune_files(t2, v2, files2, {"zx": (0, 7)})
    assert len(kept2) < len(files2)
    got = read_table(spark, t2, prune={"zx": (0, 7)}).filter(
        F.col("zx") <= 7
    )
    assert got.count() == df.filter(F.col("zx") <= 7).count()


def test_schema_enforcement_and_evolution(spark, tmp_path):
    """Appends must match the table schema exactly (missing columns
    and type changes rejected); merge_schema=True permits ADDING
    columns, records the widened schema in the log, and pre-evolution
    rows read as NULL for the new column."""
    from computer_vision_foundations_spark.sources.acid import (
        table_schema,
    )

    root = str(tmp_path / "se")
    create_table(spark, root, _df(spark, range(3), "a"))

    with pytest.raises(ValueError):  # missing column
        write_append(
            spark, root,
            spark.createDataFrame([(9, "x")], "id long, tag string"),
        )
    with pytest.raises(ValueError):  # type change
        write_append(
            spark, root,
            spark.createDataFrame(
                [(9, "x", 1)], "id long, tag string, v long"
            ),
        )
    wide = spark.createDataFrame(
        [(9, "b", 9.0, "extra")], "id long, tag string, v double, note string"
    )
    with pytest.raises(ValueError):  # new column without the flag
        write_append(spark, root, wide)
    write_append(spark, root, wide, merge_schema=True)
    assert "note" in [f.name for f in table_schema(root).fields]
    rows = {r.id: r for r in read_table(spark, root).collect()}
    assert rows[9].note == "extra"
    assert rows[0].note is None  # pre-evolution rows surface NULL
    # enforcement now keys on the WIDENED schema
    with pytest.raises(ValueError):
        write_append(spark, root, _df(spark, range(1), "c"))


def test_file_stats_skip_non_json_types(spark, tmp_path):
    """Timestamp/binary columns must not break commits: their footer
    stats are non-JSON scalars (datetime/bytes) and are skipped, so
    the file simply never prunes on those columns."""
    from computer_vision_foundations_spark.sources.acid import (
        _resolve_version,
        _snapshot_files,
        prune_files,
    )

    root = str(tmp_path / "ts")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        F.col("id").cast("string").cast("binary").alias("raw"),
    )
    create_table(spark, root, df)  # json.dump must not raise
    v = _resolve_version(root, None, None)
    files = _snapshot_files(root, v)
    # int column stats present (prunable), ts/binary absent (kept)
    assert prune_files(root, v, files, {"k": (100, 200)}) == []
    assert prune_files(root, v, files, {"ts": (0, 1)}) == files
    assert read_table(spark, root).count() == 10


def test_table_changes_feed(spark, tmp_path):
    """Change data feed between versions: inserts, deletes and updates
    classified from the immutable snapshots (retroactive — no
    write-path hooks)."""
    from computer_vision_foundations_spark.sources.acid import (
        table_changes,
    )

    root = str(tmp_path / "cdf")
    create_table(spark, root, _df(spark, range(4), "a"))  # v1: 0..3
    upsert(
        spark,
        root,
        spark.createDataFrame(
            [(2, "a2", 2.0), (9, "new", 9.0)], "id long, tag string, v double"
        ),
        ["id"],
    )  # v2: update 2, insert 9
    delete_where(spark, root, F.col("id") == 0)  # v3: delete 0

    ch12 = {
        (r.id, r._change_type)
        for r in table_changes(spark, root, 1, 2, ["id"], "tag").collect()
    }
    assert ch12 == {(2, "update"), (9, "insert")}
    ch23 = {
        (r.id, r._change_type)
        for r in table_changes(spark, root, 2, 3, ["id"], "tag").collect()
    }
    assert ch23 == {(0, "delete")}
    ch13 = {
        (r.id, r._change_type)
        for r in table_changes(spark, root, 1, 3, ["id"], "tag").collect()
    }
    assert ch13 == {(2, "update"), (9, "insert"), (0, "delete")}


def test_schema_enforced_on_overwrite_and_upsert(spark, tmp_path):
    """Review findings: overwrite and upsert must enforce the table
    schema too; replace_schema=True permits a wholesale change (old
    files leave in the same commit) and records the new schema."""
    from computer_vision_foundations_spark.sources.acid import (
        table_schema,
        write_overwrite,
    )

    root = str(tmp_path / "se2")
    create_table(spark, root, _df(spark, range(3), "a"))
    other = spark.createDataFrame([(1, "x")], "id long, note string")
    with pytest.raises(ValueError):
        write_overwrite(spark, root, other)
    with pytest.raises(ValueError):
        upsert(spark, root, other, ["id"])
    write_overwrite(spark, root, other, replace_schema=True)
    assert [f.name for f in table_schema(root).fields] == ["id", "note"]
    # appends now key on the REPLACED schema
    write_append(spark, root, spark.createDataFrame(
        [(2, "y")], "id long, note string"))
    assert read_table(spark, root).count() == 2


def test_pruned_read_keeps_evolved_schema(spark, tmp_path):
    """Review finding: pruning must never change the returned schema —
    an evolved column survives even when every post-evolution file is
    skipped (reader pinned to the recorded schema, not footer merge)."""
    root = str(tmp_path / "se3")
    create_table(
        spark, root,
        spark.range(0, 100).select(F.col("id").alias("k"),
                                   F.lit("t").alias("tag")),
    )
    write_append(
        spark, root,
        spark.range(5000, 5100).select(
            F.col("id").alias("k"), F.lit("t").alias("tag"),
            F.lit("n").alias("note")),
        merge_schema=True,
    )
    pruned = read_table(spark, root, prune={"k": (0, 99)})
    assert "note" in pruned.columns  # schema survives pruning
    rows = pruned.filter(F.col("k") <= 99).collect()
    assert len(rows) == 100 and all(r.note is None for r in rows)
    # empty snapshot also reports the evolved schema
    delete_where(spark, root, F.col("k") >= 0)
    assert "note" in read_table(spark, root).columns


def test_prune_type_mismatch_keeps_files(spark, tmp_path):
    """Review finding: numeric bounds against a string column's stats
    must conservatively keep files, not raise TypeError."""
    from computer_vision_foundations_spark.sources.acid import (
        _resolve_version,
        _snapshot_files,
        prune_files,
    )

    root = str(tmp_path / "se4")
    create_table(spark, root, _df(spark, range(5), "a"))
    v = _resolve_version(root, None, None)
    files = _snapshot_files(root, v)
    assert prune_files(root, v, files, {"tag": (0, 1)}) == files


def test_bloom_file_skipping_point_lookup(spark, tmp_path):
    from computer_vision_foundations_spark.sources import acid

    root = str(tmp_path / "tbl_bloom")
    # two disjoint key populations, committed separately -> 2+ files
    a = spark.createDataFrame(
        [(i, f"u{i}") for i in range(100)], ["id", "user"]
    ).coalesce(1)
    b = spark.createDataFrame(
        [(i, f"u{i}") for i in range(100, 200)], ["id", "user"]
    ).coalesce(1)
    acid.create_table(spark, root, a, bloom_cols=["user"])
    v = acid.write_append(spark, root, b, bloom_cols=["user"])
    files = acid._snapshot_files(root, v)
    assert len(files) >= 2

    # point probe for a key only in the first commit: bloom must drop
    # every second-commit file (disjoint values -> no false positive
    # would be needed, but allow them: assert at least one file pruned
    # and never the one holding the key)
    kept = acid.prune_files(root, v, files, prune_eq={"user": "u7"})
    assert len(kept) < len(files)
    got = (
        acid.read_table(spark, root, version=v)
        .filter("user = 'u7'")
        .collect()
    )
    pruned_read = (
        spark.read.parquet(
            *[f"{root}/{f}" for f in kept]
        )
        .filter("user = 'u7'")
        .collect()
    )
    assert [r["id"] for r in pruned_read] == [r["id"] for r in got] == [7]


def test_bloom_never_false_negative(spark, tmp_path):
    from computer_vision_foundations_spark.sources import acid

    root = str(tmp_path / "tbl_bloom_fn")
    df = spark.createDataFrame(
        [(i, f"k{i}") for i in range(300)], ["id", "user"]
    ).repartition(4)
    v = acid.create_table(spark, root, df, bloom_cols=["user"])
    files = acid._snapshot_files(root, v)
    full = {
        r["user"]: r["id"]
        for r in acid.read_table(spark, root).collect()
    }
    for probe in ["k0", "k123", "k299"]:
        kept = acid.prune_files(root, v, files, prune_eq={"user": probe})
        rows = (
            spark.read.parquet(*[f"{root}/{f}" for f in kept])
            .filter(f"user = '{probe}'")
            .collect()
        )
        assert len(rows) == 1 and rows[0]["id"] == full[probe]


def test_unindexed_column_is_never_pruned(spark, tmp_path):
    from computer_vision_foundations_spark.sources import acid

    root = str(tmp_path / "tbl_bloom_un")
    df = spark.createDataFrame([(1, "x")], ["id", "user"])
    v = acid.create_table(spark, root, df)  # no bloom_cols
    files = acid._snapshot_files(root, v)
    kept = acid.prune_files(
        root, v, files, prune_eq={"user": "definitely-absent"}
    )
    assert kept == files  # conservative: no bloom -> keep


def test_bloom_rejects_unrenderable_types(spark, tmp_path):
    from computer_vision_foundations_spark.sources import acid

    root = str(tmp_path / "tbl_bloom_ty")
    df = spark.createDataFrame([(1, 0.5)], ["id", "score"])
    with pytest.raises(ValueError, match="score"):
        acid.create_table(spark, root, df, bloom_cols=["score"])


def test_bloom_integer_column_round_trip(spark, tmp_path):
    from computer_vision_foundations_spark.sources import acid

    root = str(tmp_path / "tbl_bloom_int")
    a = spark.createDataFrame([(i,) for i in range(50)], ["id"]).coalesce(1)
    b = spark.createDataFrame(
        [(i,) for i in range(1000, 1050)], ["id"]
    ).coalesce(1)
    acid.create_table(spark, root, a, bloom_cols=["id"])
    v = acid.write_append(spark, root, b, bloom_cols=["id"])
    files = acid._snapshot_files(root, v)
    kept = acid.prune_files(root, v, files, prune_eq={"id": 1007})
    assert len(kept) < len(files)
    rows = (
        spark.read.parquet(*[f"{root}/{f}" for f in kept])
        .filter("id = 1007")
        .collect()
    )
    assert len(rows) == 1


def test_bloom_survives_overwrite_and_zorder(spark, tmp_path):
    from computer_vision_foundations_spark.sources import acid

    root = str(tmp_path / "tbl_bloom_ow")
    df = spark.createDataFrame(
        [(i, f"u{i}") for i in range(40)], ["id", "user"]
    )
    acid.create_table(spark, root, df, bloom_cols=["user"])
    v = acid.write_overwrite(
        spark,
        root,
        spark.createDataFrame(
            [(i, f"w{i}") for i in range(40)], ["id", "user"]
        ).repartition(2),
        bloom_cols=["user"],
    )
    files = acid._snapshot_files(root, v)
    blooms = acid._blooms_for_snapshot(root, v)
    assert all(f in blooms for f in files)  # rewritten files re-indexed
    kept = acid.prune_files(root, v, files, prune_eq={"user": "nope"})
    # absent key: bloom may prune everything (no false negatives needed)
    rows = []
    if kept:
        rows = (
            spark.read.parquet(*[f"{root}/{f}" for f in kept])
            .filter("user = 'nope'")
            .collect()
        )
    assert rows == []
