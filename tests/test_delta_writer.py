"""Round-trip tests for the real-format Delta WRITE half
(sources/delta_writer.py): engine write → delta_reader read-back on
the actual ``_delta_log`` format, with version/time-travel, MERGE,
DELETE, checkpoint + ``_last_checkpoint``, partition-value encoding,
and concurrency assertions. delta-spark itself is not in this
container, so format fidelity is asserted against the protocol shapes
the committed real-format fixture (tests/fixtures/delta_people)
exercises: 20-digit JSON commits, action vocabulary, URL-encoded
paths, struct-per-action checkpoint parquet."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw
from computer_vision_foundations_spark.sources.acid import read_table


def _mk(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _root():
    return tempfile.mkdtemp(prefix="delta_w_")


def test_create_and_read_back(spark):
    root = _root()
    v = dw.delta_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]))
    assert v == 0
    assert dr.is_delta_table(root)
    got = sorted(dr.read_delta(spark, root).collect())
    assert [(r["k"], r["v"]) for r in got] == [(1, "a"), (2, "b")]
    # commit 0 carries metaData + protocol + commitInfo per protocol
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert "metaData" in kinds and "protocol" in kinds and "add" in kinds
    add = next(a["add"] for a in actions if "add" in a)
    assert add["dataChange"] is True
    n_total = sum(
        json.loads(a["add"]["stats"])["numRecords"]
        for a in actions
        if "add" in a
    )
    assert n_total == 2


def test_append_versions_and_time_travel(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    v1 = dw.delta_append(spark, root, _mk(spark, [(2, "b")]))
    v2 = dw.delta_append(spark, root, _mk(spark, [(3, "c")]))
    assert (v1, v2) == (1, 2)
    assert dr.read_delta(spark, root).count() == 3
    assert dr.read_delta(spark, root, version=0).count() == 1
    assert dr.read_delta(spark, root, version=1).count() == 2
    hist = dr.delta_history(root)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[0]["operation"] == "WRITE"


def test_append_schema_enforced(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="schema mismatch"):
        dw.delta_append(
            spark, root, spark.createDataFrame([(1,)], "k long")
        )


def test_overwrite_replaces_and_old_version_survives(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]))
    dw.delta_overwrite(spark, root, _mk(spark, [(9, "z")]))
    assert [(r["k"], r["v"]) for r in dr.read_delta(spark, root).collect()] == [
        (9, "z")
    ]
    assert dr.read_delta(spark, root, version=0).count() == 2


def test_upsert_matches_acid_merge_semantics(spark):
    root = _root()
    dw.delta_create(
        spark, root, _mk(spark, [(1, "a"), (2, "b"), (3, "c")])
    )
    v = dw.delta_upsert(
        spark, root, _mk(spark, [(2, "B2"), (4, "d")]), ["k"]
    )
    assert v == 1
    got = {r["k"]: r["v"] for r in dr.read_delta(spark, root).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}
    # the MERGE commit is remove+add
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json")) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    assert any("remove" in a for a in actions)
    assert any("add" in a for a in actions)
    info = next(a["commitInfo"] for a in actions if "commitInfo" in a)
    assert info["operation"] == "MERGE"
    # time travel to pre-merge
    pre = {r["k"]: r["v"] for r in dr.read_delta(spark, root, version=0).collect()}
    assert pre == {1: "a", 2: "b", 3: "c"}


def test_upsert_rewrites_only_touched_files(spark):
    root = _root()
    # two files via two appends: only the file holding k=2 is rewritten
    dw.delta_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]).coalesce(1))
    dw.delta_append(spark, root, _mk(spark, [(3, "c"), (4, "d")]).coalesce(1))
    dw.delta_upsert(spark, root, _mk(spark, [(2, "B2")]), ["k"])
    with open(os.path.join(root, "_delta_log", f"{2:020d}.json")) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    removes = [a["remove"]["path"] for a in actions if "remove" in a]
    assert len(removes) == 1  # the untouched file survives in place
    got = {r["k"]: r["v"] for r in dr.read_delta(spark, root).collect()}
    assert got == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_delete_where(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(i, "x") for i in range(10)]))
    dw.delta_delete_where(spark, root, F.col("k") % 2 == 0)
    assert sorted(
        r["k"] for r in dr.read_delta(spark, root).collect()
    ) == [1, 3, 5, 7, 9]
    # no-match delete is a no-op (version unchanged)
    v = dw.delta_delete_where(spark, root, F.col("k") > 100)
    assert v == 1


def test_checkpoint_written_every_10_and_used(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(0, "r0")]))
    for i in range(1, 12):
        dw.delta_append(spark, root, _mk(spark, [(i, f"r{i}")]))
    log = os.path.join(root, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{10:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint")) as f:
        lc = json.load(f)
    assert lc["version"] == 10
    # snapshot resolves from the checkpoint: only commits 11.. replay
    snap = dr.delta_snapshot(root, spark)
    assert snap.checkpoint_version == 10
    assert snap.num_commits_replayed == 1
    assert dr.read_delta(spark, root).count() == 12
    # a snapshot BEFORE the checkpoint ignores the _last_checkpoint hint
    assert dr.read_delta(spark, root, version=5).count() == 6


def test_partitioned_roundtrip_with_hostile_values(spark):
    """Partition values with spaces/colons (the timestamp-shaped
    strings the round-9 advice called out) must round-trip exactly:
    URL-encoded add.path resolves, and the values come back from the
    log's partitionValues, not directory-name inference."""
    root = _root()
    df = spark.createDataFrame(
        [
            (1, "2021-01-05 00:00:00", 1.5),
            (2, "2021-01-05 00:00:00", 2.5),
            (3, "2021-01-06 12:30:00", 3.5),
        ],
        "id long, date string, score double",
    )
    dw.delta_create(spark, root, df, partition_by=["date"])
    got = sorted(
        (r["id"], r["date"], r["score"])
        for r in dr.read_delta(spark, root).collect()
    )
    assert got == [
        (1, "2021-01-05 00:00:00", 1.5),
        (2, "2021-01-05 00:00:00", 2.5),
        (3, "2021-01-06 12:30:00", 3.5),
    ]
    # the logged path is URL-encoded (space/colon) and partitionValues
    # carry the raw value
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as f:
        adds = [
            json.loads(ln)["add"]
            for ln in f
            if ln.strip() and "add" in json.loads(ln)
        ]
    assert all("%" in a["path"] for a in adds)  # escaped dir name
    assert {a["partitionValues"]["date"] for a in adds} == {
        "2021-01-05 00:00:00",
        "2021-01-06 12:30:00",
    }


def test_partitioned_upsert(spark):
    root = _root()
    df = spark.createDataFrame(
        [(1, "EU", "a"), (2, "US", "b"), (3, "EU", "c")],
        "id long, region string, v string",
    )
    dw.delta_create(spark, root, df, partition_by=["region"])
    dw.delta_upsert(
        spark,
        root,
        spark.createDataFrame(
            [(2, "US", "B2"), (4, "AP", "d")],
            "id long, region string, v string",
        ),
        ["id"],
    )
    got = {r["id"]: (r["region"], r["v"]) for r in dr.read_delta(spark, root).collect()}
    assert got == {
        1: ("EU", "a"),
        2: ("US", "B2"),
        3: ("EU", "c"),
        4: ("AP", "d"),
    }


def test_nonhive_layout_falls_back_to_logged_values(spark):
    """A real Delta table may store files WITHOUT hive directories —
    partitionValues in the log are authoritative. Simulate by
    rewriting the log paths to flat names."""
    root = _root()
    df = spark.createDataFrame(
        [(1, "EU"), (2, "US")], "id long, region string"
    )
    dw.delta_create(spark, root, df, partition_by=["region"])
    log = os.path.join(root, "_delta_log", f"{0:020d}.json")
    with open(log) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    new_actions = []
    for a in actions:
        if "add" in a:
            old = a["add"]["path"]
            flat = old.replace("/", "__")
            os.rename(
                os.path.join(root, *old.split("/")),
                os.path.join(root, flat),
            )
            a["add"]["path"] = flat
        new_actions.append(a)
    with open(log, "w") as f:
        f.write("\n".join(json.dumps(a) for a in new_actions) + "\n")
    got = sorted(
        (r["id"], r["region"]) for r in dr.read_delta(spark, root).collect()
    )
    assert got == [(1, "EU"), (2, "US")]


def test_commit_conflict_raises(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    # squat on version 1 to simulate a concurrent winner
    path = os.path.join(root, "_delta_log", f"{1:020d}.json")
    with open(path, "w") as f:
        f.write(json.dumps({"commitInfo": {"timestamp": 0, "operation": "WRITE"}}) + "\n")
    with pytest.raises(dw.DeltaCommitConflict):
        dw._publish(root, 1, [], "WRITE", 0)


def test_concurrent_append_race_rebases(spark):
    """Two writers race to version N+1 on the REAL _delta_log (the
    mirror of tests/test_acid.py::test_concurrent_commit_conflict for
    the native log): the loser of the hard-link race re-snapshots and
    retries at the new head — blind appends never fail, never rewrite
    data files, and every row lands exactly once."""
    import threading

    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(0, "base")]))
    errs: list[Exception] = []

    def appender(i: int) -> None:
        try:
            dw.delta_append(spark, root, _mk(spark, [(100 + i, f"w{i}")]))
        except Exception as e:  # pragma: no cover - failure evidence
            errs.append(e)

    threads = [threading.Thread(target=appender, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    # versions 1..4 all published, one commit file each, no gaps
    log = os.path.join(root, "_delta_log")
    commits = sorted(f for f in os.listdir(log) if f.endswith(".json"))
    assert commits == [f"{v:020d}.json" for v in range(5)]
    got = sorted(r["k"] for r in dr.read_delta(spark, root).collect())
    assert got == [0, 100, 101, 102, 103]


def test_concurrent_read_dependent_commit_conflicts(spark):
    """A read-dependent commit (overwrite computed against a stale
    snapshot) must FAIL when another writer committed first — its
    remove set describes a world that no longer exists."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]))
    snap = dr.delta_snapshot(root, spark)  # A reads v0
    dw.delta_append(spark, root, _mk(spark, [(3, "c")]))  # B wins v1
    files = dw._write_data_files(_mk(spark, [(9, "z")]), root, [])
    ts = dw._now_ms()
    actions = [
        dw._remove_action(dw._encode_path(rel), ts)
        for rel in sorted(snap.files)
    ] + [
        dw._add_action(rel, pv, size, n, ts, stats=st)
        for rel, pv, size, n, st in files
    ]
    with pytest.raises(dw.DeltaCommitConflict):
        dw._publish(root, snap.version + 1, actions, "OVERWRITE", ts)
    # the table is untouched by the failed transaction
    got = sorted(r["k"] for r in dr.read_delta(spark, root).collect())
    assert got == [1, 2, 3]


def test_schema_evolving_append_race_raises(spark):
    """mergeSchema appends carry a metaData action, which conflicts
    with ANY concurrent commit per the Delta resolution rules — the
    loser raises instead of silently publishing a stale schema."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    # the winner must land AFTER the loser's snapshot read: intercept
    # the loser's publish and commit a competing append first
    real_publish = dw._publish
    raced = []

    def racing_publish(r, version, actions, operation, ts, snap=None):
        if not raced:
            raced.append(True)
            # the competing writer's (commitInfo-only) commit wins
            real_publish(r, version, [], "WRITE", ts)
        return real_publish(r, version, actions, operation, ts, snap)

    dw._publish = racing_publish
    try:
        with pytest.raises(dw.DeltaCommitConflict):
            dw.delta_append(
                spark,
                root,
                _mk(spark, [(2, "b", 7)], "k long, v string, extra long"),
                merge_schema=True,
            )
    finally:
        dw._publish = real_publish
    # and WITHOUT the schema change the same race auto-rebases
    raced.clear()
    dw._publish = racing_publish
    try:
        v = dw.delta_append(spark, root, _mk(spark, [(3, "c")]))
    finally:
        dw._publish = real_publish
    assert v >= 2
    assert 3 in {r["k"] for r in dr.read_delta(spark, root).collect()}


def test_acid_read_table_routes_written_delta(spark):
    """acid.read_table transparently opens engine-written real-format
    Delta tables — the documented one-engine read surface."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]))
    dw.delta_append(spark, root, _mk(spark, [(3, "c")]))
    assert read_table(spark, root).count() == 3
    assert read_table(spark, root, version=0).count() == 2


def test_optimize_compacts_with_datachange_false(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(0, "r0")]))
    for i in range(1, 6):
        dw.delta_append(spark, root, _mk(spark, [(i, f"r{i}")]))
    before = dr.delta_snapshot(root, spark)
    assert len(before.files) >= 6
    v = dw.delta_optimize(spark, root, target_file_bytes=1 << 20)
    after = dr.delta_snapshot(root, spark)
    assert v == before.version + 1
    assert len(after.files) < len(before.files)
    # rows unchanged, OPTIMIZE actions carry dataChange: false
    assert dr.read_delta(spark, root).count() == 6
    with open(os.path.join(root, "_delta_log", f"{v:020d}.json")) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    assert all(
        a["add"]["dataChange"] is False for a in actions if "add" in a
    )
    assert all(
        a["remove"]["dataChange"] is False for a in actions if "remove" in a
    )
    # time travel before the OPTIMIZE still resolves the small files
    assert dr.read_delta(spark, root, version=before.version).count() == 6


def test_vacuum_respects_retention(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    dw.delta_overwrite(spark, root, _mk(spark, [(2, "b")]))
    dw.delta_overwrite(spark, root, _mk(spark, [(3, "c")]))
    # retain only the last 2 snapshots: v0's file is unreferenced
    removed = dw.delta_vacuum(root, spark, retain_last=2)
    assert len(removed) >= 1
    assert dr.read_delta(spark, root).count() == 1
    assert dr.read_delta(spark, root, version=1).count() == 1


def test_restore_to_earlier_version(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a"), (2, "b")]))
    dw.delta_append(spark, root, _mk(spark, [(3, "c")]))          # v1
    dw.delta_delete_where(spark, root, F.col("k") == 1)           # v2
    v = dw.delta_restore(spark, root, 1)                          # v3
    assert v == 3
    got = sorted(
        (r["k"], r["v"]) for r in dr.read_delta(spark, root).collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # the mistake (v2) stays time-travelable — restore moves FORWARD
    assert dr.read_delta(spark, root, version=2).count() == 2
    with open(os.path.join(root, "_delta_log", f"{3:020d}.json")) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    assert actions[0]["commitInfo"]["operation"] == "RESTORE"
    adds = [a["add"] for a in actions if "add" in a]
    # only the files v2 dropped come back; stats carry numRecords
    assert adds and all(
        json.loads(a["stats"])["numRecords"] >= 1 for a in adds
    )


def test_restore_noop_and_vacuumed_failure(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    assert dw.delta_restore(spark, root, 0) == 0  # no-op at the tip
    dw.delta_overwrite(spark, root, _mk(spark, [(9, "z")]))       # v1
    dw.delta_vacuum(root, spark, retain_last=1)  # drops v0's file
    with pytest.raises(FileNotFoundError):
        dw.delta_restore(spark, root, 0)


def test_restore_across_schema_change_recommits_metadata(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    dw.delta_overwrite(
        spark, root, _mk(spark, [(1, "a", 7)], "k long, v string, extra long")
    )                                                              # v1
    v = dw.delta_restore(spark, root, 0)                          # v2
    assert v == 2
    snap = dr.delta_snapshot(root, spark)
    assert [f.name for f in snap.schema.fields] == ["k", "v"]
    assert [(r["k"], r["v"]) for r in dr.read_delta(spark, root).collect()] == [
        (1, "a")
    ]


def test_merge_schema_append(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    v = dw.delta_append(
        spark,
        root,
        _mk(spark, [(2, "b", 5.0)], "k long, v string, score double"),
        merge_schema=True,
    )
    assert v == 1
    snap = dr.delta_snapshot(root, spark)
    assert [f.name for f in snap.schema.fields] == ["k", "v", "score"]
    got = {r["k"]: r["score"] for r in dr.read_delta(spark, root).collect()}
    assert got == {1: None, 2: 5.0}  # old files read NULL for new cols
    # committed columns missing from the batch are null-filled
    dw.delta_append(
        spark, root, _mk(spark, [(3, "c")]), merge_schema=True
    )
    got = {r["k"]: r["score"] for r in dr.read_delta(spark, root).collect()}
    assert got[3] is None
    # type conflict still refused
    with pytest.raises(ValueError, match="column types"):
        dw.delta_append(
            spark,
            root,
            _mk(spark, [(4, "d", 1)], "k long, v string, score long"),
            merge_schema=True,
        )
    # without merge_schema, extra columns stay refused
    with pytest.raises(ValueError, match="schema mismatch"):
        dw.delta_append(
            spark,
            root,
            _mk(spark, [(5, "e", 1.0, 2.0)],
                "k long, v string, score double, other double"),
        )


def test_table_id_stable_across_evolution(spark):
    """The protocol's stable-identity contract: metaData.id (and
    createdTime) must survive overwrite-with-new-schema, mergeSchema
    appends, and RESTORE — a mid-history id change aborts delta-spark
    streaming sources."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    s0 = dr.delta_snapshot(root, spark)
    dw.delta_overwrite(
        spark, root, _mk(spark, [(1, "a", 1.0)], "k long, v string, x double")
    )
    dw.delta_append(
        spark,
        root,
        _mk(spark, [(2, "b", 1.0, 9)], "k long, v string, x double, y long"),
        merge_schema=True,
    )
    dw.delta_restore(spark, root, 0)
    s3 = dr.delta_snapshot(root, spark)
    assert s3.meta_id == s0.meta_id
    assert s3.created_time == s0.created_time
    # mergeSchema forced the evolved column nullable in the log
    dw.delta_append(
        spark,
        root,
        spark.createDataFrame([(3, "c", 5)], "k long, v string, z long")
        .withColumn("z", F.col("z") + 0),  # z non-nullable in the batch
        merge_schema=True,
    )
    snap = dr.delta_snapshot(root, spark)
    zf = next(f for f in snap.schema.fields if f.name == "z")
    assert zf.nullable is True


def test_append_contention_is_bounded(spark, monkeypatch):
    """Sustained contention cannot spin forever: the rebase loop gives
    up with a contextual DeltaCommitConflict after the attempt cap
    (round-10 ADVICE), and each retry sleeps a jittered backoff."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, "a")]))
    calls = {"publish": 0, "backoffs": []}

    def always_lose(*a, **kw):
        calls["publish"] += 1
        raise dw.DeltaCommitConflict("simulated perpetual loser")

    def fake_uniform(lo, hi):
        calls["backoffs"].append((lo, hi))
        return 0.0  # keep the test instant; the bound is what matters

    # patch a stub random module INTO dw so the global random/time
    # modules (used by py4j background threads) stay untouched
    monkeypatch.setattr(dw, "_publish", always_lose)
    monkeypatch.setattr(
        dw, "random", type("R", (), {"uniform": staticmethod(fake_uniform)})
    )
    with pytest.raises(dw.DeltaCommitConflict, match="giving up"):
        dw.delta_append(spark, root, _mk(spark, [(2, "b")]))
    assert calls["publish"] == dw._MAX_COMMIT_ATTEMPTS
    # one jittered backoff per lost race except the final (raising) one,
    # with a linearly-growing upper bound
    assert len(calls["backoffs"]) == dw._MAX_COMMIT_ATTEMPTS - 1
    assert calls["backoffs"][0] == (0, 0.02)
    assert calls["backoffs"][-1][1] > calls["backoffs"][0][1]


def test_v2_checkpoint_write_read_roundtrip(spark):
    """V2 checkpoint WRITE (round-11 verdict ask #5): our writer emits
    the uuid-named top-level + _sidecars layout, our reader resolves
    the snapshot THROUGH it (checkpoint_version set, adds recovered
    from the split sidecars), and later commits replay on top."""
    import glob

    root = _root()
    dw.delta_create(
        spark, root, _mk(spark, [(i, f"v{i}") for i in range(8)])
    )
    for j in range(2):
        dw.delta_append(spark, root, _mk(spark, [(100 + j, "x")]))
    v = dw.delta_checkpoint(spark, root, v2=True, sidecar_files=2)
    assert v == 2
    log = os.path.join(root, "_delta_log")
    tops = glob.glob(os.path.join(log, f"{v:020d}.checkpoint.*.parquet"))
    assert len(tops) == 1 and ".checkpoint." in tops[0]
    sides = glob.glob(os.path.join(log, "_sidecars", "*.parquet"))
    assert len(sides) == 2  # the split path is actually exercised
    with open(os.path.join(log, "_last_checkpoint")) as f:
        assert json.load(f)["version"] == v
    # append after the checkpoint, then delete the pre-checkpoint JSON
    # commits: the snapshot MUST resolve from the V2 checkpoint alone
    dw.delta_append(spark, root, _mk(spark, [(200, "y")]))
    for old in range(v + 1):
        os.remove(os.path.join(log, f"{old:020d}.json"))
    snap = dr.delta_snapshot(root, spark)
    assert snap.checkpoint_version == v and snap.version == 3
    got = sorted(r["k"] for r in dr.read_delta(spark, root).collect())
    assert got == list(range(8)) + [100, 101, 200]


def test_v2_checkpoint_carries_dvs(spark):
    """DV descriptors survive the V2 sidecar round trip — a reader
    resolving from the checkpoint must not resurrect deleted rows."""
    root = _root()
    dw.delta_create(
        spark,
        root,
        _mk(spark, [(i, f"v{i}") for i in range(12)]).repartition(2),
    )
    dw.delta_delete_where(spark, root, F.col("k") % 3 == 0, use_dvs=True)
    v = dw.delta_checkpoint(spark, root, v2=True)
    log = os.path.join(root, "_delta_log")
    for old in range(v + 1):
        os.remove(os.path.join(log, f"{old:020d}.json"))
    got = sorted(r["k"] for r in dr.read_delta(spark, root).collect())
    assert got == [k for k in range(12) if k % 3 != 0]
