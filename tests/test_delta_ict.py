"""In-commit timestamps: strict monotonicity, writer-only protocol
upgrade, timestamp time travel through the trusted clock."""

import json
import os
import tempfile

from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def _root():
    return tempfile.mkdtemp(prefix="delta_ict_")


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def _icts(root):
    log = os.path.join(root, "_delta_log")
    out = {}
    for f in sorted(os.listdir(log)):
        if not (f.endswith(".json") and f[:20].isdigit()):
            continue
        with open(os.path.join(log, f)) as fh:
            first = json.loads(fh.readline())
        out[int(f[:20])] = first.get("commitInfo", {}).get("inCommitTimestamp")
    return out


def test_ict_strictly_monotonic(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 5))
    v_on = dw.delta_enable_ict(spark, root)
    for i in range(4):  # rapid commits often share the same wall ms
        dw.delta_append(spark, root, _mk(spark, 5 + i, 6 + i))
    icts = _icts(root)
    assert icts[0] is None  # pre-enablement commits carry none
    vals = [icts[v] for v in sorted(icts) if v >= v_on]
    assert all(v is not None for v in vals)
    assert all(b > a for a, b in zip(vals, vals[1:]))  # STRICT
    snap = dr.delta_snapshot(root, spark)
    conf = snap.meta_raw["configuration"]
    assert conf["delta.inCommitTimestampEnablementVersion"] == str(v_on)


def test_ict_protocol_writer_only(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 5))
    dw.delta_enable_ict(spark, root)
    proto = dr.delta_snapshot(root, spark).protocol_raw
    assert proto["minReaderVersion"] == 1  # readers unaffected
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    assert "invariants" in proto["writerFeatures"]  # implied set kept


def test_ict_time_travel_uses_trusted_clock(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 5))
    dw.delta_enable_ict(spark, root)
    dw.delta_append(spark, root, _mk(spark, 5, 10))
    v2 = dr.delta_snapshot(root, spark).version
    dw.delta_append(spark, root, _mk(spark, 10, 15))
    # falsify the LAST commit's plain timestamp far into the past; the
    # ICT must still win for as_of resolution
    log = os.path.join(root, "_delta_log")
    last = max(
        int(f[:20]) for f in os.listdir(log)
        if f.endswith(".json") and f[:20].isdigit()
    )
    p = os.path.join(log, f"{last:020d}.json")
    lines = open(p).read().splitlines()
    first = json.loads(lines[0])
    first["commitInfo"]["timestamp"] = 0
    lines[0] = json.dumps(first)
    open(p, "w").write("\n".join(lines) + "\n")
    ict_v2 = _icts(root)[v2]
    got = dr.read_delta(spark, root, as_of_ts=ict_v2 / 1000.0)
    assert got.count() == 10  # resolves to v2, not fooled by ts=0


def test_ict_idempotent_enable(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, 0, 3))
    v1 = dw.delta_enable_ict(spark, root)
    v2 = dw.delta_enable_ict(spark, root)
    assert v2 == v1  # no-op second time
