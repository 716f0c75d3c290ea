"""Writer obligations: CHECK constraints, legacy column invariants,
appendOnly / changeDataFeed gates, and the unknown-writer-feature
refusal that keeps this adapter from corrupting foreign tables."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def _root():
    return tempfile.mkdtemp(prefix="delta_cons_")


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v double")


def _set_conf(root, extra):
    """Append a metaData commit with extra configuration (simulating
    a foreign writer's table properties)."""
    log = os.path.join(root, "_delta_log")
    versions = sorted(
        int(f[:20]) for f in os.listdir(log) if f.endswith(".json")
    )
    with open(os.path.join(log, f"{versions[-1]:020d}.json")) as fh:
        meta = next(
            json.loads(line)["metaData"]
            for line in fh
            if line.strip() and "metaData" in json.loads(line)
        )
    meta["configuration"] = {**(meta.get("configuration") or {}), **extra}
    v = versions[-1] + 1
    with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")


def test_add_constraint_then_enforce(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 0.5), (2, 1.5)]))
    v = dw.delta_add_constraint(spark, root, "v_pos", "v > 0")
    snap = dr.delta_snapshot(root, spark)
    assert (snap.meta_raw["configuration"] or {})[
        "delta.constraints.v_pos"
    ] == "v > 0"
    # legacy protocol bumped to writer version 3
    assert snap.protocol_raw["minWriterVersion"] == 3
    dw.delta_append(spark, root, _mk(spark, [(3, 2.0)]))  # passes
    before = dr.delta_snapshot(root, spark).version
    with pytest.raises(dw.DeltaConstraintViolation, match="v_pos"):
        dw.delta_append(spark, root, _mk(spark, [(4, -1.0)]))
    # rejection is atomic: no commit happened
    assert dr.delta_snapshot(root, spark).version == before
    got = sorted(r["k"] for r in dr.read_delta(spark, root).collect())
    assert got == [1, 2, 3]
    assert v == 1


def test_add_constraint_refused_on_violating_data(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, -0.5)]))
    with pytest.raises(dw.DeltaConstraintViolation, match="existing rows"):
        dw.delta_add_constraint(spark, root, "v_pos", "v > 0")


def test_null_passes_check_constraint(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    dw.delta_add_constraint(spark, root, "v_pos", "v > 0")
    dw.delta_append(
        spark,
        root,
        spark.createDataFrame([(2, None)], "k long, v double"),
    )  # SQL CHECK semantics: NULL passes
    assert dr.read_delta(spark, root).count() == 2


def test_upsert_and_overwrite_enforce(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0), (2, 2.0)]))
    dw.delta_add_constraint(spark, root, "v_pos", "v > 0")
    with pytest.raises(dw.DeltaConstraintViolation):
        dw.delta_upsert(spark, root, _mk(spark, [(2, -9.0)]), ["k"])
    with pytest.raises(dw.DeltaConstraintViolation):
        dw.delta_overwrite(spark, root, _mk(spark, [(9, -1.0)]))
    dw.delta_upsert(spark, root, _mk(spark, [(2, 9.0)]), ["k"])
    got = {r["k"]: r["v"] for r in dr.read_delta(spark, root).collect()}
    assert got == {1: 1.0, 2: 9.0}


def test_drop_constraint(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    dw.delta_add_constraint(spark, root, "v_pos", "v > 0")
    dw.delta_drop_constraint(spark, root, "v_pos")
    dw.delta_append(spark, root, _mk(spark, [(2, -5.0)]))  # now legal
    assert dr.read_delta(spark, root).count() == 2
    with pytest.raises(ValueError, match="no constraint"):
        dw.delta_drop_constraint(spark, root, "v_pos")


def test_duplicate_constraint_name_refused(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    dw.delta_add_constraint(spark, root, "c", "v > 0")
    with pytest.raises(ValueError, match="already exists"):
        dw.delta_add_constraint(spark, root, "c", "v > 1")


def test_foreign_check_constraint_enforced(spark):
    """A constraint some OTHER writer recorded binds this writer."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    _set_conf(root, {"delta.constraints.big_k": "k < 100"})
    with pytest.raises(dw.DeltaConstraintViolation, match="big_k"):
        dw.delta_append(spark, root, _mk(spark, [(200, 1.0)]))
    dw.delta_append(spark, root, _mk(spark, [(50, 1.0)]))
    assert dr.read_delta(spark, root).count() == 2


def test_column_invariant_null_fails(spark):
    """Legacy delta.invariants: NULL FAILS (unlike CHECK)."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    # rewrite schemaString with an invariant annotation on v
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        lines = [json.loads(line) for line in fh if line.strip()]
    for a in lines:
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            for f in sch["fields"]:
                if f["name"] == "v":
                    f["metadata"] = {
                        "delta.invariants": json.dumps(
                            {"expression": {"expression": "v < 100"}}
                        )
                    }
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(dw.DeltaConstraintViolation, match="invariant"):
        dw.delta_append(spark, root, _mk(spark, [(2, 200.0)]))
    with pytest.raises(dw.DeltaConstraintViolation, match="invariant"):
        dw.delta_append(
            spark, root, spark.createDataFrame([(3, None)], "k long, v double")
        )
    dw.delta_append(spark, root, _mk(spark, [(4, 5.0)]))
    assert dr.read_delta(spark, root).count() == 2


def test_append_only_table_refuses_dml(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    _set_conf(root, {"delta.appendOnly": "true"})
    with pytest.raises(dr.DeltaProtocolError, match="appendOnly"):
        dw.delta_delete_where(spark, root, F.col("k") == 1)
    with pytest.raises(dr.DeltaProtocolError, match="appendOnly"):
        dw.delta_overwrite(spark, root, _mk(spark, [(2, 2.0)]))
    dw.delta_append(spark, root, _mk(spark, [(2, 2.0)]))  # appends fine
    # OPTIMIZE only rearranges bytes: legal on append-only tables
    dw.delta_optimize(spark, root, target_file_bytes=1024 * 1024)
    assert dr.read_delta(spark, root).count() == 2


def test_cdf_table_refuses_dml_allows_append(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    _set_conf(root, {"delta.enableChangeDataFeed": "true"})
    with pytest.raises(dr.DeltaProtocolError, match="cdc"):
        dw.delta_delete_where(spark, root, F.col("k") == 1)
    dw.delta_append(spark, root, _mk(spark, [(2, 2.0)]))
    assert dr.read_delta(spark, root).count() == 2


def test_unknown_writer_feature_refused(spark):
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    log = os.path.join(root, "_delta_log")
    v = dr.delta_snapshot(root, spark).version + 1
    with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["appendOnly", "icebergCompatV2"],
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(dr.DeltaProtocolError, match="icebergCompatV2"):
        dw.delta_append(spark, root, _mk(spark, [(2, 2.0)]))
    # reading is unaffected (no reader features demanded)
    assert dr.read_delta(spark, root).count() == 1


def test_generated_column_overwrite_refused(spark):
    """Appends COMPUTE/ENFORCE generated columns (test_delta_generated);
    overwrite would silently drop the expression, so it refuses."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 2.0)]))
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        lines = [json.loads(line) for line in fh if line.strip()]
    for a in lines:
        if "metaData" in a:
            sch = json.loads(a["metaData"]["schemaString"])
            sch["fields"][1]["metadata"] = {
                "delta.generationExpression": "k * 2"
            }
            a["metaData"]["schemaString"] = json.dumps(sch)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(dr.DeltaProtocolError, match="generation"):
        dw.delta_overwrite(spark, root, _mk(spark, [(2, 4.0)]))
    # the append path now maintains the column instead of refusing
    dw.delta_append(spark, root, _mk(spark, [(3, 6.0)]))
    assert dr.read_delta(spark, root).count() == 2


def test_table_features_protocol_gets_writer_feature(spark):
    """On a table-features protocol, ADD CONSTRAINT extends
    writerFeatures instead of bumping the legacy version."""
    root = _root()
    dw.delta_create(spark, root, _mk(spark, [(1, 1.0)]))
    dw.delta_delete_where(spark, root, F.col("k") < 0, use_dvs=True)
    dw.delta_append(spark, root, _mk(spark, [(2, 2.0)]))
    dw.delta_delete_where(spark, root, F.col("k") == 2, use_dvs=True)
    proto0 = dr.delta_snapshot(root, spark).protocol_raw
    assert "deletionVectors" in (proto0.get("writerFeatures") or [])
    dw.delta_add_constraint(spark, root, "kpos", "k > 0")
    proto = dr.delta_snapshot(root, spark).protocol_raw
    assert "checkConstraints" in proto["writerFeatures"]
    assert proto["minReaderVersion"] == proto0["minReaderVersion"]
    with pytest.raises(dw.DeltaConstraintViolation):
        dw.delta_append(spark, root, _mk(spark, [(-3, 1.0)]))
