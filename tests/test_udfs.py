"""Image UDF schema conformance (reference `02_Data Ingest.py:191-199,
242-249`) and scoring-operator semantics (U3, `04a_Model
Deployment.py:65-105`)."""

import base64

from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.image import (
    METADATA_SCHEMA,
    STATISTICS_SCHEMA,
    register_image_functions,
    with_image_metadata,
    with_image_metadata_statistics,
    with_image_statistics,
)
from computer_vision_foundations_spark.operators.score import score_with


def _binary_df(spark):
    rows = [(1, b"hello world payload"), (2, b"another synthetic content blob")]
    return spark.createDataFrame(rows, "id int, content binary")


def test_metadata_schema_conformance(spark):
    out = with_image_metadata(_binary_df(spark))
    field = out.schema["metadata"].dataType
    assert field == METADATA_SCHEMA
    assert [f.name for f in field.fields] == [
        "height", "width", "dpi", "layers", "mode", "format", "exif",
    ]
    rows = out.select("metadata.height", "metadata.mode").collect()
    assert all(r.height >= 1 for r in rows)


def test_statistics_schema_and_determinism(spark):
    out = with_image_statistics(_binary_df(spark))
    assert out.schema["statistics"].dataType == STATISTICS_SCHEMA
    a = out.select("statistics").collect()
    b = with_image_statistics(_binary_df(spark)).select("statistics").collect()
    assert a == b  # deterministic fake decode
    s = a[0].statistics
    assert len(s.histogram) == 256
    assert s.entropy >= 0.0


def test_fused_metadata_statistics_matches_separate(spark):
    """The fused single-pass UDF (r13, one Arrow crossing of content)
    must produce exactly the two standalone structs, and its plan must
    contain ONE Python evaluation node — the non-deterministic flag
    exists to stop projection collapse from duplicating it."""
    df = _binary_df(spark)
    sep = with_image_statistics(with_image_metadata(df)).select(
        "id", "metadata", "statistics"
    )
    fused = with_image_metadata_statistics(df).select(
        "id", "metadata", "statistics"
    )
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(
        (r.asDict(True) for r in fused.collect()), key=key
    ) == sorted((r.asDict(True) for r in sep.collect()), key=key)
    plan = fused._sc._jvm.PythonSQLUtils.explainString(
        fused._jdf.queryExecution(), "formatted"
    )
    assert plan.count("ArrowEvalPython (") == 1


def test_sql_registration(spark):
    register_image_functions(spark)
    _binary_df(spark).createOrReplaceTempView("bin_t")
    row = spark.sql(
        "SELECT get_image_statistics(content).entropy AS e FROM bin_t"
    ).collect()[0]
    assert row.e >= 0.0


def test_score_with_binary(spark):
    df = _binary_df(spark)
    scored = score_with(df, lambda pdf: pdf["content"].map(len).astype(float))
    vals = {r.id: r.score for r in scored.collect()}
    assert vals == {1: 19.0, 2: 30.0}


def test_score_with_base64_sniffing(spark):
    payload = base64.b64encode(b"binary bytes").decode()
    df = spark.createDataFrame([(1, payload)], "id int, content string")
    scored = score_with(df, lambda pdf: pdf["content"].map(len).astype(float))
    assert scored.collect()[0].score == float(len(b"binary bytes"))
