"""Filename-grammar parse (reference `02_Data Ingest.py:93-100`)."""

import datetime

from computer_vision_foundations_spark.functions.filename import with_parsed_filename


def test_parse_basic(spark):
    df = spark.createDataFrame(
        [("/landing/2024-05-01 10:30:00_camera_front_1.jpg",)], ["path"]
    )
    row = with_parsed_filename(df).collect()[0]
    assert row.file_name == "2024-05-01 10:30:00_camera_front_1.jpg"
    assert row.timestamp == datetime.datetime(2024, 5, 1, 10, 30)
    assert row.date == datetime.date(2024, 5, 1)
    assert row.device_id == "camera_front"  # underscores inside device id survive
    assert row.label == 1


def test_parse_simple_device(spark):
    df = spark.createDataFrame([("/x/2024-01-02_dev7_0.png",)], ["path"])
    row = with_parsed_filename(df).collect()[0]
    assert row.device_id == "dev7"
    assert row.label == 0
    assert row.date == datetime.date(2024, 1, 2)


def test_parse_unparseable_label(spark):
    df = spark.createDataFrame([("/x/nodate_dev.jpg",)], ["path"])
    row = with_parsed_filename(df).collect()[0]
    assert row.timestamp is None
    assert row.label is None
