"""Filename-grammar parsing for file-based ingest.

Re-expresses the reference's parse stage (`02_Data Ingest.py:93-100`)
as a reusable operator. The grammar is
``<timestamp>_<device_id...>_<label>.<ext>`` where ``device_id`` may
itself contain underscores; the reference extracts fields with a
reverse/split rsplit idiom which we reproduce semantically:

- ``file_name``: last ``/`` segment of ``path``
- ``timestamp``: first ``_`` field, via ``to_timestamp``
- ``date``: calendar date of ``timestamp``
- ``device_id``: everything between the first and last ``_``
- ``label``: the last ``_`` field before the extension, cast to int
  (the reference reverses the string before taking the field, which
  for multi-character labels yields the digits reversed; labels are
  single-digit 0/1 in the reference so the semantics agree — we parse
  the un-reversed digits, which is strictly more correct)

All expressions are native Catalyst column ops (codegen'd, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_parsed_filename(
    df: DataFrame,
    path_col: str = "path",
    ts_format: str | None = None,
) -> DataFrame:
    """Add file_name / timestamp / date / device_id / label columns."""
    file_name = F.element_at(F.split(F.col(path_col), "/"), -1)
    first_field = F.split(F.col("file_name"), "_").getItem(0)
    # try_to_timestamp: an ingest pipeline must not die on one malformed
    # filename (ANSI mode makes to_timestamp throw on bad input).
    ts = (
        F.try_to_timestamp(first_field, F.lit(ts_format))
        if ts_format
        else F.try_to_timestamp(first_field)
    )
    # rsplit('_', 1): drop last field → device_id is the middle section
    no_ext = F.split(F.col("file_name"), "[.]").getItem(0)
    last_field = F.element_at(F.split(no_ext, "_"), -1)
    n_fields = F.size(F.split(F.col("file_name"), "_"))
    device_id = F.when(
        n_fields >= F.lit(3),
        F.array_join(
            F.slice(F.split(F.col("file_name"), "_"), 2, n_fields - F.lit(2)),
            "_",
        ),
    ).otherwise(F.lit(None).cast("string"))

    return (
        df.withColumn("file_name", file_name)
        .withColumn("timestamp", ts)
        .withColumn("date", F.to_date(F.col("timestamp")))
        .withColumn("device_id", device_id)
        .withColumn("label", last_field.try_cast("int"))
    )


def parsed_filename_columns() -> list[str]:
    return ["file_name", "timestamp", "date", "device_id", "label"]
