"""Parquet table loaders for the engine's fixture/test tables.

Mirrors the reference's catalog-scan surface (``spark.table(...)`` over
Delta, SURVEY §2.1 S4) for plain parquet directories: one parquet file
(or directory) per table under a scale-factor dir. At cluster scale the
same API reads partitioned parquet/Delta table roots — the loader is
path-based on purpose so Catalyst's file-source handles partition
pruning and predicate pushdown.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor; used by operators to hint the join planner.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table: ``{sf_dir}/{name}.parquet``.

    The ``events`` table carries TIMESTAMP(NANOS) parquet timestamps,
    which Spark rejects by default; we read them as raw nanos
    (``nanosAsLong``) and rebuild a microsecond timestamp by integer
    division — the same ns→µs truncation DuckDB applies, so both
    engines see identical instants.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register every table as a temp view so ``spark.sql`` works."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def create_database(
    spark: SparkSession,
    name: str,
    location: str | None = None,
    drop_first: bool = False,
) -> None:
    """S5 DDL helper (reference `02_Data Ingest.py:36-37`):
    ``DROP DATABASE … CASCADE`` + ``CREATE DATABASE IF NOT EXISTS …
    LOCATION …``. Identifiers are quoted; location goes through a
    parameterized literal."""
    ident = "`" + name.replace("`", "``") + "`"
    if drop_first:
        spark.sql(f"DROP DATABASE IF EXISTS {ident} CASCADE")
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {ident}{loc}")


def drop_database(spark: SparkSession, name: str, cascade: bool = True) -> None:
    ident = "`" + name.replace("`", "``") + "`"
    spark.sql(f"DROP DATABASE IF EXISTS {ident}{' CASCADE' if cascade else ''}")
