"""Query registry: every implemented operator as (PySpark impl, DuckDB oracle).

This is the engine's differential-test surface (SURVEY §5): each entry
pairs a DataFrame pipeline built from the package's operators with an
ANSI-SQL equivalent the driver runs on DuckDB over the same parquet
tables. Column names and types are aligned on both sides; floating
aggregates are rounded identically so order-insensitive value hashes
match across engines.

Conventions:
- every callable takes ``(spark, sf_dir)`` and returns a DataFrame
- every computed column is aliased identically in Spark and SQL
- sums rounded to 2, averages to 4, ratios/similarities to 6 digits
- deterministic total order is never required (driver hash is
  order-insensitive) but ties in top-k/rank are always broken by id
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.filename import with_parsed_filename
from computer_vision_foundations_spark.functions.text import (
    STOPWORDS,
    language_score_columns,
    quality_columns,
)
from computer_vision_foundations_spark.operators.parallelism import (
    widen_if_under_parallel,
)
from computer_vision_foundations_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_from_hashes,
)
from computer_vision_foundations_spark.operators.score import score_with
from computer_vision_foundations_spark.operators.similarity import brute_force_knn
from computer_vision_foundations_spark.operators.split import (
    deterministic_split,
    train_test_split,
)
from computer_vision_foundations_spark.sources.tables import load_table
from computer_vision_foundations_spark.streaming.windows import (
    sessionized,
    tumbling_counts,
)

QuerySpec = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QuerySpec] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, sql: str | None = None):
    def deco(fn: QuerySpec) -> QuerySpec:
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, QuerySpec]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def ts_chunks(df: DataFrame, cuts: list[str], ts_col: str = "ts") -> list[DataFrame]:
    """Split ``df`` into ``len(cuts)+1`` time-ordered slices by
    PLAN-LITERAL timestamp cuts (pushed filters — never a global
    ntile window). Shared by every streaming-differential harness
    that replays a table as ordered micro-batches. Empty ``cuts``
    returns the single full-range chunk; unsorted cuts would
    silently produce empty/overlapping slices, so they fail fast."""
    if not cuts:
        return [df]
    if cuts != sorted(cuts):
        raise ValueError(
            f"ts_chunks: cuts must be ascending, got {cuts!r} — "
            "unsorted cuts silently produce empty/overlapping slices"
        )
    bounds = (
        [(None, cuts[0])]
        + list(zip(cuts, cuts[1:]))
        + [(cuts[-1], None)]
    )
    out = []
    for lo, hi in bounds:
        c = df
        if lo is not None:
            c = c.where(F.col(ts_col) >= F.lit(lo).cast("timestamp"))
        if hi is not None:
            c = c.where(F.col(ts_col) < F.lit(hi).cast("timestamp"))
        out.append(c)
    return out


def stage_time_ordered_chunks(chunks: list[DataFrame], prefix: str) -> str:
    """Write each chunk DataFrame as ONE parquet file into a fresh
    landing dir with strictly increasing mtimes, so the file stream
    source's oldest-first order — and therefore micro-batch delivery
    order — is deterministic. Returns the landing dir; the scratch
    staging dir is removed. One definition for all six streaming
    differentials (the harness contract lives here, not in six
    drifting copies)."""
    import os
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix=f"{prefix}_stage_")
    landing = tempfile.mkdtemp(prefix=f"{prefix}_landing_")
    for i, chunk in enumerate(chunks, start=1):
        d = os.path.join(stage, str(i))
        chunk.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(
            f for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        )
        dst = os.path.join(landing, f"chunk-{i}.parquet")
        shutil.copy(os.path.join(d, part), dst)
        os.utime(dst, (1_000_000 * i, 1_000_000 * i))
    shutil.rmtree(stage, ignore_errors=True)
    return landing
