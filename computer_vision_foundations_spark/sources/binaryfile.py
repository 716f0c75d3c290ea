"""Binary file sources (batch + streaming).

OSS re-expression of the reference's Auto Loader ingest
(cloudFiles/binaryFile — reference `02_Data Ingest.py:62-76`, reused at
`04a_Model Deployment.py:248-261`): incremental discovery of files
under a prefix, with glob filtering, recursive lookup, and admission
control. ``cloudFiles`` is Databricks-proprietary; Apache Spark's
``binaryFile`` format provides the same record schema

    path: string, modificationTime: timestamp, length: long, content: binary

and ``maxFilesPerTrigger`` replaces byte-based admission
(``cloudFiles.maxBytesPerTrigger`` — reference `02_Data Ingest.py:63,74`).
`files_per_trigger_for_bytes` converts a byte budget to a file count
using the expected payload size (~220 KB/image per reference
`02_Data Ingest.py:80`).

Scale note: at 100 TB the listing itself is the bottleneck; keep
landing dirs date-partitioned (`.../date=YYYY-MM-DD/...`) so each
trigger lists a bounded prefix, and size admission so one micro-batch
fits the cluster (defaultParallelism × budget, as the reference does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BYTES_PER_FILE = 220 * 1024  # reference 02_Data Ingest.py:80
DEFAULT_BYTES_PER_CORE_PER_TRIGGER = 512 * 1024 * 1024  # 02_Data Ingest.py:63

# The binaryFile format has a fixed record schema. Batch reads infer it,
# but Spark's streaming file source requires it to be declared up front.
BINARY_FILE_SCHEMA = (
    "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
)


def files_per_trigger_for_bytes(
    spark: SparkSession,
    bytes_per_core: int = DEFAULT_BYTES_PER_CORE_PER_TRIGGER,
    avg_file_bytes: int = DEFAULT_BYTES_PER_FILE,
) -> int:
    """File-count admission equivalent of the reference's byte cap."""
    parallelism = spark.sparkContext.defaultParallelism
    return max(1, (bytes_per_core * parallelism) // max(1, avg_file_bytes))


def calibrate_files_per_trigger(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.jpg",
    recursive: bool = True,
    bytes_per_core: int = DEFAULT_BYTES_PER_CORE_PER_TRIGGER,
    sample_files: int = 1024,
    safety: float = 1.25,
) -> int:
    """MEASURED byte-based admission: sample the landing zone's actual
    file sizes and convert the byte budget to a file count.

    The static :func:`files_per_trigger_for_bytes` assumes the
    reference's ~220 KB/image; a landing zone of 4 K thumbnails or
    40 MB RAW frames makes that cap off by 100× in either direction —
    this is the other half of Auto Loader's ``maxBytesPerTrigger``
    that a file-count cap alone can't replicate. Sampling reads ONLY
    the ``length`` column of ≤ ``sample_files`` files (binaryFile
    supports column pruning — content bytes are never loaded), so
    calibration is a driver-cheap listing + tiny scan, safe to re-run
    per stream start. ``safety`` > 1 shrinks the admitted count so a
    heavier-than-sampled tail can't blow the per-core budget.

    Returns the static default-based count when the prefix is empty
    (first trigger on a brand-new landing zone).
    """
    from pyspark.sql import functions as F

    sample = (
        read_binary_files(spark, path, glob, recursive)
        .select("length")
        .limit(max(1, sample_files))
    )
    row = sample.agg(F.avg("length").alias("avg_bytes")).collect()[0]
    avg = row["avg_bytes"]
    if avg is None or avg <= 0:
        # empty prefix: no measurement to calibrate with — the static
        # default IS the estimate, so no extra safety factor on top
        return files_per_trigger_for_bytes(spark, bytes_per_core)
    return files_per_trigger_for_bytes(
        spark, bytes_per_core, int(avg * safety)
    )


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.jpg",
    recursive: bool = True,
) -> DataFrame:
    """Batch read of binary files (schema: path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    reader = reader.option("recursiveFileLookup", str(recursive).lower())
    return reader.load(path)


def read_binary_stream(
    spark: SparkSession,
    path: str,
    glob: str | None = "*.jpg",
    recursive: bool = True,
    max_files_per_trigger: int | None = None,
    coalesce_partitions: int | None = None,
    calibrate: bool = False,
) -> DataFrame:
    """Streaming read of binary files with file-count admission control.

    ``coalesce_partitions``: Spark's streaming file source plans ONE
    PARTITION PER FILE per micro-batch, so a small-file landing zone
    makes every downstream task (and every Arrow batch reaching a
    pandas UDF) single-row — measured 3× slower end-to-end on the
    4 KB-file ingest bench. ``coalesce`` merges file splits WITHOUT a
    shuffle (no exchange of the binary payload); pick ~2× cores so
    each task decodes a batch of files. Leave ``None`` for large files
    (≥ tens of MB) where per-file partitions are already right.
    """
    reader = spark.readStream.format("binaryFile").schema(BINARY_FILE_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    reader = reader.option("recursiveFileLookup", str(recursive).lower())
    if max_files_per_trigger is None:
        max_files_per_trigger = (
            calibrate_files_per_trigger(spark, path, glob, recursive)
            if calibrate
            else files_per_trigger_for_bytes(spark)
        )
    reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.load(path)
    if coalesce_partitions is not None:
        df = df.coalesce(coalesce_partitions)
    return df
