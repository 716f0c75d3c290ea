"""One-off measurement: the Delta write half at FILE-COUNT scale.

The 100 TB claims in SCALE.md say the log is file-list-sized and
every metadata operation (snapshot resolve, checkpoint, RESTORE) is
driver-side log surgery. This script measures that directly on a
table with thousands of files — the dimension that actually grows at
100 TB (file count), not row count:

    python tools/delta_scale_measure.py [n_files]

Prints one JSON line with wall times and on-disk log sizes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from computer_vision_foundations_spark import get_spark
from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("delta_scale_measure")
    root = tempfile.mkdtemp(prefix="delta_scale_")
    base = (
        spark.range(n_files * 10)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .repartition(n_files)
    )
    out: dict = {"n_files_initial": n_files}

    t = time.time()
    dw.delta_create(spark, root, base)
    out["create_sec"] = round(time.time() - t, 2)

    extra = (
        spark.range(n_files * 10, n_files * 10 + 5000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
        .repartition(500)
    )
    t = time.time()
    v_append = dw.delta_append(spark, root, extra)
    out["append_500_files_sec"] = round(time.time() - t, 2)

    # force a checkpoint at the current version and measure it alone
    t = time.time()
    dw._write_checkpoint(root, spark, v_append)
    out["checkpoint_sec"] = round(time.time() - t, 2)

    # snapshot resolve: cold JSON replay vs checkpoint fast path
    ckpt = next(
        f
        for f in os.listdir(os.path.join(root, "_delta_log"))
        if f.endswith(".checkpoint.parquet")
    )
    t = time.time()
    snap = dr.delta_snapshot(root, spark)
    out["snapshot_resolve_sec"] = round(time.time() - t, 2)
    out["snapshot_files"] = len(snap.files)
    out["snapshot_used_checkpoint"] = snap.checkpoint_version is not None

    t = time.time()
    dw.delta_delete_where(spark, root, F.col("k") % 1000 == 0)
    out["cow_delete_sec"] = round(time.time() - t, 2)

    t = time.time()
    dw.delta_restore(spark, root, v_append)
    out["restore_sec"] = round(time.time() - t, 2)

    log_dir = os.path.join(root, "_delta_log")
    out["log_bytes_total"] = sum(
        os.path.getsize(os.path.join(log_dir, f)) for f in os.listdir(log_dir)
    )
    out["checkpoint_bytes"] = os.path.getsize(os.path.join(log_dir, ckpt))
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
