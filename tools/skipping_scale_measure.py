"""Measure stats-based data skipping at multi-million-row scale:
a 20M-row two-dimensional table (independent uniform columns a, b),
Z-ordered into ~64 files, then a selective two-sided read three ways:

- pruned   : ``read_delta(where=...)`` — file-level skipping from the
             per-file stats in the log, THEN Spark's row-group pushdown
- unpruned : ``read_delta().filter(...)`` — same parquet pushdown but
             every live file is planned and its footer opened
- linear   : the same predicate against the PRE-zorder layout (range-
             clustered on ``a`` only), pruned — shows what Z-ordering
             adds on the non-clustered column

What it verifies/records:
- identical aggregates from all three paths (soundness end-to-end);
- files kept / total for the pruned paths (the skipping ratio the
  per-file bounds achieve on a predicate over BOTH dimensions);
- wall time per path — at 100 TB the pruned path's advantage is the
  object-store listing + footer fetches that never happen; even on
  local NVMe the plan-time pruning shows up;
- driver-side cost of carrying stats: snapshot resolve time and the
  total bytes of stats JSON held (file-count-sized, NOT data-sized).

Run from the repo root:  python tools/skipping_scale_measure.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from computer_vision_foundations_spark import get_spark  # noqa: E402
from computer_vision_foundations_spark.sources import (  # noqa: E402
    delta_reader as dr,
    delta_writer as dw,
    skipping,
)

N = 20_000_000
WHERE_2D = "a BETWEEN 4000 AND 4400 AND b BETWEEN 10000 AND 11000"
WHERE_B = "b BETWEEN 10000 AND 11000"  # the NON-clustered dimension


def main() -> int:
    spark = get_spark("skipping_scale")
    out: dict = {"n_rows": N, "where_2d": WHERE_2D, "where_b": WHERE_B}

    df = spark.range(N).select(
        (F.col("id") % 44497).alias("a"),
        ((F.col("id") * 7919) % 86243).alias("b"),
        F.col("id").alias("payload"),
    )

    def timed_agg(make_frame, reps=3):
        best, vals = None, None
        for _ in range(reps):
            t = time.time()
            row = make_frame().agg(
                F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
            ).collect()[0]
            dt = time.time() - t
            best = dt if best is None else min(best, dt)
            vals = (row["n"], row["s"])
        return round(best, 3), vals

    root = tempfile.mkdtemp(prefix="skip_scale_")
    try:
        t0 = time.time()
        dw.delta_create(spark, root, df.repartitionByRange(64, "a"))
        out["create_sec"] = round(time.time() - t0, 2)

        snap = dr.delta_snapshot(root, spark)
        out["linear_files"] = len(snap.files)
        out["linear_kept_2d"] = len(skipping.matching_files(snap, WHERE_2D))
        out["linear_kept_b"] = len(skipping.matching_files(snap, WHERE_B))
        out["linear_pruned_2d_sec"], lin2d = timed_agg(
            lambda: dr.read_delta(spark, root, where=WHERE_2D)
        )
        out["linear_pruned_b_sec"], linb = timed_agg(
            lambda: dr.read_delta(spark, root, where=WHERE_B)
        )

        t0 = time.time()
        dw.delta_optimize(
            spark,
            root,
            target_file_bytes=max(
                1 * 1024 * 1024,
                sum(
                    os.path.getsize(os.path.join(root, rel))
                    for rel in snap.files
                )
                // 64,
            ),
            zorder_by=["a", "b"],
        )
        out["zorder_sec"] = round(time.time() - t0, 2)

        t0 = time.time()
        zsnap = dr.delta_snapshot(root, spark)
        out["snapshot_resolve_sec"] = round(time.time() - t0, 3)
        out["zorder_files"] = len(zsnap.files)
        out["stats_bytes_driver"] = sum(
            len(s) for s in (zsnap.stats or {}).values() if s
        )
        out["zorder_kept_2d"] = len(skipping.matching_files(zsnap, WHERE_2D))
        out["zorder_kept_b"] = len(skipping.matching_files(zsnap, WHERE_B))

        out["zorder_pruned_2d_sec"], z2d = timed_agg(
            lambda: dr.read_delta(spark, root, where=WHERE_2D)
        )
        out["zorder_pruned_b_sec"], zb = timed_agg(
            lambda: dr.read_delta(spark, root, where=WHERE_B)
        )
        out["zorder_unpruned_2d_sec"], u2d = timed_agg(
            lambda: dr.read_delta(spark, root).filter(WHERE_2D)
        )

        assert lin2d == z2d == u2d, (lin2d, z2d, u2d)
        assert linb == zb, (linb, zb)
        out["values_match"] = True
        out["agg_2d"] = {"n": z2d[0], "sum_payload": z2d[1]}
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
