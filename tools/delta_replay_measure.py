"""One-off measurement: Delta READER snapshot reconstruction vs
checkpoint interval at commit-count scale (round-9 verdict #7 — the
read-side twin of delta_scale_measure.py's write-side numbers).

A long-lived streaming table accretes tens of thousands of commits;
what keeps snapshot resolution O(tail) instead of O(history) is the
checkpoint. This synthesizes a ``_delta_log`` with N single-file
commits (driver-side JSON writes — no data files needed; the reader
resolves snapshots from the log alone), then measures:

- cold resolve with NO checkpoint (full N-commit JSON replay), and
- resolve with a checkpoint at the largest multiple of each interval
  I in {1000, 100, 10}: parquet checkpoint read + (N-1) mod I JSON
  tail replay,

plus the one-time cost of WRITING each checkpoint. Prints one JSON
line; the table in SCALE.md is generated from it.

    python tools/delta_replay_measure.py [n_commits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from computer_vision_foundations_spark import get_spark
from computer_vision_foundations_spark.sources import delta_reader as dr
from computer_vision_foundations_spark.sources import delta_writer as dw


def _synthesize_log(root: str, n_commits: int, adds_per_commit: int = 1) -> None:
    log = os.path.join(root, "_delta_log")
    os.makedirs(log, exist_ok=True)
    meta = {
        "id": "00000000-0000-0000-0000-00000000cafe",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "k",
                        "type": "long",
                        "nullable": True,
                        "metadata": {},
                    }
                ],
            }
        ),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 0,
    }
    for v in range(n_commits):
        lines = [
            json.dumps(
                {"commitInfo": {"timestamp": v, "operation": "WRITE"}}
            )
        ]
        if v == 0:
            lines.append(json.dumps({"metaData": meta}))
            lines.append(
                json.dumps(
                    {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
                )
            )
        for j in range(adds_per_commit):
            lines.append(
                json.dumps(
                    {
                        "add": {
                            "path": f"part-{v:05d}-{j:03d}.parquet",
                            "partitionValues": {},
                            "size": 4096,
                            "modificationTime": v,
                            "dataChange": True,
                            "stats": json.dumps({"numRecords": 10}),
                        }
                    }
                )
            )
        with open(os.path.join(log, f"{v:020d}.json"), "w") as fh:
            fh.write("\n".join(lines) + "\n")


def _resolve_time(root, spark, expect_files: int) -> float:
    t = time.time()
    snap = dr.delta_snapshot(root, spark)
    dt = time.time() - t
    assert len(snap.files) == expect_files, (len(snap.files), expect_files)
    return dt


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    apc = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("delta_replay_measure")
    root = tempfile.mkdtemp(prefix="delta_replay_")
    out: dict = {"n_commits": n, "adds_per_commit": apc}

    t = time.time()
    _synthesize_log(root, n, apc)
    out["synthesize_log_sec"] = round(time.time() - t, 2)
    log = os.path.join(root, "_delta_log")
    out["log_json_bytes"] = sum(
        os.path.getsize(os.path.join(log, f))
        for f in os.listdir(log)
        if f.endswith(".json")
    )

    # cold full-history replay (no checkpoint anywhere)
    out["resolve_no_checkpoint_sec"] = round(
        _resolve_time(root, spark, n * apc), 2
    )

    head = n - 1
    for interval in (1000, 100, 10):
        v_ck = (head // interval) * interval
        t = time.time()
        dw._write_checkpoint(root, spark, v_ck)
        w = time.time() - t
        r = _resolve_time(root, spark, n * apc)
        out[f"interval_{interval}"] = {
            "checkpoint_version": v_ck,
            "tail_commits_replayed": head - v_ck,
            "checkpoint_write_sec": round(w, 2),
            "resolve_sec": round(r, 3),
        }
    ckpts = [f for f in os.listdir(log) if f.endswith(".checkpoint.parquet")]
    out["checkpoint_bytes_at_head"] = max(
        os.path.getsize(os.path.join(log, f)) for f in ckpts
    )
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
