"""Generate the committed real-format Delta Lake fixture used by
tests/test_delta_reader.py.

Composes a small partitioned table EXACTLY per the public Delta
protocol (delta.io PROTOCOL.md): 20-digit zero-padded JSON commits
with metaData/protocol/add/remove/commitInfo actions, hive-layout
partition directories whose data files EXCLUDE the partition column,
a parquet checkpoint with struct-per-action columns, and a
``_last_checkpoint`` pointer. Deterministic (fixed timestamps, fixed
rows) so the fixture is stable in git.

Run once from the repo root: python tools/make_delta_fixture.py
Output: tests/fixtures/delta_people/

Table history:
  v0  create: metaData + protocol(1,2), add region=EU/f0, region=US/f1
  v1  append: add region=EU/f2
  v2  overwrite of US: remove region=US/f1, add region=US/f3
      + checkpoint at v2 + _last_checkpoint
  v3  append: add region=EU/f4
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "delta_people",
)
T0 = 1700000000000  # fixed epoch ms; commits are T0 + v*60_000

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "name", "type": "string", "nullable": True, "metadata": {}},
            {"name": "score", "type": "double", "nullable": True, "metadata": {}},
            {"name": "region", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_data(relpath: str, ids, names, scores) -> int:
    """Write one data file (NO partition column — per protocol the
    partition value lives in partitionValues + the hive dir)."""
    p = os.path.join(ROOT, relpath)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tbl = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "score": pa.array(scores, pa.float64()),
        }
    )
    pq.write_table(tbl, p)
    return os.path.getsize(p)


def _add(relpath: str, region: str, size: int, v: int) -> dict:
    return {
        "add": {
            "path": relpath,
            "partitionValues": {"region": region},
            "size": size,
            "modificationTime": T0 + v * 60_000,
            "dataChange": True,
        }
    }


def _commit(v: int, actions: list[dict], operation: str) -> None:
    log = os.path.join(ROOT, "_delta_log")
    os.makedirs(log, exist_ok=True)
    lines = [
        json.dumps(
            {
                "commitInfo": {
                    "timestamp": T0 + v * 60_000,
                    "operation": operation,
                }
            }
        )
    ] + [json.dumps(a) for a in actions]
    with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
        f.write("\n".join(lines) + "\n")


def _checkpoint(v: int, live_adds: list[dict], meta: dict, proto: dict) -> None:
    """Struct-per-action checkpoint parquet (single part)."""
    pv_type = pa.map_(pa.string(), pa.string())
    add_type = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pv_type),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    meta_type = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    proto_type = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    n = len(live_adds) + 2
    adds = [None, None] + [
        {
            "path": a["add"]["path"],
            "partitionValues": list(a["add"]["partitionValues"].items()),
            "size": a["add"]["size"],
            "modificationTime": a["add"]["modificationTime"],
            "dataChange": False,
        }
        for a in live_adds
    ]
    metas = [
        {
            "id": meta["id"],
            "format": {"provider": "parquet"},
            "schemaString": meta["schemaString"],
            "partitionColumns": meta["partitionColumns"],
            "configuration": [],
            "createdTime": T0,
        }
    ] + [None] * (n - 1)
    protos = [None] + [
        {
            "minReaderVersion": proto["minReaderVersion"],
            "minWriterVersion": proto["minWriterVersion"],
        }
    ] + [None] * (n - 2)
    tbl = pa.table(
        {
            "add": pa.array(adds, add_type),
            "metaData": pa.array(metas, meta_type),
            "protocol": pa.array(protos, proto_type),
        }
    )
    log = os.path.join(ROOT, "_delta_log")
    pq.write_table(tbl, os.path.join(log, f"{v:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v, "size": n}, f)


def main() -> None:
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(ROOT)
    meta = {
        "id": "11111111-2222-3333-4444-555555555555",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": SCHEMA_STRING,
        "partitionColumns": ["region"],
        "configuration": {},
        "createdTime": T0,
    }
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}

    f0 = "region=EU/part-00000-f0.parquet"
    f1 = "region=US/part-00000-f1.parquet"
    f2 = "region=EU/part-00000-f2.parquet"
    f3 = "region=US/part-00000-f3.parquet"
    f4 = "region=EU/part-00000-f4.parquet"
    s0 = _write_data(f0, [1, 2], ["ada", "bo"], [1.5, 2.5])
    s1 = _write_data(f1, [3], ["cy"], [3.5])
    s2 = _write_data(f2, [4, 5], ["dee", "eve"], [4.5, 5.5])
    s3 = _write_data(f3, [30, 31], ["cy2", "dan"], [3.75, 6.5])
    s4 = _write_data(f4, [6], ["fay"], [7.5])

    _commit(
        0,
        [{"metaData": meta}, {"protocol": proto},
         _add(f0, "EU", s0, 0), _add(f1, "US", s1, 0)],
        "WRITE",
    )
    _commit(1, [_add(f2, "EU", s2, 1)], "WRITE")
    _commit(
        2,
        [
            {
                "remove": {
                    "path": f1,
                    "deletionTimestamp": T0 + 2 * 60_000,
                    "dataChange": True,
                }
            },
            _add(f3, "US", s3, 2),
        ],
        "OVERWRITE",
    )
    live_at_2 = [_add(f0, "EU", s0, 0), _add(f2, "EU", s2, 1), _add(f3, "US", s3, 2)]
    _checkpoint(2, live_at_2, meta, proto)
    _commit(3, [_add(f4, "EU", s4, 3)], "WRITE")
    print(f"wrote fixture at {ROOT}")


if __name__ == "__main__":
    main()
