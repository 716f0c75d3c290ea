"""Build LINEAGE.json: the suffix-keyed rename history of every
registry query.

The registry rotates operators through the q01-q50 driver window by
pairwise number swaps that PRESERVE each query's suffix (the part
after the q/z/za number prefix) — the suffix is the stable lineage
id. Historical artifacts (CORRECTNESS_r*.json, LOCAL_GATE_*.json,
BENCH_r*.json per-query maps) are keyed by the registry key of their
round, so joining a query's history across rounds requires the
suffix -> per-artifact key map. This tool derives it mechanically
from the artifacts themselves (no hand-maintained table to go
stale) and writes LINEAGE.json:

    {"<suffix>": {"current": "<key in today's registry>",
                  "history": {"<artifact file>": "<key>", ...}}}

Known suffix collisions (two live queries share a suffix, so their
lineage rows interleave; both are DELIBERATE operator pairs, never
renames of each other): ``sessionization`` (q44 operator-level vs q82
relational-window twin) and ``zipf_fit`` (z45 = `operators/vocab.py`'s
top-50 fit vs za52 = `operators/zipf.py`'s top-256 fit, which rotated
through q11 in round 8). Adjudicate those two by key, not suffix.

Run from the repo root: python tools/lineage_map.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_PREFIX = re.compile(r"^(q\d+|za\d+|z\d+)_")


def _suffix(key: str) -> str:
    return _PREFIX.sub("", key)


def _keys_in(path: str) -> list[str]:
    with open(path) as f:
        doc = json.load(f)
    if "results" in doc and isinstance(doc["results"], dict):  # LOCAL_GATE
        return list(doc["results"])
    if "queries" in doc and isinstance(doc["queries"], dict):  # BENCH
        return list(doc["queries"])
    if isinstance(doc, dict):  # CORRECTNESS: top-level query keys
        return [k for k in doc if _PREFIX.match(k)]
    return []


def build(repo: str) -> dict:
    artifacts = sorted(
        glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
        + glob.glob(os.path.join(repo, "LOCAL_GATE_*.json"))
    )
    lineage: dict[str, dict] = {}
    for path in artifacts:
        name = os.path.basename(path)
        try:
            keys = _keys_in(path)
        except (json.JSONDecodeError, OSError):
            continue
        for key in keys:
            ent = lineage.setdefault(_suffix(key), {"history": {}})
            ent["history"][name] = key
    # today's registry is authoritative for "current"
    sys.path.insert(0, repo)
    from computer_vision_foundations_spark.queries import queries

    for key in queries():
        lineage.setdefault(_suffix(key), {"history": {}})["current"] = key
    # a suffix with no current key was renamed away entirely (none
    # today) or belongs to a retired artifact; keep it for the record
    return dict(sorted(lineage.items()))


if __name__ == "__main__":
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(repo, "LINEAGE.json")
    lineage = build(repo)
    with open(out, "w") as f:
        json.dump(lineage, f, indent=1, sort_keys=True)
    n_renamed = sum(
        1
        for v in lineage.values()
        if len({*v["history"].values(), *([v["current"]] if "current" in v else [])}) > 1
    )
    print(f"{out}: {len(lineage)} suffixes, {n_renamed} with >1 key across rounds")
