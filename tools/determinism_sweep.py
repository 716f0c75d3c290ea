"""Partition-order determinism sweep over the query registry.

Round 4's one driver-red row (q09_pca_covariance) was a NONDETERMINISM
bug: a float `sum()` whose reduction order depends on partitioning,
feeding a `round(..., 6)` that can flip its last digit run-to-run.
The driver's gate hashes values EXACTLY, so any query whose output
depends on partition count / scan splits / Arrow batch boundaries is
a latent gate flake even when every fixed-config local run passes.

This sweep runs every registry query under several partitioning
regimes inside one Spark session and EXACT-diffs the canonicalized
outputs (bit-equal floats — no tolerance, same as the driver hash):

- baseline : the session defaults (shuffle=32, AQE on)
- seq      : shuffle.partitions=1, AQE off  — the canonical sequential
             reduction order
- many     : shuffle.partitions=7, AQE off, tiny maxPartitionBytes +
             openCostInBytes=0 (more scan splits), small Arrow batch
             size (different pandas-UDF chunk boundaries)

A query is partition-deterministic iff all regimes produce identical
rows. Seeded samplers (the registry's rows-only entries) are compared
on ROW COUNT only: Spark's Bernoulli sampler is per-partition seeded,
so its exact row set legitimately varies with partitioning — which is
exactly why those entries carry no value-hash oracle.

Usage:
    python tools/determinism_sweep.py [sf_dir] [query ...]
    DETERMINISM_JSON=DETERMINISM_r05.json python tools/determinism_sweep.py
"""

from __future__ import annotations

import math
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from computer_vision_foundations_spark import get_spark
from computer_vision_foundations_spark.queries import oracle_sql, queries
from oracle_check import _canon  # same canonicalization as the gate mimic

# Spark's sampleBy draws per-partition seeded randoms, so its ROW
# COUNT legitimately varies with scan splits — which is exactly why
# the entry is rows-only (no value hash) in the driver gate. It is
# reported, not flagged. (q68_bernoulli_sample left this set in round
# 7: membership is now a pure function of (o_orderkey, seed) — split.py
# id_col path — so it must survive the full exact-diff.)
EXPECTED_PARTITION_DEPENDENT = {
    "q65_sampleby_split",
}

# Conf deltas per regime, applied with spark.conf.set / unset between
# runs (all are runtime-settable session confs read at planning time).
REGIMES: dict[str, dict[str, str]] = {
    "baseline": {},
    "seq": {
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.adaptive.enabled": "false",
    },
    "many": {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.maxPartitionBytes": "262144",
        "spark.sql.files.openCostInBytes": "0",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "97",
    },
}


def _exact_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass  # array-valued cells
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # EXACT — the driver hash has no tolerance
    return a == b


def _diff(base: pd.DataFrame, other: pd.DataFrame) -> str | None:
    if len(base) != len(other):
        return f"row count {len(base)} vs {len(other)}"
    if sorted(base.columns) != sorted(other.columns):
        return f"columns {sorted(base.columns)} vs {sorted(other.columns)}"
    a, b = _canon(base), _canon(other)
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not _exact_equal(x, y):
                return f"col={col} row={i}: {x!r} vs {y!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("determinism_sweep")
    qs, oracles = queries(), oracle_sql()
    saved = {
        k: spark.conf.get(k, None)
        for regime in REGIMES.values()
        for k in regime
    }
    n_flagged = 0
    results: dict[str, dict] = {}
    names = [n for n in qs if not only or n in only]
    for idx, name in enumerate(names):
        rows_only = name not in oracles
        outs: dict[str, pd.DataFrame | str] = {}
        t0 = time.time()
        for regime, conf in REGIMES.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            try:
                outs[regime] = qs[name](spark, sf_dir).toPandas()
            except Exception as e:  # noqa: BLE001 — record and move on
                outs[regime] = f"error: {e}"
            finally:
                for k in conf:
                    if saved[k] is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, saved[k])
        base = outs["baseline"]
        problems = []
        for regime in REGIMES:
            if regime == "baseline":
                continue
            other = outs[regime]
            if isinstance(base, str) or isinstance(other, str):
                if str(base) != str(other):
                    problems.append(f"{regime}: {base if isinstance(base, str) else other}")
                continue
            if rows_only:
                if len(base) != len(other):
                    problems.append(
                        f"{regime}: row count {len(base)} vs {len(other)}"
                    )
                continue
            d = _diff(base, other)
            if d:
                problems.append(f"{regime}: {d}")
        dt = time.time() - t0
        tag = "rows-only " if rows_only else ""
        if problems and name in EXPECTED_PARTITION_DEPENDENT:
            print(
                f"ok    {name}: per-partition-seeded sampler — row-count "
                f"variance expected ({'; '.join(problems)})  "
                f"[{idx + 1}/{len(names)}]"
            )
            results[name] = {
                "deterministic": None,
                "expected_partition_dependent": True,
                "note": "; ".join(problems),
            }
        elif problems:
            n_flagged += 1
            print(f"FLAKY {name}: {'; '.join(problems)}  [{idx + 1}/{len(names)}]")
            results[name] = {"deterministic": False, "err": "; ".join(problems)}
        else:
            print(
                f"ok    {name}: {tag}identical under "
                f"{len(REGIMES)} regimes ({dt:.1f}s)  [{idx + 1}/{len(names)}]"
            )
            results[name] = {
                "deterministic": True,
                "rows_only": rows_only,
                "sec": round(dt, 2),
            }
        sys.stdout.flush()
    print(f"\n{n_flagged} partition-sensitive / {len(names)} queries")
    out_path = os.environ.get("DETERMINISM_JSON")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "regimes": REGIMES,
                    "n_flagged": n_flagged,
                    "n_queries": len(names),
                    "results": results,
                },
                fh,
                indent=1,
            )
        print(f"wrote {out_path}")
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
