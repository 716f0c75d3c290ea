"""Local differential check: Spark queries vs DuckDB oracles.

Mimics the driver's correctness gate so failures surface before a
round ends: for every entry in ``queries()`` with an ``oracle_sql()``
twin, run both at the given scale factor and compare row count, sorted
column names, and values (rows sorted by all columns; floats compared BIT-EXACTLY —
sign of zero included — to mirror the driver's byte-level value hash).

Usage: python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import struct
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from computer_vision_foundations_spark import get_spark
from computer_vision_foundations_spark.queries import oracle_sql, queries
from computer_vision_foundations_spark.sources.tables import TABLE_NAMES


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        # scalar NaT/NA from nullable datetime/int columns (left joins)
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass  # array-valued cells: fall through to ==
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # BIT-EXACT, mirroring the driver's byte-level value hash: under
        # plain == a -0.0/+0.0 difference passes locally but fails the
        # driver (the r5/r6 q09 red). struct.pack exposes the sign bit.
        return struct.pack("<d", a) == struct.pack("<d", b)
    return a == b


def _dtype_kind(s: pd.Series) -> str:
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(duck_df):
        problems.append(f"row count {len(spark_df)} vs {len(duck_df)}")
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns {sorted(spark_df.columns)} vs {sorted(duck_df.columns)}"
        )
        return problems
    # The driver's gate hashes values type-sensitively: an int64 vs
    # float64 (e.g. DuckDB HUGEINT) mismatch fails there even when the
    # values are numerically identical — so fail it here too, before
    # canonicalization can mask it.
    for c in spark_df.columns:
        ka, kb = _dtype_kind(spark_df[c]), _dtype_kind(duck_df[c])
        if ka != kb and not (spark_df[c].isna().all() or duck_df[c].isna().all()):
            problems.append(f"dtype kind mismatch col={c}: spark {ka} vs oracle {kb}")
    if problems:
        return problems
    a, b = _canon(spark_df), _canon(duck_df)
    if len(a) == len(b):
        exact_mismatch = 0
        first = None
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            for i, (x, y) in enumerate(zip(av, bv)):
                if not _values_equal(x, y):
                    exact_mismatch += 1
                    if first is None:
                        first = f"col={col} row={i}: {x!r} vs {y!r}"
        if exact_mismatch:
            problems.append(f"{exact_mismatch} value mismatches; first: {first}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check")
    con = _duck_con(sf_dir)
    qs, oracles = queries(), oracle_sql()
    n_fail = 0
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"match": False, "err": f"spark error: {e}"}
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s)")
            if len(sdf) == 0:
                print(f"WARN {name}: 0 rows")
            results[name] = {
                "match": None, "rows": len(sdf), "err": "no_oracle",
            }
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"match": False, "err": f"duckdb error: {e}"}
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
            results[name] = {
                "match": False, "rows": len(sdf), "err": "; ".join(problems),
            }
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({t_spark:.1f}s)")
            results[name] = {
                "match": True,
                "rows": len(sdf),
                "sec": round(t_spark, 2),
                "err": None,
            }
    print(f"\n{n_fail} failures / {len(only) or len(qs)} queries")
    # Optional artifact (e.g. LOCAL_GATE_r{N}.json): full-registry
    # evidence for queries outside the driver's 50-row window.
    out_path = os.environ.get("ORACLE_CHECK_JSON")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump(
                {"sf_dir": sf_dir, "n_fail": n_fail, "results": results},
                fh,
                indent=1,
            )
        print(f"wrote {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
