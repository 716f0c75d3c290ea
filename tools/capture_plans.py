"""Capture .explain("formatted") for named registry queries.

Usage:
    python tools/capture_plans.py <out_dir> <suffix> q41_lpa_communities ...

Writes <out_dir>/<query>_<suffix>.txt for each query. The plan is the
formatted physical plan of the DataFrame the registry returns (AQE
initial plan — the committed evidence class for plan-shape claims;
iterative operators that materialize eagerly during construction are
captured as the plan of their RETURNED frame, which is what the noop
sink executes).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from computer_vision_foundations_spark import get_spark
from computer_vision_foundations_spark.queries import queries

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    qs = queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            df = qs[name](spark, SF_DIR)
            txt = plan_text(df)
        except Exception as e:  # noqa: BLE001 - record the failure
            txt = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
