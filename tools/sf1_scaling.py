"""sf0.1 → sf1 (10×) scaling curves for the slowest headline queries
(round-10 verdict ask #6 — generalizes the 25× graph sweep to the
whole top-10).

Derives an sf1-equivalent dataset from the PROVIDED sf0.1 fixtures via
`tools/scale_sweep.build_scaled_dir` (10 tagged replicas of the real
tables — replicated documents are NEAR-dups of their original, orders
keep o_custkey so customers become 10×-degree hubs: the stress shape,
not the kind one), times each query at both scales on the same session
(min over N samples, cache cleared between), and prints a ratio table.
A ratio is judged against the query's EXPECTED growth, not a flat 10×:
pair-forming queries over near-dup replicas legitimately grow
super-linearly in CANDIDATES (each replica family forms ~R²/2 pairs
that simply don't exist at R=1), so the table carries the expectation
class alongside the measured ratio and the verdict flags only
UNEXPECTED super-linearity (> GROWTH_SLACK × expectation).

Usage: python tools/sf1_scaling.py [--replicas 10] [--samples 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scale_sweep import build_scaled_dir  # noqa: E402

# (query, expectation class) — "linear": work ~ rows; "pairs":
# candidate/pair formation grows with replica near-dup density, so a
# clean engine still exceeds 10×; "rounds": iterative graph/merge ops
# whose per-round cost is linear but whose round count may grow with
# graph diameter / vocabulary shape.
TOP10 = [
    ("za59_training_corpus", "pairs"),
    ("q97_bpe_merges", "rounds"),
    ("z46_multimodal_consensus_pairs", "pairs"),
    ("za56_pagerank", "rounds"),
    ("za51_hits_scores", "rounds"),
    ("za68_cdc_dedup", "linear"),
    ("za65_duplicated_spans", "pairs"),
    ("q47_kcenter_coreset", "rounds"),
    ("z58_phrase_search", "linear"),
    ("z82_mutual_knn", "pairs"),
]
# q41_lpa_communities / za73_triangle_stats / q42_kcore_members are
# DELIBERATELY absent: they run on the near-dup PAIR graph, whose 25×
# sweep (tools/graph_scale_measure.py, SCALE.md round-9: 1.69 B sym
# rows; LPA 1,604.8 s raw vs ≤90 s for the quotient-collapsed ops)
# is already a deeper scale measurement than a 10× replica would add
# — re-timing them here would only re-pay that documented cost.
# flag only when the measured ratio exceeds expectation × slack;
# expectation: linear 10×, rounds 10× (round count should NOT grow
# with replication — replicas are disconnected/parallel structure),
# pairs 10× in rows but pair density adds a data-driven factor the
# sweep's density table (tools/scale_sweep.py) accounts for — flag
# pairs only past 30×.
GROWTH_SLACK = {"linear": 12.0, "rounds": 15.0, "pairs": 30.0}


def time_query(qs, spark, name: str, sf_dir: str, samples: int) -> float:
    best = None
    for _ in range(max(1, samples)):
        t0 = time.time()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument(
        "--scaled-dir",
        default=None,
        help="reuse an existing replica dir instead of building (kept)",
    )
    args = ap.parse_args()

    from computer_vision_foundations_spark import get_spark
    from computer_vision_foundations_spark.queries import queries

    todo = [
        (n, dict(TOP10).get(n, "linear"))
        for n in (args.queries or [n for n, _ in TOP10])
    ]
    keep = args.scaled_dir is not None
    if keep:
        scaled = args.scaled_dir
    else:
        scaled = tempfile.mkdtemp(prefix=f"sf1_x{args.replicas}_")
        print(
            f"# building {args.replicas}x replica dir at {scaled}",
            file=sys.stderr,
        )
        build_scaled_dir(args.base, scaled, args.replicas)
    spark = get_spark("sf1_scaling")
    qs = queries()
    rows = []
    try:
        for name, klass in todo:
            base_s = time_query(qs, spark, name, args.base, args.samples)
            big_s = time_query(qs, spark, name, scaled, args.samples)
            ratio = big_s / max(base_s, 1e-9)
            flagged = ratio > GROWTH_SLACK[klass]
            rows.append(
                {
                    "query": name,
                    "class": klass,
                    "sf0.1_sec": round(base_s, 2),
                    f"x{args.replicas}_sec": round(big_s, 2),
                    "ratio": round(ratio, 1),
                    "flag": flagged,
                }
            )
            print(
                f"# {name} [{klass}]: {base_s:.2f}s -> {big_s:.2f}s "
                f"(x{ratio:.1f}){' FLAG' if flagged else ''}",
                file=sys.stderr,
            )
    finally:
        if not keep:
            shutil.rmtree(scaled, ignore_errors=True)
    print(json.dumps({"replicas": args.replicas, "rows": rows}, indent=1))
    return 1 if any(r["flag"] for r in rows) else 0


if __name__ == "__main__":
    raise SystemExit(main())
