"""Spark-only graph-family measurements at 25x sf0.1 (round-9
verdict #6's second half): the DIFFERENTIAL graph sweep runs where
the oracle engine can follow (tools/scale_sweep.py documents the
per-query bases); this tool runs the ENGINE side alone at the full
25x sf0.1 replica scale and records the numbers the 100 TB design
claims rest on — edge/sym/node cardinalities (= per-round shuffle
rows for the iterative operators) and wall times.

Usage: python tools/graph_scale_measure.py [--replicas 25]
       [--base /root/testdata/sf0.1] [--skip q41_lpa_communities,...]

Prints one JSON line per measurement; paste the table into SCALE.md.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=25)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = {s for s in args.skip.split(",") if s}

    from pyspark.sql import functions as F

    from computer_vision_foundations_spark import get_spark
    from computer_vision_foundations_spark.queries import queries

    spark = get_spark("graph_scale_measure")
    # pair-expansion stages must stay wide (the round-8 AQE
    # coalescing trap: stage width sized by tiny MAP-side stats while
    # the join OUTPUT is the x(replicas^2) product)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    scaled = tempfile.mkdtemp(prefix="graph_measure_")
    qs = queries()
    try:
        build_scaled_dir(args.base, scaled, args.replicas)
        print(
            f"# scaled dir {scaled} ({args.replicas}x {args.base})",
            file=sys.stderr,
        )
        # shared edge-set cardinalities (per-round shuffle rows for
        # LPA = |sym| vote rows; kcore/triangles run on the QUOTIENT)
        if "edges" not in skip:
            t0 = time.time()
            pairs = qs["za63_simhash_near_dup_pairs"](spark, scaled)
            n_pairs = pairs.count()
            n_nodes = (
                pairs.select(F.col("id_a").alias("n"))
                .unionAll(pairs.select(F.col("id_b").alias("n")))
                .distinct()
                .count()
            )
            print(
                json.dumps(
                    {
                        "measure": "document_pair_graph",
                        "pairs": n_pairs,
                        "sym_rows": 2 * n_pairs,
                        "nodes": n_nodes,
                        "sec": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )
        for name in (
            "za56_pagerank",
            "za73_triangle_stats",
            "q42_kcore_members",
            "q41_lpa_communities",
        ):
            if name in skip:
                continue
            t0 = time.time()
            n = qs[name](spark, scaled).count()
            print(
                json.dumps(
                    {
                        "measure": name,
                        "rows": n,
                        "sec": round(time.time() - t0, 1),
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
