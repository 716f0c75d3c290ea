"""Scaled differential sweep: the behavior sf0.1 cannot prove.

Round-3 verdict ask: candidate-pair DENSITY grows super-linearly with
corpus size, and that is the one scale behavior a fixed-SF gate never
exercises. This tool derives a ~sf0.5-equivalent dataset from the
PROVIDED sf0.1 fixtures (no synthetic data generation — each scaled
table is R=5 tagged replicas of the real one):

- ``documents``: replica k offsets ``doc_id`` by k·10_000 and appends
  a replica token ``rk<k>`` to the text — so replicas are NEAR-dups of
  their original (the realistic recrawl shape that stresses every pair
  generator) but not byte-exact dups.
- ``embeddings``: replica k offsets ``vec_id``; vectors unchanged
  (exact-tie stress for the ANN tie-breaks).
- ``events``: replica k offsets ``event_id`` and ``user_id``; the time
  axis is unchanged, so per-window densities grow 5x.
- everything else: copied through unchanged.

Then it runs the heavy pair/ANN/dedup queries through the SAME
differential harness as the driver gate (tools/oracle_check.py) at
both sf0.1 and the scaled dir, and prints a pair-density growth table.
Differential at scale: if a cap, a tie-break, or an overflow behaves
differently at 25k docs than at 5k, Spark and DuckDB disagree and the
sweep fails.

Usage: python tools/scale_sweep.py [--replicas 5] [--base /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from computer_vision_foundations_spark.sources.tables import TABLE_NAMES

# Heavy pair generators, ANN families, dedup + the flagship composition.
SWEEP_QUERIES = [
    "q83_dedup_exact",
    "q90_ngram_jaccard_pairs",
    "za23_lsh_candidate_pairs",
    "za63_simhash_near_dup_pairs",
    "z57_winnow_near_dup_pairs",
    "za16_lsh_verified_pairs",
    "q94_dedup_clusters",
    "q91_embedding_near_dup",
    "za67_incremental_lsh",
    "za12_incremental_dedup",
    "za27_decontamination_pairs",
    "za10_bloom_decontaminate",
    "za24_knn_cosine",
    "z29_lsh_ann",
    "z32_multiprobe_lsh_ann",
    "q89_ivf_ann",
    "z26_pq_adc_knn",
    "za64_ivf_pq_ann",
    "z22_sq8_ann",
    "za30_unigram_surprisal",
    "za59_training_corpus",
    "q82_sessionization",
    "q86_time_rollup",
    # round-4 additions: the media codecs are byte-linear (replicated
    # text grows their work 5x with zero pair formation — the sweep
    # proves the codecs stay exact on 5x the documents), the rerank
    # composes two oracled stages, and the profiler counts must grow
    # exactly as the replication predicts.
    "za69_wav_audio_stats",
    "za70_gif_frame_sample",
    "za42_multimodal_manifest",
    "z27_pq_rerank",
    "z25_table_profile",
    # second round-4 wave: the paragraph/audio/image pair generators
    # (near-dup replicas multiply shared paragraphs and fingerprints —
    # the density stress the caps exist for), the sketch overlaps
    # (5x replicas shift every per-source estimate), the
    # window-ordered selection ops, and the composed curation DAG.
    "z34_paragraph_dedup",
    "z35_scene_cuts",
    "z36_audio_fingerprint_pairs",
    "z37_kmv_source_overlap",
    "z38_token_budget_select",
    "z40_curation_pipeline",
    "z41_hard_negatives",
    "z42_label_noise",
    "z43_image_augment",
    # fifth/sixth/seventh round-4 waves: the keyed statistics run over
    # 5x-densified event streams (every per-hour window holds 5x the
    # rows; percentile/rank/window algebra must agree at the new
    # densities), the token-stream indices see 5x documents, and the
    # isolation/cluster scorers scan 5x embeddings with exact-replica
    # ties. z51/z57/z61 are deliberately absent: their DIFFERENTIAL
    # twins are output-bound (naive per-node triangles / peeling /
    # unblocked quadratic ε-join) and blow up in the oracle engine at
    # the 39M-edge 5x pair graph — the Spark side's scale behavior is
    # exactly what the quotient/BLAS designs fix, verified by
    # randomized parity tests + the 1x differential gate.
    "z67_mad_outliers",
    "z68_ewma_level",
    "z71_source_diversity",
    "z72_trend_spearman",
    "z75_cusum_changepoint",
    "z76_kaplan_meier",
    "z77_silhouette",
    "z79_isolation_scores",
    # closing waves: the incremental-merge-vs-recompute statement at
    # 5x density, the concentration pair over 5x parts, the scenario
    # value iteration over 5x-denser journeys, and the KDE kernel
    # sums. za03's quadratic haversine oracle is excluded for the
    # same output-bound reason as z51/z57/z61.
    "z88_incremental_agg",
    "z93_pareto_abc",
    "z94_gini_revenue",
    "za01_markov_attribution",
    "za04_kde_density",
    # round-9 wave: the ITERATIVE GRAPH family (round-9 verdict #6).
    # Replication gives each graph its skew mode: the trade graph
    # keeps o_custkey UNCHANGED across replicas, so every customer
    # node's in-degree grows ×replicas (hub stress for pagerank's
    # dangling/degree paths); the document graphs grow ×replicas²
    # pair density inside each near-dup family (hot label / degree
    # classes for LPA, k-core peeling, and triangle closure — the
    # class that caught simhash's hot-reducer in round 8).
    # Oracle-engine feasibility bounds the DIFFERENTIAL base (the
    # harness's driver-collect/unrolled-CTE ceiling, not the
    # engine's): q07 runs at --base sf0.1 — but only AFTER round 9
    # materialized its oracle's CTEs (the inlined form re-expanded
    # the edge pipeline 2^rounds times and blew DuckDB's 100 GiB
    # budget; the sweep caught it). q41/q42 run at --base sf0.01
    # (the LPA/peel oracles materialize the ×replicas² sym table
    # per round); q40 at --base sf0.01 --replicas 5 (its oracle is
    # the NAIVE per-node wedge construction — (replicas·c)³ wedges
    # per clique, the z51-twin output-bound shape). The 25× sf0.1
    # Spark-only runs with measured per-round shuffle rows live in
    # SCALE.md.
    "za56_pagerank",
    "q41_lpa_communities",
    "q42_kcore_members",
    "za73_triangle_stats",
    # round-9 second wave: the drift/FDR battery over 5x-densified
    # keyed streams (5x samples per KS test shrink every p-value —
    # the step-up cutoff i* must move identically in both engines),
    # the privacy audit over 5x-denser QI classes, and the two NEW
    # streaming differentials — sessions (5x users, watermark
    # eviction at density) and Space-Saving (5x events into the same
    # 256-value universe: counters quintuple, exactness must hold).
    # The Delta log entries (q16/q45) replay file-list surgery over
    # 5x the files.
    "q09_l_diversity",
    "q11_keyed_ks_drift",
    "q21_bh_fdr_drift",
    "q26_stream_sessions",
    "q35_stream_spacesaving",
    "q16_delta_time_travel",
    "q45_delta_restore",
    "q20_weighted_quantiles",
]

PAIR_QUERIES = {
    "q90_ngram_jaccard_pairs",
    "za23_lsh_candidate_pairs",
    "za63_simhash_near_dup_pairs",
    "z57_winnow_near_dup_pairs",
    "za16_lsh_verified_pairs",
    "q91_embedding_near_dup",
    "za67_incremental_lsh",
    "za27_decontamination_pairs",
}


def build_scaled_dir(base: str, out_dir: str, replicas: int) -> None:
    con = duckdb.connect()
    doc_off = 10_000
    vec_off = 10_000
    ev_off = 1_000_000
    user_off = 1_000_000
    ord_off = 10_000_000
    supp_off = 1_000_000
    for name in TABLE_NAMES:
        src = os.path.join(base, f"{name}.parquet")
        dst = os.path.join(out_dir, f"{name}.parquet")
        if name == "documents":
            sql = " UNION ALL ".join(
                f"SELECT doc_id + {k * doc_off} AS doc_id, "
                + ("text" if k == 0 else f"text || ' rk{k}' AS text")
                + ", lang, source, n_chars FROM t"
                for k in range(replicas)
            )
        elif name == "embeddings":
            sql = " UNION ALL ".join(
                f"SELECT vec_id + {k * vec_off} AS vec_id, embedding, label FROM t"
                for k in range(replicas)
            )
        elif name == "events":
            sql = " UNION ALL ".join(
                f"SELECT event_id + {k * ev_off} AS event_id, ts, "
                f"user_id + {k * user_off} AS user_id, event_type, value, "
                "props FROM t"
                for k in range(replicas)
            )
        elif name == "lineitem":
            # replica k offsets order/supplier keys (joins stay
            # within-replica) but l_partkey is untouched — per-part
            # totals densify ×replicas
            sql = " UNION ALL ".join(
                f"SELECT * REPLACE (l_orderkey + {k * ord_off} AS l_orderkey, "
                f"l_suppkey + {k * supp_off} AS l_suppkey) FROM t"
                for k in range(replicas)
            )
        elif name == "orders":
            # o_custkey UNCHANGED across replicas: every customer
            # becomes a ×replicas-degree HUB in the supplier→customer
            # trade graph — the skew mode the graph sweep exists for
            sql = " UNION ALL ".join(
                f"SELECT * REPLACE (o_orderkey + {k * ord_off} AS o_orderkey) "
                "FROM t"
                for k in range(replicas)
            )
        else:
            shutil.copy(src, dst)
            continue
        con.execute(f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{src}'")
        con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")


# Queries whose SCALED output exceeds driver-collect capacity (the
# comparison harness's limit, not the engine's): at 25 replicas the
# exact-replica SimHash pair graph is O(replicas^2)-hundreds of
# millions of rows — Spark computes it fine, but oracle_check
# materializes BOTH sides on the driver to compare. These compare via
# a DISTRIBUTED order-free checksum instead: per-row
# md5(canonical string) -> 52-bit int, summed engine-side on both
# engines (the md5-lane portability trick), plus the exact count.
CHECKSUM_QUERIES = {"za63_simhash_near_dup_pairs"}


def checksum_compare(sf_dir: str, name: str) -> int:
    """Distributed count+checksum differential for huge outputs;
    returns the row count, raises on mismatch."""
    from pyspark.sql import functions as F

    from computer_vision_foundations_spark import get_spark
    from computer_vision_foundations_spark.queries import (
        oracle_sql,
        queries,
    )

    spark = get_spark("scale_sweep_checksum")
    # AQE coalescing sizes stages by MAP-side stats; a pair generator's
    # input is tiny but its JOIN OUTPUT is the billion-row product, so
    # coalescing packs the expansion + md5 into 1-2 straggler tasks
    # (observed: 30+ min single task at 25 replicas). Keep the stage
    # wide for this harness session.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    df = queries()[name](spark, sf_dir)
    cols = sorted(df.columns)
    # NULL-sentinel BEFORE concat: Spark concat_ws SKIPS nulls while
    # DuckDB || nullifies the whole string — without the coalesce a
    # nullable column would silently diverge the checksums
    canon = F.concat_ws(
        "|",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00N")) for c in cols],
    )
    lane = F.conv(F.substring(F.md5(canon.cast("binary")), 1, 13), 16, 10)
    agg = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(lane.cast("decimal(38,0)")).alias("ck"),
    ).first()
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(sf_dir, t + '.parquet')}'"
        )
    ocols = " || '|' || ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0) || 'N')" for c in cols
    )
    n_o, ck_o = con.execute(
        f"""SELECT count(*),
                   sum(CAST(CAST(('0x' || substr(md5({ocols}), 1, 13))
                       AS BIGINT) AS HUGEINT))
            FROM ({oracle_sql()[name]})"""
    ).fetchone()
    assert agg["n"] == n_o, f"{name}: count {agg['n']} != oracle {n_o}"
    assert int(agg["ck"]) == int(ck_o), (
        f"{name}: checksum {agg['ck']} != oracle {ck_o}"
    )
    print(f"ok   {name}: {agg['n']} rows match (checksum)", flush=True)
    return int(agg["n"])


def run_sweep(sf_dir: str, names: list[str]) -> dict[str, int]:
    """Run oracle_check as the driver does; return {query: row_count}.
    CHECKSUM_QUERIES compare via the distributed checksum instead."""
    ck_names = [n for n in names if n in CHECKSUM_QUERIES]
    names = [n for n in names if n not in CHECKSUM_QUERIES]
    counts: dict[str, int] = {}
    for n in ck_names:
        counts[n] = checksum_compare(sf_dir, n)
    if not names:
        return counts
    proc = subprocess.run(
        [sys.executable, "-u", os.path.join(os.path.dirname(__file__), "oracle_check.py"), sf_dir, *names],
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stdout[-4000:])
    for m in re.finditer(r"^ok\s+(\S+): (\d+) rows match", proc.stdout, re.M):
        counts[m.group(1)] = int(m.group(2))
    failures = re.findall(r"^FAIL.*$", proc.stdout, re.M)
    if failures or proc.returncode != 0:
        for f in failures:
            print(f, file=sys.stderr)
        raise SystemExit(f"sweep FAILED at {sf_dir}: {len(failures)} failures")
    return counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=5)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated subset of SWEEP_QUERIES (e.g. the pair/ANN "
        "families for high-replica runs where the full list's oracle "
        "cost is prohibitive)",
    )
    args = ap.parse_args()
    sweep_queries = (
        [q for q in args.only.split(",") if q] if args.only else SWEEP_QUERIES
    )
    unknown = set(sweep_queries) - set(SWEEP_QUERIES)
    if unknown:
        raise SystemExit(f"--only names not in SWEEP_QUERIES: {sorted(unknown)}")

    scaled = tempfile.mkdtemp(prefix="scale_sweep_")
    try:
        build_scaled_dir(args.base, scaled, args.replicas)
        print(f"# scaled dir: {scaled} ({args.replicas}x {args.base})")
        base_counts = run_sweep(args.base, sweep_queries)
        scaled_counts = run_sweep(scaled, sweep_queries)
        print(f"\n{'query':35s} {'sf0.1':>9s} {'scaled':>9s} {'growth':>7s}")
        for name in sweep_queries:
            b, s = base_counts.get(name), scaled_counts.get(name)
            if b is None or s is None:
                continue
            g = f"{s / b:.1f}x" if b else "-"
            tag = "  <- pair density" if name in PAIR_QUERIES else ""
            print(f"{name:35s} {b:9d} {s:9d} {g:>7s}{tag}")
        print(
            f"\nPASS: 0 failures / {len(sweep_queries)} queries at both "
            f"scales (replicas={args.replicas})"
        )
        return 0
    finally:
        if args.keep:
            print(f"# kept {scaled}")
        else:
            shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
