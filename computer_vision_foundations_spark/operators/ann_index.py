"""Persisted IVF-PQ index lifecycle: build once, query many.

The in-memory `quantization.ivf_pq_topk` re-encodes the corpus every
call; a real deployment encodes 100 TB ONCE and serves queries against
the stored codes. This module is that lifecycle:

    build_ivf_pq_index(corpus, path, ...)   # one encode pass → disk
    query_ivf_pq_index(spark, path, probes) # reads codes, not vectors

Layout::

    path/
      META.json            # centroids, codebooks, params, version
      codes/               # parquet, PARTITIONED BY _cell
        _cell=0/...parquet

Partitioning by cell is the load-bearing choice: the query's cell
equi-join against a cell-partitioned table lets Spark's dynamic
partition pruning skip every cell no probe fans out to — at
``n_probe_cells / n_cells`` selectivity the scan reads that fraction
of the FILES, not just of the rows. Codes are ~n_subvectors bytes per
vector, so the stored index is ~dim·4/n_subvectors× smaller than the
raw vectors; the floats are not stored at all.

Centroids/codebooks are model-sized JSON (n_cells·dim +
n_sub·n_centroids·sub_dim floats) — driver state, exactly like k-means
centroids. The ADC math is the oracle-verified `quantization` code
(q50); this module adds only persistence, so its tests assert
bit-equality of query results against the in-memory operator plus the
dynamic-pruning plan shape.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from computer_vision_foundations_spark.operators.quantization import (
    adc_topk_from_encoded,
    encode_cell_codes,
    probe_fanout,
)

__all__ = ["build_ivf_pq_index", "load_index_meta", "query_ivf_pq_index"]

_VERSION = 1


def build_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Encode ``corpus`` and persist the index at ``path``; returns the
    path. Train ``centroids`` upstream with `clustering.kmeans_fit`
    (or seed them) and ``codebooks`` with `quantization.pq_codebooks`
    — both are recorded in META.json so queries need only the path."""
    os.makedirs(path, exist_ok=True)
    encoded = encode_cell_codes(corpus, codebooks, centroids, vec_col, id_col)
    encoded.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(path, "codes")
    )
    with open(os.path.join(path, "META.json"), "w") as fh:
        json.dump(
            {
                "version": _VERSION,
                "centroids": centroids,
                "codebooks": codebooks,
                "n_cells": len(centroids),
                "n_subvectors": len(codebooks),
                "n_centroids": len(codebooks[0]),
                "dim": len(centroids[0]),
                "id_col": id_col,
            },
            fh,
        )
    return path


def load_index_meta(path: str) -> dict:
    with open(os.path.join(path, "META.json")) as fh:
        meta = json.load(fh)
    if meta.get("version") != _VERSION:
        raise ValueError(f"unsupported index version: {meta.get('version')}")
    return meta


def query_ivf_pq_index(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    k: int = 10,
    n_probe_cells: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Top-k ADC scan against a persisted index: reads the stored
    ``(neighbor_id, codes)`` rows for probed cells only (dynamic
    partition pruning via the broadcast cell equi-join) — the corpus
    vectors are never touched. Same output contract as
    `quantization.ivf_pq_topk`."""
    meta = load_index_meta(path)
    codes = spark.read.parquet(os.path.join(path, "codes"))
    p = probe_fanout(
        probes, meta["codebooks"], meta["centroids"], n_probe_cells,
        vec_col, id_col,
    )
    return adc_topk_from_encoded(
        codes,
        p,
        meta["n_subvectors"],
        meta["n_centroids"],
        k,
        round_digits,
        broadcast_probes,
    )
