"""Persisted IVF-PQ index (operators/ann_index.py): build/load/query
round trip, bit-equality with the in-memory operator, and the
partition-pruned scan shape."""

import os

import numpy as np
import pytest

from computer_vision_foundations_spark.operators.ann_index import (
    build_ivf_pq_index,
    load_index_meta,
    query_ivf_pq_index,
)
from computer_vision_foundations_spark.operators.quantization import (
    ivf_pq_topk,
    pq_codebooks,
)

DIM, N_SUB, N_CENT, N_CELLS = 16, 4, 8, 6


def _fixture(spark, n=80, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    cbs = pq_codebooks(DIM, N_SUB, N_CENT, seed=7)
    cents = [[float(x) for x in rng.normal(size=DIM)] for _ in range(N_CELLS)]
    return df, cbs, cents


def test_build_layout_and_meta(spark, tmp_path):
    df, cbs, cents = _fixture(spark)
    path = build_ivf_pq_index(df, str(tmp_path / "idx"), cbs, cents)
    assert os.path.exists(os.path.join(path, "META.json"))
    meta = load_index_meta(path)
    assert meta["n_cells"] == N_CELLS and meta["n_subvectors"] == N_SUB
    # codes parquet partitioned by cell
    parts = [d for d in os.listdir(os.path.join(path, "codes")) if d.startswith("_cell=")]
    assert len(parts) >= 2
    codes = spark.read.parquet(os.path.join(path, "codes"))
    assert codes.count() == 80
    assert set(codes.columns) == {"neighbor_id", "codes", "_cell"}


def test_query_matches_in_memory_operator(spark, tmp_path):
    df, cbs, cents = _fixture(spark)
    probes = df.filter("vec_id < 5")
    path = build_ivf_pq_index(df, str(tmp_path / "idx"), cbs, cents)
    from_index = sorted(
        map(tuple, query_ivf_pq_index(spark, path, probes, k=5, n_probe_cells=3).collect())
    )
    in_memory = sorted(
        map(tuple, ivf_pq_topk(df, probes, cbs, cents, k=5, n_probe_cells=3).collect())
    )
    assert from_index == in_memory  # bit-equal: same codes, same ADC math


def test_query_plan_prunes_partitions(spark, tmp_path):
    df, cbs, cents = _fixture(spark)
    probes = df.filter("vec_id = 0")
    path = build_ivf_pq_index(df, str(tmp_path / "idx"), cbs, cents)
    q = query_ivf_pq_index(spark, path, probes, k=5, n_probe_cells=2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the cell equi-join against the partitioned table must plan a
    # dynamic partition-pruning subquery on _cell
    assert "dynamicpruning" in plan.lower()


def test_version_guard(tmp_path):
    os.makedirs(tmp_path / "bad", exist_ok=True)
    with open(tmp_path / "bad" / "META.json", "w") as fh:
        fh.write('{"version": 99}')
    with pytest.raises(ValueError):
        load_index_meta(str(tmp_path / "bad"))
