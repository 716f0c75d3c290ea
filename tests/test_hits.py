"""HITS hubs/authorities (operators/hits.py): numpy power-iteration
reference, normalization, dangling sides, and plan hygiene."""

import numpy as np
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.hits import hits


def _numpy_hits(edges, n_iter=5):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    a_mat = np.zeros((len(nodes), len(nodes)))
    for u, v in set(edges):
        a_mat[idx[u], idx[v]] = 1.0
    h = np.ones(len(nodes))
    a = np.zeros(len(nodes))
    for _ in range(n_iter):
        a = a_mat.T @ h
        a = a / np.linalg.norm(a)
        h = a_mat @ a
        h = h / np.linalg.norm(h)
    return nodes, h, a


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_matches_numpy_reference(spark):
    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (4, 5)]
    nodes, h, a = _numpy_hits(edges)
    got = {r["node"]: r for r in hits(_edges_df(spark, edges)).collect()}
    for i, n in enumerate(nodes):
        assert abs(got[n]["hub"] - h[i]) < 1e-9
        assert abs(got[n]["authority"] - a[i]) < 1e-9


def test_pure_sink_has_zero_hub(spark):
    # node 3 has no out-edges: hub 0; node 1 has no in-edges: authority 0
    edges = [(1, 2), (2, 3), (1, 3)]
    got = {r["node"]: r for r in hits(_edges_df(spark, edges)).collect()}
    assert got[3]["hub"] == 0.0
    assert got[1]["authority"] == 0.0
    assert got[3]["authority"] > 0


def test_l2_normalized(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    rows = hits(_edges_df(spark, edges)).collect()
    hub_norm = sum(r["hub"] ** 2 for r in rows) ** 0.5
    auth_norm = sum(r["authority"] ** 2 for r in rows) ** 0.5
    assert abs(hub_norm - 1.0) < 1e-9
    assert abs(auth_norm - 1.0) < 1e-9


def test_duplicate_edges_collapse(spark):
    base = [(1, 2), (2, 3)]
    got1 = {r["node"]: (r["hub"], r["authority"])
            for r in hits(_edges_df(spark, base)).collect()}
    got2 = {r["node"]: (r["hub"], r["authority"])
            for r in hits(_edges_df(spark, base + base)).collect()}
    assert got1 == got2


def test_partition_invariant(spark):
    edges = [(i % 7, (i * 3) % 7 + 1) for i in range(30)]
    df = _edges_df(spark, edges)
    a = sorted(map(tuple, hits(df).collect()))
    b = sorted(map(tuple, hits(df.repartition(8)).collect()))
    assert np.allclose(np.array(a), np.array(b), atol=1e-12)
