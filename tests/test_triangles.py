"""Triangle counting / clustering coefficients (operators/triangles)."""

from itertools import combinations

import pytest

from computer_vision_foundations_spark.operators.triangles import (
    triangle_stats,
)


def _stats(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: (r["degree"], r["triangles"], r["clustering_coeff"])
        for r in triangle_stats(df).collect()
    }


def test_single_triangle(spark):
    out = _stats(spark, [(1, 2), (2, 3), (3, 1)])
    assert out == {
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (2, 1, 1.0),
    }


def test_wedge_has_no_triangle(spark):
    out = _stats(spark, [(1, 2), (2, 3)])
    assert out[2] == (2, 0, 0.0)
    assert out[1] == (1, 0, 0.0)


def test_k4_clique(spark):
    edges = list(combinations(range(1, 5), 2))
    out = _stats(spark, edges)
    # every node of K4 touches C(3,2)=3 triangles, coefficient 1
    assert all(v == (3, 3, 1.0) for v in out.values())


def test_duplicate_and_reversed_edges_collapse(spark):
    out = _stats(
        spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)]
    )
    assert out == {
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (2, 1, 1.0),
    }


def test_bowtie_center(spark):
    # two triangles sharing node 3: degree 4, 2 triangles,
    # coefficient 2*2/(4*3) = 1/3
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
    out = _stats(spark, edges)
    assert out[3] == (4, 2, pytest.approx(1 / 3, abs=1e-6))
    assert out[1] == (2, 1, 1.0)
    assert out[5] == (2, 1, 1.0)


def test_matches_bruteforce_on_random_graph(spark):
    import random

    rng = random.Random(7)
    nodes = list(range(40))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(160)
            for a, b in [(rng.choice(nodes), rng.choice(nodes))]
            if a != b
        }
    )
    eset = set(edges)
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for n in nodes:
        if not adj[n]:
            continue
        t = sum(
            1
            for x, y in combinations(sorted(adj[n]), 2)
            if (min(x, y), max(x, y)) in eset
        )
        d = len(adj[n])
        coeff = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
        want[n] = (d, t, coeff)
    out = _stats(spark, [(int(a), int(b)) for a, b in edges])
    assert out == {n: (d, t, pytest.approx(c)) for n, (d, t, c) in want.items()}


def _class_graph_pairs(classes, adj):
    """Materialize the node-level pair list of a class-determined
    graph: same-class nodes are mutually adjacent, cross-class
    adjacency follows `adj` (set of frozensets of class ids)."""
    pairs = []
    nodes = sorted(classes)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            cu, cv = classes[u], classes[v]
            if cu == cv or frozenset((cu, cv)) in adj:
                pairs.append((u, v))
    return pairs


def test_collapsed_matches_naive_on_class_graphs(spark):
    import random

    from computer_vision_foundations_spark.operators.triangles import (
        triangle_stats_collapsed,
    )

    rng = random.Random(42)
    for trial in range(4):
        n_cls = rng.randint(3, 6)
        classes = {}
        node = 0
        for c in range(n_cls):
            for _ in range(rng.randint(1, 4)):
                classes[node] = c
                node += 1
        adj = {
            frozenset(p)
            for p in combinations(range(n_cls), 2)
            if rng.random() < 0.5
        }
        pairs = _class_graph_pairs(classes, adj)
        if not pairs:
            continue
        pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
        cdf = spark.createDataFrame(
            list(classes.items()), "node long, cls long"
        )
        naive = {
            tuple(r)
            for r in triangle_stats(pdf, "id_a", "id_b").collect()
        }
        fast = {
            tuple(r)
            for r in triangle_stats_collapsed(
                pdf, cdf, node_col="node", cls_col="cls"
            ).collect()
        }
        assert fast == naive, f"trial {trial} diverged"


def test_collapsed_pure_clique(spark):
    from computer_vision_foundations_spark.operators.triangles import (
        triangle_stats_collapsed,
    )

    # one class of 5 identical nodes: K5, every node (4, C(4,2)=6, 1.0)
    pairs = [(a, b) for a, b in combinations(range(5), 2)]
    pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
    cdf = spark.createDataFrame(
        [(i, 0) for i in range(5)] + [(99, 1)], "node long, cls long"
    )
    out = {
        r["node"]: (r["degree"], r["triangles"], r["clustering_coeff"])
        for r in triangle_stats_collapsed(pdf, cdf).collect()
    }
    # isolated node 99 (singleton class, no quotient edges) drops out
    assert 99 not in out
    assert out == {i: (4, 6, 1.0) for i in range(5)}
