"""k-core peeling (operators/kcore)."""

from itertools import combinations

from computer_vision_foundations_spark.operators.kcore import k_core


def _core(spark, edges, k=3, n_rounds=8):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["degree"]
        for r in k_core(df, k=k, n_rounds=n_rounds).collect()
    }


def test_clique_survives_whole(spark):
    edges = list(combinations(range(1, 6), 2))
    out = _core(spark, edges, k=3)
    assert out == {n: 4 for n in range(1, 6)}


def test_pendant_chain_peels_away(spark):
    # K4 with a tail 4-5-6: the tail must peel, the clique stays
    edges = list(combinations(range(1, 5), 2)) + [(4, 5), (5, 6)]
    out = _core(spark, edges, k=3)
    assert set(out) == {1, 2, 3, 4}
    assert out[4] == 3  # the tail edge is gone from 4's degree


def test_cascading_peel(spark):
    # ring of 4 (degree 2 everywhere) fully dissolves at k=3
    out = _core(spark, [(1, 2), (2, 3), (3, 4), (4, 1)], k=3)
    assert out == {}


def test_k2_keeps_cycles_drops_trees(spark):
    # a triangle plus a tree branch: 2-core = the triangle
    out = _core(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], k=2)
    assert set(out) == {1, 2, 3}


def test_matches_networkx_style_reference(spark):
    import random

    rng = random.Random(5)
    nodes = list(range(25))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(70)
            for a, b in [(rng.choice(nodes), rng.choice(nodes))]
            if a != b
        }
    )
    # reference: peel to convergence
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    k = 3
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    want = {n: len(ns) for n, ns in adj.items() if ns}
    out = _core(spark, [(int(a), int(b)) for a, b in edges], k=k, n_rounds=12)
    assert out == want


def test_collapsed_matches_naive_on_class_graphs(spark):
    """k_core_collapsed over class-determined graphs (structural
    equivalence) equals the naive peel, including unconverged and
    early-stopped configurations."""
    import random
    from itertools import combinations

    from computer_vision_foundations_spark.operators.kcore import (
        k_core,
        k_core_collapsed,
    )

    rng = random.Random(11)
    for trial in range(4):
        n_cls = rng.randint(3, 6)
        classes, node = {}, 0
        for c in range(n_cls):
            for _ in range(rng.randint(1, 4)):
                classes[node] = c
                node += 1
        adj = {
            frozenset(p)
            for p in combinations(range(n_cls), 2)
            if rng.random() < 0.45
        }
        pairs = []
        nodes = sorted(classes)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1 :]:
                cu, cv = classes[u], classes[v]
                if cu == cv or frozenset((cu, cv)) in adj:
                    pairs.append((u, v))
        if not pairs:
            continue
        pdf = spark.createDataFrame(pairs, "id_a long, id_b long")
        cdf = spark.createDataFrame(
            list(classes.items()), "node long, cls long"
        )
        for k, rounds in ((2, 8), (3, 2)):
            naive = {
                tuple(r)
                for r in k_core(pdf, k=k, n_rounds=rounds).collect()
            }
            fast = {
                tuple(r)
                for r in k_core_collapsed(
                    pdf, cdf, k=k, n_rounds=rounds
                ).collect()
            }
            assert fast == naive, f"trial {trial} k={k} diverged"
