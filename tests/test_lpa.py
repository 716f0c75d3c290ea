"""Label propagation communities (operators/lpa)."""

from itertools import combinations

from computer_vision_foundations_spark.operators.lpa import (
    label_propagation,
)


def _communities(spark, edges, n_rounds=4):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["community"]
        for r in label_propagation(df, n_rounds=n_rounds).collect()
    }


def test_clique_converges_to_one_community(spark):
    out = _communities(spark, list(combinations(range(1, 5), 2)))
    assert len(set(out.values())) == 1


def test_bridged_cliques_stay_separate(spark):
    # two K4 cliques joined by one bridge edge: connected components
    # would merge them; majority-vote LPA must not.
    left = list(combinations([1, 2, 3, 4], 2))
    right = list(combinations([11, 12, 13, 14], 2))
    out = _communities(spark, left + right + [(4, 11)])
    assert len({out[n] for n in (1, 2, 3)}) == 1
    assert len({out[n] for n in (12, 13, 14)}) == 1
    assert out[1] != out[12]


def test_matches_synchronous_reference(spark):
    import random

    rng = random.Random(11)
    nodes = list(range(30))
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for _ in range(90)
            for a, b in [(rng.choice(nodes), rng.choice(nodes))]
            if a != b
        }
    )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(4):
        nxt = {}
        for n in adj:
            hist = {}
            for m in adj[n]:
                hist[labels[m]] = hist.get(labels[m], 0) + 1
            best = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            nxt[n] = best
        labels = nxt
    out = _communities(spark, [(int(a), int(b)) for a, b in edges])
    assert out == labels


def test_label_propagation_quotient_matches_rep_graph(spark):
    """Quotient LPA == plain LPA on the representative graph, fanned
    back to every class member (same-class nodes share a community by
    construction)."""
    from computer_vision_foundations_spark.operators.lpa import (
        label_propagation,
        label_propagation_quotient,
    )

    # classes: {1,2}->A, {3}->B, {4,5}->C; edges between members
    classes = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "C"), (5, "C")],
        "node long, cls string",
    )
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 4), (5, 1), (1, 2), (4, 5)],
        "id_a long, id_b long",
    )
    got = {
        (r["node"], r["community"])
        for r in label_propagation_quotient(
            edges, classes, n_rounds=3
        ).collect()
    }
    # representative graph: reps 1(A), 3(B), 4(C); quotient edges
    # {(1,3),(3,4),(4,1)} (within-class edges drop)
    qedges = spark.createDataFrame(
        [(1, 3), (3, 4), (4, 1)], "id_a long, id_b long"
    )
    rep_lab = {
        r["node"]: r["community"]
        for r in label_propagation(qedges, n_rounds=3).collect()
    }
    want = {
        (1, rep_lab[1]), (2, rep_lab[1]),
        (3, rep_lab[3]),
        (4, rep_lab[4]), (5, rep_lab[4]),
    }
    assert got == want
    by_cls = {"A": {1, 2}, "C": {4, 5}}
    for mem in by_cls.values():
        assert len({c for n, c in got if n in mem}) == 1
