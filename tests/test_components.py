"""Connected components: known topologies + random graphs vs a
driver-side union-find reference."""

import random

import pytest

from computer_vision_foundations_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _reference_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min node in component
    comp = {}
    for v in {x for e in edges for x in e}:
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


def test_chain_collapses_to_one_component(spark):
    # path graph 0-1-2-...-9: diameter 9, exercises pointer jumping
    edges = [(i, i + 1) for i in range(9)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = {r.node: r.component for r in connected_components(df).collect()}
    assert out == {i: 0 for i in range(10)}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(17)
    n = 60
    edges = list({(min(a, b), max(a, b)) for a, b in (
        (rng.randrange(n), rng.randrange(n)) for _ in range(45)
    ) if a != b})
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _reference_components(n, edges)


def test_dedup_clusters_canonical_flag(spark):
    df = spark.createDataFrame(
        [(5, 3), (3, 8), (10, 11)], ["id_a", "id_b"]
    )
    rows = {r.doc_id: (r.component, r.is_canonical) for r in dedup_clusters(df).collect()}
    assert rows == {
        3: (3, True),
        5: (3, False),
        8: (3, False),
        10: (10, True),
        11: (10, False),
    }


def test_nonconvergence_raises(spark):
    edges = [(i, i + 1) for i in range(6)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=1)


def test_checkpoint_blocks_released(spark):
    """Intermediate per-round label tables and the edge list must not
    accumulate in executor storage (ADVICE r2): after convergence only
    the final label table's checkpoint blocks remain."""
    from computer_vision_foundations_spark.operators.components import (
        connected_components,
    )

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], ["id_a", "id_b"]
    )
    out = connected_components(edges)
    assert {r.component for r in out.collect()} == {1, 10, 20}
    after = jsc.getPersistentRDDs().size()
    assert after - before <= 1  # only the returned final label table


def test_nonconvergence_releases_blocks(spark):
    """Exceptional exit paths must release the edge-list AND label
    checkpoint blocks (ADVICE r3: the iteration-cap RuntimeError used
    to leak both in a long-lived session)."""
    jsc = spark.sparkContext._jsc  # JavaSparkContext: returns a java.util.Map

    def _ids():
        return {
            int(i) for i in jsc.getPersistentRDDs().keySet().toArray()
        }

    before = _ids()
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(edges, max_iter=1)
    # id-set compare, not counts: an unrelated test's block may be
    # ContextCleaner-GC'd between the two snapshots in a full-suite run
    assert _ids() - before == set()  # nothing NEW survives a failed run
