"""BFS distances: agreement with a pure-Python BFS on a hand graph,
plus edge cases (unreachable nodes, hop cap, early frontier
exhaustion, seed not in graph)."""

from collections import deque

from computer_vision_foundations_spark.operators.bfs import bfs_distances


def _py_bfs(edges, seeds, n_hops):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= n_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


EDGES = [
    (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),  # chain past the hop cap
    (1, 7), (7, 3),                           # shortcut — min must win
    (8, 9),                                   # disconnected island
    (2, 1),                                   # back edge / cycle
]


def _run(spark, seeds, n_hops):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(df, seeds, n_hops=n_hops).collect()
    }
    assert got == _py_bfs(EDGES, seeds, n_hops)
    return got


def test_bfs_single_seed_hop_cap(spark):
    got = _run(spark, [1], 3)
    assert got[1] == 0 and got[3] == 2  # via shortcut 1->7->3
    assert 6 not in got and 8 not in got  # beyond cap / disconnected


def test_bfs_multi_seed_min_wins(spark):
    got = _run(spark, [1, 4], 2)
    assert got[4] == 0 and got[5] == 1  # seed 4 beats the long chain


def test_bfs_seed_outside_graph(spark):
    got = _run(spark, [99], 4)
    assert got == {99: 0}  # isolated seed: frontier exhausts at once


def test_bfs_cycle_terminates(spark):
    got = _run(spark, [2], 4)
    assert got[1] == 1 and got[2] == 0  # back edge does not re-expand
