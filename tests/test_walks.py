"""Seeded deterministic walks (operators/walks)."""

import hashlib

from computer_vision_foundations_spark.operators.walks import (
    seeded_walks,
    transition_edges,
)


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_transition_edges_are_consecutive_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, 0, 0.0, "a"),
            (1, 1, 1.0, "b"),
            (1, 2, 2.0, "a"),
            (2, 3, 0.0, "b"),
            (2, 4, 1.0, "c"),
        ],
        "user_id long, event_id long, ts double, event_type string",
    )
    got = {
        (r["src"], r["dst"]) for r in transition_edges(df).collect()
    }
    assert got == {("a", "b"), ("b", "a"), ("b", "c")}


def test_walk_follows_min_md5_choice(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")],
        "src string, dst string",
    )
    seed, steps = 7, 2
    got = {
        (r["start"], r["step"]): r["node"]
        for r in seeded_walks(edges, steps=steps, seed=seed).collect()
    }
    # replay the hash choice by hand
    adj = {"a": ["b", "c"], "b": ["a"], "c": ["a"]}
    for start in adj:
        node = start
        assert got[(start, 0)] == start
        for s in range(1, steps + 1):
            node = min(
                adj[node], key=lambda d: _md5(f"{seed}|{s}|{node}|{d}")
            )
            assert got[(start, s)] == node


def test_walk_stops_at_sink(spark):
    edges = spark.createDataFrame(
        [("a", "z")], "src string, dst string"
    )
    rows = seeded_walks(edges, steps=3, seed=1).collect()
    # start "a": step0 a, step1 z, then z has no out-edges → stop
    assert {(r["step"], r["node"]) for r in rows} == {
        (0, "a"),
        (1, "z"),
    }


def test_different_seeds_can_diverge(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c")], "src string, dst string"
    )
    picks = set()
    for seed in range(8):
        rows = seeded_walks(edges, steps=1, seed=seed).collect()
        picks.add(
            next(r["node"] for r in rows if r["step"] == 1)
        )
    assert picks == {"b", "c"}
