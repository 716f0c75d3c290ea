"""Salted shuffle join — the canonical skew mitigation, with an
identical-result guarantee.

A shuffle join on a hot key (a handful of event types over billions
of events, a head domain over a web corpus) sends every row of the
hot key to ONE reducer: one straggler task holds the stage. Salting
splits each hot key's rows across ``n_salts`` reducers by joining on
``(key, salt)`` instead of ``key``: the fact side derives a
deterministic salt from a high-cardinality column it already has, and
the small side is replicated once per salt value. Join output is
row-for-row IDENTICAL to the unsalted join — each fact row still
meets exactly one copy of its dim row — which is precisely what the
registry oracle (a plain SQL join) certifies.

This is the complement to AQE's ``skewJoin`` (which splits oversized
partitions post-shuffle): salting is declarative, works on any Spark
version/plan shape, and — unlike AQE — also fixes the HASH AGGREGATE
feeding the join when composed with a two-phase aggregation.

Spark-first shape: the dim replication is ``explode(sequence(...))``
— no driver loop, no UDF; the salt is ``pmod(xxhash64(...), n)`` in
codegen. A ``shuffle_hash`` hint keeps the demo honest on small test
dims (Catalyst would otherwise broadcast and make the salt
decorative); real deployments leave the hint to the planner —
salting only matters once the dim side outgrows the broadcast
threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str | Column,
    n_salts: int = 8,
    force_shuffle: bool = True,
) -> DataFrame:
    """Inner-join ``fact ⋈ dim`` on ``key``, salted ``n_salts`` ways.

    ``salt_from`` is a fact-side column (or expression) with enough
    cardinality to spread the hot key — a row id, user id, timestamp.
    The salt is ``pmod(xxhash64(salt_from), n_salts)``: deterministic,
    so retried tasks re-derive the same salt. Result columns = fact
    columns + dim columns minus the duplicate key.
    """
    src = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    f = fact.withColumn("_salt", F.pmod(F.xxhash64(src), F.lit(n_salts)))
    d = dim.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(n_salts - 1).cast("bigint"))
        ),
    )
    if force_shuffle:
        d = d.hint("shuffle_hash")
    return f.join(d, [key, "_salt"]).drop("_salt")
