"""Custom stateful streaming operators (``applyInPandasWithState``).

The engine's escape hatch for stateful semantics the built-in windowed
aggregations can't express (running per-key totals exposed every
micro-batch, custom eviction, cross-batch accumulators). State lives in
Spark's state store (checkpointed, partitioned by key — each executor
holds only its keys' state), and the per-batch work is Arrow-batched
pandas. This is the Structured-Streaming analogue of the reference's
stateful training loop accumulators (which live outside the engine,
SURVEY §2.7) — here state is engine-managed and restart-safe.

Scale: state size is O(distinct keys) with ~16 bytes of payload per
key here; the shuffle is the same hash-partition-by-key every stateful
streaming agg pays. Use timeouts (``GroupStateTimeout``) to bound state
for unbounded key universes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    key_type: str = "bigint",
) -> DataFrame:
    """Per-key running ``(n_events, sum_value)`` updated every
    micro-batch — totals are CUMULATIVE across batches (that is the
    state), not per-batch aggregates.

    Output rows (one per key seen in the batch):
    ``(key, n_events bigint, sum_value double, batch_seq bigint)``
    where batch_seq counts how many micro-batches have touched the key
    (observable proof the state store carried values across batches).
    Use ``outputMode("update")`` sinks (memory / foreachBatch / kafka).
    """
    out_schema = (
        f"{key_col} {key_type}, n_events bigint, sum_value double, "
        "batch_seq bigint"
    )
    state_schema = "n bigint, s double, b bigint"

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s, b = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        b += 1
        state.update((n, s, b))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "sum_value": [s],
                "batch_seq": [b],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def approx_distinct_stateful(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "event_type",
    k: int = 64,
    key_type: str = "bigint",
) -> DataFrame:
    """Per-key streaming APPROXIMATE DISTINCT via a KMV bottom-k
    sketch carried in the state store — the streaming twin of
    ``functions/sketches.kmv_registers``: state is the k smallest md5
    hex hashes of the values seen so far (mergeable, so each
    micro-batch folds its new hashes into the stored sample), and
    every batch emits the refreshed estimate.

    Output rows (one per key seen in the batch):
    ``(key, approx_distinct double, n_hashes bigint, batch_seq bigint)``
    — exact while the key has seen < k distinct values (the sketch IS
    the set), else the (k−1)/theta_k estimator with the 52-bit hash
    fraction (identical math to the batch sketch, so a batch recompute
    over the same data reproduces the streamed estimate bit-for-bit).

    Scale: state is ≤ k·33 bytes per key, independent of stream
    length — the property that makes per-key cardinality tracking
    viable over unbounded streams where exact distinct state would
    grow without bound.
    """
    import hashlib

    out_schema = (
        f"{key_col} {key_type}, approx_distinct double, "
        "n_hashes bigint, batch_seq bigint"
    )
    state_schema = "hashes array<string>, b bigint"

    def _estimate(hashes: list) -> float:
        if len(hashes) < k:
            return float(len(hashes))
        theta = int(hashes[-1][:13], 16) / float(16**13)
        return (k - 1) / theta

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        hashes, b = (
            (list(state.get[0]), state.get[1])
            if state.exists
            else ([], 0)
        )
        hs = set(hashes)
        for pdf in pdfs:
            for v in pdf[value_col]:
                if v is None:
                    continue  # NULL is not a set member (batch parity)
                hs.add(hashlib.md5(str(v).encode()).hexdigest())
        hashes = sorted(hs)[:k]
        b += 1
        state.update((hashes, b))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "approx_distinct": [_estimate(hashes)],
                "n_hashes": [len(hashes)],
                "batch_seq": [b],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
