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


def topk_spacesaving_stateful(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 8,
    key_type: str = "string",
) -> DataFrame:
    """Per-key streaming TOP-K heavy hitters via the Space-Saving
    algorithm (Metwally, Agrawal & El Abbadi, ICDT 2005) carried in
    the state store — the streaming twin of the batch Count-Min
    heavy-hitter query (q88), with deterministic per-item error
    bounds instead of probabilistic ones.

    State per key is exactly k (item, count, error) counters. On each
    arriving value: tracked → increment; untracked with free slots →
    new counter; untracked and full → evict the MINIMUM counter
    (ties: lexicographically smallest item, so replay is
    deterministic), inherit its count as the new item's error. The
    classic guarantees hold: every item with true frequency
    > N/k is tracked, and for each counter
    ``count − error ≤ true ≤ count``. While a key has seen ≤ k
    distinct values the counts are EXACT (error 0) — the parity a
    batch groupBy.count() replay can check bit-for-bit.

    Output rows, one per (key, tracked item) per batch:
    ``(key, item string, count bigint, error bigint, batch_seq
    bigint)``. Use ``outputMode("update")`` sinks.

    Scale: state is k·(item + 16 bytes) per key, independent of
    stream length — the bounded-state property that makes per-key
    frequency tracking viable where an exact per-item count table
    would grow with the item universe.
    """
    out_schema = (
        f"{key_col} {key_type}, item string, count bigint, "
        "error bigint, batch_seq bigint"
    )
    state_schema = (
        "items array<string>, counts array<bigint>, "
        "errors array<bigint>, b bigint"
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errors, b = (
                list(state.get[0]),
                list(state.get[1]),
                list(state.get[2]),
                state.get[3],
            )
        else:
            items, counts, errors, b = [], [], [], 0
        slot = {it: i for i, it in enumerate(items)}
        for pdf in pdfs:
            for v in pdf[value_col]:
                if v is None:
                    continue
                it = str(v)
                i = slot.get(it)
                if i is not None:
                    counts[i] += 1
                elif len(items) < k:
                    slot[it] = len(items)
                    items.append(it)
                    counts.append(1)
                    errors.append(0)
                else:
                    # evict the deterministic minimum counter
                    m = min(
                        range(len(items)),
                        key=lambda j: (counts[j], items[j]),
                    )
                    del slot[items[m]]
                    slot[it] = m
                    errors[m] = counts[m]
                    counts[m] += 1
                    items[m] = it
        b += 1
        state.update((items, counts, errors, b))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(items),
                "item": items,
                "count": counts,
                "error": errors,
                "batch_seq": [b] * len(items),
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def ewma_drift_stateful(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    alpha: float = 0.1,
    threshold: float = 3.0,
    min_n: int = 10,
    key_type: str = "string",
) -> DataFrame:
    """Per-key streaming drift alarm: the state store carries the
    EWMA level AND an EWMA of squared deviations (an exponentially-
    forgetting variance — the streaming twin of the batch pair
    `operators/smoothing.ewma_by_key` + `operators/timeseries.
    cusum_changepoint`); a micro-batch whose mean deviates from the
    carried level by more than ``threshold·σ̂`` raises the alarm flag.
    Values update the level AFTER the test, so a genuine jump cannot
    mask itself by dragging the baseline along within its own batch.

    Output rows, one per (key, batch): ``(key, batch_mean double,
    level double, sigma double, n_seen bigint, alarm boolean,
    batch_seq bigint)``. No alarms before ``min_n`` observations (the
    variance estimate needs burn-in). State is four scalars per key.
    """
    out_schema = (
        f"{key_col} {key_type}, batch_mean double, level double, "
        "sigma double, n_seen bigint, alarm boolean, batch_seq bigint"
    )
    state_schema = "level double, var double, n bigint, b bigint"

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        level, var, n, b = (
            state.get if state.exists else (0.0, 0.0, 0, 0)
        )
        vals: list[float] = []
        for pdf in pdfs:
            vals.extend(float(v) for v in pdf[value_col] if v is not None)
        if not vals:
            return
        batch_mean = sum(vals) / len(vals)
        sigma = var**0.5
        alarm = bool(
            n >= min_n
            and sigma > 0
            and abs(batch_mean - level) > threshold * sigma
        )
        for v in vals:
            if n == 0:
                level, var = v, 0.0
            else:
                d = v - level
                level += alpha * d
                var = (1 - alpha) * (var + alpha * d * d)
            n += 1
        b += 1
        state.update((level, var, n, b))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "batch_mean": [batch_mean],
                "level": [level],
                "sigma": [sigma],
                "n_seen": [n],
                "alarm": [alarm],
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


def ewma_batch_drift_stateful(
    df: DataFrame,
    key_col: str = "event_type",
    scaled_col: str = "vs",
    alpha: float = 0.5,
    threshold: float = 1.0,
    min_batches: int = 1,
    key_type: str = "string",
) -> DataFrame:
    """Per-key BATCH-mean EWMA drift alarm — the oracle-replayable
    sibling of :func:`ewma_drift_stateful`: the level/variance update
    once per MICRO-BATCH on the batch mean instead of per value, so
    the recurrence has |batches| steps and a DuckDB twin can unroll
    it exactly (per-value folds are sequential in arrival order and
    have no order-free SQL form). Inputs arrive PRE-SCALED to the
    1e-6 integer grid (``scaled_col`` = floor(value·10⁶) as long) so
    each batch mean is exact integer algebra divided once — the za50
    float-reduction-order lesson applied to the state recurrence.

    Per (key, batch) output: ``(key, batch_seq, batch_mean, level,
    sigma, alarm)`` where sigma is the PRE-update deviation estimate
    the alarm tested (sqrt of the exponentially-forgotten squared
    deviations), level the POST-update baseline, and
    ``alarm = seen >= min_batches AND sigma > 0 AND
    |mean − level_prev| > threshold·sigma``. First batch seeds
    level = mean, var = 0, alarm = false. State is three scalars per
    key."""
    out_schema = (
        f"{key_col} {key_type}, batch_seq bigint, batch_mean double, "
        "level double, sigma double, alarm boolean"
    )
    state_schema = "level double, var double, b bigint"

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        level, var, b = state.get if state.exists else (0.0, 0.0, 0)
        s = 0
        n = 0
        for pdf in pdfs:
            col = pdf[scaled_col]
            s += int(col.sum())
            n += int(col.count())
        if n == 0:
            return
        mean = s / (1000000.0 * n)
        if b == 0:
            level, var, sigma, alarm = mean, 0.0, 0.0, False
        else:
            d = mean - level
            sigma = var**0.5
            alarm = bool(
                b >= min_batches and sigma > 0
                and abs(d) > threshold * sigma
            )
            level = level + alpha * d
            var = (1 - alpha) * (var + alpha * d * d)
        b += 1
        state.update((level, var, b))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "batch_seq": [b],
                "batch_mean": [mean],
                "level": [level],
                "sigma": [sigma],
                "alarm": [alarm],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
