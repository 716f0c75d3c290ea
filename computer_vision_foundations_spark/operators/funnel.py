"""Ordered-funnel analysis over event streams.

"How many users did A, then B, then C?" — the standard product/event
analytics question (SQL engines with MATCH_RECOGNIZE answer it with
row-pattern matching; Spark has no MATCH_RECOGNIZE, so this operator
re-expresses the strict-order funnel relationally).

Semantics: a user reaches step i when an ordered subsequence of their
events matches ``steps[:i]`` with STRICTLY increasing timestamps.
Greedy earliest-match is optimal for existence (standard exchange
argument), so "max step reached" is well-defined and equals the
min-after-min chain a SQL oracle computes with one join per step.

Spark-first shape: filter to step event types AT THE SCAN (non-funnel
events never leave the parquet reader), ONE shuffle on the user key,
then a per-user sorted fold (``sort_array`` + ``aggregate`` — a linear
state machine inside whole-stage codegen, the same trick as the
repetition mode count). Per-user state is the collected step-event
array: bounded by a user's funnel-event count, the usual funnel-engine
assumption; for pathological users pre-cap with a per-user
``group_cap_sample``. Timestamps order via
``ranges.epoch_micros`` (zone-safe for NTZ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.ranges import epoch_micros

__all__ = ["funnel_max_step", "funnel_counts"]


def funnel_max_step(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """``(user, max_step)`` — the furthest funnel step each user
    reached in order (0 = never did step 1; users with no step events
    are absent)."""
    n = len(steps)
    ev = events.filter(F.col(type_col).isin(list(steps)))
    per_user = (
        ev.select(
            F.col(user_col).alias("user"),
            F.struct(
                epoch_micros(ev, ts_col).alias("us"),
                F.col(type_col).alias("t"),
            ).alias("_e"),
        )
        .groupBy("user")
        .agg(F.sort_array(F.collect_list("_e")).alias("_evs"))
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    init = F.struct(
        F.lit(0).alias("step"), F.lit(-(2**62)).cast("long").alias("last")
    )

    def merge(acc, e):
        adv = (
            (acc["step"] < F.lit(n))
            & (e["t"] == F.element_at(step_arr, acc["step"] + 1))
            & (e["us"] > acc["last"])
        )
        return F.struct(
            F.when(adv, acc["step"] + 1).otherwise(acc["step"]).alias("step"),
            F.when(adv, e["us"]).otherwise(acc["last"]).alias("last"),
        )

    return per_user.select(
        "user",
        F.aggregate("_evs", init, merge, lambda a: a["step"]).alias("max_step"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """``(step, step_name, n_users, conversion)`` — users reaching at
    least each step, with conversion relative to step 1. One extra
    |steps|-row aggregate over :func:`funnel_max_step`."""
    step_arr = F.array(*[F.lit(s) for s in steps])
    reached = funnel_max_step(events, steps, user_col, type_col, ts_col)
    per_step = (
        reached.filter(F.col("max_step") >= 1)
        .select(
            F.explode(F.sequence(F.lit(1), F.col("max_step"))).alias("step")
        )
        .groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    # conversion vs step 1 = n / max(n) over the (|steps|-row) result
    w = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return per_step.select(
        "step",
        F.element_at(step_arr, F.col("step")).alias("step_name"),
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.max("n_users").over(w), 6
        ).alias("conversion"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 86_400,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period,
    tracked by activity in later periods.

    Returns ``(cohort, period_offset, n_active, retention)`` where
    ``cohort`` is the user's first-seen period index, ``period_offset``
    counts periods since the cohort period, and ``retention`` is
    n_active / cohort size. Plan: one agg for first-seen (shuffle on
    user), broadcast-free join back on user, distinct
    (user, cohort, offset), then a |cohorts×offsets|-row aggregate —
    events never shuffle their payload, only (user, int) pairs."""
    b = F.floor(
        epoch_micros(events, ts_col) / F.lit(period_seconds * 1_000_000)
    ).cast("long")
    acts = events.select(F.col(user_col).alias("user"), b.alias("_p"))
    first = acts.groupBy("user").agg(F.min("_p").alias("_cohort"))
    active = (
        acts.join(first, "user")
        .select(
            "user", "_cohort", (F.col("_p") - F.col("_cohort")).alias("_off")
        )
        .distinct()
    )
    counts = active.groupBy("_cohort", "_off").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    size = counts.filter(F.col("_off") == 0).select(
        "_cohort", F.col("n_active").alias("_size")
    )
    return counts.join(F.broadcast(size), "_cohort").select(
        F.col("_cohort").alias("cohort"),
        F.col("_off").alias("period_offset"),
        "n_active",
        F.round(F.col("n_active") / F.col("_size"), 6).alias("retention"),
    )


def event_transition_matrix(
    df,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    round_digits: int = 6,
):
    """First-order Markov transition counts/probabilities between
    consecutive events per user: ``(from_type, to_type, n,
    p_transition)`` with p normalized over each ``from_type``.

    One window (lead over the per-user timeline — ordered by ts with a
    deterministic tiebreak) + one hash aggregate; shuffles carry
    (user, type) rows only. The behavioral-model twin of the text
    bigram LM in ``operators/perplexity.py``."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    pairs = (
        df.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(tiebreak_col),
            F.col(type_col).alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wf), round_digits).alias(
            "p_transition"
        ),
    )
