"""Train/test split operators.

Re-expresses the reference's split stage (`03a_Model Training.py:74-86`):
stratified 80% sample per label → left-anti join complement → drop key →
repartition. Two variants:

- ``train_test_split``: faithful semantics (``sampleBy`` + left-anti
  join) but ALWAYS seeded — the reference's unseeded ``sampleBy``
  (`03a_Model Training.py:81`) is nondeterministic, which breaks both
  reproducibility and differential testing.
- ``deterministic_split``: hash/mod-based assignment — exact,
  engine-portable, shuffle-free tagging (a narrow projection), which is
  what you want at 100 TB: the sample variant scans twice (sample +
  anti-join shuffle), the deterministic variant tags each row in one
  pass with zero shuffle and perfectly reproducible membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_test_split(
    df: DataFrame,
    label_col: str,
    key_col: str,
    train_fraction: float = 0.8,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Seeded stratified split: (train, test) with test = complement.

    The anti-join complement is exactly the reference's idiom
    (`03a_Model Training.py:81-82`); Catalyst plans it as a broadcast
    anti-join when the train side is small, sort-merge otherwise. The
    complement property train ∪ test = all, train ∩ test = ∅ holds by
    construction on the key.
    """
    labels = [r[0] for r in df.select(label_col).distinct().collect()]
    fractions = {lab: train_fraction for lab in labels}
    train = df.sampleBy(label_col, fractions=fractions, seed=seed)
    test = df.join(train.select(key_col), on=key_col, how="left_anti")
    return train, test


def deterministic_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    eval_col: str = "eval_set",
    buckets: int = 100,
) -> DataFrame:
    """Tag rows train/test by ``pmod(key, buckets) < train_pct``.

    Single narrow projection — no shuffle, no second scan, portable to
    any engine (used by the DuckDB differential oracle). For non-numeric
    keys pass a pre-hashed column.
    """
    bucket = F.pmod(F.col(key_col).cast("long"), F.lit(buckets))
    return df.withColumn(
        eval_col,
        F.when(bucket < F.lit(train_pct), F.lit("train")).otherwise(F.lit("test")),
    )


def bernoulli_sample(
    df: DataFrame, fraction: float, seed: int = 42, id_col: str | None = None
) -> DataFrame:
    """SA2: seeded Bernoulli row sample (reference
    `04a_Model Deployment.py:313` — unseeded there; ours always seeds
    for reproducibility). A narrow per-partition filter — no shuffle.

    With ``id_col`` (the recommended form), membership is a PURE
    FUNCTION of (id, seed): keep iff the first 13 hex chars of
    ``md5(id || ':seed')`` — a uniform 52-bit integer, exactly
    representable in a double — fall below ``fraction * 16^13``.
    Partition- and engine-independent (the r5 determinism sweep showed
    ``df.sample`` yields 1497 vs 1451 rows across partitioning
    regimes), replayable in ANSI SQL, so the oracle can verify exact
    membership rather than row counts. Without ``id_col`` falls back
    to Spark's per-partition XORShift sampler (kept for API parity;
    row set then depends on partitioning — documented, not a bug).
    """
    if id_col is None:
        return df.sample(withReplacement=False, fraction=fraction, seed=seed)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")).cast("binary")),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    return df.filter(h < F.lit(float(fraction) * float(16 ** 13)))


def stratified_hash_sample(
    df: DataFrame,
    label_col: str,
    fractions: dict,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic ``sampleBy``: keep a row iff its 52-bit md5 unit
    (pure function of (id, seed) — the ``bernoulli_sample`` id_col
    construction) falls under its stratum's fraction.

    The portable twin of ``train_test_split``'s faithful ``sampleBy``
    (whose per-partition XORShift draw makes the row SET
    partition-dependent — the q65 rows-only caveat): same per-stratum
    fraction semantics, but membership survives repartitioning,
    engine swaps, and reruns, so downstream splits are reproducible
    and SQL-replayable. Strata absent from ``fractions`` are dropped
    (sampleBy's contract). One narrow projection, no shuffle."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit(f":{seed}")
                ).cast("binary")
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    expr = None
    for label, frac in sorted(fractions.items()):
        t = F.lit(float(frac) * float(16 ** 13))
        expr = (
            F.when(F.col(label_col) == F.lit(label), t)
            if expr is None
            else expr.when(F.col(label_col) == F.lit(label), t)
        )
    return df.filter(h < expr)


def kfold_assignment(
    df,
    id_col: str,
    k: int = 5,
    seed: int = 42,
    out_col: str = "fold",
):
    """Deterministic k-fold cross-validation assignment: fold =
    seeded 28-bit md5 slice mod k (the portable hash family) — a pure
    function of (id, seed), so folds are stable across engines,
    partitionings, and reruns, and any engine can reproduce the split
    (``CAST(('0x' || substr(md5(id || ':seed'), 1, 7)) AS BIGINT) % k``).
    One narrow projection, no shuffle."""
    from pyspark.sql import functions as F

    d = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}")).cast("binary")
    )
    h = F.conv(F.substring(d, 1, 7), 16, 10).cast("long")
    return df.withColumn(out_col, (h % k).cast("int"))


def temporal_split(
    df,
    ts_col: str,
    train_end,
    test_start,
    label_col: str = "split",
):
    """Leakage-free temporal split with an embargo gap: rows at or
    before ``train_end`` → 'train', rows at or after ``test_start`` →
    'test', rows inside the PURGE WINDOW between them → 'purged'
    (excluded so near-boundary leakage — label horizons, session
    spillover — cannot contaminate evaluation; the finance-style
    purged split). Pure projection: no shuffle, no sampling, fully
    deterministic — complement/coverage invariants hold by
    construction. Raises on misordered bounds (test_start must be
    strictly after train_end, else the gap is empty or negative and
    overlap rows silently become 'train'). Rows with a NULL timestamp
    land in 'purged' — excluded from both sides, the safe default."""
    from pyspark.sql import functions as F

    try:
        if not (test_start > train_end):
            raise ValueError(
                f"test_start ({test_start!r}) must be strictly after "
                f"train_end ({train_end!r})"
            )
    except TypeError:  # incomparable bound types: let Spark cast/fail
        pass
    c = F.col(ts_col)
    return df.withColumn(
        label_col,
        F.when(c <= F.lit(train_end), F.lit("train"))
        .when(c >= F.lit(test_start), F.lit("test"))
        .otherwise(F.lit("purged")),
    )
