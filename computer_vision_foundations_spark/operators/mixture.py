"""Corpus mixture sampling: re-weight domains to a token budget.

The last step before training-data serialization in every large-corpus
pipeline (the Dolma/RedPajama "mixing" stage): given target proportions
per domain (source, language, quality tier) and a total token budget,
downsample each domain so the output matches the target mix. Two
properties matter at 100 TB:

- **Deterministic, collect-free sampling.** Membership is decided by a
  per-document hash threshold (``md5`` of the id, seeded), not
  ``rand()`` — re-running the pipeline, on any cluster layout, selects
  the SAME documents (reproducible corpora, diffable between runs).
  The hash math is the portable 28-bit md5 slice used by the MinHash
  family (functions/hashing.md5_hash_pair), so a SQL engine replays
  the exact selection.
- **One tiny aggregate, one broadcast.** Per-domain totals are a
  hash-agg producing |domains| rows; the keep-fraction table joins
  back by broadcast. The corpus itself is touched exactly once, with a
  filter that pushes into the scan's projection — no shuffle of
  documents at all.

Domains with fewer tokens than their target keep everything (fraction
caps at 1.0) — oversampling/repetition is a training-loader concern,
not a corpus operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_unit",
    "mixture_fractions",
    "mixture_sample",
    "mixture_sample_with_repetition",
    "top_fraction_per_group",
]

# 28-bit hash → [0, 1) denominator; 7 hex chars parse exactly in any
# engine (see functions/hashing.md5_hash_pair)
_HASH_DENOM = float(1 << 28)


def hash_unit(col: Column | str, seed: int = 42) -> Column:
    """Deterministic uniform-ish [0, 1) from a key column: the first 7
    hex chars of ``md5(key || ':' || seed)`` over 2^28. Portable:
    DuckDB computes the identical double with
    ``CAST(('0x' || substr(md5(key || ':seed'),1,7)) AS BIGINT) / 2^28``."""
    c = F.col(col) if isinstance(col, str) else col
    d = F.md5(F.concat(c.cast("string"), F.lit(f":{seed}")).cast("binary"))
    return F.conv(F.substring(d, 1, 7), 16, 10).cast("long") / F.lit(_HASH_DENOM)


def mixture_fractions(
    df: DataFrame,
    weights: dict[str, float],
    budget: float,
    domain_col: str = "source",
    token_col: str | None = None,
) -> DataFrame:
    """``(domain, n_tokens, keep_frac)`` — per-domain keep fraction for
    a target of ``budget × weight[domain] / Σweights`` tokens.

    ``token_col`` counts tokens per document (None = count documents).
    Domains absent from ``weights`` get fraction 0 (dropped) — listing
    a domain with weight 0 is the same thing, explicitly.
    """
    total_w = float(sum(weights.values()))
    tok = (
        F.sum(F.col(token_col)) if token_col else F.count(F.lit(1))
    ).cast("double")
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    sizes = df.groupBy(F.col(domain_col).alias("domain")).agg(
        tok.alias("n_tokens")
    )
    target = F.lit(float(budget)) * F.coalesce(
        wmap[F.col("domain")], F.lit(0.0)
    ) / F.lit(total_w)
    return sizes.select(
        "domain",
        "n_tokens",
        F.least(F.lit(1.0), target / F.col("n_tokens")).alias("keep_frac"),
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    budget: float,
    domain_col: str = "source",
    id_col: str = "doc_id",
    token_col: str | None = None,
    seed: int = 42,
) -> DataFrame:
    """Sample ``df`` so each domain contributes ~``budget ×
    weight/Σweights`` tokens: keep a document iff its seeded hash unit
    falls below the domain's keep fraction. Input columns pass through
    unchanged. Deterministic in the id (cluster-layout independent)."""
    fracs = mixture_fractions(df, weights, budget, domain_col, token_col)
    return (
        df.join(
            F.broadcast(fracs),
            df[domain_col] == fracs["domain"],
            "inner",
        )
        .filter(hash_unit(id_col, seed) < F.col("keep_frac"))
        .drop("domain", "n_tokens", "keep_frac")
    )


def mixture_sample_with_repetition(
    df: DataFrame,
    weights: dict[str, float],
    budget: float,
    domain_col: str = "source",
    id_col: str = "doc_id",
    token_col: str | None = None,
    seed: int = 42,
    max_repeat: float = 4.0,
) -> DataFrame:
    """Mixture sampling where under-target domains UPSAMPLE by
    repetition: a domain at fraction f emits ``floor(f)`` full copies
    of every document plus one more for the hash-selected ``f −
    floor(f)`` remainder (so expected tokens match the target exactly).
    Adds an ``epoch`` column (1-based copy index). ``max_repeat`` caps
    the fraction — repeating a small domain > ~4× degrades models
    faster than it helps, so the cap is a quality guard, not a
    mechanical limit.

    The replication is a map-side ``explode(sequence(...))`` — no
    shuffle; downstream packing/serialization sees epoch copies as
    ordinary rows. Deterministic in (id, seed) like
    :func:`mixture_sample`.
    """
    total_w = float(sum(weights.values()))
    tok = (
        F.sum(F.col(token_col)) if token_col else F.count(F.lit(1))
    ).cast("double")
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    sizes = df.groupBy(F.col(domain_col).alias("domain")).agg(
        tok.alias("n_tokens")
    )
    frac = F.least(
        F.lit(float(max_repeat)),
        F.lit(float(budget))
        * F.coalesce(wmap[F.col("domain")], F.lit(0.0))
        / F.lit(total_w)
        / F.col("n_tokens"),
    )
    fracs = sizes.select("domain", frac.alias("_frac"))
    n_copies = F.floor(F.col("_frac")).cast("int") + (
        hash_unit(id_col, seed) < (F.col("_frac") - F.floor(F.col("_frac")))
    ).cast("int")
    return (
        df.join(F.broadcast(fracs), df[domain_col] == fracs["domain"], "inner")
        .withColumn("_n", n_copies)
        .withColumn(
            "epoch",
            F.explode(
                F.when(
                    F.col("_n") >= 1, F.sequence(F.lit(1), F.col("_n"))
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("domain", "_frac", "_n")
    )


def top_fraction_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    frac: float,
    tiebreak_col: str,
    descending: bool = True,
) -> DataFrame:
    """Keep the best ``frac`` of rows per group by score — the
    quality-gate selection stage ("top 25% by classifier score per
    source"). ``percent_rank`` over a TOTAL order (score, then a unique
    tiebreak), so selection is deterministic, replayable in SQL, and
    cluster-layout independent. One shuffle on the group key; the
    window carries only the projected columns.

    A group's single best row has percent_rank 0 and always survives;
    groups of one keep their row for any ``frac`` >= 0.
    """
    from pyspark.sql import Window

    order = [
        F.col(score_col).desc() if descending else F.col(score_col).asc(),
        F.col(tiebreak_col).asc(),
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= F.lit(float(frac)))
        .withColumn("pct_rank", F.round("_pr", 6))
        .drop("_pr")
    )


def temperature_fractions(
    df: DataFrame,
    temperature: float,
    budget: float,
    domain_col: str = "source",
    token_col: str | None = None,
) -> DataFrame:
    """``(domain, n_tokens, mix_weight, keep_frac)`` — temperature-
    scaled multilingual/multi-domain sampling (the UniMax / mT5
    recipe): mixing weights ∝ size^(1/T) normalized across domains, so
    T=1 reproduces natural proportions and T→∞ approaches uniform —
    boosting tail domains without hand-written weight tables.

    One |domains|-row aggregate + a broadcast 1-row normalizer; compose
    the output with :func:`mixture_sample`'s hash filter (or use
    ``keep_frac`` directly) — the corpus itself never shuffles.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    tok = (
        F.sum(F.col(token_col)) if token_col else F.count(F.lit(1))
    ).cast("double")
    sizes = df.groupBy(F.col(domain_col).alias("domain")).agg(
        tok.alias("n_tokens")
    )
    powed = sizes.withColumn(
        "_pw", F.pow(F.col("n_tokens"), F.lit(1.0 / float(temperature)))
    )
    norm = powed.agg(F.sum("_pw").alias("_z"))
    return (
        powed.crossJoin(F.broadcast(norm))
        .select(
            "domain",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("_pw") / F.col("_z")).alias("mix_weight"),
            F.least(
                F.lit(1.0),
                F.lit(float(budget))
                * (F.col("_pw") / F.col("_z"))
                / F.col("n_tokens"),
            ).alias("keep_frac"),
        )
    )
