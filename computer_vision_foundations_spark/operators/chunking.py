"""Document chunking, sequence packing, and text redaction — the
prep operators between "deduplicated corpus" and "training batches"
in an LLM data pipeline.

All three are pure Catalyst plans:

- ``chunk_documents``: fixed-size token windows with overlap via
  ``sequence`` + ``posexplode`` + ``slice`` — array ops on the
  already-split token array, one Generate, no shuffle at all (chunking
  is embarrassingly row-local).
- ``pack_sequences``: greedy-by-order bin packing as a running-sum
  window — documents ordered by id within a shard fill a bin until
  ``seq_len`` tokens, then the next bin. One shuffle (by shard), one
  sort. Exact bin-capacity packing (first-fit-decreasing) is
  inherently sequential; the running-sum formulation is the standard
  distributed compromise and is what makes it scale: each shard packs
  independently.
- ``redact_text``: regexp_replace battery for emails / long digit
  runs / URLs. Patterns are conservative POSIX-class regexes that
  behave identically in Spark (Java regex) and DuckDB (RE2).
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chunk_documents", "pack_sequences", "redact_text", "shard_assignment", "REDACTIONS"]


def _warn_if_undersharded(df: DataFrame, n_shards: int, op: str) -> None:
    """Per-shard sorts bound parallelism by the shard count: fewer
    shards than cores leaves cores idle through the window stage. The
    fix is always "more shards" (shard count = training-loader
    parallelism anyway), so this is a warning, not an error."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    if n_shards < cores:
        warnings.warn(
            f"{op}: n_shards={n_shards} < defaultParallelism={cores}; "
            f"the per-shard sort will use at most {n_shards} of {cores} "
            "cores. Pick n_shards >= cores.",
            RuntimeWarning,
            stacklevel=3,
        )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split whitespace-tokenized documents into chunks of
    ``chunk_tokens`` tokens, consecutive chunks sharing ``overlap``
    tokens. Output: ``(id_col, chunk_idx, chunk_text, n_tokens)``;
    the final chunk may be short, and a document shorter than one
    chunk yields exactly one chunk. Row-local (no shuffle); the only
    cost is the Generate fan-out of ~len/(chunk-overlap) rows."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # chunk starts: 1, 1+step, ... while start <= max(n - overlap, 1)
    # (the last window must contribute > overlap new tokens, except a
    # short document's single window)
    starts = F.sequence(
        F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(step)
    )
    out = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start"), F.lit(chunk_tokens))
    return out.select(
        id_col,
        "chunk_idx",
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    seq_len: int = 2048,
    shard_col: Column | None = None,
    n_shards: int = 32,
) -> DataFrame:
    """Assign documents to training bins of ~``seq_len`` tokens.

    Documents are sharded (hash of id unless ``shard_col`` given),
    ordered by id within the shard, and binned by the running token
    sum: ``bin = floor((cumsum - n_tokens) / seq_len)`` — a document
    starts a new bin when the bin before it is full. Oversized
    documents (> seq_len) occupy bins alone (truncation/splitting is
    chunk_documents' job, upstream). Output adds ``shard, bin,
    offset`` (token offset within the bin's concatenation)."""
    if shard_col is None:
        _warn_if_undersharded(df, n_shards, "pack_sequences")
    shard = (
        shard_col
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_count_col).over(w)
    return (
        df.withColumn("shard", shard)
        .withColumn("_cum", cum)
        .withColumn(
            "bin",
            F.floor((F.col("_cum") - F.col(token_count_col)) / seq_len),
        )
        .withColumn(
            "offset",
            F.col("_cum") - F.col(token_count_col) - F.col("bin") * seq_len,
        )
        .drop("_cum")
    )


# (name, java/RE2-compatible pattern, replacement) — applied in order
REDACTIONS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^ ]+", "<URL>"),
    ("digits", r"[0-9]{6,}", "<NUM>"),
]


def redact_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Replace emails, URLs, and 6+-digit runs with placeholder
    tokens (in REDACTIONS order, so an email is <EMAIL> before its
    digits could become <NUM>). Pure regexp_replace chain — one
    projection, codegen'd, no Python."""
    c = F.col(text_col)
    for _, pat, repl in REDACTIONS:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out_col or text_col, c)


def shard_assignment(
    df: "DataFrame",
    id_col: str = "doc_id",
    n_shards: int = 8,
    seed: int = 42,
) -> "DataFrame":
    """Deterministic corpus shuffle + sharding: ``(id, shard, pos)``.

    Training pipelines need the corpus in pseudo-random order, split
    into a fixed number of shards, REPRODUCIBLY — the same documents
    must land in the same shard at the same position on every rerun,
    on any cluster layout (resumable training, bug-for-bug replay).
    Randomness comes from the portable seeded md5 slice
    (operators/mixture.hash_unit): shard = hash-int mod n_shards,
    position = rank of the hash within the shard (id tiebreak for the
    measure-zero collision case).

    One shuffle on shard + one per-shard sort — exactly the cost of
    writing the shards. n_shards bounds the sort parallelism, so pick
    shards >= cores at scale (you want many shards anyway: shard
    count = training-loader parallelism).
    """
    from computer_vision_foundations_spark.operators.mixture import _HASH_DENOM, hash_unit

    _warn_if_undersharded(df, n_shards, "shard_assignment")
    h = (hash_unit(id_col, seed) * F.lit(_HASH_DENOM)).cast("long")
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), h.alias("_h"))
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )
