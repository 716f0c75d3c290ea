"""End-to-end training-corpus preparation — the flagship composition.

Everything between "raw scraped documents" and "packed training
sequences", chained from the individually oracle-verified operators:

    quality filter (+ repetition / surprisal gates) → domain cap
    → exact dedup → near-dup clustering → benchmark decontamination
    (bloom pre-screen + exact verify) → redaction → chunking
    → sequence packing

Each arrow is one of the engine's individually oracle-verified
operators; this module only supplies the glue and the
composition-level invariants (tests/test_corpus.py): no two surviving
chunks descend from documents in the same near-dup cluster, every
chunk fits ``chunk_tokens``, every packed bin starts within
``seq_len``, and with an eval set supplied no surviving chunk
descends from a contaminated document.

The decontamination stage is the production two-phase shape: the
Bloom pre-screen (broadcast bits, no false negatives) clears the
overwhelmingly-clean majority map-side, and the exact shingle-overlap
join runs ONLY on documents with ≥1 bloom hit — at 100 TB that is the
difference between joining the whole corpus against the eval shingles
and joining a tiny suspicious slice.

Shuffle budget of the whole pipeline, in order: one 16-byte-key hash
agg (exact dedup), one banded equi-join + a few label-table rounds
(near-dup), zero (redact), zero (chunk — row-local Generate), one
(pack). Document BODIES move through exactly two narrow projections
and are never a shuffle key.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from computer_vision_foundations_spark.functions.hashing import md5_hash_pair
from computer_vision_foundations_spark.functions.text import (
    quality_columns,
    repetition_columns,
)
from computer_vision_foundations_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
    redact_text,
)
from computer_vision_foundations_spark.operators.components import dedup_clusters
from computer_vision_foundations_spark.operators.dedup import (
    exact_duplicates,
    minhash_lsh_candidate_pairs,
)

__all__ = ["prepare_training_corpus"]


def prepare_training_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.25,
    max_dup_token_frac: float | None = None,
    max_top_bigram_frac: float | None = None,
    max_surprisal: float | None = None,
    max_dup_span_frac: float | None = None,
    span_n: int = 8,
    dsir_target: DataFrame | None = None,
    dsir_min_weight: float | None = None,
    domain_col: str | None = None,
    domain_cap: int | None = None,
    eval_df: DataFrame | None = None,
    decontaminate_k: int = 3,
    decontaminate_min_frac: float = 0.1,
    chunk_tokens: int = 32,
    overlap: int = 8,
    seq_len: int = 256,
    n_shards: int = 32,
    lsh_hash_fn: str = "xxhash64",
) -> DataFrame:
    """Raw documents → packed training chunks.

    Returns ``(doc_id, chunk_idx, chunk_text, n_tokens, shard, bin,
    offset)`` — deduplicated, redacted, chunked, and greedily packed
    into ~``seq_len``-token bins per shard. Near-duplicate clusters
    keep only their smallest doc_id (same keep-min policy as exact
    dedup), so the output provenance is deterministic."""
    # 1. quality gate (all-Catalyst score columns, one projection);
    # optional Gopher-style repetition gates ride the same scan
    scored = quality_columns(df, text_col)
    cond = (F.col("n_tokens") >= min_tokens) & (
        F.col("punct_ratio") <= max_punct_ratio
    )
    if max_dup_token_frac is not None or max_top_bigram_frac is not None:
        scored = repetition_columns(scored, text_col)
        if max_dup_token_frac is not None:
            cond = cond & (F.col("dup_token_frac") <= max_dup_token_frac)
        if max_top_bigram_frac is not None:
            cond = cond & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    keep_cols = [id_col, text_col] + (
        [domain_col] if domain_col and domain_cap is not None else []
    )
    kept = scored.filter(cond).select(*keep_cols)

    # 1b. surprisal gate: drop the high-perplexity-proxy tail (the
    # CCNet-style outlier filter; model = the surviving corpus itself)
    if max_surprisal is not None:
        from computer_vision_foundations_spark.operators.perplexity import (
            unigram_logprob_scores,
        )

        # compare on the 6-digit rounding (the repo-wide differential
        # convention): surprisal is a cross-engine float aggregate, and
        # a document sitting within FP-noise of the threshold must not
        # classify differently between Spark's and an oracle's
        # summation order
        ok = (
            unigram_logprob_scores(kept, text_col, id_col)
            .filter(F.round(F.col("surprisal"), 6) <= max_surprisal)
            .select(id_col)
        )
        kept = kept.join(ok, id_col, "left_semi")

    # 1c. head-domain cap: bound any single source's contribution
    if domain_col and domain_cap is not None:
        from computer_vision_foundations_spark.operators.sample import (
            group_cap_sample,
        )

        kept = group_cap_sample(kept, domain_col, id_col, domain_cap).select(
            id_col, text_col
        )

    # Persist at BOTH sides of exact dedup. The dedup stage consumes
    # the pre-dedup frame TWICE (keep-min hash agg + semi-join probe),
    # so without the first cache the scan → quality → surprisal →
    # domain-cap prefix replays in full inside the agg (measured ~3 s
    # of the composition at sf0.1; at 100 TB a whole corpus re-scan).
    # The post-dedup frame then feeds 5+ consumers (LSH candidates —
    # inside which connected components re-reads it across label
    # rounds — span/DSIR gates, decontamination, the final anti-joins),
    # so it gets its own cache and the pre-dedup one is released as
    # soon as it's materialized.
    pre = kept.persist(StorageLevel.MEMORY_AND_DISK)

    # Decontamination bloom mask built CONCURRENTLY with stages 1-3
    # (guide §2.6 overlap-independent-jobs, the z46 driver-pool
    # pattern): the 64 KiB eval-shingle bitmask depends only on
    # eval_df, but building it inline at stage 3b serialized its Spark
    # job behind every corpus materialization. The mask contents are a
    # deterministic set of bit positions — WHEN the job runs cannot
    # change the result.
    _mask_future = None
    _mask_pool = None
    eval_sh = None
    if eval_df is not None:
        from concurrent.futures import ThreadPoolExecutor

        from computer_vision_foundations_spark.operators.dedup import (
            _with_shingles,
        )
        from computer_vision_foundations_spark.operators.runtime_filter import (
            build_bloom_mask,
        )

        eval_sh = _with_shingles(
            eval_df, text_col, id_col, "eval_id", decontaminate_k
        ).select(F.explode("_shingles").alias("s"))
        _mask_pool = ThreadPoolExecutor(max_workers=1)
        _mask_future = _mask_pool.submit(build_bloom_mask, eval_sh, "s")

    pre.count()  # eager: consumers inside one job race cache population

    # 2. exact dedup: keep each distinct content's min id
    keepers = exact_duplicates(pre, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    kept = pre.join(keepers, id_col, "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # the PERSISTED handle itself — `kept` is reassigned by the
    # optional 2b/2c gates below, and unpersist() on a derived frame
    # is a silent no-op (the cache would stay pinned through the rest
    # of the pipeline)
    cached_stage2 = kept
    kept.count()
    pre.unpersist()

    # 2b. substring-span gate: drop documents dominated by verbatim
    # cross-document spans (the Lee et al. signal — boilerplate and
    # template farms score high even when no WHOLE doc is a dup)
    if max_dup_span_frac is not None:
        from computer_vision_foundations_spark.operators.spans import (
            duplicated_span_stats,
        )

        ok = (
            duplicated_span_stats(
                kept, id_col=id_col, text_col=text_col, n=span_n
            )
            .filter(F.col("dup_fraction") <= max_dup_span_frac)
            .select(id_col)
        )
        kept = kept.join(ok, id_col, "left_semi")

    # 2c. DSIR gate: keep documents that look at least ``dsir_min_weight``
    # more target-like than raw (importance-resampling style selection)
    if dsir_target is not None and dsir_min_weight is not None:
        from computer_vision_foundations_spark.operators.dsir import (
            dsir_logratio_weights,
        )

        ok = (
            dsir_logratio_weights(kept, dsir_target, text_col, id_col)
            .filter(F.col("dsir_weight") >= dsir_min_weight)
            .select(id_col)
        )
        kept = kept.join(ok, id_col, "left_semi")

    # 3. near-dup clusters -> drop everything but the canonical doc
    pairs = minhash_lsh_candidate_pairs(
        kept, text_col, id_col, k=3, n_hashes=8, bands=4,
        hash_fn=lsh_hash_fn,
        repartition_to=df.sparkSession.sparkContext.defaultParallelism,
    )
    losers = (
        dedup_clusters(pairs)
        .filter(~F.col("is_canonical"))
        .select(F.col("doc_id").alias(id_col))
    )
    kept = kept.join(F.broadcast(losers), id_col, "left_anti")
    if eval_df is not None:
        # decontamination consumes this frame THREE times (the suspect
        # shingle scan, the exact-verify probe, and the final
        # anti-join) and each consumer would otherwise replay the LSH
        # candidate chain + label rounds above from the stage-2 cache
        # (measured: ~20 s → ~11 s for the sf0.1 composition); cache
        # the post-near-dup corpus once and release the stage-2 cache
        # it supersedes
        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
        kept.count()
        cached_stage2.unpersist()

    # 3b. benchmark decontamination, two-phase: bloom pre-screen on
    # eval shingles (no false negatives — zero-hit docs are provably
    # clean and never enter the exact join), exact overlap verify on
    # the suspicious slice only.
    if eval_df is not None:
        from computer_vision_foundations_spark.operators.decontaminate import (
            contamination_pairs,
        )
        from computer_vision_foundations_spark.operators.dedup import (
            _with_shingles,
        )
        from computer_vision_foundations_spark.operators.runtime_filter import (
            bloom_runtime_filter,
        )

        train_sh = _with_shingles(
            kept, text_col, id_col, "_tid", decontaminate_k
        ).select("_tid", F.explode("_shingles").alias("s"))
        # map-side pre-screen: the eval shingles collapse to the 64 KiB
        # driver bitmask and every training shingle is tested AT THE
        # SCAN (Arrow-batched gather, no false negatives) — the
        # previous shape shuffled the full shingle stream TWICE (a
        # global distinct, then a semi-join against the maybe-members);
        # only the suspicious doc ids shuffle now, and they are few.
        # The mask job overlapped stages 1-3 on the driver pool above;
        # .result() re-raises any build failure here.
        _mask = _mask_future.result()
        _mask_pool.shutdown()
        suspects = (
            bloom_runtime_filter(train_sh, eval_sh, "s", mask=_mask)
            .select(F.col("_tid").alias(id_col))
            .distinct()
        )
        confirmed = (
            contamination_pairs(
                kept.join(suspects, id_col, "left_semi"),
                eval_df,
                text_col,
                id_col,
                k=decontaminate_k,
                min_frac=decontaminate_min_frac,
            )
            .select(F.col("train_id").alias(id_col))
            .distinct()
        )
        kept = kept.join(F.broadcast(confirmed), id_col, "left_anti")

    # 4-5. redact, then chunk (both row-local)
    clean = redact_text(kept, text_col)
    chunks = chunk_documents(
        clean, text_col, id_col, chunk_tokens=chunk_tokens, overlap=overlap
    )

    # 6. pack chunks into training bins; composite int id keeps the
    # within-shard order deterministic (doc, then chunk position)
    chunks = chunks.withColumn(
        "_chunk_id", F.col(id_col) * 10_000 + F.col("chunk_idx")
    )
    h1, _ = md5_hash_pair(F.col(id_col).cast("string"))
    packed = pack_sequences(
        chunks,
        "n_tokens",
        id_col="_chunk_id",
        seq_len=seq_len,
        shard_col=h1 % n_shards,
    )
    return packed.select(
        id_col, "chunk_idx", "chunk_text", "n_tokens", "shard", "bin", "offset"
    )
