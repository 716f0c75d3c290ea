"""Registry slice — see computer_vision_foundations_spark/queries/__init__.py."""
from __future__ import annotations

from computer_vision_foundations_spark.queries.common import (  # noqa: F401
    DataFrame,
    F,
    STOPWORDS,
    SparkSession,
    Window,
    _ORACLES,
    _register,
    exact_duplicates,
    load_table,
    minhash_lsh_candidate_pairs,
    minhash_signatures,
)
from computer_vision_foundations_spark.queries.part_a import (  # noqa: F401
    _IVF_CELLS,
    _IVF_DIM,
    _IVF_PROBE_CELLS,
    _IVF_SEED,
    _SHINGLES_SQL,
    _minhash_perm_sql,
    _simhash_oracle_sql,
    _training_corpus_oracle_sql,
    za23_lsh_candidate_pairs,
    za24_knn_cosine,
    q90_ngram_jaccard_pairs,
    q92_simhash,
    z29_lsh_ann,
    z32_multiprobe_lsh_ann,
)



@_register("za59_training_corpus", _training_corpus_oracle_sql())
def za59_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition (operators/corpus.prepare_training_corpus)
    with the FULL stage list: quality filter → surprisal gate →
    per-domain cap → exact dedup → near-dup clustering → benchmark
    decontamination (bloom pre-screen + exact verify; eval set = every
    50th doc) → redaction → chunking → sequence packing — every stage
    an operator whose correctness is individually oracle-verified, and
    (round 4) the COMPOSITION verified end-to-end against a DuckDB
    twin that chains the per-stage oracle fragments as MATERIALIZED
    CTEs, with the near-dup clustering as a recursive closure. The
    portable md5 MinHash family replaces xxhash64 here so the oracle
    rebuilds identical signatures (production callers keep the faster
    default); composition-level invariants remain in
    tests/test_corpus.py."""
    from computer_vision_foundations_spark.operators.corpus import (
        prepare_training_corpus,
    )

    from computer_vision_foundations_spark.operators.parallelism import (
        widen_if_under_parallel,
    )

    # the pipeline's first stages (tokenize-heavy quality + surprisal
    # gates, MinHash signatures) are CPU-bound projections: widen a
    # single-split scan before fan-in (no-op at scale)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents"))
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return prepare_training_corpus(
        train,
        max_surprisal=14.0,
        domain_col="source",
        domain_cap=1_000_000,
        eval_df=eval_df,
        decontaminate_min_frac=0.5,
        lsh_hash_fn="md5",
    )


@_register(
    "z13_udtf_sentences",
    """
    WITH synth AS (
      SELECT doc_id,
             regexp_replace(text, ' (value|table) ', '. ', 'g') AS text
      FROM documents
    ),
    marked AS (
      SELECT doc_id,
             string_split(
               regexp_replace(text, '([.!?]) +', '\\1' || chr(1), 'g'),
               chr(1)) AS parts
      FROM synth
    ),
    sents AS (
      SELECT doc_id, trim(unnest(parts)) AS sentence FROM marked
    )
    SELECT doc_id, sentence,
           len(string_split(sentence, ' ')) AS n_words
    FROM sents WHERE sentence <> ''
    """,
)
def z13_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (functions/udtfs.SplitSentences) driven
    through SQL LATERAL: sentence punctuation is synthesized
    deterministically (same regexp_replace both engines), the UDTF
    segments each document, and the oracle reproduces the split with
    RE2-safe replace-then-split (no lookbehind in DuckDB). sent_idx
    is omitted from the result on purpose — the driver hash is
    order-insensitive and the index is positional noise."""
    from computer_vision_foundations_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents")
    docs.select(
        "doc_id",
        F.regexp_replace("text", " (value|table) ", ". ").alias("text"),
    ).createOrReplaceTempView("_q62_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence, s.n_words
        FROM _q62_docs d, LATERAL split_sentences(d.text) s
        """
    )


# ---------------------------------------------------------------------------
# Product quantization (the IVF-PQ compression layer)
# ---------------------------------------------------------------------------

_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED = 64, 8, 16, 42


def _pq_dist_arrays_sql() -> list[str]:
    """One DuckDB ``[dist, ...]`` literal-codebook array per subvector:
    ``||c||² − 2 · slice(v)·c``. The ``||c||²`` constants are emitted
    from the SAME numpy computation the Spark operator uses, so both
    engines share identical f64 constants; the dots are sequential
    ascending-index on both sides (operators/quantization._seq_scores
    vs DuckDB list_dot_product)."""
    import numpy as np

    from computer_vision_foundations_spark.operators.quantization import (
        pq_codebooks,
    )

    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    sub_dim = _PQ_DIM // _PQ_SUBS
    arrays = []
    for s, cb in enumerate(cbs):
        c_norms = (np.asarray(cb, dtype=np.float64) ** 2).sum(axis=1)
        dists = ", ".join(
            f"({float(c_norms[i])!r} - 2.0 * list_dot_product("
            f"list_slice(v, {s * sub_dim + 1}, {(s + 1) * sub_dim}), "
            f"[{', '.join(repr(float(x)) for x in cb[i])}]))"
            for i in range(len(cb))
        )
        arrays.append(f"[{dists}]")
    return arrays


def _pq_codes_cte() -> str:
    ds = _pq_dist_arrays_sql()
    d_cols = ", ".join(f"{a} AS d{s}" for s, a in enumerate(ds))
    code_cols = ", ".join(
        f"CAST(list_position(d{s}, list_min(d{s})) - 1 AS INT)"
        for s in range(_PQ_SUBS)
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    d AS (
      SELECT vec_id, v, {d_cols} FROM emb
    ),
    codes AS (
      SELECT vec_id, [{code_cols}] AS codes FROM d
    )"""


def _pq_codes_oracle_sql() -> str:
    return f"""
    {_pq_codes_cte()}
    SELECT vec_id, array_to_string(codes, ',') AS codes_key FROM codes
    """


def _pq_adc_oracle_sql() -> str:
    score = " + ".join(
        f"p.d{s}[c.codes[{s + 1}] + 1]" for s in range(_PQ_SUBS)
    )
    return f"""
    {_pq_codes_cte()}
    SELECT probe_id, neighbor_id, adc_score, rank FROM (
      SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             round({score}, 6) AS adc_score,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY round({score}, 6) ASC, c.vec_id ASC) AS rank
      FROM d p JOIN codes c ON p.vec_id < 5 AND c.vec_id <> p.vec_id) t
    WHERE rank <= 10
    """


@_register("z21_pq_codes", _pq_codes_oracle_sql())
def z21_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode (operators/quantization.pq_encode):
    every embedding compressed to 8 nearest-centroid codes from seeded
    per-subvector codebooks — the representation the ADC scan reads at
    scale. The oracle replays the codebooks as SQL literals with
    matching f64 constants and summation order, so the codes are
    hash-checked bit-for-bit."""
    from computer_vision_foundations_spark.operators.quantization import (
        pq_codebooks,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    return pq_encode(emb, cbs).select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda x: x.cast("string")), ","
        ).alias("codes_key"),
    )


@_register("z26_pq_adc_knn", _pq_adc_oracle_sql())
def z26_pq_adc_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10 per probe
    (operators/quantization.pq_adc_topk): probes precompute a 128-entry
    distance LUT, candidates are scored by 8 array lookups over their
    codes — the corpus-side scan never touches a float vector. The
    oracle recomputes LUT and scores from the same literal codebooks."""
    from computer_vision_foundations_spark.operators.quantization import (
        pq_adc_topk,
        pq_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    return pq_adc_topk(emb, probes, cbs, k=10)


_MIX_WEIGHTS = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0, "src4": 1.0, "src5": 1.0}
_MIX_BUDGET, _MIX_SEED = 20_000.0, 42


def _mixture_oracle_sql() -> str:
    total_w = sum(_MIX_WEIGHTS.values())
    values = ", ".join(f"('{k}', {v!r})" for k, v in _MIX_WEIGHTS.items())
    return f"""
    WITH sizes AS (
      SELECT source AS domain, CAST(sum(n_chars) AS DOUBLE) AS n_tokens
      FROM documents GROUP BY 1
    ),
    fracs AS (
      SELECT domain,
             least(1.0, {_MIX_BUDGET!r} * w / {total_w!r} / n_tokens) AS keep_frac
      FROM sizes JOIN (VALUES {values}) AS wt(domain, w) USING (domain)
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d JOIN fracs f ON d.source = f.domain
    WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':{_MIX_SEED}'), 1, 7)) AS BIGINT)
          / 268435456.0 < f.keep_frac
    """


@_register("z14_mixture_sample", _mixture_oracle_sql())
def z14_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture sampling (operators/mixture.mixture_sample): six
    weighted sources re-balanced to a 20k-char budget, membership
    decided by a seeded md5 hash threshold — deterministic across
    cluster layouts and replayed exactly by the oracle (same 28-bit
    md5 slice, same left-to-right double math). Unweighted sources
    drop out; over-subscribed ones cap at keep_frac 1.0."""
    from computer_vision_foundations_spark.operators.mixture import (
        mixture_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        docs,
        _MIX_WEIGHTS,
        _MIX_BUDGET,
        domain_col="source",
        id_col="doc_id",
        token_col="n_chars",
        seed=_MIX_SEED,
    ).select("doc_id", "source", "n_chars")


_EPOCH_WEIGHTS = {"src0": 3.0, "src1": 1.0}
_EPOCH_BUDGET, _EPOCH_MAX = 40_000.0, 4.0


def _mixture_epochs_oracle_sql() -> str:
    total_w = sum(_EPOCH_WEIGHTS.values())
    values = ", ".join(f"('{k}', {v!r})" for k, v in _EPOCH_WEIGHTS.items())
    return f"""
    WITH sizes AS (
      SELECT source AS domain, CAST(sum(n_chars) AS DOUBLE) AS n_tokens
      FROM documents GROUP BY 1
    ),
    fracs AS (
      SELECT domain,
             least({_EPOCH_MAX!r}, {_EPOCH_BUDGET!r} * w / {total_w!r} / n_tokens) AS f
      FROM sizes JOIN (VALUES {values}) AS wt(domain, w) USING (domain)
    ),
    sel AS (
      SELECT d.doc_id, d.source, d.n_chars,
             CAST(floor(f.f) AS INT)
             + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':42'), 1, 7)) AS BIGINT)
                         / 268435456.0 < f.f - floor(f.f)
                    THEN 1 ELSE 0 END AS n
      FROM documents d JOIN fracs f ON d.source = f.domain
    )
    SELECT doc_id, source, n_chars,
           CAST(unnest(generate_series(1, n)) AS INT) AS epoch
    FROM sel WHERE n >= 1
    """


@_register("z28_mixture_epochs", _mixture_epochs_oracle_sql())
def z28_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling WITH repetition
    (operators/mixture.mixture_sample_with_repetition): under-target
    domains upsample by whole epochs plus a hash-selected remainder,
    so expected tokens hit the target exactly; replication is map-side
    explode, no shuffle. Oracle replays fraction math, hash remainder,
    and epoch fan-out via generate_series."""
    from computer_vision_foundations_spark.operators.mixture import (
        mixture_sample_with_repetition,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample_with_repetition(
        docs,
        _EPOCH_WEIGHTS,
        _EPOCH_BUDGET,
        domain_col="source",
        id_col="doc_id",
        token_col="n_chars",
        seed=42,
        max_repeat=_EPOCH_MAX,
    ).select("doc_id", "source", "n_chars", "epoch")


def _ann_recall_oracle_sql(approx_key: str = "z29_lsh_ann") -> str:
    """Recall of an ANN index against brute-force ground truth,
    composed from the two queries' own oracle bodies (nested-WITH
    derived tables are standard SQL; DuckDB executes them as-is)."""
    exact = _ORACLES["za24_knn_cosine"]
    approx = _ORACLES[approx_key]
    return f"""
    SELECT p.probe_id, coalesce(h.n_hits, 0) AS n_hits,
           round(coalesce(h.n_hits, 0)
                 / CAST(least(10, p.n_exact) AS DOUBLE), 6) AS recall
    FROM (SELECT probe_id, count(*) AS n_exact
          FROM ({exact}) e0 GROUP BY probe_id) p
    LEFT JOIN (
      SELECT a.probe_id, count(*) AS n_hits
      FROM ({approx}) a JOIN ({exact}) e USING (probe_id, neighbor_id)
      GROUP BY a.probe_id
    ) h USING (probe_id)
    """


@_register("z31_ann_recall", _ann_recall_oracle_sql())
def z31_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-quality evaluation as a relational operator
    (operators/evaluation.ann_recall): recall@10 of the hyperplane-LSH
    index (q33) against brute-force ground truth (q27), per probe.
    The oracle composes both queries' own oracle SQL, so retrieval AND
    evaluation are differentially checked end-to-end."""
    from computer_vision_foundations_spark.operators.evaluation import (
        ann_recall,
    )

    return ann_recall(
        z29_lsh_ann(spark, sf_dir), za24_knn_cosine(spark, sf_dir), k=10
    )


@_register(
    "za27_decontamination_pairs",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    e AS (SELECT doc_id AS eval_id, len(shingles) AS esize, shingles
          FROM sh WHERE doc_id % 50 = 0),
    t AS (SELECT doc_id AS train_id, shingles FROM sh WHERE doc_id % 50 <> 0),
    te AS (SELECT train_id, unnest(shingles) AS s FROM t),
    ee AS (SELECT eval_id, esize, unnest(shingles) AS s FROM e),
    pairs AS (
      SELECT train_id, eval_id, esize, count(*) AS common
      FROM te JOIN ee USING (s) GROUP BY 1, 2, 3
    )
    SELECT train_id, eval_id, common,
           round(CAST(common AS DOUBLE) / CAST(esize AS DOUBLE), 6) AS overlap_frac
    FROM pairs
    WHERE CAST(common AS DOUBLE) / CAST(esize AS DOUBLE) >= 0.04
    """,
)
def za27_decontamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination
    (operators/decontaminate.contamination_pairs): training docs
    sharing >=4% of an eval doc's 3-gram shingles (eval set = every
    50th doc; the low threshold is sized to the synthetic corpus's
    overlap tail so the check exercises ~55 pairs). The eval shingle set is broadcast, so the corpus is
    scanned once map-side and shuffles only (train, eval) id pairs —
    the 100 TB shape for corpus-vs-benchmark screening."""
    from computer_vision_foundations_spark.operators.decontaminate import (
        contamination_pairs,
    )

    from computer_vision_foundations_spark.operators.parallelism import (
        widen_if_under_parallel,
    )

    # the pipeline's first stages (tokenize-heavy quality + surprisal
    # gates, MinHash signatures) are CPU-bound projections: widen a
    # single-split scan before fan-in (no-op at scale)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents"))
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_pairs(train, eval_df, k=3, min_frac=0.04)


@_register(
    "z17_quality_gate",
    """
    WITH scored AS (
      SELECT doc_id, source,
             round(len(list_filter(string_split(text, ' '),
                       x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                   / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS quality
      FROM documents
    ),
    r AS (
      SELECT doc_id, source, quality,
             percent_rank() OVER (
               PARTITION BY source
               ORDER BY quality DESC, doc_id ASC) AS pr
      FROM scored
    )
    SELECT doc_id, source, quality, round(pr, 6) AS pct_rank
    FROM r WHERE pr <= 0.25
    """,
)
def z17_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quality gate
    (operators/mixture.top_fraction_per_group): keep the top 25% of
    documents per source by stopword-density quality score. The
    percent_rank runs over a total order (score desc, doc_id asc), so
    both engines select the identical rows."""
    from computer_vision_foundations_spark.functions.text import (
        STOPWORDS,
        stopword_ratio,
    )
    from computer_vision_foundations_spark.operators.mixture import (
        top_fraction_per_group,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.round(stopword_ratio(F.col("text"), STOPWORDS["en"]), 6).alias(
            "quality"
        ),
    )
    return top_fraction_per_group(
        docs, "source", "quality", 0.25, tiebreak_col="doc_id"
    )


@_register(
    "z18_shard_assignment",
    """
    WITH h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 7)) AS BIGINT) AS hv
      FROM documents
    )
    SELECT doc_id, CAST(hv % 32 AS INT) AS shard,
           CAST(row_number() OVER (
             PARTITION BY hv % 32 ORDER BY hv ASC, doc_id ASC) AS INT) AS pos
    FROM h
    """,
)
def z18_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + sharding
    (operators/chunking.shard_assignment): every document gets a
    reproducible (shard, position) from the seeded md5 hash — the
    training-order assignment that must replay identically across
    reruns and cluster layouts. The oracle recomputes the identical
    hash, modulo, and per-shard rank."""
    from computer_vision_foundations_spark.operators.chunking import (
        shard_assignment,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = shard_assignment(docs, "doc_id", n_shards=32, seed=42)
    return out.select("doc_id", "shard", F.col("pos").cast("int").alias("pos"))


@_register(
    "z51_vocab_coverage",
    """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, count(*) AS n FROM toks WHERE token <> '' GROUP BY 1
    ),
    top AS (
      SELECT token, n FROM counts ORDER BY n DESC, token ASC LIMIT 100
    )
    SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS INT) AS rank,
           round(CAST(sum(n) OVER (ORDER BY n DESC, token ASC
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / (SELECT CAST(sum(n) AS DOUBLE) FROM counts), 6) AS cum_share
    FROM top
    """,
)
def z51_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 vocabulary with cumulative corpus coverage
    (operators/vocab.vocab_top_k). The top-V runs as
    TakeOrderedAndProject (per-partition heaps, no global sort of the
    corpus-sized count table); the cumulative window sees only V rows."""
    from computer_vision_foundations_spark.operators.vocab import vocab_top_k

    docs = load_table(spark, sf_dir, "documents")
    out = vocab_top_k(docs, "text", k=100)
    return out.select("token", "n", F.col("rank").cast("int").alias("rank"), "cum_share")


@_register(
    "z54_pmi_bigrams",
    """
    WITH toked AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS bigram
      FROM toked
    ),
    uni AS (
      SELECT token, count(*) AS n_u
      FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> '' GROUP BY 1
    ),
    big AS (
      SELECT bigram, count(*) AS n_ab FROM pairs GROUP BY 1
    )
    SELECT bigram, n_ab,
           round(ln((CAST(n_ab AS DOUBLE) / (SELECT CAST(sum(n_ab) AS DOUBLE) FROM big))
                    / ((CAST(a.n_u AS DOUBLE) / (SELECT CAST(sum(n_u) AS DOUBLE) FROM uni))
                       * (CAST(b.n_u AS DOUBLE) / (SELECT CAST(sum(n_u) AS DOUBLE) FROM uni)))),
                 6) AS pmi
    FROM big
    JOIN uni a ON string_split(bigram, ' ')[1] = a.token
    JOIN uni b ON string_split(bigram, ' ')[2] = b.token
    WHERE n_ab >= 5
    ORDER BY pmi DESC, bigram ASC LIMIT 50
    """,
)
def z54_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PMI collocations over adjacent token pairs
    (operators/vocab.pmi_bigrams): two hash aggregates + two equi-joins
    on token; only (token, count) rows shuffle. Both engines compute
    the identical ln-ratio expression, rounded to 6."""
    from computer_vision_foundations_spark.operators.vocab import pmi_bigrams

    docs = load_table(spark, sf_dir, "documents")
    return pmi_bigrams(docs, "text", min_count=5, k=50)


def _simhash_pairs_oracle_sql(bits: int = 32, bands: int = 4, max_hamming: int = 3) -> str:
    """Hamming-LSH pairs over the portable-md5 SimHash CTE: band
    equi-join candidates, exact bit_count(xor) filter."""
    width = bits // bands
    mask = (1 << width) - 1
    base = _simhash_oracle_sql(bits)
    return f"""
    WITH sh AS ({base}),
    banded AS (
      SELECT doc_id, simhash, i AS band_idx,
             (simhash >> (i * {width})) & {mask} AS band_val
      FROM sh CROSS JOIN generate_series(0, {bands - 1}) AS g(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.simhash AS sa, b.simhash AS sb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


@_register("za63_simhash_near_dup_pairs", _simhash_pairs_oracle_sql())
def za63_simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs (operators/dedup.simhash_pairs):
    Hamming-LSH pigeonhole banding — fingerprints within Hamming
    distance bands-1 must share a band, so candidates come from an
    equi-join on (band_idx, band_val), never all-pairs. Both the
    portable fingerprints (the simhash query's md5 family) and the pairing are
    replayed by the oracle."""
    from computer_vision_foundations_spark.operators.dedup import (
        simhash_pairs,
    )

    fingerprints = q92_simhash(spark, sf_dir)
    return simhash_pairs(
        fingerprints, "simhash", "doc_id", bits=32, bands=4, max_hamming=3
    )


def _ivf_pq_oracle_sql() -> str:
    """IndexIVFPQ composed oracle: the IVF centroid-distance literals
    (q36's construction) pick each vector's cell and each probe's
    n_probe_cells nearest cells; the PQ codebook literals (q63/q64's
    construction) give codes and the probe LUT; ADC score = 8 list
    lookups, ranked per probe."""
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    cents = random_centroids(_IVF_DIM, _IVF_CELLS, _IVF_SEED)
    cdists = ", ".join(
        f"({sum(x * x for x in c)!r} - 2.0 * list_dot_product(v, "
        f"[{', '.join(repr(x) for x in c)}]))"
        for c in cents
    )
    ds = _pq_dist_arrays_sql()
    d_cols = ", ".join(f"{a} AS d{s}" for s, a in enumerate(ds))
    code_cols = ", ".join(
        f"CAST(list_position(d{s}, list_min(d{s})) - 1 AS INT)"
        for s in range(_PQ_SUBS)
    )
    score = " + ".join(f"p.d{s}[c.codes[{s + 1}] + 1]" for s in range(_PQ_SUBS))
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    d AS (
      SELECT vec_id, v, [{cdists}] AS cdists, {d_cols} FROM emb
    ),
    corpus AS (
      SELECT vec_id AS neighbor_id,
             CAST(list_position(cdists, list_min(cdists)) - 1 AS INT) AS cell,
             [{code_cols}] AS codes
      FROM d
    ),
    probe_fan AS (
      SELECT *, vec_id AS probe_id, i - 1 AS cell,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY cdists[i] ASC, i ASC) AS cell_rank
      FROM d CROSS JOIN generate_series(1, {_IVF_CELLS}) AS t(i)
      WHERE vec_id < 5
    )
    SELECT probe_id, neighbor_id, adc_score, rank FROM (
      SELECT p.probe_id, c.neighbor_id,
             round({score}, 6) AS adc_score,
             row_number() OVER (
               PARTITION BY p.probe_id
               ORDER BY round({score}, 6) ASC, c.neighbor_id ASC) AS rank
      FROM probe_fan p
      JOIN corpus c ON p.cell = c.cell AND p.probe_id <> c.neighbor_id
      WHERE p.cell_rank <= {_IVF_PROBE_CELLS}) t
    WHERE rank <= 10
    """


@_register("za64_ivf_pq_ann", _ivf_pq_oracle_sql())
def za64_ivf_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ composed index (operators/quantization.ivf_pq_topk, the
    FAISS IndexIVFPQ shape): corpus persisted as (id, cell, codes) in
    one Arrow projection, probes fan out to their 4 nearest cells with
    a precomputed ADC LUT, candidates scored by 8 array lookups inside
    the cell equi-join — float vectors never cross a shuffle. Both the
    coarse quantizer (q36's centroid literals) and the codebooks
    (q63/q64's) are replayed by the oracle, so the composition is
    hash-checked end-to-end."""
    from computer_vision_foundations_spark.operators.quantization import (
        ivf_pq_topk,
        pq_codebooks,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    cents = random_centroids(_IVF_DIM, _IVF_CELLS, _IVF_SEED)
    return ivf_pq_topk(
        emb, probes, cbs, cents, k=10, n_probe_cells=_IVF_PROBE_CELLS
    )





_BM25_QUERIES = [
    (0, ["hash", "join", "scan"]),
    (1, ["vector", "data", "column"]),
    (2, ["customer", "order", "merge", "window"]),
]


def _bm25_oracle_sql(k1: float = 1.2, b: float = 0.75) -> str:
    values = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return f"""
    WITH q(query_id, term) AS (VALUES {values}),
    stats AS (
      SELECT count(*)::DOUBLE AS n_docs,
             avg(len(string_split(text, ' '))) AS avgdl
      FROM documents
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term <> '' AND term IN (SELECT DISTINCT term FROM q)
      GROUP BY 1, 2
    ),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    dl AS (
      SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl FROM documents
    )
    SELECT query_id, doc_id, bm25, rank FROM (
      SELECT q.query_id, tf.doc_id,
             round(sum(
               ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
               * (tf.tf * {k1 + 1.0})
               / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / s.avgdl))
             ), 4) AS bm25,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY round(sum(
                 ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
                 * (tf.tf * {k1 + 1.0})
                 / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / s.avgdl))
               ), 4) DESC, tf.doc_id ASC) AS rank
      FROM tf
      JOIN dft USING (term)
      JOIN dl USING (doc_id)
      JOIN q USING (term)
      CROSS JOIN stats s
      GROUP BY q.query_id, tf.doc_id) t
    WHERE rank <= 10
    """


@_register("za55_bm25_search", _bm25_oracle_sql())
def za55_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per query (operators/retrieval.bm25_topk) —
    sparse ranked retrieval over the documents table, the keyword
    sibling of the ANN family. The token stream is semi-joined against
    the broadcast query vocabulary BEFORE the tf aggregate, df/idf
    stats are broadcast back, and corpus N/avgdl ride a single-row
    broadcast cross join (no driver collect). The oracle recomputes
    tf/df/idf and the exact scoring formula in SQL."""
    from computer_vision_foundations_spark.operators.retrieval import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, terms array<string>"
    )
    return bm25_topk(docs, queries_df, k=10)


@_register(
    "za57_repetition_signals",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    b AS (
      SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS bigrams
      FROM t
    )
    SELECT doc_id,
      CASE WHEN len(toks) > 0 THEN round(
        (len(toks) - len(list_distinct(toks))) / CAST(len(toks) AS DOUBLE), 6)
        ELSE 0.0 END AS dup_token_frac,
      CASE WHEN len(toks) > 0 THEN round(
        list_max(list_transform(list_distinct(toks),
                 d -> len(list_filter(toks, x -> x = d))))
        / CAST(len(toks) AS DOUBLE), 6) ELSE 0.0 END AS top_token_frac,
      CASE WHEN len(bigrams) > 0 THEN round(
        (len(bigrams) - len(list_distinct(bigrams)))
        / CAST(len(bigrams) AS DOUBLE), 6) ELSE 0.0 END AS dup_bigram_frac,
      CASE WHEN len(bigrams) > 0 THEN round(
        list_max(list_transform(list_distinct(bigrams),
                 d -> len(list_filter(bigrams, x -> x = d))))
        / CAST(len(bigrams) AS DOUBLE), 6) ELSE 0.0 END AS top_bigram_frac
    FROM b
    """,
)
def za57_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate quality signals
    (functions/text.repetition_columns): duplicate-token, top-token,
    duplicate-bigram and top-bigram fractions per document — the
    standard gates for dropping repetitive low-value training text.
    All-Catalyst HOF expressions; the oracle mirrors them with DuckDB
    list functions."""
    from computer_vision_foundations_spark.functions.text import (
        repetition_columns,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repetition_columns(docs).select(
        "doc_id",
        "dup_token_frac",
        "top_token_frac",
        "dup_bigram_frac",
        "top_bigram_frac",
    )


_KM_DIM, _KM_CLUSTERS, _KM_SEED = 64, 8, 42


def _kmeans_step_oracle_sql() -> str:
    """One Lloyd update from the seeded init centroids, replayed as SQL
    literals (the IVF oracle's distance construction): assignment =
    first argmin, new centroid = per-dimension member mean."""
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    cents = random_centroids(_KM_DIM, _KM_CLUSTERS, _KM_SEED)
    dists = ", ".join(
        f"({sum(x * x for x in c)!r} - 2.0 * list_dot_product(v, "
        f"[{', '.join(repr(x) for x in c)}]))"
        for c in cents
    )
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    d AS (
      SELECT vec_id, v, [{dists}] AS dists FROM emb
    ),
    assigned AS (
      SELECT v, CAST(list_position(dists, list_min(dists)) - 1 AS INT) AS cluster
      FROM d
    )
    SELECT cluster, CAST(i - 1 AS INT) AS pos,
           round(avg(v[i]), 6) AS mean, count(*) AS n_members
    FROM assigned CROSS JOIN generate_series(1, {_KM_DIM}) AS t(i)
    GROUP BY cluster, i
    """


@_register("za41_kmeans_step", _kmeans_step_oracle_sql())
def za41_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd k-means update
    (operators/clustering.kmeans_update_table): Arrow-batched
    nearest-centroid assignment + ONE hash aggregate of unrolled
    per-dimension sums (map-side combine; vectors never shuffle),
    flattened to (cluster, pos, mean, n_members) so the oracle can
    hash-check the step. kmeans_fit iterates exactly this aggregate to
    train real IVF/IVF-PQ coarse quantizers in-engine."""
    from computer_vision_foundations_spark.operators.clustering import (
        kmeans_update_table,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cents = random_centroids(_KM_DIM, _KM_CLUSTERS, _KM_SEED)
    return kmeans_update_table(emb, cents, round_digits=6)

def _rrf_oracle_sql(k: int = 10, rrf_k: int = 60, recency_n: int = 50) -> str:
    """Fusion oracle: the BM25 oracle body (top-10 per query) RRF-fused
    with a recency prior (top-50 newest doc_ids per query). Two addends
    per (query, doc) — IEEE order-insensitive — so round 6 hash-matches."""
    bm25 = _bm25_oracle_sql()
    return f"""
    WITH bm AS ({bm25}),
    recency AS (
      SELECT q.query_id, d.doc_id,
             row_number() OVER (PARTITION BY q.query_id
                                ORDER BY d.doc_id DESC) AS rank
      FROM (SELECT DISTINCT query_id FROM bm) q
      CROSS JOIN documents d
      QUALIFY rank <= {recency_n}
    ),
    u AS (
      SELECT query_id, doc_id, 1.0 / ({rrf_k} + rank) AS c FROM bm
      UNION ALL
      SELECT query_id, doc_id, 1.0 / ({rrf_k} + rank) AS c FROM recency
    ),
    fused AS (
      SELECT query_id, doc_id, round(sum(c), 6) AS rrf_score,
             count(*) AS n_rankers
      FROM u GROUP BY 1, 2
    )
    SELECT query_id, doc_id, rrf_score, n_rankers, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_score DESC, doc_id ASC) AS rank
      FROM fused) t
    WHERE rank <= {k}
    """


@_register("za18_rrf_fusion", _rrf_oracle_sql())
def za18_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval fusion (operators/retrieval.rrf_fuse):
    reciprocal-rank fusion of the BM25 top-10 (q04) with a recency
    prior (50 newest docs per query) — rank-only combination, no score
    calibration. Union of two top-k lists + one hash aggregate + one
    window; both input rankings and the fusion replay in the oracle."""
    from computer_vision_foundations_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )

    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, terms array<string>"
    )
    bm = bm25_topk(docs, queries_df, k=10)
    # the recency prior is QUERY-INDEPENDENT: rank the 50 newest docs
    # ONCE (TakeOrderedAndProject — no per-query corpus window, which
    # would funnel |docs| rows through one task per query), then cross
    # the 50-row list with the broadcast query ids — both cross sides
    # are constant-bounded
    top50 = (
        docs.select("doc_id")
        .orderBy(F.col("doc_id").desc())
        .limit(50)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("doc_id").desc())),
        )
    )
    recency = top50.crossJoin(
        F.broadcast(queries_df.select("query_id").distinct())
    )
    return rrf_fuse([bm, recency], k=10)


@_register("z19_ivf_pq_recall", _ann_recall_oracle_sql("za64_ivf_pq_ann"))
def z19_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the composed IVF-PQ index (q50) against brute-force
    cosine ground truth (q27) via operators/evaluation.ann_recall — the
    quality dial a real deployment tunes (n_probe_cells × codebook
    size). Both retrievals AND the evaluation replay in the oracle."""
    from computer_vision_foundations_spark.operators.evaluation import (
        ann_recall,
    )

    return ann_recall(
        za64_ivf_pq_ann(spark, sf_dir), za24_knn_cosine(spark, sf_dir), k=10
    )


@_register(
    "z20_multiprobe_recall", _ann_recall_oracle_sql("z32_multiprobe_lsh_ann")
)
def z20_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of multi-probe LSH (q36) against brute-force ground
    truth (q27): the evidence that probe-side bucket fan-out buys
    recall without touching the corpus index (compare with q34, the
    single-probe LSH recall). Oracle composes both queries' own oracle
    bodies end-to-end."""
    from computer_vision_foundations_spark.operators.evaluation import (
        ann_recall,
    )

    return ann_recall(
        z32_multiprobe_lsh_ann(spark, sf_dir), za24_knn_cosine(spark, sf_dir), k=10
    )


@_register(
    "z01_trailing_hour_window",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
             AS avg_1h,
           count(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS n_1h
    FROM events
    """,
)
def z01_trailing_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frames (RANGE BETWEEN INTERVAL ... PRECEDING):
    the event-time sibling of the ROWS frames in q76 — trailing-hour
    mean and count per user, evaluated by Catalyst's range-frame window
    exec (one shuffle on user_id, ordered frame scan; no self-join).
    The driver fixtures surface ts as TIMESTAMP_NTZ, where interval
    arithmetic is zone-free wall-clock math — identical to DuckDB's
    TIMESTAMP, so the frames agree without any zone pinning."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("_q80_events")
    return spark.sql(
        """
        SELECT event_id, user_id,
               round(avg(value) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 6)
                 AS avg_1h,
               count(*) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS n_1h
        FROM _q80_events
        """
    )



# ---------------------------------------------------------------------------
# Link-graph quality signals (LLM-pipeline: page-authority scoring)
# ---------------------------------------------------------------------------

_PR_EDGES_SQL = """
        SELECT l_suppkey AS src, -o_custkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey, o_custkey
        UNION ALL
        SELECT -o_custkey AS src, l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey, o_custkey
        HAVING count(*) >= 2
"""


def _pagerank_oracle() -> str:
    from computer_vision_foundations_spark.operators.pagerank import (
        pagerank_oracle_sql,
    )

    return pagerank_oracle_sql(
        _PR_EDGES_SQL, damping=0.85, n_iter=5, round_digits=9
    )


@_register("za56_pagerank", _pagerank_oracle())
def za56_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (`operators/pagerank.py`) over the
    supplier→customer trade graph: an edge per trading pair, plus the
    reverse edge for repeat business (≥2 lineitems), so some customer
    nodes stay dangling and the dangling-mass redistribution path is
    exercised. Customer node ids are negated to keep the two keyspaces
    disjoint. 5 damped power iterations as ONE lazy unrolled plan —
    per round: broadcast degree join, shuffle on src, hash-agg on dst
    carrying (node, double) only; dangling mass rides a broadcast
    1-row crossJoin, never a driver collect. Oracle: the same
    recurrence unrolled as r0..r5 CTEs with identical double
    arithmetic; ranks rounded to 9 digits (values ~1/N; noise from
    summation order is ~1e-15)."""
    from computer_vision_foundations_spark.operators.pagerank import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count("*").alias("n_items"))
    )
    fwd = pairs.select(
        F.col("l_suppkey").alias("src"), (-F.col("o_custkey")).alias("dst")
    )
    back = pairs.filter(F.col("n_items") >= 2).select(
        (-F.col("o_custkey")).alias("src"), F.col("l_suppkey").alias("dst")
    )
    pr = pagerank(fwd.unionByName(back), damping=0.85, n_iter=5)
    return pr.select("node", F.round("rank", 9).alias("rank"))


_SD_K, _SD_SEED, _SD_THRESHOLD = 32, 42, 0.3
_SD_HASH_SQL = (
    "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR) || ':42'), 1, 7)) "
    "AS BIGINT)"
)


def _semantic_dedup_oracle_sql() -> str:
    """Replay the SemDeDup composition end-to-end in SQL: seed
    centroids = the 32 embeddings with the smallest seeded hash units
    (no literals needed — the oracle derives them from the data like
    the engine does), first-argmin assignment, then within-cluster
    cosine pairs (the q28 construction)."""
    return f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT row_number() OVER (ORDER BY {_SD_HASH_SQL}, vec_id) - 1 AS cid, v
      FROM emb
      ORDER BY {_SD_HASH_SQL}, vec_id
      LIMIT {_SD_K}
    ),
    d AS (
      SELECT e.vec_id, e.v, c.cid,
             list_dot_product(c.v, c.v)
             - 2.0 * list_dot_product(e.v, c.v) AS dist
      FROM emb e CROSS JOIN cent c
    ),
    assigned AS (
      SELECT vec_id, v, CAST(cid AS INT) AS cluster FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM d) t
      WHERE rn = 1
    )
    SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM assigned a JOIN assigned b
      ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= {_SD_THRESHOLD}
    """


@_register("za58_semantic_dedup", _semantic_dedup_oracle_sql())
def za58_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    k-means cluster assignment over embeddings
    (operators/clustering.kmeans_assign, Arrow-batched matmul — one
    narrow projection, no shuffle) becomes the BLOCKING column for
    cosine near-duplicate pairing
    (operators/dedup.embedding_near_duplicates — equi-join within
    cluster, norms precomputed per side). At 100 TB this is the
    standard answer to "embedding near-dup without O(n²)": candidate
    pairs only form inside a cluster, and cluster count tunes the
    block size.

    Seed centroids are ACTUAL data points — the 32 embeddings with the
    smallest seeded hash units (a model-sized driver collect, the same
    rule ``bottom_k_sample`` uses) — because synthetic gaussian
    centroids cover real data poorly: with 8 random centroids one
    cluster held 73% of the corpus and the pair join both skewed and
    lost parallelism (measured 12.6 s at sf0.1; data-point seeding at
    k=32 balances the blocks, ~0.6 s). Deterministic, so the oracle
    re-derives the SAME centroids in SQL and the whole composition
    hash-matches — no literals."""
    from computer_vision_foundations_spark.operators.clustering import (
        kmeans_assign,
    )
    from computer_vision_foundations_spark.operators.dedup import (
        embedding_near_duplicates,
    )
    from computer_vision_foundations_spark.operators.mixture import hash_unit

    emb = load_table(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.select("vec_id", "embedding", hash_unit("vec_id", _SD_SEED).alias("_h"))
        .orderBy("_h", "vec_id")
        .limit(_SD_K)
        .collect()
    )  # model-sized (k × dim floats), the engine's allowed collect class
    cents = [[float(x) for x in r.embedding] for r in seed_rows]
    clustered = kmeans_assign(emb, cents, "embedding", "cluster")
    return embedding_near_duplicates(
        clustered,
        "embedding",
        "vec_id",
        block_col="cluster",
        threshold=_SD_THRESHOLD,
        keep_block=True,
    )


_HASH_UNIT_SQL = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 7)) "
    "AS BIGINT) / 268435456.0"
)


@_register(
    "z12_bottom_k_sample",
    f"""
    SELECT doc_id, source, {_HASH_UNIT_SQL} AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id
    LIMIT 100
    """,
)
def z12_bottom_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size deterministic uniform sample
    (operators/sample.bottom_k_sample): the 100 smallest seeded hash
    units. Plans TakeOrderedAndProject — per-partition top-k, k-row
    exchange — never a full sort; reproducible across engines and
    cluster layouts, and consistent (a larger k is a superset)."""
    from computer_vision_foundations_spark.operators.sample import (
        bottom_k_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return bottom_k_sample(docs, "doc_id", 100, seed=42)


@_register(
    "za08_domain_cap",
    f"""
    SELECT doc_id, source, sample_rank FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY {_HASH_UNIT_SQL}, doc_id) AS sample_rank
      FROM documents) t
    WHERE sample_rank <= 15
    """,
)
def za08_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (operators/sample.group_cap_sample):
    at most 15 docs per source, picked by seeded hash order — the
    head-domain bound every web-corpus mixture applies before
    weighting. One shuffle on the group key + rank window."""
    from computer_vision_foundations_spark.operators.sample import (
        group_cap_sample,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = group_cap_sample(docs, "source", "doc_id", 15, seed=42)
    return out.select(
        "doc_id", "source", F.col("sample_rank").cast("long").alias("sample_rank")
    )


@_register(
    "za11_weighted_sample",
    f"""
    SELECT doc_id, source, n_chars,
           round(pow({_HASH_UNIT_SQL}, 1.0 / n_chars), 7) AS sample_key
    FROM documents
    ORDER BY pow({_HASH_UNIT_SQL}, 1.0 / n_chars) DESC, doc_id
    LIMIT 100
    """,
)
def za11_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted fixed-size sample
    (operators/sample.weighted_sample_k): Efraimidis–Spirakis A-ES
    keyed on the seeded hash unit (key = u^(1/n_chars), keep the 100
    largest), so longer documents enter the pilot at rate ∝ length
    while the draw stays a pure function of (id, seed). Plans
    TakeOrderedAndProject like q83 — no full sort, no RNG state."""
    from computer_vision_foundations_spark.operators.sample import (
        weighted_sample_k,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    out = weighted_sample_k(docs, "doc_id", "n_chars", 100, seed=42)
    return out.select(
        "doc_id", "source", "n_chars", F.round("sample_key", 7).alias("sample_key")
    )


_BLOOM_M, _BLOOM_K = 65536, 5
_BLOOM_H1 = "('0x' || substr(md5(s), 1, 7))::BIGINT"
_BLOOM_H2 = "('0x' || substr(md5(s), 8, 7))::BIGINT"


@_register(
    "za10_bloom_decontaminate",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    e AS (SELECT unnest(shingles) AS s FROM sh WHERE doc_id % 50 = 0),
    eh AS (SELECT DISTINCT s FROM e),
    bits AS (
      SELECT DISTINCT ({_BLOOM_H1} + i * {_BLOOM_H2}) % {_BLOOM_M} AS bit
      FROM eh, generate_series(0, {_BLOOM_K - 1}) g(i)
    ),
    t AS (SELECT doc_id AS train_id, unnest(shingles) AS s
          FROM sh WHERE doc_id % 50 <> 0),
    tposd AS (
      SELECT DISTINCT s,
             ({_BLOOM_H1} + i * {_BLOOM_H2}) % {_BLOOM_M} AS bit
      FROM (SELECT DISTINCT s FROM t), generate_series(0, {_BLOOM_K - 1}) g(i)
    ),
    mem AS (
      SELECT p.s, count(*) AS need, count(b.bit) AS got
      FROM tposd p LEFT JOIN bits b USING (bit)
      GROUP BY p.s
    ),
    hits AS (
      SELECT t.train_id, count(*) AS n_shingles,
             CAST(sum(CASE WHEN m.got = m.need THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_hits
      FROM t JOIN mem m USING (s)
      GROUP BY t.train_id
    )
    SELECT train_id, n_shingles, n_bloom_hits,
           round(CAST(n_bloom_hits AS DOUBLE) / n_shingles, 6) AS hit_frac
    FROM hits
    """,
)
def za10_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-screen
    (functions/sketches.bloom_bits/bloom_membership): the eval set's
    3-gram shingles populate a 2^16-bit Bloom filter (Kirsch–
    Mitzenmacher double hashing over the portable md5 pair, k=5);
    every training document reports how many of its shingles MAYBE hit
    the filter. At 100 TB this is the cheap first pass before the
    exact q35 join: the filter is ≤ 0.5 MB broadcast however large
    the eval set, the corpus never shuffles text (probes are (id, int)
    pairs), and no-false-negatives means a zero-hit document is
    provably clean. Bit construction replays exactly in SQL, so hits
    hash-match bit-for-bit."""
    from computer_vision_foundations_spark.functions.sketches import (
        bloom_bits,
        bloom_membership,
    )
    from computer_vision_foundations_spark.operators.dedup import _with_shingles

    docs = load_table(spark, sf_dir, "documents")
    eval_sh = (
        _with_shingles(docs.filter(F.col("doc_id") % 50 == 0), "text", "doc_id", "eval_id", 3)
        .select(F.explode("_shingles").alias("s"))
    )
    bits = bloom_bits(eval_sh, "s", m=_BLOOM_M, k=_BLOOM_K)
    train_sh = (
        _with_shingles(docs.filter(F.col("doc_id") % 50 != 0), "text", "doc_id", "train_id", 3)
        .select("train_id", F.explode("_shingles").alias("s"))
    )
    mem = bloom_membership(
        train_sh.select("s").distinct(), "s", bits, keys=["s"],
        m=_BLOOM_M, k=_BLOOM_K,
    )
    return (
        train_sh.join(mem, "s")
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("maybe_member"), 1).otherwise(0))
            .cast("long")
            .alias("n_bloom_hits"),
        )
        .select(
            "train_id",
            "n_shingles",
            "n_bloom_hits",
            F.round(
                F.col("n_bloom_hits") / F.col("n_shingles"), 6
            ).alias("hit_frac"),
        )
    )


@_register(
    "za12_incremental_dedup",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fingerprint
      FROM documents
    ),
    old AS (SELECT fingerprint, min(doc_id) AS old_id
            FROM fp WHERE doc_id % 5 = 0 GROUP BY 1),
    batch AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id % 5 <> 0),
    bmin AS (SELECT fingerprint, min(doc_id) AS batch_min
             FROM batch GROUP BY 1)
    SELECT b.doc_id, b.fingerprint,
           CASE WHEN o.old_id IS NOT NULL THEN 'dup_of_snapshot'
                WHEN b.doc_id <> m.batch_min THEN 'dup_in_batch'
                ELSE 'new' END AS status,
           coalesce(o.old_id, m.batch_min) AS canonical_id
    FROM batch b
    JOIN bmin m USING (fingerprint)
    LEFT JOIN old o USING (fingerprint)
    """,
)
def za12_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup
    (operators/dedup.incremental_exact_duplicates): the daily-crawl
    flow — an existing fingerprint snapshot (here: every 5th doc,
    deduped by q83's operator) classifies a new batch into
    dup-of-snapshot / dup-in-batch / new WITHOUT rescanning old text.
    Joins carry 16-byte fingerprints only; the snapshot at 100 TB is
    one row per distinct historical document."""
    from computer_vision_foundations_spark.operators.dedup import (
        exact_duplicates,
        incremental_exact_duplicates,
    )

    docs = load_table(spark, sf_dir, "documents")
    snapshot = exact_duplicates(
        docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id"
    )
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    return incremental_exact_duplicates(batch, snapshot, "text", "doc_id")


@_register(
    "za30_unigram_surprisal",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM freq)
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(-log2(f.cnt / tot.n_total)), 6) AS surprisal
    FROM tok t JOIN freq f USING (token) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def za30_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring
    (operators/perplexity.unigram_logprob_scores): mean unigram
    surprisal per document under the corpus's own token distribution —
    the cheap relational stand-in for CCNet's LM-perplexity filter
    (boilerplate and gibberish both rank as outliers). One hash agg
    builds the |vocab|-row frequency model, the token stream joins it
    (the TF-IDF shuffle budget), total-count rides a broadcast 1-row
    crossJoin."""
    from computer_vision_foundations_spark.operators.perplexity import (
        unigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = unigram_logprob_scores(docs, "text", "doc_id")
    return out.select(
        "doc_id", "n_tokens", F.round("surprisal", 6).alias("surprisal")
    )


_SQ_DIM = 64


@_register(
    "z22_sq8_ann",
    f"""
    WITH emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    dims AS (
      SELECT i, min(v[i]) AS mn, max(v[i]) AS mx
      FROM emb, generate_series(1, {_SQ_DIM}) g(i)
      GROUP BY i
    ),
    params AS (
      SELECT list(mn ORDER BY i) AS mins,
             list(CASE WHEN mx > mn THEN 255.0 / (mx - mn) ELSE 0.0 END
                  ORDER BY i) AS scales,
             list(CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 0.0 END
                  ORDER BY i) AS steps
      FROM dims
    ),
    codes AS (
      SELECT vec_id,
             list_transform(range(1, {_SQ_DIM + 1}),
               i -> least(255, greatest(0, CAST(floor(
                      (v[i] - mins[i]) * scales[i] + 0.5) AS INT)))) AS c
      FROM emb, params
    ),
    probes AS (SELECT vec_id AS probe_id, v AS pv FROM emb WHERE vec_id < 5),
    scored AS (
      SELECT p.probe_id, c.vec_id AS neighbor_id,
             round(list_sum(list_transform(range(1, {_SQ_DIM + 1}),
               i -> (pv[i] - (mins[i] + c.c[i] * steps[i]))
                  * (pv[i] - (mins[i] + c.c[i] * steps[i])))), 6) AS sq_dist
      FROM probes p, codes c, params
      WHERE p.probe_id <> c.vec_id
    )
    SELECT probe_id, neighbor_id, sq_dist, rank FROM (
      SELECT *, row_number() OVER (
               PARTITION BY probe_id
               ORDER BY sq_dist ASC, neighbor_id ASC) AS rank
      FROM scored) t
    WHERE rank <= 10
    """,
)
def z22_sq8_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar quantization (SQ8, FAISS IndexScalarQuantizer shape):
    per-dimension min/max from ONE unrolled aggregate (model-sized
    collect), uint8 encode as a narrow codegen projection, then top-10
    by squared L2 against DEQUANTIZED codes — the corpus scan reads
    uint8 codes only, the simplest compression tier below PQ (q25/q29).
    The oracle derives the same min/max from the data, so train,
    encode, and scoring all hash-match with no literals."""
    from computer_vision_foundations_spark.operators.quantization import (
        sq8_encode,
        sq8_minmax,
        sq8_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    mins, maxs = sq8_minmax(emb, "embedding", _SQ_DIM)
    codes = sq8_encode(emb, mins, maxs, "embedding")
    probes = emb.filter(F.col("vec_id") < 5)
    return sq8_topk(codes, probes, mins, maxs, k=10)


_FUNNEL_STEPS = ["view", "click", "purchase"]


@_register(
    "z15_event_funnel",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    s1 AS (SELECT user_id, min(us) AS t1 FROM e
           WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY 1),
    s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING (user_id)
           WHERE event_type = '{_FUNNEL_STEPS[1]}' AND us > t1 GROUP BY 1),
    s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING (user_id)
           WHERE event_type = '{_FUNNEL_STEPS[2]}' AND us > t2 GROUP BY 1),
    c AS (
      SELECT 1 AS step, count(*) AS n_users FROM s1
      UNION ALL SELECT 2, count(*) FROM s2
      UNION ALL SELECT 3, count(*) FROM s3
    )
    SELECT step,
           (['{_FUNNEL_STEPS[0]}', '{_FUNNEL_STEPS[1]}',
             '{_FUNNEL_STEPS[2]}'])[step] AS step_name,
           n_users,
           round(n_users * 1.0 / max(n_users) OVER (), 6) AS conversion
    FROM c
    """,
)
def z15_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (operators/funnel.funnel_counts): users doing
    view → click → purchase with strictly increasing timestamps — the
    MATCH_RECOGNIZE-style analysis Spark lacks natively, re-expressed
    as scan-pruned filter + ONE shuffle on user + a linear sorted-fold
    state machine per user (codegen). The oracle computes the same
    max-step via the greedy min-after-min join chain, which is
    provably the same predicate (exchange argument)."""
    from computer_vision_foundations_spark.operators.funnel import (
        funnel_counts,
    )

    events = load_table(spark, sf_dir, "events")
    return funnel_counts(events, _FUNNEL_STEPS)


@_register(
    "z16_kfold_assignment",
    """
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
                1, 7)) AS BIGINT) % 5 AS INT) AS fold
    FROM documents
    """,
)
def z16_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold CV assignment
    (operators/split.kfold_assignment): fold = seeded md5 slice mod 5,
    a pure function of (id, seed) — stable across engines,
    partitionings, and reruns; no shuffle, no RNG state."""
    from computer_vision_foundations_spark.operators.split import (
        kfold_assignment,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return kfold_assignment(docs, "doc_id", k=5, seed=42)


def _verified_pairs_oracle_sql() -> str:
    """Compose the za23 candidate oracle with the levenshtein verify
    stage (prefix-capped, both engines' classic DP distance)."""
    cand = _ORACLES["za23_lsh_candidate_pairs"]
    return f"""
    WITH cand AS ({cand}),
    t AS (SELECT doc_id, substr(text, 1, 200) AS txt FROM documents)
    SELECT c.id_a, c.id_b,
           round(CASE WHEN greatest(length(a.txt), length(b.txt)) = 0
                 THEN 1.0
                 ELSE 1.0 - levenshtein(a.txt, b.txt)
                      / CAST(greatest(length(a.txt), length(b.txt)) AS DOUBLE)
                 END, 6) AS edit_sim
    FROM cand c
    JOIN t a ON a.doc_id = c.id_a
    JOIN t b ON b.doc_id = c.id_b
    """


@_register("za16_lsh_verified_pairs", _verified_pairs_oracle_sql())
def za16_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate verification (operators/dedup.edit_similarity_pairs):
    the MinHash-LSH candidates of za23 scored by normalized edit
    similarity over 200-char prefixes — the verify-before-drop stage a
    production dedup pipeline runs after banding. O(len²) Levenshtein
    is affordable exactly because it runs on candidate PAIRS, not the
    corpus square; JVM-side, two (id, prefix) joins."""
    from computer_vision_foundations_spark.operators.dedup import (
        edit_similarity_pairs,
        minhash_lsh_candidate_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(
        docs,
        "text",
        "doc_id",
        k=3,
        n_hashes=8,
        bands=4,
        hash_fn="md5",
        max_bucket_size=1_000,
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    out = edit_similarity_pairs(pairs, docs, "text", "doc_id", max_chars=200)
    return out.select("id_a", "id_b", "edit_sim")


@_register(
    "q95_gap_fill_locf",
    """
    WITH e AS (
      SELECT user_id AS key,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS b,
             value
      FROM events
    ),
    pb AS (SELECT key, b, avg(value) AS vb FROM e GROUP BY 1, 2),
    spans AS (SELECT key, min(b) AS lo, max(b) AS hi FROM pb GROUP BY 1),
    grid AS (SELECT key, unnest(generate_series(lo, hi)) AS b FROM spans),
    j AS (SELECT g.key, g.b, pb.vb FROM grid g LEFT JOIN pb USING (key, b))
    SELECT key,
           TIMESTAMP '1970-01-01' + b * 86400 * INTERVAL 1 SECOND AS bucket_ts,
           round(last_value(vb IGNORE NULLS) OVER (
             PARTITION BY key ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value,
           vb IS NULL AS filled
    FROM j
    """,
)
def q95_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill (operators/rollup.gap_fill_locf):
    per-user daily buckets with last-observation-carried-forward over
    the empty days — ``time_bucket_gapfill + locf``. Each key's grid
    spans only its own [min, max] bucket (sequence explode — never a
    global calendar cross-join); one agg shuffle on (key, bucket) +
    one window shuffle on key."""
    from computer_vision_foundations_spark.operators.rollup import (
        gap_fill_locf,
    )

    events = load_table(spark, sf_dir, "events")
    out = gap_fill_locf(events, "ts", "user_id", "value", 86_400)
    return out.select(
        "key",
        F.col("bucket_ts").cast("timestamp_ntz").alias("bucket_ts"),
        F.round("value", 6).alias("value"),
        "filled",
    )


@_register(
    "q96_retention_cohorts",
    """
    WITH acts AS (
      SELECT user_id AS u,
             CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS p
      FROM events
    ),
    first AS (SELECT u, min(p) AS cohort FROM acts GROUP BY 1),
    active AS (
      SELECT DISTINCT a.u, f.cohort, a.p - f.cohort AS off
      FROM acts a JOIN first f USING (u)
    ),
    counts AS (
      SELECT cohort, off, count(*) AS n_active
      FROM active GROUP BY 1, 2
    )
    SELECT c.cohort, c.off AS period_offset, c.n_active,
           round(c.n_active * 1.0 / s.n_active, 6) AS retention
    FROM counts c
    JOIN (SELECT cohort, n_active FROM counts WHERE off = 0) s
      USING (cohort)
    """,
)
def q96_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/funnel.retention_cohorts):
    users bucketed by first-seen week, tracked by activity in later
    weeks — the standard product-analytics matrix, as two hash
    aggregates + one join on (user, int) pairs. Events never shuffle
    payloads."""
    from computer_vision_foundations_spark.operators.funnel import (
        retention_cohorts,
    )

    events = load_table(spark, sf_dir, "events")
    return retention_cohorts(events, period_seconds=7 * 86_400)


def _dedup_prf_oracle_sql() -> str:
    """Candidate-generation quality: LSH candidates (za23's oracle)
    against exact Jaccard≥0.5 ground truth (the jaccard query's
    oracle), composed end-to-end."""
    truth = _ORACLES["q90_ngram_jaccard_pairs"]
    cand = _ORACLES["za23_lsh_candidate_pairs"]
    return f"""
    WITH truth AS (SELECT id_a, id_b FROM ({truth}) t0),
    cand AS (SELECT id_a, id_b FROM ({cand}) c0),
    hit AS (SELECT count(*) AS n FROM truth JOIN cand USING (id_a, id_b))
    SELECT (SELECT count(*) FROM truth) AS n_truth,
           (SELECT count(*) FROM cand) AS n_candidates,
           hit.n AS n_hit,
           round(hit.n * 1.0 / nullif((SELECT count(*) FROM truth), 0), 6)
             AS recall,
           round(hit.n * 1.0 / nullif((SELECT count(*) FROM cand), 0), 6)
             AS precision
    FROM hit
    """


@_register("q98_dedup_candidate_prf", _dedup_prf_oracle_sql())
def q98_dedup_candidate_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup candidate-generation quality: precision/recall of the
    MinHash-LSH candidate pairs against exact Jaccard≥0.5 ground truth
    — the evaluation a pipeline runs before trusting an approximate
    dedup config at scale (band/row counts tune this curve). Purely
    relational composition of two already-verified queries; the oracle
    composes both oracle bodies."""
    # Each pair generator is consumed twice (the hit join and its own
    # count) — materialize the id-pair tables once instead of
    # re-running shingling + banding per consumer (triangles.py
    # discipline; the blocks are (long, long) rows).
    truth = (
        q90_ngram_jaccard_pairs(spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    cand = (
        za23_lsh_candidate_pairs(spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    hit = truth.join(cand, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
        .crossJoin(F.broadcast(hit))
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.round(
                F.col("n_hit")
                / F.when(F.col("n_truth") > 0, F.col("n_truth")),
                6,
            ).alias("recall"),
            F.round(
                F.col("n_hit")
                / F.when(F.col("n_candidates") > 0, F.col("n_candidates")),
                6,
            ).alias("precision"),
        )
    )


def _dhash_oracle_sql() -> str:
    """Replay decode→dHash: pixel (r, c) is byte r·9+c of the text
    (zero-padded to 72 — PNG is lossless and the grid needs no
    resize), bit (r, c) set when the left pixel is darker."""
    rows = []
    for r in range(8):
        terms = " + ".join(
            f"(CASE WHEN p[{r * 9 + c + 1}] < p[{r * 9 + c + 2}] "
            f"THEN {1 << c} ELSE 0 END)"
            for c in range(8)
        )
        rows.append(f"({terms})")
    fmt = "%02x" * 8
    args = ", ".join(rows)
    return f"""
    WITH px AS (
      SELECT doc_id,
             list_transform(range(1, 74),
               i -> CASE WHEN i <= length(text)
                    THEN ascii(substr(text, i, 1)) ELSE 0 END) AS p
      FROM documents
    )
    SELECT doc_id, printf('{fmt}', {args}) AS dhash FROM px
    """


@_register("q99_image_dhash", _dhash_oracle_sql())
def q99_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing (functions/image.image_dhash): each
    document's leading bytes become a REAL 8×9 grayscale PNG, the
    dependency-free codec decodes it, and the 64-bit difference hash
    (adjacent-pixel darkness comparisons, the standard CV near-dup
    fingerprint) comes back as 16 hex chars — the image-dedup
    fingerprint that feeds Hamming-LSH banding at scale. PNG is
    lossless and the grid needs no resize, so the oracle replays
    decode→hash exactly from character codes."""
    from computer_vision_foundations_spark.functions.image import (
        encode_text_png_8x9,
        image_dhash,
    )

    from computer_vision_foundations_spark.operators.parallelism import (
        widen_if_under_parallel,
    )

    # pure-Python encode+decode per row: widen a single-split scan
    # first (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        image_dhash(encode_text_png_8x9(F.col("text"))).alias("dhash"),
    )


def _bpe_oracle_sql(n_merges: int = 30) -> str:
    """Unrolled BPE training in SQL (one MATERIALIZED CTE pair per
    round — plain CTEs inline and the plan doubles per round, the same
    trap PageRank hit in Spark). The greedy left-to-right
    non-overlapping merge is expressed as a string ``replace`` over a
    DOUBLE-separator symbol encoding: each symbol is wrapped in two
    chr(31)s, the pattern consumes one boundary separator on each side
    and the replacement restores one — so adjacent occurrences chain
    correctly and cross-symbol substring matches are impossible.
    Verified equal to the pure-Python reference in tests/test_bpe.py's
    construction."""
    sep = "chr(31)"
    parts = [
        f"""w0 AS MATERIALIZED (
      SELECT {sep} || {sep}
             || array_to_string(string_split(word, ''), {sep} || {sep})
             || {sep} || {sep} AS w, cnt
      FROM (SELECT word, count(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE length(word) > 0 GROUP BY word) t0)"""
    ]
    for r in range(1, n_merges + 1):
        prev = f"w{r - 1}"
        parts.append(
            f"""m{r} AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT syms[i] AS a, syms[i + 1] AS b, sum(cnt) AS n
        FROM (SELECT list_filter(string_split(w, {sep}), x -> x <> '') AS syms,
                     cnt
              FROM {prev}) s,
             unnest(range(1, greatest(len(syms), 1))) t(i)
        GROUP BY 1, 2) p
      WHERE n >= 2
      ORDER BY n DESC, a ASC, b ASC LIMIT 1)"""
        )
        parts.append(
            f"""w{r} AS MATERIALIZED (
      SELECT replace(w, {sep} || m.a || {sep} || {sep} || m.b || {sep},
                     {sep} || m.a || m.b || {sep}) AS w, cnt
      FROM {prev}, m{r} m)"""
        )
    union = "\n      UNION ALL ".join(
        f"SELECT {r - 1} AS merge_idx, a AS left_sym, b AS right_sym, "
        f"a || b AS merged FROM m{r}"
        for r in range(1, n_merges + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT * FROM (\n      {union}) t"
    )


@_register("q97_bpe_merges", _bpe_oracle_sql())
def q97_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (operators/bpe.bpe_train): the 30 most
    frequent adjacent-symbol merges learned from the corpus's
    word-frequency table — ONE corpus scan, then vocab-sized rounds
    (Sennrich et al. 2016 shape). Deterministic (lexicographic tie
    break), so even this iterative-argmax training has a FULL
    differential oracle: 30 unrolled MATERIALIZED-CTE rounds whose
    greedy rewrite is a double-separator string replace — the whole
    merge sequence hash-matches. Exact agreement with a pure-Python
    reference is additionally pytest-verified (tests/test_bpe.py)."""
    from computer_vision_foundations_spark.operators.bpe import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=30)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "merge_idx int, left_sym string, right_sym string, merged string",
    )


# ---------------------------------------------------------------------------
# Round-3 wave three: substring-span dedup, JL projection, distributed PCA
# (z-prefix => sorts after q99: stays OUT of the driver's 50-slot window
# this round — every current q01–q50 occupant still awaits its first
# driver verification — and rotates in next round per README.)
# ---------------------------------------------------------------------------

_SPAN_N, _SPAN_MIN_DF = 8, 2


@_register(
    "za65_duplicated_spans",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), occ AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               array_to_string(list_slice(t, u.i + 1, u.i + {_SPAN_N}), ' ')
                   AS span
        FROM toks, unnest(range(len(t) - {_SPAN_N} + 1)) u(i)
        WHERE len(t) >= {_SPAN_N}
    ), freq AS (
        SELECT span FROM occ
        GROUP BY span HAVING count(DISTINCT doc_id) >= {_SPAN_MIN_DF}
    ), dup AS (
        SELECT o.doc_id, o.pos FROM occ o JOIN freq f USING (span)
    ), flagged AS (
        SELECT doc_id, pos,
               CASE WHEN coalesce(pos > max(pos + {_SPAN_N}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    TRUE)
               THEN 1 ELSE 0 END AS new_island
        FROM dup
    ), islands AS (
        SELECT doc_id, pos,
               sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM flagged
    ), agg AS (
        SELECT doc_id, island, min(pos) AS s, max(pos) + {_SPAN_N} AS e
        FROM islands GROUP BY doc_id, island
    ), per_doc AS (
        SELECT doc_id, count(*) AS dup_islands, sum(e - s) AS dup_tokens
        FROM agg GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(coalesce(p.dup_islands, 0) AS BIGINT) AS dup_islands,
           CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(coalesce(p.dup_tokens, 0) * 1.0
                 / len(string_split(d.text, ' ')), 6) AS dup_fraction
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def za65_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup profile (Lee et al. 2021 semantics,
    fixed-n formulation — `operators/spans.py`): every {n}-token window
    occurring in ≥2 distinct documents marks its positions duplicated;
    overlapping windows merge into maximal islands per document
    (gaps-and-islands window), yielding a duplicated-token fraction.
    Scale shape: text never leaves the map-side shingle projection;
    the frequency agg runs on 16-byte hashes; the frequent-span
    semi-join is LINEAR (no pair formation, so no quadratic risk on
    hot spans); islands window partitions by document. Oracle replays
    the whole chain on raw span strings."""
    from computer_vision_foundations_spark.operators.spans import (
        duplicated_span_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_span_stats(
        docs, n=_SPAN_N, min_doc_freq=_SPAN_MIN_DF
    )


_JL_OUT_DIM, _JL_SEED = 8, 42


def _jl_oracle_sql() -> str:
    """Replay the seeded ±1/√k sign matrix as DuckDB literals (the
    LSH-planes / PQ-codebook pattern): p_j = list_dot_product of the
    f64-cast embedding with row j, rounded to 6 — both engines
    accumulate the dot sequentially ascending, so values agree."""
    from computer_vision_foundations_spark.operators.projection import (
        jl_sign_matrix,
    )

    rows = jl_sign_matrix(64, _JL_OUT_DIM, _JL_SEED)
    cols = ",\n           ".join(
        f"round(list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(x) for x in row)}]), 6) AS p{j}"
        for j, row in enumerate(rows)
    )
    return f"SELECT vec_id,\n           {cols}\n    FROM embeddings"


@_register("za19_random_projection", _jl_oracle_sql())
def za19_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64→8 dims
    (`operators/projection.py`): seeded ±1/√k sign matrix embedded as
    plan literals, projection as a JVM HOF fold — one narrow codegen
    projection, no shuffle, no Python. The md5-derived matrix is
    re-derived bit-for-bit by the oracle generator."""
    from computer_vision_foundations_spark.operators.projection import (
        random_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = random_projection(
        emb, "embedding", out_dim=_JL_OUT_DIM, seed=_JL_SEED
    )
    return out.select(
        "vec_id",
        *[
            F.element_at("projected", j + 1).alias(f"p{j}")
            for j in range(_JL_OUT_DIM)
        ],
    )


@_register(
    "za50_pca_covariance",
    """
    WITH x AS (
        -- same 1e-6 fixed-point grid as operators/projection.py
        -- (_GRAM_SCALE): floor(x*1e6 + 0.5) = round-half-up, then all
        -- sums are exact integers, so the result is reduction-order
        -- free on BOTH engines.
        SELECT vec_id, CAST(u.i AS INTEGER) AS i,
               CAST(floor(CAST(embedding[CAST(u.i AS INTEGER) + 1] AS DOUBLE)
                          * 1000000.0 + 0.5) AS BIGINT) AS q
        FROM embeddings, unnest(range(len(embedding))) u(i)
    ), n AS (
        SELECT count(*) AS n FROM embeddings
    ), m AS (
        SELECT i, sum(q) AS sq FROM x GROUP BY i
    ), g AS (
        SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS sxy
        FROM x a JOIN x b USING (vec_id)
        GROUP BY a.i, b.i
    )
    SELECT g.i, g.j,
           -- + 0.0 normalizes -0.0 (DuckDB round() emits it at exact-zero
           -- cells; Spark emits +0.0 — byte-hash mismatch, r5/r6 driver red)
           round(CAST(g.sxy AS DOUBLE) / CAST(n.n AS DOUBLE) / 1e12
                 - (CAST(mi.sq AS DOUBLE) / CAST(n.n AS DOUBLE) / 1e6)
                   * (CAST(mj.sq AS DOUBLE) / CAST(n.n AS DOUBLE) / 1e6),
                 6) + 0.0 AS cov
    FROM g
    CROSS JOIN n
    JOIN m mi ON mi.i = g.i
    JOIN m mj ON mj.i = g.j
    """,
)
def za50_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed stage of PCA (`operators/projection.py`): the
    64×64 population covariance of the embedding corpus via ONE
    Arrow-batched partial-Gramian pass (`mapInPandas` emits d² partial
    sums per PARTITION — model-sized rows, never per-document) and a
    (i, j) hash aggregate. Accumulation is EXACT fixed-point (1e-6
    grid, int64 partials, DECIMAL(38,0) cross-partition sums), so the
    driver hash cannot flip with partition order — the round-4 flake
    class is structurally closed. The driver-side eigensolve that consumes
    this matrix is pytest-verified (orthonormality, variance order,
    reconstruction); this query differential-checks the part that
    actually touches 100 TB. Oracle computes the same covariance by
    dimension explode + self-join (the small-scale SQL shape)."""
    from computer_vision_foundations_spark.operators.projection import (
        covariance_matrix,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return covariance_matrix(emb, "embedding")


def _hits_oracle() -> str:
    from computer_vision_foundations_spark.operators.hits import (
        hits_oracle_sql,
    )

    return hits_oracle_sql(_PR_EDGES_SQL, n_iter=5, round_digits=6)


@_register("za51_hits_scores", _hits_oracle())
def za51_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (`operators/hits.py`) over the same
    supplier↔customer trade graph as q07: the second link-graph
    curation signal (authorities = canonical pages, hubs = link-farm
    boilerplate). 5 L2-normalized power iterations; per half-step
    localCheckpoint (the PageRank discipline — a lazy unroll is 2^n);
    shuffles carry (node, double) only; norms are broadcast 1-row
    aggregates. Oracle unrolls the identical recurrence as CTEs."""
    from computer_vision_foundations_spark.operators.hits import hits

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count("*").alias("n_items"))
    )
    fwd = pairs.select(
        F.col("l_suppkey").alias("src"), (-F.col("o_custkey")).alias("dst")
    )
    back = pairs.filter(F.col("n_items") >= 2).select(
        (-F.col("o_custkey")).alias("src"), F.col("l_suppkey").alias("dst")
    )
    out = hits(fwd.unionByName(back), n_iter=5)
    return out.select(
        "node",
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


@_register(
    "za37_bigram_surprisal",
    f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
               t[CAST(u.i AS INTEGER) + 1] AS token,
               CASE WHEN u.i > 0 THEN t[CAST(u.i AS INTEGER)] END AS prev
        FROM toks, unnest(range(len(t))) u(i)
    ), uni AS (
        SELECT token, count(*) AS ucnt FROM pos GROUP BY 1
    ), tot AS (
        SELECT CAST(sum(ucnt) AS DOUBLE) AS n FROM uni
    ), bi AS (
        SELECT prev, token, count(*) AS bcnt FROM pos
        WHERE prev IS NOT NULL GROUP BY 1, 2
    ), ptot AS (
        SELECT prev, CAST(sum(bcnt) AS DOUBLE) AS pcnt FROM bi GROUP BY 1
    )
    SELECT p.doc_id, count(*) AS n_tokens,
           round(avg(-log2(CASE WHEN p.prev IS NULL THEN u.ucnt / tot.n
               ELSE {0.75!r} * coalesce(b.bcnt / pt.pcnt, 0.0)
                    + {1.0 - 0.75!r} * (u.ucnt / tot.n) END)), 6)
               AS surprisal
    FROM pos p
    JOIN uni u USING (token)
    CROSS JOIN tot
    LEFT JOIN bi b ON b.prev = p.prev AND b.token = p.token
    LEFT JOIN ptot pt ON pt.prev = p.prev
    GROUP BY p.doc_id
    """,
)
def za37_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram surprisal
    (operators/perplexity.bigram_logprob_scores): the Jelinek-Mercer
    step up from q47's unigram proxy — p = λ·p(t|prev) + (1−λ)·p(t),
    first token unigram-only. Still all-relational: two model
    aggregates (|vocab| and |distinct bigrams| rows), three hash joins
    on the (id, pos, prev, token) stream, interpolation in codegen.
    The oracle replays the identical λ literals."""
    from computer_vision_foundations_spark.operators.perplexity import (
        bigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = bigram_logprob_scores(docs, "text", "doc_id", lam=0.75)
    return out.select(
        "doc_id", "n_tokens", F.round("surprisal", 6).alias("surprisal")
    )


@_register(
    "za66_dsir_weights",
    """
    WITH raw_tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), tgt_tok AS (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM documents WHERE lang = 'en'
    ), raw_freq AS (
        SELECT token, count(*) AS raw_cnt FROM raw_tok GROUP BY 1
    ), tgt_freq AS (
        SELECT token, count(*) AS tgt_cnt FROM tgt_tok GROUP BY 1
    ), vocab AS (
        SELECT coalesce(r.token, t.token) AS token,
               coalesce(r.raw_cnt, 0) AS raw_cnt,
               coalesce(t.tgt_cnt, 0) AS tgt_cnt
        FROM raw_freq r FULL OUTER JOIN tgt_freq t USING (token)
    ), consts AS (
        SELECT CAST(sum(raw_cnt) AS DOUBLE) AS raw_n,
               CAST(sum(tgt_cnt) AS DOUBLE) AS tgt_n,
               CAST(count(*) AS DOUBLE) AS v
        FROM vocab
    ), ratio AS (
        SELECT token,
               log2((tgt_cnt + 1.0) / (c.tgt_n + 1.0 * c.v))
               - log2((raw_cnt + 1.0) / (c.raw_n + 1.0 * c.v)) AS logratio
        FROM vocab CROSS JOIN consts c
    )
    SELECT rt.doc_id, count(*) AS n_tokens,
           round(avg(r.logratio), 6) AS dsir_weight
    FROM raw_tok rt JOIN ratio r USING (token)
    GROUP BY rt.doc_id
    """,
)
def za66_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (`operators/dsir.py` — Xie et al. 2023
    shape): mean per-token log-likelihood ratio of a TARGET unigram
    model (here the lang='en' slice stands in for a curated corpus)
    over the RAW model, Laplace-smoothed on the union vocabulary.
    Feed the weight column to `weighted_sample_k` (za11's seeded A-ES)
    for the resampling step. Two |vocab|-row model aggregates + one
    stream join — the TF-IDF shuffle budget; oracle replays the exact
    smoothing literals."""
    from computer_vision_foundations_spark.operators.dsir import (
        dsir_logratio_weights,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = dsir_logratio_weights(
        docs, docs.filter(F.col("lang") == "en"), "text", "doc_id"
    )
    return out.select(
        "doc_id", "n_tokens", F.round("dsir_weight", 6).alias("dsir_weight")
    )


@_register(
    "za67_incremental_lsh",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sig AS (
      SELECT doc_id, [
        {", ".join(_minhash_perm_sql(s) for s in range(8))}
      ] AS sig FROM sh),
    banded AS (
      SELECT doc_id, 0 AS band_idx, array_to_string(sig[1:2], ',') AS band_key FROM sig
      UNION ALL
      SELECT doc_id, 1, array_to_string(sig[3:4], ',') FROM sig
      UNION ALL
      SELECT doc_id, 2, array_to_string(sig[5:6], ',') FROM sig
      UNION ALL
      SELECT doc_id, 3, array_to_string(sig[7:8], ',') FROM sig
    ),
    lab AS (
      SELECT doc_id, band_idx, band_key,
             CASE WHEN doc_id % 5 = 0 THEN 'snapshot' ELSE 'batch' END AS side
      FROM banded
    )
    SELECT DISTINCT p.doc_id AS batch_id, b.doc_id AS match_id,
           b.side AS origin
    FROM lab p JOIN lab b USING (band_idx, band_key)
    WHERE p.side = 'batch'
      AND (b.side = 'snapshot'
           OR (b.side = 'batch' AND p.doc_id < b.doc_id))
    """,
)
def za67_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup flow
    (operators/dedup.incremental_lsh_candidates): the daily-crawl
    sibling of q46 — a new batch (doc_id%5!=0) is banded against a
    persisted MinHash-signature snapshot of the indexed corpus
    (doc_id%5==0, built by `minhash_signatures`) WITHOUT rescanning
    old text. Snapshot side carries index-sized rows (id + 8 minima);
    only the batch runs the shingle→hash→agg pipeline. Portable md5
    double-hash family so the oracle rebuilds identical signatures and
    replays the band join + side classification."""
    from computer_vision_foundations_spark.operators.dedup import (
        incremental_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    snapshot = minhash_signatures(
        docs.filter(F.col("doc_id") % 5 == 0), "text", "doc_id",
        k=3, n_hashes=8, hash_fn="md5",
        repartition_to=spark.sparkContext.defaultParallelism,
    )
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    # max_bucket_size=None matches the oracle, which models no bucket
    # cap: a band bucket exceeding the default 1000-doc cap at a larger
    # scale factor would otherwise silently diverge the differential
    # check (production callers keep the cap ON).
    return incremental_lsh_candidates(
        batch, snapshot, "text", "doc_id",
        k=3, n_hashes=8, bands=4, hash_fn="md5",
        max_bucket_size=None,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


@_register(
    "za68_cdc_dedup",
    """
    WITH d AS (
        SELECT doc_id, text, length(text) AS n FROM documents
        WHERE length(text) >= 1
    ), b AS (
        SELECT doc_id, CAST(u.i AS INTEGER) AS pos
        FROM d, unnest(range(8, n + 1)) u(i)
        WHERE CAST(('0x' || substr(md5(substr(text,
                  CAST(u.i AS INTEGER) - 7, 8)), 1, 7)) AS BIGINT) % 32 = 0
          AND u.i < n
    ), starts AS (
        SELECT doc_id, 1 AS s FROM d
        UNION ALL
        SELECT doc_id, pos + 1 FROM b
    ), chunks AS (
        SELECT s.doc_id, s.s AS cs,
               coalesce(lead(s.s) OVER (PARTITION BY s.doc_id ORDER BY s.s),
                        d.n + 1) - s.s AS cl
        FROM starts s JOIN d USING (doc_id)
    ), hashed AS (
        SELECT c.doc_id, c.cl,
               md5(substr(d.text, c.cs, c.cl)) AS h
        FROM chunks c JOIN d USING (doc_id)
    ), shared AS (
        SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ), flagged AS (
        SELECT hashed.doc_id, count(*) AS shared_chunks,
               sum(cl) AS shared_chars
        FROM hashed JOIN shared USING (h)
        GROUP BY hashed.doc_id
    ), totals AS (
        SELECT doc_id, count(*) AS n_chunks, sum(cl) AS total_chars
        FROM hashed GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(t.n_chunks AS BIGINT) AS n_chunks,
           CAST(coalesce(f.shared_chunks, 0) AS BIGINT) AS shared_chunks,
           CAST(coalesce(f.shared_chars, 0) AS BIGINT) AS shared_chars,
           round(coalesce(f.shared_chars, 0) * 1.0 / t.total_chars, 6)
               AS dedup_fraction
    FROM totals t LEFT JOIN flagged f USING (doc_id)
    """,
)
def za68_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup profile (`operators/cdc.py`):
    rsync/LBFS-style storage dedup — chunk boundaries where an 8-char
    window hash ≡ 0 (mod 32), so identical regions across documents
    produce identical chunk hashes regardless of what precedes them.
    Per-document fraction of characters a content-addressed store
    would deduplicate. Boundary detection is a map-side array
    expression; the only shuffle carries (doc, chunk_hash) rows.
    The oracle replays the identical window-hash boundary rule."""
    from computer_vision_foundations_spark.operators.cdc import (
        chunk_dedup_stats,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chunk_dedup_stats(
        docs, "text", "doc_id", w=8, modulus=32,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


@_register(
    "za20_temperature_mixture",
    """
    WITH sizes AS (
        SELECT source AS domain, CAST(count(*) AS DOUBLE) AS n
        FROM documents GROUP BY source
    ), powed AS (
        SELECT domain, n, pow(n, 1.0 / 2.0) AS pw FROM sizes
    ), z AS (
        SELECT sum(pw) AS z FROM powed
    )
    SELECT domain, CAST(n AS BIGINT) AS n_tokens,
           round(pw / z.z, 6) AS mix_weight,
           round(least(1.0, 300.0 * (pw / z.z) / n), 6) AS keep_frac
    FROM powed CROSS JOIN z
    """,
)
def za20_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights
    (operators/mixture.temperature_fractions — the UniMax/mT5
    multilingual sampling recipe): mixing weight ∝ size^(1/T) with
    T=2, keep fractions for a 300-doc budget. One |domains|-row
    aggregate + broadcast normalizer; the corpus never shuffles."""
    from computer_vision_foundations_spark.operators.mixture import (
        temperature_fractions,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_fractions(docs, temperature=2.0, budget=300.0)
    return out.select(
        "domain",
        "n_tokens",
        F.round("mix_weight", 6).alias("mix_weight"),
        F.round("keep_frac", 6).alias("keep_frac"),
    )


@_register(
    "za21_skew_profile",
    """
    WITH counts AS (
        SELECT o_custkey AS key, count(*) AS n_rows
        FROM orders GROUP BY o_custkey
    ), totals AS (
        SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
               greatest(avg(n_rows), 1.0) AS mean_rows
        FROM counts
    )
    SELECT key, n_rows, round(n_rows / t.total, 6) AS share,
           greatest(1, CAST(ceil(n_rows / t.mean_rows) AS BIGINT))
               AS suggested_salt
    FROM counts CROSS JOIN totals t
    ORDER BY n_rows DESC, key
    LIMIT 10
    """,
)
def za21_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (operators/skew.skew_profile): the
    top-10 heaviest orders.o_custkey values with their row share and a
    suggested salt factor — the pre-flight check before deciding
    between a plain join, `salted_join`, or trusting AQE skew
    handling. One hash agg + TakeOrdered top-n."""
    from computer_vision_foundations_spark.operators.skew import skew_profile

    orders = load_table(spark, sf_dir, "orders")
    return skew_profile(orders, "o_custkey", top_n=10)


@_register(
    "za61_corpus_report",
    """
    WITH tok AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens,
               md5(text) AS fp
        FROM documents
    ), dup AS (
        SELECT source,
               count(*) - count(DISTINCT fp) AS dup_docs
        FROM tok GROUP BY source
    ), stream AS (
        SELECT t.doc_id, t.source, u.token
        FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
              FROM documents) AS u
        JOIN tok t USING (doc_id)
    ), freq AS (
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) x
        GROUP BY token
    ), tot AS (
        SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM freq
    ), surp AS (
        SELECT s.doc_id, s.source,
               avg(-log2(f.cnt / tot.n)) AS doc_surprisal
        FROM stream s JOIN freq f USING (token) CROSS JOIN tot
        GROUP BY s.doc_id, s.source
    )
    SELECT t.source,
           count(*) AS n_docs,
           CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
           round(avg(t.n_tokens), 6) AS mean_tokens,
           CAST(max(d.dup_docs) AS BIGINT) AS dup_docs,
           round(avg(s.doc_surprisal), 6) AS mean_surprisal,
           round(quantile_cont(s.doc_surprisal, 0.5), 6) AS median_surprisal
    FROM tok t
    JOIN dup d ON d.source = t.source
    JOIN surp s ON s.doc_id = t.doc_id
    GROUP BY t.source
    """,
)
def za61_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus curation dashboard — the summary a data lead
    reads before a training run: document/token volumes, exact-dup
    count, and the surprisal distribution (mean + exact median), all
    composed from the individually-verified signal operators in ONE
    query. Shuffle budget: the md5 dedup agg, the token-stream model
    join (q47's budget), and a final per-source agg with an exact
    median (percentile on doc-level rows — |docs| per source, fine at
    any corpus scale since the doc-level stats frame is already
    reduced)."""
    from computer_vision_foundations_spark.operators.perplexity import (
        unigram_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.md5(F.col("text").cast("binary")).alias("fp"),
    )
    dup = base.groupBy("source").agg(
        (F.count(F.lit(1)) - F.count_distinct("fp")).alias("dup_docs")
    )
    surp = unigram_logprob_scores(docs, "text", "doc_id").select(
        "doc_id", F.col("surprisal").alias("doc_surprisal")
    )
    joined = base.join(surp, "doc_id").join(F.broadcast(dup), "source")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
        F.max("dup_docs").cast("long").alias("dup_docs"),
        F.round(F.avg("doc_surprisal"), 6).alias("mean_surprisal"),
        F.round(
            F.expr("percentile(doc_surprisal, 0.5)"), 6
        ).alias("median_surprisal"),
    )


@_register(
    "za25_volume_drift",
    """
    WITH daily AS (
        SELECT event_type AS category,
               strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                   AS day_num,
               count(*) AS n_events
        FROM events GROUP BY 1, 2, 3
    ), win AS (
        SELECT category, day, n_events,
               avg(n_events) OVER w AS m,
               stddev_samp(CAST(n_events AS DOUBLE)) OVER w AS sd,
               count(*) OVER w AS prior
        FROM daily
        WINDOW w AS (PARTITION BY category ORDER BY day_num
                     RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT category, day, n_events,
           round(m, 6) AS trail_mean,
           round(CASE WHEN prior >= 2 AND sd > 0
                      THEN (n_events - m) / sd END, 6) AS z,
           coalesce(abs(CASE WHEN prior >= 2 AND sd > 0
                             THEN (n_events - m) / sd END) > 3.0,
                    FALSE) AS is_anomaly,
           (prior >= 2 AND sd = 0 AND n_events <> m) AS constant_jump
    FROM win
    """,
)
def za25_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category daily-volume drift detection
    (operators/drift.volume_drift): trailing-7-day z-score with the
    current day EXCLUDED from its own baseline — the standard cheap
    ingest-monitoring alarm. One hash agg to daily counts (the
    reduction — category×day rows are tiny at any corpus scale) + one
    window shuffle on the category key."""
    from computer_vision_foundations_spark.operators.drift import (
        volume_drift,
    )

    events = load_table(spark, sf_dir, "events")
    out = volume_drift(events, "ts", "event_type", window_days=7)
    return out.withColumn("day", F.date_format("day", "yyyy-MM-dd"))
