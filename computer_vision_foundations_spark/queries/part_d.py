"""Registry slice — see computer_vision_foundations_spark/queries/__init__.py."""
from __future__ import annotations

from computer_vision_foundations_spark.queries.common import (  # noqa: F401
    DataFrame,
    F,
    STOPWORDS,
    SparkSession,
    _ORACLES,
    _register,
    language_score_columns,
    load_table,
)
from computer_vision_foundations_spark.queries.part_a import (  # noqa: F401
    _SHINGLES_SQL,
    _lang_score_sql,
    za23_lsh_candidate_pairs,
    q92_simhash,
    z10_fuzzy_name_pairs,
)
from computer_vision_foundations_spark.queries.part_b import (  # noqa: F401
    _PR_EDGES_SQL,
    za63_simhash_near_dup_pairs,
)
from computer_vision_foundations_spark.queries.part_c import (  # noqa: F401
    z53_kneser_ney_surprisal,
)



def _novelty_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.novelty import (
        novelty_oracle_sql,
    )

    return novelty_oracle_sql(
        cand_where="doc_id % 2 = 1", ref_where="doc_id % 2 = 0", k=3
    )


@_register("z55_ngram_novelty", _novelty_oracle_sql())
def z55_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty of a candidate half-corpus against
    the reference half (odd vs even doc ids as the stand-in snapshot
    split): fraction of distinct word-3-gram shingles unseen in the
    reference — the keep/drop signal for incoming crawl dumps and the
    dual of decontamination (``operators/novelty.py``; Lee et al.
    2022's train-set novelty at shingle granularity).

    Scale shape: both sides reduce to (id, shingle) projections via
    the shared zip_with shingle fold; novelty is ONE left-anti hash
    join + a per-doc aggregate; bodies never shuffle."""
    from computer_vision_foundations_spark.operators.novelty import (
        ngram_novelty,
    )

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
        "text",
        "doc_id",
        k=3,
    )


@_register(
    "z56_containment_pairs",
    f"""
    WITH sh AS ({_SHINGLES_SQL}),
    ex AS (SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS shingle FROM sh),
    exf AS (SELECT * FROM ex
            QUALIFY count(*) OVER (PARTITION BY shingle) <= 100)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(count(*) / CAST(least(a.sz, b.sz) AS DOUBLE), 6) AS overlap,
           round(count(*) / CAST(a.sz AS DOUBLE), 6) AS containment_a,
           round(count(*) / CAST(b.sz AS DOUBLE), 6) AS containment_b
    FROM exf a JOIN exf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.sz, b.sz
    HAVING count(*) / CAST(least(a.sz, b.sz) AS DOUBLE) >= 0.5
    """,
)
def z56_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-subset pairs by shingle containment
    (operators/dedup.containment_pairs) — Broder-1997's second
    resemblance measure, catching the doc-inside-doc duplicates
    symmetric Jaccard (q90) misses: a paragraph quoted inside a 100×
    longer page is Jaccard ≈ 1% but containment ≈ 100%. Same
    candidate machinery and hot-shingle cap as q90; only the scoring
    expression differs (overlap coefficient + both directional
    containments), so the two queries differ exactly where the
    operators do."""
    from computer_vision_foundations_spark.operators.dedup import (
        containment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs,
        "text",
        "doc_id",
        k=3,
        threshold=0.5,
        max_shingle_freq=100,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


def _kcore_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.kcore import (
        kcore_oracle_sql,
    )

    return kcore_oracle_sql(
        f"SELECT id_a, id_b FROM ({_ORACLES['za63_simhash_near_dup_pairs']})",
        k=3,
        n_rounds=8,
    )


@_register("q42_kcore_members", _kcore_oracle_sql())
def q42_kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the SimHash near-duplicate pair graph — iterative
    degree peeling (Batagelj & Zaveršnik 2003) until every surviving
    node keeps ≥ 3 neighbors: the "hard kernel" of each duplicate
    family after weakly-attached stragglers are stripped, completing
    the graph-cohesion kit (z51 triangles, z54 communities) —
    ``operators/kcore.py``. Runs the structural-equivalence COLLAPSED
    peel (same contract as z51): same-fingerprint nodes always share
    a degree, so whole classes peel together and the rounds run on
    the weighted quotient graph with a fixpoint early-stop — the
    clique-dense edge list never re-materializes per round. The
    oracle unrolls the identical NAIVE peel one CTE per round, so the
    quotient simulation is value-hash-verified.

    Scale shape: per round one quotient degree aggregate + one
    left-semi + weight join, all on class ids; quotient tables
    localCheckpoint with explicit release. The fingerprint table is
    computed ONCE (eager localCheckpoint) and shared by the pair
    generator and the class map — the tokenize+hash pipeline used to
    run twice (round-8 measured: ~1.5 s off the sf0.1 time)."""
    from computer_vision_foundations_spark.operators.dedup import (
        simhash_pairs,
    )
    from computer_vision_foundations_spark.operators.kcore import (
        k_core_collapsed,
    )

    fingerprints = q92_simhash(spark, sf_dir).localCheckpoint()
    # q49's exact parameters, over the shared fingerprint block
    pairs = simhash_pairs(
        fingerprints, "simhash", "doc_id", bits=32, bands=4, max_hamming=3
    )
    return k_core_collapsed(
        pairs,
        fingerprints,
        node_col="doc_id",
        cls_col="simhash",
        k=3,
        n_rounds=8,
    )


_PHRASES = [
    (0, ["hash", "join"]),
    (1, ["table", "scan"]),
    (2, ["sort", "merge", "join"]),
]


def _phrase_oracle_sql() -> str:
    """Per-phrase list scan: count positions where k consecutive
    tokens equal the phrase — the closed-form twin of the positional-
    postings join chain."""
    parts = []
    for pid, terms in _PHRASES:
        k = len(terms)
        conds = " AND ".join(
            f"t[CAST(i AS INTEGER) + {j}] = '{t}'"
            for j, t in enumerate(terms)
        )
        parts.append(
            f"""SELECT {pid} AS phrase_id, doc_id,
               len(list_filter(range(1, len(t) + 1 - {k - 1}),
                               i -> {conds})) AS n_matches
        FROM toks"""
        )
    body = "\n        UNION ALL\n        ".join(parts)
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), m AS (
        {body}
    )
    SELECT phrase_id, doc_id, CAST(n_matches AS BIGINT) AS n_matches
    FROM m WHERE n_matches > 0
    ORDER BY phrase_id, doc_id
    """


@_register("z58_phrase_search", _phrase_oracle_sql())
def z58_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search over a positional inverted index
    (operators/retrieval.phrase_search) — the retrieval primitive
    bag-of-words BM25 cannot express (positional postings, Manning
    et al. IIR §2.4); mixed 2- and 3-term phrases verify the
    variable-length join chain. The oracle counts consecutive-token
    matches with a per-phrase list scan — same semantics, closed
    form.

    Scale shape: the token stream is semi-joined against the
    broadcast phrase vocabulary BEFORE any shuffle (the BM25
    discipline), then |terms|−1 co-partitioned (doc, pos) hash
    joins; postings shuffle is bounded by phrase-term document
    frequency."""
    from computer_vision_foundations_spark.operators.retrieval import (
        phrase_search,
    )

    docs = load_table(spark, sf_dir, "documents")
    phrases = spark.createDataFrame(
        _PHRASES, "phrase_id int, terms array<string>"
    )
    return phrase_search(docs, phrases)


def _nb_report_oracle_sql() -> str:
    return f"""
    WITH preds AS MATERIALIZED ({_ORACLES["z52_naive_bayes_lang"]}),
    pairs AS (
        SELECT lang AS actual, predicted, count(*) AS n
        FROM preds GROUP BY 1, 2
    ),
    tp AS (SELECT actual AS cls, n AS tp FROM pairs
           WHERE actual = predicted),
    at AS (SELECT actual AS cls, sum(n) AS support FROM pairs GROUP BY 1),
    pt AS (SELECT predicted AS cls, sum(n) AS pred_n FROM pairs GROUP BY 1),
    per0 AS (
        SELECT COALESCE(at.cls, pt.cls) AS cls,
               COALESCE(at.support, 0) AS support,
               COALESCE(tp.tp, 0) AS tp,
               COALESCE(pt.pred_n, 0) - COALESCE(tp.tp, 0) AS fp,
               COALESCE(at.support, 0) - COALESCE(tp.tp, 0) AS fn
        FROM at FULL JOIN pt ON at.cls = pt.cls
        LEFT JOIN tp ON tp.cls = COALESCE(at.cls, pt.cls)
    ),
    pr AS (
        SELECT cls, support, tp, fp, fn,
               CASE WHEN tp + fp > 0
                    THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END AS p,
               CASE WHEN tp + fn > 0
                    THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END AS r
        FROM per0
    ),
    per AS (
        SELECT cls, support, tp, fp, fn,
               round(p, 6) AS precision, round(r, 6) AS recall,
               round(CASE WHEN p + r > 0
                          THEN 2 * p * r / (p + r) ELSE 0.0 END, 6) AS f1
        FROM pr
    )
    SELECT cls, CAST(support AS BIGINT) AS support,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn, precision, recall, f1
    FROM per
    UNION ALL
    SELECT '__macro__', CAST(sum(support) AS BIGINT),
           CAST(sum(tp) AS BIGINT), CAST(sum(fp) AS BIGINT),
           CAST(sum(fn) AS BIGINT),
           round(avg(precision), 6), round(avg(recall), 6),
           round(avg(f1), 6)
    FROM per
    ORDER BY cls
    """


@_register("z59_nb_classification_report", _nb_report_oracle_sql())
def z59_nb_classification_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-class precision/recall/F1 + macro summary for the z52
    Naive Bayes language classifier
    (operators/cls_eval.classification_report) — the confusion-margin
    metrics any classifier-as-corpus-filter needs before its keep/
    drop decisions are trusted; completes the evaluation family
    (recall@k → ANN, nDCG → ranking, PRF → dedup candidates, this →
    classifiers). The oracle nests the verified z52 oracle and
    replays the margin algebra.

    Scale shape: corpus shuffles once as (actual, predicted) pairs;
    everything after is |classes|²-row algebra."""
    from computer_vision_foundations_spark.operators.cls_eval import (
        classification_report,
    )
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_train_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    preds = nb_train_score(docs)
    return classification_report(preds, "lang", "predicted")


def _auc_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.cls_eval import (
        auc_oracle_sql,
    )

    return auc_oracle_sql(
        f"""SELECT (d.lang = 'zh') AS label, s.surprisal AS score
            FROM ({_ORACLES["z53_kneser_ney_surprisal"]}) s
            JOIN documents d ON d.doc_id = s.doc_id"""
    )


@_register("z60_surprisal_auc", _auc_oracle_sql())
def z60_surprisal_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-free ROC-AUC (Mann-Whitney rank-sum identity, ½
    credit for ties) of the z53 Kneser-Ney surprisal score as a
    detector of zh-language documents
    (operators/cls_eval.auc_score) — does the LM actually separate
    the distribution it would gate? The oracle nests the verified
    z53 oracle and replays the histogram cumulative fold.

    Scale shape: the corpus contributes ONE hash aggregate into a
    (score, n_pos, n_neg) histogram; the ordered fold runs over
    distinct rounded scores — model-sized regardless of corpus."""
    from computer_vision_foundations_spark.operators.cls_eval import (
        auc_score,
    )

    scored = z53_kneser_ney_surprisal(spark, sf_dir).join(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang"),
        "doc_id",
    )
    return auc_score(
        scored.select(
            (F.col("lang") == "zh").alias("label"),
            F.col("surprisal").alias("score"),
        )
    )


def _dbscan_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.dbscan import (
        dbscan_oracle_sql,
    )

    return dbscan_oracle_sql(eps=1.2, min_pts=5)


@_register("z61_dbscan_clusters", _dbscan_oracle_sql())
def z61_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked DBSCAN (Ester et al. 1996) over the embedding
    table — density clustering with an explicit NOISE label, the
    off-manifold-junk detector the centroid family can't express
    (``operators/dbscan.py``). ε=1.2, min_pts=5, blocking on the
    first two dims; clusters close through the engine's own
    connected-components operator; border points take the smallest
    core-neighbor label (determinism rule). The oracle runs the
    UNBLOCKED quadratic join + a recursive-CTE closure, so the hash
    also proves the grid join loses no ε-pair.

    Scale shape: vectors cross once through the 3^p adjacent-cell
    equi-join; core test and labels are id-pair algebra; components
    ride the checkpointed min-label loop."""
    from computer_vision_foundations_spark.operators.dbscan import dbscan

    emb = load_table(spark, sf_dir, "embeddings")
    return dbscan(emb, "embedding", "vec_id", eps=1.2, min_pts=5)


@_register(
    "z62_heaps_fit",
    """
    WITH toks AS (
        SELECT doc_id AS d, unnest(string_split(text, ' ')) AS token
        FROM documents
    ), t AS (
        SELECT * FROM toks WHERE token <> ''
    ), per_doc AS (
        SELECT d, count(*) AS n_toks FROM t GROUP BY d
    ), first_doc AS (
        SELECT token, min(d) AS d FROM t GROUP BY token
    ), new_types AS (
        SELECT d, count(*) AS n_new FROM first_doc GROUP BY d
    ), cum AS (
        SELECT p.d,
               sum(p.n_toks) OVER (ORDER BY p.d) AS cum_toks,
               sum(COALESCE(nt.n_new, 0)) OVER (ORDER BY p.d) AS cum_types
        FROM per_doc p LEFT JOIN new_types nt ON nt.d = p.d
    ), l AS (
        SELECT ln(CAST(cum_toks AS DOUBLE)) AS x,
               ln(CAST(cum_types AS DOUBLE)) AS y
        FROM cum
    ), a AS (
        SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
               sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        FROM l
    )
    SELECT CAST(m AS BIGINT) AS n_points,
           round((sxy - sx*sy/m) / (sxx - sx*sx/m), 6) AS beta,
           round((sy - (sxy - sx*sy/m) / (sxx - sx*sx/m) * sx) / m, 6)
               AS log_k,
           round(((sxy - sx*sy/m) * (sxy - sx*sy/m))
                 / ((sxx - sx*sx/m) * (syy - sy*sy/m)), 6) AS r2
    FROM a
    """,
)
def z62_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit (operators/vocab.heaps_fit) —
    the companion corpus-health number to z45's Zipf slope: β near 0
    means the crawl is saturating (re-crawls add tokens, no types);
    β near 1 means tokenizer-hostile never-repeating vocabulary. One
    cumulative pass over the DOC-level table in doc_id order; the
    oracle replays the identical first-occurrence algebra and
    closed-form regression.

    Scale shape: three token-stream hash aggregates (per-doc counts,
    vocab first-docs, per-doc new types); the window runs over |docs|
    narrow rows, never tokens."""
    from computer_vision_foundations_spark.operators.vocab import heaps_fit

    docs = load_table(spark, sf_dir, "documents")
    return heaps_fit(docs)


def _calibration_oracle_sql() -> str:
    return f"""
    WITH preds AS MATERIALIZED ({_ORACLES["z52_naive_bayes_lang"]}),
    s AS (
        SELECT (predicted = lang) AS label, log_score AS score
        FROM preds
    )
    SELECT CAST(floor(score / 10.0) AS BIGINT) AS bin,
           round(CAST(floor(score / 10.0) AS BIGINT) * 10.0, 6) AS bin_lo,
           count(*) AS n,
           CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
           round(sum(CASE WHEN label THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS frac_pos
    FROM s GROUP BY 1 ORDER BY 1
    """


@_register("z63_nb_calibration", _calibration_oracle_sql())
def z63_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the z52 Naive Bayes classifier
    (operators/cls_eval.calibration_bins): correctness rate per
    fixed-width joint-log-likelihood bin — does higher model
    confidence actually mean more correct predictions? Fixed-width
    bins (plan literals) rather than quantiles by design: no global
    rank of the corpus, ONE hash aggregate. The oracle nests the
    verified z52 oracle."""
    from computer_vision_foundations_spark.operators.cls_eval import (
        calibration_bins,
    )
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_train_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    preds = nb_train_score(docs)
    return calibration_bins(
        preds.select(
            (F.col("predicted") == F.col("lang")).alias("label"),
            F.col("log_score").alias("score"),
        ),
        bin_width=10.0,
    )


def _best_of_cluster_oracle_sql() -> str:
    return f"""
    WITH clusters AS MATERIALIZED ({_ORACLES["q94_dedup_clusters"]}),
    q AS (
        SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
               CAST(d.n_chars AS DOUBLE) AS score
        FROM documents d
        LEFT JOIN clusters c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, component, score,
           row_number() OVER (
               PARTITION BY component ORDER BY score DESC, doc_id ASC
           ) = 1 AS keep
    FROM q ORDER BY doc_id
    """


@_register("z64_keep_best_of_cluster", _best_of_cluster_oracle_sql())
def z64_keep_best_of_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection
    (operators/selection.keep_best_per_cluster): for each q94
    near-duplicate cluster keep the highest-quality member (here:
    longest document, the RefinedWeb keep-the-fullest-copy policy)
    instead of the smallest-id default; unclustered docs are
    singleton keepers. The oracle nests the verified q94
    recursive-closure oracle.

    Scale shape: one id equi-join + one per-cluster window — the
    min-id rule's exact budget."""
    from computer_vision_foundations_spark.operators.components import (
        dedup_clusters,
    )
    from computer_vision_foundations_spark.operators.selection import (
        keep_best_per_cluster,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = za23_lsh_candidate_pairs(spark, sf_dir)
    clusters = dedup_clusters(pairs).select("doc_id", "component")
    quality = docs.select(
        "doc_id", F.col("n_chars").cast("double").alias("score")
    )
    return keep_best_per_cluster(
        clusters, quality, "doc_id", "component", "score"
    )


def _jsd_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.divergence import (
        jsd_oracle_sql,
    )

    return jsd_oracle_sql()


@_register("z65_source_divergence", _jsd_oracle_sql())
def z65_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the sources' unigram
    distributions (operators/divergence.source_jsd) — the
    information-theoretic mixture diagnostic: which domains actually
    differ, and by how much, before z14/q15 assign them separate
    weights. Laplace-smoothed over the shared vocabulary; natural-log
    JSD ≤ ln 2.

    Scale shape: one token-stream hash aggregate; the distribution
    grid and its token self-join are |V|·|sources|(²) rows —
    model-sized; one final pair aggregate."""
    from computer_vision_foundations_spark.operators.divergence import (
        source_jsd,
    )

    docs = load_table(spark, sf_dir, "documents")
    return source_jsd(docs)


def _nb_cv_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_cv_oracle_sql,
    )

    return nb_cv_oracle_sql(k=3, seed=7)


@_register("z66_nb_crossval", _nb_cv_oracle_sql())
def z66_nb_crossval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-fold cross-validated Naive Bayes accuracy
    (operators/nbayes.nb_fit_score over
    operators/split.kfold_assignment folds) — the evaluation hygiene
    resubstitution (z52) can't give: each fold is scored by a model
    that never saw it, with the OOV smoothing floor exercised for
    real. Per-fold ``(fold, n, n_correct, accuracy)``. The oracle
    replays all three train/score pipelines as MATERIALIZED blocks
    with the portable md5 fold split.

    Scale shape: k model builds (each the z52 budget over (k−1)/k of
    the corpus); the folds are a pure hash function — no shuffle to
    split."""
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_fit_score,
    )
    from computer_vision_foundations_spark.operators.split import (
        kfold_assignment,
    )

    docs = load_table(spark, sf_dir, "documents")
    folded = kfold_assignment(docs, "doc_id", k=3, seed=7)
    parts = []
    for i in range(3):
        preds = nb_fit_score(
            folded.where(F.col("fold") != i),
            folded.where(F.col("fold") == i),
        )
        parts.append(
            preds.agg(
                F.lit(i).alias("fold"),
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.when(
                        F.col("predicted") == F.col("lang"), 1
                    ).otherwise(0)
                ).alias("n_correct"),
            )
        )
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res.select(
        "fold",
        "n",
        "n_correct",
        F.round(
            F.col("n_correct") / F.col("n").cast("double"), 6
        ).alias("accuracy"),
    ).orderBy("fold")


def _mad_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.outliers import (
        mad_outlier_oracle_sql,
    )

    return mad_outlier_oracle_sql()


@_register("z67_mad_outliers", _mad_oracle_sql())
def z67_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-event-type outlier summary
    (operators/outliers.mad_outlier_summary): exact median + MAD and
    the modified-z-score flag counts — the monitoring aggregate whose
    location/scale the outliers themselves cannot corrupt.

    Scale shape: two exact-percentile hash aggregates over the narrow
    (key, value) projection, each joined back by BROADCAST; the
    percentile buffers are per-key — switch to percentile_approx for
    unbounded keys (documented in the module)."""
    from computer_vision_foundations_spark.operators.outliers import (
        mad_outlier_summary,
    )

    events = load_table(spark, sf_dir, "events")
    return mad_outlier_summary(events)


def _ewma_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.smoothing import (
        ewma_oracle_sql,
    )

    return ewma_oracle_sql()


@_register("z68_ewma_level", _ewma_oracle_sql())
def z68_ewma_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA level after the last event
    (operators/smoothing.ewma_by_key) — the sequential recursion
    s_t = αx_t + (1−α)s_{t−1} run as its ONE-PASS closed form
    (window weights + keyed aggregate), no loop, no UDF.

    Scale shape: a single shuffle on the key shared by the window
    sort and the final aggregate."""
    from computer_vision_foundations_spark.operators.smoothing import (
        ewma_by_key,
    )

    events = load_table(spark, sf_dir, "events")
    return ewma_by_key(events)


def _walks_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.walks import (
        seeded_walks_oracle_sql,
    )

    return seeded_walks_oracle_sql()


@_register("z69_seeded_walks", _walks_oracle_sql())
def z69_seeded_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-seeded deterministic random walks over the observed
    event-type transition graph (operators/walks.seeded_walks) — the
    replayable sampling primitive behind DeepWalk/node2vec: the
    per-step choice is argmin md5(seed|step|src|dst), so a 100 TB walk
    job is exactly reproducible and differential-testable.

    Scale shape: one window pass builds the edge list; each step is a
    node-sized min_by choice table broadcast-joined to the frontier."""
    from computer_vision_foundations_spark.operators.walks import (
        seeded_walks,
        transition_edges,
    )

    events = load_table(spark, sf_dir, "events")
    return seeded_walks(transition_edges(events), steps=4, seed=7)


def _kappa_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.agreement import (
        kappa_algebra_sql,
    )

    labeled = f"""
    WITH scored AS (
      SELECT lang,
             {_lang_score_sql(STOPWORDS['de'])} AS score_de,
             {_lang_score_sql(STOPWORDS['en'])} AS score_en,
             {_lang_score_sql(STOPWORDS['es'])} AS score_es,
             {_lang_score_sql(STOPWORDS['fr'])} AS score_fr
      FROM documents),
    labeled AS (
      SELECT lang AS a,
             CASE WHEN greatest(score_de, score_en, score_es, score_fr) = 0 THEN 'und'
                  WHEN score_fr = greatest(score_de, score_en, score_es, score_fr) THEN 'fr'
                  WHEN score_es = greatest(score_de, score_en, score_es, score_fr) THEN 'es'
                  WHEN score_en = greatest(score_de, score_en, score_es, score_fr) THEN 'en'
                  ELSE 'de' END AS b
      FROM scored)"""
    return labeled + kappa_algebra_sql("labeled")


@_register("z70_kappa_agreement", _kappa_oracle_sql())
def z70_kappa_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the labeled lang column and the stopword
    language-ID heuristic (operators/agreement.cohens_kappa over
    functions/text.language_score_columns) — chance-corrected
    agreement, the honest version of q62's confusion matrix.

    Scale shape: one shuffle of a two-column projection; marginals are
    |classes|-sized and broadcast."""
    from computer_vision_foundations_spark.operators.agreement import (
        cohens_kappa,
    )

    docs = load_table(spark, sf_dir, "documents")
    labeled = language_score_columns(docs, "text")
    return cohens_kappa(labeled, "lang", "lang_guess")


def _diversity_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.diversity import (
        diversity_oracle_sql,
    )

    return diversity_oracle_sql()


@_register("z71_source_diversity", _diversity_oracle_sql())
def z71_source_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity indices per source
    (operators/diversity.group_diversity): Shannon entropy, normalized
    entropy, Simpson index over each slice's unigram distribution —
    detects boilerplate-heavy sources before they get mixture weight.

    Scale shape: one token-stream shuffle into (grp, tok) counts, one
    |groups|-row aggregate."""
    from computer_vision_foundations_spark.operators.diversity import (
        group_diversity,
    )

    docs = load_table(spark, sf_dir, "documents")
    return group_diversity(docs)


def _spearman_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.rank_corr import (
        spearman_oracle_sql,
    )

    return spearman_oracle_sql()


@_register("z72_trend_spearman", _spearman_oracle_sql())
def z72_trend_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Spearman correlation between event time and
    value (operators/rank_corr.spearman_by_group) — the monotonic
    trend detector (Mann-Kendall's practical cousin): average ranks
    for ties, Pearson over the rank pairs.

    Scale shape: two rank windows + one correlation aggregate, all
    partitioned by the same key — one shuffle total, no UDF."""
    from computer_vision_foundations_spark.operators.rank_corr import (
        spearman_by_group,
    )

    events = load_table(spark, sf_dir, "events")
    return spearman_by_group(events, "ts", "value")


def _benford_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.benford import (
        benford_oracle_sql,
    )

    return benford_oracle_sql()


@_register("z73_benford_values", _benford_oracle_sql())
def z73_benford_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit histogram of event values vs Benford's
    law with per-digit chi-square contributions
    (operators/benford.benford_digits) — the forensic data-quality
    screen for fabricated/truncated numeric columns.

    Scale shape: one projection + one 9-row aggregate; the
    expectation grid is a broadcast 9-row sequence."""
    from computer_vision_foundations_spark.operators.benford import (
        benford_digits,
    )

    events = load_table(spark, sf_dir, "events")
    return benford_digits(events, "value")


def _autocorr_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.timeseries import (
        autocorr_oracle_sql,
    )

    return autocorr_oracle_sql()


@_register("z74_hourly_autocorr", _autocorr_oracle_sql())
def z74_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's hourly-count series
    (operators/timeseries.lag1_autocorr) — does the volume have
    momentum/seasonality, i.e. does the anomaly detector need a
    seasonal baseline?

    Scale shape: one shuffle into (key, hour) counts; the lag window
    reuses the same partitioning."""
    from computer_vision_foundations_spark.operators.timeseries import (
        lag1_autocorr,
    )

    events = load_table(spark, sf_dir, "events")
    return lag1_autocorr(events)


def _cusum_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.timeseries import (
        cusum_oracle_sql,
    )

    return cusum_oracle_sql()


@_register("z75_cusum_changepoint", _cusum_oracle_sql())
def z75_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline max-CUSUM changepoint per event type
    (operators/timeseries.cusum_changepoint): the hour maximizing
    |Σ(x−x̄)| over the hourly-count series plus the σ̂√n-normalized
    statistic — Page's test in its batch form, the drift family's
    "WHEN did it change" answer.

    Scale shape: one shuffle into (key, hour) counts; global-stat and
    prefix-sum windows share the key partitioning; sequential window
    sums are bit-identical across engines."""
    from computer_vision_foundations_spark.operators.timeseries import (
        cusum_changepoint,
    )

    events = load_table(spark, sf_dir, "events")
    return cusum_changepoint(events)


def _km_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.survival import (
        km_oracle_sql,
    )

    return km_oracle_sql()


@_register("z76_kaplan_meier", _km_oracle_sql())
def z76_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve over user activity spans
    (operators/survival.kaplan_meier): lifetimes = hours between a
    user's first and last event, censored when the last event is
    within 24 h of the corpus horizon — the censoring-correct version
    of the cohort retention grid.

    Scale shape: one keyed aggregate builds spans; the life table is
    |distinct durations| rows, so its windows are model-sized."""
    from computer_vision_foundations_spark.operators.survival import (
        activity_spans,
        kaplan_meier,
    )

    events = load_table(spark, sf_dir, "events")
    return kaplan_meier(activity_spans(events))


# Cluster-evaluation centroids: the seeded-gaussian stand-ins scaled
# to the embedding table's data range (σ ≈ 0.12) so the partition is
# non-degenerate. Deterministic → the oracle embeds the same literals.
_CE_DIM, _CE_K, _CE_SEED, _CE_SCALE = 64, 8, 42, 0.15


def _ce_centroids() -> list[list[float]]:
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    return [
        [_CE_SCALE * x for x in c]
        for c in random_centroids(_CE_DIM, _CE_K, _CE_SEED)
    ]


def _silhouette_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.cluster_eval import (
        silhouette_oracle_sql,
    )

    return silhouette_oracle_sql("embeddings", "embedding", _ce_centroids())


@_register("z77_silhouette", _silhouette_oracle_sql())
def z77_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette per cluster (Hruschka 2004 centroid form;
    operators/cluster_eval.simplified_silhouette) — the one-pass
    validation loop for the clustering family: s=(b−a)/max(a,b) from
    own-centroid vs nearest-other-centroid distance, averaged per
    cluster. Centroids are plan literals (the IVF/PQ convention).

    Scale shape: one narrow codegen pass computes (cluster, a, b); one
    |k|-row aggregate. The corpus shuffles once as three columns."""
    from computer_vision_foundations_spark.operators.cluster_eval import (
        simplified_silhouette,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return simplified_silhouette(emb, _ce_centroids(), "embedding")


def _db_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.cluster_eval import (
        davies_bouldin_oracle_sql,
    )

    return davies_bouldin_oracle_sql(
        "embeddings", "embedding", _ce_centroids()
    )


@_register("z78_davies_bouldin", _db_oracle_sql())
def z78_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-quality report
    (operators/cluster_eval.davies_bouldin): per-cluster scatter S_i
    and R_i = max_j (S_i+S_j)/M_ij over the literal centroid-distance
    table; avg(r) is the DB index (lower = tighter/better separated).

    Scale shape: the same one-pass (cluster, a) aggregate as z77 plus
    a |k|² broadcast join of literals."""
    from computer_vision_foundations_spark.operators.cluster_eval import (
        davies_bouldin,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return davies_bouldin(emb, _ce_centroids(), "embedding")


_IF_TREES, _IF_DEPTH, _IF_SEED = 8, 6, 7


def _if_trees() -> list[dict]:
    from computer_vision_foundations_spark.operators.iforest import (
        random_cut_trees,
    )

    return random_cut_trees(
        _CE_DIM, n_trees=_IF_TREES, max_depth=_IF_DEPTH, seed=_IF_SEED
    )


def _iforest_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.iforest import (
        isolation_oracle_sql,
    )

    return isolation_oracle_sql(_if_trees())


@_register("z79_isolation_scores", _iforest_oracle_sql())
def z79_isolation_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolation-forest anomaly scores over the embedding table
    (operators/iforest.isolation_scores, Liu 2008 scoring): ensemble-
    mean random-cut leaf depth → 2^(−avg/c(256)). The registered
    member uses seeded DATA-INDEPENDENT box-refined cuts so the eight
    trees are plan literals and the oracle replays them as nested
    CASEs; the classic sample-trained construction (iforest_fit) is
    pytest-verified.

    Scale shape: one narrow projection per row — no shuffle, no UDF,
    no join; the model is codegen'd literal comparisons."""
    from computer_vision_foundations_spark.operators.iforest import (
        isolation_scores,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return isolation_scores(emb, _if_trees(), "embedding", "vec_id")


def _qnorm_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.qnorm import (
        qnorm_oracle_sql,
    )

    return qnorm_oracle_sql()


@_register("z80_quantile_norm", _qnorm_oracle_sql())
def z80_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization of document lengths
    (operators/qnorm.quantile_normalize, Bolstad 2003): each value is
    replaced by the GLOBAL distribution's value at its within-source
    rank fraction, making one quality threshold mean the same thing
    in every source before mixture weighting.

    Scale shape: one per-source rank window, one global sort window
    over the score projection, two integer equi-joins for the lerp —
    no UDF, no collect."""
    from computer_vision_foundations_spark.operators.qnorm import (
        quantile_normalize,
    )

    docs = load_table(spark, sf_dir, "documents")
    return quantile_normalize(docs, "n_chars", "source", "doc_id")


def _char_entropy_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.diversity import (
        char_entropy_oracle_sql,
    )

    return char_entropy_oracle_sql()


@_register("z81_char_entropy", _char_entropy_oracle_sql())
def z81_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution Shannon entropy
    (operators/diversity.doc_char_entropy) — the byte-level junk
    detector (binary blobs, keyboard mash, constant padding) that
    complements the token-level quality battery (q66, z33).

    Scale shape: the character stream shuffles once into (id, char)
    counts; one per-doc aggregate."""
    from computer_vision_foundations_spark.operators.diversity import (
        doc_char_entropy,
    )

    docs = load_table(spark, sf_dir, "documents")
    return doc_char_entropy(docs)


def _mutual_knn_oracle_sql() -> str:
    return f"""
    WITH knn AS MATERIALIZED ({_ORACLES['z30_knn_join']})
    SELECT a.qid AS id_a, a.nid AS id_b, a.cos_sim
    FROM knn a JOIN knn b ON b.qid = a.nid AND b.nid = a.qid
    WHERE a.qid < a.nid
    ORDER BY 1, 2
    """


@_register("z82_mutual_knn", _mutual_knn_oracle_sql())
def z82_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-kNN pairs over the blocked self-kNN join
    (operators/similarity.mutual_knn_pairs): keep (a, b) only when
    EACH is in the other's top-3 — the de-hubbed high-precision edge
    set retrieval systems use for re-ranking and dedup
    canonicalization. The oracle nests z30's verified kNN twin and
    replays the reciprocity join.

    Scale shape: z30's blocked-join budget + one id-pair self-join;
    vectors never cross the reciprocity join."""
    from computer_vision_foundations_spark.operators.similarity import (
        mutual_knn_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return mutual_knn_pairs(emb, k=3, block_col="label")


@_register(
    "z83_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15'
      AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def z83_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): the classic
    3-table star join + grouped revenue + top-10, the OLAP pattern
    every relational engine is graded on. Deterministic tie-break by
    (o_orderdate, l_orderkey).

    Scale shape: customer/orders dimensions broadcast against the
    lineitem fact scan; ship/order-date filters push into parquet;
    one grouped aggregate + TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                ),
                2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), "o_orderdate", "l_orderkey"
        )
        .limit(10)
    )


@_register(
    "z84_returned_item_losses",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS lost_revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def z84_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): which customers
    drive return losses — dimension joins + a selective fact filter +
    grouped top-20.

    Scale shape: the l_returnflag filter pushes into the fact scan;
    customer/orders broadcast; one grouped aggregate +
    TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (F.lit(1) - F.col("l_discount"))
                ),
                2,
            ).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "z85_small_qty_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN (
        SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_cut
        FROM lineitem GROUP BY l_partkey
    ) t ON l_partkey = t.pk
    WHERE l_quantity < t.qty_cut
    """,
)
def z85_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the classic
    correlated-aggregate-decorrelated-to-a-join pattern — revenue of
    line items below 20 % of their part's average quantity.

    Scale shape: the correlated subquery runs ONCE as a per-part
    aggregate (|parts| rows) and joins back on the part key — the
    decorrelation Catalyst is trusted for elsewhere (q04 exists)
    spelled explicitly; the fact scans twice, never quadratically."""
    li = load_table(spark, sf_dir, "lineitem")
    cut = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(cut, li["l_partkey"] == cut["pk"])
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias(
                "avg_yearly"
            )
        )
    )


def _basket_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.basket import (
        basket_oracle_sql,
    )

    return basket_oracle_sql(
        "lineitem", "l_orderkey", "l_partkey", min_pair_count=2
    )


@_register("z86_market_basket", _basket_oracle_sql())
def z86_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order line items
    (operators/basket.basket_pair_rules): support, confidence, lift
    for part pairs co-purchased in ≥2 orders — pair formation only
    INSIDE a basket (the join is output-bound; mega-baskets capped).

    Scale shape: one basket-key self-join + three hash aggregates;
    item/basket totals broadcast back."""
    from computer_vision_foundations_spark.operators.basket import (
        basket_pair_rules,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return basket_pair_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=2
    )


def _chi2_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.feature_select import (
        chi2_oracle_sql,
    )

    return chi2_oracle_sql()


@_register("z87_chi2_tokens", _chi2_oracle_sql())
def z87_chi2_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square token-vs-language feature relevance
    (operators/feature_select.chi2_tokens): the top-50 tokens whose
    document-level presence/absence contingency against the class
    column carries label signal — the feature-selection gate in
    front of the z52/z47 classifier featurizers.

    Scale shape: one tokenize shuffle into (token, class) presence
    counts; everything after is |V|·|classes| model-sized grid
    algebra; top-k via TakeOrderedAndProject."""
    from computer_vision_foundations_spark.operators.feature_select import (
        chi2_tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chi2_tokens(docs)


_INC_CUTOFF = "2024-01-15"


def _incremental_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.incremental import (
        incremental_oracle_sql,
    )

    return incremental_oracle_sql()


@_register("z88_incremental_agg", _incremental_oracle_sql())
def z88_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance
    (operators/incremental.merge_grouped): the per-event-type
    count/sum snapshot over events BEFORE the cutoff merged with the
    delta aggregate of events AFTER it. The oracle is deliberately
    the FULL RECOMPUTE over all rows — the strongest differential
    statement available: any drift between the incremental path and
    ground truth hash-fails.

    Scale shape: each side partial-aggregates map-side; the merge is
    one |groups|-sized full-outer join; history is scanned once."""
    from computer_vision_foundations_spark.operators.incremental import (
        grouped_snapshot,
        merge_grouped,
    )

    events = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp_ntz")
    snap = grouped_snapshot(
        events.where(F.col("ts") < cutoff), ["event_type"], "value"
    )
    delta = grouped_snapshot(
        events.where(F.col("ts") >= cutoff), ["event_type"], "value"
    )
    merged = merge_grouped(snap, delta, ["event_type"])
    return merged.select(
        "event_type",
        "n",
        F.round("total", 2).alias("total"),
    ).orderBy("event_type")


def _scd2_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.scd import (
        scd2_oracle_sql,
    )

    return scd2_oracle_sql()


@_register("z89_scd2_history", _scd2_oracle_sql())
def z89_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity-interval history of each user's event-type
    observations (operators/scd.scd2_history): consecutive unchanged
    observations collapse into one episode; ``valid_to`` closes at the
    next episode's start, NULL while current — the warehouse
    dimensional pattern next to the CDC reader (z31).

    Scale shape: one shuffle on the entity key shared by the
    change-flag (lag) and interval-close (lead) windows."""
    from computer_vision_foundations_spark.operators.scd import (
        scd2_history,
    )

    events = load_table(spark, sf_dir, "events")
    return scd2_history(events)


def _abtest_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.abtest import (
        abtest_oracle_sql,
    )

    return abtest_oracle_sql()


@_register("z90_ab_ztest", _abtest_oracle_sql())
def z90_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over deterministic hash-bucketed A/B
    groups (operators/abtest.ab_conversion_ztest): assignment =
    salted-md5 parity of the user id (coordination-free, replayable),
    conversion = any purchase event, pooled-variance z — the
    experimentation readout, assignment replayed in the oracle.

    Scale shape: one keyed aggregate (user → converted), one 2-row
    aggregate, scalar algebra."""
    from computer_vision_foundations_spark.operators.abtest import (
        ab_conversion_ztest,
    )

    events = load_table(spark, sf_dir, "events")
    return ab_conversion_ztest(events)


def _theil_sen_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.timeseries import (
        theil_sen_oracle_sql,
    )

    return theil_sen_oracle_sql()


@_register("z91_theil_sen_trend", _theil_sen_oracle_sql())
def z91_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope per event type
    (operators/timeseries.theil_sen_slope): the exact median of all
    pairwise hourly-count slopes — the magnitude companion to the
    z72 Spearman direction test, immune to single outlier buckets.

    Scale shape: pair formation is within-key over BUCKET-COUNT rows
    (granularity-bounded, executor-local quadratic), one exact-
    percentile aggregate."""
    from computer_vision_foundations_spark.operators.timeseries import (
        theil_sen_slope,
    )

    events = load_table(spark, sf_dir, "events")
    return theil_sen_slope(events)


def _seasonality_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.timeseries import (
        seasonality_oracle_sql,
    )

    return seasonality_oracle_sql()


@_register("z92_seasonality_strength", _seasonality_oracle_sql())
def z92_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality strength per event type
    (operators/timeseries.seasonality_strength): mean-per-slot
    profile, strength = max(0, 1 − var(residual)/var(series)) — the
    FPP decomposition-strength number that decides whether the z75
    changepoint detector needs a seasonal baseline first.

    Scale shape: two keyed aggregates after the hourly reduction."""
    from computer_vision_foundations_spark.operators.timeseries import (
        seasonality_strength,
    )

    events = load_table(spark, sf_dir, "events")
    return seasonality_strength(events)


def _abc_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.concentration import (
        abc_oracle_sql,
    )

    return abc_oracle_sql("lineitem", "l_partkey", "l_extendedprice")


@_register("z93_pareto_abc", _abc_oracle_sql())
def z93_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification of parts by revenue
    (operators/concentration.abc_classes): rank by value, cumulative
    share, A/B/C at 80 %/95 % with the inclusive first-crossing rule —
    the inventory classic, and the corpus question "which domains do
    80 % of my tokens come from".

    Scale shape: one per-unit reduction, scale-safe global ranking
    (range-partition + offsets), one |units|-row cumulative window."""
    from computer_vision_foundations_spark.operators.concentration import (
        abc_classes,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return abc_classes(li, "l_partkey", "l_extendedprice")


def _gini_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.concentration import (
        gini_oracle_sql,
    )

    return gini_oracle_sql("lineitem", "l_partkey", "l_extendedprice")


@_register("z94_gini_revenue", _gini_oracle_sql())
def z94_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini index of revenue concentration across parts
    (operators/concentration.gini_index, sorted form
    Σ(2i−n−1)xᵢ/(n·Σx)) — 0 = even, →1 = winner-takes-all; the
    scalar summary of z93's Lorenz curve.

    Scale shape: per-unit reduction + the scale-safe global ranking +
    one aggregate."""
    from computer_vision_foundations_spark.operators.concentration import (
        gini_index,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return gini_index(li, "l_partkey", "l_extendedprice")


def _richness_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.diversity import (
        richness_oracle_sql,
    )

    return richness_oracle_sql()


@_register("z95_lexical_richness", _richness_oracle_sql())
def z95_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax ratio + Yule's K per source
    (operators/diversity.lexical_richness) — the frequency-spectrum
    richness pair (length-robust, unlike raw type-token ratios) that
    separates natural text from template spam before mixture
    weighting.

    Scale shape: one token-stream shuffle, one spectrum aggregate."""
    from computer_vision_foundations_spark.operators.diversity import (
        lexical_richness,
    )

    docs = load_table(spark, sf_dir, "documents")
    return lexical_richness(docs)


_FS_FIELDS_SQL = [
    ("a.s_name = b.s_name", 0.95, 0.001),
    ("a.s_nationkey = b.s_nationkey", 0.9, 0.04),
    ("abs(a.s_acctbal - b.s_acctbal) <= 100", 0.8, 0.05),
]


def _linkage_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.linkage import (
        fs_weight_sql,
    )

    w = fs_weight_sql(_FS_FIELDS_SQL)
    return f"""
    WITH pairs AS MATERIALIZED ({_ORACLES['z10_fuzzy_name_pairs']}),
    scored AS (
        SELECT pairs.id_a, pairs.id_b, round({w}, 6) AS weight
        FROM pairs
        JOIN supplier a ON a.s_suppkey = pairs.id_a
        JOIN supplier b ON b.s_suppkey = pairs.id_b
    )
    SELECT id_a, id_b, weight,
           CASE WHEN weight >= 2.0 THEN 'match'
                WHEN weight >= 0.0 THEN 'review'
                ELSE 'reject' END AS decision
    FROM scored ORDER BY id_a, id_b
    """


@_register("z96_record_linkage", _linkage_oracle_sql())
def z96_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over the blocked
    fuzzy candidate pairs (operators/linkage.fs_link_scores composing
    z10's generator): per-field agreement bits weighted by literal
    log2(m/u) evidence, summed into match/review/reject — the Splink
    decision model. The oracle nests z10's verified quadratic twin and
    replays the weight algebra.

    Scale shape: candidates stay blocked (never quadratic); scoring
    is two id equi-joins + codegen algebra."""
    from computer_vision_foundations_spark.operators.linkage import (
        fs_link_scores,
    )

    sup = load_table(spark, sf_dir, "supplier")
    pairs = z10_fuzzy_name_pairs(spark, sf_dir).select("id_a", "id_b")
    fields = [
        (F.col("s_name_a") == F.col("s_name_b"), 0.95, 0.001, "name"),
        (
            F.col("s_nationkey_a") == F.col("s_nationkey_b"),
            0.9,
            0.04,
            "nation",
        ),
        (
            F.abs(F.col("s_acctbal_a") - F.col("s_acctbal_b"))
            <= F.lit(100),
            0.8,
            0.05,
            "acctbal",
        ),
    ]
    return fs_link_scores(pairs, sup, "s_suppkey", fields)


def _laplace_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.resample import (
        laplace_oracle_sql,
    )

    return laplace_oracle_sql()


@_register("z97_dp_noisy_counts", _laplace_oracle_sql())
def z97_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy grouped counts
    (operators/resample.laplace_noisy_counts): sensitivity-1 counts
    plus b=1/ε Laplace noise from a seeded hash uniform — the
    privacy-ACCOUNTING plumbing (a real deployment swaps the public
    seed for a secret noise source; documented in the module).

    Scale shape: one grouped count + one hash expression per group
    row."""
    from computer_vision_foundations_spark.operators.resample import (
        laplace_noisy_counts,
    )

    events = load_table(spark, sf_dir, "events")
    return laplace_noisy_counts(events, "event_type")


def _bootstrap_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.resample import (
        bootstrap_oracle_sql,
    )

    return bootstrap_oracle_sql(n_replicas=50)


@_register("z98_poisson_bootstrap", _bootstrap_oracle_sql())
def z98_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap confidence intervals for per-event-type
    mean value via the POISSON bootstrap (Chamandy 2012 — the
    distributed bootstrap: per-row Poisson(1) replica weights from a
    seeded hash, i.i.d., no global resample coordinate), 50 replicas.

    Scale shape: the replica explode is map-side narrow rows into one
    (key, replica) aggregate; the CI is an exact percentile over
    |replicas| means per key — no shuffle carries more than
    (key, b, double)."""
    from computer_vision_foundations_spark.operators.resample import (
        poisson_bootstrap_ci,
    )

    events = load_table(spark, sf_dir, "events")
    return poisson_bootstrap_ci(
        events, "value", "event_id", "event_type", n_replicas=50
    )


@_register(
    "z99_waiting_suppliers",
    """
    SELECT l1.l_suppkey AS suppkey, count(*) AS n_waiting
    FROM lineitem l1
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY l1.l_suppkey
    ORDER BY n_waiting DESC, suppkey
    LIMIT 25
    """,
)
def z99_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS + NOT-EXISTS double correlated-subquery pattern — the
    hardest standard decorrelation an OLAP engine is graded on — here
    expressed as one left-semi and one left-anti join against
    per-order extremes, never a per-row subquery.

    Scale shape: the multi-supplier test is a per-order aggregate
    (count distinct suppliers) semi-joined back; the "last to ship"
    test compares against the per-order max OTHER-supplier shipdate —
    both are |orders|-sized aggregates, the fact scans a bounded
    number of times, no nested loops."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    l1 = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    # EXISTS other-supplier rows: orders with >= 2 distinct suppliers
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("_ns"))
        .where(F.col("_ns") >= 2)
        .select("l_orderkey")
    )
    l1 = l1.join(multi, "l_orderkey", "left_semi")
    # NOT EXISTS a later-shipping OTHER supplier == this row's
    # shipdate >= max shipdate among OTHER suppliers of the order.
    # "max excluding self" over per-supplier maxes: reduce to one row
    # per (order, supplier) first, then top-1 / runner-up per order —
    # the argmax-supplier trick breaks on raw rows when a supplier
    # ships an order on several dates.
    smax = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("_smax")
    )
    top1 = smax.groupBy("l_orderkey").agg(
        F.max(F.struct("_smax", "l_suppkey")).alias("_m1")
    ).select(
        "l_orderkey",
        F.col("_m1._smax").alias("_d1"),
        F.col("_m1.l_suppkey").alias("_s1"),
    )
    runner = (
        smax.join(top1, "l_orderkey")
        .where(F.col("l_suppkey") != F.col("_s1"))
        .groupBy("l_orderkey")
        .agg(F.max("_smax").alias("_d2"))
    )
    cand = l1.join(top1, "l_orderkey").join(
        runner, "l_orderkey", "left"
    )
    other_max = F.when(
        F.col("_s1") != F.col("l_suppkey"), F.col("_d1")
    ).otherwise(F.col("_d2"))
    kept = cand.where(
        other_max.isNull() | (other_max <= F.col("l_shipdate"))
    )
    return (
        kept.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("n_waiting"))
        .orderBy(F.col("n_waiting").desc(), "suppkey")
        .limit(25)
    )


def _attribution_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.attribution import (
        attribution_oracle_sql,
    )

    return attribution_oracle_sql()


@_register("za01_markov_attribution", _attribution_oracle_sql())
def za01_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect channel attribution (Anderl 2014;
    operators/attribution.markov_attribution): user journeys truncate
    at first purchase, a first-order chain with absorbing CONV/NULL
    is estimated, and each channel is credited by how much start→CONV
    reach drops when transitions into it retarget NULL — computed for
    ALL removal scenarios at once as a scenario dimension through 12
    fixed value-iteration rounds (the PageRank unroll convention).

    Scale shape: one corpus-scale window pass + transition aggregate;
    the scenario grid and every iteration round are |channels|²-sized
    broadcast joins."""
    from computer_vision_foundations_spark.operators.attribution import (
        markov_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    return markov_attribution(events)


# Synthetic user coordinates: ~20 city clusters derived from user_id
# with pure integer/decimal arithmetic (identical in both engines);
# |lat| <= 50 keeps the radius-join cell bound valid.
_GEO_EXPR = (
    "CAST(-50.0 + (user_id % 20) * 5.0 + (user_id % 83) / 100.0 "
    "AS DOUBLE) AS lat, "
    "CAST(-100.0 + (user_id % 20) * 9.0 + (user_id % 79) / 100.0 "
    "AS DOUBLE) AS lon"
)
_GEO_PTS_SPARK = (
    "SELECT user_id AS id, " + _GEO_EXPR
    + " FROM (SELECT DISTINCT user_id FROM {events})"
)
_GEO_PTS_SQL = (
    "SELECT user_id AS id, " + _GEO_EXPR
    + " FROM (SELECT DISTINCT user_id FROM events)"
)


def _geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("_geo_events")
    return spark.sql(_GEO_PTS_SPARK.format(events="_geo_events"))


def _geohash_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.geo import (
        geohash_sql,
    )

    gh = geohash_sql("lat", "lon", precision=6)
    return f"""
    WITH pts AS ({_GEO_PTS_SQL})
    SELECT id, round(lat, 6) AS lat, round(lon, 6) AS lon,
           {gh} AS gh
    FROM pts ORDER BY id
    """


@_register("za02_geohash_cells", _geohash_oracle_sql())
def za02_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding of per-user coordinates
    (operators/geo.geohash): the closed-form Morton-interleaved
    base32 cell key (no loop, no UDF) — sortable, prefix-joinable,
    truncation-coarsenable. The oracle replays the identical integer
    algebra bit for bit.

    Scale shape: one codegen projection."""
    from computer_vision_foundations_spark.operators.geo import geohash

    pts = _geo_points(spark, sf_dir)
    return pts.select(
        "id",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
        geohash(F.col("lat"), F.col("lon"), precision=6).alias("gh"),
    ).orderBy("id")


def _radius_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.geo import (
        radius_oracle_sql,
    )

    return radius_oracle_sql(_GEO_PTS_SQL, radius_km=60.0)


@_register("za03_geo_radius_pairs", _radius_oracle_sql())
def za03_geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users within 60 km of each other
    (operators/geo.radius_pairs): the DBSCAN grid discipline on the
    globe — latitude/longitude cells sized for the radius at the
    data's worst latitude, 3×3 adjacent-cell equi-join, exact
    haversine verify. The oracle runs the QUADRATIC haversine join,
    so a hash match proves the blocking loses no pair.

    Scale shape: (cell, id, coords) rows with 9× one-side
    replication; no cross-cell candidates."""
    from computer_vision_foundations_spark.operators.geo import (
        radius_pairs,
    )

    pts = _geo_points(spark, sf_dir)
    return radius_pairs(
        pts, "id", "lat", "lon", radius_km=60.0, max_abs_lat=55.0
    ).orderBy("id_a", "id_b")


_KDE_GRID = [float(g) for g in range(0, 201, 20)]
_KDE_H = 15.0


def _kde_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.density import (
        kde_oracle_sql,
    )

    return kde_oracle_sql(
        "events", "value", "event_type", _KDE_GRID, _KDE_H
    )


@_register("za04_kde_density", _kde_oracle_sql())
def za04_kde_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian kernel density estimate of event values per type at a
    literal grid (operators/density.kde_at_grid) — the bin-artifact-
    free distribution curve, distributed as |grid| unrolled aggregate
    sums with map-side combine (the k-means/bootstrap unroll
    pattern). Fixed bandwidth keeps the estimate a pure literal
    function (Silverman's rule would need a per-key σ pre-pass).

    Scale shape: one shuffle of (key, value); everything else is
    codegen."""
    from computer_vision_foundations_spark.operators.density import (
        kde_at_grid,
    )

    events = load_table(spark, sf_dir, "events")
    return kde_at_grid(events, "value", "event_type", _KDE_GRID, _KDE_H)


def _wilson_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.stats_tests import (
        wilson_oracle_sql,
    )

    return wilson_oracle_sql()


@_register("za05_wilson_intervals", _wilson_oracle_sql())
def za05_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion rate per entry channel with Wilson score intervals
    (operators/stats_tests.wilson_intervals) — the binomial CI that
    stays honest at small n and extreme rates, the bar every
    funnel/conversion dashboard should draw instead of the Wald
    interval.

    Scale shape: one user-key window pass for (entry channel,
    converted), one keyed aggregate, scalar algebra."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        wilson_intervals,
    )

    events = load_table(spark, sf_dir, "events")
    return wilson_intervals(events)


def _ols_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.stats_tests import (
        ols_oracle_sql,
    )

    return ols_oracle_sql()


@_register("za06_ols_trend", _ols_oracle_sql())
def za06_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of value on time
    (operators/stats_tests.ols_by_key): closed-form slope/intercept/R²
    from population moments — the classical estimator beside the
    robust Theil-Sen (z91) and the rank Spearman (z72); slope per
    hour for comparability.

    Scale shape: one keyed moments aggregate; everything else is
    scalar algebra in codegen."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        ols_by_key,
    )

    events = load_table(spark, sf_dir, "events")
    return ols_by_key(events)


def _ks_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.stats_tests import (
        ks_oracle_sql,
    )

    return ks_oracle_sql("events", "value", "event_type", "click", "error")


@_register("za07_ks_two_sample", _ks_oracle_sql())
def za07_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    error value distributions (operators/stats_tests.ks_two_sample) —
    the distribution-free drift test behind data-quality monitors:
    max pooled-ECDF gap, ties collapsed per distinct value.

    Scale shape: the two-column stream shuffles once into per-value
    counts; two same-ordered cumulative windows over the distinct
    values; one max aggregate."""
    from computer_vision_foundations_spark.operators.stats_tests import (
        ks_two_sample,
    )

    events = load_table(spark, sf_dir, "events")
    return ks_two_sample(events, "value", "event_type", "click", "error")


_BFS_SEEDS = [1, 2, 3]
_BFS_HOPS = 4


def _bfs_oracle() -> str:
    from computer_vision_foundations_spark.operators.bfs import (
        bfs_oracle_sql,
    )

    return bfs_oracle_sql(_PR_EDGES_SQL, _BFS_SEEDS, _BFS_HOPS)


@_register("za33_bfs_distances", _bfs_oracle())
def za33_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source 4-hop BFS distances (operators/bfs.bfs_distances)
    over the q07 supplier↔customer trade graph from literal seed
    suppliers {1,2,3} — the TrustRank-style "hops from a trusted
    seed" quality prior. Level-synchronous frontier expansion with a
    visited-set anti-join so no node re-expands; the oracle replays
    the equivalent min-over-unrolled-levels formulation, so a hash
    match proves the pruning drops nothing.

    Scale shape: per level one (node)-keyed equi-join shuffle + one
    distinct + one anti-join; frontiers are localCheckpoint'd, never
    collected."""
    from computer_vision_foundations_spark.operators.bfs import (
        bfs_distances,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
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
    return bfs_distances(
        fwd.unionByName(back), _BFS_SEEDS, n_hops=_BFS_HOPS
    )


def _textrank_oracle() -> str:
    from computer_vision_foundations_spark.operators.textrank import (
        textrank_oracle_sql,
    )

    return textrank_oracle_sql()


@_register("za09_textrank_keywords", _textrank_oracle())
def za09_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (operators/textrank.py): weighted
    PageRank over the word-adjacency graph (Mihalcea & Tarau 2004) —
    the unsupervised topical-keyword signal for corpus curation.
    Top-20 words, rank rounded 6, word-ascending tiebreak; the oracle
    unrolls the identical recurrence as r0..r5 CTEs.

    Scale shape: one zip_with adjacency explode + one hash aggregate
    builds the graph (checkpointed once); each round is one
    (word)-keyed equi-join + hash aggregate carrying (word, double)
    only."""
    from computer_vision_foundations_spark.operators.textrank import (
        textrank_keywords,
    )

    docs = load_table(spark, sf_dir, "documents")
    return textrank_keywords(docs)


def _ppjoin_oracle() -> str:
    from computer_vision_foundations_spark.operators.ppjoin import (
        prefix_jaccard_oracle_sql,
    )

    return prefix_jaccard_oracle_sql(_SHINGLES_SQL, threshold=0.5)


@_register("za32_prefix_jaccard_pairs", _ppjoin_oracle())
def za32_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard≥0.5 near-dup pairs via PPJoin prefix filtering
    (operators/ppjoin.py): rarest-first prefixes + length filter prune
    candidates WITHOUT the q90 frequency-cap approximation — hot
    stop-shingles leave every prefix by construction. The oracle runs
    the reference QUADRATIC all-shingle join (no cap, no prefix), so
    a hash match proves the pruning lossless.

    Scale shape: one freq aggregate + one shingle-keyed annotate join
    + per-DOC window (never global) + prefix self-equi-join; exact
    verify joins carry only candidate ids + shingle arrays."""
    from computer_vision_foundations_spark.operators.ppjoin import (
        prefix_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(
        docs, "text", "doc_id", k=3, threshold=0.5,
        repartition_to=spark.sparkContext.defaultParallelism,
    )


@_register(
    "za36_salted_skew_join",
    """
    WITH dim AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS type_n,
             CAST(avg(value) AS DOUBLE) AS type_avg
      FROM events GROUP BY event_type)
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value / d.type_n), 6) AS ipw_activity,
           round(sum(e.value - d.type_avg), 4) AS excess_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.user_id
    """,
)
def za36_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inverse-propensity activity via a SALTED shuffle join
    (operators/skewjoin.salted_join): events join their event-type
    stats dim on (event_type, salt) with the dim replicated 8×, so a
    hot event type spreads over 8 reducers instead of stalling one.
    The oracle is the PLAIN join — a hash match certifies salting
    changes nothing but the shuffle layout.

    Scale shape: fact shuffle keys are (type, salt); dim replication
    is explode(sequence) — 8 rows per dim row, no driver loop; final
    user aggregate is an independent shuffle."""
    from computer_vision_foundations_spark.operators.skewjoin import (
        salted_join,
    )

    events = load_table(spark, sf_dir, "events")
    dim = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_n"),
        F.avg("value").alias("type_avg"),
    )
    joined = salted_join(
        events, dim, "event_type", salt_from="event_id", n_salts=8
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value") / F.col("type_n")), 6
        ).alias("ipw_activity"),
        F.round(
            F.sum(F.col("value") - F.col("type_avg")), 4
        ).alias("excess_value"),
    )


def _maxsim_oracle() -> str:
    from computer_vision_foundations_spark.operators.late_interaction import (
        maxsim_oracle_sql,
    )

    return maxsim_oracle_sql()


@_register("za34_maxsim_topk", _maxsim_oracle())
def za34_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval
    (operators/late_interaction.maxsim_topk): each 64-float embedding
    is read as 8 pseudo-token vectors × 8 dims (flat array + shape,
    SURVEY §1.2) and scored MaxSim = Σ_i max_j cos(q_i, d_j) against
    3 probe docs; top-10 per probe. The 8×8 cosine grid is a static
    JVM expression over array slices — no explode, no Python.

    Scale shape: map-side corpus scan ⋈ broadcast probes; the only
    shuffle is the per-probe top-k window."""
    from computer_vision_foundations_spark.operators.late_interaction import (
        maxsim_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 3)
    return maxsim_topk(emb, probes, n_tokens=8, dim=8, k=10)


def _seqmine_oracle() -> str:
    from computer_vision_foundations_spark.operators.seqmine import (
        consecutive_patterns_oracle_sql,
    )

    return consecutive_patterns_oracle_sql()


@_register("za13_sequential_patterns", _seqmine_oracle())
def za13_sequential_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive event-type 2- and 3-gram patterns per user timeline
    (operators/seqmine.consecutive_patterns) with occurrence counts
    and distinct-user support — the ORDERED counterpart of the z86
    basket rules (PrefixSpan level-1/2 shapes).

    Scale shape: one per-user lead window + one pattern aggregate —
    two shuffles regardless of pattern length; no time self-joins,
    no explode."""
    from computer_vision_foundations_spark.operators.seqmine import (
        consecutive_patterns,
    )

    events = load_table(spark, sf_dir, "events")
    return consecutive_patterns(events)


def _coverage_oracle() -> str:
    from computer_vision_foundations_spark.operators.intervals import (
        interval_coverage_oracle_sql,
    )

    return interval_coverage_oracle_sql(
        "SELECT user_id AS k, epoch_us(ts) AS st,"
        " epoch_us(ts) + 300 * 1000000 AS en, event_id AS tb FROM events"
    )


@_register("za14_active_coverage", _coverage_oracle())
def za14_active_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user active wall-clock via interval merge
    (operators/intervals.interval_coverage): each event opens a 5-min
    activity interval; overlaps are merged into islands (running-max
    gaps-and-islands) so coverage never double-counts. Exact BIGINT
    microsecond arithmetic — no float drift.

    Scale shape: one per-user sort shared by both window passes, one
    island aggregate, one key aggregate; no time-range self-join."""
    from computer_vision_foundations_spark.operators.intervals import (
        interval_coverage,
    )

    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("st"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + F.lit(300 * 1_000_000)
        ).alias("en"),
        "event_id",
    )
    return interval_coverage(iv, "user_id", "st", "en", "event_id")


def _rfm_oracle() -> str:
    from computer_vision_foundations_spark.operators.rfm import (
        rfm_oracle_sql,
    )

    return rfm_oracle_sql()


@_register("za15_rfm_segments", _rfm_oracle())
def za15_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/rfm.rfm_segments):
    quintile scores for recency/frequency/monetary via the scale-safe
    global row numbering of qnorm (range partition + broadcast
    offsets — never a single-task global window), exact integer
    quintile formula, segment rollup.

    Scale shape: one orders→customer aggregate; three range
    partitionings of the small customer table; one (r,f,m) hash
    aggregate."""
    from computer_vision_foundations_spark.operators.rfm import (
        rfm_segments,
    )

    orders = load_table(spark, sf_dir, "orders")
    return rfm_segments(orders)


_LOGREG_SRC_SQL = """
    SELECT l_quantity / 50.0 AS qty_s,
           l_discount * 10.0 AS disc_s,
           l_extendedprice / 100000.0 AS price_s,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
    FROM lineitem
"""


def _logreg_oracle() -> str:
    from computer_vision_foundations_spark.operators.logreg import (
        logistic_gd_oracle_sql,
    )

    return logistic_gd_oracle_sql(
        _LOGREG_SRC_SQL,
        ["qty_s", "disc_s", "price_s"],
        "y",
        lr=0.5,
        n_iter=5,
        feature_names=["qty_s", "disc_s", "price_s"],
    )


@_register("za74_logistic_gd", _logreg_oracle())
def za74_logistic_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic regression (operators/logreg.logistic_gd):
    5 exact full-batch GD steps predicting l_returnflag='R' from
    scaled quantity/discount/price. Per step, executors compute the
    batch gradient as one map-side-combined aggregate; only the 4
    weights visit the driver (the allreduce shape of
    ml/distributed.py). The oracle replays the ENTIRE training run as
    unrolled w0..w5 SQL CTEs — gradient, fold, and log-loss certified
    cross-engine.

    Scale shape: n_iter scans with partial aggregation; no shuffle of
    data rows at all (aggregate-only); model state is 4 doubles."""
    from computer_vision_foundations_spark.operators.logreg import (
        logistic_gd,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / 50.0).alias("qty_s"),
        (F.col("l_discount") * 10.0).alias("disc_s"),
        (F.col("l_extendedprice") / 100000.0).alias("price_s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    return logistic_gd(
        li, ["qty_s", "disc_s", "price_s"], "y", lr=0.5, n_iter=5
    )


def _holt_oracle() -> str:
    from computer_vision_foundations_spark.operators.holt import (
        holt_oracle_sql,
    )

    return holt_oracle_sql(
        "SELECT event_type AS key, date_trunc('hour', ts) AS ord,"
        " avg(value) AS y FROM events GROUP BY 1, 2"
    )


@_register("za17_holt_trend", _holt_oracle())
def za17_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend smoothing (operators/holt.holt_linear) over
    each event type's hourly mean-value series — level + slope + one-
    step forecast. The coupled recurrence is genuinely sequential
    (no finite windowable closed form), so this is the documented
    Arrow case: applyInPandas per key over pre-aggregated buckets;
    the oracle walks the identical recurrence with a RECURSIVE CTE.

    Scale shape: one (key, hour) pre-aggregate shrinks events to one
    row per bucket BEFORE the Python stage; keys distribute across
    executors; per-key state is two doubles."""
    from computer_vision_foundations_spark.operators.holt import (
        holt_linear,
    )

    events = load_table(spark, sf_dir, "events")
    series = events.groupBy(
        F.col("event_type").alias("key"),
        F.date_trunc("hour", "ts").alias("ord"),
    ).agg(F.avg("value").alias("y"))
    out = holt_linear(series, "key", "ord", "y")
    return out.select(
        "key",
        "n_points",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("forecast", 6).alias("forecast"),
    )


_SKYLINE_SRC_SQL = """
    SELECT o_custkey AS key,
           datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
             AS ord,
           o_totalprice AS val,
           o_orderkey AS order_key
    FROM orders
"""


def _skyline_oracle() -> str:
    from computer_vision_foundations_spark.operators.skyline import (
        skyline_oracle_sql,
    )

    return skyline_oracle_sql(
        _SKYLINE_SRC_SQL,
        "key, ord, round(val, 2) AS val, order_key",
    )


@_register("za43_skyline", _skyline_oracle())
def za43_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer 2-D skyline (operators/skyline.skyline_2d): the
    orders on each customer's Pareto frontier of (earliest date,
    highest price) — no other order of the same customer is both
    at-least-as-early and at-least-as-expensive with one strict. The
    window rewrite (RANGE frame to 1 PRECEDING + same-ord MAX) is
    hash-verified against the oracle's quadratic NOT-EXISTS truth.

    Scale shape: one (key)-partitioned sort feeds both window passes
    (Catalyst collapses them into one shuffle); no self-join — the
    naive formulation is O(k²) per key and exists only oracle-side."""
    from computer_vision_foundations_spark.operators.skyline import (
        skyline_2d,
    )

    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        F.col("o_custkey").alias("key"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1992-01-01").cast("date"),
        ).alias("ord"),
        F.col("o_totalprice").alias("val"),
        F.col("o_orderkey").alias("order_key"),
    )
    out = skyline_2d(src, "key", "ord", "val")
    return out.select(
        "key", "ord", F.round("val", 2).alias("val"), "order_key"
    )


def _expectations_oracle() -> str:
    from computer_vision_foundations_spark.operators.expectations import (
        expectations_oracle_sql,
    )

    blocks = expectations_oracle_sql("lineitem", _LINEITEM_EXPECTATIONS_SQL)
    # referential-integrity block appended with the same output shape
    return f"""
    {blocks}
    UNION ALL
    SELECT 'orders_customer_fk' AS constraint,
           (SELECT count(*) FROM orders) AS n_rows,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS violations,
           round(CASE WHEN (SELECT count(*) FROM orders) > 0
                      THEN 1.0 - (SELECT count(*) FROM orders o
                                  WHERE NOT EXISTS (SELECT 1 FROM customer c
                                                    WHERE c.c_custkey = o.o_custkey))
                           / CAST((SELECT count(*) FROM orders) AS DOUBLE)
                      ELSE 1.0 END, 6) AS pass_rate
    """


_LINEITEM_EXPECTATIONS_SQL = {
    "qty_range": "l_quantity BETWEEN 1 AND 50",
    "price_positive": "l_extendedprice > 0",
    "discount_range": "l_discount BETWEEN 0 AND 0.1",
    "tax_range": "l_tax BETWEEN 0 AND 0.08",
    "returnflag_domain": "l_returnflag IN ('A', 'N', 'R')",
    "linestatus_domain": "l_linestatus IN ('O', 'F')",
    "shipdate_present": "l_shipdate IS NOT NULL",
}


@_register("za44_expectations", _expectations_oracle())
def za44_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations
    (operators/expectations.py) — the systematic form of the
    reference's manual load validation (`02_Data Ingest.py` display /
    count checks; the platform's Delta-Live-Tables "expectations"
    shape): seven row-local constraints over lineitem evaluated in ONE
    aggregate pass (map-side counting, a single scan), plus an
    orders→customer referential-integrity expectation as a keys-only
    anti-join — per constraint: row count, violations, pass rate.
    NULL constraint values count as violations on both engines."""
    from computer_vision_foundations_spark.operators.expectations import (
        check_expectations,
        referential_integrity,
    )

    li = load_table(spark, sf_dir, "lineitem")
    constraints = {
        "qty_range": F.col("l_quantity").between(1, 50),
        "price_positive": F.col("l_extendedprice") > 0,
        "discount_range": F.col("l_discount").between(0, 0.1),
        "tax_range": F.col("l_tax").between(0, 0.08),
        "returnflag_domain": F.col("l_returnflag").isin("A", "N", "R"),
        "linestatus_domain": F.col("l_linestatus").isin("O", "F"),
        "shipdate_present": F.col("l_shipdate").isNotNull(),
    }
    rows = check_expectations(li, constraints)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    fk = referential_integrity(
        orders, customer, "o_custkey", "c_custkey", "orders_customer_fk"
    )
    return rows.unionByName(fk)


_XG_OUT_DIM, _XG_SEED = 16, 99


def _cross_gramian_oracle() -> str:
    from computer_vision_foundations_spark.operators.projection import (
        jl_sign_matrix,
    )

    rows = jl_sign_matrix(64, _XG_OUT_DIM, _XG_SEED)
    y_list = ", ".join(
        f"round(list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"[{', '.join(repr(x) for x in row)}]), 6)"
        for row in rows
    )
    return f"""
    WITH proj AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x,
               [{y_list}] AS y
        FROM embeddings
    ), n AS (
        SELECT count(*) AS n FROM proj
    ), xs AS (
        SELECT vec_id, CAST(u.i AS INTEGER) AS i,
               CAST(floor(x[CAST(u.i AS INTEGER) + 1] * 1000000.0 + 0.5)
                    AS BIGINT) AS qx,
               y
        FROM proj, unnest(range(len(x))) u(i)
    ), cells AS (
        SELECT i, CAST(v.j AS INTEGER) AS j,
               qx * CAST(floor(y[CAST(v.j AS INTEGER) + 1] * 1000000.0 + 0.5)
                         AS BIGINT) AS t
        FROM xs, unnest(range(len(y))) v(j)
    )
    SELECT cells.i, cells.j,
           round(CAST(sum(t) AS DOUBLE) / CAST(n.n AS DOUBLE) / 1e12, 6) AS m
    FROM cells CROSS JOIN n
    GROUP BY cells.i, cells.j, n.n
    """


@_register("za45_procrustes_gramian", _cross_gramian_oracle())
def za45_procrustes_gramian(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed stage of orthogonal Procrustes embedding-space
    alignment (operators/projection.cross_gramian): the 64×16 moment
    matrix M = (1/n)·Σ x·yᵀ between the embedding corpus and its
    seeded JL projection — the input to the model-sized driver SVD
    that aligns a re-trained embedding space to the old index
    (procrustes_fit, pytest-verified for orthogonality + alignment
    error). Same exact fixed-point reduction as za50 (1e-6 grid, int64
    partials, DECIMAL(38,0) sums): partition-order invariant by
    construction, ONE corpus pass, only 1024 cells shuffle."""
    from computer_vision_foundations_spark.operators.projection import (
        cross_gramian,
        random_projection,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(
        emb, "embedding", out_dim=_XG_OUT_DIM, seed=_XG_SEED
    )
    return cross_gramian(proj, "embedding", "projected")


def _conformal_oracle() -> str:
    from computer_vision_foundations_spark.operators.conformal import (
        conformal_oracle_sql,
    )

    return conformal_oracle_sql(
        "events", "value", "event_type", "event_id",
        alpha=0.1, cal_frac=0.5, seed=7,
    )


@_register("za39_conformal_band", _conformal_oracle())
def za39_conformal_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction band (operators/conformal.py):
    conformalize a per-event-type mean baseline on a seeded
    hash-deterministic calibration split of the events stream, report
    the band half-width q̂ (the exact ⌈(n+1)(1−α)⌉-th smallest
    calibration residual — scale-safe two-phase global rank, no
    single-task sort) and the achieved coverage on the held-out half.
    Every aggregate on the exact 1e-6 grid: nothing in the pipeline
    depends on float reduction order."""
    from computer_vision_foundations_spark.operators.conformal import (
        conformal_band,
    )

    ev = load_table(spark, sf_dir, "events")
    return conformal_band(
        ev, "value", "event_type", "event_id",
        alpha=0.1, cal_frac=0.5, seed=7,
    )


# ---------------------------------------------------------------------------
# za89 — quotient-graph LPA (round-11 verdict ask #7)
# ---------------------------------------------------------------------------

def _lpa_quotient_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.lpa import (
        lpa_oracle_sql,
    )

    mem = _ORACLES["q92_simhash"]
    pairs = _ORACLES["za63_simhash_near_dup_pairs"]
    qpairs = f"""
    WITH m AS MATERIALIZED (SELECT doc_id, simhash FROM ({mem})),
    r AS (SELECT simhash, min(doc_id) AS rep FROM m GROUP BY simhash),
    mr AS (SELECT m.doc_id, r.rep FROM m JOIN r ON m.simhash = r.simhash)
    SELECT DISTINCT a.rep AS id_a, b.rep AS id_b
    FROM ({pairs}) p
    JOIN mr a ON p.id_a = a.doc_id
    JOIN mr b ON p.id_b = b.doc_id
    WHERE a.rep <> b.rep
    """
    lpa = lpa_oracle_sql(qpairs, n_rounds=3)
    return f"""
    WITH mem AS MATERIALIZED (SELECT doc_id, simhash FROM ({mem})),
    reps AS (SELECT simhash, min(doc_id) AS rep FROM mem GROUP BY simhash),
    lab AS MATERIALIZED ({lpa})
    SELECT m.doc_id AS node, l.community
    FROM mem m
    JOIN reps r ON m.simhash = r.simhash
    JOIN lab l ON r.rep = l.node
    """


@_register("za89_lpa_quotient", _lpa_quotient_oracle_sql())
def za89_lpa_quotient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label propagation over the structural-equivalence QUOTIENT of
    the SimHash near-duplicate graph (`operators/lpa.py:
    label_propagation_quotient`; round-11 verdict ask #7): each
    same-fingerprint class collapses to its min-id representative,
    synchronous LPA runs on the distinct representative edges, and
    every member inherits its family's community. This is the
    dedup-then-propagate operator SCALE.md's round-9 graph sweep
    prescribes for 100 TB (raw LPA pays |sym| = 1.69 B rows per round
    at 25×; the quotient stays at the distinct-fingerprint count) —
    q41 deliberately keeps the RAW per-node recurrence, whose
    id-initialized labels are NOT quotient-invariant (same-class
    members start label-distinct), so both semantics stay oracled.

    Scale shape: two class-map joins + a distinct on class pairs to
    build the quotient, LPA rounds on quotient-sized tables only, one
    member fan-back join at the end."""
    from computer_vision_foundations_spark.operators.dedup import (
        simhash_pairs,
    )
    from computer_vision_foundations_spark.operators.lpa import (
        label_propagation_quotient,
    )

    fingerprints = q92_simhash(spark, sf_dir).localCheckpoint()
    pairs = simhash_pairs(
        fingerprints, "simhash", "doc_id", bits=32, bands=4, max_hamming=3
    )
    return label_propagation_quotient(
        pairs,
        fingerprints,
        node_col="doc_id",
        cls_col="simhash",
        src="id_a",
        dst="id_b",
        n_rounds=3,
    )
