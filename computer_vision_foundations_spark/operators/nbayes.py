"""Multinomial Naive Bayes text classification, trained in one pass.

The workhorse cheap quality/domain classifier of corpus curation:
fastText-style supervised filters (CCNet, GPT-3's WebText-vs-Common-
Crawl classifier) fill exactly this role — score every document
against per-class token statistics and keep / route by the argmax.
Multinomial NB with Laplace smoothing is the fully-closed-form member
of that family, so both training and inference are plain relational
algebra — no gradient loop, no driver state beyond nothing at all.

Training (one corpus pass, all hash aggregates):
    c(k, w)   token counts per class      — groupBy(class, token)
    N(k)      tokens per class            — groupBy(class)
    V         vocabulary size             — 1-row aggregate
    prior(k)  ln(docs_k / docs)           — groupBy(class) on doc ids
    log P(w|k) = ln( (c(k,w) + α) / (N(k) + α·V) )

Inference: score(d, k) = prior(k) + Σ_w n(d, w) · log P(w|k); predict
the argmax with a deterministic (score DESC, class ASC) tie-break.

Spark-first shape:
- the model is |V|·|classes| rows — model-sized, broadcast to the
  scoring join; the corpus never joins against anything big;
- the token stream shuffles ONCE into per-document bags (doc, token,
  n); scoring fans each bag by |classes| (a broadcast of the class
  list), joins the broadcast model, and hash-aggregates back to
  (doc, class) — one keyed shuffle each side of the join;
- the argmax is a per-doc window over |classes| rows.

The oracle twin replays identical arithmetic; per-(doc, class) sums
are rounded to 6 digits by the registry query (cross-engine summation
order convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["nb_train_score", "nb_fit_score", "nb_oracle_sql", "nb_cv_oracle_sql"]


def nb_train_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    class_col: str = "lang",
    alpha: float = 1.0,
) -> DataFrame:
    """Train on the full corpus, score every document (resubstitution
    — deliberate: no OOV path, so train and oracle stay closed-form).
    Returns ``(doc_id, <class_col>, predicted, log_score)`` with the
    winning class's joint log-likelihood rounded to 6 digits."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(class_col).alias("cls"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")

    class_tok = toks.groupBy("cls", "tok").agg(
        F.count("*").alias("c_kw")
    )
    class_tot = toks.groupBy("cls").agg(F.count("*").alias("n_k"))
    vocab_n = toks.agg(
        F.countDistinct("tok").alias("v")
    )
    priors = (
        docs.groupBy(F.col(class_col).alias("cls"))
        .agg(F.count("*").alias("n_docs_k"))
        .crossJoin(
            F.broadcast(docs.agg(F.count("*").alias("n_docs")))
        )
        .select(
            "cls",
            F.log(F.col("n_docs_k") / F.col("n_docs")).alias("prior"),
        )
    )
    # log P(w | k) for every (class, vocab word): smoothing gives
    # unseen pairs mass too, so build the full grid from the vocab ×
    # class cross (model-sized) and left-join observed counts.
    vocab = toks.select("tok").distinct()
    classes = class_tot.join(F.broadcast(vocab_n), how="cross")
    model = (
        vocab.crossJoin(F.broadcast(classes))
        .join(class_tok, ["cls", "tok"], "left")
        .select(
            "cls",
            "tok",
            F.log(
                (F.coalesce(F.col("c_kw"), F.lit(0)) + F.lit(alpha))
                / (F.col("n_k") + F.lit(alpha) * F.col("v"))
            ).alias("logp"),
        )
    )

    bags = toks.groupBy("doc_id", "tok").agg(
        F.count("*").alias("n_dw")
    )
    scores = (
        bags.join(F.broadcast(model), "tok")
        .groupBy("doc_id", "cls")
        .agg(F.sum(F.col("n_dw") * F.col("logp")).alias("ll"))
        .join(F.broadcast(priors), "cls")
        .select(
            "doc_id",
            "cls",
            (F.col("ll") + F.col("prior")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("cls").alias("predicted"),
            F.round("score", 6).alias("log_score"),
        )
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(class_col)
        )
        .join(best, "doc_id")
        .orderBy("doc_id")
    )


def nb_fit_score(
    train: DataFrame,
    score: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    class_col: str = "lang",
    alpha: float = 1.0,
) -> DataFrame:
    """Generalized train/score split (the cross-validation form of
    :func:`nb_train_score`): fit the model on ``train``, score
    ``score``. Out-of-vocabulary tokens — impossible under
    resubstitution, routine under CV — get the smoothing floor
    ``ln(α / (N_k + α·V))`` (a zero-count cell of the training
    grid), so scores stay finite and OOV-heavy documents rank low in
    every class. Same returns and scale shape as the resubstitution
    form: the model is broadcast, score-side bags shuffle once."""
    toks_tr = train.select(
        F.col(class_col).alias("cls"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    class_tok = toks_tr.groupBy("cls", "tok").agg(
        F.count(F.lit(1)).alias("c_kw")
    )
    class_tot = toks_tr.groupBy("cls").agg(F.count(F.lit(1)).alias("n_k"))
    vocab = toks_tr.select("tok").distinct()
    vocab_n = vocab.agg(F.countDistinct("tok").alias("v"))
    priors = (
        train.groupBy(F.col(class_col).alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_docs_k"))
        .crossJoin(F.broadcast(train.agg(F.count(F.lit(1)).alias("n_docs"))))
        .select(
            "cls",
            F.log(F.col("n_docs_k") / F.col("n_docs")).alias("prior"),
        )
    )
    classes = class_tot.join(F.broadcast(vocab_n), how="cross")
    model = (
        vocab.crossJoin(F.broadcast(classes))
        .join(class_tok, ["cls", "tok"], "left")
        .select(
            "cls",
            "tok",
            F.log(
                (F.coalesce(F.col("c_kw"), F.lit(0)) + F.lit(alpha))
                / (F.col("n_k") + F.lit(alpha) * F.col("v"))
            ).alias("logp"),
        )
    )
    bags = (
        score.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n_dw"))
    )
    oov_floor = F.log(
        F.lit(alpha) / (F.col("n_k") + F.lit(alpha) * F.col("v"))
    )
    scores = (
        bags.crossJoin(F.broadcast(classes))
        .join(F.broadcast(model), ["cls", "tok"], "left")
        .groupBy("doc_id", "cls")
        .agg(
            F.sum(
                F.col("n_dw") * F.coalesce(F.col("logp"), oov_floor)
            ).alias("ll")
        )
        .join(F.broadcast(priors), "cls")
        .select(
            "doc_id",
            "cls",
            (F.col("ll") + F.col("prior")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("cls").alias("predicted"),
            F.round("score", 6).alias("log_score"),
        )
    )
    return (
        score.select(F.col(id_col).alias("doc_id"), F.col(class_col))
        .join(best, "doc_id")
        .orderBy("doc_id")
    )


def nb_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    class_col: str = "lang",
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of :func:`nb_train_score` — identical counts,
    smoothing, scoring and (score DESC, class ASC) tie-break."""
    return f"""
    WITH toks AS (
        SELECT {id_col} AS doc_id, {class_col} AS cls,
               unnest(string_split({text_col}, ' ')) AS tok
        FROM {table}
    ), t AS (
        SELECT * FROM toks WHERE tok <> ''
    ), class_tok AS (
        SELECT cls, tok, count(*) AS c_kw FROM t GROUP BY cls, tok
    ), class_tot AS (
        SELECT cls, count(*) AS n_k FROM t GROUP BY cls
    ), vocab AS (
        SELECT DISTINCT tok FROM t
    ), vn AS (
        SELECT count(*) AS v FROM vocab
    ), priors AS (
        SELECT {class_col} AS cls,
               ln(count(*) * 1.0 / (SELECT count(*) FROM {table}))
                   AS prior
        FROM {table} GROUP BY {class_col}
    ), model AS (
        SELECT ct.cls, vocab.tok,
               ln((COALESCE(k.c_kw, 0) + {alpha})
                  / (ct.n_k + {alpha} * vn.v)) AS logp
        FROM vocab
        CROSS JOIN class_tot ct
        CROSS JOIN vn
        LEFT JOIN class_tok k
               ON k.cls = ct.cls AND k.tok = vocab.tok
    ), bags AS (
        SELECT doc_id, tok, count(*) AS n_dw
        FROM t GROUP BY doc_id, tok
    ), scores AS (
        SELECT b.doc_id, m.cls,
               sum(b.n_dw * m.logp) + any_value(p.prior) AS score
        FROM bags b
        JOIN model m ON m.tok = b.tok
        JOIN priors p ON p.cls = m.cls
        GROUP BY b.doc_id, m.cls
    ), best AS (
        SELECT doc_id, cls AS predicted, round(score, 6) AS log_score,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY score DESC, cls ASC
               ) AS rn
        FROM scores
    )
    SELECT d.{id_col} AS doc_id, d.{class_col}, b.predicted,
           b.log_score
    FROM {table} d
    JOIN best b ON b.doc_id = d.{id_col} AND b.rn = 1
    ORDER BY d.{id_col}
    """


def nb_cv_oracle_sql(
    k: int = 3,
    seed: int = 7,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    class_col: str = "lang",
    alpha: float = 1.0,
) -> str:
    """DuckDB twin of k-fold cross-validated :func:`nb_fit_score`
    accuracy: one MATERIALIZED pipeline block per fold (train on the
    other k−1 folds, score the held-out fold, OOV floor included),
    then per-fold accuracy. The fold expression is
    ``operators/split.kfold_assignment``'s portable md5 slice."""
    fold = (
        f"CAST(CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR) "
        f"|| ':{seed}'), 1, 7)) AS BIGINT) % {k} AS INT)"
    )
    blocks = [
        f"""folded AS MATERIALIZED (
        SELECT {id_col} AS doc_id, {text_col} AS text,
               {class_col} AS cls, {fold} AS fold
        FROM {table}
    )"""
    ]
    fold_results = []
    for i in range(k):
        blocks.append(
            f"""toks_tr{i} AS MATERIALIZED (
        SELECT cls, tok FROM (
            SELECT cls, unnest(string_split(text, ' ')) AS tok
            FROM folded WHERE fold <> {i}
        ) WHERE tok <> ''
    ),
    ct{i} AS (SELECT cls, tok, count(*) AS c_kw FROM toks_tr{i} GROUP BY 1, 2),
    tot{i} AS (SELECT cls, count(*) AS n_k FROM toks_tr{i} GROUP BY 1),
    voc{i} AS (SELECT DISTINCT tok FROM toks_tr{i}),
    vn{i} AS (SELECT count(*) AS v FROM voc{i}),
    pri{i} AS (
        SELECT cls, ln(count(*) * 1.0 /
                   (SELECT count(*) FROM folded WHERE fold <> {i})) AS prior
        FROM folded WHERE fold <> {i} GROUP BY cls
    ),
    model{i} AS MATERIALIZED (
        SELECT t.cls, voc{i}.tok,
               ln((COALESCE(c.c_kw, 0) + {alpha})
                  / (t.n_k + {alpha} * vn{i}.v)) AS logp
        FROM voc{i} CROSS JOIN tot{i} t CROSS JOIN vn{i}
        LEFT JOIN ct{i} c ON c.cls = t.cls AND c.tok = voc{i}.tok
    ),
    bags{i} AS MATERIALIZED (
        SELECT doc_id, tok, count(*) AS n_dw FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM folded WHERE fold = {i}
        ) WHERE tok <> '' GROUP BY 1, 2
    ),
    sc{i} AS (
        SELECT b.doc_id, t.cls,
               sum(b.n_dw * COALESCE(m.logp,
                   ln({alpha} / (t.n_k + {alpha} * vn{i}.v)))) AS ll
        FROM bags{i} b
        CROSS JOIN tot{i} t
        CROSS JOIN vn{i}
        LEFT JOIN model{i} m ON m.cls = t.cls AND m.tok = b.tok
        GROUP BY 1, 2, t.n_k, vn{i}.v
    ),
    best{i} AS (
        SELECT doc_id, cls AS predicted FROM (
            SELECT s.doc_id, s.cls,
                   row_number() OVER (
                       PARTITION BY s.doc_id
                       ORDER BY (s.ll + p.prior) DESC, s.cls ASC
                   ) AS rn
            FROM sc{i} s JOIN pri{i} p ON p.cls = s.cls
        ) WHERE rn = 1
    ),
    res{i} AS (
        SELECT {i} AS fold, count(*) AS n,
               CAST(sum(CASE WHEN b.predicted = f.cls
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        FROM best{i} b JOIN folded f ON f.doc_id = b.doc_id
    )"""
        )
        fold_results.append(f"SELECT * FROM res{i}")
    union = "\n    UNION ALL\n    ".join(fold_results)
    return f"""
    WITH {", ".join(blocks)},
    r AS ({union})
    SELECT fold, n, n_correct,
           round(n_correct / CAST(n AS DOUBLE), 6) AS accuracy
    FROM r ORDER BY fold
    """
