"""Registry slice — see computer_vision_foundations_spark/queries/__init__.py."""
from __future__ import annotations

from computer_vision_foundations_spark.queries.common import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    _ORACLES,
    _register,
    load_table,
    widen_if_under_parallel,
)
from computer_vision_foundations_spark.queries.part_a import (  # noqa: F401
    _IVF_CELLS,
    _IVF_DIM,
    _IVF_PROBE_CELLS,
    _IVF_SEED,
    q92_simhash,
)
from computer_vision_foundations_spark.queries.part_b import (  # noqa: F401
    _BM25_QUERIES,
    _PQ_CENTROIDS,
    _PQ_DIM,
    _PQ_SEED,
    _PQ_SUBS,
    _bm25_oracle_sql,
    _ivf_pq_oracle_sql,
    _pq_codes_cte,
    za63_simhash_near_dup_pairs,
)



@_register(
    "za26_corpus_diff",
    """
    WITH old AS (
        SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 11 <> 3
    ), new AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                        ELSE text END) AS fp
        FROM documents WHERE doc_id % 17 <> 5
    )
    SELECT CASE WHEN o.fp IS NULL THEN 'added'
                WHEN n.fp IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'modified'
                ELSE 'unchanged' END AS status,
           count(*) AS n
    FROM old o FULL OUTER JOIN new n USING (doc_id)
    GROUP BY 1
    """,
)
def za26_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (operators/diff.py): the added / removed /
    modified / unchanged audit between two dataset versions — here the
    old version drops every doc_id ≡ 3 (mod 11) and the new version
    rewrites every doc_id ≡ 0 (mod 13). Bodies hash map-side; the
    full-outer join shuffles (id, fingerprint) pairs only."""
    from computer_vision_foundations_spark.operators.diff import (
        snapshot_diff_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 3)
    new = docs.filter(F.col("doc_id") % 17 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return snapshot_diff_counts(old, new)


@_register(
    "za28_temporal_split",
    """
    SELECT CASE WHEN ts <= TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
                WHEN ts >= TIMESTAMP '2024-01-22 00:00:00' THEN 'test'
                ELSE 'purged' END AS split,
           count(*) AS n,
           CAST(min(event_id) AS BIGINT) AS min_event,
           CAST(max(event_id) AS BIGINT) AS max_event
    FROM events
    GROUP BY 1
    """,
)
def za28_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged temporal split (operators/split.temporal_split): train ≤
    2024-01-20, test ≥ 2024-01-22, the 2-day embargo gap 'purged' so
    boundary leakage cannot contaminate evaluation — the leakage-free
    eval split a time-series pipeline needs. Pure projection, no
    shuffle before the audit aggregate."""
    from computer_vision_foundations_spark.operators.split import (
        temporal_split,
    )

    events = load_table(spark, sf_dir, "events")
    out = temporal_split(
        events, "ts", "2024-01-20 00:00:00", "2024-01-22 00:00:00"
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").cast("long").alias("min_event"),
        F.max("event_id").cast("long").alias("max_event"),
    )


@_register(
    "za29_event_transitions",
    """
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ), counts AS (
        SELECT from_type, to_type, count(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6)
               AS p_transition
    FROM counts
    """,
)
def za29_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions between consecutive events per
    user (operators/funnel.event_transition_matrix): counts +
    per-from_type probabilities — the behavioral twin of the text
    bigram LM (z05). One lead window on the per-user timeline
    (deterministic ts, event_id ordering) + one hash aggregate."""
    from computer_vision_foundations_spark.operators.funnel import (
        event_transition_matrix,
    )

    events = load_table(spark, sf_dir, "events")
    return event_transition_matrix(events)


@_register(
    "za62_image_metadata",
    """
    SELECT doc_id,
           24 AS height, 24 AS width, 1 AS layers,
           'L' AS mode, 'JPEG' AS format,
           source AS exif_make, lang AS exif_model
    FROM documents
    WHERE length(text) >= 9
    """,
)
def za62_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-metadata pandas UDF (reference U1 schema,
    `02_Data Ingest.py:191-199`) over REAL JPEG bytes with REAL EXIF:
    each document becomes a 24×24 JPEG whose APP1/TIFF segment carries
    Make=source, Model=lang (`functions/png.build_exif_app1` writes
    genuine TIFF IFD layout; `parse_jpeg_exif` reads it back inside
    `get_image_metadata`). The oracle states what the round trip must
    recover — upgrading U1 from schema-verified to a full value-hash
    differential check of the encode→EXIF-write→SOF/TIFF-parse chain.
    Narrow Arrow projections only; no shuffle."""
    from computer_vision_foundations_spark.functions.image import (
        encode_doc_jpeg_with_exif,
        get_image_metadata,
    )

    # pure-Python codec per row: widen a single-split scan first
    # (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents")).filter(F.length("text") >= 9)
    out = docs.withColumn(
        "metadata",
        get_image_metadata(
            encode_doc_jpeg_with_exif(
                F.col("text"), F.col("source"), F.col("lang")
            )
        ),
    )
    return out.select(
        "doc_id",
        F.col("metadata.height").alias("height"),
        F.col("metadata.width").alias("width"),
        F.col("metadata.layers").alias("layers"),
        F.col("metadata.mode").alias("mode"),
        F.col("metadata.format").alias("format"),
        F.col("metadata.exif.Make").alias("exif_make"),
        F.col("metadata.exif.Model").alias("exif_model"),
    )


def _mmr_oracle() -> str:
    from computer_vision_foundations_spark.operators.mmr import mmr_oracle_sql

    src = (
        "SELECT vec_id, list_cosine_similarity(CAST(embedding AS DOUBLE[]), "
        "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
        ") AS relevance, embedding FROM embeddings "
        "WHERE vec_id > 0 AND vec_id <= 200"
    )
    return mmr_oracle_sql(
        src, k=10, lam=0.7, id_expr="vec_id", out_id="vec_id"
    )


@_register("za22_mmr_diverse_topk", _mmr_oracle())
def za22_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diverse top-k (`operators/mmr.py` — Carbonell & Goldstein
    1998): greedy λ·relevance − (1−λ)·max-sim selection, k=10 λ=0.7,
    relevance = cosine to probe vec_id=0 over candidates 1..200.
    One-scan execution (round 4): a single TakeOrderedAndProject pulls
    the top-M candidates by relevance, the greedy recurrence runs
    driver-side over the model-sized M×dim slice, and a per-round
    score bound PROVES equivalence to full greedy (growing M and
    rescanning when it can't — never silent approximation); the oracle
    unrolls all 10 rounds as MATERIALIZED CTEs with the identical
    rounded-score tie-break, so the greedy SEQUENCE replays exactly."""
    from computer_vision_foundations_spark.functions.vectors import (
        cosine_similarity,
    )
    from computer_vision_foundations_spark.operators.mmr import mmr_select

    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    probe_lit = F.array(*[F.lit(float(x)) for x in probe])
    cand = emb.filter((F.col("vec_id") > 0) & (F.col("vec_id") <= 200)).select(
        "vec_id",
        "embedding",
        cosine_similarity(F.col("embedding"), probe_lit).alias("relevance"),
    )
    return mmr_select(
        cand, k=10, lam=0.7, relevance_col="relevance",
        vec_col="embedding", id_col="vec_id",
    )


@_register("za88_persisted_ivf_pq", _ivf_pq_oracle_sql())
def za88_persisted_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index lifecycle (`operators/ann_index.py`): build
    the IVF-PQ index to disk (codes parquet PARTITIONED BY cell +
    model-sized META.json), then answer q50's exact query by reading
    the STORED codes — the cell equi-join plans a dynamic
    partition-pruning subquery, so unprobed cells' files are never
    read. Same parameters as q50, so its oracle verifies the entire
    build→persist→load→query round trip hash-for-hash."""
    import tempfile

    from computer_vision_foundations_spark.operators.ann_index import (
        build_ivf_pq_index,
        query_ivf_pq_index,
    )
    from computer_vision_foundations_spark.operators.quantization import (
        pq_codebooks,
    )
    from computer_vision_foundations_spark.operators.similarity import (
        random_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    cents = random_centroids(_IVF_DIM, _IVF_CELLS, _IVF_SEED)
    path = build_ivf_pq_index(
        emb, tempfile.mkdtemp(prefix="ivfpq_idx_"), cbs, cents
    )
    return query_ivf_pq_index(
        spark, path, probes, k=10, n_probe_cells=_IVF_PROBE_CELLS
    )


@_register(
    "za75_time_travel",
    """
    SELECT o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders WHERE o_orderkey % 4 IN (0, 1)
    GROUP BY o_orderstatus
    """,
)
def za75_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional-table time travel (`sources/acid.py` — the
    Delta-shaped log-structured format over plain parquet): create a
    table from orders with o_orderkey%4==0 (v1), ACID-append the
    %4==1 slice (v2), then DELETE half of it (v3) — and read AS OF
    version 2, which must bypass the later delete and resolve to
    exactly v1+v2's immutable files. The oracle aggregates the same
    two slices straight from the source table, so a time-travel read
    that leaked v3's delete (or missed v2's append) hash-fails."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        delete_where,
        read_table,
        write_append,
    )

    orders = load_table(spark, sf_dir, "orders")
    root = tempfile.mkdtemp(prefix="acid_tt_")
    create_table(spark, root, orders.filter(F.col("o_orderkey") % 4 == 0))
    write_append(spark, root, orders.filter(F.col("o_orderkey") % 4 == 1))
    delete_where(spark, root, F.col("o_orderkey") % 8 == 1)
    snap = read_table(spark, root, version=2)
    return snap.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@_register(
    "za76_acid_upsert",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN 'PLATINUM'
                ELSE c_mktsegment END AS c_mktsegment,
           round(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000.0
                 ELSE c_acctbal END, 2) AS c_acctbal
    FROM customer
    UNION ALL
    SELECT -1 AS c_custkey, 'PLATINUM' AS c_mktsegment, 0.0 AS c_acctbal
    """,
)
def za76_acid_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write MERGE on the REAL Delta log format
    (`sources/delta_writer.delta_upsert` — the batch twin of the
    streaming foreachBatch upsert): customers land as a
    `_delta_log`-format table, an update batch promotes every 10th
    customer (same key -> replace) and inserts one new key (-1); only
    files containing a matched key are rewritten (found by ONE
    broadcast semi-join over input_file_name, no table shuffle), and
    the read-back goes through the protocol reader
    (`sources/delta_reader`, routed by acid.read_table). The oracle
    replays the merge as a CASE projection + the inserted row."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import read_table
    from computer_vision_foundations_spark.sources.delta_writer import (
        delta_create,
        delta_upsert as upsert,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    root = tempfile.mkdtemp(prefix="acid_up_")
    delta_create(spark, root, cust)
    updates = (
        cust.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            F.lit("PLATINUM").alias("c_mktsegment"),
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        )
        .unionByName(
            spark.createDataFrame(
                [(-1, "PLATINUM", 0.0)],
                "c_custkey long, c_mktsegment string, c_acctbal double",
            )
        )
    )
    upsert(spark, root, updates, ["c_custkey"])
    out = read_table(spark, root)
    return out.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )


@_register(
    "za69_wav_audio_stats",
    """
    WITH samples AS (
        SELECT doc_id, length(text) AS n, u.i AS i,
               (ord(substr(text, CAST(u.i + 1 AS INTEGER), 1)) - 128) * 256 AS s
        FROM documents, unnest(range(length(text))) u(i)
        WHERE length(text) >= 32
    ), seq AS (
        SELECT doc_id, n, i, s, i // 32 AS widx,
               lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM samples
    ), wstats AS (
        SELECT doc_id, n, widx,
               sum(s * s) AS energy,
               sum(CASE WHEN i % 32 <> 0
                         AND ((s >= 0) <> (prev >= 0))
                   THEN 1 ELSE 0 END) AS zcr,
               max(abs(s)) AS peak
        FROM seq
        WHERE widx < n // 32
        GROUP BY doc_id, n, widx
    )
    SELECT doc_id,
           CAST(8000 AS BIGINT)            AS sample_rate,
           CAST(n AS BIGINT)               AS n_samples,
           round(n / 8000.0, 6)            AS duration_sec,
           CAST(count(*) AS BIGINT)        AS n_windows,
           CAST(sum(energy) AS BIGINT)     AS total_energy,
           CAST(sum(zcr) AS BIGINT)        AS total_zcr,
           CAST(max(peak) AS BIGINT)       AS max_peak,
           round(sqrt(sum(energy) * 1.0 / (count(*) * 32)), 6) AS rms
    FROM wstats
    GROUP BY doc_id, n
    """,
)
def za69_wav_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality with a REAL codec end-to-end: each document's
    text becomes 16-bit PCM (sample = (byte−128)·256), is serialized
    as a canonical RIFF/WAVE file (``functions/wav.py`` — from-scratch
    struct packing, the audio twin of the PNG/JPEG codecs), then
    DECODED back: ``with_audio_metadata`` does a real header-only
    fmt/data-chunk parse and ``wav_window_stats`` computes per-window
    energy / zero-crossing / peak over the decoded samples. All
    integer-exact, so the DuckDB oracle replays the whole
    encode→decode→stats chain straight from characters — a WAV writer
    or parser bug (header sizes, alignment pad, sample width,
    channel interleave) hash-fails. Reference parity: the typed-
    metadata-over-binary model of `02_Data Ingest.py:191-199`,
    extended to audio.

    Scale shape: THREE narrow Arrow projections + per-row HOF
    aggregation — no explode, no groupBy, zero shuffle; the WAV bytes
    never leave the executor that made them."""
    from computer_vision_foundations_spark.functions.media import (
        encode_text_wav,
        wav_window_stats,
        with_audio_metadata,
    )

    # pure-Python codec per row: widen a single-split scan first
    # (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 32
    )
    wav = docs.select(
        "doc_id", encode_text_wav(F.col("text")).alias("content")
    )
    md = with_audio_metadata(wav)
    ws = md.withColumn("ws", wav_window_stats(32)(F.col("content")))
    zero = F.lit(0).cast("long")
    return ws.select(
        "doc_id",
        F.col("audio_meta.sample_rate").cast("long").alias("sample_rate"),
        F.col("audio_meta.n_samples").alias("n_samples"),
        F.round("audio_meta.duration_sec", 6).alias("duration_sec"),
        F.size("ws").cast("long").alias("n_windows"),
        F.aggregate("ws", zero, lambda a, s: a + s["energy"]).alias(
            "total_energy"
        ),
        F.aggregate("ws", zero, lambda a, s: a + s["zcr"]).alias(
            "total_zcr"
        ),
        F.array_max(F.transform("ws", lambda s: s["peak"]))
        .cast("long")
        .alias("max_peak"),
        F.round(
            F.sqrt(
                F.aggregate("ws", zero, lambda a, s: a + s["energy"])
                / (F.size("ws") * F.lit(32))
            ),
            6,
        ).alias("rms"),
    )


@_register(
    "za70_gif_frame_sample",
    """
    WITH v AS (
        SELECT doc_id, text, length(text) // 16 AS nf
        FROM documents WHERE length(text) >= 16
    ), fr AS (
        SELECT doc_id, text, CAST(u.i AS INTEGER) AS i
        FROM v, unnest(range(nf)) u(i)
        WHERE u.i % 2 = 0
    ), px AS (
        SELECT doc_id, i,
               ord(substr(text, CAST(i * 16 + j.j + 1 AS INTEGER), 1)) AS val
        FROM fr, unnest(range(16)) j(j)
    )
    SELECT doc_id,
           i                               AS frame_idx,
           CAST(i * 5 AS DOUBLE) / 100.0   AS ts_sec,
           CAST(sum(val) AS INTEGER)       AS frame_key
    FROM px GROUP BY doc_id, i
    """,
)
def za70_gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video modality with a REAL codec end-to-end: each document's
    text becomes an animated GIF89a (``functions/gif.py`` — the
    from-scratch LZW codec; one 4×4 grayscale frame per 16 bytes,
    5 cs delay), then ``sample_video_frames`` DECODES it (variable-
    width LZW, sub-block walk, palette, compositing) and keeps every
    2nd frame, emitting ``(doc_id, frame_idx, ts_sec, frame_key)``
    with frame_key = the channel-0 pixel sum. The grayscale identity
    palette makes decoded pixels equal text bytes, so the DuckDB
    oracle replays the whole chain as character arithmetic — any LZW
    bit-packing, code-width, palette or frame-layout bug hash-fails.
    Reference parity: the frame-extraction shape of the reference's
    media model (`02_Data Ingest.py:191-199`), video flavor.

    Scale shape: one narrow Arrow projection (encode) + one narrow
    ``mapInPandas`` fan-out (decode + sample) — no shuffle; GIF bytes
    never leave the executor that built them."""
    from computer_vision_foundations_spark.functions.media import (
        encode_text_gif,
        sample_video_frames,
    )

    # pure-Python codec per row: widen a single-split scan first
    # (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 16
    )
    gif = docs.select(
        "doc_id", encode_text_gif(F.col("text")).alias("content")
    )
    return sample_video_frames(gif, "content", "doc_id", every_n=2)


@_register(
    "z23_audio_spectrum",
    """
    WITH samples AS (
        SELECT doc_id, length(text) AS n, u.i AS i,
               CAST(ord(substr(text, CAST(u.i + 1 AS INTEGER), 1)) - 128
                    AS DOUBLE) AS s
        FROM documents, unnest(range(length(text))) u(i)
        WHERE length(text) >= 8
    ), framed AS (
        SELECT doc_id, n, i // 8 AS fidx, i % 8 AS k, s
        FROM samples WHERE i // 8 < n // 8
    ), quad AS (
        SELECT doc_id, fidx, fr.f AS f,
               sum(s * cos(2 * pi() * k * fr.f / 8)) AS re,
               sum(s * sin(2 * pi() * k * fr.f / 8)) AS im
        FROM framed, (SELECT unnest(range(5)) AS f) fr
        GROUP BY doc_id, fidx, fr.f
    ), p AS (
        SELECT doc_id, f, re * re + im * im AS pw FROM quad
    )
    SELECT doc_id,
           CAST(count(*) / 5 AS BIGINT)                    AS n_frames,
           round(sum(f * pw) / sum(pw), 6)                 AS centroid,
           round(sum(CASE WHEN f <= 1 THEN pw ELSE 0 END)
                 / sum(pw), 6)                             AS low_ratio
    FROM p GROUP BY doc_id
    """,
)
def z23_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real spectral feature extraction (``functions/dsp.py``): text →
    small-amplitude PCM (byte−128) → REAL WAV encode→decode
    (``functions/wav.py``) → rectangular-window rfft power spectra on
    8-sample frames → per-doc spectral centroid and low-band ratio.
    The UDF returns raw power SUMS and the centroid/ratio derive
    relationally (one division each, O(1) magnitudes), so the DuckDB
    oracle can replay the DFT as explicit cos/sin quadrature sums —
    numpy's FFT and the naive trig DFT agree to ~1e-14 relative,
    far inside the round-6 comparison. Ratios (not raw powers) are
    compared precisely because raw power totals grow with corpus text
    length and would eat the rounding margin.

    Scale shape: two narrow Arrow projections (encode, spectra) —
    no shuffle; fixed-width feature rows are all that leaves the
    UDF."""
    from computer_vision_foundations_spark.functions.dsp import (
        audio_spectral_features,
    )
    from computer_vision_foundations_spark.functions.media import (
        encode_text_wav,
    )

    # pure-Python codec per row: widen a single-split scan first
    # (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 8
    )
    wav = docs.select(
        "doc_id",
        encode_text_wav(F.col("text"), scale=1).alias("content"),
    )
    feats = wav.withColumn(
        "sp", audio_spectral_features(8)(F.col("content"))
    )
    return feats.select(
        "doc_id",
        F.col("sp.n_frames").alias("n_frames"),
        F.round(F.col("sp.weighted_power") / F.col("sp.total_power"), 6)
        .alias("centroid"),
        F.round(F.col("sp.low_power") / F.col("sp.total_power"), 6)
        .alias("low_ratio"),
    )


@_register(
    "z24_bucketed_join",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT)        AS n_orders,
           round(sum(o_totalprice), 2)     AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def z24_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed tables
    (``sources/bucketed.py``): orders and customer are written
    ``bucketBy(8, custkey)`` + ``sortBy`` into a scratch database,
    then sort-merge-joined on the bucket key — the join itself plans
    with NO Exchange on either side (pinned by
    ``tests/test_bucketed.py``); the only shuffle left is the final
    5-row segment aggregate. This is the pay-once-at-ingest answer
    for repeated 100 TB fact⋈dim joins on a stable key; the oracle is
    the plain relational join, so the bucketed layout must be
    result-invisible."""
    import os
    import tempfile

    from computer_vision_foundations_spark.sources.bucketed import (
        colocated_join,
        write_bucketed,
    )
    from computer_vision_foundations_spark.sources.tables import (
        create_database,
    )

    root = tempfile.mkdtemp(prefix="bkt_")
    db = "bkt_" + os.path.basename(root)[4:]
    create_database(spark, db, location=root)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    write_bucketed(
        orders, f"{db}.orders_b", 8, ["o_custkey"], ["o_custkey"]
    )
    write_bucketed(
        cust, f"{db}.customer_b", 8, ["o_custkey"], ["o_custkey"]
    )
    joined = colocated_join(
        spark, f"{db}.orders_b", f"{db}.customer_b", on="o_custkey"
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@_register(
    "z25_table_profile",
    """
    SELECT 'o_orderkey' AS column,
           CAST(count(*) AS BIGINT)                       AS n_rows,
           CAST(count(*) - count(o_orderkey) AS BIGINT)   AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT)     AS n_distinct,
           round(CAST(min(o_orderkey) AS DOUBLE), 6)      AS min_num,
           round(CAST(max(o_orderkey) AS DOUBLE), 6)      AS max_num,
           CAST(NULL AS VARCHAR)                          AS min_str,
           CAST(NULL AS VARCHAR)                          AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           round(CAST(min(o_custkey) AS DOUBLE), 6),
           round(CAST(max(o_custkey) AS DOUBLE), 6),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT o_totalprice) AS BIGINT),
           round(min(o_totalprice), 6), round(max(o_totalprice), 6),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
    FROM orders
    """,
)
def z25_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiling (``operators/profile.py``): per-column
    row/null/exact-distinct counts and extrema over orders in a SINGLE
    aggregation job (multi-DISTINCT via one Expand; the 1-row wide
    result reshapes to one-row-per-column with ``stack``). The oracle
    is the per-column UNION ALL of direct aggregates, so Expand
    semantics, null accounting and the numeric/string extrema split
    are all hash-checked. At 100 TB the ``exact_ndv=False`` switch
    swaps the Expand for HLL++ map-side sketches."""
    from computer_vision_foundations_spark.operators.profile import (
        profile_table,
    )

    orders = load_table(spark, sf_dir, "orders")
    return profile_table(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )


@_register(
    "za42_multimodal_manifest",
    """
    WITH base AS (
        SELECT doc_id, text, length(text) AS n_chars
        FROM documents WHERE length(text) >= 32
    ), chars AS (
        SELECT doc_id, ord(u.c) AS v
        FROM base, unnest(string_split(text, '')) u(c)
    ), hist AS (
        SELECT doc_id, v, count(*) AS c FROM chars GROUP BY doc_id, v
    ), tot AS (
        SELECT doc_id, sum(c) AS n FROM hist GROUP BY doc_id
    ), ent AS (
        SELECT h.doc_id,
               round(-sum((h.c * 1.0 / t.n) * log2(h.c * 1.0 / t.n)), 6)
                   AS png_entropy
        FROM hist h JOIN tot t ON t.doc_id = h.doc_id
        GROUP BY h.doc_id
    ), samples AS (
        SELECT doc_id, n_chars, u.i AS i,
               (ord(substr(text, CAST(u.i + 1 AS INTEGER), 1)) - 128) * 256
                   AS s
        FROM base, unnest(range(length(text))) u(i)
    ), seq AS (
        SELECT doc_id, n_chars, i, s, i // 32 AS widx,
               lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM samples
    ), zcr AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN i % 32 <> 0 AND widx < n_chars // 32
                              AND ((s >= 0) <> (prev >= 0))
                        THEN 1 ELSE 0 END) AS BIGINT) AS audio_zcr
        FROM seq GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_chars AS BIGINT)            AS n_chars,
           ent.png_entropy                      AS png_entropy,
           zcr.audio_zcr                        AS audio_zcr,
           CAST(b.n_chars // 16 AS INTEGER)     AS video_n_frames,
           (ent.png_entropy >= 3.0 AND b.n_chars >= 64) AS keep
    FROM base b
    JOIN ent ON ent.doc_id = b.doc_id
    JOIN zcr ON zcr.doc_id = b.doc_id
    """,
)
def za42_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal training-data manifest: ONE pass over documents
    exercises all three real from-scratch codecs side by side — text
    renders to a PNG whose decoded pixel entropy is the image-quality
    signal (``functions/png.py``), to a WAV whose decoded per-window
    zero-crossing total is the audio signal (``functions/wav.py``),
    and to an animated GIF whose REAL header walk yields the frame
    count (``functions/gif.py``) — then a composite keep/drop gate
    (entropy ≥ 3 on the ROUNDED value, per the cross-engine float
    filter rule; ≥ 64 chars) emits the curation manifest. Every
    signal is replayed by the DuckDB oracle from characters, so the
    full three-codec composition is hash-checked end to end.

    Scale shape: four narrow Arrow projections over one scan — zero
    shuffle, zero joins (all signals derive in-row); the Spark plan
    is a single codegen+Arrow pipeline per partition."""
    from computer_vision_foundations_spark.functions.image import (
        encode_text_png,
        get_image_statistics,
    )
    from computer_vision_foundations_spark.functions.media import (
        encode_text_gif,
        encode_text_wav,
        wav_window_stats,
        with_video_metadata,
    )

    # pure-Python codec per row: widen a single-split scan first
    # (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 32
    )
    df = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.round(
            get_image_statistics(encode_text_png(F.col("text")))["entropy"],
            6,
        ).alias("png_entropy"),
        wav_window_stats(32)(encode_text_wav(F.col("text"))).alias("ws"),
        encode_text_gif(F.col("text")).alias("gif"),
    )
    df = with_video_metadata(df, "gif", "vm")
    return df.select(
        "doc_id",
        "n_chars",
        "png_entropy",
        F.aggregate(
            "ws", F.lit(0).cast("long"), lambda a, s: a + s["zcr"]
        ).alias("audio_zcr"),
        F.col("vm.n_frames").alias("video_n_frames"),
        ((F.col("png_entropy") >= 3.0) & (F.col("n_chars") >= 64)).alias(
            "keep"
        ),
    )


def _pq_rerank_oracle_sql() -> str:
    score = " + ".join(
        f"p.d{s}[c.codes[{s + 1}] + 1]" for s in range(_PQ_SUBS)
    )
    return f"""
    {_pq_codes_cte()}
    , short AS (
      SELECT probe_id, neighbor_id FROM (
        SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY p.vec_id
                 ORDER BY round({score}, 6) ASC, c.vec_id ASC) AS rank
        FROM d p JOIN codes c ON p.vec_id < 5 AND c.vec_id <> p.vec_id) t
      WHERE rank <= 50
    )
    SELECT probe_id, neighbor_id, cos_sim, rank FROM (
      SELECT s.probe_id, s.neighbor_id,
             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(pe.embedding AS DOUBLE[])),
                   6) AS cos_sim,
             row_number() OVER (
               PARTITION BY s.probe_id
               ORDER BY round(list_cosine_similarity(
                            CAST(e.embedding AS DOUBLE[]),
                            CAST(pe.embedding AS DOUBLE[])), 6) DESC,
                        s.neighbor_id ASC) AS rank
      FROM short s
      JOIN embeddings e  ON e.vec_id  = s.neighbor_id
      JOIN embeddings pe ON pe.vec_id = s.probe_id) t
    WHERE rank <= 10
    """


@_register("z27_pq_rerank", _pq_rerank_oracle_sql())
def z27_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: PQ asymmetric-distance shortlist (top-50 per
    probe over compressed codes — vectors never read) followed by an
    exact-cosine re-rank of ONLY the shortlist rows
    (``operators/quantization.pq_rerank_topk``; the IVFADC+R pattern,
    Jégou et al. 2011). The oracle replays both stages — literal
    codebooks for the ADC stage, ``list_cosine_similarity`` for the
    re-rank — so shortlist membership AND final exact ranking are
    hash-checked. Schema matches ``brute_force_knn`` (q27), making
    two-stage recall directly measurable against the exact baseline."""
    from computer_vision_foundations_spark.operators.quantization import (
        pq_codebooks,
        pq_rerank_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    cbs = pq_codebooks(_PQ_DIM, _PQ_SUBS, _PQ_CENTROIDS, _PQ_SEED)
    return pq_rerank_topk(emb, probes, cbs, k=10, shortlist=50)


@_register(
    "za35_zorder_optimize",
    """
    SELECT o_orderkey % 64 AS zx, count(*) AS n,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderkey % 64 < 8 AND o_custkey % 64 < 8
    GROUP BY o_orderkey % 64
    """,
)
def za35_zorder_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`OPTIMIZE ... ZORDER BY` on the transactional table format
    (``sources/acid.py:optimize_zorder`` + ``operators/zorder.py``):
    orders land scattered across small files, then one remove+add
    commit rewrites the snapshot clustered by the Morton key of
    (orderkey, custkey) buckets; the query then filters a z-box and
    aggregates. The oracle replays the filter+aggregate straight from
    the source table, so the rewrite must be exactly data-invariant —
    a dropped/duplicated row or a bad interleave-driven partition
    boundary hash-fails. Multi-column min/max pruning on the
    clustered files is pinned by ``tests/test_acid.py``."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        optimize_zorder,
        read_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 64).alias("zx"),
        (F.col("o_custkey") % 64).alias("zy"),
        "o_totalprice",
    )
    root = tempfile.mkdtemp(prefix="acid_zo_")
    create_table(spark, root, orders.repartition(16))
    optimize_zorder(spark, root, ["zx", "zy"], bits=6,
                    target_file_bytes=64 * 1024)
    snap = read_table(spark, root)
    return (
        snap.filter((F.col("zx") < 8) & (F.col("zy") < 8))
        .groupBy("zx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@_register(
    "za31_data_skipping",
    """
    SELECT o_orderstatus,
           count(*)                    AS n,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 3000
    GROUP BY o_orderstatus
    """,
)
def za31_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-log data skipping (``sources/acid.py:prune_files``):
    orders land range-partitioned into many files, each commit records
    per-file min/max footer stats in the transaction log, and the read
    prunes non-intersecting files DRIVER-SIDE before Spark plans the
    scan — the Delta-shaped file-statistics ledger. The query filter
    re-applies the predicate, so pruning must be exactly conservative:
    a file wrongly skipped loses rows and hash-fails against the plain
    source-table oracle. Composes with ``optimize_zorder`` (z28),
    which makes multi-column ranges tight."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        read_table,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="acid_ds_")
    create_table(
        spark, root, orders.repartitionByRange(16, "o_orderkey")
    )
    snap = read_table(spark, root, prune={"o_orderkey": (1000, 3000)})
    return (
        snap.filter(F.col("o_orderkey").between(1000, 3000))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@_register(
    "z30_knn_join",
    """
    SELECT qid, nid, cos_sim, rank FROM (
      SELECT a.vec_id AS qid, b.vec_id AS nid,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])),
                   6) AS cos_sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                            CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])), 6) DESC,
                        b.vec_id ASC) AS rank
      FROM embeddings a JOIN embeddings b
        ON a.label = b.label AND a.vec_id <> b.vec_id) t
    WHERE rank <= 3
    """,
)
def z30_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked self kNN join (``operators/similarity.knn_join_blocked``):
    every vector gets its top-3 cosine neighbors WITHIN its label
    block — pairs never form across blocks, so cost is Σ|block|², not
    n² (swap in LSH buckets / IVF cells as the block when no natural
    key exists; identical join shape). The oracle replays the
    block-join + exact cosine + deterministic tie-break, so the window
    top-k over the blocked pair stream is hash-checked for every row
    of the corpus, not just a probe set."""
    from computer_vision_foundations_spark.operators.similarity import (
        knn_join_blocked,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return knn_join_blocked(emb, k=3, block_col="label")


@_register(
    "za81_change_data_feed",
    """
    SELECT o_orderkey, 'insert' AS _change_type
    FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 8 <> 1
    UNION ALL
    SELECT o_orderkey, 'update'
    FROM orders WHERE o_orderkey % 16 = 0
    UNION ALL
    SELECT o_orderkey, 'delete'
    FROM orders WHERE o_orderkey % 16 = 8
    """,
)
def za81_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed (``sources/acid.py:table_changes``) across a
    four-commit history: create (orderkey%4==0), append the %4==1
    slice, delete the %8==1 rows of it, upsert a status change onto
    %16==0 and delete %16==8. The feed between version 1 and the tip
    must classify exactly: inserts = surviving appended keys, updates
    = rewritten-status keys, deletes = removed create-time keys —
    with rows inserted-then-deleted WITHIN the window correctly
    absent. The oracle replays the set algebra straight from the
    source table, so snapshot resolution, fingerprint comparison and
    the insert/update/delete classification are all hash-checked."""
    import tempfile

    from computer_vision_foundations_spark.sources.acid import (
        create_table,
        delete_where,
        table_changes,
        upsert,
        write_append,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = tempfile.mkdtemp(prefix="acid_cdf_")
    create_table(spark, root, orders.filter(F.col("o_orderkey") % 4 == 0))
    write_append(
        spark, root, orders.filter(F.col("o_orderkey") % 4 == 1)
    )
    delete_where(spark, root, F.col("o_orderkey") % 8 == 1)
    upsert(
        spark,
        root,
        orders.filter(F.col("o_orderkey") % 16 == 0).select(
            "o_orderkey",
            F.lit("REVISED").alias("o_orderstatus"),
            "o_totalprice",
        ),
        ["o_orderkey"],
    )
    delete_where(spark, root, F.col("o_orderkey") % 16 == 8)
    return table_changes(
        spark, root, 1, 5, ["o_orderkey"], "o_orderstatus"
    )


def _image_near_dup_oracle_sql(max_hamming: int = 6) -> str:
    """Replay decode→dHash-rows→Hamming-band pairing. Bands are the 8
    per-row bytes of the 64-bit dHash (band equality ⇔ row-byte
    equality, same candidate set as the Spark fingerprint banding);
    hamming sums per-row xor popcounts."""
    row_exprs = []
    for r in range(8):
        terms = " + ".join(
            f"(CASE WHEN p[{r * 9 + c + 1}] < p[{r * 9 + c + 2}] "
            f"THEN {1 << c} ELSE 0 END)"
            for c in range(8)
        )
        row_exprs.append(f"({terms})")
    rows_arr = ", ".join(row_exprs)
    ham = " + ".join(f"bit_count(xor(ra[{j}], rb[{j}]))" for j in range(1, 9))
    return f"""
    WITH px AS (
      SELECT doc_id,
             list_transform(range(1, 74),
               i -> CASE WHEN i <= length(text)
                    THEN ascii(substr(text, i, 1)) ELSE 0 END) AS p
      FROM documents WHERE length(text) >= 72
    ),
    rws AS (
      SELECT doc_id, [{rows_arr}] AS rows FROM px
    ),
    banded AS (
      SELECT doc_id, rows, g.i AS band_idx,
             rows[CAST(g.i + 1 AS INTEGER)] AS band_val
      FROM rws CROSS JOIN generate_series(0, 7) AS g(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                      a.rows AS ra, b.rows AS rb
      FROM banded a JOIN banded b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST({ham} AS INT) AS hamming
    FROM cand WHERE {ham} <= {max_hamming}
    """


@_register("za71_image_near_dup", _image_near_dup_oracle_sql())
def za71_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE near-duplicate pairs — the CV-side dedup the
    reference's domain needs: real 8×9 PNG encode → real decode →
    64-bit dHash (q99's chain, full-grid docs only so no padding) →
    Hamming-LSH banding via the generic ``simhash_pairs`` machinery
    (8 byte-wide bands over the fingerprint; pigeonhole exact for
    hamming ≤ 7, reported threshold 6). ``max_band_freq=None``
    matches the oracle's uncapped pigeonhole (the cap stays ON by
    default for corpus-scale callers — the z07 lesson). The oracle
    replays decode, hash, banding and popcount from character codes,
    so codec, fingerprint packing and pairing are all hash-checked.

    Scale shape: identical to q49 — fingerprints collapse to DISTINCT
    before banding, candidates are a (band, value) equi-join, and only
    (id, 8-byte fp) rows shuffle."""
    from computer_vision_foundations_spark.functions.image import (
        encode_text_png_8x9,
        image_dhash,
    )
    from computer_vision_foundations_spark.operators.dedup import (
        simhash_pairs,
    )

    # pure-Python codec per row: widen a single-split scan first
    # (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 72
    )
    dh = docs.select(
        "doc_id",
        image_dhash(encode_text_png_8x9(F.col("text"))).alias("dhash"),
    )
    fp = dh.select(
        "doc_id",
        (
            F.shiftleft(
                F.conv(F.substring("dhash", 1, 8), 16, 10).cast("long"), 32
            ).bitwiseOR(
                F.conv(F.substring("dhash", 9, 8), 16, 10).cast("long")
            )
        ).alias("fp"),
    )
    return simhash_pairs(
        fp,
        "fp",
        "doc_id",
        bits=64,
        bands=8,
        max_hamming=6,
        max_band_freq=None,
    )


@_register(
    "z33_gopher_rules",
    r"""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ') AS toks,
               string_split(text, chr(10)) AS lines,
               len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\.\.\.')) AS n_sym
        FROM documents
    ), s AS (
        SELECT doc_id,
               len(toks) AS n_words,
               len(lines) AS n_lines,
               list_sum(list_transform(toks, x -> length(x))) * 1.0
                   / greatest(len(toks), 1) AS mean_wl,
               n_sym * 1.0 / greatest(len(toks), 1) AS symbol_ratio,
               len(list_filter(lines,
                   ln -> regexp_matches(ln, '^\s*[-*•]'))) * 1.0
                   / greatest(len(lines), 1) AS bullet_ratio,
               len(list_filter(lines,
                   ln -> regexp_matches(ln, '(\.\.\.|…)\s*$'))) * 1.0
                   / greatest(len(lines), 1) AS ellipsis_ratio,
               len(list_filter(toks,
                   w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
                   / greatest(len(toks), 1) AS alpha_ratio,
               len(list_filter(toks,
                   w -> list_contains(
                       ['the','be','to','of','and','that',
                        'have','with','a','in','is','it'],
                       lower(w)))) AS n_stop
        FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT)   AS n_words,
           round(mean_wl, 4)         AS mean_word_len,
           round(symbol_ratio, 6)    AS symbol_ratio,
           round(bullet_ratio, 6)    AS bullet_ratio,
           round(ellipsis_ratio, 6)  AS ellipsis_ratio,
           round(alpha_ratio, 6)     AS alpha_word_ratio,
           CAST(n_stop AS BIGINT)    AS n_stopwords,
           n_words >= 40 AND n_words <= 100000          AS rule_word_count,
           mean_wl >= 3.0 AND mean_wl <= 10.0           AS rule_mean_word_len,
           symbol_ratio < 0.1                           AS rule_symbol_ratio,
           bullet_ratio < 0.9                           AS rule_bullet_lines,
           ellipsis_ratio < 0.3                         AS rule_ellipsis_lines,
           alpha_ratio >= 0.8                           AS rule_alpha_words,
           n_stop >= 2                                  AS rule_stopwords,
           (n_words >= 40 AND n_words <= 100000
            AND mean_wl >= 3.0 AND mean_wl <= 10.0
            AND symbol_ratio < 0.1
            AND bullet_ratio < 0.9
            AND ellipsis_ratio < 0.3
            AND alpha_ratio >= 0.8
            AND n_stop >= 2)                            AS passes_gopher
    FROM s
    """,
)
def z33_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-based quality battery (Rae et al. 2021, appendix A)
    over the documents table: all seven published rules — word count,
    mean word length, symbol ratio, bullet/ellipsis line fractions,
    alphabetic-word fraction, stopword floor — as per-rule flags plus
    the conjunction, with every underlying statistic emitted for
    corpus-QA reporting (``operators/quality_rules.py``). The word
    floor is tuned to the fixture (40) so both outcomes appear; every
    other threshold is the published default. Reference parity: the
    metadata-predicate input gating of `03_Model Training.py`,
    generalized to the text-corpus rule battery.

    Scale shape: ZERO shuffles — the whole battery is higher-order
    Catalyst expressions over ``split()`` arrays in one narrow
    WholeStageCodegen projection; only flag rows leave the scan."""
    from computer_vision_foundations_spark.operators.quality_rules import (
        gopher_quality_flags,
    )

    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_flags(docs, min_words=40)


@_register(
    "z34_paragraph_dedup",
    """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), p AS (
        SELECT doc_id, CAST(u.i AS INTEGER) AS idx,
               array_to_string(tk[u.i*3+1 : u.i*3+3], ' ') AS para
        FROM toks, unnest(range((len(tk) + 2) // 3)) u(i)
    ), h AS (
        SELECT doc_id, idx, para, md5(para) AS ph FROM p
    ), f AS (
        SELECT doc_id, idx, para,
               row_number() OVER (
                   PARTITION BY ph ORDER BY doc_id, idx) = 1 AS kept
        FROM h
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                     AS n_paras,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END)
                AS BIGINT)                              AS n_kept,
           coalesce(string_agg(para, ' ' ORDER BY idx)
                    FILTER (WHERE kept), '')            AS cleaned_text,
           CAST(length(coalesce(string_agg(para, ' ' ORDER BY idx)
                    FILTER (WHERE kept), '')) AS BIGINT) AS cleaned_len
    FROM f GROUP BY doc_id
    """,
)
def z34_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with document reassembly (CCNet,
    Wenzek et al. 2020; RefinedWeb, Penedo et al. 2023): documents are
    segmented into fixed 3-token paragraphs, only the first occurrence
    of each paragraph corpus-wide (smallest doc_id, then position)
    survives — within-doc repeats cut too — and every document
    is rebuilt from its surviving paragraphs in original order
    (``operators/paragraphs.py``). The oracle replays segmentation,
    keeper vote and ordered reassembly relationally, so the HOF
    slicing, hash, join and array_sort reassembly are all value-checked
    including the rebuilt text itself. Reference parity: sub-document
    dedup is the text generalization of the reference's
    duplicate-image screening stage.

    Scale shape: keeper vote on a narrow (md5, id) projection — 16-byte
    keys shuffle, bodies don't; bodies cross exactly two keyed shuffles
    (hash equi-join + per-doc reassembly), the floor for reassembling
    sub-document dedup."""
    from computer_vision_foundations_spark.operators.paragraphs import (
        paragraph_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return paragraph_dedup(docs, para_words=3)


@_register(
    "z35_scene_cuts",
    """
    WITH v AS (
        SELECT doc_id, text, length(text) // 16 AS nf
        FROM documents WHERE length(text) >= 32
    ), fr AS (
        SELECT doc_id, text, CAST(u.i AS INTEGER) AS i
        FROM v, unnest(range(nf)) u(i)
    ), px AS (
        SELECT doc_id, i,
               ord(substr(text, CAST(i * 16 + j.j + 1 AS INTEGER), 1)) AS val
        FROM fr, unnest(range(16)) j(j)
    ), k AS (
        SELECT doc_id, i, CAST(sum(val) AS INTEGER) AS fk
        FROM px GROUP BY doc_id, i
    ), l AS (
        SELECT doc_id, i, fk,
               lag(fk) OVER (PARTITION BY doc_id ORDER BY i) AS pk
        FROM k
    )
    SELECT doc_id,
           i                                AS frame_idx,
           CAST(i * 5 AS DOUBLE) / 100.0    AS ts_sec,
           pk                               AS prev_key,
           fk                               AS frame_key,
           abs(fk - pk)                     AS delta
    FROM l
    WHERE pk IS NOT NULL AND abs(fk - pk) >= 150
    """,
)
def z35_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video shot-boundary detection over the REAL GIF decode chain:
    text → animated GIF89a (``functions/gif.py``) → full-frame decode
    (``sample_video_frames`` with ``every_n=1``) → cut rows where the
    channel-0 pixel-sum key jumps by ≥ 150 between consecutive frames
    (``operators/video.py`` — the intensity-statistic comparison of
    Boreczky & Rowe 1996). The identity grayscale palette makes decoded
    pixels equal text bytes, so the oracle replays decode, frame keys,
    lag and thresholding as character arithmetic — an LZW, palette,
    compositing or window-ordering bug hash-fails. Reference parity:
    the one-frame-per-shot reduction a video corpus needs before the
    reference's featurization stage.

    Scale shape: narrow encode + narrow decode fan-out, then ONE keyed
    shuffle (per-video lag window over (id, idx, key) rows); pixels
    never shuffle."""
    from computer_vision_foundations_spark.functions.media import (
        encode_text_gif,
        sample_video_frames,
    )
    from computer_vision_foundations_spark.operators.video import (
        detect_scene_cuts,
    )

    # pure-Python codec per row: widen a single-split scan first
    # (no-op at scale - operators/parallelism.py)
    docs = widen_if_under_parallel(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") >= 32
    )
    gif = docs.select(
        "doc_id", encode_text_gif(F.col("text")).alias("content")
    )
    frames = sample_video_frames(gif, "content", "doc_id", every_n=1)
    return detect_scene_cuts(frames, threshold=150)


@_register(
    "z36_audio_fingerprint_pairs",
    """
    WITH samples AS (
        SELECT doc_id, length(text) AS n, u.i AS i,
               (ord(substr(text, CAST(u.i + 1 AS INTEGER), 1)) - 128) AS s
        FROM documents, unnest(range(length(text))) u(i)
        WHERE length(text) >= 96
    ), wstats AS (
        SELECT doc_id, i // 32 AS widx, sum(s * s) AS e
        FROM samples WHERE i // 32 < n // 32
        GROUP BY doc_id, i // 32
    ), nb AS (
        SELECT doc_id, widx, e,
               lag(e) OVER w AS pe, lead(e) OVER w AS ne
        FROM wstats WINDOW w AS (PARTITION BY doc_id ORDER BY widx)
    ), pk AS (
        SELECT doc_id, widx, e FROM nb
        WHERE pe IS NOT NULL AND ne IS NOT NULL AND e > pe AND e >= ne
    ), tr AS (
        SELECT doc_id, widx, e,
               lead(widx, 1) OVER w AS w1, lead(widx, 2) OVER w AS w2,
               lead(e, 1) OVER w AS e1, lead(e, 2) OVER w AS e2
        FROM pk WINDOW w AS (PARTITION BY doc_id ORDER BY widx)
    ), fp AS (
        SELECT DISTINCT doc_id,
               md5(concat(CAST(w1 - widx AS VARCHAR), '_',
                          CAST(w2 - w1 AS VARCHAR), '_',
                          CAST(length(bin(e)) AS VARCHAR), '_',
                          CAST(length(bin(e1)) AS VARCHAR), '_',
                          CAST(length(bin(e2)) AS VARCHAR))) AS f
        FROM tr WHERE w2 IS NOT NULL
    ), cap AS (
        SELECT f FROM fp GROUP BY f HAVING count(*) <= 64
    ), j AS (
        SELECT a.doc_id AS da, b.doc_id AS db
        FROM fp a JOIN cap USING (f) JOIN fp b USING (f)
        WHERE a.doc_id < b.doc_id
    )
    SELECT da AS id_a, db AS id_b,
           CAST(count(*) AS BIGINT) AS n_matches
    FROM j GROUP BY da, db HAVING count(*) >= 2
    """,
)
def z36_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs by energy-landmark constellation
    hashing (Wang 2003's delta-time scheme over integer-exact
    features): text → REAL WAV encode→decode (``functions/wav.py``,
    scale=1) → per-window integer energies → local-max peaks →
    md5(dt1_dt2_m0_m1_m2) fingerprints over peak triples → capped
    fingerprint equi-join → pairs sharing ≥ 2 fingerprints
    (``operators/audio_fp.py``). Everything integer-exact, so the
    oracle replays decode, windowing, peak picking, gap/magnitude
    hashing, the ≤64 frequency cap and the match count — a codec,
    window or banding bug hash-fails. Reference parity: the audio twin
    of the duplicate-screening the reference does for images.

    Scale shape: same discipline as MinHash/SimHash pairing — narrow
    (id, md5) landmark rows, skew cap BEFORE the join, and only the
    two per-clip analytic windows (one partitioning) plus the capped
    equi-join shuffle; waveforms never leave the decode stage."""
    from computer_vision_foundations_spark.functions.media import (
        encode_text_wav,
        wav_window_stats,
    )
    from computer_vision_foundations_spark.operators.audio_fp import (
        audio_energy_landmarks,
        audio_fingerprint_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 96
    )
    wav = docs.select(
        "doc_id",
        encode_text_wav(F.col("text"), scale=1).alias("content"),
    )
    ws = wav.withColumn("ws", wav_window_stats(32)(F.col("content")))
    win = ws.select("doc_id", F.explode("ws").alias("s")).select(
        "doc_id",
        F.col("s.widx").alias("widx"),
        F.col("s.energy").alias("energy"),
    )
    lm = audio_energy_landmarks(win)
    return audio_fingerprint_pairs(lm, min_matches=2, max_fp_freq=64)


@_register(
    "z37_kmv_source_overlap",
    """
    WITH sh AS (
        SELECT source, array_to_string(tk[u.i : u.i+2], '|') AS v
        FROM (SELECT source, string_split(text, ' ') AS tk
              FROM documents) t,
             unnest(range(1, greatest(len(tk) - 2, 1) + 1)) u(i)
    ), hx AS (
        SELECT DISTINCT source, md5(v) AS h FROM sh
    ), regs AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS pos
        FROM hx QUALIFY pos <= 256
    ), stats AS (
        SELECT source, count(*) AS n,
               max(CASE WHEN pos = 256 THEN
                   ('0x' || substr(h, 1, 13))::BIGINT
                   / 4503599627370496.0 END) AS tk
        FROM regs GROUP BY source
    ), st AS (
        SELECT source, n,
               CASE WHEN n < 256 THEN 1.0 ELSE tk END AS theta,
               CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                    ELSE 255.0 / tk END AS est
        FROM stats
    ), sj AS (
        SELECT a.source AS ga, b.source AS gb,
               ('0x' || substr(a.h, 1, 13))::BIGINT
               / 4503599627370496.0 AS frac
        FROM regs a JOIN regs b ON a.h = b.h AND a.source < b.source
    ), w AS (
        SELECT sj.ga, sj.gb, sj.frac,
               sa.theta AS ta, sa.est AS ea,
               sb.theta AS tb, sb.est AS eb
        FROM sj JOIN st sa ON sj.ga = sa.source
                JOIN st sb ON sj.gb = sb.source
    ), g AS (
        SELECT ga, gb, count(*) AS c,
               any_value(ea) AS ea, any_value(eb) AS eb,
               any_value(least(ta, tb)) AS tmin
        FROM w WHERE frac < least(ta, tb) GROUP BY ga, gb
    )
    SELECT ga AS group_a, gb AS group_b,
           CAST(c AS BIGINT)                        AS n_shared,
           round(ea, 4)                             AS distinct_a,
           round(eb, 4)                             AS distinct_b,
           round(c / tmin, 4)                       AS intersect_est,
           round(ea + eb - c / tmin, 4)             AS union_est,
           round((c / tmin) / (ea + eb - c / tmin), 6) AS jaccard
    FROM g
    """,
)
def z37_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source corpus overlap from KMV/theta sketches: distinct
    word-3-gram estimates per source plus pairwise intersection /
    union / Jaccard estimates via the theta-sketch set algebra
    (Bar-Yossef et al. 2002; Dasgupta et al. 2016) —
    ``functions/sketches.kmv_registers`` + ``operators/overlap.py``.
    The sketch keeps the 256 smallest md5 hashes per source; hash hex
    ordering and the 52-bit hash fraction are bit-identical across
    engines, so the oracle replays sketch construction, per-group
    estimators, the shared-hash join below min-theta, and all three
    set estimates exactly. This is the scale answer to "how redundant
    are my crawl sources?" — no raw shingle set ever joins.

    Scale shape: raw shingles are seen once by a narrow distinct;
    everything downstream touches ≤ 256 rows per source (model-sized).
    The pairwise stage is a hash equi-join of register tables plus a
    broadcast of per-source scalars — never a group×group grid."""
    from computer_vision_foundations_spark.functions.text import (
        shingles_from_tokens,
    )
    from computer_vision_foundations_spark.operators.overlap import (
        kmv_pairwise_overlap,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.split(F.col("text"), " ").alias("tk"))
    items = toks.select(
        "source", F.explode(shingles_from_tokens(F.col("tk"), 3)).alias("v")
    )
    return kmv_pairwise_overlap(items, "v", "source", k=256)


@_register(
    "z38_token_budget_select",
    """
    WITH s AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks
        FROM documents
    ), q AS (
        SELECT doc_id, source,
               len(toks) AS n_tokens,
               round(len(list_filter(toks,
                   w -> list_contains(
                       ['the','be','to','of','and','that',
                        'have','with','a','in','is','it'],
                       lower(w)))) * 1.0
                   / greatest(len(toks), 1), 6) AS quality
        FROM s
    ), w AS (
        SELECT doc_id, source, quality, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM q
    )
    SELECT doc_id, source, quality,
           CAST(n_tokens AS BIGINT)  AS n_tokens,
           CAST(cum AS BIGINT)       AS cum_tokens,
           cum <= 600                AS selected
    FROM w
    """,
)
def z38_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain token-budget selection (the "best N tokens per
    source" specification every pretraining mix uses — FineWeb /
    DataComp-LM style): documents rank best-first inside their source
    by a stopword-density quality proxy (ties broken by id), and
    ``selected`` marks the maximal greedy prefix whose cumulative
    token count stays within the 600-token budget
    (``operators/selection.py``). The oracle replays scoring, ranking
    and the running-sum prefix rule exactly. Reference parity: the
    capped/ordered training-input sampling of `03_Model Training.py`,
    made distributed and deterministic.

    Scale shape: ONE keyed shuffle — a per-domain cumulative-sum
    window over narrow (id, domain, score, tokens) rows; bodies never
    move, no joins, no driver state."""
    from computer_vision_foundations_spark.operators.selection import (
        quality_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sw = F.array(
        *[
            F.lit(w)
            for w in [
                "the", "be", "to", "of", "and", "that",
                "have", "with", "a", "in", "is", "it",
            ]
        ]
    )
    scored = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.filter(toks, lambda w: F.array_contains(sw, F.lower(w))))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("quality"),
    )
    return quality_budget_select(
        scored,
        domain_col="source",
        quality_col="quality",
        tokens_col="n_tokens",
        token_budget=600,
    )


@_register(
    "z39_curriculum_order",
    """
    WITH b AS (
        SELECT doc_id, n_chars AS difficulty,
               1 + CAST(n_chars > 150 AS INTEGER)
                 + CAST(n_chars > 250 AS INTEGER)
                 + CAST(n_chars > 350 AS INTEGER) AS bucket
        FROM documents
    ), r AS (
        SELECT doc_id, difficulty, bucket,
               row_number() OVER (
                   PARTITION BY bucket
                   ORDER BY difficulty, doc_id) AS rnk
        FROM b
    )
    SELECT doc_id,
           CAST(difficulty AS BIGINT)      AS difficulty,
           CAST(bucket AS BIGINT)          AS bucket,
           CAST(rnk AS BIGINT)             AS rank_in_bucket,
           CAST(rnk * 4 + bucket AS BIGINT) AS curriculum_rank
    FROM r
    """,
)
def z39_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved curriculum ordering (easy→hard with bucket
    round-robin, the standard curriculum-learning data order): length
    is the difficulty proxy, buckets come from explicit boundary
    literals (150/250/350 chars) — NEVER a global ntile, which would
    be a single-partition window — and ``curriculum_rank`` cycles the
    four buckets once per round so any training prefix stays mixed
    while average difficulty rises (``operators/selection.py``). The
    oracle replays bucketing, per-bucket ranking and the interleave
    formula exactly.

    Scale shape: bucket assignment is a narrow codegen expression; the
    only shuffle is the B-way per-bucket rank window; compose with the
    deterministic shard assignment inside buckets at extreme scale."""
    from computer_vision_foundations_spark.operators.selection import (
        curriculum_order,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = curriculum_order(
        docs,
        [150, 250, 350],
        difficulty_col=F.col("n_chars"),
    )
    return out.select(
        "doc_id",
        F.col("difficulty").cast("long").alias("difficulty"),
        F.col("bucket").cast("long").alias("bucket"),
        F.col("rank_in_bucket").cast("long").alias("rank_in_bucket"),
        "curriculum_rank",
    )


@_register(
    "z40_curation_pipeline",
    """
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks,
               string_split(text, chr(10)) AS lines, text
        FROM documents
    ), g AS (
        SELECT doc_id, source, text FROM t
        WHERE len(toks) BETWEEN 40 AND 100000
          AND list_sum(list_transform(toks, x -> length(x))) * 1.0
              / greatest(len(toks), 1) BETWEEN 3.0 AND 10.0
          AND (len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\\.\\.\\.'))) * 1.0
              / greatest(len(toks), 1) < 0.1
          AND len(list_filter(lines,
                  ln -> regexp_matches(ln, '^\\s*[-*•]'))) * 1.0
              / greatest(len(lines), 1) < 0.9
          AND len(list_filter(lines,
                  ln -> regexp_matches(ln, '(\\.\\.\\.|…)\\s*$'))) * 1.0
              / greatest(len(lines), 1) < 0.3
          AND len(list_filter(toks,
                  w -> regexp_matches(w, '[A-Za-z]'))) * 1.0
              / greatest(len(toks), 1) >= 0.8
          AND len(list_filter(toks,
                  w -> list_contains(
                      ['the','be','to','of','and','that',
                       'have','with','a','in','is','it'],
                      lower(w)))) >= 2
    ), tk AS (
        SELECT doc_id, source, string_split(text, ' ') AS tks FROM g
    ), p AS (
        SELECT doc_id, source, CAST(u.i AS INTEGER) AS idx,
               array_to_string(tks[u.i*3+1 : u.i*3+3], ' ') AS para
        FROM tk, unnest(range((len(tks) + 2) // 3)) u(i)
    ), h AS (
        SELECT doc_id, source, idx, para, md5(para) AS ph FROM p
    ), f AS (
        SELECT doc_id, source, idx, para,
               row_number() OVER (
                   PARTITION BY ph ORDER BY doc_id, idx) = 1 AS kept
        FROM h
    ), d AS (
        SELECT doc_id, source,
               count(*) AS n_paras,
               sum(CASE WHEN kept THEN 1 ELSE 0 END) AS n_kept,
               coalesce(string_agg(para, ' ' ORDER BY idx)
                        FILTER (WHERE kept), '') AS cleaned
        FROM f GROUP BY doc_id, source
    ), s AS (
        SELECT doc_id, source, n_paras, n_kept,
               CASE WHEN length(cleaned) = 0 THEN 0
                    ELSE len(string_split(cleaned, ' ')) END AS n_tokens,
               round(n_kept * 1.0 / n_paras, 6) AS quality
        FROM d
    ), w AS (
        SELECT *, sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM s
    )
    SELECT doc_id, source,
           CAST(n_paras AS BIGINT)  AS n_paras,
           CAST(n_kept AS BIGINT)   AS n_kept,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           quality,
           CAST(cum AS BIGINT)      AS cum_tokens,
           cum <= 400               AS selected
    FROM w
    """,
)
def z40_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation pipeline with a COMPLETE end-to-end oracle
    (unlike q20's iterative composition, every stage here is closed-
    form SQL): Gopher rule gate (line rules vacuous on the fixture's
    single-line docs, so the battery reduces to its five active
    rules) → cross-document paragraph dedup with reassembly → per-
    source token-budget selection ranked by dedup-survival quality.
    Exercises three new operators (``quality_rules``, ``paragraphs``,
    ``selection``) composing through joins and windows exactly as a
    production curation DAG would. Reference parity: the multi-stage
    prepare-then-select flow of `02_Data Ingest.py` +
    `03_Model Training.py`, text-corpus flavor.

    Scale shape: the union of its stages' budgets — zero-shuffle rule
    gate, two body shuffles + narrow keeper vote for the dedup, one
    window for the budget; nothing new beyond the parts."""
    from computer_vision_foundations_spark.operators.paragraphs import (
        paragraph_dedup,
    )
    from computer_vision_foundations_spark.operators.quality_rules import (
        gopher_quality_flags,
    )
    from computer_vision_foundations_spark.operators.selection import (
        quality_budget_select,
    )

    docs = load_table(spark, sf_dir, "documents")
    flags = gopher_quality_flags(docs, min_words=40)
    kept = docs.join(
        flags.where("passes_gopher").select("doc_id"), "doc_id"
    )
    deduped = paragraph_dedup(kept, para_words=3)
    src = docs.select("doc_id", "source")
    scored = deduped.join(src, "doc_id").select(
        "doc_id",
        "source",
        "n_paras",
        "n_kept",
        F.when(F.col("cleaned_len") == 0, F.lit(0))
        .otherwise(F.size(F.split("cleaned_text", " ")))
        .cast("long")
        .alias("n_tokens"),
        F.round(F.col("n_kept") / F.col("n_paras"), 6).alias("quality"),
    )
    # quality_budget_select passes every input column through, so the
    # stage columns (n_paras, n_kept) survive without re-joining the
    # dedup lineage
    return quality_budget_select(
        scored,
        domain_col="source",
        quality_col="quality",
        tokens_col="n_tokens",
        token_budget=400,
    ).select(
        "doc_id",
        "source",
        "n_paras",
        "n_kept",
        "n_tokens",
        "quality",
        "cum_tokens",
        "selected",
    )


@_register(
    "z41_hard_negatives",
    """
    SELECT anchor_id, negative_id, cos_sim, rank FROM (
      SELECT a.vec_id AS anchor_id, b.vec_id AS negative_id,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])),
                   6) AS cos_sim,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY round(list_cosine_similarity(
                            CAST(a.embedding AS DOUBLE[]),
                            CAST(b.embedding AS DOUBLE[])), 6) DESC,
                        b.vec_id ASC) AS rank
      FROM embeddings a JOIN embeddings b ON a.label <> b.label
      WHERE a.vec_id < 20) t
    WHERE rank <= 10
    """,
)
def z41_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training (DPR/ANCE shape):
    for each anchor vector, the 10 most cosine-similar corpus vectors
    with a DIFFERENT label — the negatives that actually move a
    retriever (``operators/negatives.py``, reusing the broadcast
    brute-force join discipline of ``similarity.brute_force_knn``
    plus the label-inequality pair filter). Exact, total-order
    deterministic, fully oracled. Reference parity: the class-aware
    pair construction the reference's training stage implies for its
    labeled image corpus.

    Scale shape: anchors broadcast (model-sized probe set), one corpus
    scan, one per-anchor top-k window — the ANN-family contract; swap
    the exact scan for the IVF/PQ index at corpus scale."""
    from computer_vision_foundations_spark.operators.negatives import (
        hard_negative_mining,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 20)
    return hard_negative_mining(emb, anchors, k=10)


@_register(
    "z42_label_noise",
    """
    WITH nn AS (
      SELECT qid, cos_sim, rank FROM (
        SELECT a.vec_id AS qid,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])),
                     6) AS cos_sim,
               row_number() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY round(list_cosine_similarity(
                              CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])), 6) DESC,
                          b.vec_id ASC) AS rank
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id <> b.vec_id) t
      WHERE rank <= 3
    ), agg AS (
      SELECT qid, max(rank) AS n_neighbors, min(cos_sim) AS weakest
      FROM nn GROUP BY qid
    )
    SELECT e.vec_id                      AS vec_id,
           e.label                       AS label,
           weakest                       AS kth_sim,
           CAST(n_neighbors AS BIGINT)   AS n_neighbors,
           weakest < 0.2                 AS suspect
    FROM agg JOIN embeddings e ON agg.qid = e.vec_id
    """,
)
def z42_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space label-noise audit (deep k-NN auditing shape):
    each vector's similarity to its 3rd-nearest SAME-label neighbor;
    points weakly attached to their own class (``kth_sim < 0.2``, the
    fixture's median) are suspect mislabels
    (``operators/negatives.py`` over the blocked self-kNN join, so
    pairs form only within classes — Σ|class|², never n²). Exact and
    fully oracled end-to-end.

    Scale shape: the blocked self-join's budget plus one per-point
    aggregate; vectors shuffle only within their class block."""
    from computer_vision_foundations_spark.operators.negatives import (
        label_noise_scores,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return label_noise_scores(emb, k=3, threshold=0.2)


@_register(
    "z43_image_augment",
    """
    WITH px AS (
        SELECT doc_id,
               ord(substr(text,
                   CAST(2*(u.j // 4)*9 + 7 - 2*(u.j % 4) + 1 AS INTEGER),
                   1)) AS v
        FROM documents, unnest(range(16)) u(j)
        WHERE length(text) >= 72
    ), r AS (
        SELECT doc_id, v,
               row_number() OVER (PARTITION BY doc_id ORDER BY v) AS rn
        FROM px
    )
    SELECT doc_id,
           round(avg(v), 4)                           AS mean,
           CAST(max(CASE WHEN rn = 9 THEN v END)
                AS INTEGER)                           AS median,
           CAST(min(v) AS INTEGER)                    AS pmin,
           CAST(max(v) AS INTEGER)                    AS pmax
    FROM r GROUP BY doc_id
    """,
)
def z43_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic image augmentation with TWO full codec round
    trips: text → REAL 8×9 PNG → decode → center-crop 8×8 →
    horizontal flip → nearest-neighbor resize to 4×4 → RE-ENCODE as a
    real PNG → decode again → pixel statistics
    (``functions/augment.py`` — the data-side subset of the
    reference's resize-to-model-input step, `03_Model Training.py`).
    Every transform is integer index arithmetic, so the oracle replays
    the whole chain as character picks ``byte[2r·9 + (7−2c)]`` — a
    crop-offset, flip-direction, resize-index or re-encode bug
    hash-fails. Statistics follow ImageStat definitions (median = 9th
    smallest of the 16 pixels).

    Scale shape: two narrow Arrow projections (augment, stats) — no
    shuffle; augmented bytes are smaller than inputs and never leave
    the executor."""
    from computer_vision_foundations_spark.functions.augment import (
        augment_png_udf,
    )
    from computer_vision_foundations_spark.functions.image import (
        encode_text_png_8x9,
        with_image_statistics,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 72
    )
    png = docs.select(
        "doc_id", encode_text_png_8x9(F.col("text")).alias("content")
    )
    aug = png.select(
        "doc_id",
        augment_png_udf((8, 8), True, (4, 4))(F.col("content")).alias(
            "content"
        ),
    )
    st = with_image_statistics(aug)
    return st.select(
        "doc_id",
        F.round(F.col("statistics.mean")[0], 4).alias("mean"),
        F.col("statistics.median")[0].alias("median"),
        F.col("statistics.extrema")[0][0].alias("pmin"),
        F.col("statistics.extrema")[0][1].alias("pmax"),
    )


@_register(
    "z44_k_anonymity",
    """
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS class_size,
           count(*) < 5             AS at_risk
    FROM documents GROUP BY source, lang
    """,
)
def z44_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifier combinations (Sweeney
    2002): every observed (source, lang) equivalence class with its
    size and an ``at_risk`` flag for classes below k=5
    (``operators/privacy.py``). The governance gate a corpus release
    runs before publication; the reference's EXIF metadata (camera
    make/model/timestamp) is exactly such a QI set. Oracle is the
    direct relational replay.

    Scale shape: ONE hash aggregate over narrow QI columns with
    map-side partials; suppression joins the ≤(k−1)·|violations|-row
    class table back broadcast (tested, not in this query)."""
    from computer_vision_foundations_spark.operators.privacy import (
        k_anonymity_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    return k_anonymity_report(docs, ["source", "lang"], k=5)


@_register(
    "z45_zipf_fit",
    """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), c AS (
        SELECT token, count(*) AS n FROM toks
        WHERE token <> '' GROUP BY token
    ), top AS (
        SELECT token, n,
               row_number() OVER (ORDER BY n DESC, token) AS rank
        FROM c QUALIFY rank <= 50
    ), l AS (
        SELECT ln(CAST(rank AS DOUBLE)) AS x,
               ln(CAST(n AS DOUBLE)) AS y
        FROM top
    ), a AS (
        SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
               sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        FROM l
    )
    SELECT CAST(m AS BIGINT) AS n_terms,
           round((sxy - sx*sy/m) / (sxx - sx*sx/m), 6) AS slope,
           round((sy - (sxy - sx*sy/m) / (sxx - sx*sx/m) * sx) / m, 6)
               AS intercept,
           round(((sxy - sx*sy/m) * (sxy - sx*sy/m))
                 / ((sxx - sx*sx/m) * (syy - sy*sy/m)), 6) AS r2
    FROM a
    """,
)
def z45_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic over the top-50 vocabulary: log-log
    rank-frequency least-squares slope, intercept and r² — the
    corpus-health number (natural text ≈ −1; boilerplate and
    synthetic spam bend it) — ``operators/vocab.py:zipf_fit``. The
    oracle replays the top-V ranking and the closed-form regression
    with identical expression structure so the doubles agree at
    round-6.

    Scale shape: the corpus-sized token-count table is never globally
    sorted (TakeOrderedAndProject top-V); the regression is a scalar
    aggregate over V rows."""
    from computer_vision_foundations_spark.operators.vocab import zipf_fit

    docs = load_table(spark, sf_dir, "documents")
    return zipf_fit(docs, v=50)


def _consensus_oracle_sql() -> str:
    """Composed oracle: the three modality pair sets are the already-
    registered z32 / z36 / q49 oracles verbatim (each with its own
    WITH chain, nested as subqueries), full-outer-merged on the pair
    key. Consensus = present in ≥ 2 modalities."""
    img = _ORACLES["za71_image_near_dup"]
    aud = _ORACLES["z36_audio_fingerprint_pairs"]
    txt = _ORACLES["za63_simhash_near_dup_pairs"]
    return f"""
    WITH img AS (SELECT id_a, id_b FROM ({img})),
         aud AS (SELECT id_a, id_b FROM ({aud})),
         txt AS (SELECT id_a, id_b FROM ({txt})),
         u AS (SELECT id_a, id_b FROM img
               UNION SELECT id_a, id_b FROM aud
               UNION SELECT id_a, id_b FROM txt)
    SELECT u.id_a, u.id_b,
           i.id_a IS NOT NULL AS in_image,
           a.id_a IS NOT NULL AS in_audio,
           t.id_a IS NOT NULL AS in_text,
           CAST((i.id_a IS NOT NULL)::INT
                + (a.id_a IS NOT NULL)::INT
                + (t.id_a IS NOT NULL)::INT AS BIGINT) AS n_modalities
    FROM u LEFT JOIN img i USING (id_a, id_b)
           LEFT JOIN aud a USING (id_a, id_b)
           LEFT JOIN txt t USING (id_a, id_b)
    WHERE (i.id_a IS NOT NULL)::INT + (a.id_a IS NOT NULL)::INT
          + (t.id_a IS NOT NULL)::INT >= 2
    """


@_register("z46_multimodal_consensus_pairs", _consensus_oracle_sql())
def z46_multimodal_consensus_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-modal duplicate consensus — the capstone composition of
    the three modality-specific near-dup generators over the SAME
    corpus: image dHash Hamming pairs (z32, real PNG decode), audio
    energy-landmark fingerprint pairs (z36, real WAV decode), and
    text SimHash pairs (q49). A pair flagged by ≥ 2 independent
    modalities is a high-precision duplicate (the standard ensemble
    trick: modality-specific false positives rarely coincide);
    ``n_modalities`` grades confidence. The oracle nests the three
    already-verified oracles verbatim and replays the consensus merge,
    so this query re-verifies all three chains plus the merge in one
    hash.

    Scale shape: the union of the three generators' budgets; the
    consensus itself joins PAIR tables (outputs, orders of magnitude
    smaller than the corpus) on the pair key — three small hash
    joins, nothing corpus-sized."""
    from concurrent.futures import ThreadPoolExecutor

    t = F.lit(True)
    # The three generators are INDEPENDENT and each does eager work
    # while being built (fingerprint persist+count, checkpointed
    # blocks), previously strictly serially. Build them from a small
    # driver pool so their jobs overlap and back-fill each other's
    # stragglers (guide §2.6 — Spark's scheduler runs concurrent jobs
    # fine; results are unchanged, the legs share nothing).
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_img = pool.submit(za71_image_near_dup, spark, sf_dir)
        f_aud = pool.submit(z36_audio_fingerprint_pairs, spark, sf_dir)
        f_txt = pool.submit(za63_simhash_near_dup_pairs, spark, sf_dir)
        # the two MEDIA pair tables are pair-count-bounded and consumed
        # twice below (the anchor semi-filter AND the consensus merge):
        # checkpoint them once so neither consumer replays the leg's
        # decode/fingerprint tail (measured at sf0.1: the un-ckpt'd
        # anchor branch re-ran both tails, 5.6 -> 8.6 s). The TEXT pair
        # stream stays lazy — it is the dense one the anchor prunes.
        # lazy (eager=False): the blocks materialize inside the anchor
        # broadcast-build job below instead of two dedicated jobs
        img = (
            f_img.result()
            .select("id_a", "id_b", t.alias("in_image"))
            .localCheckpoint(eager=False)
        )
        aud = (
            f_aud.result()
            .select("id_a", "id_b", t.alias("in_audio"))
            .localCheckpoint(eager=False)
        )
        txt = f_txt.result().select("id_a", "id_b", t.alias("in_text"))
    # Consensus requires >= 2 modalities, so EVERY surviving pair
    # carries an image or audio vote — text-only pairs can never pass
    # the final filter. Pre-filter the text pair stream by the
    # broadcast union of the two media pair-key sets BEFORE the merge
    # (guide §3.2 semi-join pre-filter, round-12 wave 8): text is the
    # dense modality (near-dup corpora make its pair table quadratic
    # in family size — measured 159.5M rows on the 10× replica set,
    # where the unfiltered full-outer merge shuffled+sorted all of
    # them, 87.8 s, only to discard text-only rows at the end), while
    # the media pair tables are bounded by media near-dup density
    # (242k + 270 rows on the same set — comfortably broadcastable;
    # if a deployment's media pairs outgrow the broadcast cap, drop
    # the hint: the semi-join still prunes before the wide shuffle).
    # Output is provably identical: every row removed has
    # n_modalities <= 1.
    # no distinct: left-semi is duplicate-insensitive, and skipping it
    # keeps the broadcast build a zero-shuffle scan of the checkpoints
    anchor = img.select("id_a", "id_b").union(aud.select("id_a", "id_b"))
    txt = txt.join(F.broadcast(anchor), ["id_a", "id_b"], "left_semi")
    # chained FULL OUTER joins (key columns coalesce under list-form
    # join keys) evaluate each generator subtree exactly once — the
    # union-then-left-join formulation would run every leg twice
    out = (
        img.join(aud, ["id_a", "id_b"], "full")
        .join(txt, ["id_a", "id_b"], "full")
        .select(
            "id_a",
            "id_b",
            F.coalesce("in_image", F.lit(False)).alias("in_image"),
            F.coalesce("in_audio", F.lit(False)).alias("in_audio"),
            F.coalesce("in_text", F.lit(False)).alias("in_text"),
        )
    )
    n = (
        F.col("in_image").cast("int")
        + F.col("in_audio").cast("int")
        + F.col("in_text").cast("int")
    )
    return out.withColumn("n_modalities", n.cast("long")).where(
        F.col("n_modalities") >= 2
    )


@_register(
    "z47_hashed_features",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents
    ), h AS (
        SELECT doc_id,
               ('0x' || substr(md5(t), 1, 7))::BIGINT % 64 AS bucket,
               CASE WHEN ('0x' || substr(md5(t), 8, 7))::BIGINT % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM toks WHERE t <> ''
    )
    SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS weight
    FROM h GROUP BY doc_id, bucket HAVING sum(sgn) <> 0
    """,
)
def z47_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009; the
    HashingVectorizer / Vowpal Wabbit shape): signed 64-bucket hashed
    bag-of-words as sparse ``(doc_id, bucket, weight)`` triples
    (``functions/feature_hash.py``), the zero-coordination featurizer
    — no vocabulary fit, no broadcast dictionary, so it is the one
    text featurizer that needs NOTHING shared at 100 TB. Buckets and
    signs use the portable md5 pair family, so the oracle replays the
    featurization bit-for-bit.

    Scale shape: one narrow token projection + ONE (id, bucket) hash
    aggregate with map-side partials; only sparse triples shuffle."""
    from computer_vision_foundations_spark.functions.feature_hash import (
        hashed_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return hashed_features(docs, d=64)


@_register(
    "z48_class_compactness",
    """
    WITH el AS (
        SELECT vec_id, label, u.i AS i,
               CAST(embedding[CAST(u.i + 1 AS INTEGER)] AS DOUBLE) AS x
        FROM embeddings, unnest(range(len(embedding))) u(i)
    ), cent AS (
        SELECT label, i, avg(x) AS c FROM el GROUP BY label, i
    ), j AS (
        SELECT el.vec_id, el.label, el.x, cent.c
        FROM el JOIN cent USING (label, i)
    ), pv AS (
        SELECT vec_id, label,
               sum(x * c) AS dot, sum(x * x) AS vv, sum(c * c) AS cc
        FROM j GROUP BY vec_id, label
    ), cz AS (
        SELECT vec_id, label, cc,
               CASE WHEN vv > 0 AND cc > 0
                    THEN dot / (sqrt(vv) * sqrt(cc)) ELSE 0.0 END AS cos
        FROM pv
    )
    SELECT label,
           CAST(count(*) AS BIGINT)          AS n,
           round(sqrt(max(cc)), 6)           AS centroid_norm,
           round(avg(cos), 6)                AS mean_cos
    FROM cz GROUP BY label
    """,
)
def z48_class_compactness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space health report: per-class centroid norm and mean
    member-to-centroid cosine (``operators/embedding_stats.py``) —
    the separability diagnostic run before training and after every
    re-embedding (compact classes predict linear-probe accuracy;
    diffuse ones flag drift or label noise — the aggregate companion
    to z42's per-point audit). Pure relational explode arithmetic
    with floats promoted to double BEFORE any product, so the oracle
    replays the identical expression shapes at round-6.

    Scale shape: two keyed shuffles of narrow element rows; the
    (|labels|·dim)-row centroid table is broadcast; vectors never
    move whole."""
    from computer_vision_foundations_spark.operators.embedding_stats import (
        class_compactness,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return class_compactness(emb)


@_register(
    "z49_kmv_user_distinct",
    """
    WITH hx AS (
        SELECT DISTINCT event_type,
               md5(CAST(user_id AS VARCHAR)) AS h
        FROM events WHERE user_id IS NOT NULL
    ), regs AS (
        SELECT event_type, h,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY h) AS pos
        FROM hx QUALIFY pos <= 64
    ), agg AS (
        SELECT event_type, count(*) AS n,
               max(CASE WHEN pos = 64 THEN
                   ('0x' || substr(h, 1, 13))::BIGINT
                   / 4503599627370496.0 END) AS tk
        FROM regs GROUP BY event_type
    )
    SELECT event_type,
           round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                      ELSE 63.0 / tk END, 4) AS approx_distinct
    FROM agg
    """,
)
def z49_kmv_user_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users via the KMV bottom-k
    sketch (``functions/sketches.kmv_distinct``, k=64) — the batch
    twin of the streaming state-store sketch
    (``streaming/stateful.approx_distinct_stateful``, identical hash
    math). With more distinct users per type than k the ESTIMATOR path is
    active (unlike exact-below-k fixtures), so the oracle checks the
    (k−1)/theta formula itself, bit-for-bit via the 52-bit hash
    fraction. This is the per-key cardinality report (DAU per surface,
    uniques per domain) that exact distinct cannot afford at stream
    scale.

    Scale shape: one narrow distinct over (key, 16-byte md5) with
    map-side partials; everything after touches ≤ k rows per key."""
    from computer_vision_foundations_spark.functions.sketches import (
        kmv_distinct,
    )

    ev = load_table(spark, sf_dir, "events")
    return kmv_distinct(
        ev, "user_id", k=64, keys=["event_type"]
    )


def _ndcg_oracle_sql() -> str:
    """Composed oracle: the verified q04 BM25 ranking nested verbatim,
    graded relevance = count of query terms present in the document,
    then the nDCG@10 metric replayed relationally."""
    qv = ", ".join(
        "({}, [{}])".format(
            qid, ", ".join(f"'{t}'" for t in terms)
        )
        for qid, terms in _BM25_QUERIES
    )
    return f"""
    WITH ranked AS (
        SELECT query_id, doc_id, rank FROM ({_bm25_oracle_sql()})
    ), qv(query_id, terms) AS (VALUES {qv}),
    qrp AS (
        SELECT * FROM (
            SELECT qv.query_id, d.doc_id,
                   len(list_filter(qv.terms,
                       t -> list_contains(
                           string_split(d.text, ' '), t))) AS rel
            FROM documents d CROSS JOIN qv) t
        WHERE rel > 0
    ), hits AS (
        SELECT r.query_id, r.rank, coalesce(q.rel, 0) AS rel
        FROM ranked r LEFT JOIN qrp q
          ON r.query_id = q.query_id AND r.doc_id = q.doc_id
        WHERE r.rank <= 10
    ), dcg AS (
        SELECT query_id,
               sum((power(2.0, rel) - 1) / log2(rank + 1)) AS dcg
        FROM hits GROUP BY 1
    ), ideal AS (
        SELECT query_id,
               sum((power(2.0, rel) - 1) / log2(rk + 1)) AS idcg
        FROM (
            SELECT query_id, rel,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY rel DESC, doc_id) AS rk
            FROM qrp) t
        WHERE rk <= 10 GROUP BY 1
    )
    SELECT d.query_id,
           round(d.dcg, 6)                    AS dcg,
           round(coalesce(i.idcg, 0.0), 6)    AS idcg,
           round(CASE WHEN i.idcg > 0 THEN d.dcg / i.idcg
                      ELSE 0.0 END, 6)        AS ndcg
    FROM dcg d LEFT JOIN ideal i USING (query_id)
    """


@_register("z50_bm25_ndcg", _ndcg_oracle_sql())
def z50_bm25_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-retrieval quality metric: nDCG@10 of the BM25 ranking
    (q04's exact pipeline) against graded relevance = how many of the
    query's terms the document contains (Järvelin & Kekäläinen 2002;
    ``operators/ir_eval.py``). Completes the evaluation family —
    recall@k grades the ANN engines, PRF grades dedup candidates,
    nDCG grades ranked text retrieval. The oracle nests the verified
    BM25 oracle verbatim and replays judgment construction, the
    discounted gains and the ideal re-ranking, so ranking AND metric
    are one hash.

    Scale shape: the BM25 budget plus joins over top-k rankings and
    |queries|·|matching docs| judgment rows — model-sized metric
    tables; one narrow hash join + a |queries|-row aggregate."""
    from computer_vision_foundations_spark.operators.ir_eval import (
        ndcg_at_k,
    )
    from computer_vision_foundations_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    queries_df = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, terms array<string>"
    )
    ranked = bm25_topk(docs, queries_df, k=10)
    toks = docs.select("doc_id", F.split("text", " ").alias("tk"))
    qrels = (
        toks.crossJoin(F.broadcast(queries_df))
        .select(
            "query_id",
            "doc_id",
            F.size(
                F.filter(
                    "terms",
                    lambda t: F.array_contains(F.col("tk"), t),
                )
            ).alias("rel"),
        )
        .where(F.col("rel") > 0)
    )
    return ndcg_at_k(ranked, qrels, k=10)


def _triangle_oracle_sql() -> str:
    """Composed oracle: the verified q49 SimHash pair oracle is the
    edge list, fed verbatim into the shared orientation + wedge-close
    SQL twin (``operators/triangles.py``)."""
    from computer_vision_foundations_spark.operators.triangles import (
        triangles_oracle_sql,
    )

    return triangles_oracle_sql(
        f"SELECT id_a, id_b FROM ({_ORACLES['za63_simhash_near_dup_pairs']})"
    )


@_register("za73_triangle_stats", _triangle_oracle_sql())
def za73_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficients over the
    SimHash near-duplicate pair graph (q49's exact edges) — the
    cohesion audit between pair generation and destructive cluster
    collapse: clique-like clusters (coefficient ≈ 1) are safe to
    dedup, transitivity-stitched chains (few triangles) deserve
    re-verification. Runs the structural-equivalence COLLAPSED path
    (``operators/triangles.triangle_stats_collapsed``): SimHash
    adjacency is a pure function of the fingerprint, so same-
    fingerprint nodes collapse to weighted super-nodes, the
    degree-oriented node-iterator (Suri & Vassilvitskii, WWW 2011)
    enumerates triangles on the tiny quotient graph, and per-node
    counts expand in closed form — the clique blowup of dedup graphs
    (c³/6 triangles per c-clique) never materializes (194 s → ~3 s at
    sf0.1). The oracle replays the NAIVE per-node construction, so
    the closed form is value-hash-verified end to end.

    Scale shape: shuffles carry (node, long) degrees and quotient id
    pairs only; the close test is one left-semi equi-join; the
    expansion is one join of class-level stats onto the class map."""
    from computer_vision_foundations_spark.operators.dedup import (
        simhash_pairs,
    )
    from computer_vision_foundations_spark.operators.triangles import (
        triangle_stats_collapsed,
    )

    # the fingerprint table is computed ONCE (eager localCheckpoint)
    # and shared by the pair generator and the class map — q42's
    # round-8 fix applied here too (the separate za63 call re-ran the
    # whole tokenize+md5+vote pipeline for the class side)
    fingerprints = q92_simhash(spark, sf_dir).localCheckpoint()
    # za63's exact parameters, over the shared fingerprint block
    pairs = simhash_pairs(
        fingerprints, "simhash", "doc_id", bits=32, bands=4, max_hamming=3
    )
    return triangle_stats_collapsed(
        pairs, fingerprints, node_col="doc_id", cls_col="simhash"
    )


def _nb_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_oracle_sql,
    )

    return nb_oracle_sql()


@_register("z52_naive_bayes_lang", _nb_oracle_sql())
def z52_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier trained in one
    corpus pass and applied to every document — the closed-form
    member of the fastText-style quality/domain filter family every
    curation pipeline runs (CCNet's language filter, GPT-3's
    WebText-vs-CommonCrawl classifier) — ``operators/nbayes.py``.
    Laplace α=1, resubstitution scoring, deterministic
    (score DESC, class ASC) argmax.

    Scale shape: the model is a |V|·|classes| broadcast; the token
    stream shuffles once into per-doc bags; scoring is a broadcast
    join + one keyed hash aggregate; the argmax is a |classes|-row
    per-doc window. No driver state."""
    from computer_vision_foundations_spark.operators.nbayes import (
        nb_train_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    return nb_train_score(docs)


@_register(
    "z53_kneser_ney_surprisal",
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
    ), pstats AS (
        SELECT prev, CAST(sum(bcnt) AS DOUBLE) AS pcnt,
               CAST(count(*) AS DOUBLE) AS fanout
        FROM bi GROUP BY 1
    ), cont AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS ccnt FROM bi GROUP BY 1
    ), ctot AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_bigrams FROM bi
    )
    SELECT p.doc_id, count(*) AS n_tokens,
           round(avg(-log2(CASE WHEN p.prev IS NULL THEN u.ucnt / tot.n
               ELSE greatest(coalesce(CAST(b.bcnt AS DOUBLE), 0.0)
                             - {0.75!r}, 0.0) / ps.pcnt
                    + {0.75!r} * ps.fanout / ps.pcnt
                      * (coalesce(c.ccnt, 0.0) / ctot.n_bigrams)
               END)), 6) AS surprisal
    FROM pos p
    JOIN uni u USING (token)
    CROSS JOIN tot
    LEFT JOIN bi b ON b.prev = p.prev AND b.token = p.token
    LEFT JOIN pstats ps ON ps.prev = p.prev
    LEFT JOIN cont c ON c.token = p.token
    CROSS JOIN ctot
    GROUP BY p.doc_id
    """,
)
def z53_kneser_ney_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram surprisal
    (operators/perplexity.kneser_ney_logprob_scores) — the smoothing
    KenLM/SRILM made standard (Chen & Goodman 1999), completing the
    LM-filter ladder: za30 unigram → za37 Jelinek-Mercer → KN, whose
    continuation-probability backoff separates genuinely productive
    tokens from frequent-but-frozen collocation tails. D=0.75,
    first token unigram-MLE. The oracle replays identical count
    algebra and discount literals.

    Scale shape: three bigram-table aggregates for the model, four
    hash joins on the (id, pos, prev, token) stream, one per-doc
    aggregate — the exact za37 budget plus one |vocab|-row join."""
    from computer_vision_foundations_spark.operators.perplexity import (
        kneser_ney_logprob_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = kneser_ney_logprob_scores(docs, "text", "doc_id", discount=0.75)
    return out.select(
        "doc_id", "n_tokens", F.round("surprisal", 6).alias("surprisal")
    )


def _lpa_oracle_sql() -> str:
    from computer_vision_foundations_spark.operators.lpa import (
        lpa_oracle_sql,
    )

    return lpa_oracle_sql(
        f"SELECT id_a, id_b FROM ({_ORACLES['za63_simhash_near_dup_pairs']})",
        n_rounds=3,
    )


@_register("q41_lpa_communities", _lpa_oracle_sql())
def q41_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al.
    2007) over the SimHash near-duplicate pair graph — the
    majority-vote refinement of connected components: a bridge edge
    between two dense duplicate families no longer merges them, so
    communities are the safer unit for destructive dedup than raw
    components (``operators/lpa.py``; z51's triangle audit flags the
    same risk, this operator resolves it). Deterministic smallest-
    label tie-break; 3 fixed rounds (the gate-SF round budget — the
    operator takes any n_rounds; the oracle replays the identical
    recurrence one CTE per round).

    Scale shape: per round ONE edge-list shuffle carrying (node,
    label) longs + a per-node window over its label histogram;
    label tables localCheckpoint with explicit release (the
    components.py discipline)."""
    from computer_vision_foundations_spark.operators.lpa import (
        label_propagation,
    )

    pairs = za63_simhash_near_dup_pairs(spark, sf_dir)
    # simhash_pairs emits each unordered pair exactly once -> skip the
    # symmetrize-distinct shuffle (operator contract knob)
    return label_propagation(
        pairs, "id_a", "id_b", n_rounds=3, edges_distinct=True
    )
