"""Generate PLANS.md: formatted physical plans for representative
queries, with automated checks of the scale-critical properties.

For each audited query the tool records the `explain("formatted")`
output and greps it for the properties the 100 TB design depends on
(filter pushdown, pruned read schemas, broadcast joins where a side
is dimension-sized, no NestedLoop/Cartesian anywhere, Arrow — not
row-pickled — Python evaluation). Re-run after changing any operator:

    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from computer_vision_foundations_spark import get_spark
from computer_vision_foundations_spark.queries import queries

# Whitelist token: an Exchange SinglePartition that feeds a Sort
# (± Window) is the one-task global-sort shape that killed
# heaps_fit/abc_classes at scale (round-8 verdict #1/#2) — only
# acceptable when the sorted input is provably bounded (bin
# histograms, k rows after TakeOrderedAndProject, |classes|-sized
# folds); annotating queries state the bound in their claim.
SP_SORT_OK = "SinglePartitionSort"

# name -> (claim, allowed operators that would otherwise be flagged)
AUDIT = {
    "q78_pricing_summary": ("filter pushdown + column pruning into the parquet scan; partial/final hash agg", ()),
    "q75_region_revenue": ("star join: every dimension broadcast, fact side never shuffles for the join", ()),
    "q81_top3_orders_per_customer": ("single shuffle for the ranking window", ()),
    "q83_dedup_exact": ("dedup as hash-agg on 16-byte md5 keys; document bodies never shuffle", ()),
    "za23_lsh_candidate_pairs": ("banded equi-join, no cartesian; signature agg is whole-stage codegen", ()),
    "za24_knn_cosine": (
        "brute-force kNN IS an all-pairs product by definition — the broadcast "
        "nested loop with the (tiny) probe set built is the intended baseline "
        "plan; q33/q36 are the bucketed scale paths that avoid it",
        ("BroadcastNestedLoopJoin",),
    ),
    "z29_lsh_ann": ("candidates via (table, bucket) equi-join; no cross product", ()),
    "q89_ivf_ann": ("cell equi-join touches n_probe/n_cells of the corpus; probes broadcast", ()),
    "z26_pq_adc_knn": (
        "the ADC scan reads codes, not vectors; probe LUTs broadcast — the "
        "corpus×probe product over compressed codes is the intended scan "
        "(compose with q36's IVF cells to prune it)",
        ("BroadcastNestedLoopJoin",),
    ),
    "q84_asof_enrich": ("as-of join = ONE exchange on the key + running window", ()),
    "q85_range_join_error_window": ("keyless range join as bucketized hash join, no NestedLoop", ()),
    "q87_hll_distinct": ("sketch build is a fixed-size hash-agg with map-side combine", ()),
    "z09_pack_sequences": ("packing = one hash shuffle + one sort per shard", ()),
    "za64_ivf_pq_ann": (
        "IVF-PQ composed: cell equi-join over (cell, codes) rows — float "
        "vectors never leave the encode projection; probe LUTs broadcast",
        (),
    ),
    "za63_simhash_near_dup_pairs": (
        "banding over DISTINCT fingerprints with member re-expansion; "
        "hamming-0 pairs from a direct fingerprint equi-join — no band "
        "fan-out for exact-duplicate clusters",
        (),
    ),
    "za55_bm25_search": (
        "token stream semi-joined against the broadcast query vocabulary "
        "BEFORE the tf aggregate; df/idf and corpus stats broadcast — the "
        "BroadcastNestedLoopJoin is the ONE-ROW corpus-stats (N, avgdl) "
        "crossJoin, which Spark always plans as BNLJ; broadcast side is "
        "a single row by construction",
        ("BroadcastNestedLoopJoin",),
    ),
    "za41_kmeans_step": (
        "assignment is a narrow Arrow projection; update is ONE hash agg "
        "of unrolled per-dimension sums with map-side combine",
        (),
    ),
    "z57_winnow_near_dup_pairs": (
        "fingerprint equi-join with the document-frequency cap; Arrow-batched "
        "fingerprinting, only (id, fp) rows shuffle",
        (),
    ),
    "za58_semantic_dedup": (
        "SemDeDup: Arrow-matmul cluster assignment (no shuffle), then a "
        "within-cluster equi-join — cross-cluster pairs never form",
        (),
    ),
    "za10_bloom_decontaminate": (
        "bloom bits broadcast; probes are (id, int) rows; corpus text "
        "never shuffles",
        (),
    ),
    "z12_bottom_k_sample": (
        "TakeOrderedAndProject (per-partition top-k), not a global sort",
        (),
    ),
    "za11_weighted_sample": (
        "A-ES weighted sampling is the same TakeOrderedAndProject shape",
        (),
    ),
    "z32_multiprobe_lsh_ann": (
        "probe-side bucket fan-out ×(1+n_flip); candidates still a "
        "(table, bucket) equi-join — no cross product",
        (),
    ),
    "z22_sq8_ann": (
        "SQ8 scan reads uint8 codes only; the probe×corpus product over "
        "codes with broadcast probes is the intended scan (same family "
        "as q29's ADC)",
        ("BroadcastNestedLoopJoin",),
    ),
    "z15_event_funnel": (
        "funnel = scan-pruned type filter + ONE shuffle on user + "
        "linear sorted-fold state machine; no self-joins per step"
        "; the conversion window runs over the |steps|-row (plan-literal constant) per-step table",
        (SP_SORT_OK,),
    ),
    "q95_gap_fill_locf": (
        "per-key grid via sequence explode — no global calendar cross "
        "join; one agg shuffle + one window shuffle",
        (),
    ),
    "za65_duplicated_spans": (
        "span-frequency agg on 16-byte hashes; frequent-span check is a "
        "LINEAR left-semi join (no pair formation); islands window "
        "partitions by document",
        (),
    ),
    "za19_random_projection": (
        "JL projection is ONE narrow codegen projection — sign matrix as "
        "literals, no shuffle, no Python",
        (),
    ),
    "za62_image_metadata": (
        "encode→EXIF-write→TIFF-parse chain as two narrow Arrow "
        "projections; no shuffle at all",
        (),
    ),
    "za61_corpus_report": (
        "signal composition: md5 dedup agg + token-stream model join + "
        "one per-source agg with exact percentile on reduced doc rows. "
        "BroadcastNestedLoopJoin = the 1-row total crossJoin idiom",
        ("BroadcastNestedLoopJoin",),
    ),
    "za25_volume_drift": (
        "hash agg to category x day (the reduction), one window shuffle "
        "on category",
        (),
    ),
    "za29_event_transitions": (
        "lead window on the per-user timeline + one hash agg; "
        "(user, type) rows only",
        (),
    ),
    "za88_persisted_ivf_pq": (
        "stored codes scan with dynamic partition pruning on _cell "
        "(plan shows dynamicpruning subquery); ADC = array lookups in "
        "the cell equi-join; one top-k window",
        (),
    ),
    "za68_cdc_dedup": (
        "boundary detection is a map-side array expression (Generate); "
        "only (doc, chunk_hash) rows shuffle; shared-chunk check is a "
        "linear left-semi join",
        (),
    ),
    "za20_temperature_mixture": (
        "|domains|-row aggregate + broadcast 1-row normalizer; the "
        "corpus never shuffles. BroadcastNestedLoopJoin = the 1-row "
        "scalar crossJoin idiom",
        ("BroadcastNestedLoopJoin",),
    ),
    "za37_bigram_surprisal": (
        "token-stream hash joins against vocab-sized model tables; "
        "interpolation in codegen; no Python anywhere. The "
        "BroadcastNestedLoopJoin is the 1-ROW broadcast total-count "
        "crossJoin (the scalar-aggregate idiom q47/pagerank use) — "
        "constant-size build side, not a data-sized product",
        ("BroadcastNestedLoopJoin",),
    ),
    "za67_incremental_lsh": (
        "batch-only shingle pipeline; snapshot side reads stored "
        "signatures; band equi-join with combined-bucket cap",
        (),
    ),
    "za51_hits_scores": (
        "per half-step: edge equi-join + hash agg on (node, double); L2 "
        "norm is a broadcast 1-row crossJoin; rounds read checkpointed "
        "blocks (plan shows ExistingRDD-rooted final round)",
        (),
    ),
    "za50_pca_covariance": (
        "partial Gramians per partition via ArrowEvalPython mapInPandas; "
        "only d^2 partial-sum rows shuffle; means join is d-row broadcast",
        (),
    ),
    "za30_unigram_surprisal": (
        "frequency model = one hash agg; token stream joins it "
        "(TF-IDF budget); totals ride a 1-row broadcast crossJoin",
        ("BroadcastNestedLoopJoin",),
    ),
    "za75_time_travel": (
        "time-travel read resolves the version-2 snapshot from the "
        "commit log driver-side; the plan is a PLAIN parquet scan of "
        "exactly that snapshot's immutable files + one hash agg — no "
        "log join, no extra shuffle",
        (),
    ),
    "za76_acid_upsert": (
        "copy-on-write MERGE already happened at write time (matched "
        "files found by ONE broadcast semi-join on input_file_name); "
        "the read-back is a plain snapshot scan + narrow projection",
        (),
    ),
    "q03_delta_dv_roundtrip": (
        "deletion-vector read: one pruned snapshot scan; the deleted "
        "(file, row_index) pairs ride a BROADCAST left-anti join "
        "(bitmaps decoded driver-side, cardinality-sized), then one "
        "hash agg — the delete itself moved zero data bytes",
        (),
    ),
    "q24_delta_column_mapping": (
        "columnMapping=name read: one basePath scan under PHYSICAL "
        "column names + a projection back to logical — pure name "
        "resolution, no extra pass, no shuffle beyond the agg",
        (),
    ),
    "za69_wav_audio_stats": (
        "real WAV encode→decode→window-stats as narrow Arrow "
        "projections + HOF array aggregation — ZERO shuffle; the WAV "
        "bytes never leave the executor that made them",
        (),
    ),
    "za70_gif_frame_sample": (
        "real GIF LZW encode (Arrow projection) + decode/frame-sample "
        "fan-out (mapInPandas) — narrow end to end, no shuffle",
        (),
    ),
    "z23_audio_spectrum": (
        "WAV encode + rfft power-sum features as narrow Arrow "
        "projections; centroid/ratio derived in codegen — no shuffle",
        (),
    ),
    "z24_bucketed_join": (
        "bucketed sort-merge join: NO Exchange on either join side "
        "(bucket layout from the catalog); the only shuffle is the "
        "final 5-row segment aggregate",
        (),
    ),
    "z25_table_profile": (
        "whole profile = ONE aggregation job (multi-DISTINCT via a "
        "single Expand) + a stack reshape of the 1-row result",
        (),
    ),
    "q15_hill_tail_index": (
        "one map-side-combinable token count, one top-(k+1) rank "
        "window over |vocab| rows, one k-row aggregate; the BNLJ is "
        "the 1-row threshold broadcast",
        ("BroadcastNestedLoopJoin",),
    ),
    "q30_embedding_isotropy": (
        "row-local quantize/normalize, ONE posexplode into a dim-keyed "
        "integer aggregate + one global aggregate; no pair formation; "
        "the BNLJ is the 1-row ssq broadcast",
        ("BroadcastNestedLoopJoin",),
    ),
    "q31_t_closeness": (
        "one (class, bin) hash agg; broadcast <=64-row global "
        "histogram crossed with the |classes| table; per-class "
        "cumulative window; payloads never shuffle. BNLJ = the 1-row "
        "extrema/n_g broadcasts and the |classes| x bins audit cross"
        "; the SinglePartition sorts fold <=64-row bin histograms / |classes|-row tables",
        ("BroadcastNestedLoopJoin", SP_SORT_OK),
    ),
    "za42_multimodal_manifest": (
        "all three codec signals derive in-row: narrow Arrow "
        "projections over one documents scan — zero joins, zero "
        "shuffle",
        (),
    ),
    "z27_pq_rerank": (
        "stage 1 scans codes only (broadcast probe LUTs, the "
        "sanctioned ADC product); stage 2 broadcasts the "
        "|probes|·shortlist ids so the exact-cosine fetch is a "
        "map-side pruned hash join — the corpus vectors never "
        "shuffle. BroadcastNestedLoopJoin = the ADC scan, identical "
        "to q29's allowlisted plan",
        ("BroadcastNestedLoopJoin",),
    ),
    "za35_zorder_optimize": (
        "the z-order rewrite already committed; the read-back is a "
        "plain snapshot scan with the z-box filter pushed to parquet "
        "footers + one small hash agg",
        (),
    ),
    "za31_data_skipping": (
        "commit-log stats pruned the file list DRIVER-SIDE before "
        "planning; the scan reads only intersecting files, filter "
        "pushed, one small hash agg",
        (),
    ),
    "z30_knn_join": (
        "self kNN join: pairs form only inside the (label) block "
        "equi-join — no cross product; norms precomputed per side; "
        "one block-join shuffle + one per-query top-k window",
        (),
    ),
    "za81_change_data_feed": (
        "CDF = full-outer join of two snapshots on (key, md5 "
        "fingerprint) — payloads never cross the join; one keyed "
        "shuffle",
        (),
    ),
    "za71_image_near_dup": (
        "image near-dup: PNG decode + dHash are narrow Arrow "
        "projections; pairing is the generic Hamming band equi-join "
        "over DISTINCT 8-byte fingerprints — no cross product, "
        "images never shuffle",
        (),
    ),
    "z33_gopher_rules": (
        "Gopher battery: every rule is a higher-order Catalyst "
        "expression over split() arrays — one narrow codegen "
        "projection, ZERO shuffles",
        (),
    ),
    "z34_paragraph_dedup": (
        "paragraph dedup: keeper vote aggregates a narrow (md5, id) "
        "projection; bodies cross exactly two keyed shuffles (hash "
        "equi-join + per-doc reassembly)",
        (),
    ),
    "z35_scene_cuts": (
        "scene cuts: narrow GIF encode/decode projections, then ONE "
        "keyed shuffle (per-video lag window over (id, idx, key)); "
        "pixels never shuffle",
        (),
    ),
    "z36_audio_fingerprint_pairs": (
        "audio fingerprints: per-clip analytic windows share one "
        "partitioning; pairs come from the frequency-capped "
        "fingerprint equi-join — no cross product, waveforms never "
        "shuffle",
        (),
    ),
    "z37_kmv_source_overlap": (
        "KMV overlap: one narrow distinct over (source, md5); "
        "pairwise stage is a register-table self equi-join on the "
        "hash plus broadcast per-source scalars — never a "
        "group-grid",
        (),
    ),
    "z38_token_budget_select": (
        "token-budget selection: ONE keyed shuffle — the per-domain "
        "cumulative-sum window over narrow scored rows",
        (),
    ),
    "z39_curriculum_order": (
        "curriculum order: bucket assignment is a narrow codegen "
        "expression (boundary literals, no global ntile / no "
        "SinglePartition window); only the B-way rank window "
        "shuffles",
        (),
    ),
    "z40_curation_pipeline": (
        "curation pipeline: union of its stages' budgets — "
        "zero-shuffle rule gate, narrow keeper vote + two body "
        "shuffles for the dedup, one budget window; broadcast "
        "doc_id joins between stages",
        (),
    ),
    "z41_hard_negatives": (
        "hard negatives: the exact brute-force-probe baseline — the "
        "broadcast nested loop against the (tiny) anchor set is the "
        "intended plan (q27's idiom); swap in the IVF/PQ index for "
        "the bucketed scale path",
        ("BroadcastNestedLoopJoin",),
    ),
    "z42_label_noise": (
        "label noise: blocked self-kNN join — pairs form only within "
        "class blocks (label equi-join), one per-point aggregate",
        (),
    ),
    "z43_image_augment": (
        "image augment: two narrow Arrow projections (augment with "
        "codec round trip, stats) — no shuffle, no join",
        (),
    ),
    "z44_k_anonymity": (
        "k-anonymity: ONE hash aggregate over narrow QI columns with "
        "map-side partials",
        (),
    ),
    "z45_zipf_fit": (
        "zipf fit: TakeOrderedAndProject top-V (no global sort of "
        "the token-count table) + scalar regression aggregate over "
        "V rows; BroadcastNestedLoopJoin is vocab_top_k's 1-ROW "
        "broadcast total-count crossJoin (the scalar idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "z47_hashed_features": (
        "feature hashing: one narrow token projection + ONE "
        "(id, bucket) hash aggregate with map-side partials; only "
        "sparse triples shuffle",
        (),
    ),
    "z48_class_compactness": (
        "class compactness: two keyed shuffles of narrow element "
        "rows; the (labels x dim) centroid table is broadcast; "
        "vectors never move whole",
        (),
    ),
    "z49_kmv_user_distinct": (
        "KMV distinct: one narrow distinct over (key, md5) with "
        "map-side partials; per-key top-k window over sketch rows "
        "only",
        (),
    ),
    "z50_bm25_ndcg": (
        "nDCG: BM25's budget (token semi-join vs broadcast query "
        "vocab, 1-row stats BNLJ) + joins over top-k rankings and "
        "model-sized judgment tables; the qrels crossJoin broadcasts "
        "the 3-row query set (probe idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "z46_multimodal_consensus_pairs": (
        "multimodal consensus: inherits the three banded/capped pair "
        "generators' budgets; the consensus merge joins PAIR tables "
        "(generator outputs) on the pair key — small hash joins, "
        "nothing corpus-sized crosses",
        (),
    ),
    "z52_naive_bayes_lang": (
        "NB: model is a broadcast |V|x|classes| table; token stream "
        "shuffles once into per-doc bags; argmax is a |classes|-row "
        "per-doc window; the only BNLJs are 1-row scalar broadcasts "
        "(vocab size, doc count — the sanctioned crossJoin idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "z53_kneser_ney_surprisal": (
        "KN bigram: three bigram-table model aggregates + four hash "
        "joins on the (id, pos, prev, token) stream; 1-row totals "
        "ride broadcast crossJoins (scalar idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "z55_ngram_novelty": (
        "novelty: one left-anti hash join on (id, shingle) "
        "projections; bodies never shuffle",
        (),
    ),
    "z56_containment_pairs": (
        "containment: q90's capped shingle equi-join machinery, only "
        "the scoring expression differs",
        (),
    ),
    "z58_phrase_search": (
        "phrase search: token stream semi-joined against broadcast "
        "phrase vocab BEFORE any shuffle; then co-partitioned "
        "(doc, pos-offset) hash-join chain",
        (),
    ),
    "z59_nb_classification_report": (
        "classification report: corpus shuffles once as (actual, "
        "predicted) pairs; margins are |classes|^2-row algebra; "
        "inherits z52's 1-row scalar-broadcast BNLJs",
        ("BroadcastNestedLoopJoin",),
    ),
    "z60_surprisal_auc": (
        "AUC: corpus contributes one hash aggregate into the score "
        "histogram; ordered fold over distinct rounded scores only "
        "(model-sized single partition, documented); inherits z53's "
        "1-row totals crossJoins (scalar idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "z61_dbscan_clusters": (
        "DBSCAN: 3^p adjacent-cell equi-join for eps-pairs (vectors "
        "cross once); core/border/noise are id-pair algebra; "
        "clusters ride the checkpointed components loop",
        (),
    ),
    "z62_heaps_fit": (
        "Heaps fit: token-stream hash aggregates; cumulative window "
        "over |docs| narrow rows; scalar regression fold",
        (),
    ),
    "z63_nb_calibration": (
        "calibration: fixed-width bins are plan literals — one hash "
        "aggregate, no global rank; inherits z52's 1-row "
        "scalar-broadcast BNLJs",
        ("BroadcastNestedLoopJoin",),
    ),
    "z64_keep_best_of_cluster": (
        "keeper selection: one id equi-join + one per-cluster "
        "window; same budget as the min-id rule",
        (),
    ),
    "z65_source_divergence": (
        "JSD: one token-stream hash aggregate; the smoothed "
        "distribution grid and its token self-join are "
        "|V|x|sources|(^2) model-sized rows; 1-row vocab-size "
        "broadcast is the scalar crossJoin idiom",
        ("BroadcastNestedLoopJoin",),
    ),
    "z66_nb_crossval": (
        "k-fold NB: each fold is the z52 budget (token-stream hash "
        "agg + model-sized broadcast); folds split by a pure hash "
        "function, no shuffle to assign them",
        ("BroadcastNestedLoopJoin",),
    ),
    "z67_mad_outliers": (
        "two exact-percentile hash aggregates over the narrow "
        "(key, value) projection; key-sized stats broadcast back",
        (),
    ),
    "z68_ewma_level": (
        "EWMA closed form: one key shuffle shared by the window "
        "sort and the final aggregate; no loop, no UDF",
        (),
    ),
    "z69_seeded_walks": (
        "each step is a node-sized min_by choice table broadcast "
        "to the frontier; edge list built by one window pass",
        (),
    ),
    "z70_kappa_agreement": (
        "one shuffle of a two-column projection; |classes|-sized "
        "marginals broadcast; final row is the 1-row scalar "
        "crossJoin idiom",
        ("BroadcastNestedLoopJoin",),
    ),
    "z71_source_diversity": (
        "one token-stream shuffle into (grp, tok) counts; "
        "|groups|-row output aggregate",
        (),
    ),
    "z72_trend_spearman": (
        "two rank windows + one corr aggregate, all on the same key "
        "partitioning — one shuffle total",
        (),
    ),
    "z73_benford_values": (
        "one projection + 9-row aggregate; 9-row expectation grid "
        "broadcast (1-row total is the scalar crossJoin idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "z74_hourly_autocorr": (
        "one shuffle into (key, hour) counts; lag window reuses the "
        "key partitioning",
        (),
    ),
    "z75_cusum_changepoint": (
        "one shuffle into (key, hour) counts; stat/prefix/pick "
        "windows share the key partitioning",
        (),
    ),
    "z76_kaplan_meier": (
        "one keyed aggregate for spans; the life-table windows run "
        "over |distinct durations| rows (model-sized, single "
        "partition by design); 1-row horizon broadcast is the scalar "
        "crossJoin idiom",
        ("BroadcastNestedLoopJoin", SP_SORT_OK),
    ),
    "za73_triangle_stats": (
        "collapsed path: quotient-graph enumeration + closed-form "
        "expansion; shuffles carry class ids and (node, cls) rows, "
        "never clique-sized pair sets",
        (),
    ),
    "z77_silhouette": (
        "literal-centroid distances in one narrow codegen pass; "
        "|k|-row aggregate",
        (),
    ),
    "z78_davies_bouldin": (
        "same one-pass scatter aggregate + |k|^2 broadcast literal "
        "join",
        (),
    ),
    "z79_isolation_scores": (
        "literal random-cut trees as nested CASEs in one narrow "
        "projection — no shuffle, no UDF, no join",
        (),
    ),
    "z80_quantile_norm": (
        "per-source rank window + one global sort window over the "
        "score projection + two integer lerp joins; 1-row n is the "
        "scalar crossJoin idiom",
        ("BroadcastNestedLoopJoin",),
    ),
    "z81_char_entropy": (
        "character stream shuffles once into (id, char) counts; one "
        "per-doc aggregate",
        (),
    ),
    "z82_mutual_knn": (
        "z30's blocked-join budget + one id-pair reciprocity "
        "self-join; vectors never cross it",
        (),
    ),
    "z83_shipping_priority": (
        "TPC-H Q3: dimensions broadcast against the fact scan, date "
        "filters pushed, grouped agg + TakeOrderedAndProject",
        (),
    ),
    "z84_returned_item_losses": (
        "TPC-H Q10: selective fact filter pushed; broadcast "
        "dimensions; grouped top-20",
        (),
    ),
    "z85_small_qty_revenue": (
        "TPC-H Q17: correlated aggregate decorrelated to one "
        "per-part aggregate joined back on the key",
        (),
    ),
    "z86_market_basket": (
        "basket-key self-join (pairs only within a basket, "
        "mega-basket cap) + three hash aggregates; totals broadcast",
        ("BroadcastNestedLoopJoin",),
    ),
    "z87_chi2_tokens": (
        "one tokenize shuffle into (token, class) presence counts; "
        "model-sized |V|x|classes| grid; TakeOrderedAndProject "
        "top-k; |classes|-row broadcast",
        ("BroadcastNestedLoopJoin",),
    ),
    "z88_incremental_agg": (
        "both sides partial-aggregate map-side; the merge is one "
        "|groups|-sized full-outer join",
        (),
    ),
    "z89_scd2_history": (
        "one entity-key shuffle shared by the lag change-flag and "
        "lead interval-close windows",
        (),
    ),
    "z90_ab_ztest": (
        "one keyed user aggregate + 2-row group aggregate; final row "
        "is the scalar crossJoin idiom",
        ("BroadcastNestedLoopJoin",),
    ),
    "z91_theil_sen_trend": (
        "within-key pair join over bucket-count rows "
        "(granularity-bounded), exact-percentile aggregate",
        (),
    ),
    "z92_seasonality_strength": (
        "two keyed aggregates after the hourly reduction",
        (),
    ),
    "z93_pareto_abc": (
        "per-unit reduction + range-partitioned global ranking + "
        "one |units|-row cumulative window; 1-row total crossJoin",
        ("BroadcastNestedLoopJoin",),
    ),
    "z94_gini_revenue": (
        "per-unit reduction + range-partitioned ranking + one "
        "aggregate",
        (),
    ),
    "z95_lexical_richness": (
        "one token-stream shuffle, one frequency-spectrum aggregate",
        (),
    ),
    "z96_record_linkage": (
        "blocked fuzzy candidates + two id equi-joins + codegen "
        "weight algebra",
        (),
    ),
    "z97_dp_noisy_counts": (
        "one grouped count + one hash expression per group row",
        (),
    ),
    "z98_poisson_bootstrap": (
        "replica explode is map-side narrow rows; (key, replica) "
        "aggregate + exact percentile over |replicas| means",
        (),
    ),
    "z99_waiting_suppliers": (
        "TPC-H Q21: EXISTS/NOT-EXISTS as one left-semi + per-order "
        "max-excluding-self aggregates over per-supplier maxes; no "
        "per-row subqueries, no nested loops",
        (),
    ),
    "za01_markov_attribution": (
        "one journey window pass + transition aggregate; scenario "
        "grid and 12 iteration rounds are model-sized broadcast "
        "joins",
        ("BroadcastNestedLoopJoin",),
    ),
    "za02_geohash_cells": (
        "closed-form Morton interleave + base32 in one codegen "
        "projection",
        (),
    ),
    "za03_geo_radius_pairs": (
        "lat/lon cell equi-join with 3x3 one-side replication; "
        "exact haversine verify; no cross-cell candidates",
        (),
    ),
    "za04_kde_density": (
        "|grid| unrolled kernel sums with map-side combine; one "
        "shuffle of (key, value)",
        (),
    ),
    "za05_wilson_intervals": (
        "one user-key window pass + keyed aggregate + scalar algebra",
        (),
    ),
    "za06_ols_trend": (
        "per-key centering window + one moments aggregate",
        (),
    ),
    "za07_ks_two_sample": (
        "one shuffle into per-value counts; two same-ordered "
        "cumulative windows over distinct values; 1-row totals "
        "crossJoin",
        ("BroadcastNestedLoopJoin",),
    ),
    "za33_bfs_distances": (
        "per level one node-keyed equi-join + distinct + visited "
        "anti-join; frontiers localCheckpoint'd (final plan unions "
        "materialized level RDDs)",
        (),
    ),
    "za09_textrank_keywords": (
        "zip_with adjacency explode + one graph aggregate "
        "(checkpointed); 5 rounds of word-keyed equi-join + hash "
        "aggregate on (word, double); TakeOrdered top-20",
        (),
    ),
    "za32_prefix_jaccard_pairs": (
        "freq aggregate + shingle-keyed annotate join + per-doc "
        "window prefix cut + prefix self-equi-join with length "
        "filter; exact array_intersect verify on candidate ids only",
        (),
    ),
    "za36_salted_skew_join": (
        "(type, salt)-keyed ShuffledHashJoin with 8x exploded dim; "
        "codegen xxhash64 salt; independent user-keyed aggregate",
        (),
    ),
    "za34_maxsim_topk": (
        "map-side corpus scan x broadcast 3-probe set (intended, as "
        "q27); static 8x8 slice-cosine grid in one JVM expression; "
        "only shuffle is the per-probe top-k window",
        ("BroadcastNestedLoopJoin",),
    ),
    "za13_sequential_patterns": (
        "one per-user lead window + one pattern hash aggregate with "
        "distinct-user count — two shuffles regardless of n-gram "
        "length",
        (),
    ),
    "za14_active_coverage": (
        "one per-user sort shared by both window passes + island "
        "aggregate + key aggregate; exact BIGINT microseconds; no "
        "time-range self-join",
        (),
    ),
    "za15_rfm_segments": (
        "orders aggregate + three range partitionings of the small "
        "customer table (scale-safe global rank, never a single-task "
        "window) + (r,f,m) hash aggregate; 1-row anchor/count "
        "broadcasts",
        ("BroadcastNestedLoopJoin",),
    ),
    "za74_logistic_gd": (
        "aggregate-only training: per GD step one scan with map-side "
        "partial gradient sums; data rows never shuffle; model state "
        "is 4 driver doubles folded back as literals",
        (),
    ),
    "za17_holt_trend": (
        "(key, hour) pre-aggregate BEFORE the Python stage; "
        "sequential recurrence in Arrow-batched applyInPandas (FlatMap"
        "GroupsInPandas), keys distributed",
        (),
    ),
    "za43_skyline": (
        "one (key)-partitioned sort feeds both window passes "
        "(strictly-earlier RANGE frame + same-ord MAX); no self-join "
        "— the quadratic NOT-EXISTS truth exists only oracle-side",
        (),
    ),
    "za82_item_cf": (
        "basket-capped pair generation as ONE self-equi-join on the "
        "basket key (fan-out quadratic in basket size, never corpus "
        "size); norms join back on item ids; global top-100 is "
        "TakeOrderedAndProject, no single-task sort",
        (),
    ),
    "za38_histogram_split": (
        "XGBoost histogram trick: one explode + one map-side-"
        "combinable hash aggregate down to |features|x|bins| rows; "
        "the split search windows over the tiny histogram only",
        (),
    ),
    "za40_target_encoding": (
        "one hash aggregate to |cat|xK rows; the global prior is a "
        "1-row broadcast (the nested-loop join is a scalar "
        "cross-join by construction)",
        ("BroadcastNestedLoopJoin",),
    ),
    "za47_psi_drift": (
        "two count aggregates to |bins| rows + one full-outer bin "
        "join; the cross-bin PSI reduction is a quantized BIGINT sum "
        "— the 100 TB cost is the two scans",
        (),
    ),
    "za48_lof_outliers": (
        "blocked kNN join (pairs only within label blocks) + three "
        "id-keyed equi-joins carrying (id, BIGINT) edges; top-20 via "
        "TakeOrderedAndProject",
        (),
    ),
    "za72_isotonic_calibration": (
        "one data pass to an 11-row histogram; the O(B^2)/O(B^3) "
        "minimax joins are over BINS only — the cartesians are "
        "11x11 rows by construction, constant at any corpus scale"
        "; the SinglePartition sorts run over the 11-row bin table",
        ("CartesianProduct", "BroadcastNestedLoopJoin", SP_SORT_OK),
    ),
    "za49_cuped_lift": (
        "one groupBy to |users| rows + one six-moment global "
        "aggregate of DECIMAL-exact sums; nothing downstream is "
        "data-sized",
        (),
    ),
    "za90_pii_redaction": (
        "PII scan/redact is ONE narrow whole-stage-codegen projection "
        "(3 regexp_count + 3 regexp_replace + md5) straight off the "
        "scan; no shuffle, bodies reduced to counts + a 32-char hash",
        (),
    ),
    "q44_sessionization": (
        "one user-hash exchange reused by the lag window, the "
        "cumulative sum, and the (user, session) aggregate; shuffled "
        "rows are (user, long, id, type) only",
        (),
    ),
    "za91_feature_hashing": (
        "token explode feeds ONE vocab-sized map-side-combinable "
        "count; md5 index/sign computed once per DISTINCT token; "
        "bodies never shuffle",
        (),
    ),
    "q29_event_disorder": (
        "one key-partitioned running-max window; exact quantiles via "
        "the mergeable 4096-bin histogram (map-side-combinable bin "
        "counts; cum window over <=4096 rows) + a within-target-bin "
        "distinct-value rank PARTITIONED BY BIN — no n-scaled global "
        "window anywhere; the BNLJs are the 1-ROW stat broadcasts"
        "; the SinglePartition sorts fold <=4096-bin histograms",
        ("BroadcastNestedLoopJoin", SP_SORT_OK),
    ),
    "za53_negative_sampling": (
        "one k-explode hash projection per pair + a 1-row corpus "
        "count broadcast (the conditionless BNLJ); no RNG state, no "
        "second corpus pass",
        ("BroadcastNestedLoopJoin",),
    ),
    "q27_stratified_hash_sample": (
        "one narrow projection (md5 threshold per stratum), no "
        "shuffle, no fit pass - the portable sampleBy",
        (),
    ),
    "za54_hll_shard_merge": (
        "shard-keyed register aggregate (<= shards x 2^p rows) -> "
        "bucket max-merge -> 1-row estimates; raw data shuffles once "
        "as (source, bucket, rho) ints - the BNLJs are the "
        "conditionless 1-ROW estimate broadcasts",
        ("BroadcastNestedLoopJoin",),
    ),
    "q07_grouped_quantiles": (
        "two group-keyed map-side-combinable aggregates; the per-group "
        "CDF window and quantile lookup run on |groups| x n_bins rows",
        (),
    ),
    "q17_join_skew_stats": (
        "preflight never performs the join: two count aggregates, a "
        "|keys|-row join of count tables, a 1-row roll-up - the BNLJ "
        "is the conditionless 1-ROW x 1-ROW (totals x top-k) "
        "broadcast merge, the scalar-broadcast idiom",
        ("BroadcastNestedLoopJoin",),
    ),
    "za52_zipf_fit": (
        "one map-side-combinable token count + top-N rank window over "
        "|vocab| rows + 1-row OLS moments; bodies never shuffle",
        (),
    ),
    "q32_compaction_plan": (
        "the plan runs on the metadata listing only: one sort + one "
        "running-sum window + one aggregate; data files never move "
        "in the planning job"
        "; the SinglePartition sort orders the metadata file listing (|files|, not |rows|)",
        (SP_SORT_OK,),
    ),
    "za92_histogram_quantiles": (
        "two narrow passes (extrema broadcast, bin counts with "
        "map-side combine); CDF window + quantile lookup run on "
        "<= n_bins rows — the BNLJ is the 1-ROW (lo, hi, n) extrema "
        "broadcast joined conditionless onto the scan, the same "
        "scalar-broadcast idiom as the norm joins"
        "; the SinglePartition sort folds <= n_bins rows",
        ("BroadcastNestedLoopJoin", SP_SORT_OK),
    ),
    "za44_expectations": (
        "rule battery is narrow codegen over the scan; the BNLJ is the "
        "1-row totals crossJoin (scalar idiom, plan shows Keys: [] "
        "aggregate build)",
        ("BroadcastNestedLoopJoin",),
    ),
    "za66_dsir_weights": (
        "hashed n-gram importance weights: vocab-sized model joins; the "
        "BNLJ is the 1-row normalizer crossJoin (scalar idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "za59_training_corpus": (
        "9-stage corpus composition: every BNLJ in the union is a 1-row "
        "total/normalizer crossJoin (all builds are Keys: [] aggregates, "
        "rowCount=1 in the AQE stats); doc-id set joins between stages "
        "are broadcast HASH semi/anti-joins, not nested loops",
        ("BroadcastNestedLoopJoin",),
    ),
    "q51_semi_anti_customers": (
        "semi/anti joins broadcast the filtered order keys; the BNLJ is "
        "the 1-row count crossJoin of the summary row (scalar idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "q98_dedup_candidate_prf": (
        "PRF fold of the pair generator vs truth: two 1-row count "
        "crossJoins (scalar idiom) — candidate/truth sets join on id "
        "pairs, never cross",
        ("BroadcastNestedLoopJoin",),
    ),
    "z19_ivf_pq_recall": (
        "recall@10 harness: inherits za24's sanctioned brute-force "
        "ground-truth product (broadcast TINY probe set x corpus — the "
        "intended exact baseline) on both the index and truth branches",
        ("BroadcastNestedLoopJoin",),
    ),
    "z20_multiprobe_recall": (
        "same recall harness as z19: the BNLJs are za24's broadcast "
        "tiny-probe exact baseline, by design",
        ("BroadcastNestedLoopJoin",),
    ),
    "z31_ann_recall": (
        "same recall harness as z19/z20: BNLJs are the sanctioned "
        "tiny-probe brute-force truth product",
        ("BroadcastNestedLoopJoin",),
    ),
    "z51_vocab_coverage": (
        "coverage vs a TakeOrdered top-k vocab; the BNLJ is the 1-row "
        "total-token crossJoin (scalar idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "z54_pmi_bigrams": (
        "PMI: bigram/unigram model tables join on token keys; the two "
        "BNLJs are 1-row corpus-total crossJoins (scalar idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "za18_rrf_fusion": (
        "RRF fusion: recency prior ranks the 50 newest docs ONCE "
        "(TakeOrderedAndProject, query-independent) then crosses the "
        "50-row list with the broadcast |queries|-row id set — both "
        "cross sides constant-bounded; the other BNLJ is BM25's 1-row "
        "stats crossJoin; the 50-row rank window is post-limit bounded",
        ("BroadcastNestedLoopJoin", SP_SORT_OK),
    ),
    "za21_skew_profile": (
        "join-skew preflight: per-key count tables only; the BNLJ is "
        "the 1-row totals crossJoin (scalar idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "za39_conformal_band": (
        "conformal band: q-hat is the rn == k(n_cal) row of the "
        "range-partitioned global ranking — a 1-ROW table by "
        "construction; both BNLJs broadcast that scalar state "
        "(n_cal, q_hat) onto the eval reduction",
        ("BroadcastNestedLoopJoin",),
    ),
    "q09_l_diversity": (
        "l-diversity: one (class, sensitive-value) hash aggregate with "
        "map-side partials + one |classes x values|-row reduction — no "
        "windows, no joins, payloads never shuffle",
        (),
    ),
    "q10_stream_dedup": (
        "streaming dedup equivalence: the harness writes three "
        "ts-filtered chunk files (filters pushed to the scan) and the "
        "dedup state machinery runs at STREAM time; the returned frame "
        "is a plain parquet scan of the drained sink + sort",
        (),
    ),
    "q11_keyed_ks_drift": (
        "keyed KS battery: one (key, value) hash aggregate pools ties; "
        "per-key cumulative windows PARTITIONED BY KEY (never "
        "SinglePartition); |keys|-row decision output",
        (),
    ),
    "q16_delta_time_travel": (
        "real-format Delta time travel: the version-1 snapshot "
        "resolves driver-side from the _delta_log (decode, replay); "
        "the plan is a PLAIN parquet scan of that snapshot's "
        "immutable files + one hash aggregate — no log join",
        (),
    ),
    "q08_wasserstein_shift": (
        "W1 distance: per-value pooling join + the range-partitioned "
        "cumulative-sum pass (round-9 scale fix — no single-task "
        "window); the BNLJ is the 1-row (na, nb) totals broadcast "
        "(Keys: [] aggregate build — the sanctioned scalar crossJoin "
        "idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "q22_stream_running_totals": (
        "streaming running-totals equivalence: the cents-exact "
        "accumulation ran at STREAM time (applyInPandasWithState, "
        "3-number state per key); the returned frame scans the "
        "drained memory sink with one keyed final-snapshot window",
        (),
    ),
    "q23_stream_kmv_distinct": (
        "streaming KMV-sketch equivalence: the bottom-k hash state "
        "ran at STREAM time; the returned frame scans the drained "
        "memory sink with one keyed final-snapshot window",
        (),
    ),
    "q39_jsonl_roundtrip": (
        "JSONL round trip: narrow JVM-codec write + schema'd "
        "DROPMALFORMED read (both embarrassingly parallel); one "
        "|sources|-row aggregate with map-side partials",
        (),
    ),
    "q49_csv_roundtrip": (
        "RFC-4180 CSV round trip: multiLine read is per-file "
        "parallel (non-splittable by design — documented); one "
        "|sources|-row aggregate with map-side partials",
        (),
    ),
    "q20_weighted_quantiles": (
        "exact weighted quantiles: one value-keyed hash aggregate "
        "pools duplicates; the cumulative mass is the range-"
        "partitioned global_cumulative_sums (never a single-task "
        "window); the BNLJs are the 1-row total broadcast (sanctioned "
        "crossJoin idiom) and the offsets broadcast",
        ("BroadcastNestedLoopJoin",),
    ),
    "q45_delta_restore": (
        "real-format Delta RESTORE: the restore commit is driver-side "
        "log surgery (file-list diff + footer reads); the read-back "
        "plan is a plain parquet scan of the restored snapshot + one "
        "hash aggregate — no log join",
        (),
    ),
    "q21_bh_fdr_drift": (
        "BH step-up over the keyed-KS battery: per-key windows "
        "PARTITIONED BY KEY; the |tests|-row p-value ranking is the "
        "range-partitioned global_row_number (never a single-task "
        "sort); the BNLJs are the 1-row m / i* scalar broadcasts "
        "(the sanctioned crossJoin idiom)",
        ("BroadcastNestedLoopJoin",),
    ),
    "za80_lapsed_high_value": (
        "scalar balance threshold = the sanctioned 1-row broadcast "
        "crossJoin (plans as BNLJ); existence test is a LEFT ANTI "
        "hash join against the date-pruned orders scan",
        ("BroadcastNestedLoopJoin",),
    ),
    "za77_volume_shipping": (
        "6-table join: all dims broadcast, fact scan takes the pushed "
        "shipdate range; one hash agg",
        (),
    ),
    "q12_market_share": (
        "7-table snowflake, nation in two roles, all dims broadcast; "
        "conditional-sum share per year",
        (),
    ),
    "za79_large_volume_customers": (
        "HAVING over the order-grain aggregate first; dims broadcast; "
        "TakeOrderedAndProject top-100",
        (),
    ),
    "q25_bloom_prefilter_join": (
        "bloom membership is a scan-local Arrow gather (driver bitmask "
        "64 KiB); only surviving fact rows reach the join",
        (),
    ),
    "q28_jaro_winkler_linkage": (
        "(lang, source) equi-join blocking; JW comparator Arrow-batched "
        "on candidates only; shuffles carry 40-char prefixes",
        (),
    ),
    "q36_stream_ewma_drift": (
        "state machinery ran at STREAM time (applyInPandasWithState, "
        "3 scalars per key); returned frame scans the drained memory "
        "sink with one projection",
        (),
    ),
    "q50_stream_index_refresh": (
        "stream-refreshed IVF-PQ: per-batch encode is a narrow Arrow "
        "projection at STREAM time; the returned query joins broadcast "
        "probe fan-out against base-plus-increment code scans",
        (),
    ),
    # round-12 wave ------------------------------------------------------
    "q05_local_supplier_volume": (
        "TPC-H Q5 snowflake: region→nation prune broadcasts, orders "
        "date filter pushes to the fact scan; the only big shuffles "
        "are the two fact-key joins",
        (),
    ),
    "q38_forecast_revenue": (
        "TPC-H Q6: every predicate pushed into one parquet scan, "
        "map-side partial sums, 1-row output",
        (),
    ),
    "q13_customer_distribution": (
        "TPC-H Q13: LEFT OUTER with the priority predicate in the "
        "join condition (not a post-filter); one outer shuffle on "
        "custkey then two hash aggs",
        (),
    ),
    "q14_top_supplier": (
        "TPC-H Q15: revenue per supplier once, max as a 1-row "
        "broadcast back-join (the sanctioned scalar crossJoin), ties "
        "kept",
        ("BroadcastNestedLoopJoin",),
    ),
    "q34_delta_dv_change_feed": (
        "log-derived CDF: per commit only CHANGED files scanned; DV "
        "row-position deltas ride broadcast semi/anti joins on "
        "(_metadata.file_path, row_index)",
        ("BroadcastNestedLoopJoin",),
    ),
    "q04_min_cost_supplier": (
        "TPC-H Q2 decorrelated: partsupp DERIVED via the sanctioned "
        "4-row broadcast crossJoin over the part scan (plans as BNLJ); "
        "region-pruned supplier dims broadcast; per-part min and the "
        "(part, cost) equality join back are the only shuffles",
        ("BroadcastNestedLoopJoin",),
    ),
    "za83_product_profit": (
        "TPC-H Q9: part/supplier/nation/partsupp all broadcast into "
        "the fact (partsupp derived via the 4-row broadcast "
        "crossJoin); the one big shuffle is lineitem⋈orders",
        ("BroadcastNestedLoopJoin",),
    ),
    "za84_important_stock": (
        "TPC-H Q11: grouped value + the HAVING scalar as a 1-row "
        "broadcast crossJoin (sanctioned BNLJ); partsupp derived via "
        "the 4-row broadcast crossJoin",
        ("BroadcastNestedLoopJoin",),
    ),
    "za85_parts_supplier_relationship": (
        "TPC-H Q16: NOT IN as broadcast LEFT ANTI; part attrs "
        "broadcast; one count-distinct shuffle (partsupp derived via "
        "the 4-row broadcast crossJoin)",
        ("BroadcastNestedLoopJoin",),
    ),
    "za86_excess_stock_suppliers": (
        "TPC-H Q20 decorrelated: year-pruned lineitem group-by is the "
        "only big shuffle; part list + excess supplier set broadcast "
        "(partsupp derived via the 4-row broadcast crossJoin)",
        ("BroadcastNestedLoopJoin",),
    ),
    "za87_stream_cdf": (
        "incremental CDF consumption happened at STREAM time (bounded "
        "version windows, per-version overwrite); the returned frame "
        "is one partition-pruned scan of the accumulated output",
        (),
    ),
    "q19_delta_id_mapping": (
        "columnMapping=id read: same one-basePath-scan + hash-agg "
        "shape as the unmapped table; field-id resolution happens "
        "inside the parquet reader's schema clipping",
        (),
    ),
    "q33_delta_type_widening": (
        "typeWidening round trip: metadata-only widen commits, then "
        "the same pruned scans as any read (narrow files upcast in "
        "the parquet reader); one global agg",
        (),
    ),
    "za89_lpa_quotient": (
        "quotient LPA: class-map joins + distinct on class pairs, "
        "then label rounds on quotient-sized tables; one member "
        "fan-back join",
        (),
    ),
    "q26_stream_sessions": (
        "streaming session equivalence: the merging-session state "
        "machinery ran at STREAM time (append mode, watermark "
        "eviction); the returned frame is a plain scan of the "
        "drained memory sink + a date_format projection",
        (),
    ),
    "q35_stream_spacesaving": (
        "streaming Space-Saving equivalence: the sketch state ran "
        "at STREAM time (applyInPandasWithState, bounded k-counter "
        "state); the returned frame scans the drained memory sink "
        "with one |batches x keys x k|-row keyed window picking the "
        "final snapshot",
        (),
    ),
}

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")


# ---------------------------------------------------------------------------
# Operator-level default-argument plans (round-9 verdict #1): every
# PUBLIC pair-generating operator, called with its DEFAULT arguments on
# a tiny in-memory frame, must plan without a CartesianProduct — the
# registry audit alone can't prove this (queries may pass safe
# arguments a library user wouldn't). Builders return the DataFrame;
# `allowed` whitelists by-design shapes exactly like AUDIT.
# embedding_near_duplicates is the one operator whose default is a
# RAISE (block_col required unless allow_full_cross=True) — encoded as
# the special `raises` marker and asserted, not planned.
# ---------------------------------------------------------------------------

_OPDOCS = [
    (i, f"w{i % 7} x{i % 5} common tokens here doc body {i} "
        f"plus shared shingle stream alpha beta gamma {i % 3}")
    for i in range(40)
]
_OPVECS = [
    (i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(4)], i % 3)
    for i in range(30)
]


def _docs(spark):
    return spark.createDataFrame(_OPDOCS, "doc_id long, text string")


def _vecs(spark):
    return spark.createDataFrame(
        _OPVECS, "vec_id long, embedding array<double>, label int"
    )


def _op_exact_duplicates(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        exact_duplicates,
    )

    return exact_duplicates(_docs(spark))


def _op_ngram_jaccard_pairs(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    return ngram_jaccard_pairs(_docs(spark))


def _op_containment_pairs(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        containment_pairs,
    )

    return containment_pairs(_docs(spark))


def _op_minhash_lsh_candidate_pairs(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        minhash_lsh_candidate_pairs,
    )

    return minhash_lsh_candidate_pairs(_docs(spark))


def _op_simhash_pairs(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        simhash_column,
        simhash_pairs,
    )

    d = _docs(spark).select(
        "doc_id", simhash_column("text").alias("simhash")
    )
    return simhash_pairs(d)


def _op_winnow_near_duplicates(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        winnow_near_duplicates,
    )

    return winnow_near_duplicates(_docs(spark))


def _op_edit_similarity_pairs(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        edit_similarity_pairs,
    )
    from pyspark.sql import functions as F  # noqa: F401

    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    return edit_similarity_pairs(pairs, _docs(spark))


def _op_knn_join_blocked(spark):
    from computer_vision_foundations_spark.operators.similarity import (
        knn_join_blocked,
    )

    return knn_join_blocked(_vecs(spark))


def _op_mutual_knn_pairs(spark):
    from computer_vision_foundations_spark.operators.similarity import (
        mutual_knn_pairs,
    )

    return mutual_knn_pairs(_vecs(spark))


def _op_lsh_bucketed_knn(spark):
    from computer_vision_foundations_spark.operators.similarity import (
        lsh_bucketed_knn,
    )

    v = _vecs(spark)
    return lsh_bucketed_knn(v, v.limit(5), dim=4)


def _op_multiprobe_lsh_knn(spark):
    from computer_vision_foundations_spark.operators.similarity import (
        multiprobe_lsh_knn,
    )

    v = _vecs(spark)
    return multiprobe_lsh_knn(v, v.limit(5), dim=4)


def _op_ivf_flat_knn(spark):
    from computer_vision_foundations_spark.operators.similarity import (
        ivf_flat_knn,
    )

    v = _vecs(spark)
    return ivf_flat_knn(v, v.limit(5), dim=4)


def _op_brute_force_knn(spark):
    from computer_vision_foundations_spark.operators.similarity import (
        brute_force_knn,
    )

    v = _vecs(spark)
    return brute_force_knn(v, v.limit(5))


def _op_embedding_near_duplicates_raises(spark):
    from computer_vision_foundations_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    try:
        embedding_near_duplicates(_vecs(spark))
    except ValueError as e:
        if "allow_full_cross" in str(e):
            return None  # the contract: defaults refuse to plan O(n²)
        raise
    raise AssertionError(
        "embedding_near_duplicates(defaults) must raise — the no-block "
        "path plans a full cross product"
    )


# name -> (claim, allowed plan shapes, builder). A builder returning
# None asserts a refuse-to-plan contract instead of a plan.
OPERATOR_PLANS = {
    "op_exact_duplicates": (
        "defaults: one hash agg on 16-byte md5 keys", (), _op_exact_duplicates,
    ),
    "op_ngram_jaccard_pairs": (
        "defaults: shingle equi-join, hot-shingle cap ON (10k)",
        (), _op_ngram_jaccard_pairs,
    ),
    "op_containment_pairs": (
        "defaults: same shingle equi-join machinery as jaccard",
        (), _op_containment_pairs,
    ),
    "op_minhash_lsh_candidate_pairs": (
        "defaults: band-key equi-join, bucket cap ON (1k)",
        (), _op_minhash_lsh_candidate_pairs,
    ),
    "op_simhash_pairs": (
        "defaults: (band_idx, band_val) equi-join over DISTINCT "
        "fingerprints, band-freq cap ON (10k)",
        (), _op_simhash_pairs,
    ),
    "op_winnow_near_duplicates": (
        "defaults: fingerprint equi-join, doc-freq cap ON (10k)",
        (), _op_winnow_near_duplicates,
    ),
    "op_edit_similarity_pairs": (
        "defaults: two id-equi-joins re-attaching 200-char prefixes",
        (), _op_edit_similarity_pairs,
    ),
    "op_knn_join_blocked": (
        "defaults: within-block equi-join; vectors never cross blocks",
        (), _op_knn_join_blocked,
    ),
    "op_mutual_knn_pairs": (
        "defaults: blocked kNN + reversed-edge semi-join on id pairs",
        (), _op_mutual_knn_pairs,
    ),
    "op_lsh_bucketed_knn": (
        "defaults: (table, bucket) equi-join candidates",
        (), _op_lsh_bucketed_knn,
    ),
    "op_multiprobe_lsh_knn": (
        "defaults: probe fan-out x(1+n_flip), still a bucket equi-join",
        (), _op_multiprobe_lsh_knn,
    ),
    "op_ivf_flat_knn": (
        "defaults: cell equi-join, probes broadcast",
        (), _op_ivf_flat_knn,
    ),
    "op_brute_force_knn": (
        "brute-force kNN IS the all-pairs baseline BY DESIGN — broadcast "
        "nested loop with the tiny probe set built; the bucketed/IVF "
        "operators above are the scale paths",
        ("BroadcastNestedLoopJoin",), _op_brute_force_knn,
    ),
    "op_embedding_near_duplicates": (
        "defaults REFUSE to plan: block_col=None raises unless the "
        "caller opts into allow_full_cross=True — no CartesianProduct "
        "is reachable with default arguments",
        (), _op_embedding_near_duplicates_raises,
    ),
}


def run_plan_checks(
    plan: str, allowed: tuple[str, ...]
) -> tuple[list[str], int]:
    """The automated per-plan checks shared by the registry audit and
    the operator-level audit (and tests/test_operator_plans.py)."""
    checks: list[str] = []
    failures = 0
    for bad in FORBIDDEN:
        if bad in allowed:
            checks.append(f"- [x] {bad} present BY DESIGN (see note)")
            continue
        ok = bad not in plan
        checks.append(f"- [{'x' if ok else ' '}] no {bad}")
        failures += 0 if ok else 1
    sp_sites = singlepartition_sort_sites(plan)
    if sp_sites and SP_SORT_OK in allowed:
        checks.append(
            f"- [x] {len(sp_sites)} SinglePartition Sort site(s) "
            f"BOUNDED BY DESIGN (see note): {', '.join(sp_sites)}"
        )
    elif sp_sites:
        checks.append(
            "- [ ] Exchange SinglePartition feeding a Sort over "
            f"possibly data-sized input: {', '.join(sp_sites)}"
        )
        failures += 1
    else:
        checks.append(
            "- [x] no SinglePartition global Sort/Window over the data path"
        )
    if "BatchEvalPython" in plan:
        checks.append("- [ ] row-pickled Python UDF present (should be Arrow)")
        failures += 1
    elif "ArrowEvalPython" in plan or "MapInPandas" in plan:
        checks.append("- [x] Python stages are Arrow-batched")
    if "PushedFilters: [" in plan and "PushedFilters: []" not in plan:
        checks.append("- [x] filters pushed to scan")
    return checks, failures

# Whitelist token for the third rule: an Exchange SinglePartition that
# feeds a Sort (± Window) is the one-task global-sort shape that
# killed heaps_fit/abc_classes at scale (round-8 verdict #1/#2) — it
# is only acceptable when the sorted input is provably bounded (bin
# histograms, k rows after TakeOrderedAndProject, |classes|-sized
# folds). Queries that own such a bounded site annotate it here, with
# the bound stated in their claim text.

# middle part may contain parens inside bracketed attr lists
# (e.g. "ReusedExchange [count(1)#450L] (39)") but never ':'/'='
# (which mark detail lines, not tree lines); AQE-materialized stages
# append ", Statistics(sizeInBytes=…, rowCount=…)" after the id
_TREE_NODE = re.compile(
    r"^([ :+\-|]*)\*?\s*([A-Za-z][A-Za-z0-9_]*)([^:=]*?)\((\d+)\)"
    r"(?:,\s*Statistics\(.*\))?\s*$"
)
_DETAIL_HDR = re.compile(r"^\((\d+)\) Exchange\b")


def singlepartition_sort_sites(plan: str) -> list[str]:
    """Node ids of every ``Exchange SinglePartition`` whose tree
    parent is a Sort, labeled with what sits above the Sort
    (``Window`` = the one-task cumulative/rank shape, else a global
    one-task sort). 1-row final-aggregate SinglePartition exchanges
    (parent HashAggregate) are NOT flagged — those are scalar folds.
    """
    sp_ids: set[str] = set()
    cur: str | None = None
    for ln in plan.splitlines():
        m = _DETAIL_HDR.match(ln)
        if m:
            cur = m.group(1)
        elif ln.startswith("(") and ") " in ln[:8]:
            cur = None
        elif cur and "Arguments: SinglePartition" in ln:
            sp_ids.add(cur)
    # tree: parent = nearest preceding line with smaller indent
    tree: list[tuple[int, str, str]] = []
    for ln in plan.splitlines():
        if ln.startswith("("):  # detail header, not a tree line
            continue
        m = _TREE_NODE.match(ln)
        if m:
            tree.append((len(m.group(1)), m.group(2), m.group(4)))

    def parent_idx(idx: int) -> int | None:
        d = tree[idx][0]
        for j in range(idx - 1, -1, -1):
            if tree[j][0] < d:
                return j
        return None

    sites: list[str] = []
    for i, (d, name, nid) in enumerate(tree):
        if name != "Exchange" or nid not in sp_ids:
            continue
        pi = parent_idx(i)
        if pi is None or tree[pi][1] != "Sort":
            continue
        gi = parent_idx(pi)
        kind = (
            "Sort+Window"
            if gi is not None and tree[gi][1].startswith("Window")
            else "global Sort"
        )
        sites.append(f"{nid}:{kind}")
    return sites


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan_audit")
    qs = queries()
    out = [
        "# PLANS — physical-plan audit\n",
        f"Generated by `tools/plan_audit.py` over `{sf_dir}`. Each plan is the",
        "Catalyst `explain('formatted')` output; the checks below each plan are",
        "grepped automatically — regenerate after operator changes.\n",
    ]
    failures = 0
    # full-registry coverage: queries without a hand-written claim
    # still get every automated check — a violation can't hide in an
    # unaudited query (round-8 verdict #2).
    audited = dict(AUDIT)
    for name in qs:
        if name not in audited:
            audited[name] = (
                "no per-query claim recorded — automated checks only",
                (),
            )
    for name, (claim, allowed) in audited.items():
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        checks, fails = run_plan_checks(plan, allowed)
        failures += fails
        out.append(f"\n## {name}\n\n*{claim}*\n")
        out.extend(checks)
        out.append("\n```\n" + plan.strip() + "\n```\n")
        print(f"audited {name}", file=sys.stderr)
    out.append(
        "\n# Operator-level default-argument plans\n\n"
        "Every public pair-generating operator called with DEFAULT "
        "arguments on a tiny in-memory frame (round-9 verdict #1): no "
        "CartesianProduct may be reachable without an explicit opt-in. "
        "Plans below are truncated to the join skeleton; "
        "tests/test_operator_plans.py asserts the same checks in CI.\n"
    )
    for name, (claim, allowed, builder) in OPERATOR_PLANS.items():
        df = builder(spark)
        out.append(f"\n## {name}\n\n*{claim}*\n")
        if df is None:
            out.append(
                "- [x] defaults refuse to plan (ValueError) — contract "
                "asserted, nothing to audit"
            )
            print(f"audited {name} (refuse-to-plan)", file=sys.stderr)
            continue
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        checks, fails = run_plan_checks(plan, allowed)
        failures += fails
        out.extend(checks)
        skeleton = "\n".join(
            ln for ln in plan.splitlines()
            if any(t in ln for t in (
                "Join", "Cartesian", "Exchange", "Aggregate", "Window",
                "Sort", "Python", "InPandas",
            ))
        )
        out.append("\n```\n" + skeleton.strip() + "\n```\n")
        print(f"audited {name}", file=sys.stderr)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written; {failures} failed checks")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
