"""Persisted IVF-PQ index lifecycle: build once, query many.

The in-memory `quantization.ivf_pq_topk` re-encodes the corpus every
call; a real deployment encodes 100 TB ONCE and serves queries against
the stored codes. This module is that lifecycle:

    build_ivf_pq_index(corpus, path, ...)   # one encode pass → disk
    query_ivf_pq_index(spark, path, probes) # reads codes, not vectors

Layout::

    path/
      META.json            # centroids, codebooks, params, version
      codes/               # parquet, PARTITIONED BY _cell
        _cell=0/...parquet

Partitioning by cell is the load-bearing choice: the query's cell
equi-join against a cell-partitioned table lets Spark's dynamic
partition pruning skip every cell no probe fans out to — at
``n_probe_cells / n_cells`` selectivity the scan reads that fraction
of the FILES, not just of the rows. Codes are ~n_subvectors bytes per
vector, so the stored index is ~dim·4/n_subvectors× smaller than the
raw vectors; the floats are not stored at all.

Centroids/codebooks are model-sized JSON (n_cells·dim +
n_sub·n_centroids·sub_dim floats) — driver state, exactly like k-means
centroids. The ADC math is the oracle-verified `quantization` code
(q50); this module adds only persistence, so its tests assert
bit-equality of query results against the in-memory operator plus the
dynamic-pruning plan shape.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from computer_vision_foundations_spark.operators.quantization import (
    adc_topk_from_encoded,
    encode_cell_codes,
    probe_fanout,
)

__all__ = [
    "build_ivf_pq_index",
    "load_index_meta",
    "query_ivf_pq_index",
    "append_to_ivf_pq_index",
    "index_cell_psi",
    "needs_retrain",
    "compact_index",
]

_VERSION = 1

# compactor liveness (round-11 ADVICE): the fold marker is ALSO
# present mid-flight in a healthy compact_index run (between the fold
# rename and the swap), so reader-side self-heal must not fire — and
# race the live compactor's renames — just because the marker exists.
# The compactor holds a heartbeat lockfile; readers heal only when the
# lock is absent or stale (a genuinely abandoned swap), and otherwise
# WAIT OUT the rename window (milliseconds — the slow merge write
# happens before the marker appears).
_LOCK_NAME = "_compactor_lock"
_LOCK_TTL_S = 30.0


def _lock_path(path: str) -> str:
    return os.path.join(path, _LOCK_NAME)


def _touch_lock(path: str) -> None:
    import time

    with open(_lock_path(path), "w") as fh:
        json.dump({"pid": os.getpid(), "ts": time.time()}, fh)


def _lock_fresh(path: str) -> bool:
    import time

    try:
        age = time.time() - os.path.getmtime(_lock_path(path))
    except OSError:
        return False
    return age < _LOCK_TTL_S


def _await_live_compactor(path: str) -> bool:
    """Wait (bounded by the lock TTL) for a LIVE compactor to finish
    its swap; True when the index came back healthy (codes/ present,
    fold marker gone) without this reader touching anything."""
    import time

    deadline = time.time() + _LOCK_TTL_S

    def healthy() -> bool:
        return os.path.isdir(os.path.join(path, "codes")) and not (
            os.path.isdir(_folded_dir(path))
        )

    while time.time() < deadline and _lock_fresh(path):
        if healthy():
            return True
        time.sleep(0.05)
    return healthy()


def build_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Encode ``corpus`` and persist the index at ``path``; returns the
    path. Train ``centroids`` upstream with `clustering.kmeans_fit`
    (or seed them) and ``codebooks`` with `quantization.pq_codebooks`
    — both are recorded in META.json so queries need only the path."""
    os.makedirs(path, exist_ok=True)
    encoded = encode_cell_codes(corpus, codebooks, centroids, vec_col, id_col)
    encoded.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(path, "codes")
    )
    with open(os.path.join(path, "META.json"), "w") as fh:
        json.dump(
            {
                "version": _VERSION,
                "centroids": centroids,
                "codebooks": codebooks,
                "n_cells": len(centroids),
                "n_subvectors": len(codebooks),
                "n_centroids": len(codebooks[0]),
                "dim": len(centroids[0]),
                "id_col": id_col,
            },
            fh,
        )
    return path


def load_index_meta(path: str) -> dict:
    with open(os.path.join(path, "META.json")) as fh:
        meta = json.load(fh)
    if meta.get("version") != _VERSION:
        raise ValueError(f"unsupported index version: {meta.get('version')}")
    return meta


def _inc_dir(path: str) -> str:
    return os.path.join(path, "codes_inc")


def _folded_dir(path: str) -> str:
    return os.path.join(path, "codes_inc_folded")


def _unfold_increments(path: str) -> None:
    """Return folded increment batches to ``codes_inc`` on rollback.
    New batches may have been appended after the crash, so the dirs are
    moved one batch at a time; a batch id present on BOTH sides is the
    same data by the idempotent-replay contract (`append_to_ivf_pq_index`
    overwrites its own partition), so the live copy wins."""
    import shutil

    folded, inc = _folded_dir(path), _inc_dir(path)
    if not os.path.isdir(folded):
        return
    os.makedirs(inc, exist_ok=True)
    for b in os.listdir(folded):
        dst = os.path.join(inc, b)
        if os.path.exists(dst):
            shutil.rmtree(os.path.join(folded, b), ignore_errors=True)
        else:
            os.rename(os.path.join(folded, b), dst)
    shutil.rmtree(folded, ignore_errors=True)


def _recover_interrupted_swap(path: str) -> None:
    """Roll an interrupted `compact_index` forward or back so the index
    is always readable (round-10 ADVICE: a crash between the two swap
    renames left no ``codes/`` and no self-heal path).

    The compaction protocol (single compactor at a time — the same
    assumption Delta OPTIMIZE makes) is:

      1. write base∪increments → ``codes_compact_tmp`` (Spark emits
         ``_SUCCESS`` last, so its presence marks a COMPLETE merge)
      2. rename ``codes_inc`` → ``codes_inc_folded``  (fold marker)
      3. rename ``codes`` → ``codes_old``
      4. rename ``codes_compact_tmp`` → ``codes``
      5. remove ``codes_old`` and ``codes_inc_folded``

    Recovery decides from what survives: a complete tmp plus the fold
    marker means the merge already owns the increments (finish 3-5); a
    missing ``codes`` rolls forward from tmp or back from ``codes_old``
    (un-folding the marker so no increment is lost); a tmp without the
    fold marker is discarded — new increment batches may have landed
    after it was computed, so recompute is the only safe choice.

    Recovery may run from CONCURRENT readers (self-heal in
    `_read_codes`), so a lost rename race — the other healer already
    moved the source — is re-checked rather than propagated: if
    ``codes/`` exists afterwards, the index is healed and whoever
    moved it won."""
    import shutil

    codes = os.path.join(path, "codes")
    old = os.path.join(path, "codes_old")
    tmp = os.path.join(path, "codes_compact_tmp")
    folded = _folded_dir(path)
    tmp_complete = os.path.exists(os.path.join(tmp, "_SUCCESS"))
    try:
        if not os.path.isdir(codes):
            if tmp_complete:  # crashed between 3 and 4: roll forward
                os.rename(tmp, codes)
                shutil.rmtree(old, ignore_errors=True)
                shutil.rmtree(folded, ignore_errors=True)
            elif os.path.isdir(old):  # no usable merge: roll back
                os.rename(old, codes)
                _unfold_increments(path)
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                raise FileNotFoundError(
                    f"index at {path} has no codes/, no complete "
                    "codes_compact_tmp and no codes_old — unrecoverable"
                )
            return
        if os.path.isdir(folded):
            if tmp_complete:  # crashed between 2 and 3: finish swap
                shutil.rmtree(old, ignore_errors=True)
                os.rename(codes, old)
                os.rename(tmp, codes)
            # else: crashed between steps 4 and 5 — codes IS the
            # merge; either way the folded increments and old base
            # are dead
            shutil.rmtree(old, ignore_errors=True)
            shutil.rmtree(folded, ignore_errors=True)
            shutil.rmtree(tmp, ignore_errors=True)
            return
        # no fold marker: any tmp predates increments it cannot own
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
    except OSError:
        if os.path.isdir(codes) and not os.path.isdir(folded):
            return  # a concurrent healer finished the job first
        raise


def _read_codes(spark: SparkSession, path: str) -> DataFrame:
    """The live code set: the base build plus any streamed increments
    (``codes_inc/batch_id=N/_cell=M``). Both sides are cell-partitioned
    parquet; the increments carry an extra batch_id partition column
    that is dropped here. Dynamic partition pruning survives the
    union — the probed-cell subquery reaches BOTH scans
    (verified: two ``dynamicpruningexpression(_cell IN ...)``
    PartitionFilters in q50's plan) — so `compact_index` exists to
    bound the per-query FILE count as batch dirs accrete, not to
    restore pruning."""
    from pyspark.sql import functions as F

    if not os.path.isdir(os.path.join(path, "codes")) or os.path.isdir(
        _folded_dir(path)
    ):
        # an interrupted compaction swap can leave the base missing
        # (crash between the swap renames) OR the increments parked
        # under the fold marker with the OLD base still in place
        # (crash between fold and swap — without healing, readers
        # would silently serve the base minus every streamed
        # increment). Heal ONLY when no live compactor holds the
        # heartbeat lock (round-11 ADVICE: a healthy mid-flight
        # compaction also shows the fold marker, and a reader-side
        # swap would break the live compactor's renames); a fresh
        # lock means wait out the rename window instead.
        if not (_lock_fresh(path) and _await_live_compactor(path)):
            _recover_interrupted_swap(path)
    base = spark.read.parquet(os.path.join(path, "codes"))
    inc = _inc_dir(path)
    if not os.path.isdir(inc) or not any(
        e.startswith("batch_id=") for e in os.listdir(inc)
    ):
        return base
    extra = spark.read.parquet(inc).select(
        "neighbor_id", F.col("_cell").cast("int").alias("_cell"), "codes"
    )
    return base.select("neighbor_id", "_cell", "codes").unionByName(extra)


def append_to_ivf_pq_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    batch_id: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incrementally index a batch of NEW vectors: encode with the
    index's FROZEN centroids/codebooks (the standard IVF refresh —
    assignments stay comparable until a drift-triggered retrain) and
    write the codes under ``codes_inc/batch_id=N``, cell-partitioned
    like the base. ``mode("overwrite")`` of the batch's own partition
    makes the write idempotent under at-least-once replay — the same
    contract as the streaming upsert sink. The base build is never
    rewritten; `compact_index` folds increments in when the tail gets
    long, and `needs_retrain` watches cell-occupancy drift."""
    meta = load_index_meta(path)
    encoded = encode_cell_codes(
        new_vectors, meta["codebooks"], meta["centroids"], vec_col, id_col
    )
    encoded.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(_inc_dir(path), f"batch_id={int(batch_id)}")
    )


def index_cell_psi(spark: SparkSession, path: str) -> float:
    """Population Stability Index of the CELL-occupancy distribution,
    increments vs the base build (`operators/psi.psi_bins` over
    bin=_cell). Cells are the index's own coarse quantization of the
    embedding space, so occupancy drift is exactly the signal that the
    frozen centroids no longer tessellate the incoming distribution —
    the retrain trigger a continuously-fed ANN index needs. Reads the
    _cell column only (column-pruned scans of model-free code rows).
    Returns 0.0 when no increments exist."""
    from computer_vision_foundations_spark.operators.psi import psi_bins
    from pyspark.sql import functions as F

    inc = _inc_dir(path)
    if not os.path.isdir(inc) or not any(
        e.startswith("batch_id=") for e in os.listdir(inc)
    ):
        return 0.0
    base = spark.read.parquet(os.path.join(path, "codes")).select("_cell")
    cur = spark.read.parquet(inc).select("_cell")
    row = psi_bins(base, cur, F.col("_cell")).select("psi").limit(1).collect()
    return float(row[0]["psi"]) if row else 0.0


def needs_retrain(
    spark: SparkSession, path: str, psi_threshold: float = 0.25
) -> bool:
    """True when the increments' cell occupancy has shifted past the
    PSI threshold (0.25 = the standard 'distribution has moved' rule
    of thumb) — the caller should then re-train centroids/codebooks on
    a fresh sample and rebuild with `build_ivf_pq_index`; the codes
    themselves cannot be migrated (they quantize against the old
    geometry)."""
    return index_cell_psi(spark, path) > psi_threshold


def compact_index(spark: SparkSession, path: str) -> int:
    """Fold streamed increments into the base build: one shuffle-free
    rewrite of (base ∪ increments) partitioned by cell, atomically
    swapped in, increments removed. Returns the number of increment
    batches folded. Restores the single-scan dynamic-partition-pruning
    shape and bounds the per-query file count, exactly like a Delta
    OPTIMIZE over a streamed table."""
    import shutil

    if _lock_fresh(path):
        raise RuntimeError(
            f"another compactor holds a fresh {_LOCK_NAME} on {path}; "
            "compaction is single-writer (the same assumption Delta "
            "OPTIMIZE makes) — retry after it finishes or goes stale"
        )
    _touch_lock(path)
    try:
        # heal any interrupted previous compaction first (it may
        # already have folded — or rolled back — what this run would
        # fold); the stale-lock check above proved it is abandoned
        _recover_interrupted_swap(path)
        inc = _inc_dir(path)
        batches = (
            [e for e in os.listdir(inc) if e.startswith("batch_id=")]
            if os.path.isdir(inc)
            else []
        )
        if not batches:
            return 0
        merged = _read_codes(spark, path)
        tmp = os.path.join(path, "codes_compact_tmp")
        merged.write.mode("overwrite").partitionBy("_cell").parquet(tmp)
        # heartbeat before the rename window: the merge write above
        # can outlast the TTL, and readers must see a FRESH lock while
        # the fold marker exists
        _touch_lock(path)
        # fold marker BEFORE the swap: once codes_inc is renamed away,
        # the increments belong to the merge in tmp, so a crash at any
        # later point can neither double-count them (the old hazard:
        # swap done, rmtree(inc) not yet) nor lose them
        # (_recover_interrupted_swap un-folds on rollback); see the
        # protocol in its docstring
        os.rename(inc, _folded_dir(path))
        old = os.path.join(path, "codes_old")
        os.rename(os.path.join(path, "codes"), old)
        os.rename(tmp, os.path.join(path, "codes"))
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(_folded_dir(path), ignore_errors=True)
        return len(batches)
    finally:
        # removed on success AND on failure: a failed compactor is
        # abandoned by definition, so readers may heal immediately
        # rather than waiting out the TTL
        try:
            os.remove(_lock_path(path))
        except OSError:
            pass


def query_ivf_pq_index(
    spark: SparkSession,
    path: str,
    probes: DataFrame,
    k: int = 10,
    n_probe_cells: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_digits: int = 6,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Top-k ADC scan against a persisted index: reads the stored
    ``(neighbor_id, codes)`` rows for probed cells only (dynamic
    partition pruning via the broadcast cell equi-join) — the corpus
    vectors are never touched. Same output contract as
    `quantization.ivf_pq_topk`. Streamed increments (if any) are
    unioned in — see `_read_codes`."""
    meta = load_index_meta(path)
    codes = _read_codes(spark, path)
    p = probe_fanout(
        probes, meta["codebooks"], meta["centroids"], n_probe_cells,
        vec_col, id_col,
    )
    return adc_topk_from_encoded(
        codes,
        p,
        meta["n_subvectors"],
        meta["n_centroids"],
        k,
        round_digits,
        broadcast_probes,
    )
