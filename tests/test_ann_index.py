"""Persisted IVF-PQ index (operators/ann_index.py): build/load/query
round trip, bit-equality with the in-memory operator, and the
partition-pruned scan shape."""

import os

import numpy as np
import pytest

from computer_vision_foundations_spark.operators.ann_index import (
    build_ivf_pq_index,
    load_index_meta,
    query_ivf_pq_index,
)
from computer_vision_foundations_spark.operators.quantization import (
    ivf_pq_topk,
    pq_codebooks,
)

DIM, N_SUB, N_CENT, N_CELLS = 16, 4, 8, 6


def _fixture(spark, n=80, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    cbs = pq_codebooks(DIM, N_SUB, N_CENT, seed=7)
    cents = [[float(x) for x in rng.normal(size=DIM)] for _ in range(N_CELLS)]
    return df, cbs, cents


def test_build_layout_and_meta(spark, tmp_path):
    df, cbs, cents = _fixture(spark)
    path = build_ivf_pq_index(df, str(tmp_path / "idx"), cbs, cents)
    assert os.path.exists(os.path.join(path, "META.json"))
    meta = load_index_meta(path)
    assert meta["n_cells"] == N_CELLS and meta["n_subvectors"] == N_SUB
    # codes parquet partitioned by cell
    parts = [d for d in os.listdir(os.path.join(path, "codes")) if d.startswith("_cell=")]
    assert len(parts) >= 2
    codes = spark.read.parquet(os.path.join(path, "codes"))
    assert codes.count() == 80
    assert set(codes.columns) == {"neighbor_id", "codes", "_cell"}


def test_query_matches_in_memory_operator(spark, tmp_path):
    df, cbs, cents = _fixture(spark)
    probes = df.filter("vec_id < 5")
    path = build_ivf_pq_index(df, str(tmp_path / "idx"), cbs, cents)
    from_index = sorted(
        map(tuple, query_ivf_pq_index(spark, path, probes, k=5, n_probe_cells=3).collect())
    )
    in_memory = sorted(
        map(tuple, ivf_pq_topk(df, probes, cbs, cents, k=5, n_probe_cells=3).collect())
    )
    assert from_index == in_memory  # bit-equal: same codes, same ADC math


def test_query_plan_prunes_partitions(spark, tmp_path):
    df, cbs, cents = _fixture(spark)
    probes = df.filter("vec_id = 0")
    path = build_ivf_pq_index(df, str(tmp_path / "idx"), cbs, cents)
    q = query_ivf_pq_index(spark, path, probes, k=5, n_probe_cells=2)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the cell equi-join against the partitioned table must plan a
    # dynamic partition-pruning subquery on _cell
    assert "dynamicpruning" in plan.lower()


def test_version_guard(tmp_path):
    os.makedirs(tmp_path / "bad", exist_ok=True)
    with open(tmp_path / "bad" / "META.json", "w") as fh:
        fh.write('{"version": 99}')
    with pytest.raises(ValueError):
        load_index_meta(str(tmp_path / "bad"))


def test_incremental_append_matches_batch_build(spark, tmp_path):
    """Index built over 1/3 of rows + two incremental appends ==
    index built over all rows in one shot, bit-for-bit — the frozen
    centroids/codebooks make the encode deterministic regardless of
    which batch a vector arrived in."""
    from computer_vision_foundations_spark.operators.ann_index import (
        append_to_ivf_pq_index,
        compact_index,
        index_cell_psi,
    )

    df, cbs, cents = _fixture(spark)
    probes = df.filter("vec_id < 5")
    full = build_ivf_pq_index(df, str(tmp_path / "full"), cbs, cents)
    want = sorted(
        map(
            tuple,
            query_ivf_pq_index(
                spark, full, probes, k=5, n_probe_cells=3
            ).collect(),
        )
    )

    inc = build_ivf_pq_index(
        df.filter("vec_id % 3 = 0"), str(tmp_path / "inc"), cbs, cents
    )
    append_to_ivf_pq_index(spark, inc, df.filter("vec_id % 3 = 1"), 0)
    append_to_ivf_pq_index(spark, inc, df.filter("vec_id % 3 = 2"), 1)
    got = sorted(
        map(
            tuple,
            query_ivf_pq_index(
                spark, inc, probes, k=5, n_probe_cells=3
            ).collect(),
        )
    )
    assert got == want
    # replaying a batch (at-least-once) is idempotent: same batch_id
    # overwrites its own partition, results unchanged
    append_to_ivf_pq_index(spark, inc, df.filter("vec_id % 3 = 1"), 0)
    again = sorted(
        map(
            tuple,
            query_ivf_pq_index(
                spark, inc, probes, k=5, n_probe_cells=3
            ).collect(),
        )
    )
    assert again == want
    # same-distribution increments: PSI far below the retrain bar
    assert index_cell_psi(spark, inc) < 0.25
    # compaction folds increments into the base scan, results unchanged
    assert compact_index(spark, inc) == 2
    assert not os.path.isdir(os.path.join(inc, "codes_inc"))
    after = sorted(
        map(
            tuple,
            query_ivf_pq_index(
                spark, inc, probes, k=5, n_probe_cells=3
            ).collect(),
        )
    )
    assert after == want
    assert compact_index(spark, inc) == 0  # nothing left to fold


def test_needs_retrain_fires_on_cell_drift(spark, tmp_path):
    """Increments concentrated in one cell (a shifted embedding
    distribution) push the cell-occupancy PSI past the threshold."""
    from computer_vision_foundations_spark.operators.ann_index import (
        append_to_ivf_pq_index,
        needs_retrain,
    )

    df, cbs, cents = _fixture(spark)
    path = build_ivf_pq_index(df, str(tmp_path / "idx"), cbs, cents)
    assert not needs_retrain(spark, path)
    # shove every new vector toward one centroid -> single-cell mass
    shifted = spark.createDataFrame(
        [
            (1000 + i, [float(x) + 0.01 * i for x in cents[0]])
            for i in range(60)
        ],
        "vec_id long, embedding array<float>",
    )
    append_to_ivf_pq_index(spark, path, shifted, 0)
    assert needs_retrain(spark, path)


def _build_with_increments(spark, tmp_path, name):
    """Index with a base build + 2 increment batches, and the expected
    query results (== a one-shot build over all rows)."""
    from computer_vision_foundations_spark.operators.ann_index import (
        append_to_ivf_pq_index,
    )

    df, cbs, cents = _fixture(spark)
    probes = df.filter("vec_id < 5")
    path = build_ivf_pq_index(
        df.filter("vec_id % 3 = 0"), str(tmp_path / name), cbs, cents
    )
    append_to_ivf_pq_index(spark, path, df.filter("vec_id % 3 = 1"), 0)
    append_to_ivf_pq_index(spark, path, df.filter("vec_id % 3 = 2"), 1)
    want = sorted(
        map(
            tuple,
            query_ivf_pq_index(
                spark, path, probes, k=5, n_probe_cells=3
            ).collect(),
        )
    )
    return path, probes, want


def _query(spark, path, probes):
    return sorted(
        map(
            tuple,
            query_ivf_pq_index(
                spark, path, probes, k=5, n_probe_cells=3
            ).collect(),
        )
    )


def _clean_index_dirs(path):
    return not any(
        os.path.isdir(os.path.join(path, d))
        for d in ("codes_old", "codes_compact_tmp", "codes_inc_folded")
    )


def test_compaction_crash_midswap_rolls_forward(spark, tmp_path):
    """Crash between the two swap renames (codes/ missing, complete
    tmp present): the next READER self-heals by promoting the merge
    (round-10 ADVICE — previously unrecoverable)."""
    import shutil

    from computer_vision_foundations_spark.operators.ann_index import (
        _folded_dir,
        _read_codes,
    )

    path, probes, want = _build_with_increments(spark, tmp_path, "fwd")
    # protocol steps 1-3 by hand, then "crash" before step 4
    merged = _read_codes(spark, path)
    tmp = os.path.join(path, "codes_compact_tmp")
    merged.write.mode("overwrite").partitionBy("_cell").parquet(tmp)
    os.rename(os.path.join(path, "codes_inc"), _folded_dir(path))
    os.rename(os.path.join(path, "codes"), os.path.join(path, "codes_old"))
    assert not os.path.isdir(os.path.join(path, "codes"))
    assert _query(spark, path, probes) == want  # reader heals
    assert os.path.isdir(os.path.join(path, "codes"))
    assert _clean_index_dirs(path)
    shutil.rmtree(path)


def test_compaction_crash_after_swap_drops_folded(spark, tmp_path):
    """Crash after the swap but before cleanup (codes/ is already the
    merge; codes_old + folded increments linger): queries must NOT
    double-count the folded rows, and the next compaction cleans up
    without re-folding."""
    from computer_vision_foundations_spark.operators.ann_index import (
        _folded_dir,
        _read_codes,
        compact_index,
    )

    path, probes, want = _build_with_increments(spark, tmp_path, "post")
    merged = _read_codes(spark, path)
    tmp = os.path.join(path, "codes_compact_tmp")
    merged.write.mode("overwrite").partitionBy("_cell").parquet(tmp)
    os.rename(os.path.join(path, "codes_inc"), _folded_dir(path))
    os.rename(os.path.join(path, "codes"), os.path.join(path, "codes_old"))
    os.rename(tmp, os.path.join(path, "codes"))
    # "crash" before removing codes_old / codes_inc_folded
    assert _query(spark, path, probes) == want  # no double count
    assert compact_index(spark, path) == 0  # nothing left to fold
    assert _clean_index_dirs(path)
    assert _query(spark, path, probes) == want


def test_compaction_crash_rolls_back_without_marker(spark, tmp_path):
    """Crash with an INCOMPLETE tmp after codes/ was renamed away:
    recovery rolls back to the base and un-folds the increments —
    nothing is lost, and a later compaction folds them for real."""
    import shutil

    from computer_vision_foundations_spark.operators.ann_index import (
        _folded_dir,
        compact_index,
    )

    path, probes, want = _build_with_increments(spark, tmp_path, "back")
    tmp = os.path.join(path, "codes_compact_tmp")
    os.makedirs(tmp)  # incomplete: no _SUCCESS
    os.rename(os.path.join(path, "codes_inc"), _folded_dir(path))
    os.rename(os.path.join(path, "codes"), os.path.join(path, "codes_old"))
    assert _query(spark, path, probes) == want  # rolled back, inc live
    assert os.path.isdir(os.path.join(path, "codes_inc"))
    assert _clean_index_dirs(path)
    assert compact_index(spark, path) == 2
    assert _query(spark, path, probes) == want
    shutil.rmtree(path)


def test_compaction_stale_complete_tmp_is_discarded(spark, tmp_path):
    """A complete tmp WITHOUT the fold marker may predate increment
    batches that arrived after it was computed — compaction must
    discard it and recompute, not promote it."""
    from computer_vision_foundations_spark.operators.ann_index import (
        _read_codes,
        append_to_ivf_pq_index,
        compact_index,
    )

    df, cbs, cents = _fixture(spark)
    probes = df.filter("vec_id < 5")
    path = build_ivf_pq_index(
        df.filter("vec_id % 3 = 0"), str(tmp_path / "stale"), cbs, cents
    )
    append_to_ivf_pq_index(spark, path, df.filter("vec_id % 3 = 1"), 0)
    # step 1 only: merge of base + batch 0, then "crash" before step 2
    merged = _read_codes(spark, path)
    merged.write.mode("overwrite").partitionBy("_cell").parquet(
        os.path.join(path, "codes_compact_tmp")
    )
    # a NEW batch lands after the stale merge
    append_to_ivf_pq_index(spark, path, df.filter("vec_id % 3 = 2"), 1)
    want = _query(spark, path, probes)
    assert compact_index(spark, path) == 2  # both batches, fresh merge
    assert _clean_index_dirs(path)
    assert _query(spark, path, probes) == want


def test_reader_heals_folded_increments(spark, tmp_path):
    """Crash between the fold-marker rename and the base swap (codes/
    still the OLD base, increments parked under codes_inc_folded,
    complete tmp): a plain READER must finish the swap rather than
    silently serving the base without any streamed increment
    (review finding)."""
    from computer_vision_foundations_spark.operators.ann_index import (
        _folded_dir,
        _read_codes,
    )

    path, probes, want = _build_with_increments(spark, tmp_path, "fold")
    merged = _read_codes(spark, path)
    tmp = os.path.join(path, "codes_compact_tmp")
    merged.write.mode("overwrite").partitionBy("_cell").parquet(tmp)
    os.rename(os.path.join(path, "codes_inc"), _folded_dir(path))
    # "crash" here: codes/ (old base) still present
    assert os.path.isdir(os.path.join(path, "codes"))
    assert _query(spark, path, probes) == want  # reader heals + swaps
    assert _clean_index_dirs(path)
    assert not os.path.isdir(os.path.join(path, "codes_inc"))


def test_reader_waits_for_live_compactor(spark, tmp_path):
    """A FRESH compactor lock + fold marker is a healthy mid-flight
    compaction (round-11 ADVICE): the reader must NOT perform the swap
    itself — it waits out the rename window and serves the result the
    live compactor publishes."""
    import shutil
    import threading
    import time

    from computer_vision_foundations_spark.operators.ann_index import (
        _folded_dir,
        _lock_path,
        _read_codes,
        _touch_lock,
    )

    path, probes, want = _build_with_increments(spark, tmp_path, "live")
    merged = _read_codes(spark, path)
    tmp = os.path.join(path, "codes_compact_tmp")
    merged.write.mode("overwrite").partitionBy("_cell").parquet(tmp)
    _touch_lock(path)
    os.rename(os.path.join(path, "codes_inc"), _folded_dir(path))
    swap_done = threading.Event()

    def finish_swap():
        time.sleep(0.5)
        os.rename(os.path.join(path, "codes"), os.path.join(path, "codes_old"))
        os.rename(tmp, os.path.join(path, "codes"))
        shutil.rmtree(os.path.join(path, "codes_old"), ignore_errors=True)
        shutil.rmtree(_folded_dir(path), ignore_errors=True)
        os.remove(_lock_path(path))
        swap_done.set()

    t = threading.Thread(target=finish_swap)
    t.start()
    try:
        assert _query(spark, path, probes) == want
        # the reader waited for the live compactor instead of swapping
        assert swap_done.is_set()
    finally:
        t.join()
    assert _clean_index_dirs(path)


def test_compact_refuses_live_concurrent_compactor(spark, tmp_path):
    from computer_vision_foundations_spark.operators.ann_index import (
        _touch_lock,
        compact_index,
    )

    path, _probes, _want = _build_with_increments(spark, tmp_path, "conc")
    _touch_lock(path)
    with pytest.raises(RuntimeError, match="single-writer"):
        compact_index(spark, path)


def test_stale_lock_reader_heals(spark, tmp_path):
    """A lock older than the TTL marks an ABANDONED compaction: the
    reader self-heals exactly as it did before the liveness gate."""
    import time

    from computer_vision_foundations_spark.operators.ann_index import (
        _folded_dir,
        _lock_path,
        _read_codes,
        _touch_lock,
    )

    path, probes, want = _build_with_increments(spark, tmp_path, "stale2")
    merged = _read_codes(spark, path)
    tmp = os.path.join(path, "codes_compact_tmp")
    merged.write.mode("overwrite").partitionBy("_cell").parquet(tmp)
    _touch_lock(path)
    os.rename(os.path.join(path, "codes_inc"), _folded_dir(path))
    os.rename(os.path.join(path, "codes"), os.path.join(path, "codes_old"))
    past = time.time() - 120.0
    os.utime(_lock_path(path), (past, past))
    assert _query(spark, path, probes) == want  # heals: lock is stale
    assert _clean_index_dirs(path)
