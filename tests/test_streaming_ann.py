"""Streaming ANN serving (streaming/ann.py): availableNow drain of a
probe-vector file stream against the persisted IVF-PQ index —
bit-equality with the batch query, incremental drops, and
checkpointed no-replay restart."""

import os

import numpy as np

from computer_vision_foundations_spark.operators.ann_index import (
    build_ivf_pq_index,
    query_ivf_pq_index,
)
from computer_vision_foundations_spark.operators.quantization import (
    pq_codebooks,
)
from computer_vision_foundations_spark.streaming.ann import (
    run_streaming_ann,
)

DIM, N_SUB, N_CENT, N_CELLS = 16, 4, 8, 6


def _corpus(spark, n=80, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, DIM)).astype(np.float32)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    cbs = pq_codebooks(DIM, N_SUB, N_CENT, seed=7)
    cents = [[float(x) for x in rng.normal(size=DIM)] for _ in range(N_CELLS)]
    return df, cbs, cents


def _drop_probes(df, probe_dir, ids):
    df.filter(df.vec_id.isin(ids)).coalesce(1).write.mode(
        "append"
    ).parquet(probe_dir)


def _setup(spark, tmp_path):
    df, cbs, cents = _corpus(spark)
    index = build_ivf_pq_index(df, str(tmp_path / "idx"), cbs, cents)
    dirs = {
        "probes": str(tmp_path / "probes"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(dirs["probes"], exist_ok=True)
    return df, index, dirs


def test_stream_matches_batch_query(spark, tmp_path):
    df, index, d = _setup(spark, tmp_path)
    _drop_probes(df, d["probes"], [0, 1, 2])
    run_streaming_ann(
        spark, index, d["probes"], d["out"], d["ckpt"], k=5, n_probe_cells=3
    )
    got = sorted(
        map(
            tuple,
            spark.read.parquet(d["out"])
            .drop("batch_id")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            query_ivf_pq_index(
                spark, index, df.filter("vec_id in (0,1,2)"),
                k=5, n_probe_cells=3,
            ).collect(),
        )
    )
    assert got == want  # bit-equal: same codes, same ADC math


def test_incremental_drops_accumulate(spark, tmp_path):
    df, index, d = _setup(spark, tmp_path)
    _drop_probes(df, d["probes"], [0])
    run_streaming_ann(
        spark, index, d["probes"], d["out"], d["ckpt"], k=3, n_probe_cells=2
    )
    n1 = spark.read.parquet(d["out"]).count()
    _drop_probes(df, d["probes"], [1, 2])
    run_streaming_ann(
        spark, index, d["probes"], d["out"], d["ckpt"], k=3, n_probe_cells=2
    )
    out = spark.read.parquet(d["out"])
    assert out.count() == 3 * n1  # 3 probes answered, k rows each
    assert out.select("probe_id").distinct().count() == 3


def test_checkpoint_prevents_replay(spark, tmp_path):
    df, index, d = _setup(spark, tmp_path)
    _drop_probes(df, d["probes"], [0, 1])
    run_streaming_ann(
        spark, index, d["probes"], d["out"], d["ckpt"], k=4, n_probe_cells=2
    )
    first = spark.read.parquet(d["out"]).count()
    # re-run with NO new probe files: checkpoint must append nothing
    run_streaming_ann(
        spark, index, d["probes"], d["out"], d["ckpt"], k=4, n_probe_cells=2
    )
    assert spark.read.parquet(d["out"]).count() == first


def test_streaming_index_refresh_with_compaction(spark, tmp_path):
    """The INGEST half (round-10): base index over 1/3 of the corpus,
    two streamed vector drops appended, compact_after folds them —
    queries must be bit-equal to the one-shot batch build throughout,
    and compaction must leave a single base scan."""
    from computer_vision_foundations_spark.streaming.ann import (
        run_streaming_index_refresh,
    )

    df, cbs, cents = _corpus(spark)
    full = build_ivf_pq_index(df, str(tmp_path / "full"), cbs, cents)
    probes = df.filter("vec_id < 5")
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
    vec_dir = str(tmp_path / "vecs")
    os.makedirs(vec_dir)
    for rem in (1, 2):
        df.filter(f"vec_id % 3 = {rem}").coalesce(1).write.mode(
            "append"
        ).parquet(vec_dir)
    run_streaming_index_refresh(
        spark,
        inc,
        vec_dir,
        str(tmp_path / "rckpt"),
        max_files_per_trigger=1,
        compact_after=True,
    )
    # compaction folded the increments away
    assert not os.path.isdir(os.path.join(inc, "codes_inc"))
    got = sorted(
        map(
            tuple,
            query_ivf_pq_index(
                spark, inc, probes, k=5, n_probe_cells=3
            ).collect(),
        )
    )
    assert got == want


def test_dim_guard_reports_null_embedding(spark):
    """size(NULL) = -1 matches the dim predicate, so NULL embeddings
    reach the guard; they must be reported as NULL, not crash with
    TypeError on len(None) (round-10 ADVICE)."""
    import pytest

    from computer_vision_foundations_spark.streaming.ann import (
        _require_embedding_dim,
    )

    ok = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id long, embedding array<float>"
    )
    _require_embedding_dim(ok, 4, "probe")  # no raise
    short = spark.createDataFrame(
        [(2, [0.0] * 3)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match=r"probe dim 3 != index dim 4"):
        _require_embedding_dim(short, 4, "probe")
    null = spark.createDataFrame(
        [(3, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match=r"NULL vector embedding \(vec_id=3\)"):
        _require_embedding_dim(null, 4, "vector")
