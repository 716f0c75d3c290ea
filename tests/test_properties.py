"""Property-based invariants (hypothesis) for the dedup/fingerprint
operators — semantic guarantees that hold for ALL inputs, not just the
fixture corpus.

One shared Spark session; hypothesis drives the inputs, Spark executes
the same plans the registry queries use. Deadlines are disabled (Spark
latency is not the property under test) and example counts kept small
so the suite stays fast.
"""

import string

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pyspark.sql.functions as F

TEXT = st.text(
    alphabet=string.ascii_lowercase + " ",
    min_size=0,
    max_size=120,
)

_prop = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_prop
@given(texts=st.lists(TEXT, min_size=1, max_size=6))
def test_exact_duplicates_partition_property(spark, texts):
    """exact_duplicates: group sizes sum to the row count, every group
    keeps its minimum id, identical texts share a fingerprint."""
    from computer_vision_foundations_spark.operators.dedup import (
        exact_duplicates,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    groups = exact_duplicates(df, canonicalize=False).collect()
    assert sum(g.n_dupes for g in groups) == len(texts)
    by_fp = {g.fingerprint: g for g in groups}
    assert len(by_fp) == len(set(texts))
    for g in groups:
        members = [i for i, t in enumerate(texts) if t == texts[g.keep_id]]
        assert g.keep_id == min(members)


@_prop
@given(text=TEXT, salt=st.integers(0, 10**6))
def test_winnow_self_similarity(spark, text, salt):
    """A document always shares ALL fingerprints with itself, and
    winnowing output is a sorted set of non-negative hashes."""
    from computer_vision_foundations_spark.functions.text import winnow_udf

    df = spark.createDataFrame(
        [(0, text), (1, text)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", winnow_udf(5, 8)(F.col("text")).alias("fp")
        ).collect()
    }
    assert out[0] == out[1]
    assert out[0] == sorted(set(out[0]))
    assert all(h >= 0 for h in out[0])


@_prop
@given(
    base=st.text(alphabet=string.ascii_lowercase, min_size=30, max_size=60),
    prefix=TEXT,
    suffix=TEXT,
)
def test_winnow_shared_substring_guarantee(spark, base, prefix, suffix):
    """The winnowing guarantee (Schleimer et al.): two docs sharing a
    substring of length >= w + k - 1 share at least one fingerprint —
    for ANY surrounding prefix/suffix."""
    from computer_vision_foundations_spark.functions.text import winnow_udf

    df = spark.createDataFrame(
        [(0, prefix + base), (1, base + suffix)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: set(r.fp)
        for r in df.select(
            "doc_id", winnow_udf(5, 8)(F.col("text")).alias("fp")
        ).collect()
    }
    assert out[0] & out[1]


@_prop
@given(texts=st.lists(TEXT.filter(lambda t: t.strip()), min_size=2, max_size=5))
def test_minhash_identical_docs_identical_signatures(spark, texts):
    """MinHash signatures are a pure function of the shingle set:
    duplicate texts get identical signatures (both hash families)."""
    from computer_vision_foundations_spark.operators.dedup import (
        minhash_signatures,
    )

    rows = [(i, t) for i, t in enumerate(texts + texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for fam in ("xxhash64", "md5"):
        sigs = {
            r.doc_id: tuple(r.signature)
            for r in minhash_signatures(
                df, "text", "doc_id", k=2, n_hashes=4, hash_fn=fam
            ).collect()
        }
        for i, t in enumerate(texts):
            assert sigs[i] == sigs[i + len(texts)]


@_prop
@given(
    fps=st.lists(st.integers(0, 2**16 - 1), min_size=2, max_size=8, unique=False),
)
def test_simhash_pairs_pigeonhole_property(spark, fps):
    """Hamming-LSH banding is EXACT for max_hamming <= bands-1: the
    operator's output equals the brute-force Hamming filter on any
    fingerprint multiset (including duplicate-heavy ones that exercise
    the collapse/re-expand path)."""
    import itertools

    from computer_vision_foundations_spark.operators.dedup import simhash_pairs

    rows = list(enumerate(fps))
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_pairs(
            df, bits=16, bands=4, max_hamming=3, max_band_freq=None
        ).collect()
    }
    want = {
        (ia, ib): bin(ha ^ hb).count("1")
        for (ia, ha), (ib, hb) in itertools.combinations(rows, 2)
        if bin(ha ^ hb).count("1") <= 3
    }
    assert got == want


@_prop
@given(
    n_tokens=st.integers(1, 60),
    chunk=st.integers(2, 20),
    overlap=st.integers(0, 10),
)
def test_chunking_reconstruction_property(spark, n_tokens, chunk, overlap):
    """chunk_documents: dropping each chunk's first `overlap` tokens
    (except chunk 0) and concatenating reconstructs the document; every
    chunk fits chunk_tokens; only the last chunk may be short."""
    from hypothesis import assume

    from computer_vision_foundations_spark.operators.chunking import (
        chunk_documents,
    )

    assume(overlap < chunk)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert all(r.n_tokens <= chunk for r in rows)
    assert all(r.n_tokens == chunk for r in rows[:-1])
    rebuilt = rows[0].chunk_text.split(" ")
    for r in rows[1:]:
        rebuilt += r.chunk_text.split(" ")[overlap:]
    assert rebuilt == text.split(" ")


@_prop
@given(
    counts=st.lists(st.integers(1, 50), min_size=1, max_size=30),
    seq_len=st.integers(10, 80),
)
def test_packing_capacity_property(spark, counts, seq_len):
    """pack_sequences is greedy sequential packing per shard: replaying
    the running sum in id order reproduces every (bin, offset), and
    offsets always lie inside the bin grid [0, seq_len)."""
    from computer_vision_foundations_spark.operators.chunking import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        list(enumerate(counts)), ["doc_id", "n_tokens"]
    )
    rows = pack_sequences(df, "n_tokens", seq_len=seq_len, n_shards=2).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for members in by_shard.values():
        members.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in members:
            assert 0 <= r.offset < seq_len
            assert r.bin == cum // seq_len
            assert r.offset == cum - r.bin * seq_len
            cum += r.n_tokens


@_prop
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 4),               # user
            st.sampled_from(["a", "b", "c", "x"]),  # type (x = noise)
            st.integers(0, 20),              # second offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_funnel_matches_bruteforce_reference(spark, events):
    """funnel_max_step == 'exists an ordered subsequence with strictly
    increasing timestamps', checked per user by brute force."""
    import datetime as dt

    from computer_vision_foundations_spark.operators.funnel import (
        funnel_max_step,
    )

    steps = ["a", "b", "c"]
    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, t, base + dt.timedelta(seconds=s)) for (u, t, s) in events
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp_ntz"
    )
    got = {r.user: r.max_step for r in funnel_max_step(df, steps).collect()}

    def brute(user_events):
        best = 0
        # greedy earliest is optimal; emulate directly
        last = -1
        step = 0
        for (t, s) in sorted(user_events):
            if step < 3 and s == steps[step] and t > last:
                step += 1
                last = t
            best = max(best, step)
        return best

    per_user = {}
    for (u, t, s) in events:
        if t in steps:
            per_user.setdefault(u, []).append((s, t))
    for u, evs in per_user.items():
        assert got[u] == brute([(s, t) for (s, t) in evs])


@_prop
@given(
    obs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 15),
                  st.floats(-5, 5, allow_nan=False)),
        min_size=1,
        max_size=20,
    )
)
def test_gap_fill_locf_reference(spark, obs):
    """Grid spans per key, LOCF carries the latest prior bucket value,
    filled flags mark synthesized rows."""
    import datetime as dt
    from collections import defaultdict

    from computer_vision_foundations_spark.operators.rollup import (
        gap_fill_locf,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(days=d), float(v)) for (k, d, v) in obs
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp_ntz, v double")
    out = gap_fill_locf(df, "ts", "k", "v", 86_400)
    got = {(r.key, r.bucket_ts): (r.value, r.filled) for r in out.collect()}

    per_key = defaultdict(lambda: defaultdict(list))
    for (k, d, v) in obs:
        per_key[k][d].append(float(v))
    for k, days in per_key.items():
        lo, hi = min(days), max(days)
        last = None
        for d in range(lo, hi + 1):
            ts = base + dt.timedelta(days=d)
            val, filled = got[(k, ts)]
            if d in days:
                exp = sum(days[d]) / len(days[d])
                assert val == pytest.approx(exp)
                assert not filled
                last = exp
            else:
                assert filled
                assert val == pytest.approx(last)
    # no extra rows beyond the per-key spans
    assert len(got) == sum(
        max(d) - min(d) + 1 for d in (set(days) for days in per_key.values())
    )


@_prop
@given(
    n=st.integers(1, 60),
    k=st.integers(1, 30),
    seed=st.integers(0, 5),
)
def test_bottom_k_is_global_hash_order_prefix(spark, n, k, seed):
    from computer_vision_foundations_spark.operators.mixture import hash_unit
    from computer_vision_foundations_spark.operators.sample import (
        bottom_k_sample,
    )

    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = [r.doc_id for r in bottom_k_sample(df, "doc_id", k, seed=seed)
           .orderBy("sample_key", "doc_id").collect()]
    full = [
        r.doc_id
        for r in df.withColumn("h", hash_unit("doc_id", seed))
        .orderBy("h", "doc_id")
        .collect()
    ]
    assert got == full[: min(k, n)]


@_prop
@given(texts=st.lists(TEXT.filter(lambda t: len(t) >= 1), min_size=1, max_size=5))
def test_cdc_chunks_partition_the_text(spark, texts):
    """CDC chunks are a partition of each document: contiguous,
    non-empty, covering exactly the original characters."""
    from computer_vision_foundations_spark.operators.cdc import content_chunks

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = content_chunks(df, w=4, modulus=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in enumerate(texts):
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
        assert chunks[0].chunk_start == 1
        assert all(c.chunk_len >= 1 for c in chunks)
        for a, b in zip(chunks, chunks[1:]):
            assert b.chunk_start == a.chunk_start + a.chunk_len
        assert chunks[-1].chunk_start + chunks[-1].chunk_len == len(t) + 1
        # reconstruct: chunk substrings concatenate to the text
        recon = "".join(
            t[c.chunk_start - 1 : c.chunk_start - 1 + c.chunk_len]
            for c in chunks
        )
        assert recon == t


@_prop
@given(
    base=st.text(alphabet="ab ", min_size=30, max_size=60),
    docs=st.integers(2, 4),
)
def test_span_islands_are_disjoint_and_within_bounds(spark, base, docs):
    from computer_vision_foundations_spark.operators.spans import (
        duplicated_span_islands,
    )

    rows = [(i, f"u{i} v{i} " + base) for i in range(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    islands = duplicated_span_islands(df, n=3).collect()
    by_doc = {}
    for r in islands:
        by_doc.setdefault(r.doc_id, []).append((r.island_start, r.island_end))
    for i in range(docs):
        n_tok = len(rows[i][1].split(" "))
        spans = sorted(by_doc.get(i, []))
        for s, e in spans:
            assert 0 <= s < e <= n_tok
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1  # maximal islands never touch or overlap


@_prop
@given(
    seed=st.integers(0, 1000),
    vals=st.lists(
        st.lists(st.floats(-5, 5, allow_nan=False), min_size=8, max_size=8),
        min_size=2,
        max_size=5,
    ),
)
def test_jl_projection_linear_property(spark, seed, vals):
    """Projection is linear: proj(a) - proj(b) == proj over (a - b)
    coordinates via the same matrix (checked against numpy)."""
    import numpy as np

    from computer_vision_foundations_spark.operators.projection import (
        jl_sign_matrix,
        random_projection,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vals)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.vec_id: np.array(r.projected)
        for r in random_projection(df, out_dim=4, seed=seed, decimals=None).collect()
    }
    r_mat = np.array(jl_sign_matrix(8, 4, seed))
    x = np.array(
        [np.array(v, dtype=np.float32).astype(np.float64) for v in vals]
    )
    for i in range(len(vals)):
        assert np.allclose(out[i], r_mat @ x[i], atol=1e-9)


@_prop
@given(
    h=st.integers(1, 24),
    w_=st.integers(1, 24),
    seed=st.integers(0, 10**6),
    quality=st.sampled_from([85, 92, 100]),
    color=st.booleans(),
)
def test_jpeg_roundtrip_bounded_error(spark, h, w_, seed, quality, color):
    """Any image, any (non-multiple-of-8) size, both color modes:
    encode→decode stays within the quantization-error envelope, exact
    shape, and q100 grayscale is within ±1."""
    import numpy as np

    from computer_vision_foundations_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w_, 3) if color else (h, w_)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img, quality=quality))
    assert d["pixels"].shape == img.shape
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    if quality == 100:
        assert err.max() <= (3 if color else 1)  # color-convert rounding
    else:
        assert err.max() <= 135  # noise at q85 worst case stays bounded
        assert err.mean() < 40


@_prop
@given(
    xs=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=1,
        max_size=40,
    ),
    alpha=st.floats(min_value=0.05, max_value=0.95),
)
def test_ewma_closed_form_equals_recursion(spark, xs, alpha):
    """The window closed form reproduces the sequential recursion for
    any series and smoothing factor."""
    from computer_vision_foundations_spark.operators.smoothing import (
        ewma_by_key,
    )

    rows = [(1, i, float(i), x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts double, value double"
    )
    got = ewma_by_key(df, alpha=alpha).collect()[0]["ewma"]
    s = xs[0]
    for x in xs[1:]:
        s = alpha * x + (1 - alpha) * s
    assert got == pytest.approx(round(s, 6), abs=1e-5)


@_prop
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=50),
        min_size=2,
        max_size=30,
    )
)
def test_quantile_norm_is_idempotent_on_single_source(spark, vals):
    """With one source, every value maps onto (its own) global
    quantile — the transform is the identity up to ties."""
    from computer_vision_foundations_spark.operators.qnorm import (
        quantile_normalize,
    )

    rows = [(i, "s", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    for r in quantile_normalize(df, "n_chars").collect():
        # ties may map onto a tied neighbor's (equal) value
        assert r["qnorm"] == pytest.approx(float(r["score"]), abs=1e-6)


@_prop
@given(
    vals=st.lists(
        st.floats(min_value=0.01, max_value=1000, allow_nan=False),
        min_size=1,
        max_size=25,
    )
)
def test_gini_bounds_and_translation(spark, vals):
    """0 <= G < 1 for positive values; constant vectors give 0."""
    from computer_vision_foundations_spark.operators.concentration import (
        gini_index,
    )

    rows = [(f"u{i}", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "unit string, v double")
    g = gini_index(df, "unit", "v").collect()[0]["gini"]
    assert -1e-6 <= g < 1.0
    const = spark.createDataFrame(
        [(f"u{i}", 5.0) for i in range(len(vals))], "unit string, v double"
    )
    assert gini_index(const, "unit", "v").collect()[0]["gini"] == pytest.approx(
        0.0, abs=1e-6
    )
