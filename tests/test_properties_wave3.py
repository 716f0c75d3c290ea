"""Property-based invariants (hypothesis) for the third-wave
operators: paragraph dedup, feature hashing, augmentation index math.
Same conventions as tests/test_properties.py — one shared Spark
session, small example counts, no deadlines."""

import string

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORD = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=5)
DOC = st.lists(WORD, min_size=1, max_size=20).map(" ".join)

_prop = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_prop
@given(texts=st.lists(DOC, min_size=1, max_size=5))
def test_paragraph_dedup_partition_properties(spark, texts):
    """Exactly one survivor per distinct paragraph; n_paras partitions
    the corpus; kept counts never exceed totals."""
    from computer_vision_foundations_spark.operators.paragraphs import (
        doc_paragraphs,
        paragraph_dedup,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    paras = doc_paragraphs(df, para_words=3)
    out = paragraph_dedup(df, para_words=3).collect()
    n_distinct = paras.select("para_hash").distinct().count()
    assert sum(r["n_kept"] for r in out) == n_distinct
    assert sum(r["n_paras"] for r in out) == paras.count()
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_paras"]
        assert r["cleaned_len"] == len(r["cleaned_text"])


@_prop
@given(texts=st.lists(DOC, min_size=1, max_size=4), d=st.sampled_from([8, 32]))
def test_feature_hash_mass_conservation(spark, texts, d):
    """Σ|weight| ≤ token count (signs can only cancel, never create);
    buckets stay inside [0, d); per-doc sparsity bounded by d."""
    from computer_vision_foundations_spark.functions.feature_hash import (
        hashed_features,
    )

    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rows = hashed_features(df, d=d).collect()
    by_doc = {}
    for r in rows:
        assert 0 <= r["bucket"] < d and r["weight"] != 0
        by_doc.setdefault(r["doc_id"], []).append(r["weight"])
    for i, t in enumerate(texts):
        n_tok = len([w for w in t.split(" ") if w])
        ws = by_doc.get(i, [])
        assert sum(abs(w) for w in ws) <= n_tok
        assert sum(ws) % 2 == n_tok % 2  # parity is hash-invariant
        assert len(ws) <= d


@_prop
@given(
    h=st.integers(2, 12),
    w=st.integers(2, 12),
    data=st.data(),
)
def test_augment_index_math_properties(h, w, data):
    """hflip is an involution; same-size nearest resize is identity;
    crop∘crop composes to the smaller crop."""
    from computer_vision_foundations_spark.functions.augment import (
        center_crop,
        hflip,
        resize_nearest,
    )

    px = np.arange(h * w, dtype=np.uint8).reshape(h, w, 1)
    assert (hflip(hflip(px)) == px).all()
    assert (resize_nearest(px, h, w) == px).all()
    ch = data.draw(st.integers(1, h))
    cw = data.draw(st.integers(1, w))
    once = center_crop(px, ch, cw)
    twice = center_crop(center_crop(px, ch, cw), ch, cw)
    assert (twice == once).all()
    up = resize_nearest(px, 2 * h, 2 * w)
    assert (resize_nearest(up, h, w) == px).all()  # exact down-inverse
