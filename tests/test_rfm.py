"""RFM segmentation: quintile semantics against a pure-Python
reference, and score orientation (5 = best)."""

import datetime as dt
import math

from pyspark.sql import Row

from computer_vision_foundations_spark.operators.rfm import rfm_segments


def _orders():
    rows = []
    base = dt.datetime(2026, 1, 1)
    # 10 customers: customer i orders i times, amounts 100*i, and the
    # higher i, the more recent the last order.
    oid = 0
    for i in range(1, 11):
        for j in range(i):
            rows.append(
                Row(
                    o_orderkey=(oid := oid + 1),
                    o_custkey=i,
                    o_orderdate=base + dt.timedelta(days=i * 3 + j),
                    o_totalprice=100.0 * i,
                )
            )
    return rows


def _py_scores(n=10):
    # customer i has rank i in every metric (ascending), rn = i
    return {i: math.floor((i - 1) * 5 / n) + 1 for i in range(1, n + 1)}


def test_rfm_quintiles_and_orientation(spark):
    df = spark.createDataFrame(_orders())
    segs = rfm_segments(df).collect()
    assert sum(r["n_customers"] for r in segs) == 10
    want = _py_scores()
    # customer 10: most recent, most frequent, biggest spender -> 5,5,5
    top = [r for r in segs if (r["r_score"], r["f_score"], r["m_score"]) == (5, 5, 5)]
    assert top and top[0]["n_customers"] == sum(
        1 for i in want if want[i] == 5
    )
    # customer 1: oldest, rarest, smallest -> 1,1,1
    bot = [r for r in segs if (r["r_score"], r["f_score"], r["m_score"]) == (1, 1, 1)]
    assert bot and bot[0]["n_customers"] == sum(
        1 for i in want if want[i] == 1
    )
    # every score in 1..5
    for r in segs:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 5
