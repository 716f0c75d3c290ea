"""Geospatial primitives (operators/geo)."""

import math

import pytest

from pyspark.sql import functions as F

from computer_vision_foundations_spark.operators.geo import (
    geohash,
    radius_pairs,
)


def _ref_geohash(lat, lon, precision):
    """Textbook bisection geohash for cross-checking."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        rng, v = (lon_rng, lon) if even else (lat_rng, lat)
        mid = (rng[0] + rng[1]) / 2
        ch <<= 1
        if v >= mid:
            ch |= 1
            rng[0] = mid
        else:
            rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_matches_reference_bisection(spark):
    cases = [
        (57.64911, 10.40744),   # the canonical u4pruyd example
        (0.0, 0.0),
        (-33.86, 151.21),
        (40.7128, -74.006),
        (-89.9, -179.9),
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(cases)],
        "id long, lat double, lon double",
    )
    got = {
        r["id"]: r["gh"]
        for r in df.select(
            "id", geohash(F.col("lat"), F.col("lon"), 6).alias("gh")
        ).collect()
    }
    for i, (la, lo) in enumerate(cases):
        assert got[i] == _ref_geohash(la, lo, 6), (la, lo)
    assert got[0] == "u4pruy"  # published value


def test_geohash_prefix_shrinks_with_precision(spark):
    df = spark.createDataFrame([(1, 48.8566, 2.3522)], "id long, lat double, lon double")
    g6 = df.select(geohash(F.col("lat"), F.col("lon"), 6).alias("g")).collect()[0]["g"]
    g3 = df.select(geohash(F.col("lat"), F.col("lon"), 3).alias("g")).collect()[0]["g"]
    assert g6.startswith(g3)


def _haversine(a, b):
    la1, lo1 = a
    la2, lo2 = b
    p = math.pi / 180
    x = (
        math.sin((la2 - la1) * p / 2) ** 2
        + math.cos(la1 * p) * math.cos(la2 * p) * math.sin((lo2 - lo1) * p / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(min(math.sqrt(x), 1.0))


def test_radius_pairs_equals_quadratic(spark):
    import random

    rng = random.Random(9)
    pts = [
        (i, rng.uniform(-60, 60), rng.uniform(-170, 170))
        for i in range(80)
    ] + [
        # a tight cluster guaranteeing pairs
        (100 + i, 45.0 + i * 0.01, 7.0 + i * 0.01)
        for i in range(10)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    radius = 200.0
    got = {
        (r["id_a"], r["id_b"])
        for r in radius_pairs(df, "id", "lat", "lon", radius, 65.0).collect()
    }
    want = {
        (a[0], b[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1 :]
        if _haversine(a[1:], b[1:]) <= radius
    }
    assert got == want and want
