"""Geospatial primitives: geohash encoding and radius pair joins.

The location analytics every telemetry lake eventually needs: encode
(lat, lon) into sortable prefix-shared cell keys, and find entity
pairs within a radius WITHOUT the quadratic cross join. Both are
pure arithmetic, so they hold to the engine's differential-oracle
standard:

- **geohash** (Niemeyer 2008): the closed form of the bisection —
  ``x = floor((lon+180)/360·2^⌈5p/2⌉)``, ``y`` likewise over
  latitude, bits interleaved lon-first (the Morton trick
  `operators/zorder.py` already uses) and emitted as base32. Shared
  prefixes = shared cells, so geohash prefixes double as join keys,
  sort keys, and privacy-coarsening truncation.
- **radius pairs**: the DBSCAN grid discipline (`operators/dbscan.py`)
  on the globe — block on (lat, lon) cells sized to cover the radius
  at the data's worst latitude, 3×3 adjacent-cell equi-join, exact
  haversine verify. Blocking is lossless by the same per-dimension
  bound argument; the oracle runs the quadratic haversine join to
  prove it.

Spark-first shape: encoding is one codegen projection; the pair join
shuffles (cell, id, coords) rows with 9× replication on one side and
never forms cross-cell candidates. Caveat for poles/antimeridian:
cells do not wrap at lon ±180 or |lat| → 90 (the fixture and most
telemetry stay clear; wrap-around needs a second shifted pass,
documented here rather than silently wrong).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["geohash", "radius_pairs", "geohash_sql", "radius_oracle_sql"]

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_EARTH_KM = 6371.0


def geohash(lat: Column, lon: Column, precision: int = 6) -> Column:
    """Base32 geohash string of the coordinate (closed-form Morton
    interleave, no loop)."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    x = F.floor(
        (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))
    ).cast("long")
    y = F.floor(
        (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))
    ).cast("long")
    # clamp the lon=180 / lat=90 edge into the top cell
    x = F.least(x, F.lit((1 << lon_bits) - 1))
    y = F.least(y, F.lit((1 << lat_bits) - 1))
    # interleave: bit i of the geohash (MSB first) comes from lon for
    # even i, lat for odd i
    z = None
    for i in range(bits):
        src, src_bits, idx = (
            (x, lon_bits, i // 2) if i % 2 == 0 else (y, lat_bits, i // 2)
        )
        bit = F.shiftright(src, src_bits - 1 - idx).bitwiseAND(F.lit(1))
        term = bit * F.lit(1 << (bits - 1 - i))
        z = term if z is None else z + term
    chars = [
        F.substring(
            F.lit(_B32),
            (
                F.shiftright(z, 5 * (precision - 1 - c))
                .bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
            1,
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def geohash_sql(lat: str, lon: str, precision: int = 6) -> str:
    """DuckDB twin of :func:`geohash` — identical integer algebra."""
    bits = 5 * precision
    lon_bits = (bits + 1) // 2
    lat_bits = bits // 2
    x = (
        f"least(CAST(floor(({lon} + 180.0) / 360.0 * {float(1 << lon_bits)!r}) "
        f"AS BIGINT), {(1 << lon_bits) - 1})"
    )
    y = (
        f"least(CAST(floor(({lat} + 90.0) / 180.0 * {float(1 << lat_bits)!r}) "
        f"AS BIGINT), {(1 << lat_bits) - 1})"
    )
    terms = []
    for i in range(bits):
        src, src_bits, idx = (
            (x, lon_bits, i // 2) if i % 2 == 0 else (y, lat_bits, i // 2)
        )
        terms.append(
            f"((({src} >> {src_bits - 1 - idx}) & 1) << {bits - 1 - i})"
        )
    z = " + ".join(terms)
    chars = " || ".join(
        f"substring('{_B32}', CAST(((({z}) >> {5 * (precision - 1 - c)}) & 31) "
        f"+ 1 AS INT), 1)"
        for c in range(precision)
    )
    return chars


def _haversine_km(lat1, lon1, lat2, lon2) -> Column:
    rad = math.pi / 180.0
    dphi = (lat2 - lat1) * F.lit(rad) / 2.0
    dlmb = (lon2 - lon1) * F.lit(rad) / 2.0
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(lat1 * F.lit(rad))
        * F.cos(lat2 * F.lit(rad))
        * F.sin(dlmb)
        * F.sin(dlmb)
    )
    return (
        F.lit(2.0 * _EARTH_KM)
        * F.asin(F.least(F.sqrt(a), F.lit(1.0)))
    )


def radius_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """``(id_a, id_b, dist_km)`` with id_a < id_b and haversine
    distance ≤ radius (rounded 6) — grid-blocked, never quadratic.

    Cell sizes: Δlat = radius/111 km-per-degree; Δlon = radius /
    (111·cos(max_abs_lat)) — any pair within the radius differs by
    ≤ 1 cell in each dimension as long as |lat| ≤ ``max_abs_lat``
    (asserted upstream; polar data needs the documented wrap pass).
    """
    dlat = radius_km / 111.0
    dlon = radius_km / (111.0 * math.cos(math.radians(max_abs_lat)))
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
        F.floor(F.col(lat_col) / F.lit(dlat)).cast("long").alias("_cy"),
        F.floor(F.col(lon_col) / F.lit(dlon)).cast("long").alias("_cx"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(oy).alias("oy"), F.lit(ox).alias("ox"))
            for oy in (-1, 0, 1)
            for ox in (-1, 0, 1)
        ]
    )
    a = pts.select(
        F.col("_id").alias("id_a"),
        F.col("_lat").alias("_lata"),
        F.col("_lon").alias("_lona"),
        "_cy",
        "_cx",
        F.explode(offsets).alias("_o"),
    ).select(
        "id_a",
        "_lata",
        "_lona",
        (F.col("_cy") + F.col("_o.oy")).alias("_cy"),
        (F.col("_cx") + F.col("_o.ox")).alias("_cx"),
    )
    b = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_lat").alias("_latb"),
        F.col("_lon").alias("_lonb"),
        "_cy",
        "_cx",
    )
    d = _haversine_km(
        F.col("_lata"), F.col("_lona"), F.col("_latb"), F.col("_lonb")
    )
    return (
        a.join(b, ["_cy", "_cx"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_km", d)
        .where(F.col("dist_km") <= F.lit(float(radius_km)))
        .select("id_a", "id_b", F.round("dist_km", 6).alias("dist_km"))
    )


def radius_oracle_sql(
    points_sql: str,
    radius_km: float,
) -> str:
    """DuckDB twin — the deliberately QUADRATIC haversine join over
    ``points_sql`` (must yield id, lat, lon), so a hash match also
    proves the grid blocking loses no pair."""
    rad = math.pi / 180.0
    d = (
        f"2.0 * {_EARTH_KM!r} * asin(least(sqrt("
        f"sin((b.lat - a.lat) * {rad!r} / 2.0)"
        f" * sin((b.lat - a.lat) * {rad!r} / 2.0)"
        f" + cos(a.lat * {rad!r}) * cos(b.lat * {rad!r})"
        f" * sin((b.lon - a.lon) * {rad!r} / 2.0)"
        f" * sin((b.lon - a.lon) * {rad!r} / 2.0)), 1.0))"
    )
    return f"""
    WITH pts AS MATERIALIZED ({points_sql})
    SELECT a.id AS id_a, b.id AS id_b, round({d}, 6) AS dist_km
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE {d} <= {float(radius_km)!r}
    ORDER BY 1, 2
    """
