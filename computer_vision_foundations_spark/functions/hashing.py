"""Portable hashing primitives for MinHash / LSH.

Two hash families, one structure (``min(hash(seed, shingle))`` per seed
over the document's shingle set is a valid MinHash permutation):

- ``xxhash64`` (default, the scale path): each shingle is hashed ONCE
  into a long; the per-seed permutations are cheap integer remixes
  ``xxhash64(seed, h)`` of that one hash. Everything is a codegen'd
  Catalyst expression — no interpreted higher-order functions.
- ``md5`` (the differential-testing path): ONE md5 digest per shingle,
  split into two 28-bit integers ``(h1, h2)``; the per-seed permutation
  is Kirsch-Mitzenmacher double hashing ``(h1 + (seed+1)·h2) mod p``
  with ``p = 2^31 - 1`` — plain integer arithmetic every SQL engine
  computes identically (DuckDB: ``('0x' || substr(md5(s),1,7))::BIGINT``),
  so signatures are bit-comparable across engines. Same cost class as
  the xxhash64 path (the md5 runs once, the remixes are codegen'd int
  ops); an earlier form digested ``seed || shingle`` per seed and
  measured ~10× slower end-to-end.

Both are designed to be applied to EXPLODED shingles and reduced with
``groupBy(doc).agg(min(...) × n_hashes)`` — a whole-stage-codegen hash
aggregate with map-side partial aggregation, so the only shuffle
carries one row of ``n_hashes`` minima per document per partition. The
earlier array form (``array_min(transform(shingles, s -> hash(...)))``
per seed) evaluated interpreted lambdas n_hashes times per document and
was measured 10-70× slower at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# Mersenne prime 2^31 - 1: the modulus of the portable permutation
# family. h1/h2 are 28-bit, so h1 + n·h2 stays far below 2^63 — no
# overflow under ANSI mode in either engine.
MINHASH_PRIME = 2_147_483_647


def md5_hash_pair(shingle: Column | str) -> tuple[Column, Column]:
    """One md5 digest → two independent 28-bit integers (h1, h2).

    Portable to any SQL engine: hex chars [1..7] and [8..14] of
    ``md5(shingle)`` parsed base-16. Spark's ``conv`` returns a decimal
    string; the cast back to long is exact (< 2^28).
    """
    c = F.col(shingle) if isinstance(shingle, str) else shingle
    d = F.md5(c.cast("binary"))
    h1 = F.conv(F.substring(d, 1, 7), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 8, 7), 16, 10).cast("long")
    return h1, h2


def seed_hash(shingle: Column | str, seed: int, hash_fn: str = "xxhash64") -> Column:
    """Hash of one shingle under the ``seed``-th permutation family.

    For ``xxhash64`` pass the PRE-HASHED long column (hash once, remix
    per seed). ``md5`` here is the legacy one-digest-per-seed form used
    only by ``minhash_column`` (small-frame array path); the hot
    aggregate path uses ``md5_hash_pair`` + ``double_hash`` instead.
    """
    c = F.col(shingle) if isinstance(shingle, str) else shingle
    if hash_fn == "md5":
        return F.md5(F.concat(F.lit(f"{seed}:"), c).cast("binary"))
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(seed), c)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def hash_family_constants(seed: int) -> tuple[int, int, int]:
    """Seeded (a, b, c) for the 2-universal permutation family.

    Plain Kirsch-Mitzenmacher ``h1 + s·h2`` correlates adjacent seeds
    (the same small-h2 shingle wins the min for many seeds), which
    inflated LSH band collisions ~6×; fully random per-seed
    coefficients restore independent minima. Deterministic: derived
    from ``random.Random`` with a fixed offset so the DuckDB oracle can
    inject the identical literals.
    """
    import random

    rng = random.Random(1_000_003 * (seed + 1))
    return (
        rng.randrange(1, MINHASH_PRIME),
        rng.randrange(1, MINHASH_PRIME),
        rng.randrange(MINHASH_PRIME),
    )


def double_hash(h1: Column, h2: Column, seed: int) -> Column:
    """Portable permutation ``(a·h1 + b·h2 + c) mod p`` (2-universal in
    the 28-bit pair; max term ~2^59·3, no int64 overflow)."""
    a, b, c = hash_family_constants(seed)
    return F.pmod(
        F.lit(a) * h1 + F.lit(b) * h2 + F.lit(c), F.lit(MINHASH_PRIME)
    )


def minhash_agg_columns(
    shingle_col: str, n_hashes: int, hash_fn: str = "xxhash64"
) -> list[Column]:
    """Aggregate expressions ``min(perm_s(shingle))`` for s in 0..n-1.

    Both families expect PRE-HASHED input (hash each shingle once in a
    projection, remix per seed inside the codegen'd hash aggregate):

    - ``xxhash64``: pass the ``F.xxhash64(shingle)`` long column; the
      remix is ``xxhash64(seed, h)``.
    - ``md5``: pass a STRUCT column ``struct(h1, h2)`` from
      ``md5_hash_pair``; the remix is ``double_hash`` — portable
      integer arithmetic, verified against the DuckDB oracle.
    """
    if hash_fn == "md5":
        return [
            F.min(
                double_hash(
                    F.col(shingle_col)["h1"], F.col(shingle_col)["h2"], s
                )
            ).alias(f"_m{s}")
            for s in range(n_hashes)
        ]
    return [
        F.min(seed_hash(shingle_col, s, hash_fn)).alias(f"_m{s}")
        for s in range(n_hashes)
    ]


def minhash_column(
    shingles: Column | str, n_hashes: int, hash_fn: str = "md5"
) -> Column:
    """Array-expression MinHash signature (legacy/small-frame form).

    ``array_min(transform(shingles, s -> hash(seed || s)))`` per seed.
    Correct but interpreted (HOFs get no codegen) — for anything hot use
    the exploded aggregate form (``minhash_agg_columns``), which is what
    ``operators.dedup.minhash_signatures`` does.
    """
    c = F.col(shingles) if isinstance(shingles, str) else shingles

    # NB: the hash lambda must take exactly one parameter — PySpark
    # binds a second parameter to the array index, not the closure.
    def _lam(seed: int):
        return lambda s: seed_hash(s, seed, hash_fn)

    mins = [
        F.array_min(F.transform(c, _lam(seed))) for seed in range(n_hashes)
    ]
    return F.array(*mins)
