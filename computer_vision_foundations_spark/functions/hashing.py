"""Portable hashing primitives for MinHash / LSH.

Two hash families, one structure (``min(hash(seed, shingle))`` per seed
over the document's shingle set is a valid MinHash permutation):

- ``xxhash64`` (default, the scale path): each shingle is hashed ONCE
  into a long; the per-seed permutations are cheap integer remixes
  ``xxhash64(seed, h)`` of that one hash. Everything is a codegen'd
  Catalyst expression — no interpreted higher-order functions.
- ``md5`` (the differential-testing path): ``min(md5(seed || shingle))``
  produces hex digests every SQL engine computes identically, so
  signatures are bit-comparable across engines (DuckDB oracle). ~6×
  more expensive than the remix path; use only where cross-engine
  portability matters.

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


def seed_hash(shingle: Column | str, seed: int, hash_fn: str = "xxhash64") -> Column:
    """Hash of one shingle under the ``seed``-th permutation family."""
    c = F.col(shingle) if isinstance(shingle, str) else shingle
    if hash_fn == "md5":
        return F.md5(F.concat(F.lit(f"{seed}:"), c).cast("binary"))
    if hash_fn == "xxhash64":
        return F.xxhash64(F.lit(seed), c)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def minhash_agg_columns(
    shingle_col: str, n_hashes: int, hash_fn: str = "xxhash64"
) -> list[Column]:
    """Aggregate expressions ``min(hash_s(shingle))`` for s in 0..n-1.

    For ``xxhash64`` the caller should pre-hash the shingle once
    (``F.xxhash64(shingle)``) and pass that column: remixing the long is
    much cheaper than re-hashing the string per seed. For ``md5`` pass
    the raw shingle string (the digest must cover ``seed || shingle``
    for cross-engine parity).
    """
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
