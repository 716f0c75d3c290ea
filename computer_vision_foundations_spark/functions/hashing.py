"""Portable hashing primitives for MinHash / LSH.

Engine-internal hashing (``F.xxhash64``) is fastest, but for
differential testing against external engines we also provide md5-based
MinHash: ``min(md5(seed || shingle))`` over a document's shingle set is
a valid MinHash permutation (md5 is a uniform hash; prefixing a seed
yields an independent permutation per seed), and every SQL engine
computes the identical hex digest — so signatures are bit-identical
across engines. At scale, swap ``md5`` for ``xxhash64`` via
``hash_fn='xxhash64'`` (same structure, ~5× cheaper, loses
cross-engine portability only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _hash_one(shingle: Column, seed: int, hash_fn: str) -> Column:
    prefixed = F.concat(F.lit(f"{seed}:"), shingle)
    if hash_fn == "md5":
        return F.md5(prefixed.cast("binary"))
    if hash_fn == "xxhash64":
        return F.xxhash64(prefixed)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def minhash_column(
    shingles: Column | str, n_hashes: int, hash_fn: str = "md5"
) -> Column:
    """MinHash signature: array of per-seed minima over the shingle set.

    ``array_min(transform(shingles, s -> hash(seed || s)))`` per seed —
    entirely JVM-side; no UDF, no shuffle.
    """
    c = F.col(shingles) if isinstance(shingles, str) else shingles

    # NB: the hash lambda must take exactly one parameter — PySpark
    # binds a second parameter to the array index, not the closure.
    def _lam(seed: int):
        return lambda s: _hash_one(s, seed, hash_fn)

    mins = [
        F.array_min(F.transform(c, _lam(seed))) for seed in range(n_hashes)
    ]
    return F.array(*mins)
