"""Transactional parquet tables: ACID appends, time travel, OPTIMIZE.

The reference writes every table as Delta (`02_Data Ingest.py:273-282`,
`04a_Model Deployment.py:264-269`) and leans on three behaviors the
plain parquet fallback lacks: atomic visibility of a batch of files,
reading an older snapshot, and compacting small files without breaking
readers. This module supplies those behaviors with a minimal
log-structured table format built from the PUBLIC transaction-log
design shared by Delta Lake and Iceberg (an append-only commit log of
immutable data files; Armbrust et al., "Delta Lake: High-Performance
ACID Table Storage over Cloud Object Stores", VLDB 2020):

    table_root/
      _txn_log/
        00000000000000000001.json      one commit: adds/removes + meta
        00000000000000000010.ckpt.json full file-list snapshot
      data/part-<uuid>.parquet         immutable data files

ACID on one primitive: a commit is a hard-link (``os.link``) of a
fully-written temp file onto the next versioned log name. POSIX link
fails with EEXIST if the version was taken — that IS the optimistic
concurrency check (two writers race, exactly one wins, the loser
rebases and retries). Data files are immutable and written BEFORE the
commit, so readers either see the whole commit or none of it, and a
reader holding version N's file list is isolated from every later
writer (snapshot isolation for free).

Scale design: the log carries FILE LISTS, never data — a 100 TB table
with 10⁶ files costs megabytes of JSON. Readers replay adds/removes
from the newest checkpoint (written every ``checkpoint_every``
commits), so log replay is O(commits since last checkpoint), not
O(table age). Row-level ``delete_where``/``upsert`` are copy-on-write:
only files whose rows match are rewritten (file-level skipping keeps
the rewrite proportional to the touched data), and the swap is one
atomic commit. ``optimize`` compacts small files purely as a
metadata+rewrite transaction — concurrent time-travel readers of older
versions are untouched because old files are only ever deleted by an
explicit ``vacuum`` that respects a retention horizon.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "TxnConflict",
    "create_table",
    "write_append",
    "write_overwrite",
    "read_table",
    "prune_files",
    "table_schema",
    "table_changes",
    "table_history",
    "delete_where",
    "upsert",
    "optimize",
    "optimize_zorder",
    "vacuum",
]

_LOG_DIR = "_txn_log"
_DATA_DIR = "data"
_PAD = 20


class TxnConflict(RuntimeError):
    """Another writer committed this version first; rebase and retry."""


def _log_path(root: str) -> str:
    return os.path.join(root, _LOG_DIR)


def _commit_file(root: str, version: int) -> str:
    return os.path.join(_log_path(root), f"{version:0{_PAD}d}.json")


def _ckpt_file(root: str, version: int) -> str:
    return os.path.join(_log_path(root), f"{version:0{_PAD}d}.ckpt.json")


def _list_versions(root: str) -> list[int]:
    log = _log_path(root)
    if not os.path.isdir(log):
        return []
    return sorted(
        int(f.split(".")[0])
        for f in os.listdir(log)
        if f.endswith(".json") and not f.endswith(".ckpt.json")
    )


def _latest_checkpoint(root: str, upto: int) -> tuple[int, list[str]] | None:
    log = _log_path(root)
    if not os.path.isdir(log):
        return None
    ckpts = sorted(
        int(f.split(".")[0])
        for f in os.listdir(log)
        if f.endswith(".ckpt.json") and int(f.split(".")[0]) <= upto
    )
    if not ckpts:
        return None
    v = ckpts[-1]
    with open(_ckpt_file(root, v)) as fh:
        return v, json.load(fh)["files"]


def _read_commit(root: str, version: int) -> dict:
    with open(_commit_file(root, version)) as fh:
        return json.load(fh)


def _resolve_version(root: str, version: int | None, as_of_ts: float | None) -> int:
    versions = _list_versions(root)
    if not versions:
        raise FileNotFoundError(f"no transactional table at {root}")
    if version is not None:
        if version not in versions:
            raise LookupError(f"version {version} not in {root} (have {versions[-1]})")
        return version
    if as_of_ts is not None:
        eligible = [
            v for v in versions if _read_commit(root, v)["ts"] <= as_of_ts
        ]
        if not eligible:
            raise LookupError(f"no commit at or before ts={as_of_ts}")
        return eligible[-1]
    return versions[-1]


def _snapshot_files(root: str, version: int) -> list[str]:
    """Replay the log up to ``version`` from the nearest checkpoint."""
    start, files = 0, []
    ckpt = _latest_checkpoint(root, version)
    if ckpt is not None:
        start, files = ckpt
    fileset = set(files)
    for v in _list_versions(root):
        if v <= start or v > version:
            continue
        c = _read_commit(root, v)
        fileset.difference_update(c.get("removed", []))
        fileset.update(c.get("added", []))
    return sorted(fileset)


def _write_data_files(df: DataFrame, root: str) -> list[str]:
    """Write df as immutable parquet files under data/; returns their
    table-relative names. Spark writes to a scratch dir; files are
    MOVED (same filesystem rename) under data/ with unique names, so
    nothing is visible to any reader until the commit that references
    them."""
    scratch = os.path.join(root, f"_scratch-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(scratch)
    os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)
    moved = []
    for f in sorted(os.listdir(scratch)):
        if not f.endswith(".parquet"):
            continue
        rel = os.path.join(_DATA_DIR, f"part-{uuid.uuid4().hex}.parquet")
        os.rename(os.path.join(scratch, f), os.path.join(root, rel))
        moved.append(rel)
    # best-effort scratch cleanup (crumbs are invisible to readers)
    for f in os.listdir(scratch):
        try:
            os.remove(os.path.join(scratch, f))
        except OSError:
            pass
    os.rmdir(scratch)
    return moved


def _collect_file_stats(root: str, files: list[str]) -> dict:
    """Per-file min/max/null-count column statistics from the parquet
    footers of freshly-written files (a LOCAL metadata read — the
    payload is not scanned). Stored in the commit record so later
    reads can prune files driver-side without opening anything — the
    data-skipping ledger log-structured table formats keep. Only
    JSON-safe leaf types (ints, floats, strings) are recorded; columns
    without footer stats are simply absent (readers must keep such
    files)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow ships with pyspark
        return {}
    out: dict = {}
    for rel in files:
        md = pq.ParquetFile(os.path.join(root, rel)).metadata
        cols: dict = {}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                stats = col.statistics
                if stats is None or not stats.has_min_max:
                    continue
                lo, hi = stats.min, stats.max
                # WHITELIST JSON-safe scalars: timestamps come back as
                # datetime, decimals as Decimal, binaries as bytes —
                # none survive json.dump, all are safely skippable
                # (absent stats just means the file is never pruned
                # on that column)
                if not (
                    isinstance(lo, (int, float, str))
                    and isinstance(hi, (int, float, str))
                    and not isinstance(lo, bool)
                    and not isinstance(hi, bool)
                ):
                    continue
                name = col.path_in_schema
                if "." in name:
                    continue  # nested leaves: skip (prune is top-level)
                prev = cols.get(name)
                if prev is None:
                    cols[name] = [lo, hi]
                else:
                    cols[name] = [min(prev[0], lo), max(prev[1], hi)]
        if cols:
            out[rel] = cols
    return out


def _commits_upto(root: str, version: int) -> list[dict]:
    """Every commit record ≤ ``version``, read ONCE per commit — the
    shared pass read_table uses for both schema history and file
    stats (one JSON open per commit per read, not one per use)."""
    return [
        _read_commit(root, v)
        for v in _list_versions(root)
        if v <= version
    ]


def _stats_for_snapshot(
    root: str, version: int, commits: list[dict] | None = None
) -> dict:
    """Union of per-file stats from every commit up to ``version``
    (files are immutable, so the add-time stats stay valid)."""
    stats: dict = {}
    for rec in commits if commits is not None else _commits_upto(
        root, version
    ):
        stats.update(rec.get("add_stats") or {})
    return stats


# --- Bloom-filter file skipping -------------------------------------------
# min/max ranges prune RANGE predicates but are useless for point
# lookups on high-cardinality unclustered columns (every file's range
# covers the probe). The commit log therefore optionally records a
# small per-file Bloom filter for caller-chosen columns — the same
# design as Parquet/Delta bloom indexes, kept in the log so pruning
# stays a driver-side metadata decision. Hash scheme = the engine's
# portable md5 double-hash (functions/sketches._bloom_positions), so
# the Spark build job and the Python membership check agree bit-|
# for-bit. False positives only cost an un-skipped file; false
# negatives are impossible, which the tests pin.

_BLOOM_M, _BLOOM_K = 2048, 4


_BLOOMABLE_TYPES = ("string", "int", "bigint", "smallint", "tinyint")


def _collect_file_blooms(
    spark: SparkSession,
    root: str,
    files: list[str],
    bloom_cols: list[str],
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
) -> dict:
    """Per-file per-column Bloom bit sets for freshly-committed files,
    computed DISTRIBUTED (ONE Spark job over only the new files, all
    indexed columns in a single pass; ≤ m bits ≈ a few KB per
    file·column come back to the driver — commit-metadata-sized, never
    data-sized).

    Only string and integer columns are indexable: for those, Spark's
    cast-to-string and the driver probe's ``str(value)`` are
    byte-identical, so the no-false-negative guarantee holds. Float /
    boolean / timestamp columns render differently in the two runtimes
    (``1.0E-7`` vs ``1e-07``, ``true`` vs ``True``) and are rejected
    at build time rather than silently mis-pruned at read time."""
    if not files or not bloom_cols:
        return {}
    from urllib.parse import unquote, urlparse

    from computer_vision_foundations_spark.functions.sketches import (
        _bloom_positions,
    )

    paths = [os.path.join(root, f) for f in files]
    df = spark.read.parquet(*paths)
    dtypes = dict(df.dtypes)
    for c in bloom_cols:
        if dtypes.get(c) not in _BLOOMABLE_TYPES:
            raise ValueError(
                f"bloom_cols: column {c!r} has type {dtypes.get(c)!r}; "
                f"only {_BLOOMABLE_TYPES} render identically in Spark "
                "and the driver probe"
            )
    def _tag(name):
        # one-arg lambda factory: a two-parameter lambda would be
        # treated by F.transform as the (element, index) form
        return lambda b: F.struct(
            F.lit(name).alias("col"), b.alias("bit")
        )

    tagged = F.flatten(
        F.array(
            *[
                F.transform(
                    _bloom_positions(F.col(c).cast("string"), m, k),
                    _tag(c),
                )
                for c in bloom_cols
            ]
        )
    )
    rows = (
        df.select(
            F.input_file_name().alias("_f"), F.explode(tagged).alias("e")
        )
        .select("_f", F.col("e.col").alias("col"), F.col("e.bit").alias("bit"))
        .distinct()
        .groupBy("_f", "col")
        .agg(F.collect_list("bit").alias("bits"))
        .collect()
    )
    out: dict = {}
    for r in rows:
        # input_file_name returns a percent-encoded file URI; parse it
        # properly instead of string-replacing "file:"
        local = unquote(urlparse(r["_f"]).path) if "://" in r["_f"] or r[
            "_f"
        ].startswith("file:") else r["_f"]
        rel = os.path.relpath(local, os.path.abspath(root))
        out.setdefault(rel, {})[r["col"]] = {
            "m": m,
            "k": k,
            "bits": sorted(int(b) for b in r["bits"]),
        }
    return out


def _blooms_for_snapshot(
    root: str, version: int, commits: list[dict] | None = None
) -> dict:
    blooms: dict = {}
    for rec in commits if commits is not None else _commits_upto(
        root, version
    ):
        blooms.update(rec.get("add_blooms") or {})
    return blooms


def _bloom_maybe_contains(bloom: dict, value) -> bool:
    """Python twin of the Spark-side position scheme: md5 hex chars
    [1..7]/[8..14] as h1/h2, positions (h1 + i·h2) mod m. Probes must
    be str or int (the only types whose text form matches Spark's
    cast-to-string — enforced at build time too)."""
    import hashlib

    if not isinstance(value, (str, int)) or isinstance(value, bool):
        raise TypeError(
            f"bloom probe must be str or int, got {type(value).__name__}"
        )
    d = hashlib.md5(str(value).encode()).hexdigest()
    h1, h2 = int(d[:7], 16), int(d[7:14], 16)
    bits = set(bloom["bits"])
    m, k = bloom["m"], bloom["k"]
    return all((h1 + i * h2) % m in bits for i in range(k))


def _commit(
    root: str,
    action: str,
    added: list[str],
    removed: list[str],
    expected_version: int | None = None,
    checkpoint_every: int = 10,
    meta: dict | None = None,
    add_stats: dict | None = None,
    add_blooms: dict | None = None,
) -> int:
    """Atomically publish one commit; returns the committed version.

    ``expected_version``: optimistic-concurrency guard — if another
    writer committed after the snapshot this transaction read, raise
    :class:`TxnConflict` instead of publishing (the caller re-reads and
    retries; blind appends pass None and auto-advance)."""
    os.makedirs(_log_path(root), exist_ok=True)
    while True:
        versions = _list_versions(root)
        current = versions[-1] if versions else 0
        if expected_version is not None and current != expected_version:
            raise TxnConflict(
                f"read snapshot v{expected_version} but table is at v{current}"
            )
        target = current + 1
        record = {
            "version": target,
            "action": action,
            "added": added,
            "removed": removed,
            "ts": time.time(),
            "meta": meta or {},
            "add_stats": add_stats or {},
            "add_blooms": add_blooms or {},
        }
        tmp = os.path.join(_log_path(root), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(record, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, _commit_file(root, target))  # EEXIST = lost race
        except FileExistsError:
            os.remove(tmp)
            if expected_version is not None:
                raise TxnConflict(
                    f"version {target} committed concurrently"
                ) from None
            continue  # blind append: rebase onto the new tip and retry
        os.remove(tmp)
        if target % checkpoint_every == 0:
            snap = {"version": target, "files": _snapshot_files(root, target)}
            ctmp = os.path.join(_log_path(root), f".tmp-{uuid.uuid4().hex}")
            with open(ctmp, "w") as fh:
                json.dump(snap, fh)
            os.rename(ctmp, _ckpt_file(root, target))
        return target


def create_table(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    meta: dict | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Create a transactional table from ``df`` (version 1). ``meta``
    entries merge into the commit record alongside the schema (the
    streaming sink stores its txn watermark there so even the
    table-creating batch is replay-proof)."""
    if _list_versions(root):
        raise FileExistsError(f"transactional table already exists at {root}")
    added = _write_data_files(df, root)
    record = {"schema": df.schema.json(), **(meta or {})}
    return _commit(
        root, "create", added, [], meta=record,
        add_stats=_collect_file_stats(root, added),
        add_blooms=_collect_file_blooms(
            spark, root, added, bloom_cols or []
        ),
    )


def table_schema(root: str, version: int | None = None):
    """The snapshot's schema: the most recent commit ≤ version that
    recorded one (create, or a schema-evolving append/overwrite)."""
    from pyspark.sql import types as T

    v = _resolve_version(root, version, None)
    for c in reversed(_list_versions(root)):
        if c > v:
            continue
        schema = _read_commit(root, c)["meta"].get("schema")
        if schema:
            return T.StructType.fromJson(json.loads(schema))
    raise LookupError(f"no schema recorded in {root}")


def _check_schema(root: str, df: DataFrame, merge_schema: bool) -> dict:
    """Schema ENFORCEMENT (the log-structured-format contract a plain
    parquet directory lacks): an incoming batch must carry exactly the
    table's columns with the same types, or the write is rejected —
    silent drift is how petabyte tables rot. With ``merge_schema=True``
    the batch may ADD new columns (evolution): the widened schema is
    recorded in this commit's meta and old files read as NULL for the
    new columns. Returns the meta fragment to attach ({} when the
    schema is unchanged)."""
    current = {f.name: f.dataType for f in table_schema(root).fields}
    incoming = {f.name: f.dataType for f in df.schema.fields}
    missing = set(current) - set(incoming)
    extra = set(incoming) - set(current)
    wrong = {
        n for n in set(current) & set(incoming)
        if current[n] != incoming[n]
    }
    if missing or wrong:
        raise ValueError(
            f"schema mismatch: missing={sorted(missing)} "
            f"type-changed={sorted(wrong)}"
        )
    if extra:
        if not merge_schema:
            raise ValueError(
                f"new columns {sorted(extra)} rejected — pass "
                "merge_schema=True to evolve the table schema"
            )
        return {"schema": df.schema.json()}
    return {}


def write_append(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    merge_schema: bool = False,
    bloom_cols: list[str] | None = None,
) -> int:
    """ACID append: all of ``df``'s files become visible atomically.
    Schema-enforced; ``merge_schema=True`` permits adding columns.

    Concurrency: a SCHEMA-EVOLVING append commits with the OCC guard
    (``expected_version``) — two racing evolutions would otherwise
    each record a schema lacking the other's column; the loser gets
    ``TxnConflict`` and must re-validate. Plain appends stay blind
    (auto-advance): racing a concurrent evolution is safe because
    the evolved read path pins the latest recorded schema and reads
    the plain append's files with NULL for the new columns."""
    current = _resolve_version(root, None, None)
    meta = _check_schema(root, df, merge_schema)
    added = _write_data_files(df, root)
    return _commit(
        root, "append", added, [], meta=meta,
        expected_version=current if meta else None,
        add_stats=_collect_file_stats(root, added),
        add_blooms=_collect_file_blooms(
            spark, root, added, bloom_cols or []
        ),
    )


def write_overwrite(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    merge_schema: bool = False,
    replace_schema: bool = False,
    bloom_cols: list[str] | None = None,
) -> int:
    """Atomic whole-table replace (readers see old or new, never a
    mix). Schema-enforced like append; ``replace_schema=True``
    additionally allows a WHOLESALE schema change (every old file is
    removed in the same commit, so there is no mixed-file hazard) and
    records the new schema."""
    current = _resolve_version(root, None, None)
    if replace_schema:
        meta = {"schema": df.schema.json()}
    else:
        meta = _check_schema(root, df, merge_schema)
    removed = _snapshot_files(root, current)
    added = _write_data_files(df, root)
    return _commit(
        root, "overwrite", added, removed, expected_version=current,
        meta=meta, add_stats=_collect_file_stats(root, added),
        add_blooms=_collect_file_blooms(
            spark, root, added, bloom_cols or []
        ),
    )


def prune_files(
    root: str,
    version: int,
    files: list[str],
    prune: dict | None = None,
    prune_eq: dict | None = None,
) -> list[str]:
    """Data skipping: keep only files whose commit-log min/max ranges
    can intersect every ``{column: (lo, hi)}`` closed interval
    (``prune``) AND whose Bloom filter admits every ``{column: value}``
    point probe (``prune_eq``; only for columns indexed with
    ``bloom_cols`` at write time). Files with no recorded stats/bloom
    for a column are KEPT (safe). Driver-side metadata only — nothing
    is opened or scanned."""
    commits = _commits_upto(root, version)  # ONE pass over the log
    files = _prune_with_stats(
        files, _stats_for_snapshot(root, version, commits), prune or {}
    )
    if prune_eq:
        files = _prune_with_blooms(
            files, _blooms_for_snapshot(root, version, commits), prune_eq
        )
    return files


def _prune_with_blooms(
    files: list[str], blooms: dict, prune_eq: dict
) -> list[str]:
    kept = []
    for f in files:
        cols = blooms.get(f) or {}
        keep = True
        for col, value in prune_eq.items():
            bloom = cols.get(col)
            if bloom is None:
                continue  # unindexed: conservative keep
            if not _bloom_maybe_contains(bloom, value):
                keep = False
                break
        if keep:
            kept.append(f)
    return kept


def _prune_with_stats(files: list[str], stats: dict, prune: dict) -> list[str]:
    kept = []
    for f in files:
        cols = stats.get(f) or {}
        keep = True
        for col, (lo, hi) in prune.items():
            rng = cols.get(col)
            if rng is None:
                continue
            try:
                if rng[1] < lo or rng[0] > hi:
                    keep = False
                    break
            except TypeError:
                # bounds/stats type mismatch (e.g. numeric interval on
                # a string column): CONSERVATIVE — keep the file; the
                # caller's row filter decides
                continue
        if keep:
            kept.append(f)
    return kept


def read_table(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    as_of_ts: float | None = None,
    prune: dict | None = None,
) -> DataFrame:
    """Snapshot read — latest by default, or time travel by ``version``
    / ``as_of_ts`` (last commit at or before the timestamp).

    ``prune={"col": (lo, hi), ...}`` applies commit-log data skipping:
    files whose recorded min/max cannot intersect the intervals are
    dropped from the scan BEFORE Spark sees them (plan-time file-list
    pruning; composes with ``optimize_zorder``, which makes the ranges
    tight). Pruning is metadata-only and conservative — the caller
    still applies its own row filter; equal results, fewer files.

    A path carrying a REAL ``_delta_log`` (a table written by actual
    Delta Lake) is routed to ``sources/delta_reader.py`` — same
    snapshot/time-travel semantics over the public protocol. ``prune``
    is ignored there (a no-op optimization; results are identical)."""
    from pyspark.sql import types as T

    from computer_vision_foundations_spark.sources import delta_reader

    if delta_reader.is_delta_table(root):
        return delta_reader.read_delta(
            spark, root, version=version, as_of_ts=as_of_ts
        )

    v = _resolve_version(root, version, as_of_ts)
    files = _snapshot_files(root, v)
    commits = _commits_upto(root, v)  # ONE pass over the log
    schemas = [
        c["meta"]["schema"] for c in commits if c["meta"].get("schema")
    ]
    if prune and files:
        files = _prune_with_stats(
            files, _stats_for_snapshot(root, v, commits), prune
        )
    if not files:
        # empty snapshot: the LATEST recorded schema (evolution-aware)
        return spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(schemas[-1]))
        )
    reader = spark.read
    if len(set(schemas)) > 1:
        # evolved table: pin the reader to the snapshot's recorded
        # schema — pre-evolution files surface NULL for later-added
        # columns, and (unlike footer mergeSchema) PRUNING can never
        # change the returned schema
        reader = reader.schema(T.StructType.fromJson(json.loads(schemas[-1])))
    return reader.parquet(*[os.path.join(root, f) for f in files])


def table_changes(
    spark: SparkSession,
    root: str,
    from_version: int,
    to_version: int,
    key_cols: list[str],
    fingerprint_col: str,
) -> DataFrame:
    """Change data feed between two committed versions: one row per
    key whose membership or content changed — ``(key…, _change_type)``
    with _change_type ∈ insert | delete | update (unchanged keys are
    dropped). Derived by diffing the two immutable snapshots
    (``operators/diff.snapshot_diff`` underneath): time travel makes
    every version a first-class relation, so the feed needs no
    write-path hooks and works retroactively over any version pair.
    Only (key, 16-byte fingerprint) pairs shuffle — payloads never
    cross the join, the same scale shape as the corpus diff."""
    from computer_vision_foundations_spark.operators.diff import (
        snapshot_diff,
    )

    if len(key_cols) != 1:
        raise ValueError("table_changes keys on exactly one column")
    key = key_cols[0]
    old = read_table(spark, root, version=from_version)
    new = read_table(spark, root, version=to_version)
    status = snapshot_diff(old, new, id_col=key, text_col=fingerprint_col)
    return status.filter(F.col("status") != "unchanged").select(
        key,
        F.when(F.col("status") == "added", "insert")
        .when(F.col("status") == "removed", "delete")
        .otherwise("update")
        .alias("_change_type"),
    )


def table_history(root: str) -> list[dict]:
    """All commits oldest→newest (version, action, ts, file deltas)."""
    return [_read_commit(root, v) for v in _list_versions(root)]


def _to_relative(files: list[str], uris: list[str]) -> list[str]:
    """Map ``input_file_name()`` URIs back to table-relative names
    (basenames are uuid-unique by construction)."""
    by_name = {os.path.basename(f): f for f in files}
    return sorted(by_name[os.path.basename(u)] for u in uris)


def _files_matching(
    spark: SparkSession, root: str, files: list[str], predicate
) -> list[str]:
    """File-level skipping for copy-on-write: ONE distributed job tags
    matching rows with ``input_file_name()`` and returns the distinct
    file set — the filter is pushed into the parquet scan (row-group
    stats prune), and the result is file-count-sized, so this is the
    shape that survives a 10⁶-file table."""
    if not files:
        return []
    hit = (
        spark.read.parquet(*[os.path.join(root, f) for f in files])
        .filter(predicate)
        .select(F.input_file_name().alias("_f"))
        .distinct()
        .collect()
    )
    return _to_relative(files, [r["_f"] for r in hit])


def delete_where(spark: SparkSession, root: str, predicate) -> int:
    """Copy-on-write row delete: rewrite only the files that contain
    matching rows, swap them in one atomic commit."""
    current = _resolve_version(root, None, None)
    files = _snapshot_files(root, current)
    touched = _files_matching(spark, root, files, predicate)
    if not touched:
        return current
    survivors = spark.read.parquet(
        *[os.path.join(root, f) for f in touched]
    ).filter(~predicate)
    added = _write_data_files(survivors, root) if survivors.limit(1).count() else []
    return _commit(
        root, "delete", added, touched, expected_version=current,
        add_stats=_collect_file_stats(root, added),
    )


def upsert(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_cols: list[str],
    meta: dict | None = None,
) -> int:
    """Copy-on-write MERGE: rows in ``updates`` replace same-key rows,
    new keys append — the batch twin of ``streaming/upsert.py``'s
    foreachBatch sink. Only files containing a matched key are
    rewritten. ``meta`` rides the commit record (the streaming sink
    stores its ``{"txn": {app_id: batch_id}}`` watermark there for
    replay-proof exactly-once). Updates must carry EXACTLY the table
    schema (no evolution through the merge path — evolve with
    ``write_append(merge_schema=True)`` first)."""
    current = _resolve_version(root, None, None)
    _check_schema(root, updates, merge_schema=False)
    files = _snapshot_files(root, current)
    if files:
        # one distributed semi-join finds the touched files — update
        # keys broadcast, table rows never shuffle, result is
        # file-count-sized
        hit = (
            spark.read.parquet(*[os.path.join(root, f) for f in files])
            .withColumn("_f", F.input_file_name())
            .join(
                F.broadcast(updates.select(*key_cols).distinct()),
                key_cols,
                "left_semi",
            )
            .select("_f")
            .distinct()
            .collect()
        )
        touched = _to_relative(files, [r["_f"] for r in hit])
    else:
        touched = []
    parts = [updates]
    if touched:
        old = spark.read.parquet(*[os.path.join(root, f) for f in touched])
        parts.append(old.join(updates.select(*key_cols), key_cols, "left_anti"))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    added = _write_data_files(merged, root)
    return _commit(
        root, "upsert", added, touched, expected_version=current, meta=meta,
        add_stats=_collect_file_stats(root, added),
    )


def optimize(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    small_file_bytes: int | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Compact small files (the OPTIMIZE the streaming sink's
    small-file fan-out needs): pick the current snapshot's
    smaller-than-threshold files from FILESYSTEM METADATA (no Spark
    job for the planning pass), rewrite them at ``target_file_bytes``,
    publish as one remove+add commit. Data is unchanged — time travel
    to any earlier version still resolves to the original files."""
    current = _resolve_version(root, None, None)
    files = _snapshot_files(root, current)
    threshold = small_file_bytes or target_file_bytes // 2
    small, total_bytes = [], 0
    for f in files:
        sz = os.path.getsize(os.path.join(root, f))
        if sz < threshold:
            small.append(f)
            total_bytes += sz
    if len(small) < 2:
        return current
    df = spark.read.parquet(*[os.path.join(root, f) for f in small])
    n_out = max(1, -(-total_bytes // target_file_bytes))
    added = _write_data_files(df.repartition(n_out), root)
    return _commit(
        root, "optimize", added, small, expected_version=current,
        add_stats=_collect_file_stats(root, added),
        add_blooms=_collect_file_blooms(
            spark, root, added, bloom_cols or []
        ),
    )


def optimize_zorder(
    spark: SparkSession,
    root: str,
    cols: list[str],
    bits: int = 16,
    target_file_bytes: int = 128 * 1024 * 1024,
    bloom_cols: list[str] | None = None,
) -> int:
    """Rewrite the current snapshot clustered by a Morton z-order key
    over ``cols`` (the `OPTIMIZE ... ZORDER BY` shape of log-structured
    table formats): every data file afterwards spans a compact
    multi-column range, so min/max footer stats prune multi-column
    filters that a single sort column cannot. Data is unchanged; the
    rewrite publishes as ONE remove+add commit, and time travel to any
    earlier version still resolves to the original files.

    ``cols`` must be non-negative integers in ``[0, 2^bits)`` (bucket
    or quantize wider domains first — ``operators/zorder.zorder_key``
    documents the interleave). At 100 TB, z-order the frequently
    co-filtered dimensions of the biggest table once; every later scan
    with those predicates reads a small file subset."""
    from computer_vision_foundations_spark.operators.zorder import (
        layout_by_zorder,
    )

    current = _resolve_version(root, None, None)
    files = _snapshot_files(root, current)
    if not files:
        return current
    paths = [os.path.join(root, f) for f in files]
    total_bytes = sum(os.path.getsize(p) for p in paths)
    n_out = max(1, -(-total_bytes // target_file_bytes))
    clustered = layout_by_zorder(
        spark.read.parquet(*paths), cols, bits=bits, n_files=n_out
    )
    added = _write_data_files(clustered, root)
    return _commit(
        root,
        "optimize_zorder",
        added,
        files,
        expected_version=current,
        meta={"zorder_by": list(cols), "bits": bits},
        add_stats=_collect_file_stats(root, added),
        add_blooms=_collect_file_blooms(
            spark, root, added, bloom_cols or []
        ),
    )


def vacuum(root: str, retain_last: int = 5) -> list[str]:
    """Delete data files unreferenced by the last ``retain_last``
    versions (and drop the log entries older than the horizon's
    checkpoint coverage requires). Time travel inside the retention
    window keeps working; beyond it is explicitly given up — the
    documented Delta/Iceberg trade."""
    versions = _list_versions(root)
    if not versions:
        return []
    keep_versions = versions[-retain_last:]
    referenced: set[str] = set()
    for v in keep_versions:
        referenced.update(_snapshot_files(root, v))
    data_dir = os.path.join(root, _DATA_DIR)
    removed = []
    for f in sorted(os.listdir(data_dir)):
        rel = os.path.join(_DATA_DIR, f)
        if rel not in referenced:
            os.remove(os.path.join(root, rel))
            removed.append(rel)
    return removed
