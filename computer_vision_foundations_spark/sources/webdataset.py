"""WebDataset-style tar shard export/ingest for multimodal training.

Training loops for vision(-language) models stream SHARDED TAR files
— the WebDataset convention (Aizman et al. 2019): each sample is a
group of same-stem members (``<key>.png`` payload + ``<key>.json``
metadata), shards are a few hundred MB, and sequential tar reads give
the I/O pattern object stores and dataloaders want. The reference
feeds its training from a parquet cache (`03_Model Training.py` via
Petastorm); tar shards are the other half of that story — the export
a PyTorch/WebDataset consumer reads directly, with no Spark at
training time.

Determinism is a first-class property here (same data ⇒ same shard
BYTES): samples are assigned to shards by md5(key) — stable under
repartitioning — ordered inside each shard by key, and tar headers
pin mtime/uid/gid/mode, so a re-export of identical data is
byte-identical (testable, diffable, cacheable). USTAR format keeps
readers maximally compatible.

Scale shape: one narrow projection + ONE keyed shuffle (hash
repartition on the shard id); each task streams its shard groups to
tar files directly from the executor — sample bytes never visit the
driver, shard files are written in parallel. Reading back is a
``binaryFile`` scan of ``*.tar`` + an Arrow-batched tar parse —
narrow, splittable at shard granularity (the WebDataset unit of
parallelism).
"""

from __future__ import annotations

import io
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["write_webdataset_shards", "read_webdataset"]


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    ti = tarfile.TarInfo(name)
    ti.size = size
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    key_col: str = "key",
    content_col: str = "content",
    meta_cols: list[str] | None = None,
    n_shards: int = 4,
    ext: str = "png",
) -> list[str]:
    """Export ``df`` as WebDataset tar shards under ``path``:
    ``shard-{00000..}.tar`` each holding, per sample,
    ``<key>.<ext>`` (the binary payload) and ``<key>.json`` (the
    metadata columns as a JSON object). Returns the shard file paths.
    Byte-deterministic: md5-keyed shard assignment, key-sorted member
    order, zeroed tar timestamps/ownership."""
    meta_cols = meta_cols or []
    os.makedirs(path, exist_ok=True)
    # a re-export must not leave stale shards behind (a smaller
    # n_shards or different data would otherwise mix old samples into
    # the new dataset on read-back)
    for f in os.listdir(path):
        if f.startswith("shard-") and f.endswith(".tar"):
            os.remove(os.path.join(path, f))

    shard_expr = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_shards
    )
    prepared = (
        df.select(
            F.col(key_col).cast("string").alias("_key"),
            F.col(content_col).alias("_content"),
            F.to_json(F.struct(*meta_cols)).alias("_meta")
            if meta_cols
            else F.lit("{}").alias("_meta"),
            shard_expr.alias("_shard"),
        )
        .repartition(n_shards, "_shard")
        .sortWithinPartitions("_shard", "_key")
    )

    def write_partition(rows) -> None:
        tars: dict[int, tarfile.TarFile] = {}
        try:
            for r in rows:
                sid = int(r["_shard"])
                if sid not in tars:
                    tars[sid] = tarfile.open(
                        os.path.join(path, f"shard-{sid:05d}.tar"),
                        "w",
                        format=tarfile.USTAR_FORMAT,
                    )
                tf = tars[sid]
                payload = bytes(r["_content"]) if r["_content"] else b""
                tf.addfile(
                    _tarinfo(f"{r['_key']}.{ext}", len(payload)),
                    io.BytesIO(payload),
                )
                meta = (r["_meta"] or "{}").encode()
                tf.addfile(
                    _tarinfo(f"{r['_key']}.json", len(meta)),
                    io.BytesIO(meta),
                )
        finally:
            for tf in tars.values():
                tf.close()

    prepared.foreachPartition(write_partition)
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.startswith("shard-") and f.endswith(".tar")
    )


def read_webdataset(
    spark: SparkSession, path: str, ext: str = "png"
) -> DataFrame:
    """Scan WebDataset shards back into ``(key, content, meta)`` rows:
    a ``binaryFile`` read of ``*.tar`` (one input row per shard — the
    WebDataset parallelism unit) + an Arrow-batched tar parse that
    groups members by stem. Samples missing either member are
    dropped (WebDataset's grouping convention)."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", T.StringType()),
        ]
    )

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("content")
    )

    def parse(batches):
        for batch in batches:
            keys, contents, metas = [], [], []
            for blob in batch["content"]:
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(blob)), mode="r"
                ) as tf:
                    samples: dict[str, dict] = {}
                    for member in tf.getmembers():
                        if not member.isfile():
                            continue  # directories/links from foreign tools
                        stem, dot, suffix = member.name.rpartition(".")
                        if not dot:
                            continue
                        data = tf.extractfile(member).read()
                        samples.setdefault(stem, {})[suffix] = data
                    for stem in sorted(samples):
                        parts = samples[stem]
                        if ext in parts and "json" in parts:
                            keys.append(stem)
                            contents.append(parts[ext])
                            metas.append(parts["json"].decode())
            yield pd.DataFrame(
                {"key": keys, "content": contents, "meta": metas}
            )

    return raw.mapInPandas(parse, schema)
