"""WebDataset-style tar sharding for multimodal corpora.

WebDataset (public format: github.com/webdataset/webdataset) stores a
sample as adjacent tar members sharing a basename — ``000042.jpg`` +
``000042.json`` — and a dataset as a directory of fixed-size ``.tar``
shards. It is the de-facto interchange format for image/audio training
corpora because a tar shard streams sequentially (no per-file metadata
round trips) and shards are the natural unit of parallelism.

This module is the Spark-native bridge, stdlib-only (``tarfile``):

* :func:`write_wds_shards` — (doc_id, payload[, meta]) rows → ``.tar``
  shards. Sharding is deterministic (``doc_id % n_shards``), each shard
  is written by exactly ONE task (groupBy shard → applyInPandas), members
  are ordered by doc_id, and mtimes are pinned to 0 — so a rewrite of the
  same data is byte-identical (content-addressable storage stays happy).
* :func:`read_wds_shards` — shard files → (doc_id, payload, meta) rows,
  one Arrow batch per shard, shards read in parallel (parallelize over
  file list; at cluster scale swap the local listing for the object-store
  manifest). Round-trips :func:`write_wds_shards` exactly.

Scale notes: a shard must fit one task's memory (standard WebDataset
practice keeps shards ~100 MB–1 GB); payload bytes cross the shuffle once
(keyed on the shard id); reading is embarrassingly parallel with zero
shuffles.
"""

from __future__ import annotations

import io
import json as _json
import os
import tarfile

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_wds_shards(
    media: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    ext: str = "bin",
    meta_cols: tuple[str, ...] = (),
) -> list[str]:
    """Write ``media`` as WebDataset tar shards ``shard-{i:05d}.tar``.

    Each sample becomes ``{doc_id:012d}.{ext}`` (payload bytes) plus, when
    ``meta_cols`` is non-empty, ``{doc_id:012d}.json`` (the metadata
    columns as a JSON object). Returns the shard paths written.
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = [id_col, payload_col, *meta_cols]

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        pdf = pdf.sort_values(id_col)
        with tarfile.open(path, "w") as tf:
            for _, r in pdf.iterrows():
                base = f"{int(r[id_col]):012d}"
                payload = bytes(r[payload_col]) if r[payload_col] is not None else b""
                info = tarfile.TarInfo(f"{base}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(payload))
                if meta_cols:
                    meta = _json.dumps(
                        {c: _plain(r[c]) for c in meta_cols}, sort_keys=True
                    ).encode()
                    mi = tarfile.TarInfo(f"{base}.json")
                    mi.size = len(meta)
                    mi.mtime = 0
                    tf.addfile(mi, io.BytesIO(meta))
        return pd.DataFrame({"shard": [shard], "n_samples": [len(pdf)], "path": [path]})

    manifest = (
        media.select(*cols)
        .withColumn("__shard", (F.col(id_col) % n_shards).cast("int"))
        .groupBy("__shard")
        .applyInPandas(write_shard, schema="shard int, n_samples long, path string")
        .collect()
    )
    return [r["path"] for r in sorted(manifest, key=lambda r: r["shard"])]


def _plain(v):
    """numpy scalar → python scalar for json."""
    return v.item() if hasattr(v, "item") else v


def read_wds_shards(
    spark: SparkSession,
    in_dir: str,
    ext: str = "bin",
    with_meta: bool = False,
) -> DataFrame:
    """Read a :func:`write_wds_shards` directory back as
    (doc_id, payload[, meta]) — one task per shard, no shuffle."""
    paths = sorted(
        os.path.join(in_dir, f)
        for f in os.listdir(in_dir)
        if f.endswith(".tar")
    )
    pdf = spark.createDataFrame([(p,) for p in paths], "path string").repartition(
        max(len(paths), 1)
    )

    def read_shard(batches):
        for batch in batches:
            for path in batch["path"]:
                ids, payloads, metas = [], [], []
                with tarfile.open(path, "r") as tf:
                    samples: dict[str, dict] = {}
                    for m in tf.getmembers():
                        base, _, mext = m.name.partition(".")
                        samples.setdefault(base, {})[mext] = tf.extractfile(m).read()
                    for base in sorted(samples):
                        ids.append(int(base))
                        payloads.append(samples[base].get(ext, b""))
                        metas.append(
                            samples[base].get("json", b"{}").decode() if with_meta else "{}"
                        )
                out = pd.DataFrame(
                    {"doc_id": ids, "payload": payloads, "meta": metas}
                )
                yield out if with_meta else out[["doc_id", "payload"]]

    schema = (
        "doc_id bigint, payload binary, meta string"
        if with_meta
        else "doc_id bigint, payload binary"
    )
    return pdf.mapInPandas(read_shard, schema=schema)
