"""Sequence packing: greedy next-fit assignment of documents into
fixed-capacity token sequences (context-window packing for training).

Beyond-reference surface: after chunking (operators/text.py::
chunk_documents splits ONE long doc into windows), a pre-train loader
PACKS many short docs into one context window to avoid padding waste.
Next-fit is the standard streaming policy: walk docs in a deterministic
order, append to the current sequence while it fits, else start a new
one — sequential by definition, so the parallel unit is the group.

Scale notes:
* Packing runs per ``group_col`` via Arrow-batched ``applyInPandas`` —
  one shuffle on the group, then a linear in-memory walk per group
  (numpy cumsum-free loop; the state is two scalars). A group must fit
  one executor's memory: at 100 TB pack within (source, shard) where
  shard = hash-bucket of the doc id — next-fit's output quality is
  unchanged by sharding (each shard wastes < capacity tokens at its
  tail), and every shard packs in parallel.
* Sequence ids are (group-local, dense from 1); pair with the group
  columns for a global id — avoids a global counter, which would be a
  total-order bottleneck.
* The walk is O(n) per group with two integer registers — no pandas
  row-wise apply, no per-row Python objects beyond the loop itself.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hfsa_spark.functions.hashing import portable_hash64


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each row a ``seq_id`` (1-based within its group) and
    ``seq_offset`` (tokens already in that sequence before this row)
    by next-fit packing in ``order_col`` order.

    Semantics (pinned for the cross-engine oracle):
    * a row fits iff fill + tokens ≤ capacity;
    * a row with tokens > capacity gets a sequence of its own (kept
      whole and over-full — truncation is the loader's call, flagged
      here by ``seq_offset = 0`` and tokens > capacity);
    * fill resets to the row's tokens when a new sequence starts.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("seq_id", T.LongType()),
            T.StructField("seq_offset", T.LongType()),
        ]
    )
    cap = int(capacity)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[tokens_col].astype("int64").to_numpy()
        seq_ids = [0] * len(toks)
        offsets = [0] * len(toks)
        seq, fill = 0, cap + 1  # force a new sequence on the first row
        for i, t in enumerate(toks):
            t = int(t)
            if fill + t <= cap:
                offsets[i] = fill
                fill += t
            else:
                seq += 1
                offsets[i] = 0
                fill = t
            seq_ids[i] = seq
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    return df.groupBy(group_col).applyInPandas(pack, schema=out_schema)


def packing_efficiency(
    packed: DataFrame,
    group_col: str,
    tokens_col: str,
    capacity: int,
) -> DataFrame:
    """Per-group packing audit: sequences used, token fill ratio vs the
    lower bound ceil(Σtokens / capacity) — the number a loader checks
    before accepting a packing. Map-combinable aggregation, one shuffle.
    """
    cap = int(capacity)
    agg = packed.groupBy(group_col).agg(
        F.countDistinct("seq_id").alias("n_seqs"),
        F.sum(F.col(tokens_col).cast("long")).alias("total_tokens"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    lower = F.ceil(F.col("total_tokens") / F.lit(cap))
    return agg.select(
        group_col,
        "n_rows",
        "n_seqs",
        "total_tokens",
        lower.cast("long").alias("min_seqs"),
        F.floor(
            F.col("total_tokens") * 1000 / (F.col("n_seqs") * F.lit(cap))
        ).cast("long").alias("fill_permille"),
    )


def length_bucket_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_tokens",
    batch_size: int = 8,
    bucket_edges: tuple[int, ...] = (16, 32, 64, 128),
) -> DataFrame:
    """Length-bucketed batching — the inference/training loader policy
    that minimizes padding waste: documents go to the bucket of the
    smallest edge ≥ their length (longer → last bucket), then form
    fixed-size batches within the bucket in (length desc, id) order.
    Each batch pads to ITS OWN max length, so mixing a 500-token doc
    with a 10-token doc never happens.

    Output per document: bucket, batch_idx (bucket-local, dense from 1),
    batch_max_len (the batch's padded width), pad_tokens
    (batch_max_len − length) — ``SUM(pad_tokens) / SUM(batch_max_len)``
    is the fleet-level padding-waste rate, and comparing it against the
    single-global-batch baseline is the audit every serving team runs.

    Determinism/scale: bucket assignment is a map-only CASE expression;
    batching is two windows partitioned BY BUCKET (shuffle keyed on the
    few buckets — at extreme scale add a shard key to the partition like
    :func:`pack_sequences` does, which leaves ≤ 1 ragged batch per
    shard). No UDFs, total orders everywhere, engine-reproducible.
    """
    edges = sorted(bucket_edges)
    bucket = F.lit(len(edges))
    for i, e in reversed(list(enumerate(edges))):
        bucket = F.when(F.col(length_col) <= e, F.lit(i)).otherwise(bucket)
    out = df.select(F.col(id_col), F.col(length_col), bucket.alias("bucket"))
    wo = Window.partitionBy("bucket").orderBy(
        F.col(length_col).desc(), F.col(id_col).asc()
    )
    out = out.withColumn(
        "batch_idx",
        ((F.row_number().over(wo) - 1) / batch_size).cast("int") + 1,
    )
    wb = Window.partitionBy("bucket", "batch_idx")
    return out.select(
        id_col,
        length_col,
        "bucket",
        "batch_idx",
        F.max(length_col).over(wb).alias("batch_max_len"),
        (F.max(length_col).over(wb) - F.col(length_col)).alias("pad_tokens"),
    )


def token_budget_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_shard: int = 4096,
    shard_col: str | None = None,
) -> DataFrame:
    """Assign documents to export shards so each shard carries roughly
    ``tokens_per_shard`` tokens — the manifest step before a sharded
    JSONL/WebDataset write when shards must be SIZE-balanced in tokens,
    not in documents (downstream training reads shards round-robin, so a
    fat shard = a straggler).

    Deterministic: docs in ``id_col`` order, shard = floor((cumulative
    tokens BEFORE this doc) / budget) — a document lands wholly in one
    shard (never split), shards can overshoot by at most one document.
    Returns (id, n_tokens, shard_id); feed the pairs to
    ``sinks.jsonl.write_jsonl_shards``-style writers partitioned by
    ``shard_id``.

    Scale: with ``shard_col=None`` the running sum is a single
    total-order window — fine for manifests up to ~10⁸ docs. Beyond
    that pass ``shard_col`` (e.g. source): the running sum then
    partitions by the group key (parallel windows), each group packs
    its own 0-based shard sequence, and global shard ids are the
    group's shard count offset by all lexicographically-earlier
    groups — offsets via a broadcast inequality self-join over the tiny
    per-group summary, never a global window. Groups never share a
    shard (the group boundary is also a shard boundary); with a
    single-valued group key the output is IDENTICAL to the global form
    (pytest-pinned).
    """
    from hfsa_spark.operators.text import token_count

    if shard_col is None:
        w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
        toks = df.select(
            F.col(id_col), token_count(text_col).cast("long").alias("n_tokens")
        )
        cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        return toks.withColumn(
            "shard_id", F.floor(cum_before / tokens_per_shard).cast("int")
        )

    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = df.select(
        F.col(shard_col),
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"),
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    local = toks.withColumn(
        "_local", F.floor(cum_before / tokens_per_shard).cast("int")
    )
    # per-group shard counts (tiny: one row per group) → global offsets
    # by broadcast inequality self-join, no single-partition window
    per_g = local.groupBy(shard_col).agg(
        (F.max("_local") + 1).alias("_nsh")
    )
    prior = per_g.select(
        F.col(shard_col).alias("_pg"), F.col("_nsh").alias("_pn")
    )
    # NULL group keys are real groups (ordered LAST) and the join-back is
    # null-safe — documents with a missing group value are never dropped
    g_before = (F.col("_pg") < F.col(shard_col)) | (
        F.col("_pg").isNotNull() & F.col(shard_col).isNull()
    )
    off = (
        per_g.join(F.broadcast(prior), g_before, "left")
        .groupBy(shard_col)
        .agg(F.coalesce(F.sum("_pn"), F.lit(0)).alias("_off"))
    )
    offr = off.select(F.col(shard_col).alias("_og"), "_off")
    return (
        local.join(
            F.broadcast(offr), F.col(shard_col).eqNullSafe(F.col("_og"))
        )
        .select(
            id_col,
            "n_tokens",
            # long: the shard_col path targets manifests past 2^31 rows
            (F.col("_off") + F.col("_local")).cast("long").alias("shard_id"),
            shard_col,
        )
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fim_rate_num: int = 1,
    fim_rate_den: int = 2,
    pre_tok: str = "<|fim_pre|>",
    suf_tok: str = "<|fim_suf|>",
    mid_tok: str = "<|fim_mid|>",
) -> DataFrame:
    """Fill-in-the-middle training transform (Bavarian et al. 2022,
    "Efficient Training of Language Models to Fill in the Middle"): for a
    deterministic ``fim_rate`` fraction of docs, two content-free hash
    cut points split the text into prefix/middle/suffix and the doc is
    re-serialized in PSM order — PRE prefix SUF suffix MID middle — so
    the model learns infilling; the rest pass through unchanged. Being
    hash-seeded, the SAME doc always gets the SAME cuts: re-runs and
    retries produce identical training bytes (the reproducibility
    requirement for checkpoint-resumable data pipelines).

    Output: (id, fim_applied, cut_lo, cut_hi, out_text).

    Scale: pure map-side expressions (two hashes, three substrings, one
    concat) in whole-stage codegen; no shuffle, no UDF.
    """
    t = F.col(text_col)
    n = F.length(t)
    h1 = portable_hash64(t, seed=301) % (n + 1)
    h2 = portable_hash64(t, seed=302) % (n + 1)
    lo = F.least(h1, h2)
    hi = F.greatest(h1, h2)
    applied = (
        portable_hash64(F.col(id_col).cast("string"), seed=303) % fim_rate_den
    ) < fim_rate_num
    psm = F.concat(
        F.lit(pre_tok),
        t.substr(F.lit(1), lo),
        F.lit(suf_tok),
        t.substr(hi + 1, n - hi),
        F.lit(mid_tok),
        t.substr(lo + 1, hi - lo),
    )
    return df.select(
        F.col(id_col),
        applied.alias("fim_applied"),
        F.when(applied, lo).otherwise(F.lit(None)).cast("long").alias("cut_lo"),
        F.when(applied, hi).otherwise(F.lit(None)).cast("long").alias("cut_hi"),
        F.when(applied, psm).otherwise(t).alias("out_text"),
    )
