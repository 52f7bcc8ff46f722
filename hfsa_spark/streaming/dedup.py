"""Streaming exact dedup: drop re-ingested duplicate documents across
micro-batches while a corpus streams in.

The batch form (operators/dedup.py::exact_dedup) collapses duplicates in
one pass; here the engine must remember digests *across* micro-batches.
Spark's streaming ``dropDuplicates`` keeps the seen-key set in the state
store — exactly-once emission of the first arrival of each digest, no
matter which batch later copies land in.

Scale: state size is O(#distinct digests) — 16 bytes of md5 per distinct
document, partitioned by the shuffle on the digest column. For unbounded
streams pass ``watermark=(ts_col, delay)`` to use
``dropDuplicatesWithinWatermark`` so state older than the watermark is
evicted (late duplicates beyond the delay are then admitted — the standard
trade; an fsimage-extract stream is finite so the default keeps all state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hfsa_spark.operators.dedup import normalize_text


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    watermark: tuple[str, str] | None = None,
) -> DataFrame:
    """First-arrival-wins exact dedup on the normalized-text digest.

    Returns the input rows (plus ``digest``) with cross-batch duplicates
    dropped. ``watermark=(ts_col, "10 minutes")`` bounds state for
    unbounded streams.
    """
    out = stream.withColumn("digest", F.md5(normalize_text(text_col)))
    if watermark is not None:
        ts_col, delay = watermark
        return out.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["digest"]
        )
    return out.dropDuplicates(["digest"])
