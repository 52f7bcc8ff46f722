"""Approximate (sketch-based) aggregations: the 100 TB path for distinct
counts and quantiles, where exact answers need a full shuffle of every
distinct value but a sketch is a few KB per group, merged map-side.

Beyond-reference surface: the reference computes only exact counts
(single-node, it can afford to); at cluster scale approximate-first is
the default and exact is the audit path. Each helper returns BOTH the
sketch estimate and (optionally) the exact value so callers — and the
correctness gate — can bound the error instead of trusting it.

Scale notes:
* ``approx_count_distinct`` is HyperLogLog++: fixed-size registers,
  map-side partial merge — the shuffle carries one sketch per
  (partition, group) instead of one row per distinct value. rsd=0.05
  → ~1.5 KB per sketch; rsd=0.01 → ~24 KB.
* ``approx_percentile`` (Greenwald-Khanna variant) is likewise
  mergeable; accuracy parameter trades memory for rank error.
* Exact companions are plain countDistinct/percentile — use them at
  audit time or on pre-aggregated slices, not per-query at full scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def approx_distinct_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.05,
    bound: float = 0.15,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group distinct-count estimate (HLL++, relative std dev ``rsd``)
    next to the exact count and a ``within_bound`` check
    (|approx − exact| ≤ bound·exact). At audit scale keep
    ``with_exact=True``; at 100 TB run with ``with_exact=False`` and the
    shuffle shrinks from one row per distinct value to one sketch per
    group per partition.
    """
    aggs = [
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_nd"),
    ]
    if with_exact:
        aggs.append(F.count_distinct(F.col(value_col)).alias("exact_nd"))
    out = df.groupBy(group_col).agg(*aggs)
    if with_exact:
        err = F.abs(F.col("approx_nd") - F.col("exact_nd"))
        out = out.withColumn(
            "within_bound", err <= F.lit(bound) * F.col("exact_nd")
        )
    return out


def frequent_items(
    df: DataFrame,
    value_col: str,
    capacity: int = 64,
    k: int = 10,
) -> DataFrame:
    """Heavy hitters via distributed Misra-Gries (space-saving family):
    each partition keeps a ``capacity``-counter summary, the per-partition
    summaries merge associatively, and the top ``k`` survivors are
    reported as (value, min_count, max_count) bounds. NULL values are
    excluded from the sketch (dropped before counting, see below).

    Guarantees (classic MG): per partition, a counter under-counts its
    value by at most that partition's decrement-event count; a value
    missing from a partition's summary occurred there at most that many
    times. So ``min_count = Σ counters ≤ true ≤ min_count + Σ events =
    max_count``, and every value with true frequency > Σ events survives
    somewhere. When ``capacity`` ≥ distinct(value) there are no decrements
    and the sketch is EXACT — the property the gate oracle pins.

    Scale: the shuffle carries ``capacity`` rows per partition (one MG
    summary), NOT one row per distinct value — the point of the sketch at
    100 TB. Per-partition summaries run via ``mapInPandas`` (Arrow, one
    dict fold per batch); the merge is a plain groupBy on surviving values
    plus a broadcast global event total.
    """
    from collections.abc import Iterator

    import pandas as pd

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        events = 0
        for batch in batches:
            for v in batch[value_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all event: every counter loses 1, the new
                    # item's implicit count of 1 is absorbed
                    events += 1
                    dead = [u for u, c in counters.items() if c == 1]
                    for u in dead:
                        del counters[u]
                    for u in counters:
                        counters[u] -= 1
        yield pd.DataFrame(
            {
                "value": list(counters.keys()) + [None],
                "cnt": list(counters.values()) + [0],
                "events": [0] * len(counters) + [events],
            }
        )

    # NULLs are excluded from the sketch UP FRONT: the per-partition
    # summaries use a NULL-value row as the decrement-event sentinel, so a
    # genuine NULL flowing into mg_partition would be conflated with it
    # (counted, then silently discarded by the merge filter). Heavy-hitter
    # semantics over NULL aren't meaningful anyway — document and drop.
    summaries = (
        df.select(F.col(value_col).cast("string").alias(value_col))
        .filter(F.col(value_col).isNotNull())
        .mapInPandas(mg_partition, schema="value string, cnt long, events long")
    )
    event_total = summaries.agg(F.sum("events").alias("__events"))
    merged = (
        summaries.filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.sum("cnt").alias("min_count"))
        .crossJoin(F.broadcast(event_total))
        .select(
            "value",
            "min_count",
            (F.col("min_count") + F.col("__events")).alias("max_count"),
        )
    )
    return merged.orderBy(F.desc("min_count"), F.asc("value")).limit(k)


def approx_quantile_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (mergeable GK sketch) next to the
    exact continuous percentiles; rank error ≤ 1/accuracy. Returns one
    row per group with arrays ``approx_q`` / ``exact_q`` (same order as
    ``probabilities``).
    """
    probs = F.array(*[F.lit(p) for p in probabilities])
    return df.groupBy(group_col).agg(
        F.percentile_approx(value_col, probs, F.lit(accuracy)).alias("approx_q"),
        F.percentile(F.col(value_col), probs).alias("exact_q"),
    )


def _count_min_matrix_arrow(
    df: DataFrame, value_col: str, depth: int, width: int, seed: int
) -> DataFrame:
    """Arrow kernel twin of the expression matrix build: per batch,
    ``value_counts`` compresses to DISTINCT values, each hashed once per
    depth row with C-speed hashlib (memoized across batches per executor)
    — vs the expression path's depth× md5 per INPUT ROW — and the shuffle
    carries (row, bucket, partial) triples bounded by depth × distinct-
    per-batch instead of depth × rows. Identical counters
    (equivalence-tested)."""
    import hashlib

    import pandas as pd
    from collections.abc import Iterator

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # bounded recomputation cache: clear past the cap so executor
        # Python memory stays flat at web-scale cardinalities
        cache: dict[str, list[int]] = {}
        cache_cap = 1 << 20
        for batch in batches:
            if not len(batch):
                continue
            if len(cache) > cache_cap:
                cache.clear()
            rows: list[int] = []
            buckets: list[int] = []
            cnts: list[int] = []
            for val, cnt in batch["__v"].value_counts().items():
                bks = cache.get(val)
                if bks is None:
                    bks = [
                        int(
                            hashlib.md5(
                                f"{seed * 1000 + j}:{val}".encode()
                            ).hexdigest()[:15],
                            16,
                        )
                        % width
                        for j in range(depth)
                    ]
                    cache[val] = bks
                for j in range(depth):
                    rows.append(j)
                    buckets.append(bks[j])
                    cnts.append(int(cnt))
            yield pd.DataFrame({"row": rows, "bucket": buckets, "cnt": cnts})

    partials = df.select(
        F.col(value_col).cast("string").alias("__v")
    ).mapInPandas(run, schema="row int, bucket bigint, cnt bigint")
    return partials.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    df: DataFrame,
    value_col: str,
    probes: list[str],
    depth: int = 4,
    width: int = 256,
    seed: int = 31,
    with_exact: bool = True,
    kernel: str = "expr",
) -> DataFrame:
    """Count-Min sketch frequency estimates — the point-query complement
    of :func:`frequent_items` (Misra-Gries finds WHICH items are heavy;
    CM answers "how often does THIS item occur" for any later probe
    without rescanning raw data).

    The sketch is a depth×width counter matrix: row j hashes every value
    with the portable md5 hash seeded by (seed, j); estimate(v) =
    min_j counter[j][bucket_j(v)] ≥ true count (overestimates only —
    collisions add, never subtract). Error bound: ≤ N·e/width with
    probability 1−e^−depth.

    Returns one row per probe value: (value, est, [exact, overestimate])
    — ``overestimate = est − exact ≥ 0`` lets the gate assert the
    one-sided guarantee.

    Scale: building the matrix is one explode (depth rows per input row)
    into a groupBy(row, bucket) — map-side combinable, so the shuffle
    carries ≤ depth·width rows per partition regardless of input size;
    probes join the (≤ depth·width)-row matrix via broadcast. The matrix
    is reusable: persist it once, answer any probe stream forever.
    ``kernel='arrow'`` swaps the matrix build for the Arrow kernel
    (:func:`_count_min_matrix_arrow`): one md5 per DISTINCT value per
    batch instead of per row — same counters, equivalence-tested. The
    gate (q121) runs the Arrow kernel; the expression build stays pinned
    by the pytest equivalence suite.
    """
    from hfsa_spark.functions.hashing import portable_hash64

    if not probes:
        raise ValueError("probes must be a non-empty list of values to estimate")
    if kernel not in ("expr", "arrow"):
        raise ValueError(f"kernel must be 'expr' or 'arrow', got {kernel!r}")
    v = F.col(value_col).cast("string")
    if kernel == "arrow":
        matrix = _count_min_matrix_arrow(df, value_col, depth, width, seed)
    else:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    (portable_hash64(v, seed * 1000 + j) % width).alias("bucket"),
                )
                for j in range(depth)
            ]
        )
        matrix = (
            df.select(F.explode(pairs).alias("p"))
            .select(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
            .groupBy("row", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    import hashlib

    def bucket_of(val: str, j: int) -> int:
        h = int(
            hashlib.md5(f"{seed * 1000 + j}:{val}".encode()).hexdigest()[:15], 16
        )
        return h % width

    probe_rows = [
        (p, j, bucket_of(p, j)) for p in probes for j in range(depth)
    ]
    spark = df.sparkSession
    probe_df = spark.createDataFrame(
        probe_rows, "value string, row int, bucket bigint"
    )
    est = (
        probe_df.join(F.broadcast(matrix), ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
    if not with_exact:
        return est.orderBy("value")
    exact = (
        df.select(v.alias("value"))
        .filter(F.col("value").isin(*probes))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return (
        est.join(exact, "value", "left")
        .select(
            "value",
            "est",
            F.coalesce("exact", F.lit(0)).alias("exact"),
            (F.col("est") - F.coalesce("exact", F.lit(0))).alias("overestimate"),
        )
        .orderBy("value")
    )


def daily_distinct_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window_days: int = 7,
    lg_k: int = 14,
    bound: float = 0.05,
    with_exact: bool = True,
) -> DataFrame:
    """Rolling distinct counts from MERGEABLE per-day sketches — the
    pattern that makes "7-day active users" tractable at 100 TB: build
    ONE DataSketches HLL sketch per day (map-side combinable, a few KB),
    persist them, and answer any window by UNIONING sketches instead of
    rescanning raw events. Distinct counts don't sum — sketch union is
    the only way to roll them up without a full re-scan.

    Output per day: ``d1_exact``/``d1_est`` (that day) and
    ``w_est`` (trailing ``window_days`` union), plus the exact window
    count and a ``within_bound`` audit when ``with_exact`` (turn off at
    scale — the exact path is the expensive re-scan this op replaces).

    Scale: sketches shuffle one row per (day, partition); the window
    union runs over #days rows via a range-frame window on the sketch
    column (collect_list of ≤ window_days sketches per row, then a
    driverless union via hll_union_agg over a tiny exploded frame).
    """
    days = df.select(
        F.date_trunc("day", F.col(ts_col)).alias("day"), F.col(value_col).alias("v")
    )
    per_day = days.groupBy("day").agg(
        F.hll_sketch_agg("v", F.lit(lg_k)).alias("sketch"),
        F.count_distinct(F.col("v")).alias("d1_exact"),
    )
    # range frame on epoch DAYS, not a row frame: with missing days a
    # rowsBetween over the last N PRESENT rows would widen the window
    # beyond N calendar days and diverge from the exact audit path below
    # (which is calendar-day via date_sub) — both paths must share
    # "trailing window_days CALENDAR days" semantics.
    day_num = F.datediff(F.col("day"), F.lit("1970-01-01")).cast("long")
    w = Window.orderBy(day_num).rangeBetween(-(window_days - 1), 0)
    framed = per_day.withColumn("sketches", F.collect_list("sketch").over(w))
    unioned = (
        framed.select("day", "d1_exact", "sketch", F.explode("sketches").alias("s"))
        .groupBy("day")
        .agg(
            F.first("d1_exact").alias("d1_exact"),
            F.hll_sketch_estimate(F.first("sketch")).cast("long").alias("d1_est"),
            F.hll_sketch_estimate(F.hll_union_agg("s")).cast("long").alias("w_est"),
        )
    )
    if not with_exact:
        return unioned.orderBy("day")
    # exact window distinct (audit path): day ⨯ trailing-window self join
    pairs = days.distinct().alias("a")
    cal = per_day.select("day").alias("c")
    exact_w = (
        cal.join(
            pairs,
            (F.col("a.day") <= F.col("c.day"))
            & (F.col("a.day") > F.date_sub(F.col("c.day"), window_days)),
        )
        .groupBy(F.col("c.day").alias("day"))
        .agg(F.count_distinct("a.v").alias("w_exact"))
    )
    return (
        unioned.join(exact_w, "day")
        .select(
            "day",
            "d1_exact",
            "d1_est",
            "w_exact",
            "w_est",
            (
                F.abs(F.col("w_est") - F.col("w_exact"))
                <= F.lit(bound) * F.col("w_exact")
            ).alias("within_bound"),
        )
        .orderBy("day")
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon_milli: int = 1000,
    seed: int = 41,
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace mechanism —
    the release-safe aggregate for user-facing dashboards: true count +
    Laplace(1/ε) noise (sensitivity 1 for counting queries).

    Reproducibility twist: the noise draw is DETERMINISTIC — uniform
    u ∈ (−½,½) from the portable hash of (seed, group), transformed by
    the Laplace inverse CDF, noise = −(1/ε)·sgn(u)·ln(1−2|u|) — so a
    re-release of the same table publishes the same numbers (fresh noise
    per release would leak by averaging; fixing the draw per (seed,
    group) is the standard 'noise reuse' defense). ε arrives in
    milli-units; output ``noisy_micro = floor((n + noise)·1e6)`` plus
    the clamped-to-zero ``released`` count.

    Scale: one map-combinable groupBy; the noise is one hash + one log
    per GROUP row. Note: a real DP deployment also bounds user
    contribution upstream; this operator implements the mechanism.
    """
    from hfsa_spark.functions.hashing import portable_hash64

    eps = epsilon_milli / 1000.0
    per = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    h = portable_hash64(F.col(group_col).cast("string"), seed)
    u = (h.cast("double") / float(1 << 60)) - 0.5  # (−½, ½)
    mag = -(1.0 / eps) * F.log(1.0 - 2.0 * F.abs(u))
    noise = F.when(u < 0, -mag).otherwise(mag)
    noisy_micro = F.floor((F.col("n").cast("double") + noise) * 1000000.0).cast("long")
    return per.select(
        group_col,
        "n",
        noisy_micro.alias("noisy_micro"),
        F.greatest(
            F.round(noisy_micro.cast("double") / 1000000.0).cast("long"), F.lit(0)
        ).alias("released"),
    ).orderBy(group_col)
