"""Deterministic sampling / splitting / budgeting operators for
training-data pipelines.

Beyond-reference surface (SURVEY.md §7 phase 4): the mixing-and-splitting
steps a 100 TB pre-train pipeline runs after dedup and quality filtering.
Everything is hash-deterministic (no RNG state, no sampleBy) so results are
reproducible across runs, engines, and partitionings — and carry exact SQL
oracles.

Scale notes:
* ``hash_split`` / ``stratified_sample`` are pure row-local expressions —
  map-only, zero shuffles, fully codegen'd; adding a split column to 100 TB
  costs one scan.
* ``token_budget_filter`` is a per-group running sum — one shuffle keyed on
  the group column. A single giant group serializes its own window (the
  classic skew case); at that scale switch ``approximate=True`` semantics:
  pre-aggregate per (group, salt) then allocate budget proportionally —
  kept out of scope here because the exact form is what the oracle pins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hfsa_spark.functions.hashing import portable_hash64

# hash values are 60-bit (15 hex digits of md5) — see functions/hashing.py
_HASH_SPACE = 1 << 60


def split_column(id_col: Column | str, weights: dict[str, float], salt: str = "split") -> Column:
    """Deterministic split label from a stable hash of the id: a document
    lands in the same split in every run and engine. ``weights`` maps label
    → fraction (must sum to ≤ 1; any remainder falls into the last label).
    """
    h = portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string")))
    labels = list(weights)
    expr = None
    cum = 0.0
    for lab in labels[:-1]:
        cum += weights[lab]
        cond = h < F.lit(int(cum * _HASH_SPACE))
        expr = F.when(cond, F.lit(lab)) if expr is None else expr.when(cond, F.lit(lab))
    last = F.lit(labels[-1])
    return last if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, float], salt: str = "split"
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/... per ``weights``)."""
    return df.withColumn("split", split_column(id_col, weights, salt=salt))


def stratified_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows (hash(id) < fraction·2⁶⁰).

    Unlike ``df.sample``, membership is a pure function of the id — stable
    under retries, repartitioning, and engine changes. Stratification comes
    free: applied after a filter on the stratum column, each stratum is
    sampled at the same rate because the hash is independent of any column
    but the id.
    """
    h = portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return df.filter(h < F.lit(int(fraction * _HASH_SPACE)))


def fixed_size_sample(
    df: DataFrame, id_col: str, stratum_col: str, k: int, salt: str = "fixed"
) -> DataFrame:
    """Deterministic fixed-SIZE sample: exactly min(k, |stratum|) rows per
    stratum, chosen by hash order (a reproducible stand-in for uniform
    random order) with the id as tie-break.

    Complements ``stratified_sample`` (fixed RATE): use this when every
    stratum must contribute the same absolute count — eval-set carving,
    per-language probes. One shuffle: the per-stratum ranking window; no
    global sort. Adds ``sample_rank`` (1..k within the stratum).
    """
    h = portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Compose a training mix: keep a deterministic per-stratum fraction of
    rows (``fractions`` maps stratum value → rate; unlisted strata get
    ``default``). The down/up-weighting step that turns raw source
    proportions into target mixture weights — e.g. {'web': 0.3,
    'code': 1.0, 'forums': 0.6}.

    Same machinery as ``stratified_sample`` but with a per-stratum
    threshold: membership is a pure function of (id, stratum rate) —
    map-only, zero shuffles, one scan at 100 TB; reproducible across
    runs, engines, and partitionings. Thresholds are precomputed integer
    literals, so the hot path is one hash + one compare per row.
    """
    h = portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    thresh: Column | None = None
    for value, frac in fractions.items():
        t = F.lit(int(frac * _HASH_SPACE))
        cond = F.col(stratum_col) == value
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        F.lit(int(default * _HASH_SPACE))
        if thresh is None
        else thresh.otherwise(F.lit(int(default * _HASH_SPACE)))
    )
    return df.filter(h < thresh)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): keep the k rows with the smallest priority
    −ln(u)/w, where u ∈ (0,1] is a pure hash of the id — inclusion
    probability is proportional to weight, yet the sample is a pure
    function of (ids, weights): stable under retries, repartitioning,
    and engine changes (no RNG state).

    One pass + a global top-k (TakeOrderedAndProject — no full sort):
    the priority is map-side computed, so 100 TB costs one scan and a
    k-row-per-partition reduction. Ties (measure-zero for a 60-bit
    hash) break by id. The priority column is NOT exposed: ln() may
    differ in the last ulp across math libraries, so downstream
    comparisons must key on ids, not priorities.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = portable_hash64(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(_HASH_SPACE))
    priority = -F.log(u) / w.cast("double")
    return (
        df.withColumn("__priority", priority)
        .orderBy(F.col("__priority").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__priority")
    )


def token_budget_filter(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: Column | str,
    budget: int,
) -> DataFrame:
    """Cap each group (source/domain/language) at ``budget`` tokens: rows
    are admitted in ``order_col`` order until the group's running token sum
    would exceed the budget — the data-mixing primitive that keeps one
    giant crawl domain from dominating a training mix.

    A row is kept iff the running sum *through this row* stays ≤ budget
    (so one over-budget row is not kept partially). One shuffle: the
    running-sum window keyed on ``group_col``.
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__cum_tokens", F.sum(toks).over(w))
        .filter(F.col("__cum_tokens") <= budget)
        .drop("__cum_tokens")
    )


def interleave_order(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, int],
    order_col: str,
) -> DataFrame:
    """Deterministic curriculum interleave: assign each row a global
    ``interleave_key`` so that reading rows in key order yields the strata
    mixed proportionally to integer ``weights`` — stratum s with weight w
    contributes its rows at positions (2·rn−1)/(2·w) (rn = rank within the
    stratum by ``order_col``), i.e. a weight-4 stratum appears twice as
    often as a weight-2 one, evenly spread rather than in blocks. This is
    the training-mix ORDERING primitive (mixture_sample picks WHICH rows;
    this picks WHEN they are seen).

    Key arithmetic is one IEEE division of small exact integers — bit-
    identical across engines and partitionings. A ``stratum_rank`` column
    (rn) is kept so ``orderBy(interleave_key, stratum, stratum_rank)`` is a
    total order even if two strata's rationals collide.

    Scale: one shuffle (rank window keyed on the stratum). With few huge
    strata the rank window serializes per-stratum; at 100 TB interleave
    within hash-bucketed shards instead (add a bucket to the partition key)
    — the global order becomes bucket-concatenated, which training loaders
    treat as equivalent shuffled shards. Strata absent from ``weights`` are
    dropped (weight 0).
    """
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    rn = F.row_number().over(Window.partitionBy(stratum_col).orderBy(order_col))
    w = wmap[F.col(stratum_col)]
    return (
        df.filter(w.isNotNull())
        .withColumn("stratum_rank", rn)
        .withColumn(
            "interleave_key",
            (2.0 * F.col("stratum_rank") - 1.0) / (2.0 * w.cast("double")),
        )
    )


def mixture_reweight(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    target: dict[str, int] | None = None,
) -> DataFrame:
    """Domain-mixture reweighting — the dataset-composition step (DoReMi /
    SlimPajama style): compare each domain's ACTUAL token share against a
    TARGET share and emit the per-domain repeat factor that achieves the
    target under epoch-repetition sampling.

    ``target`` maps group → integer target weight (defaults to uniform);
    groups absent from an explicit target get weight 0 (drop). Outputs per
    group, integer-exact: ``n_docs``, ``n_tokens``, ``target_wt``, and

        repeat_micro = floor(1e6 · (target_wt/Σtarget) / (n_tokens/Σtokens))

    > 1e6 means upsample (repeat epochs), < 1e6 downsample. Feed
    ``repeat_micro`` to :func:`weighted_sample` / :func:`interleave_order`
    to materialize the mixture.

    Scale: one map-side-combinable groupBy over (group, token-count) — the
    token count is a single array-size expression, no explode; the share
    arithmetic runs on the tiny per-group aggregate.
    """
    from hfsa_spark.operators.text import token_count

    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col).cast("long")).alias("n_tokens"),
    )
    if target is None:
        wt = F.lit(1).cast("long")
    else:
        wt = F.coalesce(
            *[
                F.when(F.col(group_col) == g, F.lit(int(w)).cast("long"))
                for g, w in sorted(target.items())
            ]
            + [F.lit(0).cast("long")]
        )
    per = per.withColumn("target_wt", wt)
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.sum("target_wt").alias("tot_wt")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            "target_wt",
            F.floor(
                1000000.0
                * (F.col("target_wt").cast("double") / F.col("tot_wt").cast("double"))
                / (F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double"))
            )
            .cast("long")
            .alias("repeat_micro"),
        )
        .orderBy(group_col)
    )


def temperature_reweight(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain sampling (the XLM-R / mT5 α-sampling
    rule): target share ∝ (actual share)^α, flattening the mixture toward
    uniform as α→0 so low-resource domains are upsampled.

    Engine-parity design: the only transcendental, s^α, is taken once per
    group and immediately quantized to an integer weight
    ``q = floor(s^α · 1e9)``; the normalizing denominator is then an exact
    integer sum (no float-addition-order hazard), and

        repeat_micro = floor(1e6 · (q/Σq) / s)

    is reproducible bit-for-bit. α=0.5 (sqrt) is IEEE-correctly-rounded
    everywhere; other α go through pow, where cross-libm last-ulp
    differences are possible (the quantization makes a flip astronomically
    unlikely but not impossible — pin α=0.5 when an exact oracle matters).

    Scale: same single map-combinable groupBy as :func:`mixture_reweight`;
    everything after the aggregate runs on one tiny row per domain.
    """
    from hfsa_spark.operators.text import token_count

    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col).cast("long")).alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").alias("tot_tokens"))
    share = F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double")
    q = F.floor(F.pow(share, F.lit(float(alpha))) * 1e9).cast("long")
    perq = per.crossJoin(F.broadcast(tot)).withColumn("q", q)
    qtot = perq.agg(F.sum("q").alias("q_tot"))
    return (
        perq.crossJoin(F.broadcast(qtot))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            "q",
            F.floor(
                1000000.0
                * (F.col("q").cast("double") / F.col("q_tot").cast("double"))
                / share
            )
            .cast("long")
            .alias("repeat_micro"),
        )
        .orderBy(group_col)
    )


def curriculum_order(
    scored: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    n_bins: int = 10,
    seed: int = 17,
    shard_col: str | None = None,
) -> DataFrame:
    """Curriculum ordering: bin documents into ``n_bins`` difficulty
    quantiles (ntile over ``score_col`` DESCENDING — high score = easy =
    first), then shuffle WITHIN each bin by a deterministic hash so
    training sees easy→hard progression without intra-bin ordering bias.
    ``position`` is the global 1-based curriculum index.

    Determinism/parity: ntile and row_number use total orders with id
    tiebreaks, and the shuffle key is the portable md5 hash — the
    curriculum is byte-identical across engines and reruns.

    Scale: with ``shard_col=None`` the two windows are global total
    orders — fine for curriculum *manifests* (row = document, not token)
    up to ~10⁸ rows. At extreme doc counts pass ``shard_col``: ntile and
    the intra-bin shuffle then partition by the shard key (parallel
    windows, no single-task sort), and the global position is
    reconstructed as a per-(bin, shard) offset + the within-partition
    row_number. Offsets come from the tiny (n_bins × n_shards) count
    table via a broadcast inequality self-join — no global window
    anywhere on this path. The curriculum concatenates shards within
    each bin (bin asc, shard asc, shuffled inside), preserving the
    easy→hard shape; with a single-valued shard key the output is
    IDENTICAL to the global form (pytest-pinned).
    """
    from hfsa_spark.functions.hashing import portable_hash64

    shuffle_key = portable_hash64(F.col(id_col).cast("string"), seed)
    if shard_col is None:
        wb = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        out = scored.select(
            F.col(id_col),
            F.col(score_col),
            F.ntile(n_bins).over(wb).alias("bin"),
            shuffle_key.alias("shuffle_key"),
        )
        wp = Window.orderBy(
            F.col("bin").asc(), F.col("shuffle_key").asc(), F.col(id_col).asc()
        )
        return out.withColumn("position", F.row_number().over(wp))

    wb = Window.partitionBy(shard_col).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    out = scored.select(
        F.col(id_col),
        F.col(score_col),
        F.col(shard_col),
        F.ntile(n_bins).over(wb).alias("bin"),
        shuffle_key.alias("shuffle_key"),
    )
    within = F.row_number().over(
        Window.partitionBy("bin", shard_col).orderBy(
            F.col("shuffle_key").asc(), F.col(id_col).asc()
        )
    )
    out = out.withColumn("_within", within)
    # (bin, shard) counts: n_bins × n_shards rows — offsets by broadcast
    # inequality self-join (no window, so no single-partition sort)
    cnt = out.groupBy("bin", shard_col).agg(F.count(F.lit(1)).alias("_c"))
    prior = cnt.select(
        F.col("bin").alias("_pb"),
        F.col(shard_col).alias("_ps"),
        F.col("_c").alias("_pc"),
    )
    # NULL shard keys: a NULL group is a real group (crawl metadata is
    # often missing) — the inequality orders NULL LAST among shards and
    # the join-back is null-safe, so NULL-shard rows are never dropped
    shard_before = (F.col("_ps") < F.col(shard_col)) | (
        F.col("_ps").isNotNull() & F.col(shard_col).isNull()
    )
    off = (
        cnt.join(
            F.broadcast(prior),
            (F.col("_pb") < F.col("bin"))
            | ((F.col("_pb") == F.col("bin")) & shard_before),
            "left",
        )
        .groupBy("bin", shard_col)
        .agg(F.coalesce(F.sum("_pc"), F.lit(0)).alias("_off"))
    )
    offr = off.select(
        F.col("bin").alias("_ob"),
        F.col(shard_col).alias("_os"),
        "_off",
    )
    return (
        out.join(
            F.broadcast(offr),
            (F.col("bin") == F.col("_ob"))
            & F.col(shard_col).eqNullSafe(F.col("_os")),
        )
        .select(
            id_col,
            score_col,
            shard_col,
            "bin",
            "shuffle_key",
            # long, not int: the shard_col path is documented for manifest
            # sizes past 2^31 rows
            (F.col("_off") + F.col("_within")).cast("long").alias("position"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Train/val/test split that cannot leak duplicates across the
    boundary: the split hash keys on the CONTENT DIGEST (normalized
    text), not the document id, so every member of an exact-duplicate
    group lands in the same split — the failure mode of naive id-hashed
    splits is a train copy of a test document.

    Returns the rows with ``digest`` and ``split`` columns; pair with
    :func:`hfsa_spark.operators.dedup.canonical_keeper` to also collapse
    the group. Near-dup-safe variants key the same split hash on the
    connected-component representative instead of the digest.

    Scale: map-only — one md5 per row, a CASE over the hash; no shuffle
    at all (the digest is computed inline, not via the dedup groupBy).
    """
    from hfsa_spark.operators.dedup import normalize_text
    from hfsa_spark.functions.hashing import portable_hash_hex

    w = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    digest = portable_hash_hex(normalize_text(text_col))
    out = df.withColumn("digest", digest)
    return out.withColumn("split", split_column("digest", w, salt=salt))


def materialize_mixture(
    df: DataFrame,
    repeat_micro_col: str = "repeat_micro",
    id_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Turn per-row repeat factors (:func:`mixture_reweight` /
    :func:`temperature_reweight` output joined back to docs) into the
    ACTUAL materialized sample: each row is emitted
    ``floor(repeat_micro/1e6)`` times plus one more with probability
    ``frac = repeat_micro mod 1e6`` — decided by the portable hash, so
    the expansion is deterministic, exactly reproducible, and its
    EXPECTED multiplicity equals the requested factor (stochastic
    rounding — the standard way to honor fractional epochs without bias).

    Output: input columns + ``epoch_idx`` (0-based copy index) +
    ``shuffle_key`` (hash of (epoch, id) — sort by it per epoch for the
    standard reshuffle-each-epoch training order).

    Scale: map-only — a ``sequence``/explode per row (rows out =
    Σ multiplicities); no shuffle; the training loader sorts by
    (epoch_idx, shuffle_key) partition-locally.
    """
    from hfsa_spark.functions.hashing import portable_hash64

    base = F.floor(F.col(repeat_micro_col) / 1000000).cast("int")
    frac = (F.col(repeat_micro_col) % 1000000).cast("long")
    u = portable_hash64(F.col(id_col).cast("string"), seed) % 1000000
    n_copies = base + F.when(u < frac, 1).otherwise(0)
    out = df.withColumn("__n", n_copies).filter(F.col("__n") > 0)
    out = out.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)).alias("epoch_idx")
    ).drop("__n")
    return out.withColumn(
        "shuffle_key",
        portable_hash64(
            F.concat(
                F.col("epoch_idx").cast("string"),
                F.lit(":"),
                F.col(id_col).cast("string"),
            ),
            seed,
        ),
    )


def neardup_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """The near-dup upgrade of :func:`leakage_safe_split`: given pairwise
    near-duplicate evidence (MinHash-LSH / SimHash / embedding pairs as
    (id_a, id_b)), group docs into connected components and key the
    split hash on the COMPONENT — so not only exact copies but fuzzy
    variants of a document land on the same side of the train/test
    boundary (near-dup train/test contamination is the one naive splits
    can't see).

    The split key is the component's minimum member CONTENT DIGEST (not
    the min id), so re-ingesting the same corpus with renumbered ids
    reproduces the same split. Returns rows + ``component`` + ``split``.

    Scale: components via the O(diameter)-round min-label propagation
    (dedup.connected_components); the key derivation is one groupBy over
    (component → min digest); everything else is map-only.
    """
    from hfsa_spark.functions.hashing import portable_hash_hex
    from hfsa_spark.operators.dedup import connected_components, normalize_text

    w = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    comp = connected_components(
        df.select(F.col(id_col).alias("id")), pairs, id_col="id"
    ).select(F.col("id").alias(id_col), F.col("group_id").alias("component"))
    hashed = df.join(comp, id_col).withColumn(
        "__digest", portable_hash_hex(normalize_text(text_col))
    )
    keys = hashed.groupBy("component").agg(F.min("__digest").alias("__key"))
    return (
        hashed.join(keys, "component")
        .withColumn("split", split_column("__key", w, salt=salt))
        .drop("__digest", "__key")
    )


def order_mixing_audit(
    df: DataFrame, order_col: str, label_col: str,
    shard_col: str | None = None,
) -> DataFrame:
    """Shuffle-quality audit for a materialized training order: for rows
    consumed in ``order_col`` sequence, count adjacent pairs whose labels
    match (per label) — under a good shuffle the overall adjacent-same
    rate approaches the collision probability of the label distribution
    (Σ pᵢ²); a correlated order (un-shuffled concatenated sources — the
    classic dataloader bug) shows up as runs, i.e. adjacent-same counts
    far above label-share expectation.

    Output: (label, n, adj_same, share_micro) — adj_same counts the pairs
    (row, next row) where both carry this label; compare
    Σ adj_same / (N−1) against Σ share². All integers/floor-micro.

    Scale: the audit is of a GLOBAL order, so with ``shard_col=None``
    the lag window is inherently a total sort — run it on the
    materialized manifest (already ordered, sort is a no-op read) or on
    a contiguous sample. At extreme manifest sizes pass ``shard_col``
    where the shard key partitions the order into CONTIGUOUS ranges
    (e.g. the export shard id): the lead window then parallelizes per
    shard and only the n_shards − 1 cross-boundary pairs are dropped —
    a vanishing undercount the caller accepts explicitly by supplying
    the key. With a single-valued shard key the output is IDENTICAL to
    the global form (pytest-pinned).
    """
    from pyspark.sql import Window

    if shard_col is None:
        w = Window.orderBy(F.asc(order_col))
    else:
        w = Window.partitionBy(shard_col).orderBy(F.asc(order_col))
    lagged = df.select(
        F.col(label_col).alias("label"),
        F.lead(label_col, 1).over(w).alias("_next"),
    )
    # total from a broadcast one-row aggregate — no eager driver-side count
    tot = df.agg(F.count(F.lit(1)).cast("double").alias("_tot"))
    return (
        lagged.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("_next") == F.col("label"), 1).otherwise(0)
            ).cast("long").alias("adj_same"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n",
            "adj_same",
            F.floor(F.col("n").cast("double") * 1000000.0 / F.col("_tot"))
            .cast("long")
            .alias("share_micro"),
        )
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-registered-domain document cap — the web-curation step that
    stops a handful of boilerplate-heavy hosts from dominating a crawl
    (the RefinedWeb / C4 "limit pages per domain" rule). The host is
    parsed from the URL, the registered domain is its last two labels
    (``a.b.example.com → example.com``), and within each domain the
    ``cap`` survivors are chosen by a deterministic content-free hash of
    the id — so the kept set depends only on the data, never on
    partitioning or arrival order.

    Output: input columns + (domain, domain_rank, keep).

    Scale: one shuffle on the registered domain; rank is a per-domain
    window (top-``cap`` selection). Mega-domains are exactly the rows the
    operator exists to cut, and AQE skew-split handles their sort; the
    hash ranking is map-side, no secondary lookup table.
    """
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    w = Window.partitionBy("domain").orderBy(
        portable_hash64(F.col(id_col).cast("string"), seed=97), F.col(id_col)
    )
    return (
        df.withColumn("domain", dom)
        .withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .withColumn("keep", F.col("domain_rank") <= cap)
    )


def doremi_weights(
    ref_df: DataFrame,
    proxy_df: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    eta_micro: int = 1000000,
) -> DataFrame:
    """One DoReMi-style exponentiated-gradient step of domain mixture
    reweighting (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures"):
    per-domain EXCESS loss — how much worse a weak proxy model does than
    the reference model on the same held-out docs — drives a
    multiplicative weight update, upweighting the domains where more is
    left to learn. Inputs are two per-doc score frames shaped like
    :func:`hfsa_spark.operators.text.lm_cross_entropy` output (id,
    n_tokens, sum_logp_micro), ref_df additionally carrying the domain.

    All arithmetic before the single exp() per domain is exact integers
    (losses in micro-nats per token via integer division, clamped excess,
    integer eta product), so the one transcendental has a bit-identical
    input in any engine and the rounded weights replay exactly; the
    normalization denominator is an INTEGER sum, immune to float
    summation order.

    Output: (domain, n_docs, n_tokens, ref_loss_micro, proxy_loss_micro,
    excess_micro, weight_micro) with weight_micro summing to ≤ 1e6.

    Scale: one equi-join on the doc id, one map-combinable groupBy on the
    domain, and a broadcast one-row total — domain cardinality rows out.
    """
    r = ref_df.select(
        F.col(id_col).alias("_id"),
        F.col(domain_col).alias("domain"),
        F.col("n_tokens").alias("_n"),
        F.col("sum_logp_micro").alias("_r"),
    )
    p = proxy_df.select(
        F.col(id_col).alias("_id"), F.col("sum_logp_micro").alias("_p")
    )
    dom = (
        r.join(p, "_id")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").cast("long").alias("n_tokens"),
            (-F.sum("_r")).cast("long").alias("_rn"),
            (-F.sum("_p")).cast("long").alias("_pn"),
        )
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            F.expr("_rn div n_tokens").cast("long").alias("ref_loss_micro"),
            F.expr("_pn div n_tokens").cast("long").alias("proxy_loss_micro"),
        )
        .withColumn(
            "excess_micro",
            F.greatest(
                F.lit(0).cast("long"),
                F.col("proxy_loss_micro") - F.col("ref_loss_micro"),
            ),
        )
        .withColumn(
            "_w",
            F.round(
                F.exp(
                    (F.col("excess_micro") * F.lit(eta_micro)).cast("double")
                    / 1e12
                )
                * 1e6
            ).cast("long"),
        )
    )
    tot = dom.agg(F.sum("_w").alias("_tot"))
    return dom.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "n_tokens",
        "ref_loss_micro",
        "proxy_loss_micro",
        "excess_micro",
        F.expr("(_w * 1000000) div _tot").cast("long").alias("weight_micro"),
    )
