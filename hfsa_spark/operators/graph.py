"""Graph analytics over edge lists: triangle counting and degree
distributions. Complements the iterative connected-components operator
(operators/dedup.py) with the one-shot relational graph queries.

Beyond-reference surface: dedup pipelines produce pair graphs
(minhash_lsh_candidates, embedding_near_dup_pairs); these operators
measure their structure — degree skew says whether boilerplate clusters
dominate, triangle density distinguishes genuine duplicate clusters
(dense) from hash-collision chains (sparse).

Scale notes:
* edges are canonicalized (src < dst, distinct) so every triangle is
  counted exactly once as an ordered triple u < v < w — no ÷6 fixup and
  no double-counted joins.
* ``triangle_count`` is the classic two-join plan; both joins key on
  edge endpoints, so a degree-skewed hub fans its pairs through one
  reducer — cap or sample super-nodes upstream (the same max_bucket
  idea as LSH) when degrees are power-law. Shuffle volume is
  O(Σ deg(v)²) — that bound, not |E|, is what to budget at 100 TB.
* ``degree_distribution`` is two map-combinable aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected simple edges: (least, greatest), self-loops dropped,
    duplicates collapsed."""
    u = F.least(F.col(src), F.col(dst)).alias("src")
    v = F.greatest(F.col(src), F.col(dst)).alias("dst")
    return edges.select(u, v).filter(F.col("src") != F.col("dst")).distinct()


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = None,
) -> DataFrame:
    """One-row summary (n_nodes, n_edges, n_triangles) of the undirected
    graph. Each triangle u < v < w matches exactly one join chain
    (u,v)⋈(v,w)⋈(u,w) over canonical edges.

    ``max_degree`` is the skew guard (same idea as ``max_bucket`` in
    dedup.minhash_lsh_candidates): nodes with more than ``max_degree``
    canonical-edge endpoints are EXCLUDED (with every incident edge)
    before the two-join plan, bounding its shuffle at
    O(Σ min(deg, max_degree)²). On a power-law dedup pair graph one hub
    (boilerplate matched by everything) otherwise fans deg² pairs through
    a single reducer; the count reported is then exact over the remaining
    graph — n_nodes/n_edges reflect the exclusion so the caller can see
    how much was dropped."""
    # r12: e feeds six subtrees (three join copies, both node-set sides,
    # and the edge count) — persisted so the upstream edge derivation
    # (often a join/distinct) runs once; released after the one-row
    # summary is materialized
    from hfsa_spark.plans import shared

    cached = []
    e = shared(canonical_edges(edges, src, dst))
    cached.append(e)
    if max_degree is not None:
        ends = e.select(F.col("src").alias("n")).unionAll(
            e.select(F.col("dst").alias("n"))
        )
        hubs = (
            ends.groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") > max_degree)
            .select("n")
        )
        e = shared(
            e.join(hubs.withColumnRenamed("n", "src"), "src", "left_anti")
            .join(hubs.withColumnRenamed("n", "dst"), "dst", "left_anti")
            .select("src", "dst")
        )
        cached.append(e)
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    e3 = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    tris = e1.join(e2, "v").join(e3, ["u", "w"])
    nodes = e.select(F.col("src").alias("n")).unionAll(
        e.select(F.col("dst").alias("n"))
    ).distinct()
    out = (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(nodes.agg(F.count(F.lit(1)).alias("n_nodes")))
        .crossJoin(tris.agg(F.count(F.lit(1)).alias("n_triangles")))
        .select("n_nodes", "n_edges", "n_triangles")
    )
    out = out.persist()
    out.count()
    for c in cached:
        c.unpersist()
    return out


def degree_distribution(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(degree, n_nodes): how many nodes have each degree — the first
    thing to inspect on a dedup pair graph (a heavy tail means hub
    documents / boilerplate clusters)."""
    # r12: e feeds both endpoint projections — persisted so the upstream
    # edge derivation runs once; released after the small histogram
    # materializes
    from hfsa_spark.plans import shared

    e = shared(canonical_edges(edges, src, dst))
    ends = e.select(F.col("src").alias("n")).unionAll(e.select(F.col("dst").alias("n")))
    deg = ends.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
    out = (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )
    out = out.persist()
    out.count()
    e.unpersist()
    return out


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
    dangling: bool = False,
    checkpoint: bool = True,
) -> DataFrame:
    """PageRank over a directed edge list, INTEGER-EXACT: ranks live in
    pico-units (10^12 = 1.0) and every per-iteration step is integer
    arithmetic — ``contrib = pr // outdeg`` then
    ``pr' = ((100-d)·10^12/100)/N + d·Σcontrib/100`` (floor divisions) —
    so the result is bit-identical under any partitioning, retry, or
    engine (a fixed ``iters`` unrolls into a SQL oracle). The floor
    truncation loses < 1 pico-unit per term: irrelevant for ranking,
    priceless for reproducibility.

    ``dangling=False`` (default): nodes with outdeg 0 absorb rank
    without redistributing — the simple variant. ``dangling=True`` adds
    the standard dangling-mass term: each iteration sums the rank
    sitting on zero-outdegree nodes (one broadcast-singleton aggregate,
    the same one-row crossJoin pattern as the pct-of-total operators —
    never a collect) and every node receives
    ``floor(dangling_sum / N)`` extra inflow before damping:
    ``pr' = base + floor(d·(Σcontrib + dang_share)/100)``. Mass is then
    conserved up to floor truncation — the variant web-graph curation
    wants, since a crawl frontier is full of dangling URLs and the
    simple variant systematically deflates ranks of pages linked from
    them.

    Scale: per iteration ONE join of the rank table (N rows) with the
    weighted edge list on src + a map-combinable groupBy(dst) + the
    rank rebuild join — two shuffles-carrying joins per round (the
    edge⋈outdeg join is INVARIANT, so it is paid once before the loop
    and persisted, not once per iteration); the dangling term adds one
    anti-join against the (pre-aggregated, N-row) outdeg table and a
    one-row broadcast. ``localCheckpoint`` truncates lineage each round
    so the plan depth stays constant. Nodes = src ∪ dst, computed once.

    ``checkpoint=False`` keeps the last iteration's lineage intact (the
    earlier rounds still truncate) — for plan audits that want to SEE
    the iteration body (scripts/plan_audit.py's q216 section) or tiny
    graphs where the checkpoint write dominates. Results are identical.
    """
    from hfsa_spark.plans import parallelize_compute

    E = 10**12
    # materialize the loop invariants ONCE — edge lists are usually the
    # output of an upstream join/distinct, and without this every
    # iteration's action would replay that whole lineage
    from hfsa_spark.plans import shared

    e = shared(
        parallelize_compute(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        ).distinct()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    # edge list pre-weighted with its source's outdegree — invariant
    # across iterations, so this join happens ONCE, not per round
    e_w = e.join(outdeg, "src").persist()

    base = F.lit(((100 - damping_pct) * E // 100) // n_nodes).cast("long")
    pr = nodes.withColumn("pr", F.lit(E // n_nodes).cast("long"))
    for it in range(iters):
        keep_lineage = not checkpoint and it == iters - 1
        contrib = (
            e_w.join(pr.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("pr") / F.col("outdeg")).cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        if dangling:
            # rank sitting on zero-outdegree nodes this round: ONE row,
            # broadcast-crossJoined (the pct-of-total pattern) — every
            # node gets floor(dang_sum / N) extra inflow before damping
            dang = (
                pr.join(
                    outdeg.withColumnRenamed("src", "node"), "node",
                    "left_anti",
                )
                .agg(F.coalesce(F.sum("pr"), F.lit(0)).alias("__ds"))
            )
            inflow = F.coalesce(F.col("in_sum"), F.lit(0)) + F.floor(
                F.col("__ds") / F.lit(n_nodes)
            ).cast("long")
            pr = (
                nodes.join(contrib, "node", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "node",
                    (
                        base
                        + F.floor(F.lit(damping_pct) * inflow / 100).cast(
                            "long"
                        )
                    ).alias("pr"),
                )
            )
            if not keep_lineage:
                pr = pr.localCheckpoint()
            continue
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (
                base
                + F.floor(
                    F.lit(damping_pct)
                    * F.coalesce(F.col("in_sum"), F.lit(0))
                    / 100
                ).cast("long")
            ).alias("pr"),
        )
        if not keep_lineage:
            pr = pr.localCheckpoint()
    # the final pr is checkpointed (self-contained); release the cached
    # invariants so repeated calls don't accumulate executor storage
    for cached in (e, nodes, outdeg, e_w):
        cached.unpersist()
    return pr.orderBy(F.desc("pr"), F.asc("node"))
