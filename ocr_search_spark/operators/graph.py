"""Link-graph centrality for corpus curation: an integer-exact PageRank
composed from joins + aggregations so Catalyst owns the physical plan.

Web-scale training-data pipelines rank hosts/documents by link-graph
centrality (the CommonCrawl-style quality prior) before sampling a
training mix. The reference engine has no graph operator — this extends
the engine the same way `connected_components` (training/dedup.py) does,
as a first-class distributed iterative algorithm.

Determinism contract (what makes the DuckDB oracle byte-exact): ranks
are BIGINT micro-units of a fixed SCALE, every per-edge contribution is
``(rank * 17) DIV (20 * outdeg)`` (0.85 damping as the exact rational
17/20, integral floor division — identical in Spark SQL ``DIV`` and
DuckDB ``//`` for the positive operands used here), and per-node sums
are integer sums, so no float accumulation order can perturb a single
bit at any parallelism. Dangling nodes (no out-edges) simply leak their
damped mass — the classic "no redistribution" variant — which both
sides implement identically; the teleport term keeps every node > 0.

Scale shape: each iteration is one shuffle-join of ranks onto the edge
list (edges pre-joined with out-degree once and cached) plus one hash
aggregation keyed by destination — the standard Pregel-free formulation.
Edges partition by ``src``; rank state is two BIGINT columns. Skewed
in-degree (every web graph) is ordinary aggregation skew: partial
aggregation absorbs it map-side. Per-iteration ``cache()`` pins lineage
so the plan stays O(1) per iteration instead of re-embedding the whole
history (the kmeans/connected-components lesson, similarity.py:129-135).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 10^12 micro-rank units of total mass
DAMP_NUM, DAMP_DEN = 17, 20  # 0.85 as an exact rational


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """PageRank over a directed edge list (columns ``src``, ``dst``) in
    exact BIGINT arithmetic; returns (node, rank) for every node that
    appears in the edge list (either side).

    r0(v)   = scale DIV n
    r_k+1(v)= teleport + SUM over u->v of (r_k(u) * 17) DIV (20 * od(u))
    teleport = (scale * 3 DIV 20) DIV n   (= floor(0.15 * scale / n))

    ``iters`` is a fixed small constant (centrality priors converge in a
    handful of iterations and the gate needs a pinned plan, not a
    convergence test).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()  # one scalar to the driver; also materializes the cache
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    r0 = scale // n
    teleport = (scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN) // n

    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    # Pre-join out-degree onto the edges once; every iteration reuses it.
    ed = edges.join(outdeg, "src").select("src", "dst", "od").cache()

    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select(
                ed["dst"].alias("node"),
                F.expr(f"(rank * {DAMP_NUM}) DIV ({DAMP_DEN} * od)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(teleport) + F.coalesce(F.col("contrib"), F.lit(0)))
                .cast("long")
                .alias("rank"),
            )
            .cache()
        )
    return ranks


# ------------------------------------------------------ triangle counting


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count of an UNDIRECTED simple graph.

    ``edges``: one row per undirected edge, columns ``a``, ``b`` with
    ``a <> b`` and each {a,b} pair appearing once (callers canonicalize
    with least/greatest + distinct).

    Classic degree-ordered orientation (the MapReduce-era
    Suri-Vassilvitskii "node-iterator++"): orient every edge from the
    (degree, node)-smaller endpoint to the larger, enumerate wedges by
    self-joining the oriented adjacency on its source, and close each
    wedge against the oriented edge list. Orientation bounds every
    out-degree at O(sqrt(m)), so the wedge join is skew-resistant even
    on power-law graphs — a hub of degree d contributes O(d) oriented
    wedges, not O(d^2): this is what survives a web-scale co-occurrence
    graph where the naive adjacency self-join detonates on hubs.

    Returns a single row (n_nodes, n_edges, n_wedges, n_triangles) —
    all exact BIGINTs. Wedge count = sum over nodes of C(outdeg, 2)
    under the orientation (every triangle is counted from exactly one
    wedge apex, so n_triangles <= n_wedges).
    """
    # Catalyst does not dedupe common subplans across DataFrame
    # references: deg is read twice and oriented three times below, each
    # of which would otherwise re-run the whole upstream edge pipeline
    # (e.g. the corpus-wide bigram aggregate feeding word_triangles).
    # Pin both — they are graph-sized (edges/nodes), far smaller than
    # the corpus, and cache() spills to disk if not.
    e = edges.select("a", "b").cache()
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).cache()
    # Orient a->b iff (deg_a, a) < (deg_b, b); total order, no ties.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    lt = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a").join(db, "b")
        .select(
            F.when(lt, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lt, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    ).cache()
    # Wedges (v, w) from a shared oriented source u, ordered v < w to
    # enumerate each unordered pair once; close against oriented edges.
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").filter(F.col("x") < F.col("y"))
    # A closing edge between x and y exists in exactly one orientation;
    # match either.
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    ).select(F.least("x", "y").alias("x"), F.greatest("x", "y").alias("y"))
    tri = wedges.select(
        F.least("x", "y").alias("x"), F.greatest("x", "y").alias("y")
    ).join(closing, ["x", "y"], "left_semi")
    return (
        e.select(
            F.lit(1).alias("_one"),
        )
        .groupBy()
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .crossJoin(deg.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_nodes")))
        .crossJoin(wedges.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_wedges")))
        .crossJoin(tri.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n_triangles")))
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles")
    )


def label_propagation(edges: DataFrame, iters: int = 2) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    2007), pinned deterministic: ``iters`` full rounds; each round
    every node adopts the most frequent label among its neighbors PLUS
    its own current label, one vote each (majority count DESC, then
    smallest label — a total order). The self-vote is pinned: without
    it, synchronous LPA flip-flops forever on stars and other bipartite
    structures (root and spokes swap labels every round); with it the
    star settles in one round. Classic async LPA is nondeterministic by
    design — this synchronous variant trades a bit of convergence speed
    for bit-replayability, the same choice the pointer-jumping CC
    made.

    ``edges`` (src, dst) is treated as undirected and deduplicated.
    Returns (node, label) after exactly ``iters`` rounds (LPA on
    bipartite-ish structures can oscillate; a FIXED round count is the
    pinned semantic, and the oracle unrolls the same rounds).

    Scale shape per round: one join of the edge list against the
    vocab-sized label table (AQE picks broadcast while labels fit,
    shuffled hash beyond), one (node, label) hash aggregate, one
    per-node WindowGroupLimit argmax — all shuffles keyed by node.
    Labels are materialized per round (node-count-sized cache), so
    lineage does NOT nest across rounds — the kmeans/CC lesson.
    """
    from pyspark.sql import Window as W

    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .cache()
    )
    nodes = und.select(F.col("src").alias("node")).distinct().cache()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(int(iters)):
        nb = (
            und.join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "label")
            .unionByName(labels)  # the pinned self-vote
        )
        cnt = nb.groupBy("node", "label").agg(F.count("*").alias("_c"))
        w = W.partitionBy("node").orderBy(F.desc("_c"), F.asc("label"))
        new = (
            cnt.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", "label")
        )
        labels = (
            nodes.join(new, "node", "left")
            .select(
                "node", F.coalesce("label", F.col("node")).alias("label")
            )
            .cache()
        )
        labels.count()  # materialize: truncate per-round lineage
    und.unpersist()
    nodes.unpersist()
    return labels
