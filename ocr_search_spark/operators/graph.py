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
