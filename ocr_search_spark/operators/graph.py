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


def trustrank_integer(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """Seed-personalized PageRank (TrustRank, Gyöngyi 2004): identical
    damped-contribution recurrence to :func:`pagerank_integer`, but ALL
    teleport mass returns to a trusted seed set instead of spreading
    uniformly — trust flows outward from vetted hosts and decays with
    link distance, the classic spam-demotion prior a crawl scheduler
    layers over raw centrality.

        r0(v)    = scale DIV n_seeds   if v is a seed else 0
        r_k+1(v) = [teleport if seed]
                   + SUM over u->v of (r_k(u) * 17) DIV (20 * od(u))
        teleport = (scale * 3 DIV 20) DIV n_seeds

    Exact-BIGINT arithmetic end to end (same cross-engine DIV contract
    as pagerank_integer — see the module docstring); nodes never
    reached by any seed hold rank 0, which is the point. Seeds not
    present in the edge list still rank (they hold teleport mass).

    Scale shape: identical to pagerank_integer — per iteration one
    join of ranks onto the (outdeg-pre-joined, cached) edges + one
    dst-keyed hash aggregate; the seed set enters only as a
    node-table-sized left join.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    sd = seeds.select("node").distinct().cache()
    n_seeds = sd.count()
    if n_seeds == 0:
        raise ValueError("seed set is empty")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .union(sd.select("node"))
        .distinct()
        .cache()
    )
    r0 = scale // n_seeds
    teleport = (scale * (DAMP_DEN - DAMP_NUM) // DAMP_DEN) // n_seeds

    outdeg = edges.groupBy("src").agg(F.count("*").alias("od"))
    ed = edges.join(outdeg, "src").select("src", "dst", "od").cache()

    is_seed = (
        nodes.join(sd.withColumn("_s", F.lit(1)), "node", "left")
        .select("node", F.coalesce("_s", F.lit(0)).alias("_s"))
        .cache()
    )
    ranks = is_seed.select(
        "node", (F.col("_s") * F.lit(r0)).cast("long").alias("rank")
    )
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
            is_seed.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.col("_s") * F.lit(teleport)
                    + F.coalesce(F.col("contrib"), F.lit(0))
                )
                .cast("long")
                .alias("rank"),
            )
            .cache()
        )
    return ranks


HITS_SCALE = 1_000_000  # hub/auth mass in e6 micro-units (see overflow note)


def hits_integer(
    edges: DataFrame,
    iters: int = 2,
    scale: int = HITS_SCALE,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
    list (columns ``src``, ``dst``) in exact BIGINT arithmetic; returns
    ``(node, hub, auth)`` for every node on either side of an edge.

    PageRank (:func:`pagerank_integer`) scores a page by who points at
    it; HITS separates WHERE to find content (authorities) from WHERE
    to find links (hubs) — the directory-page vs content-page split a
    crawl prioritizer wants. Pinned iteration (L1-normalized, the
    integer-closable choice — classic L2 needs sqrt):

        hub_0(u)  = scale DIV n                         (all nodes)
        auth'(v)  = SUM over u->v of hub_k(u)
        auth_k+1  = (auth' * scale) DIV SUM(auth')      (0 if no total)
        hub'(u)   = SUM over u->v of auth_k+1(v)
        hub_k+1   = (hub' * scale) DIV SUM(hub')

    Every step is BIGINT sums + BIGINT ``div`` (Spark ``DIV`` == DuckDB
    ``//`` on the non-negative operands used), so any parallelism and a
    SQL oracle agree bit-for-bit. Floor losses shrink total mass
    slightly per step — deterministic, identical both sides.

    Overflow bound: the un-normalized sums satisfy ``SUM(auth') =
    SUM_u hub(u)*outdeg(u) <= scale * max_outdeg``, and the rescale
    multiplies by ``scale`` again, so ``scale^2 * max_outdeg`` must
    stay under 2^63 — the e6 default leaves room for outdeg up to
    ~9·10^6; raise ``scale`` only with that product in mind.

    Scale shape: per half-iteration ONE join of the (cached,
    outdeg-free) edge list onto the node-sized score table plus one
    hash aggregate keyed by the far endpoint, then a scalar-aggregate
    rescale (broadcast of ONE row — plan-lint's provably-bounded
    case). Scores are cached per iteration so lineage stays O(1).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select("src", "dst").cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("hub"),
            F.lit(0).cast("long").alias("auth"),
        )

    def _rescale(raw: DataFrame, col: str) -> DataFrame:
        """(node, col) summed to ``scale`` total via one scalar agg."""
        tot = raw.groupBy().agg(F.sum(col).alias("_t"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(tot)
            .select(
                "node",
                F.when(
                    F.col("_t").isNotNull() & (F.col("_t") > 0),
                    F.expr(f"({col} * {scale}) DIV _t"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias(col),
            )
            .na.fill({col: 0})
        )

    hub = nodes.select("node", F.lit(scale // n).cast("long").alias("hub"))
    auth = None
    for _ in range(iters):
        auth_raw = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").cast("long").alias("auth"))
        )
        auth = _rescale(auth_raw, "auth").cache()
        hub_raw = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").cast("long").alias("hub"))
        )
        hub = _rescale(hub_raw, "hub").cache()
    return hub.join(auth, "node").select("node", "hub", "auth")


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 8,
) -> DataFrame:
    """Multi-source breadth-first levels over a directed edge list:
    ``(node, depth)`` where depth is the minimum number of hops from
    any seed (seeds at 0). Nodes unreachable within ``max_depth`` are
    ABSENT from the result — the caller left-joins if it wants nulls.

    This is crawl depth from a seed list — the frontier-prioritization
    signal (pages deep below every portal are low-value; CommonCrawl
    and friends cap harvest depth per host). The reference's sync walks
    ONE directory listing (`DropboxSynchronizer.class.js:125-156`);
    a web frontier is a graph, and depth is its scheduling prior.

    Scale shape: O(reached-diameter) rounds, each ONE equi-join of the
    edge list against the current frontier (frontier-sized, usually
    tiny vs edges) + distinct + ONE left-anti join against the visited
    set — all shuffles keyed by node. The visited set grows to
    |reached nodes| — node-table-sized state, exactly what
    connected_components already carries.

    Lineage discipline — STRONGER than the cache()-per-round the other
    iterative operators use: ``visited_d = visited_{d-1} UNION nxt_d``
    where ``nxt_d`` itself anti-joins ``visited_{d-1}``, so the
    logical plan would embed the previous round TWICE per round —
    exponential 2^depth plan growth that cache() does not stop
    (caching short-circuits physical re-execution, but the analyzer
    still walks the full logical tree: observed as a driver-heap OOM
    at depth 8 on a 97-node graph). Eager ``localCheckpoint`` truncates
    the round's plan to its materialized RDD, making every round's
    plan O(1). Local checkpoints do not survive executor loss — the
    standard trade for iterative DataFrame algorithms; a resumable run
    wraps the loop in the pipeline checkpoint envelope instead.
    """
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    e = edges.select("src", "dst").distinct().cache()
    visited = (
        seeds.select("node")
        .distinct()
        .withColumn("depth", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("depth", F.lit(d).cast("int"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:  # scalar on the materialized checkpoint
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


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


# ------------------------------------------------------ k-core peeling


def kcore(
    edges: DataFrame,
    k: int,
    max_iter: int = 20,
) -> DataFrame:
    """(node, core_degree) — the k-CORE of an undirected simple graph:
    the maximal subgraph in which every node has degree >= k, found by
    the classic peeling fixpoint (repeatedly delete nodes of degree
    < k; what survives is the core). ``core_degree`` is the node's
    degree WITHIN the surviving core.

    Link-farm / spam-cluster triage at crawl scale: dense cores of
    reciprocal linking survive high-k peeling while organic link
    neighborhoods (pendant pages, shallow fans) peel away — the
    density complement to trustrank_integer's seed-distance prior
    (Gyongyi 2004) and the subgraph sibling of triangle_count's local
    clustering evidence.

    ``edges``: columns ``a``, ``b``, one row per undirected edge,
    ``a <> b``, each {a,b} once (triangle_count's canonical contract —
    callers canonicalize with least/greatest + distinct).

    Pinned semantics: simultaneous deletion each round (all nodes with
    current degree < k leave together — the standard Matula/Beck
    schedule, order-free and therefore deterministic at any
    parallelism); raises RuntimeError if the fixpoint is not reached
    within ``max_iter`` rounds rather than returning a half-peeled
    subgraph that LOOKS like a core.

    Scale shape: each round is one degree aggregate over the surviving
    edges (hash agg keyed by node after an explode to both endpoints)
    + two semi-joins filtering the edge list — all node-keyed, no pair
    blowup anywhere; the driver sees a single survivor-count scalar
    per round (the convergence test). Plans stay O(1) per round via
    eager localCheckpoint (the bfs_depth lineage discipline — the
    filtered edge list would otherwise re-embed every prior round).
    Round count is the peeling depth of the graph, which for web
    graphs is tens, not thousands; ``max_iter`` is the contract that
    an adversarial chain (each round peels one node) fails loudly
    instead of running unbounded.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    cur = edges.select("a", "b").distinct().localCheckpoint(eager=True)
    n_edges = cur.count()
    for _ in range(max_iter):
        deg = (
            cur.select(F.col("a").alias("node"))
            .unionByName(cur.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count("*").cast("long").alias("core_degree"))
        )
        keep = deg.where(F.col("core_degree") >= k)
        nxt = (
            cur.join(keep.select(F.col("node").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("node").alias("b")), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        if n_next == n_edges:
            # fixpoint: every surviving node already has degree >= k
            return keep
        cur, n_edges = nxt, n_next
        if n_edges == 0:
            # the k-core is empty (or isolated high-k nodes cannot
            # exist without edges) — report the empty frame with the
            # contract schema
            return (
                cur.select(F.col("a").alias("node"))
                .withColumn("core_degree", F.lit(0).cast("long"))
                .where(F.lit(False))
            )
    raise RuntimeError(
        f"k-core peeling did not converge within {max_iter} rounds "
        f"(k={k}); raise max_iter"
    )


# ---------------------------------------- two-phase star contraction


def connected_components_star(
    edges: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """(node, component) — connected components by ALTERNATING
    large-star / small-star contraction (Kiveris, Lattanzi, Mirrokni,
    Rastogi & Vassilvitskii, SoCC'14 "Connected Components in
    MapReduce and Beyond"): per round every node re-points its
    neighbors at the minimum of its closed neighborhood, which
    CONTRACTS long chains exponentially — O(log n) rounds on ANY
    graph, versus the O(diameter) rounds of min-label propagation
    (``training/dedup.py:dedup_transitive_clusters``). On a 10⁹-node
    near-chain dedup graph (bucket chains from overlapping LSH bands)
    diameter can be millions: label propagation is structurally dead
    there, star contraction is not — this operator is the scale path,
    the label-propagation twin stays as the low-constant choice for
    shallow graphs.

    Pinned semantics (the paper's rules, node order = ascending id):

    * large-star at u: every STRICTLY GREATER neighbor re-points to
      ``m = min(N(u) ∪ {u})``;
    * small-star at u: every neighbor ``≤ u`` (and u itself) re-points
      to m;
    * edges live canonically as (a < b) pairs; a round = large THEN
      small; convergence = the canonical edge set is UNCHANGED by a
      full round (checked exactly with two anti-joins, a scalar per
      round); at the fixpoint every component is a star around its
      minimum node and the label read-off is each node's closed-
      neighborhood minimum.

    Deterministic at any parallelism (all rules are min/comparisons),
    RAISES RuntimeError if ``max_rounds`` rounds don't converge
    (2·log₂(n) bounds it in theory; 30 covers 10⁹ nodes with margin)
    rather than returning a half-contracted forest that looks like
    labels. Per-phase cost: one explode-to-both-orientations, one
    node-keyed min aggregate, one join back — all shuffles keyed by
    node id; eager localCheckpoint per phase keeps the plan O(1)
    (the bfs_depth lineage discipline).
    """
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")

    def canon(df: DataFrame) -> DataFrame:
        return (
            df.where(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
        )

    def star(cur: DataFrame, large: bool) -> DataFrame:
        nbrs = cur.select("a", "b").unionByName(
            cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        m = nbrs.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        j = nbrs.join(m, "a")
        if large:
            out = j.where(F.col("b") > F.col("a")).select(
                F.col("b").alias("a"), F.col("m").alias("b")
            )
        else:
            out = j.where(F.col("b") <= F.col("a")).select(
                F.col("b").alias("a"), F.col("m").alias("b")
            ).unionByName(m.select(F.col("a"), F.col("m").alias("b")))
        return canon(out).localCheckpoint(eager=True)

    cur = canon(
        edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        nxt = star(star(cur, large=True), large=False)
        changed = (
            nxt.join(cur, ["a", "b"], "left_anti").count()
            + cur.join(nxt, ["a", "b"], "left_anti").count()
        )
        if changed == 0:
            nbrs = cur.select("a", "b").unionByName(
                cur.select(F.col("b").alias("a"), F.col("a").alias("b"))
            )
            return (
                nbrs.groupBy("a")
                .agg(F.least(F.min("b"), F.first("a")).alias("component"))
                .select(F.col("a").alias("node"), "component")
            )
        cur = nxt
    raise RuntimeError(
        f"star contraction did not converge within {max_rounds} rounds "
        "(theory bound ~2·log2(n)); raise max_rounds"
    )


# ------------------------------------------- co-citation / coupling


def copair_counts(
    edges: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    max_group_degree: int | None = None,
) -> DataFrame:
    """(item_a, item_b, n_common) — unordered pairs of items that share
    ``n_common`` groups: one group-keyed self-join + hash count. With
    (group=citing doc, item=cited doc) this is CO-CITATION (Small,
    JASIS 1973 — documents cited TOGETHER are related); with the roles
    swapped it is BIBLIOGRAPHIC COUPLING (Kessler 1963 — documents
    sharing references are related). The same mechanism ranks related
    pages from the web link graph.

    Scale shape: cost is Σ degree² over groups — a hub group (a review
    article citing thousands, a directory page linking everything)
    detonates it, so ``max_group_degree`` drops over-degree groups
    plan-side BEFORE the join (the max_df discipline; an explicit
    coverage decision, never a silent one — the count of dropped
    groups is the caller's to audit via a degree profile).
    ``min_count`` thresholds the output AFTER counting."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    e = edges.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("it")
    ).distinct()
    if max_group_degree is not None:
        if max_group_degree < 2:
            raise ValueError(
                f"max_group_degree must be >= 2, got {max_group_degree}"
            )
        deg = e.groupBy("g").agg(F.count("*").alias("_d"))
        ok = deg.where(F.col("_d") <= max_group_degree).select("g")
        e = e.join(ok, "g")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.it") < F.col("b.it")))
        .groupBy(F.col("a.it").alias("item_a"), F.col("b.it").alias("item_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
        .where(F.col("n_common") >= min_count)
    )
