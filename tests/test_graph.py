"""Integer-exact PageRank vs a brute-force Python replay of the same
recurrence, plus the invariants that make the DuckDB oracle byte-exact."""

from __future__ import annotations

import random

import pytest

from ocr_search_spark.operators.graph import SCALE, pagerank_integer


def _pagerank_py(edges, iters=3, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    r = {v: scale // n for v in nodes}
    teleport = (scale * 3 // 20) // n
    for _ in range(iters):
        nxt = {v: teleport for v in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * 17) // (20 * od[s])
        r = nxt
    return r


def test_pagerank_vs_bruteforce(spark):
    rng = random.Random(23)
    edges = sorted({(rng.randrange(30), 100 + rng.randrange(12)) for _ in range(200)})
    # a few supplier->supplier edges so not every sink dangles
    edges += [(100, 101), (101, 100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank_integer(df, iters=3).collect()}
    assert got == _pagerank_py(edges)


def test_pagerank_parallelism_invariant(spark):
    """Bit-identical ranks at 1 and 32 partitions (the whole point of
    the integer formulation)."""
    rng = random.Random(5)
    edges = sorted({(rng.randrange(50), rng.randrange(50)) for _ in range(300)})
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank_integer(df.coalesce(1)).collect()}
    b = {r["node"]: r["rank"] for r in pagerank_integer(df.repartition(32)).collect()}
    assert a == b


def test_pagerank_mass_and_positivity(spark):
    edges = [(i, (i + 1) % 10) for i in range(10)]  # ring: no dangling mass
    df = spark.createDataFrame(edges, "src long, dst long")
    ranks = pagerank_integer(df, iters=4).collect()
    total = sum(r["rank"] for r in ranks)
    # Ring graph conserves mass up to per-node floor truncation:
    # each node loses < 1 unit per division, teleport floors once more.
    assert SCALE - 10 * 2 * 4 <= total <= SCALE
    assert all(r["rank"] > 0 for r in ranks)


def test_pagerank_rejects_bad_iters(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_integer(df, iters=0)


# ----------------------------------------------------- triangle counting

from ocr_search_spark.operators.graph import triangle_count


def _tri(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return triangle_count(df).collect()[0]


def test_triangles_k4_plus_pendant(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _tri(spark, k4 + [(4, 5)])
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (6, 7, 4)


def test_triangles_path_none(spark):
    r = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert r.n_triangles == 0 and r.n_wedges >= 0


def test_triangles_shared_edge(spark):
    r = _tri(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    assert r.n_triangles == 2


def test_triangles_star_hub_no_blowup(spark):
    # hub of degree 100: naive adjacency self-join would enumerate
    # C(100,2)=4950 pairs; degree orientation points every edge AT the
    # hub, so the oriented wedge count from the hub is 0.
    star = [(100_000, i) for i in range(100)]
    r = _tri(spark, star)
    assert r.n_triangles == 0
    assert r.n_wedges == 0, "orientation failed to defuse the hub"


def test_skew_profile_exact_shares_and_salts(spark):
    from ocr_search_spark.operators.profile import skew_profile

    rows = [("a",)] * 120 + [("b",)] * 57 + [("c",)] * 57 + [("d",)] * 6
    df = spark.createDataFrame(rows, "k string").repartition(5)
    out = skew_profile(df, "k", n_top=3, salt_target=50)
    got = [(r["key"], r["cnt"], r["share_e6"], r["salt"]) for r in out.collect()]
    # total=240; tie between b and c broken by key ASC; d cut by n_top
    assert got == [
        ("a", 120, 500_000, 3),
        ("b", 57, 237_500, 2),
        ("c", 57, 237_500, 2),
    ]


def test_label_propagation_star_communities(spark):
    from ocr_search_spark.operators.graph import label_propagation

    # two 4-spoke stars with roots 0 and 10: the self-vote settles each
    # star on its root's label in one round and holds it there
    edges = spark.createDataFrame(
        [(i, 0) for i in (1, 2, 3, 4)] + [(i, 10) for i in (11, 12, 13, 14)],
        "src long, dst long",
    )
    out = {r["node"]: r["label"] for r in label_propagation(edges, iters=2).collect()}
    assert all(out[i] == 0 for i in (0, 1, 2, 3, 4))
    assert all(out[i] == 10 for i in (10, 11, 12, 13, 14))


def test_label_propagation_partition_invariance(spark):
    from ocr_search_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src long, dst long"
    )
    a = sorted(map(tuple, label_propagation(edges, iters=3).collect()))
    b = sorted(map(tuple, label_propagation(edges.repartition(7), iters=3).collect()))
    assert a == b


# ----------------------------------------------------------- HITS


def _hits_py(edges, iters=2, scale=1_000_000):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    hub = {v: scale // n for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iters):
        raw_a = {v: 0 for v in nodes}
        for s, d in edges:
            raw_a[d] += hub[s]
        ta = sum(raw_a.values())
        auth = {v: (raw_a[v] * scale) // ta if ta > 0 else 0 for v in nodes}
        raw_h = {v: 0 for v in nodes}
        for s, d in edges:
            raw_h[s] += auth[d]
        th = sum(raw_h.values())
        hub = {v: (raw_h[v] * scale) // th if th > 0 else 0 for v in nodes}
    return {v: (hub[v], auth[v]) for v in nodes}


def test_hits_vs_bruteforce(spark):
    from ocr_search_spark.operators.graph import hits_integer

    rng = random.Random(11)
    edges = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(150)})
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_integer(df, iters=2).collect()
    }
    assert got == _hits_py(edges)


def test_hits_hub_authority_split(spark):
    """A directory node pointing at three content nodes must score as
    pure hub; the content nodes as pure authorities."""
    from ocr_search_spark.operators.graph import hits_integer

    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    r = {x["node"]: x for x in hits_integer(df, iters=2).collect()}
    assert r[0]["hub"] > 0 and r[0]["auth"] == 0
    for v in (1, 2, 3):
        assert r[v]["hub"] == 0 and r[v]["auth"] > 0
    # the three authorities tie exactly (symmetry is integer-preserved)
    assert len({r[v]["auth"] for v in (1, 2, 3)}) == 1


def test_hits_parallelism_invariant(spark):
    from ocr_search_spark.operators.graph import hits_integer

    rng = random.Random(7)
    edges = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(250)})
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_integer(df.coalesce(1)).collect()
    }
    b = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_integer(df.repartition(32)).collect()
    }
    assert a == b


def test_hits_rejects_bad_iters(spark):
    from ocr_search_spark.operators.graph import hits_integer

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        hits_integer(df, iters=0)


# ----------------------------------------------------------- BFS depth


def _bfs_py(edges, seeds, max_depth):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    depth = {v: 0 for v in seeds}
    frontier = set(seeds)
    for dd in range(1, max_depth + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    nxt.add(v)
        for v in nxt:
            depth[v] = dd
        if not nxt:
            break
        frontier = nxt
    return depth


def test_bfs_depth_vs_bruteforce(spark):
    from ocr_search_spark.operators.graph import bfs_depth

    rng = random.Random(3)
    edges = sorted({(rng.randrange(60), rng.randrange(60)) for _ in range(150)})
    seeds = [0, 1, 2]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {r["node"]: r["depth"] for r in bfs_depth(e, s, max_depth=8).collect()}
    assert got == _bfs_py(edges, seeds, 8)


def test_bfs_depth_levels_cycle_and_unreachable(spark):
    """0->1->2->0 cycle plus an island 9: cycle nodes get min-hop depths
    once, the island never appears."""
    from ocr_search_spark.operators.graph import bfs_depth

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (9, 9)], "src long, dst long"
    )
    s = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["depth"] for r in bfs_depth(e, s, max_depth=5).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_depth_cap_and_multi_seed_min(spark):
    """max_depth truncates the walk; a node reachable from two seeds
    takes the MINIMUM depth."""
    from ocr_search_spark.operators.graph import bfs_depth

    chain = [(i, i + 1) for i in range(6)]  # 0->1->...->6
    e = spark.createDataFrame(chain, "src long, dst long")
    s = spark.createDataFrame([(0,), (4,)], "node long")
    got = {r["node"]: r["depth"] for r in bfs_depth(e, s, max_depth=2).collect()}
    # node 3 is 3 hops from seed 0 -> cut by the cap; 6 is 2 hops from 4
    assert got == {0: 0, 4: 0, 1: 1, 5: 1, 2: 2, 6: 2}


# ----------------------------------------------------------- TrustRank


def _trustrank_py(edges, seeds, iters=3, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges} | set(seeds))
    od = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    ns = len(set(seeds))
    r = {v: (scale // ns if v in seeds else 0) for v in nodes}
    teleport = (scale * 3 // 20) // ns
    for _ in range(iters):
        nxt = {v: (teleport if v in seeds else 0) for v in nodes}
        for s, d in edges:
            nxt[d] += (r[s] * 17) // (20 * od[s])
        r = nxt
    return r


def test_trustrank_vs_bruteforce(spark):
    from ocr_search_spark.operators.graph import trustrank_integer

    rng = random.Random(17)
    edges = sorted({(rng.randrange(40), rng.randrange(40)) for _ in range(200)})
    seeds = [0, 1, 2, 3]
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "node long")
    got = {r["node"]: r["rank"] for r in trustrank_integer(e, s, iters=3).collect()}
    assert got == _trustrank_py(edges, set(seeds))


def test_trustrank_trust_decays_and_unreached_zero(spark):
    """Chain 0->1->2 with island 9: trust decays along the chain and the
    island (not a seed, unreachable) holds exactly 0."""
    from ocr_search_spark.operators.graph import trustrank_integer

    e = spark.createDataFrame([(0, 1), (1, 2), (9, 9)], "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    r = {x["node"]: x["rank"] for x in trustrank_integer(e, s, iters=3).collect()}
    assert r[0] > r[1] > r[2] > 0
    assert r[9] == 0


def test_trustrank_validation(spark):
    from ocr_search_spark.operators.graph import trustrank_integer

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    s = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(ValueError):
        trustrank_integer(e, s, iters=0)
    empty = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError):
        trustrank_integer(e, empty)


# ----------------------------------------------------------- k-core


def _kcore_py(edges, k):
    """Simultaneous-deletion peeling oracle in plain Python."""
    cur = {tuple(sorted(e)) for e in edges}
    while True:
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        nxt = {(a, b) for a, b in cur if a in keep and b in keep}
        if nxt == cur:
            return deg
        cur = nxt
        if not cur:
            return {}


def test_kcore_clique_plus_pendants(spark):
    """K5 with a pendant chain: the chain peels away, the clique is the
    3-core with every survivor at degree 4."""
    from ocr_search_spark.operators.graph import kcore

    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    chain = [(4, 5), (5, 6), (6, 7)]
    e = spark.createDataFrame(clique + chain, "a long, b long")
    out = {r["node"]: r["core_degree"] for r in kcore(e, k=3).collect()}
    assert out == {v: 4 for v in range(5)}


def test_kcore_vs_bruteforce_random(spark):
    from ocr_search_spark.operators.graph import kcore

    rng = random.Random(31)
    edges = set()
    while len(edges) < 60:
        a, b = rng.randrange(25), rng.randrange(25)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    e = spark.createDataFrame(sorted(edges), "a long, b long")
    for k in (2, 3, 4):
        got = {r["node"]: r["core_degree"] for r in kcore(e, k=k).collect()}
        assert got == _kcore_py(edges, k)


def test_kcore_empty_core_schema(spark):
    """A path graph has no 2-core; the result is empty but keeps the
    (node, core_degree) contract schema."""
    from ocr_search_spark.operators.graph import kcore

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "a long, b long")
    out = kcore(e, k=2)
    assert out.columns == ["node", "core_degree"]
    assert out.count() == 0


def test_kcore_parallelism_invariant(spark):
    from ocr_search_spark.operators.graph import kcore

    clique = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    e = spark.createDataFrame(clique + [(5, 6), (6, 7)], "a long, b long")
    a = sorted(map(tuple, kcore(e, k=3).collect()))
    b = sorted(map(tuple, kcore(e.repartition(7), k=3).collect()))
    assert a == b


def test_kcore_validation(spark):
    from ocr_search_spark.operators.graph import kcore

    e = spark.createDataFrame([(0, 1)], "a long, b long")
    with pytest.raises(ValueError):
        kcore(e, k=0)
    with pytest.raises(ValueError):
        kcore(e, k=2, max_iter=0)
    with pytest.raises(RuntimeError):
        # a 12-chain peels one endpoint pair per round at k=2... actually
        # a path has empty 2-core immediately; use max_iter=1 on a graph
        # needing 2 rounds: K4 plus pendant chain of 2 at k=3
        clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        kcore(
            spark.createDataFrame(clique + [(3, 4), (4, 5)], "a long, b long"),
            k=3,
            max_iter=1,
        )


# ---------------------------------------- star-contraction components


def _cc_py(edges):
    import itertools

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes = set(itertools.chain.from_iterable(edges))
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in nodes}


def test_cc_star_vs_union_find_random(spark):
    from ocr_search_spark.operators.graph import connected_components_star

    rng = random.Random(41)
    edges = set()
    while len(edges) < 40:
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    e = spark.createDataFrame(sorted(edges), "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components_star(e).collect()}
    assert got == _cc_py(edges)


def test_cc_star_long_chain_logarithmic(spark):
    """A 60-node path has diameter 59 — min-label propagation needs ~59
    rounds; star contraction must finish well inside 2·log2(60)+slack."""
    from ocr_search_spark.operators.graph import connected_components_star

    chain = [(i, i + 1) for i in range(59)]
    e = spark.createDataFrame(chain, "a long, b long")
    out = {r["node"]: r["component"] for r in connected_components_star(e, max_rounds=14).collect()}
    assert set(out.values()) == {0} and len(out) == 60


def test_cc_star_multiple_components_and_self_loops(spark):
    from ocr_search_spark.operators.graph import connected_components_star

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6), (9, 9)], "a long, b long"
    )
    out = {r["node"]: r["component"] for r in connected_components_star(e).collect()}
    # self-loop-only node 9 drops (no real edge); two components remain
    assert out == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5}


def test_cc_star_validation_and_nonconvergence_guard(spark):
    from ocr_search_spark.operators.graph import connected_components_star

    e = spark.createDataFrame([(0, 1)], "a long, b long")
    with pytest.raises(ValueError):
        connected_components_star(e, max_rounds=0)


# ------------------------------------------- co-citation / coupling


def test_copair_counts_cocitation_and_guard(spark):
    """Hand-checked co-citation counts, the coupling dual via role
    swap, and the hub-degree guard dropping a mega-citer plan-side."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from ocr_search_spark.operators.graph import copair_counts

    edges = [
        ("c1", "x"), ("c1", "y"),
        ("c2", "x"), ("c2", "y"), ("c2", "z"),
        ("c3", "y"), ("c3", "z"),
        ("hub", "x"), ("hub", "y"), ("hub", "z"), ("hub", "w"), ("hub", "v"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r["item_a"], r["item_b"]): r["n_common"]
           for r in copair_counts(df, "src", "dst", max_group_degree=4).collect()}
    # hub (degree 5) excluded: x,y co-cited by c1+c2; y,z by c2+c3; x,z by c2
    assert got == {("x", "y"): 2, ("y", "z"): 2, ("x", "z"): 1}
    # without the guard the hub inflates every pair and adds w/v pairs
    unguarded = {(r["item_a"], r["item_b"]): r["n_common"]
                 for r in copair_counts(df, "src", "dst").collect()}
    assert unguarded[("x", "y")] == 3 and ("v", "w") in unguarded
    # bibliographic coupling = the role swap: citing docs sharing refs
    coup = {(r["item_a"], r["item_b"]): r["n_common"]
            for r in copair_counts(df, "dst", "src", max_group_degree=4).collect()}
    assert coup[("c1", "c2")] == 2  # share x and y
    with pytest.raises(ValueError):
        copair_counts(df, "src", "dst", min_count=0)
    with pytest.raises(ValueError):
        copair_counts(df, "src", "dst", max_group_degree=1)
