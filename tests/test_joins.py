"""as-of and range join operators vs brute-force Python oracles."""

from __future__ import annotations

import random

from ocr_search_spark.operators.joins import asof_join, range_join_binned


def test_asof_join_vs_bruteforce(spark):
    rng = random.Random(7)
    left = [(i, rng.randrange(4), rng.randrange(1000)) for i in range(300)]
    right = [(rng.randrange(4), t, f"v{j}") for j, t in enumerate(rng.sample(range(1000), 200))]
    ldf = spark.createDataFrame(left, "lid long, k long, t long")
    rdf = spark.createDataFrame(right, "k long, rt long, v string")
    got = {
        r["lid"]: r["v"]
        for r in asof_join(ldf, rdf, on=["k"], left_on="t", right_on="rt").collect()
    }
    for lid, k, t in left:
        cands = [(rt, v) for (rk, rt, v) in right if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert got[lid] == expect, (lid, k, t)


def test_asof_join_rejects_collisions(spark):
    import pytest

    ldf = spark.createDataFrame([(1, 1, "x")], "k long, t long, v string")
    rdf = spark.createDataFrame([(1, 1, "y")], "k long, rt long, v string")
    with pytest.raises(ValueError):
        asof_join(ldf, rdf, on=["k"], left_on="t", right_on="rt")


def test_range_join_vs_bruteforce(spark):
    rng = random.Random(11)
    points = [(i, rng.uniform(0, 500)) for i in range(400)]
    ivs = [(j, lo, lo + rng.randrange(0, 40)) for j, lo in enumerate(rng.choices(range(0, 480), k=60))]
    pdf = spark.createDataFrame(points, "pt_id long, p double")
    idf = spark.createDataFrame(ivs, "iv_id long, lo long, hi long")
    got = sorted(
        (r["pt_id"], r["iv_id"])
        for r in range_join_binned(pdf, "p", idf, "lo", "hi", bin_width=25).collect()
    )
    expect = sorted(
        (pid, ivid)
        for pid, p in points
        for ivid, lo, hi in ivs
        if lo <= p <= hi
    )
    assert got == expect
    # each matching pair appears exactly once (no bin double-count)
    assert len(got) == len(set(got))


def test_bloom_pruned_join_equals_plain_join_and_prunes(spark):
    import pyspark.sql.functions as F
    from ocr_search_spark.operators.joins import bloom_pruned_join

    big = spark.createDataFrame(
        [(i % 100, i) for i in range(2000)], "k long, v long"
    )
    small = spark.createDataFrame([(3, "a"), (7, "b"), (99, "c")], "k long, tag string")
    got = sorted(map(tuple, bloom_pruned_join(big, small, "k").collect()))
    want = sorted(map(tuple, big.join(small, "k").collect()))
    assert got == want and len(got) == 60
    # the map-side filter actually prunes: count rows surviving the
    # bloom predicate alone (false positives allowed, but << all rows)
    from ocr_search_spark.training.sketches import bloom_build, bloom_probe
    bl = bloom_build(small.select("k"), "k")
    hits = bloom_probe(bl, big.select("k").distinct(), "k")
    n_pass = hits.where("bloom_hit").count()
    assert 3 <= n_pass <= 10  # 3 true keys + at most a few false positives


# ---------------------------------------------------- phonetic blocking


_SOUNDEX_GOLDEN = [
    ("Robert", "R163"), ("Rupert", "R163"), ("Ashcraft", "A261"),
    ("Ashcroft", "A261"), ("Tymczak", "T522"), ("Pfister", "P236"),
    ("Honeyman", "H555"), ("Washington", "W252"), ("Lee", "L000"),
    ("Gutierrez", "G362"), ("Jackson", "J250"), ("O'Brien", "O165"),
    ("", ""), ("123", ""),
]


def test_soundex_golden_codes(spark):
    from pyspark.sql import functions as F

    from ocr_search_spark.operators.simjoin import soundex_col

    df = spark.createDataFrame(
        [(n,) for n, _ in _SOUNDEX_GOLDEN], "name string"
    )
    got = {
        r["name"]: r["sdx"]
        for r in df.select("name", soundex_col(F.col("name")).alias("sdx")).collect()
    }
    for n, e in _SOUNDEX_GOLDEN:
        assert got[n] == e, (n, got[n], e)


def test_phonetic_pairs_blocks_and_guard(spark):
    from ocr_search_spark.operators.simjoin import phonetic_pairs

    rows = [
        (0, "Robert"), (1, "Rupert"), (2, "Rubin"),
        (3, "Ashcraft"), (4, "Ashcroft"), (5, "zzz123!!"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted(
        (r["id_a"], r["id_b"], r["soundex"])
        for r in phonetic_pairs(df, max_block=10).collect()
    )
    assert got == [(0, 1, "R163"), (3, 4, "A261")]
    # max_block guard drops the R163 block entirely
    crowded = df.union(
        spark.createDataFrame([(i, "Robert") for i in range(10, 20)], "id long, name string")
    )
    guarded = phonetic_pairs(crowded, max_block=5).collect()
    assert all(r["soundex"] != "R163" for r in guarded)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phonetic_pairs(df, max_block=1)


def test_blocking_eval_exact_metrics(spark):
    from ocr_search_spark.operators.simjoin import blocking_eval

    cand = spark.createDataFrame(
        [(0, 1), (0, 2), (3, 4)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(0, 1), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    r = blocking_eval(cand, truth, n_records=10).collect()[0]
    assert (r["n_cand"], r["n_true"], r["n_hit"]) == (3, 3, 2)
    assert r["reduction_ratio_e6"] == (45 - 3) * 1_000_000 // 45
    assert r["pair_completeness_e6"] == 2 * 1_000_000 // 3


def test_blocking_eval_empty_truth_null_pc(spark):
    from ocr_search_spark.operators.simjoin import blocking_eval

    cand = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    truth = spark.createDataFrame([], "id_a long, id_b long")
    r = blocking_eval(cand, truth, 5).collect()[0]
    assert r["pair_completeness_e6"] is None and r["n_hit"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        blocking_eval(cand, truth, 1)


def test_jaccard_prefix_pairs_vs_bruteforce(spark):
    """Prefix-filtered exact Jaccard join == brute-force all-pairs, on a
    corpus with a universal hot token, near-dup families, a just-below-
    threshold family, and disjoint singletons."""
    import itertools

    from ocr_search_spark.operators.simjoin import jaccard_prefix_pairs

    rows = []
    for g in range(6):
        fam = [f"w{g}x{j}" for j in range(10)]
        for m in range(3):
            uniq = [f"u{g}m{m}{j}" for j in range(1 if g % 2 == 0 else 4)]
            rows.append((g * 3 + m, " ".join(["the"] + fam + uniq)))
    rows.append((900, "zq1 zq2 zq3"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tau = 780000
    got = {
        (r["id_a"], r["id_b"]): r["jacc_e6"]
        for r in jaccard_prefix_pairs(df, tau_e6=tau).collect()
    }

    sets = {i: set(t.lower().split()) for i, t in rows}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        o = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if o * 1_000_000 >= tau * u:
            want[(a, b)] = o * 1_000_000 // u
    assert want and got == want
    # even-g families are in (J = 11/13), odd-g families out (11/19)
    assert (0, 1) in want and (3, 4) not in want


def test_jaccard_prefix_hot_token_never_joins(spark):
    """The universal token is ranked LAST by df-ascending order, so it
    never lands in any prefix: two docs sharing only 'the' produce zero
    candidate pairs (the guard that replaces max_df here)."""
    from ocr_search_spark.operators.simjoin import jaccard_prefix_pairs

    df = spark.createDataFrame(
        [(1, "the alpha beta gamma"), (2, "the delta epsilon zeta")],
        "doc_id long, text string",
    )
    assert jaccard_prefix_pairs(df, tau_e6=300000).count() == 0
    with __import__("pytest").raises(ValueError):
        jaccard_prefix_pairs(df, tau_e6=0)


# ------------------------------------------- Fellegi-Sunter linkage


def test_fs_link_score_hand_case(spark):
    import math

    from ocr_search_spark.operators.simjoin import fs_link_score

    pairs = spark.createDataFrame(
        [
            ("p1", "smith", "smith", "nyc", "nyc"),     # both agree
            ("p2", "smith", "smyth", "nyc", "sfo"),     # lev1 name, city off
            ("p3", "alice", "zelda", "nyc", "ber"),     # all disagree
        ],
        "pid string, name_a string, name_b string, city_a string, city_b string",
    )
    fields = [
        ("name_a", "name_b", 900_000, 10_000, "lev1"),
        ("city_a", "city_b", 800_000, 100_000, "exact"),
    ]
    wa_n = math.floor(1e6 * (math.log(900_000) - math.log(10_000)))
    wd_n = math.floor(1e6 * (math.log(100_000) - math.log(990_000)))
    wa_c = math.floor(1e6 * (math.log(800_000) - math.log(100_000)))
    wd_c = math.floor(1e6 * (math.log(200_000) - math.log(900_000)))
    got = {r["pid"]: (r["score_e6"], r["decision"])
           for r in fs_link_score(pairs, fields, upper_e6=4_000_000,
                                  lower_e6=1_000_000).collect()}
    assert got["p1"] == (wa_n + wa_c, "link")
    assert got["p2"] == (wa_n + wd_c, "possible")
    assert got["p3"] == (wd_n + wd_c, "non-link")

    import pytest
    with pytest.raises(ValueError):
        fs_link_score(pairs, [], 1, 0)
    with pytest.raises(ValueError):
        fs_link_score(pairs, fields, 1, 2)
    with pytest.raises(ValueError):
        fs_link_score(pairs, [("name_a", "name_b", 10, 20, "exact")], 1, 0)
