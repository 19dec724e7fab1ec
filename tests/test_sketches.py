"""Sketch accuracy + structural guarantees (training/sketches.py).

The CORRECTNESS gate proves the sketches are built bit-identically to
the DuckDB twin; these tests prove they are USEFUL — the probabilistic
guarantees actually hold on realistic data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_search_spark.training import sketches as SK


def _zipf_words(spark, n_rows=20_000, vocab=800):
    """Deterministic Zipf-ish multiset: word_j appears ~ n/(j+1) times."""
    return (
        spark.range(n_rows)
        .select(
            F.concat(
                F.lit("w"),
                (
                    F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10)
                    .cast("long")
                    % F.lit(vocab)
                ).cast("string"),
            ).alias("w")
        )
    )


def test_cms_never_underestimates_and_bound(spark):
    words = _zipf_words(spark).cache()
    depth, width = 4, 512
    sketch = SK.cms_build(words, "w", depth, width)
    exact = words.groupBy("w").agg(F.count(F.lit(1)).alias("exact"))
    est = SK.cms_estimate(sketch, exact, "w", depth, width).collect()
    n_total = words.count()
    assert est, "no estimates produced"
    for r in est:
        assert r.cms_est >= r.exact, f"CMS underestimated {r.w}"
        # Markov bound: overestimate <= 2N/width holds w.h.p. per row;
        # with depth=4 the min is far inside it in practice.
        assert r.cms_est - r.exact <= 2 * n_total / width + 1
    words.unpersist()


def test_hll_estimate_within_tolerance(spark):
    # 5000 exact-distinct values; m=64 gives ~1.04/sqrt(64) = 13% std err
    vals = spark.range(5000).select(F.concat(F.lit("v"), F.col("id")).alias("w"))
    regs = SK.hll_registers(vals, "w").collect()
    est = SK.hll_estimate_from_registers([(r.register, r.max_rho) for r in regs])
    assert abs(est - 5000) / 5000 < 0.30, f"HLL est {est} vs 5000"


def test_hll_small_range_correction(spark):
    vals = spark.range(20).select(F.concat(F.lit("s"), F.col("id")).alias("w"))
    regs = SK.hll_registers(vals, "w").collect()
    est = SK.hll_estimate_from_registers([(r.register, r.max_rho) for r in regs])
    assert abs(est - 20) / 20 < 0.35, f"linear-counting est {est} vs 20"


def test_bloom_no_false_negatives_and_fp_rate(spark):
    members = spark.range(1000).select(F.concat(F.lit("m"), F.col("id")).alias("w"))
    others = spark.range(4000).select(F.concat(F.lit("x"), F.col("id")).alias("w"))
    m_bits, k = 1 << 15, 3
    bloom = SK.bloom_build(members, "w", m_bits, k)
    in_hits = SK.bloom_probe(bloom, members, "w", m_bits, k)
    assert in_hits.filter(~F.col("bloom_hit")).count() == 0, "false negative!"
    fp = SK.bloom_probe(bloom, others, "w", m_bits, k).filter(F.col("bloom_hit")).count()
    # (1 - e^{-kn/m})^k with n=1000, m=2^15, k=3 -> ~0.6% expected
    assert fp / 4000 < 0.05, f"false-positive rate {fp/4000:.3%}"


def test_cms_sketch_state_is_bounded(spark):
    words = _zipf_words(spark, n_rows=5000, vocab=3000)
    sketch = SK.cms_build(words, "w", depth=4, width=64)
    assert sketch.count() <= 4 * 64
    # The aggregate must partial-combine map-side: the plan carries a
    # partial_count before the exchange (sketch-sized shuffle, not
    # corpus-sized).
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial" in plan.lower()


def test_sketch_merges_equal_single_pass(spark):
    """merge(build(A), build(B)) must equal build(A ∪ B) cell-for-cell —
    the property that makes shard-parallel and streaming-incremental
    sketch maintenance exact."""
    a = _zipf_words(spark, n_rows=4000, vocab=500)
    b = _zipf_words(spark, n_rows=3000, vocab=900)
    both = a.unionByName(b)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    m = SK.cms_merge(SK.cms_build(a, "w"), SK.cms_build(b, "w"))
    assert rows(m) == rows(SK.cms_build(both, "w"))

    hm = SK.hll_merge(SK.hll_registers(a, "w"), SK.hll_registers(b, "w"))
    assert rows(hm) == rows(SK.hll_registers(both, "w"))

    bm = SK.bloom_merge(SK.bloom_build(a, "w"), SK.bloom_build(b, "w"))
    assert rows(bm) == rows(SK.bloom_build(both, "w"))


def test_hist_quantiles_error_bound_and_merge(spark):
    from ocr_search_spark.training import sketches as SK
    from pyspark.sql import functions as F

    vals = [(i * i % 100000,) for i in range(5000)]
    df = spark.createDataFrame(vals, "x long")
    hist = SK.hist_build(df, "x", shift=10, n_bins=128)
    got = {
        r["q_micros"]: r["est"]
        for r in SK.hist_quantiles(hist, [500_000, 900_000], shift=10).collect()
    }
    xs = sorted(v[0] for v in vals)
    for qm in (500_000, 900_000):
        exact = xs[max(0, -(-qm * len(xs) // 1_000_000) - 1)]
        # estimate = upper edge of the hit bin: within one bin width above
        assert exact <= got[qm] <= exact + (1 << 10), (qm, exact, got[qm])

    # mergeability: shard-built states sum to the single-pass state
    a = SK.hist_build(df.where(F.col("x") % 2 == 0), "x", shift=10, n_bins=128)
    b = SK.hist_build(df.where(F.col("x") % 2 == 1), "x", shift=10, n_bins=128)
    merged = {
        (r["bin"]): r["cnt"] for r in SK.hist_merge(a, b).collect()
    }
    single = {(r["bin"]): r["cnt"] for r in hist.collect()}
    assert merged == single


def test_hist_build_clamps_overflow(spark):
    from ocr_search_spark.training import sketches as SK

    df = spark.createDataFrame([(0,), (10**15,), (-5,)], "x long")
    bins = {r["bin"] for r in SK.hist_build(df, "x", shift=4, n_bins=8).collect()}
    assert bins <= set(range(8))
    assert 7 in bins and 0 in bins


# ------------------------------------------------------------ KMV / theta


def _kmv_groups(spark, n=3000):
    """Two groups with known overlap: A = [0, 2000), B = [1000, 3000)
    → |A|=|B|=2000, |A∩B|=1000, |A∪B|=3000."""
    ids = spark.range(n).select(F.col("id").cast("long").alias("v"))
    a = ids.where(F.col("v") < 2000).select(F.lit("A").alias("g"), "v")
    b = ids.where(F.col("v") >= 1000).select(F.lit("B").alias("g"), "v")
    return a.unionByName(b)


def test_kmv_exact_mode_below_k(spark):
    """Groups smaller than k: theta = full range, estimate is EXACT."""
    df = _kmv_groups(spark, n=3000)
    sk = SK.kmv_build(df.where(F.col("v") % 50 == 0), "v", ("g",), k=64)
    est = {r["g"]: r["est"] for r in SK.kmv_estimate(sk, ("g",)).collect()}
    assert est == {"A": 40, "B": 40}  # 2000/50 exactly


def test_kmv_estimate_within_tolerance(spark):
    df = _kmv_groups(spark)
    sk = SK.kmv_build(df, "v", ("g",), k=256)
    est = {r["g"]: r["est"] for r in SK.kmv_estimate(sk, ("g",)).collect()}
    for g in "AB":
        assert abs(est[g] - 2000) / 2000 < 0.25  # RSE ~ 1/sqrt(k-2) ≈ 6%


def test_kmv_pair_set_operations(spark):
    """Union AND intersection estimates from sketch state only."""
    df = _kmv_groups(spark)
    sk = SK.kmv_build(df, "v", ("g",), k=256)
    row = SK.kmv_pair_estimates(sk, "g").collect()[0]
    assert (row["key_a"], row["key_b"]) == ("A", "B")
    assert abs(row["est_union"] - 3000) / 3000 < 0.25
    assert abs(row["est_inter"] - 1000) / 1000 < 0.40  # fewer samples
    # inclusion-exclusion consistency within sampling slack
    assert (
        abs((row["est_a"] + row["est_b"] - row["est_union"]) - row["est_inter"])
        / 1000
        < 0.40
    )


def test_kmv_merge_equals_single_pass(spark):
    df = _kmv_groups(spark)
    h1 = df.where(F.col("v") % 2 == 0)
    h2 = df.where(F.col("v") % 2 == 1)
    direct = {
        r["g"]: (r["sketch"], r["theta"])
        for r in SK.kmv_build(df, "v", ("g",), k=64).collect()
    }
    merged = {
        r["g"]: (r["sketch"], r["theta"])
        for r in SK.kmv_merge(
            SK.kmv_build(h1, "v", ("g",), k=64),
            SK.kmv_build(h2, "v", ("g",), k=64),
            k=64,
        ).collect()
    }
    assert merged == direct


def test_kmv_sketch_state_is_bounded(spark):
    sk = SK.kmv_build(_kmv_groups(spark), "v", ("g",), k=64)
    rows = sk.collect()
    assert len(rows) == 2
    assert all(len(r["sketch"]) <= 64 for r in rows)
    assert all(r["sketch"] == sorted(r["sketch"]) for r in rows)


# ------------------------------------------- relative-error quantiles


def test_ddsketch_relative_error_and_merge(spark):
    """est <= true < est*(1+2^-m) at every probed quantile across 6
    orders of magnitude, and shard-merge == global build exactly."""
    import random

    from ocr_search_spark.training.sketches import (
        ddsketch_build,
        ddsketch_merge,
        ddsketch_quantiles,
    )

    rng = random.Random(24)
    vals = [rng.randrange(0, 10 ** rng.randrange(1, 7)) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    m = 4
    sk = ddsketch_build(df, "v", m_bits=m).cache()
    qs = [250000, 500000, 900000, 990000]
    got = {r["q_micros"]: r["est"] for r in ddsketch_quantiles(sk, qs).collect()}
    svals = sorted(vals)
    for q in qs:
        true = svals[-(-q * len(vals) // 1_000_000) - 1]  # ceil rank, 1-based
        est = got[q]
        assert est <= true <= est * (1 + 2 ** -m) + 1, (q, est, true)
    # shard merge == global
    half = len(vals) // 2
    a = ddsketch_build(spark.createDataFrame([(v,) for v in vals[:half]], "v long"), "v", m)
    b = ddsketch_build(spark.createDataFrame([(v,) for v in vals[half:]], "v long"), "v", m)
    merged = {(r["rep"], r["cnt"]) for r in ddsketch_merge(a, b).collect()}
    direct = {(r["rep"], r["cnt"]) for r in sk.collect()}
    assert merged == direct


def test_ddsketch_rejects_negative_and_bad_m(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from ocr_search_spark.training.sketches import ddsketch_build

    df = spark.createDataFrame([(5,), (-1,)], "v long")
    with pytest.raises(Exception) as ei:
        ddsketch_build(df, "v").collect()
    assert "non-negative" in str(ei.value)
    with pytest.raises(ValueError):
        ddsketch_build(df, "v", m_bits=0)
