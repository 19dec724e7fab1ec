"""Inverted-index + search parity vs the golden oracle (SURVEY §2.2 E15,
§2.4 Q1-Q5), plus the posting-consistency invariant of FIXTURES.md §3."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_search_spark import golden
from ocr_search_spark.operators import extract, search, tokenize


@pytest.fixture(scope="module")
def postings_df(corpus_df, spark):
    ext = extract.extract_spans(
        corpus_df.select("doc_id", "spans"), impl="pandas", skew_threshold=64
    ).drop("error")
    return tokenize.term_postings(ext).cache()


def test_postings_match_golden(postings_df, golden_postings):
    got = {(r["term"], r["doc_id"]): r["tf"] for r in postings_df.collect()}
    assert got == golden_postings


def test_posting_tf_sums_equal_token_counts(postings_df, golden_extracted):
    """sum(tf) per doc == token count of the doc's extracted text."""
    got = {
        r["doc_id"]: r["total"]
        for r in postings_df.groupBy("doc_id").agg(F.sum("tf").alias("total")).collect()
    }
    for d, spans in golden_extracted.items():
        n_tokens = len(golden.tokenize(golden.doc_text(spans)))
        assert got.get(d, 0) == n_tokens, d


QUERIES = [
    "merged tables query",
    "running children feet",
    "機器學習 搜尋",
    "the of and",  # stopwords only → empty result
    "zzz-not-a-term",
    "Data, SCAN. kernels!",
    "資料處理 engine",
]


@pytest.mark.parametrize("q", QUERIES)
def test_search_matches_golden(q, postings_df, golden_postings, spark):
    exp = golden.search(golden_postings, q, 20)
    got = [
        (r["doc_id"], r["score"])
        for r in search.search(spark, postings_df, q).collect()
    ]
    assert got == exp, q


def test_search_respects_max_return(postings_df, golden_postings, spark):
    exp = golden.search(golden_postings, "table", 5)
    got = [
        (r["doc_id"], r["score"])
        for r in search.search(spark, postings_df, "table", max_return=5).collect()
    ]
    assert got == exp
    assert len(got) <= 5


def test_search_attaches_doc_metadata(postings_df, corpus_df, spark):
    from ocr_search_spark.operators.maintenance import doc_catalog

    docs = doc_catalog(corpus_df)
    out = search.search(spark, postings_df, "table", docs=docs).collect()
    assert out, "expected hits"
    for r in out:
        assert r["img_path"] == r["doc_id"] + ".png"
        assert r["ori_file_path"].startswith("folder")


def test_search_validation(postings_df, spark):
    with pytest.raises(TypeError):
        search.search(spark, postings_df, 123)  # type: ignore[arg-type]
    with pytest.raises(ValueError):
        search.search(spark, postings_df, "x", max_return=0)


def test_upsert_idempotence(postings_df):
    """X4: MERGE-emulation upsert is idempotent — applying the same
    updates twice equals applying them once, and upserting a table into
    itself is a no-op."""
    from ocr_search_spark.operators.maintenance import upsert_by_key

    keys = ["term", "doc_id"]
    once = upsert_by_key(postings_df, postings_df, keys)
    twice = upsert_by_key(once, postings_df, keys)
    assert once.count() == postings_df.count()
    assert twice.exceptAll(postings_df).count() == 0
    assert postings_df.exceptAll(twice).count() == 0

    updates = postings_df.limit(25).withColumn("tf", F.col("tf") + 7)
    u1 = upsert_by_key(postings_df, updates, keys)
    u2 = upsert_by_key(u1, updates, keys)
    assert u1.exceptAll(u2).count() == 0 and u2.exceptAll(u1).count() == 0
    assert u1.count() == postings_df.count()


def test_correlations_df_guard(spark):
    """Skewed-df fixture: a term present in 100% of docs (the quadratic
    self-join killer) must be dropped by max_df_ratio while normal terms
    keep their exact correlations."""
    from ocr_search_spark.operators import correlate

    rows = [("hot", f"d{d}", 1) for d in range(20)]
    rows += [(t, f"d{d}", 2) for d in range(4) for t in ("aa", "bb")]
    p = spark.createDataFrame(rows, "term string, doc_id string, tf int")

    unguarded = correlate.term_correlations(p)
    assert unguarded.where("term1 = 'hot' OR term2 = 'hot'").count() > 0

    guarded = correlate.term_correlations(p, max_df_ratio=0.5).collect()
    terms = {r["term1"] for r in guarded} | {r["term2"] for r in guarded}
    assert "hot" not in terms
    tcr = {(r["term1"], r["term2"]): r["tcr"] for r in guarded}
    assert abs(tcr[("aa", "bb")] - 1.0) < 1e-9  # identical posting vectors


def test_upsert_duplicate_keys_deterministic(spark):
    """Duplicate keys inside the updates batch resolve to the SAME
    survivor regardless of partitioning/order: max (version, payload)."""
    from ocr_search_spark.operators.maintenance import upsert_by_key

    existing = spark.createDataFrame(
        [("k1", 0, "old")], "k string, ver int, val string"
    )
    dup_rows = [("k1", 2, "newest"), ("k1", 1, "mid"), ("k2", 5, "b"), ("k2", 5, "a")]
    for nparts in (1, 4):
        updates = spark.createDataFrame(
            dup_rows, "k string, ver int, val string"
        ).repartition(nparts)
        got = {
            r["k"]: (r["ver"], r["val"])
            for r in upsert_by_key(existing, updates, ["k"], version_col="ver").collect()
        }
        assert got == {"k1": (2, "newest"), "k2": (5, "b")}


def test_incremental_correlations_equals_full(spark, corpus_df):
    """IVM for the correlation table: after a doc diff (modify + delete +
    add), carrying unaffected pairs and recomputing only affected-term
    pairs equals a full recompute — with and without the df-guard."""
    from ocr_search_spark.operators import correlate
    from ocr_search_spark.operators.extract import extract_spans_columnar
    from ocr_search_spark.operators.tokenize import term_postings

    all_docs = corpus_df.select("doc_id", "spans").limit(140).cache()
    ids = sorted(r["doc_id"] for r in all_docs.select("doc_id").collect())
    v1_ids, extra_ids = set(ids[:120]), set(ids[120:])
    modified, deleted = set(ids[:10]), set(ids[10:15])

    docs_v1 = all_docs.where(F.col("doc_id").isin(*v1_ids)).cache()
    new_span = F.struct(
        F.lit("text").alias("kind"),
        F.lit("freshly injected correlation content").alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    docs_v2 = (
        all_docs.where(~F.col("doc_id").isin(*deleted))
        .withColumn(
            "spans",
            F.when(
                F.col("doc_id").isin(*modified), F.concat(F.array(new_span), F.col("spans"))
            ).otherwise(F.col("spans")),
        )
        .cache()
    )
    changed = spark.createDataFrame(
        [(d,) for d in sorted(modified | deleted | extra_ids)], "doc_id string"
    )

    p1 = term_postings(extract_spans_columnar(docs_v1).select("doc_id", "spans")).cache()
    p2 = term_postings(extract_spans_columnar(docs_v2).select("doc_id", "spans")).cache()

    for ratio in (None, 0.3):
        stored = correlate.term_correlations(p1, max_df_ratio=ratio)
        inc = correlate.incremental_correlations(
            p1, p2, changed, stored, max_df_ratio=ratio
        )
        full = correlate.term_correlations(p2, max_df_ratio=ratio)
        r = lambda df: df.select(  # noqa: E731
            "term1", "term2", F.round("tcr", 9).alias("tcr")
        )
        assert r(inc).exceptAll(r(full)).count() == 0, f"extra pairs (ratio={ratio})"
        assert r(full).exceptAll(r(inc)).count() == 0, f"missing pairs (ratio={ratio})"


def test_positional_phrase_search(spark):
    """Positional index + k-term phrase adjacency: positions are over
    the FILTERED English sequence (stopwords dropped before positions,
    so 'scan the table' matches phrase ['scan', 'table']), counts are
    per-occurrence, empty phrase is empty."""
    from ocr_search_spark.operators.search import phrase_search
    from ocr_search_spark.operators.tokenize import positional_postings

    rows = [
        ("d1", "fast table value part slow fast table value part"),
        ("d2", "table value the part"),   # 'the' dropped -> value,part adjacent
        ("d3", "value table part fast"),  # wrong order
        ("d4", "scan the table value part scan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, doc_text string")
    pos = positional_postings(docs).cache()
    # 3-term phrase
    got = {r["doc_id"]: r["n_matches"] for r in
           phrase_search(pos, ["table", "value", "part"]).collect()}
    assert got == {"d1": 2, "d2": 1, "d4": 1}
    # stopword removal shifts positions: 'scan table' matches d4
    got2 = {r["doc_id"]: r["n_matches"] for r in
            phrase_search(pos, ["scan", "table"]).collect()}
    assert got2 == {"d4": 1}
    assert phrase_search(pos, []).count() == 0
    # single-term phrase degenerates to tf
    got1 = {r["doc_id"]: r["n_matches"] for r in
            phrase_search(pos, ["value"]).collect()}
    assert got1 == {"d1": 2, "d2": 1, "d3": 1, "d4": 1}


def test_postings_varint_stats_vs_python(spark):
    """Delta+varint byte counts replay exactly in plain Python."""
    from ocr_search_spark.operators.maintenance import postings_varint_stats

    rows = [("alpha", f"d{i:03d}", 1) for i in range(40)] + [
        ("beta", "d001", 2), ("beta", "d999", 1), ("gamma", "d500", 1)
    ]
    df = spark.createDataFrame(rows, "term string, doc_id string, tf long")
    got = {r["term"]: (r["n_postings"], r["bytes_varint"], r["bytes_fixed"])
           for r in postings_varint_stats(df).collect()}

    def vbytes(x):
        n = 1
        while x >= (1 << (7 * n)) and n < 9:
            n += 1
        return n

    ordinal = {d: i + 1 for i, d in enumerate(sorted({d for _, d, _ in rows}))}
    expect = {}
    for term in {t for t, _, _ in rows}:
        dns = sorted(ordinal[d] for t, d, _ in rows if t == term)
        deltas = [dns[0]] + [b - a for a, b in zip(dns, dns[1:])]
        expect[term] = (len(dns), sum(vbytes(x) for x in deltas), 8 * len(dns))
    assert got == expect
    # sorted deltas compress: varint bytes strictly below fixed for runs
    assert got["alpha"][1] < got["alpha"][2]


def test_maxscore_equals_bm25_and_prunes(spark):
    import pyspark.sql.functions as F
    from ocr_search_spark.operators.search import (
        match_terms_bm25,
        match_terms_maxscore,
        _bm25_rows,
    )

    # skewed postings: 'rare' carries huge tf in few docs, 'common' tiny
    # tf everywhere -> 'common' should fall below the champion floor
    rows = (
        [(f"d{i}", "common", 1) for i in range(200)]
        + [(f"d{i}", "rare", 9) for i in range(8)]
        + [(f"d{i}", "mid", 3) for i in range(0, 60, 2)]
    )
    posts = spark.createDataFrame(rows, "doc_id string, term string, tf int")
    terms = ["common", "rare", "mid"]
    for k in (5, 8, 300):
        got = [tuple(r) for r in match_terms_maxscore(posts, terms, max_return=k).collect()]
        want = [tuple(r) for r in match_terms_bm25(posts, terms, max_return=k).collect()]
        assert got == want, k
    # the pruning is real for small k: 'common' is non-essential
    w = _bm25_rows(posts, terms, 1.2, 0.75)
    ubs = {r["term"]: r["ub"] for r in w.groupBy("term").agg(F.max("w").alias("ub")).collect()}
    champ = sorted(
        (r["mw"] for r in w.groupBy("doc_id").agg(F.max("w").alias("mw")).collect()),
        reverse=True,
    )
    assert ubs["common"] < champ[4]  # below the k=5 floor -> prunable


def test_proximity_search_scoring_and_edges(spark):
    import pytest
    from ocr_search_spark.operators.search import proximity_search

    pos = spark.createDataFrame(
        [
            ("a", "d1", 0), ("b", "d1", 1), ("c", "d1", 2),     # tight
            ("a", "d2", 0), ("b", "d2", 10), ("c", "d2", 11),   # loose first pair
            ("a", "d3", 0), ("b", "d3", 1),                      # missing c
        ],
        "term string, doc_id string, pos int",
    )
    out = {r["doc_id"]: r["score"] for r in proximity_search(pos, ["a", "b", "c"]).collect()}
    assert "d3" not in out                       # must contain ALL terms
    assert out["d1"] == 500_000 + 500_000        # both pairs adjacent
    assert out["d2"] == 1_000_000 // 11 + 500_000
    # single-term degrades to match count
    one = {r["doc_id"]: r["score"] for r in proximity_search(pos, ["a"]).collect()}
    assert one == {"d1": 1_000_000, "d2": 1_000_000, "d3": 1_000_000}
    with pytest.raises(ValueError):
        proximity_search(pos, ["a", "a"])
    assert proximity_search(pos, []).count() == 0


# ------------------------------------------------------------ substring


def test_trigram_substring_search(spark):
    from ocr_search_spark.operators.search import substring_search, trigram_index

    docs = spark.createDataFrame(
        [
            ("d1", "the Nebula spins; nebular clouds"),
            ("d2", "nothing relevant here"),
            ("d3", "NEBULA"),
            ("d4", "neb ula split across tokens"),
        ],
        "doc_id string, doc_text string",
    )
    idx = trigram_index(docs).cache()
    got = [
        (r["doc_id"], r["n_matches"])
        for r in substring_search(idx, docs, "ebul").collect()
    ]
    # d1 matches twice (nebula + nebular), d3 once (case-folded);
    # d4's trigrams are broken by the space -> no candidate, no match
    assert got == [("d1", 2), ("d3", 1)]
    # result-transparency: identical to the brute contains scan
    brute = sorted(
        (r["doc_id"],)
        for r in docs.where(
            F.instr(F.lower("doc_text"), "ebul") > 0
        ).collect()
    )
    assert sorted((g[0],) for g in got) == brute


def test_substring_short_needle_falls_back_to_scan(spark):
    from ocr_search_spark.operators.search import substring_search, trigram_index

    docs = spark.createDataFrame(
        [("d1", "xy appears: xy xy"), ("d2", "zz only")],
        "doc_id string, doc_text string",
    )
    idx = trigram_index(docs)
    got = [
        (r["doc_id"], r["n_matches"])
        for r in substring_search(idx, docs, "xy").collect()
    ]
    assert got == [("d1", 3)]


def test_substring_needle_guards(spark):
    import pytest as _pytest

    from ocr_search_spark.operators.search import substring_search, trigram_index

    docs = spark.createDataFrame(
        [("d1", "abc")], "doc_id string, doc_text string"
    )
    idx = trigram_index(docs)
    with _pytest.raises(ValueError):
        substring_search(idx, docs, "")
    with _pytest.raises(ValueError):
        substring_search(idx, docs, "o'neil")


def test_prefix_search_expansion_and_guard(spark):
    from ocr_search_spark.operators.search import prefix_search

    postings = spark.createDataFrame(
        [("value", "d1", 3), ("valuable", "d2", 5), ("vat", "d3", 9),
         ("value", "d2", 1)],
        "term string, doc_id string, tf long",
    )
    got = [(r["doc_id"], r["score"]) for r in prefix_search(postings, "val*").collect()]
    # d2: max(valuable 5, value 1) = 5; d1: 3; d3 (vat) not val-prefixed
    assert got == [("d2", 5), ("d1", 3)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_terms"):
        prefix_search(postings, "v", max_terms=2)
    with _pytest.raises(ValueError):
        prefix_search(postings, "*")


def test_anchor_boosted_postings(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from ocr_search_spark.operators.search import (
        anchor_boosted_postings,
        match_terms,
    )

    postings = spark.createDataFrame(
        pd.DataFrame(
            {
                "term": ["table", "table", "fast"],
                "doc_id": ["d1", "d2", "d1"],
                "tf": [5, 1, 2],
            }
        )
    )
    # two anchors point at d2; their text tokenizes through the SAME
    # chain as document text (lowercase + lemma + stopword filter)
    anchors = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": ["d2", "d2"], "anchor": ["Fast Tables", "fast tables"]}
        )
    )
    boosted = anchor_boosted_postings(postings, anchors, weight=3)
    got = {(r.term, r.doc_id): r.tf for r in boosted.collect()}
    # "tables" lemmatizes to the content key "table": d2 gains 2*3 on
    # top of its content tf=1; "fast" gains 6 as a new posting for d2
    assert got[("table", "d2")] == 7
    assert got[("fast", "d2")] == 6
    assert got[("table", "d1")] == 5 and got[("fast", "d1")] == 2
    # the boost flips the ranking for a "table"-term query
    top = match_terms(boosted, ["table"], max_return=2).collect()
    assert [(r.doc_id, r.score) for r in top] == [("d2", 7), ("d1", 5)]


def test_incremental_correlations_guard_flip_fuzz(spark):
    """Seeded randomized IVM equivalence sweep aimed at the df-guard
    FLIP boundary: corpora where the doc count moves under an untouched
    term's df (deletes shrink n, adds grow it), ratios chosen to land
    exactly ON df/n thresholds, plus degenerate shapes (touch-nothing,
    touch-everything, vocabulary wipe). incremental == full recompute
    for every case, both guard arms."""
    import random

    from ocr_search_spark.operators import correlate

    def build(rng, n_docs, n_terms):
        rows = []
        for d in range(n_docs):
            for t in rng.sample(range(n_terms), rng.randint(1, n_terms)):
                rows.append((f"t{t:02d}", f"d{d:03d}", rng.randint(1, 4)))
        return rows

    cases = [
        # (seed, n_docs, n_terms, n_delete, n_add, n_modify, ratios)
        (1, 12, 8, 3, 0, 2, (0.25, 3 / 12, 3 / 9)),   # shrink: n 12→9
        (2, 10, 6, 0, 5, 1, (0.3, 3 / 10, 3 / 15)),   # grow: n 10→15
        (3, 8, 5, 2, 2, 8, (None, 0.5)),              # touch everything
        (4, 9, 7, 0, 0, 0, (None, 0.4)),              # empty change set
        (5, 6, 4, 6, 3, 0, (None, 0.5)),              # full wipe + re-add
    ]
    r9 = lambda df: df.select(  # noqa: E731
        "term1", "term2", F.round("tcr", 9).alias("tcr")
    )
    for seed, n_docs, n_terms, n_del, n_add, n_mod, ratios in cases:
        rng = random.Random(seed)
        old_rows = build(rng, n_docs, n_terms)
        doomed = {f"d{d:03d}" for d in rng.sample(range(n_docs), n_del)}
        modded = {
            f"d{d:03d}"
            for d in rng.sample(range(n_docs), n_mod)
        } - doomed
        new_rows = []
        for term, doc, tf in old_rows:
            if doc in doomed:
                continue
            if doc in modded and rng.random() < 0.5:
                if rng.random() < 0.5:
                    continue  # drop this (term, doc) posting
                tf = tf + rng.randint(1, 3)  # retune tf
            new_rows.append((term, doc, tf))
        added = set()
        for a in range(n_add):
            doc = f"a{a:03d}"
            added.add(doc)
            for t in rng.sample(range(n_terms), rng.randint(1, n_terms)):
                new_rows.append((f"t{t:02d}", doc, rng.randint(1, 4)))
        changed = sorted(doomed | modded | added)
        schema = "term string, doc_id string, tf long"
        p_old = spark.createDataFrame(old_rows, schema).cache()
        p_new = spark.createDataFrame(new_rows, schema).cache()
        ch = spark.createDataFrame([(d,) for d in changed] or [("",)],
                                   "doc_id string")
        for ratio in ratios:
            stored = correlate.term_correlations(p_old, max_df_ratio=ratio)
            inc = correlate.incremental_correlations(
                p_old, p_new, ch, stored, max_df_ratio=ratio
            )
            full = correlate.term_correlations(p_new, max_df_ratio=ratio)
            assert r9(inc).exceptAll(r9(full)).count() == 0, (seed, ratio)
            assert r9(full).exceptAll(r9(inc)).count() == 0, (seed, ratio)
