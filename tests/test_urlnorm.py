"""URL canonicalization operator tests (operators/urlnorm.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_search_spark.operators.urlnorm import (
    canonicalize_urls,
    domain_stats,
)


def _canon(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    out = canonicalize_urls(df).orderBy("url")
    return {r.url: (r.canon_url, r.host, r.registered_domain) for r in out.collect()}


CASES = [
    # scheme+host lowercase, default port strip, fragment drop
    ("HTTP://WWW.Example.COM:80/a/page#frag", "http://www.example.com/a/page"),
    ("https://Example.COM:443/x", "https://example.com/x"),
    # non-default port kept
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    # https keeps :80 (not its default)
    ("https://example.com:80/x", "https://example.com:80/x"),
    # dot-segment and duplicate-slash resolution
    ("http://example.com/a/./b/page", "http://example.com/a/b/page"),
    ("http://example.com/a/x/../b/page", "http://example.com/a/b/page"),
    ("http://example.com//a///b/page", "http://example.com/a/b/page"),
    ("http://example.com/a/b/c/../../d/page", "http://example.com/a/d/page"),
    # a '..' segment cannot consume another '..'
    ("http://example.com/a/b/../../../c", "http://example.com/../c"),
    # query sort, empty-path root slash
    ("http://example.com?b=2&a=1", "http://example.com/?a=1&b=2"),
    ("http://example.com/p?z=9&a=1&m=5#f", "http://example.com/p?a=1&m=5&z=9"),
]


def test_canonical_forms(spark):
    got = _canon(spark, [u for u, _ in CASES])
    for url, want in CASES:
        assert got[url][0] == want, (url, got[url][0], want)


def test_host_and_registered_domain(spark):
    got = _canon(
        spark,
        [
            "http://www.example.com/a",
            "http://sub.deep.example.co.uk:8080/b",
            "http://example.co.jp/c",
            "http://localhost/d",
        ],
    )
    assert got["http://www.example.com/a"][1:] == ("www.example.com", "example.com")
    assert got["http://sub.deep.example.co.uk:8080/b"][1:] == (
        "sub.deep.example.co.uk",
        "example.co.uk",
    )
    assert got["http://example.co.jp/c"][1:] == ("example.co.jp", "example.co.jp")
    assert got["http://localhost/d"][1:] == ("localhost", "localhost")


def test_domain_stats_counts_canonical_dupes_once(spark):
    urls = [
        "http://Example.com:80/a",     # same canonical …
        "http://example.com/a",        # … as this
        "http://example.com/b",
        "http://other.co.uk/x",
        "http://www.other.co.uk/x",    # different host ⇒ different canon
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    rows = {r.registered_domain: r for r in domain_stats(df).collect()}
    assert rows["example.com"].n_captures == 3
    assert rows["example.com"].n_unique_urls == 2
    assert rows["other.co.uk"].n_captures == 2
    assert rows["other.co.uk"].n_unique_urls == 2


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame(pd.DataFrame({"url": ["http://a.com/x"]}))
    plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_extract_links_resolution(spark):
    from ocr_search_spark.operators.urlnorm import extract_links

    html = (
        "<html><body>"
        "<a href='http://Ext.COM:80/p'>abs</a>"
        "<a href=\"/root/x\">rootrel</a>"
        "<a href='../up/y'>rel</a>"
        "<a href='//cdn.example.net/c'>proto</a>"
        "<a href='#top'>frag-only</a>"
        "<a href='mailto:a@b.c'>mail</a>"
        "<a href='javascript:void(0)'>js</a>"
        "</body></html>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"base_url": ["http://www.example.com/a/b/page1"], "html": [html]})
    )
    rows = extract_links(df).orderBy("href").collect()
    got = {r.href: r.url for r in rows}
    assert got == {
        "http://Ext.COM:80/p": "http://ext.com/p",
        "/root/x": "http://www.example.com/root/x",
        "../up/y": "http://www.example.com/a/up/y",
        "//cdn.example.net/c": "http://cdn.example.net/c",
    }


def test_host_link_graph(spark):
    from ocr_search_spark.operators.urlnorm import extract_links, host_link_graph

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "base_url": [
                    "http://a.example.co.uk/p/1",
                    "http://a.example.co.uk/p/2",
                    "http://b.com/x",
                ],
                "html": [
                    "<a href='http://t1.com/'>x</a><a href='/local'>y</a>",
                    "<a href='http://t1.com/z'>x</a>",
                    "<a href='http://sub.t2.co.jp/q'>x</a>",
                ],
            }
        )
    )
    edges = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in host_link_graph(extract_links(df)).collect()
    }
    assert edges == {
        ("example.co.uk", "t1.com"): 2,
        ("example.co.uk", "example.co.uk"): 1,
        ("b.com", "t2.co.jp"): 1,
    }


def test_parse_sitemap_pairs_loc_lastmod(spark):
    from ocr_search_spark.operators.urlnorm import parse_sitemap

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://a.com/1</loc><lastmod>2026-01-02</lastmod></url>"
        "<url><loc>http://a.com/2</loc></url>"
        "<url><lastmod>2026-03-04</lastmod><loc>http://a.com/3</loc></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(pd.DataFrame({"site": ["a"], "sitemap_xml": [xml]}))
    rows = {r.loc: r.lastmod for r in parse_sitemap(df).collect()}
    assert rows == {
        "http://a.com/1": "2026-01-02",
        "http://a.com/2": "",
        "http://a.com/3": "2026-03-04",
    }


def test_extract_anchors_text_and_alignment(spark):
    from ocr_search_spark.operators.urlnorm import extract_anchors

    html = (
        "<html><body>"
        "<a href='http://Ext.COM:80/p'><b>Read</b>  more\n now</a>"
        "<a href=\"/root/x#sec\">Page  One</a>"
        "<a href='#top'>frag-only</a>"
        "<a href='mailto:a@b.c'>mail</a>"
        "<a href='../up/y'><img src='i.png'/></a>"
        "</body></html>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"base_url": ["http://www.example.com/a/b/page1"], "html": [html]})
    )
    rows = extract_anchors(df).orderBy("href").collect()
    got = {r.href: (r.anchor, r.url) for r in rows}
    # fragment stripped from the href (matching extract_links), nested
    # tags stripped from the body, whitespace collapsed; fragment-only
    # and mailto links never produce rows; icon-only anchor is "".
    assert got == {
        "http://Ext.COM:80/p": ("Read more now", "http://ext.com/p"),
        "/root/x": ("Page One", "http://www.example.com/root/x"),
        "../up/y": ("", "http://www.example.com/a/up/y"),
    }


def test_anchor_text_index_counts(spark):
    from ocr_search_spark.operators.urlnorm import anchor_text_index, extract_anchors

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 2],
                "base_url": ["http://a.com/p"] * 3,
                "html": [
                    "<a href='http://t.com/x'>Click  Here</a>",
                    "<a href='http://t.com/x'>click here</a>"
                    "<a href='http://t.com/x'>click here</a>",
                    "<a href='http://t.com/y'><img src='i'/></a>",
                ],
            }
        )
    )
    idx = {
        (r.url, r.anchor): (r.n_links, r.n_docs)
        for r in anchor_text_index(extract_anchors(df)).collect()
    }
    # case-folded grouping; 3 links from 2 docs; empty anchor dropped
    assert idx == {("http://t.com/x", "click here"): (3, 2)}


def test_extract_anchors_plan_no_udf_no_shuffle(spark):
    from ocr_search_spark.operators.urlnorm import extract_anchors

    df = spark.createDataFrame(
        pd.DataFrame({"base_url": ["http://a.com/p"], "html": ["<a href='/x'>t</a>"]})
    )
    plan = extract_anchors(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_anchor_index_incremental_equals_full_recompute(spark):
    from ocr_search_spark.operators.urlnorm import (
        anchor_index_from_postings,
        anchor_index_incremental,
        anchor_postings,
        anchor_text_index,
        extract_anchors,
    )

    def pages(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "base_url", "html"])
        )

    v1 = pages(
        [
            (1, "http://s.com/a", "<a href='http://t.com/x'>alpha</a>"
             "<a href='http://t.com/y'>beta</a>"),
            (2, "http://s.com/b", "<a href='http://t.com/x'>alpha</a>"),
            (3, "http://s.com/c", "<a href='http://t.com/z'>gamma</a>"),
        ]
    )
    # doc 2 changes: drops its alpha link, adds a delta link
    changed_v2 = pages(
        [(2, "http://s.com/b", "<a href='http://t.com/w'>delta</a>")]
    )

    a1 = extract_anchors(v1)
    base1 = anchor_postings(a1)
    idx1 = anchor_text_index(a1)
    old_changed = base1.where(F.col("src_doc") == 2)
    new_changed = anchor_postings(extract_anchors(changed_v2))
    base2 = base1.where(F.col("src_doc") != 2).unionByName(new_changed)

    got = anchor_index_incremental(idx1, base2, old_changed, new_changed)
    rows = {(r.url, r.anchor): (r.n_links, r.n_docs) for r in got.collect()}
    # full recompute over the post-change corpus
    v2_full = pages(
        [
            (1, "http://s.com/a", "<a href='http://t.com/x'>alpha</a>"
             "<a href='http://t.com/y'>beta</a>"),
            (2, "http://s.com/b", "<a href='http://t.com/w'>delta</a>"),
            (3, "http://s.com/c", "<a href='http://t.com/z'>gamma</a>"),
        ]
    )
    expect = {
        (r.url, r.anchor): (r.n_links, r.n_docs)
        for r in anchor_text_index(extract_anchors(v2_full)).collect()
    }
    assert rows == expect
    # the distinct-source count actually shrank for the touched group
    assert rows[("http://t.com/x", "alpha")] == (1, 1)
    # aggregate view of the maintained base agrees too
    view = {
        (r.url, r.anchor): (r.n_links, r.n_docs)
        for r in anchor_index_from_postings(base2).collect()
    }
    assert view == expect


def test_frontier_schedule_politeness_rule(spark):
    from ocr_search_spark.operators.urlnorm import frontier_schedule

    # one fast host (delay 1 -> cap 4) and one slow host (delay 3 -> cap 1)
    rows = []
    for i in range(6):
        rows.append((f"http://fast.com/p{i}", 1, i % 2))
        rows.append((f"http://slow.com/p{i}", 3, 0))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "crawl_delay", "priority"])
    )
    out = frontier_schedule(df, wave_seconds=4).collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)

    fast = sorted(by_host["fast.com"], key=lambda r: (r.wave, r.slot))
    slow = sorted(by_host["slow.com"], key=lambda r: (r.wave, r.slot))
    # slow host: cap 1 -> six waves, slot always 0, offset 0
    assert [r.wave for r in slow] == list(range(6))
    assert all(r.slot == 0 and r.fetch_offset_s == 0 for r in slow)
    # fast host: cap 4 -> waves 0,0,0,0,1,1; offsets = slot * delay
    assert [r.wave for r in fast] == [0, 0, 0, 0, 1, 1]
    assert all(r.fetch_offset_s == r.slot * 1 for r in fast)
    # priority DESC first: the four wave-0 fast urls are the odd-priority ones
    w0 = {r.url for r in fast if r.wave == 0}
    assert {u for u in w0 if u in (f"http://fast.com/p{i}" for i in (1, 3, 5))} == {
        "http://fast.com/p1", "http://fast.com/p3", "http://fast.com/p5"
    }
    # no host ever exceeds its cap within a wave
    for host, rs in by_host.items():
        waves = {}
        for r in rs:
            waves[r.wave] = waves.get(r.wave, 0) + 1
        cap = max(r.slot for r in rs) + 1
        assert all(n <= cap for n in waves.values())
    # within a wave, slot offsets never collide on a host
    for host, rs in by_host.items():
        seen = {(r.wave, r.slot) for r in rs}
        assert len(seen) == len(rs)


def test_frontier_schedule_mixed_delay_host(spark):
    """Divergent per-URL delay values for ONE host (two robots.txt
    snapshots in the same frontier) must still yield a well-defined
    schedule: the host's MAX delay governs every row, so (wave, slot)
    never collide and offsets use the effective delay."""
    from ocr_search_spark.operators.urlnorm import frontier_schedule

    rows = [(f"http://m.com/p{i}", (i % 2) + 1, 0) for i in range(6)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "crawl_delay", "priority"])
    )
    out = frontier_schedule(df, wave_seconds=4).collect()
    # effective delay = max(1, 2) = 2 -> cap = 2 for EVERY row
    assert [r.wave for r in sorted(out, key=lambda r: r.url)] == [
        0, 0, 1, 1, 2, 2
    ]
    assert {(r.wave, r.slot) for r in out} == {
        (0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1)
    }
    assert all(r.fetch_offset_s == r.slot * 2 for r in out)


def test_frontier_schedule_single_shuffle(spark):
    from ocr_search_spark.operators.urlnorm import frontier_schedule

    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["http://a.com/x"], "crawl_delay": [2], "priority": [1]}
        )
    )
    plan = (
        frontier_schedule(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1  # the host hash partitioning only
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


# ------------------------------------------------------ crawl-trap flags


def test_detect_url_traps_each_class(spark):
    from ocr_search_spark.operators.urlnorm import detect_url_traps

    rows = [
        ("http://a.com/articles/page1", False, False, False, False),
        ("http://a.com/a/b/a/b/a", True, False, False, False),
        ("http://a.com/" + "/".join(f"s{i}" for i in range(13)), False, True, False, False),
        ("http://a.com/p?x=1&PHPSESSID=ab12cd34", False, False, True, False),
        ("http://a.com/p?tok=" + "0f" * 16, False, False, True, False),
        ("http://a.com/2021/01/2021/02/x", False, False, False, True),
        # two same segments stay BELOW the >=3 repetition threshold
        ("http://a.com/a/b/a/c", False, False, False, False),
        # one date group is a normal blog permalink, not a trap
        ("http://a.com/2021/01/post", False, False, False, False),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in rows], "url string")
    got = {r.url: r for r in detect_url_traps(df).collect()}
    for url, rep, deep, sess, cal in rows:
        r = got[url]
        assert (r.repeated_segment, r.deep_path, r.session_param,
                r.calendar_loop) == (rep, deep, sess, cal), url
        assert r.is_trap == (rep or deep or sess or cal), url


def test_detect_url_traps_zero_shuffle_plan(spark):
    from ocr_search_spark.operators.urlnorm import detect_url_traps

    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    plan = detect_url_traps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan


def test_detect_url_traps_rejects_bad_threshold(spark):
    from ocr_search_spark.operators.urlnorm import detect_url_traps

    df = spark.createDataFrame([("http://a.com/x",)], "url string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        detect_url_traps(df, repeat_threshold=1)


def test_recrawl_priority_estimator(spark):
    """Hand-computed Cho & Garcia-Molina micro-nat estimates: a url
    with 4 fetches / 2 changes, an always-changing url, a cold url,
    and a degenerate duplicate-timestamp history."""
    import math

    from ocr_search_spark.operators.urlnorm import recrawl_priority

    rows = [
        # u1: 4 fetches hourly, digest changes at fetch 2 and 4 (X=2,n=3)
        ("http://a.com/u1", 1000, "v0"),
        ("http://a.com/u1", 4600, "v1"),
        ("http://a.com/u1", 8200, "v1"),
        ("http://a.com/u1", 11800, "v2"),
        # u2: every interval changes (X=n=2) — ln denominator hits 1
        ("http://a.com/u2", 1000, "a"),
        ("http://a.com/u2", 2000, "b"),
        ("http://a.com/u2", 3000, "c"),
        # u3: single fetch -> cold prior
        ("http://a.com/u3", 5000, "z"),
        # u4: two fetches with the SAME timestamp -> span 0 -> cold
        ("http://b.com/u4", 7000, "p"),
        ("http://b.com/u4", 7000, "q"),
    ]
    hist = spark.createDataFrame(rows, "url string, fetch_ts long, digest string")
    now = 100_000
    out = {r["url"]: r for r in recrawl_priority(hist, now_ts=now).collect()}

    def l6(x):
        return math.floor(1_000_000.0 * math.log(x))

    u1 = out["http://a.com/u1"]
    lam1 = l6(2 * 3 + 1) - l6(2 * (3 - 2) + 1)  # ln(7) - ln(3), micro
    assert (u1["n_fetches"], u1["n_changes"], u1["lambda_e6"]) == (4, 2, lam1)
    rate1 = (lam1 * 3 * 86400) // (11800 - 1000)
    assert u1["rate_e6_per_day"] == rate1
    assert u1["age_s"] == now - 11800
    assert u1["priority"] == rate1 * (now - 11800) // 86400
    assert u1["cold"] is False and u1["host"] == "a.com"

    u2 = out["http://a.com/u2"]
    assert u2["lambda_e6"] == l6(5) - l6(1)  # denominator ln(1) = 0
    assert u2["n_changes"] == 2 and not u2["cold"]

    u3 = out["http://a.com/u3"]
    assert u3["lambda_e6"] is None and u3["cold"] is True
    assert u3["rate_e6_per_day"] == 500_000
    assert u3["priority"] == 500_000 * (now - 5000) // 86400

    # duplicate timestamps: lambda defined (digest-ASC order pins the
    # lag) but span 0 -> rate falls back to the cold prior
    u4 = out["http://b.com/u4"]
    assert u4["cold"] is True and u4["rate_e6_per_day"] == 500_000

    with pytest.raises(ValueError):
        recrawl_priority(hist, now_ts=now, default_rate_e6=-1)


def test_recrawl_priority_single_shuffle(spark):
    """The lag window and the per-url aggregate share one url-keyed
    exchange; everything else is projection."""
    from ocr_search_spark.operators.urlnorm import recrawl_priority

    rows = [(f"http://h{i%3}.com/p{i}", 100 + j * 60, f"v{(i + j) % 2}")
            for i in range(30) for j in range(3)]
    hist = spark.createDataFrame(rows, "url string, fetch_ts long, digest string")
    plan = (
        recrawl_priority(hist, now_ts=10_000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


# ------------------------------------------------------------ DUST


def test_dust_params_verdicts(spark):
    """s varies with content fixed -> insignificant; id determines
    content -> significant with share 0; t has one observed value ->
    untested (NULL share, False); v appears once per base -> untested."""
    from ocr_search_spark.operators.urlnorm import dust_params

    rows = []
    for i in (1, 2):
        for s in (1, 2, 3):
            rows.append(
                (f"http://a.com/x?id={i}&s={s}&t=9", f"fp{i}")
            )
    pages = spark.createDataFrame(rows, "url string, content_fp string")
    out = {
        (r["host"], r["param"]): r
        for r in dust_params(pages).collect()
    }
    s = out[("a.com", "s")]
    assert (s["bases_tested"], s["bases_uniform"], s["share_e6"], s["insignificant"]) == (2, 2, 1_000_000, True)
    i = out[("a.com", "id")]
    assert i["bases_tested"] == 3 and i["bases_uniform"] == 0
    assert i["share_e6"] == 0 and not i["insignificant"]
    t = out[("a.com", "t")]
    assert t["bases_tested"] == 0 and t["share_e6"] is None and not t["insignificant"]


def test_dust_params_counterexample_kills_rule(spark):
    """One tested base where varying the param changed content makes
    the param significant even if other bases were uniform."""
    from ocr_search_spark.operators.urlnorm import dust_params

    rows = [
        ("http://b.com/p?q=1&u=1", "A"),
        ("http://b.com/p?q=1&u=2", "A"),   # base q=1: uniform
        ("http://b.com/p?q=2&u=1", "B"),
        ("http://b.com/p?q=2&u=2", "C"),   # base q=2: u CHANGED content
    ]
    pages = spark.createDataFrame(rows, "url string, content_fp string")
    u = {r["param"]: r for r in dust_params(pages).collect()}["u"]
    assert u["bases_tested"] == 2 and u["bases_uniform"] == 1
    assert u["share_e6"] == 500_000 and not u["insignificant"]


def test_dust_params_last_param_and_prefix_keys(spark):
    """Removing the only param leaves a ?-less base; 'id' and 'i' are
    distinct keys (prefix match is on the full 'k=' token)."""
    from ocr_search_spark.operators.urlnorm import dust_params

    rows = [
        ("http://c.com/y?s=1", "Z"),
        ("http://c.com/y?s=2", "Z"),
        ("http://c.com/y?i=1&id=7", "W"),
        ("http://c.com/y?i=2&id=7", "W"),
    ]
    pages = spark.createDataFrame(rows, "url string, content_fp string")
    out = {r["param"]: r for r in dust_params(pages, min_bases=1).collect()}
    assert out["s"]["insignificant"]          # base is c.com/y (no '?')
    assert out["i"]["bases_tested"] == 1 and out["i"]["insignificant"]
    assert out["id"]["bases_tested"] == 0     # only one id value seen


def test_dust_params_validation(spark):
    import pytest as _pytest

    from ocr_search_spark.operators.urlnorm import dust_params

    pages = spark.createDataFrame([("http://a.com/?x=1", "f")], "url string, content_fp string")
    with _pytest.raises(ValueError):
        dust_params(pages, min_values=1)
    with _pytest.raises(ValueError):
        dust_params(pages, min_bases=0)


# --------------------------------------------- sitemap index dispatch


def test_parse_sitemap_any_dispatch(spark):
    from ocr_search_spark.operators.urlnorm import parse_sitemap_any

    idx = (
        "<sitemapindex><sitemap><loc>https://s.com/a.xml</loc>"
        "<lastmod>2024-01-01</lastmod></sitemap>"
        "<sitemap><loc>https://s.com/b.xml</loc></sitemap></sitemapindex>"
    )
    us = (
        "<urlset><url><loc>https://s.com/p1</loc>"
        "<lastmod>2024-02-02</lastmod></url>"
        "<url><loc>https://s.com/p2</loc></url></urlset>"
    )
    df = spark.createDataFrame(
        [("i", idx), ("u", us)], "src string, sitemap_xml string"
    )
    got = sorted(
        (r["src"], r["kind"], r["loc"], r["lastmod"])
        for r in parse_sitemap_any(df).collect()
    )
    assert got == [
        ("i", "sitemap", "https://s.com/a.xml", "2024-01-01"),
        ("i", "sitemap", "https://s.com/b.xml", ""),
        ("u", "url", "https://s.com/p1", "2024-02-02"),
        ("u", "url", "https://s.com/p2", ""),
    ]


def test_parse_sitemap_any_empty_and_malformed(spark):
    from ocr_search_spark.operators.urlnorm import parse_sitemap_any

    df = spark.createDataFrame(
        [("e", "<urlset></urlset>"), ("m", "not xml at all")],
        "src string, sitemap_xml string",
    )
    assert parse_sitemap_any(df).count() == 0


# ------------------------------------------- rendezvous fetcher shards


def _hrw_py(host, n, salt="hrw"):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return max(range(n), key=lambda s: (h60(f"{host}:{s}:{salt}"), -s))


def test_fetcher_shards_matches_python_argmax(spark):
    from ocr_search_spark.operators.urlnorm import fetcher_shards

    hosts = [f"h{i}.example.com" for i in range(60)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["shard"] for r in fetcher_shards(df, 8).collect()}
    assert got == {h: _hrw_py(h, 8) for h in hosts}
    # rough balance: every shard gets something at 60 hosts / 8 shards
    from collections import Counter

    c = Counter(got.values())
    assert len(c) >= 6


def test_fetcher_shards_resize_stability(spark):
    """THE rendezvous property: growing K -> K+1 moves only the hosts
    the NEW shard wins; nobody else changes fetcher."""
    from ocr_search_spark.operators.urlnorm import fetcher_shards

    hosts = [f"h{i}.example.com" for i in range(120)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    k8 = {r["host"]: r["shard"] for r in fetcher_shards(df, 8).collect()}
    k9 = {r["host"]: r["shard"] for r in fetcher_shards(df, 9).collect()}
    moved = [h for h in hosts if k8[h] != k9[h]]
    assert all(k9[h] == 8 for h in moved)      # movers go ONLY to the new shard
    assert len(moved) < len(hosts) * 0.25      # ~1/9 expected; generous bound


def test_fetcher_shards_validation(spark):
    import pytest as _pytest

    from ocr_search_spark.operators.urlnorm import fetcher_shards

    df = spark.createDataFrame([("a",)], "host string")
    with _pytest.raises(ValueError):
        fetcher_shards(df, 0)


# ------------------------------------------- revalidation planning


def test_revalidation_plan_verdicts(spark):
    from ocr_search_spark.operators.urlnorm import revalidation_plan

    rows = [
        # stable page with etag: 3 fetches, no change -> cheap 304
        ("u1", 0, "a", 'W/"1"', "", 5000),
        ("u1", 100, "a", 'W/"1"', "", 5000),
        ("u1", 200, "a", 'W/"1"', "", 5000),
        # churny page with etag: changes every fetch -> revalidatable but
        # predicted changed -> no savings
        ("u2", 0, "x", "W/a", "", 7000),
        ("u2", 100, "y", "W/b", "", 7000),
        ("u2", 200, "z", "W/c", "", 7000),
        # stable page WITHOUT validators -> no conditional GET possible
        ("u3", 0, "s", "", "", 9000),
        ("u3", 200, "s", "", "", 9000),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, fetch_ts long, digest string, etag string, "
        "last_modified string, content_length long",
    )
    out = {r["url"]: r for r in revalidation_plan(df, now_ts=400).collect()}
    assert out["u1"]["revalidatable"] and out["u1"]["predicted_unchanged"]
    assert out["u1"]["saved_bytes"] == 5000
    assert out["u2"]["revalidatable"] and not out["u2"]["predicted_unchanged"]
    assert out["u2"]["saved_bytes"] == 0
    assert not out["u3"]["revalidatable"] and out["u3"]["saved_bytes"] == 0


def test_revalidation_latest_row_wins(spark):
    from ocr_search_spark.operators.urlnorm import revalidation_plan

    rows = [
        ("u", 0, "a", "", "", 100),
        ("u", 50, "a", 'W/"new"', "", 250),   # validator appears later
    ]
    df = spark.createDataFrame(
        rows,
        "url string, fetch_ts long, digest string, etag string, "
        "last_modified string, content_length long",
    )
    r = revalidation_plan(df, now_ts=60).collect()[0]
    assert r["revalidatable"] and r["saved_bytes"] == 250


# ------------------------------------- crawl-budget apportionment


def test_apportion_budget_exact_sum_and_quota(spark):
    """Sum == budget exactly; |alloc - exact share| < 1; python replay
    parity on random weights; zero-weight host gets 0."""
    import random
    from fractions import Fraction

    from ocr_search_spark.operators.urlnorm import apportion_budget

    rng = random.Random(24)
    ws = [(f"h{i:02d}", rng.randrange(0, 500)) for i in range(40)]
    ws[7] = ("h07", 0)
    budget = 1777
    df = spark.createDataFrame(ws, "host string, w long")
    got = {r["host"]: r["alloc"] for r in apportion_budget(df, budget).collect()}
    W = sum(w for _, w in ws)
    assert sum(got.values()) == budget
    for h, w in ws:
        share = Fraction(budget * w, W)
        assert share - 1 < got[h] < share + 1, (h, got[h], share)
    assert got["h07"] == 0
    # python replay of the exact rule
    base = {h: budget * w // W for h, w in ws}
    rem = {h: (budget * w) % W for h, w in ws}
    extra = budget - sum(base.values())
    order = sorted(ws, key=lambda hw: (-rem[hw[0]], hw[0]))
    want = dict(base)
    for h, _ in order[:extra]:
        want[h] += 1
    assert got == want


def test_apportion_budget_validation(spark):
    import pytest

    from ocr_search_spark.operators.urlnorm import apportion_budget

    df = spark.createDataFrame([("a", 5), ("b", -1)], "host string, w long")
    with pytest.raises(ValueError):
        apportion_budget(df, -3)
    with pytest.raises(Exception) as ei:
        apportion_budget(df, 10).collect()
    assert "non-negative" in str(ei.value)


def test_aimd_rates_fold_vs_python(spark):
    import random

    from ocr_search_spark.operators.urlnorm import aimd_rates

    rng = random.Random(24)
    rows, want = [], {}
    for h in range(8):
        host = f"h{h}"
        rate = 1
        ok_n = fail_n = 0
        for t in range(25):
            ok = rng.random() < 0.7
            rows.append((host, t, 1 if ok else 0))
            if ok:
                rate = min(rate + 1, 16)
                ok_n += 1
            else:
                rate = max(1, rate // 2)
                fail_n += 1
        want[host] = (ok_n, fail_n, rate)
    df = spark.createDataFrame(rows, "host string, t int, ok int")
    got = {r["host"]: (r["n_ok"], r["n_fail"], r["rate"])
           for r in aimd_rates(df.repartition(5)).collect()}
    assert got == want
    import pytest
    with pytest.raises(ValueError):
        aimd_rates(df, max_rate=0)


def test_aimd_rates_init_rate_carries_state(spark):
    """The documented between-wave carry: an init_rate column seeds the
    fold (clamped to [1, max_rate]); null/absent seeds start at 1."""
    from ocr_search_spark.operators.urlnorm import aimd_rates

    rows = [
        ("warm", 0, 0, 12), ("warm", 1, 1, 12),      # 12 -> 6 -> 7
        ("cold", 0, 1, None), ("cold", 1, 1, None),  # 1 -> 2 -> 3
        ("over", 0, 0, 99),                          # clamp 16 -> 8
    ]
    df = spark.createDataFrame(
        rows, "host string, t int, ok int, init_rate int"
    )
    got = {r["host"]: r["rate"] for r in aimd_rates(df).collect()}
    assert got == {"warm": 7, "cold": 3, "over": 8}
    # without the column, identical input starts cold at 1
    got2 = {r["host"]: r["rate"]
            for r in aimd_rates(df.drop("init_rate")).collect()}
    assert got2 == {"warm": 2, "cold": 3, "over": 1}
    # init_rate_col=None opts out of seeding even with the column there
    got3 = {r["host"]: r["rate"]
            for r in aimd_rates(df, init_rate_col=None).collect()}
    assert got3 == got2


def test_aimd_rates_conflicting_seeds_raise(spark):
    """Two rows of one host disagreeing on the non-null seed is a
    corrupted carry — it raises instead of max() silently winning."""
    import pytest
    from pyspark.errors import PySparkException

    from ocr_search_spark.operators.urlnorm import aimd_rates

    df = spark.createDataFrame(
        [("h", 0, 1, 4), ("h", 1, 1, 9)],
        "host string, t int, ok int, init_rate int",
    )
    with pytest.raises(PySparkException, match="conflicting"):
        aimd_rates(df).collect()
    # a null beside a single non-null value is NOT a conflict
    ok = spark.createDataFrame(
        [("h", 0, 1, None), ("h", 1, 1, 4)],
        "host string, t int, ok int, init_rate int",
    )
    assert {r["rate"] for r in aimd_rates(ok).collect()} == {6}
