"""HTML table extraction, page metadata, publish-date priority, and
RSS/Atom feed parsing — the session-19 crawl-discovery/metadata family.

Every operator is a pure columnar plan; the plan-shape tests assert no
shuffle appears in the single-table projections."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_search_spark.operators.urlnorm import parse_feed
from ocr_search_spark.operators.webtext import (
    html_metadata,
    html_tables,
    publish_date,
)


def _tables(spark, html):
    df = spark.createDataFrame([("d", html)], "id string, html string")
    rows = html_tables(df).collect()
    return [
        (r["table_idx"], r["row_idx"], r["col_idx"], r["tag"], r["cell"])
        for r in rows
    ]


# --------------------------------------------------------- html_tables


def test_table_grid_with_header(spark):
    html = (
        "<html><body><p>prose</p>"
        "<table class='z'><tr><th>K</th><th nowrap>V</th></tr>"
        "<tr><td> a </td><td><b>b</b> c</td></tr></table>"
        "</body></html>"
    )
    assert _tables(spark, html) == [
        (0, 0, 0, "th", "K"),
        (0, 0, 1, "th", "V"),
        (0, 1, 0, "td", "a"),
        (0, 1, 1, "td", "b c"),
    ]


def test_multiple_tables_and_no_table_docs(spark):
    html = (
        "<table><tr><td>x</td></tr></table> mid "
        "<TABLE><TR><TD>y1</TD><TD>y2</TD></TR></TABLE>"
    )
    assert _tables(spark, html) == [
        (0, 0, 0, "td", "x"),
        (1, 0, 0, "td", "y1"),
        (1, 0, 1, "td", "y2"),
    ]
    assert _tables(spark, "<p>no tables here</p>") == []


def test_unclosed_rows_and_cells_drop(spark):
    # pinned rule: only explicitly closed <tr>/<td|th> count
    html = (
        "<table><tr><td>kept</td></tr>"
        "<tr><td>no row closer"  # row never closes -> dropped
        "</table>"
    )
    assert _tables(spark, html) == [(0, 0, 0, "td", "kept")]


def test_nested_table_truncates_outer(spark):
    # pinned rule: the outer match ends at the FIRST </table> (the
    # inner one), so the fragment is "<tr><td>outer<table><tr><td>inner
    # </td></tr>". The first <tr>..</tr> pair spans to the inner row's
    # closer; its first cell body runs to the inner cell's closer and
    # strips to "outer inner". The trailing "tail" row lies OUTSIDE the
    # truncated fragment -- deterministic, documented loss.
    html = (
        "<table><tr><td>outer"
        "<table><tr><td>inner</td></tr></table>"
        "</td></tr><tr><td>tail</td></tr></table>"
    )
    assert _tables(spark, html) == [(0, 0, 0, "td", "outer inner")]


def test_html_tables_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([("d", "<p>x</p>")], "id string, html string")
    plan = html_tables(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------- html_metadata


def _meta(spark, html):
    df = spark.createDataFrame([("d", html)], "id string, html string")
    return html_metadata(df).collect()[0]


def test_metadata_full_page_forward_order(spark):
    r = _meta(
        spark,
        '<html lang="EN-us"><head><title> A   Title </title>'
        '<meta property="og:title" content="OG Title">'
        '<meta property="og:type" content="article">'
        '<meta property="og:image" content="http://x/i.png">'
        '<meta name="description" content="a summary">'
        "</head><body></body></html>",
    )
    assert r["title"] == "A Title"
    assert r["og_title"] == "OG Title"
    assert r["og_type"] == "article"
    assert r["og_image"] == "http://x/i.png"
    assert r["meta_description"] == "a summary"
    assert r["lang_attr"] == "en-us"


def test_metadata_reversed_attribute_order_and_decoys(spark):
    r = _meta(
        spark,
        "<html><head>"
        "<meta content='Rev Title' property='og:title'>"
        "<meta property='og:titlex' content='DECOY'>"
        "<meta content='desc rev' name='description'>"
        "</head></html>",
    )
    assert r["og_title"] == "Rev Title"
    assert r["meta_description"] == "desc rev"
    assert r["og_type"] == "" and r["lang_attr"] == "" and r["title"] == ""


def test_metadata_plan_has_no_shuffle(spark):
    df = spark.createDataFrame([("d", "<p>x</p>")], "id string, html string")
    plan = html_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -------------------------------------------------------- publish_date


def _pub(spark, html, url="http://s.com/a"):
    df = spark.createDataFrame(
        [("d", html, url)], "id string, html string, url string"
    )
    r = publish_date(df).collect()[0]
    return r["publish_date"], r["date_source"]


def test_publish_date_priority_meta_wins(spark):
    html = (
        "<meta property='article:published_time' "
        "content='2024-03-05T08:00:00Z'>"
        "<time datetime='2023-01-01'>old</time>"
    )
    assert _pub(spark, html, "http://s.com/2020/07/x") == ("2024-03-05", "meta")


def test_publish_date_time_then_url_fallback(spark):
    assert _pub(spark, "<time datetime='2023-11-30T10:00'>d</time>") == (
        "2023-11-30",
        "time",
    )
    assert _pub(spark, "<p>no dates</p>", "http://s.com/blog/2021/09/post") == (
        "2021-09-01",
        "url",
    )


def test_publish_date_plausibility_window(spark):
    # implausible meta year falls through to the valid time element
    html = (
        "<meta property='article:published_time' content='1971-01-01'>"
        "<time datetime='2022-05-10'>x</time>"
    )
    assert _pub(spark, html) == ("2022-05-10", "time")
    # month 13 / day 32 are not dates; nothing valid -> ('', '')
    assert _pub(spark, "<time datetime='2022-13-01'>x</time>") == ("", "")
    assert _pub(spark, "<time datetime='2022-01-32'>x</time>") == ("", "")
    assert _pub(spark, "<p>nothing</p>", "http://s.com/a/b") == ("", "")


# ---------------------------------------------------------- parse_feed


def _feed(spark, xml):
    df = spark.createDataFrame([("f", xml)], "feed_id string, feed_xml string")
    rows = parse_feed(df).collect()
    return [(r["feed_kind"], r["url"], r["published"]) for r in rows]


def test_rss_items_ignore_channel_link(spark):
    xml = (
        "<rss><channel><title>c</title><link>http://site.com/</link>"
        "<item><link>http://site.com/p1</link>"
        "<pubDate>Mon, 01 Jan 2024</pubDate></item>"
        "<item><link>http://site.com/p2</link></item>"
        "</channel></rss>"
    )
    assert _feed(spark, xml) == [
        ("rss", "http://site.com/p1", "Mon, 01 Jan 2024"),
        ("rss", "http://site.com/p2", ""),
    ]


def test_atom_entries_ignore_feed_level_link(spark):
    xml = (
        '<feed xmlns="http://www.w3.org/2005/Atom"><title>f</title>'
        '<link href="http://site.com/feed.xml" rel="self"/>'
        '<entry><link href="http://site.com/e1"/>'
        "<updated>2024-01-01T00:00:00Z</updated></entry>"
        "<entry><link href='http://site.com/e2'/></entry>"
        "</feed>"
    )
    assert _feed(spark, xml) == [
        ("atom", "http://site.com/e1", "2024-01-01T00:00:00Z"),
        ("atom", "http://site.com/e2", ""),
    ]


def test_feed_entries_without_url_drop(spark):
    xml = "<rss><channel><item><pubDate>d</pubDate></item></channel></rss>"
    assert _feed(spark, xml) == []


def test_feed_frontier_diff_composes(spark):
    xml = (
        "<rss><channel>"
        "<item><link>http://s.com/a</link></item>"
        "<item><link>http://s.com/b</link></item>"
        "</channel></rss>"
    )
    feeds = spark.createDataFrame([("f", xml)], "feed_id string, feed_xml string")
    crawled = spark.createDataFrame([("http://s.com/a",)], "url string")
    frontier = parse_feed(feeds).join(crawled, "url", "left_anti")
    assert [r["url"] for r in frontier.collect()] == ["http://s.com/b"]


# ------------------------------------------------- html_table_markdown


def test_html_table_markdown_ragged_and_escape(spark):
    from ocr_search_spark.operators.webtext import html_table_markdown

    html = (
        "<table><tr><th>a</th><th>b|c</th></tr>"
        "<tr><td>only</td></tr></table>"  # ragged second row pads
        "<table><tr><td>x</td></tr></table>"
    )
    df = spark.createDataFrame([("d", html)], "id string, html string")
    out = {r["table_idx"]: r for r in html_table_markdown(df).collect()}
    assert out[0]["markdown"] == "| a | b\\|c |\n| only |  |"
    assert (out[0]["n_rows"], out[0]["n_cols"]) == (2, 2)
    assert out[1]["markdown"] == "| x |"
    assert (out[1]["n_rows"], out[1]["n_cols"]) == (1, 1)
