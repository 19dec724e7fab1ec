"""RFC 9309 robots.txt policy tests (operators/robots.py)."""

import pandas as pd

from ocr_search_spark.operators.robots import (
    parse_robots,
    parse_robots_text,
    robots_filter,
)

ROBOTS = """# site policy
User-agent: alpha
User-agent: beta
Disallow: /private
Allow: /private/ok/
Crawl-delay: 10

User-agent: *
Disallow: /tmp/
Disallow:
"""


def test_parse_groups_and_directives():
    rules = parse_robots_text(ROBOTS)
    assert ("alpha", False, "/private") in rules
    assert ("beta", False, "/private") in rules
    assert ("alpha", True, "/private/ok/") in rules
    assert ("*", False, "/tmp/") in rules
    # empty Disallow records nothing; crawl-delay ignored
    assert all(p for (_, _, p) in rules)
    assert len(rules) == 5


def test_ua_after_rules_starts_new_group():
    rules = parse_robots_text(
        "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    )
    assert rules == [("a", False, "/x"), ("b", False, "/y")]


def _filter(spark, urls, agent):
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "domain": ["s.com", "open.com"],
                "robots_txt": [ROBOTS, ""],
            }
        )
    )
    rules = parse_robots(robots)
    df = spark.createDataFrame(
        pd.DataFrame({"domain": [d for d, _ in urls], "path": [p for _, p in urls]})
    )
    out = robots_filter(df, rules, agent)
    return {
        (r.domain, r.path): (r.allowed, r.matched_prefix) for r in out.collect()
    }


def test_longest_match_and_group_selection(spark):
    urls = [
        ("s.com", "/private/doc"),
        ("s.com", "/private/ok/doc"),
        ("s.com", "/tmp/doc"),
        ("s.com", "/public/doc"),
        ("open.com", "/anything"),
        ("nobots.net", "/x"),
    ]
    # agent alpha → specific group: /private disallowed, /private/ok/
    # allowed (longest match), /tmp/ NOT in its group → allowed
    got = _filter(spark, urls, "Alpha")
    assert got[("s.com", "/private/doc")] == (False, "/private")
    assert got[("s.com", "/private/ok/doc")] == (True, "/private/ok/")
    assert got[("s.com", "/tmp/doc")] == (True, "")
    assert got[("s.com", "/public/doc")] == (True, "")
    assert got[("open.com", "/anything")] == (True, "")
    assert got[("nobots.net", "/x")] == (True, "")
    # unknown agent → * group: /tmp/ disallowed, /private allowed
    got = _filter(spark, urls, "zeta")
    assert got[("s.com", "/tmp/doc")] == (False, "/tmp/")
    assert got[("s.com", "/private/doc")] == (True, "")


def test_equal_length_tie_allow_wins(spark):
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "domain": ["t.com"],
                "robots_txt": ["User-agent: *\nDisallow: /a/\nAllow: /a/\n"],
            }
        )
    )
    df = spark.createDataFrame(pd.DataFrame({"domain": ["t.com"], "path": ["/a/x"]}))
    out = robots_filter(df, parse_robots(robots), "any").collect()[0]
    assert out.allowed is True and out.matched_allow is True


def test_url_side_plan_has_no_shuffle(spark):
    robots = spark.createDataFrame(
        pd.DataFrame({"domain": ["t.com"], "robots_txt": ["User-agent: *\nDisallow: /a\n"]})
    )
    df = spark.createDataFrame(pd.DataFrame({"domain": ["t.com"], "path": ["/a"]}))
    plan = (
        robots_filter(df, parse_robots(robots), "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only exchanges allowed are on the (tiny) rules side feeding
    # the broadcast; the URL side must join via BroadcastHashJoin
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------ RFC 9309 wildcards


def _wild_rules(spark):
    rows = [
        ("d.com", "*", False, "/private/*/x"),   # * in the middle
        ("d.com", "*", False, "/*.pdf$"),        # classic extension block
        ("d.com", "*", True, "/private/open/x"), # longer literal beats *
        ("d.com", "*", False, "/cash$"),         # anchored exact path
        ("d.com", "*", False, "/lit.$ral"),      # '.', inner '$' literal
    ]
    return spark.createDataFrame(
        rows, "domain string, agent string, allow boolean, prefix string"
    )


def test_robots_wildcard_star_and_anchor(spark):
    from ocr_search_spark.operators.robots import robots_filter

    urls = spark.createDataFrame(
        [
            ("d.com", "/private/a/x"),     # matched by /private/*/x -> deny
            ("d.com", "/private/open/x"),  # longer allow wins the tie race
            ("d.com", "/doc.pdf"),         # *.pdf$ -> deny
            ("d.com", "/doc.pdfx"),        # $ anchor: NOT denied
            ("d.com", "/cash"),            # anchored deny
            ("d.com", "/cashier"),         # anchor: allowed
            ("d.com", "/lit.$ral"),        # literal . and inner $ match
            ("d.com", "/litX$ral"),        # '.' must NOT match as regex any
        ],
        "domain string, path string",
    )
    out = {
        r["path"]: r["allowed"]
        for r in robots_filter(urls, _wild_rules(spark), "bot").collect()
    }
    assert out["/private/a/x"] is False
    assert out["/private/open/x"] is True
    assert out["/doc.pdf"] is False
    assert out["/doc.pdfx"] is True
    assert out["/cash"] is False
    assert out["/cashier"] is True
    assert out["/lit.$ral"] is False
    assert out["/litX$ral"] is True


def test_robots_wildcard_precedence_by_pattern_octets(spark):
    """RFC 9309: most specific = longest PATTERN (as written). The
    9-octet '/p/*/z.js' beats the 5-octet allow '/p/q/'... wait, it
    doesn't: 9 > 5 so the deny wins; flipping to a longer allow flips
    the verdict."""
    from ocr_search_spark.operators.robots import robots_filter

    rules = spark.createDataFrame(
        [
            ("e.com", "*", False, "/p/*/z.js"),
            ("e.com", "*", True, "/p/q/"),
        ],
        "domain string, agent string, allow boolean, prefix string",
    )
    urls = spark.createDataFrame([("e.com", "/p/q/z.js")], "domain string, path string")
    out = robots_filter(urls, rules, "bot").collect()[0]
    assert out["allowed"] is False  # 9-octet deny > 5-octet allow

    rules2 = spark.createDataFrame(
        [
            ("e.com", "*", False, "/p/*/z.js"),
            ("e.com", "*", True, "/p/q/z.js__"),
        ],
        "domain string, agent string, allow boolean, prefix string",
    )
    urls2 = spark.createDataFrame([("e.com", "/p/q/z.js__")], "domain string, path string")
    out2 = robots_filter(urls2, rules2, "bot").collect()[0]
    assert out2["allowed"] is True  # 11-octet allow > 9-octet deny


# ------------------------------------------------- crawl-delay records


def test_crawl_delay_parse_and_selection(spark):
    from ocr_search_spark.operators.robots import (
        crawl_delay_for,
        parse_robots_delays,
    )

    txt_specific = (
        "User-agent: bot\nCrawl-delay: 1.5\nDisallow: /x\n"
        "User-agent: *\nCrawl-delay: 9\n"
    )
    txt_star = "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 3\n"
    txt_none = "User-agent: *\nDisallow: /private\n"
    txt_bad = "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -4\n"
    df = spark.createDataFrame(
        [("a.com", txt_specific), ("b.com", txt_star),
         ("c.com", txt_none), ("d.com", txt_bad)],
        "domain string, robots_txt string",
    )
    delays = parse_robots_delays(df)
    got = {r["domain"]: r["delay_us"] for r in crawl_delay_for(delays, "Bot").collect()}
    assert got == {"a.com": 1_500_000, "b.com": 3_000_000}  # last-wins on b


def test_crawl_delay_group_reset(spark):
    """A delay after rules belongs to ITS group, not a stale agent list."""
    from ocr_search_spark.operators.robots import (
        crawl_delay_for,
        parse_robots_delays,
    )

    txt = (
        "User-agent: other\nDisallow: /z\n"
        "User-agent: bot\nCrawl-delay: 4\n"
    )
    df = spark.createDataFrame([("e.com", txt)], "domain string, robots_txt string")
    got = {r["domain"]: r["delay_us"] for r in crawl_delay_for(parse_robots_delays(df), "bot").collect()}
    assert got == {"e.com": 4_000_000}
    assert crawl_delay_for(parse_robots_delays(df), "other").count() == 0
