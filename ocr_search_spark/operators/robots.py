"""robots.txt crawl-policy evaluation (RFC 9309 subset).

A crawl pipeline must be able to answer, for every captured URL,
"was this fetch allowed?" — both to filter training corpora down to
policy-clean pages and to audit an existing archive. The reference has
no analogue (its corpus is a private folder); the semantics here are
RFC 9309, which is public:

* a robots.txt file is line-oriented ``key: value`` records; comments
  (``#`` to end of line) are stripped; keys are case-insensitive;
* consecutive ``User-agent`` lines open ONE group; the group's
  Allow/Disallow rules apply to every named agent; a ``User-agent``
  line after rules starts a new group;
* the group that applies to a crawler is the most specific one: the
  group naming the agent if any group does, else the ``*`` group; a
  domain with neither allows everything;
* rule matching is longest-prefix: among all rules of the applicable
  group whose path-prefix matches the URL path, the LONGEST wins; on
  a length tie, Allow wins; no matching rule means allowed;
* an empty ``Disallow:`` value means "no restriction" and records no
  rule (original-spec behavior RFC 9309 keeps).

Shapes at scale: ``parse_robots`` is an Arrow-batched ``mapInPandas``
over (domain, robots_txt) — one tiny file per domain, embarrassingly
parallel. ``robots_filter`` is two equi-joins on domain (the rules
side is orders of magnitude smaller than the URL side — broadcast it
when |domains| permits) plus one per-URL window argmax; nothing is
collected.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = "domain string, agent string, allow boolean, prefix string"


def parse_robots_text(text: str) -> list[tuple[str, bool, str]]:
    """One robots.txt → [(agent, allow, prefix)] per RFC 9309 grouping.
    Unknown directives (Sitemap, Crawl-delay, …) are ignored."""
    rules: list[tuple[str, bool, str]] = []
    agents: list[str] = []
    in_group_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, value = line.split(":", 1)
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_rules:
                agents = []
                in_group_rules = False
            agents.append(value.lower())
        elif key in ("allow", "disallow"):
            in_group_rules = True
            if not value:  # empty Disallow: = no restriction recorded
                continue
            for a in agents:
                rules.append((a, key == "allow", value))
    return rules


def _robots_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["domain", "agent", "allow", "prefix"]
    for batch in batches:
        rows = []
        for domain, text in zip(batch["domain"], batch["robots_txt"]):
            for agent, allow, prefix in parse_robots_text(text or ""):
                rows.append((domain, agent, allow, prefix))
        yield pd.DataFrame(rows, columns=cols)


def parse_robots(robots: DataFrame) -> DataFrame:
    """(domain, robots_txt) → one rule row per (group agent × rule):
    (domain, agent, allow, prefix)."""
    return robots.select("domain", "robots_txt").mapInPandas(
        _robots_iter, schema=RULES_SCHEMA
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Adds (allowed, matched_prefix, matched_allow) to ``urls`` under
    RFC 9309 group selection + longest-match for ``agent``, INCLUDING
    the spec's two metacharacters: ``*`` matches any character
    sequence and a TRAILING ``$`` anchors the match at path end (a
    ``$`` anywhere else is literal). Precedence stays "most specific =
    longest PATTERN in octets" (RFC 9309 §2.2.2 — measured on the
    pattern as written, wildcards included), Allow winning length
    ties. Wildcard-free rules keep the cheap ``startswith`` path; only
    rules that actually contain ``*``/trailing ``$`` pay the regex,
    and their patterns compile ONCE on the rules side (escape regex
    specials, ``*`` → ``.*``, conditional anchor) — the per-URL work
    is a match against a precompiled column, and the escape uses no
    backreferences or lookarounds (the repo-wide RE2-replayable rule).

    Plan, sized for 10^12 URLs: group selection and rule collection
    happen on the RULES side (per-domain aggregates over a table that
    is orders of magnitude smaller than the URL side), the per-domain
    rule arrays broadcast-join onto the URLs, and longest-prefix
    matching runs as array higher-order functions INSIDE the
    projection — the URL side never shuffles."""
    agent = agent.lower()
    has_specific = rules.groupBy("domain").agg(
        F.max(F.col("agent") == agent).alias("has_specific")
    )
    pat = F.col("prefix")
    ends = pat.endswith("$")
    core = F.when(ends, F.regexp_replace(pat, r"\$$", "")).otherwise(pat)
    esc = F.regexp_replace(
        core, r"([.^$+?(){}\[\]|\\])", r"\\$1"
    )
    rx = F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(ends, F.lit("$")).otherwise(F.lit("")),
    )
    wild = pat.contains("*") | ends
    rules = rules.select(
        "*", wild.alias("_wild"), F.when(wild, rx).otherwise(F.lit("^")).alias("_rx")
    )
    rule_sets = (
        rules.join(has_specific, "domain")
        .where(
            ((F.col("agent") == agent) & F.col("has_specific"))
            | ((F.col("agent") == "*") & ~F.col("has_specific"))
        )
        .groupBy("domain")
        .agg(
            F.collect_list(
                F.struct("allow", "prefix", "_wild", "_rx")
            ).alias("_rules")
        )
    )
    joined = urls.join(F.broadcast(rule_sets), on=domain_col, how="left")
    path = F.col(path_col)
    matches = F.filter(
        F.coalesce(F.col("_rules"), F.array()),
        lambda r: F.when(
            r["_wild"], F.regexp_like(path, r["_rx"])
        ).otherwise(path.startswith(r["prefix"])),
    )
    init = F.struct(
        F.lit(None).cast("boolean").alias("allow"),
        F.lit("").alias("prefix"),
        F.lit(False).alias("_wild"),
        F.lit("^").alias("_rx"),
    )
    best = F.aggregate(
        matches,
        init,
        lambda acc, r: F.when(
            (F.length(r["prefix"]) > F.length(acc["prefix"]))
            | (
                (F.length(r["prefix"]) == F.length(acc["prefix"]))
                & r["allow"]
            ),
            r,
        ).otherwise(acc),
    )
    return (
        joined.withColumn("_best", best)
        .withColumn("allowed", F.coalesce(F.col("_best.allow"), F.lit(True)))
        .withColumn("matched_prefix", F.col("_best.prefix"))
        .withColumn("matched_allow", F.col("_best.allow"))
        .drop("_rules", "_best")
    )


# ------------------------------------------------- crawl-delay records

DELAYS_SCHEMA = "domain string, agent string, delay_us long, ord int"


def parse_robots_delays_text(text: str) -> list[tuple[str, int, int]]:
    """One robots.txt → [(agent, delay_us, ord)] for every
    ``Crawl-delay`` directive, attributed to its User-agent group by
    the SAME grouping rule parse_robots_text applies to Allow/Disallow
    (a delay line, like a rule line, closes the group). Crawl-delay is
    not in RFC 9309 but is honored by most large crawlers; seconds may
    be fractional — values convert to integer MICROSECONDS; invalid or
    negative values are ignored. ``ord`` is the declaration index so a
    later directive can be selected over an earlier one
    deterministically after any shuffle."""
    out: list[tuple[str, int, int]] = []
    agents: list[str] = []
    in_group_rules = False
    ordn = 0
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, value = line.split(":", 1)
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group_rules:
                agents = []
                in_group_rules = False
            agents.append(value.lower())
        elif key in ("allow", "disallow"):
            in_group_rules = True
        elif key == "crawl-delay":
            in_group_rules = True
            try:
                micros = int(float(value) * 1_000_000)
            except ValueError:
                continue
            if micros < 0:
                continue
            for a in agents:
                out.append((a, micros, ordn))
                ordn += 1
    return out


def _delays_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["domain", "agent", "delay_us", "ord"]
    for batch in batches:
        rows = []
        for domain, text in zip(batch["domain"], batch["robots_txt"]):
            for agent, micros, ordn in parse_robots_delays_text(text or ""):
                rows.append((domain, agent, micros, ordn))
        yield pd.DataFrame(rows, columns=cols)


def parse_robots_delays(robots: DataFrame) -> DataFrame:
    """(domain, robots_txt) → (domain, agent, delay_us, ord)."""
    return robots.select("domain", "robots_txt").mapInPandas(
        _delays_iter, schema=DELAYS_SCHEMA
    )


def crawl_delay_for(delays: DataFrame, agent: str) -> DataFrame:
    """(domain, delay_us) — the effective Crawl-delay per domain for
    ``agent`` under RFC 9309 group selection (the agent-specific group
    if one declared a delay, else the ``*`` group; domains with
    neither emit no row — the scheduler's default applies). When a
    group declares several delays the LAST one in file order wins
    (``ord`` DESC — the observed de-facto behavior of major parsers).

    One tiny per-domain aggregate + window over the delays table —
    the output feeds frontier_schedule's per-host delay column."""
    agent = agent.lower()
    from pyspark.sql import Window as W

    has_specific = delays.groupBy("domain").agg(
        F.max(F.col("agent") == agent).alias("_spec")
    )
    sel = (
        delays.join(has_specific, "domain")
        .where(
            ((F.col("agent") == agent) & F.col("_spec"))
            | ((F.col("agent") == "*") & ~F.col("_spec"))
        )
    )
    w = W.partitionBy("domain").orderBy(F.desc("ord"))
    return (
        sel.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("domain", "delay_us")
    )
