"""URL canonicalization for crawl curation — pure columnar plans.

A crawl corpus keys on URLs, and the same page arrives under many
spellings: uppercase scheme/host, explicit default ports, ``.``/``..``
path segments, duplicate slashes, unsorted query parameters, fragments.
The reference never needs this (its corpus is a folder listing), but a
web-scale extraction tier dedups and groups BY canonical URL before any
content work, so the normalization must be cheap enough to run on
10^12 rows: everything here is built-in `pyspark.sql.functions`
expressions — no UDF, no shuffle, whole-stage codegen end to end.

Pinned canonicalization rule (RFC 3986 syntax-based normalization
subset, applied in this order):
  1. scheme and host lowercase;
  2. default port stripped (``:80`` for http, ``:443`` for https);
     any other explicit port is kept;
  3. path: duplicate slashes collapse, ``/./`` segments drop, and
     ``segment/../`` pairs resolve — iterated a fixed 8 rounds, which
     resolves any nesting depth ≤ 8 (deeper paths converge partially
     and deterministically; crawl URLs beyond that depth are vanishingly
     rare and still canonicalize consistently with themselves);
  4. query parameters sort bytewise on the full ``k=v`` token
     (ampersand-split); an empty query drops its ``?``;
  5. the fragment is removed entirely.

Registered-domain extraction uses a pinned public-suffix SUBSET
(documented, not the full Mozilla list — the rule is the operator; the
suffix table is data a deployment would swap in): hosts ending in a
listed two-label suffix keep three labels, everything else keeps two.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# two-label public suffixes honored by registered_domain_col (a pinned
# subset of the public-suffix list; swap in the full table at deploy
# time — the extraction rule does not change)
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.nz", "co.za",
)

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def url_parts(url: Column) -> dict[str, Column]:
    """scheme/authority/path/query columns of an absolute http(s) URL
    (empty string where a part is absent)."""
    return {
        "scheme": F.lower(F.regexp_extract(url, _URL_RE, 1)),
        "authority": F.regexp_extract(url, _URL_RE, 2),
        "path": F.regexp_extract(url, _URL_RE, 3),
        "query": F.regexp_extract(url, _URL_RE, 4),
    }


def _normalize_path(path: Column, rounds: int = 8) -> Column:
    p = F.when(path == "", F.lit("/")).otherwise(path)
    for _ in range(rounds):
        p = F.regexp_replace(p, "//+", "/")
        p = F.regexp_replace(p, "/\\./", "/")
        # a '..' segment may not act as its own parent, hence the
        # lookahead (Java regex; the oracle computes expected values
        # from the fixture rule, so RE2 parity is not needed here)
        p = F.regexp_replace(p, "/(?!\\.\\./)[^/]+/\\.\\./", "/")
    return p


def _normalize_query(query: Column) -> Column:
    sorted_q = F.array_join(F.sort_array(F.split(query, "&")), "&")
    return F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q))


def canonical_url_col(url: Column) -> Column:
    """The pinned canonical form (module docstring) as one columnar
    expression."""
    parts = url_parts(url)
    host_port = F.lower(parts["authority"])
    scheme = parts["scheme"]
    stripped = (
        F.when(scheme == "http", F.regexp_replace(host_port, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host_port, ":443$", ""))
        .otherwise(host_port)
    )
    return F.concat(
        scheme,
        F.lit("://"),
        stripped,
        _normalize_path(parts["path"]),
        _normalize_query(parts["query"]),
    )


def host_col(url: Column) -> Column:
    """Lowercased host without port."""
    auth = F.lower(url_parts(url)["authority"])
    return F.regexp_replace(auth, ":[0-9]+$", "")


def registered_domain_col(host: Column) -> Column:
    """Two labels, or three when the host ends in a pinned two-label
    public suffix (TWO_LABEL_SUFFIXES)."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    two = F.array_join(F.slice(labels, -2, 2), ".")
    three = F.array_join(F.slice(labels, -3, 3), ".")
    is_suffix = two.isin(*TWO_LABEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_suffix & (n >= 3), three)
        .otherwise(two)
    )


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds canon_url / host / registered_domain columns — one
    projection, no shuffle."""
    host = host_col(F.col(url_col))
    return df.withColumns(
        {
            "canon_url": canonical_url_col(F.col(url_col)),
            "host": host,
            "registered_domain": registered_domain_col(host),
        }
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per registered domain: capture count and distinct canonical
    URLs — the crawl-dedup summary (one hash aggregate; distinct rides
    the same shuffle via count_distinct partial aggregation)."""
    c = canonicalize_urls(df, url_col)
    return c.groupBy("registered_domain").agg(
        F.count("*").alias("n_captures"),
        F.countDistinct("canon_url").alias("n_unique_urls"),
    )


_HREF_RE = "(?i)<a\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"'#]+)"
_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.\\-]*:"


def resolve_href_col(base: Column, href: Column) -> Column:
    """RFC 3986 §5 reference resolution (columnar subset) against an
    absolute base URL, then canonicalized: absolute references pass
    through, ``//host/…`` inherits the base scheme, ``/path`` replaces
    the base path, and relative paths merge onto the base directory —
    dot segments introduced by the merge resolve inside
    canonical_url_col's path normalization."""
    parts = url_parts(base)
    scheme = parts["scheme"]
    auth = F.lower(parts["authority"])
    dirpath = F.regexp_replace(parts["path"], "/[^/]*$", "/")
    is_abs = href.rlike("^[A-Za-z][A-Za-z0-9+.\\-]*://")
    proto_rel = href.startswith("//")
    root_rel = href.startswith("/") & ~proto_rel
    joined = (
        F.when(is_abs, href)
        .when(proto_rel, F.concat(scheme, F.lit(":"), href))
        .when(root_rel, F.concat(scheme, F.lit("://"), auth, href))
        .otherwise(F.concat(scheme, F.lit("://"), auth, dirpath, href))
    )
    return canonical_url_col(joined)


def extract_links(
    df: DataFrame, html_col: str = "html", base_col: str = "base_url"
) -> DataFrame:
    """One row per outgoing hyperlink: (…, href, url) where href is the
    raw attribute value and url its resolved canonical form. Pinned
    keep rule: fragment-only anchors never match; a scheme-qualified
    href survives only when the scheme is http(s) (mailto:/javascript:/
    data: drop), scheme-less hrefs are resolved as references. Pure
    explode + projection — the regex scan and resolution stay inside
    whole-stage codegen; no UDF, no shuffle."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), 1)
    out = df.withColumn("href", F.explode(hrefs))
    keep = F.col("href").rlike("^(?i)https?://") | ~F.col("href").rlike(_SCHEME_RE)
    return out.where(keep).withColumn(
        "url", resolve_href_col(F.col(base_col), F.col("href"))
    )


def host_link_graph(
    links: DataFrame, src_url_col: str = "base_url", dst_url_col: str = "url"
) -> DataFrame:
    """Registered-domain edge list with link counts — the input of
    centrality/curation passes (operators/graph.pagerank_integer). One
    hash aggregate over |domain-pairs| groups."""
    src = registered_domain_col(host_col(F.col(src_url_col)))
    dst = registered_domain_col(host_col(F.col(dst_url_col)))
    return (
        links.select(src.alias("src_domain"), dst.alias("dst_domain"))
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").alias("n_links"))
    )


# Well-formed <a href="…">…</a> elements only: the href group stops at
# the first '#' (fragment stripped; fragment-ONLY anchors can never
# match because the group needs ≥1 char), [^"']* eats any fragment
# remainder up to the closing quote, and the anchor body is the
# non-greedy run to the first </a>.
_ANCHOR_RE = (
    "(?is)<a\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"'#]+)[^\"']*[\"'][^>]*>(.*?)</a>"
)


def extract_anchors(
    df: DataFrame, html_col: str = "html", base_col: str = "base_url"
) -> DataFrame:
    """One row per well-formed hyperlink with its anchor text:
    (…, href, anchor, url). The anchor is the element's inner markup
    with nested tags stripped and whitespace collapsed; href keeps the
    extract_links keep-rule (http(s) or scheme-less only). Two
    regexp_extract_all passes over ONE pattern (group 1 = href, group
    2 = body) zip positionally — same pattern, same match sequence, so
    alignment is exact. Pure explode + projection inside whole-stage
    codegen; no UDF, no shuffle.

    The reference surfaces links only as rendered page text
    (TypeConverter output); a web-index needs the anchor signal
    separately — anchor text describes the TARGET page and feeds
    retrieval/curation for pages whose own text is thin."""
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RE), 1)
    bodies = F.regexp_extract_all(F.col(html_col), F.lit(_ANCHOR_RE), 2)
    pair = F.explode(F.arrays_zip(hrefs.alias("href"), bodies.alias("body")))
    out = df.select("*", pair.alias("_a")).select(
        *[c for c in df.columns],
        F.col("_a.href").alias("href"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(F.col("_a.body"), "<[^>]*>", " "), "\\s+", " "
            )
        ).alias("anchor"),
    )
    keep = F.col("href").rlike("^(?i)https?://") | ~F.col("href").rlike(_SCHEME_RE)
    return out.where(keep).withColumn(
        "url", resolve_href_col(F.col(base_col), F.col("href"))
    )


def anchor_text_index(
    anchors: DataFrame,
    url_col: str = "url",
    anchor_col: str = "anchor",
    src_col: str = "doc_id",
) -> DataFrame:
    """Anchor-text index: for every canonical target URL, each distinct
    (lowercased) anchor phrase with its link count and distinct-source
    count. ONE hash aggregate keyed (url, anchor) — map-side partials,
    |url × anchor-phrase| groups; the distinct-source count rides the
    same shuffle. Empty anchors (image links, icon-only elements) are
    dropped — they carry no text signal."""
    a = F.lower(F.col(anchor_col))
    return (
        anchors.where(a != "")
        .groupBy(F.col(url_col).alias("url"), a.alias("anchor"))
        .agg(
            F.count("*").alias("n_links"),
            F.countDistinct(F.col(src_col)).alias("n_docs"),
        )
    )


def anchor_postings(
    anchors: DataFrame,
    url_col: str = "url",
    anchor_col: str = "anchor",
    src_col: str = "doc_id",
) -> DataFrame:
    """The anchor-text index at its MAINTAINABLE grain: one row per
    (target url, lowercased anchor phrase, source doc) with the link
    count. :func:`anchor_text_index` is the aggregate view of this —
    keeping the per-source grain is what makes the index incrementally
    updatable when source pages change (the distinct-source count
    cannot be maintained from the aggregate alone)."""
    a = F.lower(F.col(anchor_col))
    return (
        anchors.where(a != "")
        .groupBy(
            F.col(url_col).alias("url"),
            a.alias("anchor"),
            F.col(src_col).alias("src_doc"),
        )
        .agg(F.count("*").alias("n_links"))
    )


def anchor_index_from_postings(base: DataFrame) -> DataFrame:
    """Aggregate view of :func:`anchor_postings` — identical output to
    :func:`anchor_text_index` over the same links."""
    return base.groupBy("url", "anchor").agg(
        F.sum("n_links").cast("long").alias("n_links"),
        F.countDistinct("src_doc").cast("long").alias("n_docs"),
    )


def anchor_index_incremental(
    index: DataFrame,
    base: DataFrame,
    old_changed: DataFrame,
    new_changed: DataFrame,
) -> DataFrame:
    """IVM for the anchor-text index after a set of SOURCE pages
    changed (recrawl, edit, deletion). ``index`` is the current
    aggregate; ``base`` is the per-source grain AFTER the doc-replace
    (changed docs' old rows removed, new rows inserted — the same
    anti-join + union MERGE the postings maintainer uses);
    ``old_changed``/``new_changed`` are the changed docs' contribution
    rows before/after.

    Only (url, anchor) groups the change touches are recomputed: the
    untouched bulk of the index is carried by ONE left_anti join, and
    the recompute reads base rows for the touched keys only (left_semi)
    — cost ∝ the changed docs' link sets, never the corpus. This is
    the same shape as the correlation IVM (operators/correlate.py):
    deltas drive a bounded re-aggregate, the full recompute is the
    oracle."""
    touched = (
        old_changed.select("url", "anchor")
        .unionByName(new_changed.select("url", "anchor"))
        .distinct()
    )
    carried = index.join(touched, ["url", "anchor"], "left_anti")
    recomputed = anchor_index_from_postings(
        base.join(touched, ["url", "anchor"], "left_semi")
    )
    return carried.unionByName(recomputed)


def parse_sitemap(df: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """Sitemap-protocol ``urlset`` XML → one row per ``<url>`` entry
    with (loc, lastmod; lastmod '' when absent). The block split keeps
    loc/lastmod pairing correct even when entries omit lastmod —
    columnar split + transform + explode, no UDF."""
    blocks = F.split(F.col(xml_col), "</url>")
    entry = F.explode(
        F.filter(
            F.transform(
                blocks,
                lambda b: F.struct(
                    F.regexp_extract(b, "<loc>([^<]*)</loc>", 1).alias("loc"),
                    F.regexp_extract(b, "<lastmod>([^<]*)</lastmod>", 1).alias(
                        "lastmod"
                    ),
                ),
            ),
            lambda s: s["loc"] != "",
        )
    ).alias("_e")
    return df.select("*", entry).select(
        *[c for c in df.columns], F.col("_e.loc").alias("loc"),
        F.col("_e.lastmod").alias("lastmod")
    ).drop(xml_col)


# --------------------------------------------------- feed parsing

def parse_feed(df: DataFrame, xml_col: str = "feed_xml") -> DataFrame:
    """RSS 2.0 / Atom feed XML → one row per entry with
    ``(…, url, published, feed_kind)`` — the syndication sibling of
    :func:`parse_sitemap`, feeding the same crawl-frontier diff (feeds
    surface NEW urls faster than sitemaps; a polling crawler reads
    both).

    Pinned parsing rules:

    * kind detection: a document containing an ``<entry`` opener is
      ``atom``, else ``rss`` (Atom's required element; RSS has no
      ``<entry>``);
    * an entry is the text between an ``<item``/``<entry`` opener and
      its closer: the XML splits on ``</item>`` / ``</entry>`` and each
      block keeps only what FOLLOWS its opener (``substring_index(b,
      opener, -1)``), so channel/feed-level ``<link>`` elements in the
      preamble can never be mistaken for an entry's link — blocks
      without an opener (the tail after the last entry) drop;
    * the entry URL is ``<link>text</link>`` for RSS and the
      ``href`` attribute of ``<link …/>`` for Atom (either quote
      style); entries without a URL drop;
    * ``published`` is the verbatim ``<pubDate>`` (RSS) / ``<updated>``
      (Atom) text, ``''`` when absent — date PARSING is a downstream
      concern (publish_date's plausibility window applies there).

    Columnar split + transform + filter + explode — no UDF; one
    projection per feed row, entry fan-out only at explode."""
    x = F.col(xml_col)
    is_atom = x.contains(F.lit("<entry"))

    def entries(opener: str, closer: str, link_fn, pub_tag: str) -> Column:
        blocks = F.split(x, closer)
        return F.filter(
            F.transform(
                blocks,
                lambda b: F.struct(
                    link_fn(F.substring_index(b, opener, -1)).alias("url"),
                    F.regexp_extract(
                        F.substring_index(b, opener, -1),
                        f"<{pub_tag}>([^<]*)</{pub_tag}>",
                        1,
                    ).alias("published"),
                    (F.instr(b, opener) > 0).alias("ok"),
                ),
            ),
            lambda s: s["ok"] & (s["url"] != ""),
        )

    rss = entries(
        "<item",
        "</item>",
        lambda b: F.regexp_extract(b, "<link>([^<]*)</link>", 1),
        "pubDate",
    )
    atom = entries(
        "<entry",
        "</entry>",
        lambda b: F.regexp_extract(
            b, "(?is)<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']+)[\"']", 1
        ),
        "updated",
    )
    ent = F.explode(F.when(is_atom, atom).otherwise(rss)).alias("_e")
    kind = F.when(is_atom, F.lit("atom")).otherwise(F.lit("rss"))
    return (
        df.select("*", kind.alias("feed_kind"), ent)
        .select(
            *[c for c in df.columns],
            "feed_kind",
            F.col("_e.url").alias("url"),
            F.col("_e.published").alias("published"),
        )
        .drop(xml_col)
    )


# --------------------------------------------- frontier scheduling

def frontier_schedule(
    frontier: DataFrame,
    url_col: str = "url",
    host: Column | None = None,
    delay_col: str = "crawl_delay",
    priority_col: str = "priority",
    wave_seconds: int = 4,
) -> DataFrame:
    """Politeness-aware crawl scheduling: assign every frontier URL a
    fetch ``(wave, slot, fetch_offset_s)`` such that no host receives
    more than one request per its ``crawl_delay`` seconds.

    The reference fetches its corpus from one folder listing with no
    rate limits (`/root/reference/src/DropboxSynchronizer/
    DropboxSynchronizer.class.js:249-273` downloads serially); a web
    crawler's frontier is partitioned by HOST and each host owns an
    independent politeness budget (robots.txt ``Crawl-delay``, RFC 9309
    practice). Pinned scheduling rule:

    * the host's effective delay is ``MAX over its queued rows of
      max(crawl_delay, 1)`` — delay is a host property (robots.txt
      scopes it per host), and a frontier carrying divergent per-URL
      values for one host (two robots snapshots, a default backfill)
      must still yield one well-defined serial timeline, so the
      conservative maximum wins;
    * per-host capacity per wave: ``cap = greatest(1, wave_seconds div
      effective_delay)`` — a wave is one scheduler tick of
      ``wave_seconds`` wall seconds;
    * URLs order per host by ``(priority DESC, url ASC)`` (the ASC url
      tiebreak makes the schedule a pure function of the frontier);
    * the p-th URL of a host (0-based) fetches in ``wave = p div cap``
      at ``slot = p mod cap``, i.e. ``fetch_offset_s = slot * delay``
      seconds into its wave.

    Scale: ONE hash shuffle on host + a per-host sort. The per-host
    window is inherent to the politeness constraint itself — a host's
    schedule is a serial timeline, so no algorithm can spread one
    host's ordering across executors; hosts hash-distribute, and a
    production frontier caps per-host depth (a host with 10^6 queued
    URLs is 10^6 waves of backlog regardless of scheduling), so the
    within-partition sort stays bounded by crawl policy, not corpus
    size. No UDF, no collect; the wave arithmetic is codegen.
    """
    h = host if host is not None else host_col(F.col(url_col))
    from pyspark.sql import Window

    # Crawl-delay is a HOST property (robots.txt scopes it per host).
    # A frontier that carries divergent per-URL delay values for one
    # host (two snapshots of robots.txt, a default backfill, …) must
    # still produce a well-defined serial timeline, so the effective
    # delay is the host's MAX over its queued rows — the conservative
    # reading, computed over the SAME host partition the ranking window
    # already shuffles on (zero extra exchanges).
    d = F.max(F.greatest(F.col(delay_col).cast("int"), F.lit(1))).over(
        Window.partitionBy("host")
    )

    w = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    p = F.row_number().over(w) - F.lit(1)
    return (
        frontier.select(
            F.col(url_col),
            h.alias("host"),
            F.col(priority_col).cast("int").alias(priority_col),
            F.col(delay_col),
        )
        .select(
            url_col,
            "host",
            priority_col,
            d.cast("int").alias("_delay"),
        )
        .withColumn(
            "_cap",
            F.greatest(
                F.lit(1), F.expr(f"int({int(wave_seconds)}) div _delay")
            ).cast("int"),
        )
        .select(
            url_col,
            "host",
            priority_col,
            "_delay",
            "_cap",
            p.alias("_p"),
        )
        .select(
            url_col,
            "host",
            priority_col,
            F.expr("_p div _cap").cast("int").alias("wave"),
            (F.col("_p") % F.col("_cap")).cast("int").alias("slot"),
            ((F.col("_p") % F.col("_cap")) * F.col("_delay"))
            .cast("int")
            .alias("fetch_offset_s"),
        )
    )


# --------------------------------------------------- crawl-trap detection

_SESSION_PARAM_RE = (
    r"(?i)(^|&)(sid|sess|sess_?id|session_?id|phpsessid|jsessionid)="
)
_OPAQUE_TOKEN_RE = r"(^|&)[A-Za-z_]+=[0-9a-fA-F]{32,}"
# trailing boundary as a LOOKAHEAD so back-to-back date groups
# (/2021/01/2021/02) both match — a consumed '/' would hide the second
_CALENDAR_SEG_RE = r"/(19|20)[0-9]{2}/[0-9]{1,2}(?=/|$)"


def detect_url_traps(
    df: DataFrame,
    url_col: str = "url",
    max_path_depth: int = 12,
    repeat_threshold: int = 3,
) -> DataFrame:
    """Crawl-trap heuristics over a URL frontier: flags the URL-shape
    pathologies that make a crawler loop forever or drown in aliases
    (Heydon & Najork's Mercator taxonomy — the production frontier's
    gatekeeper before :func:`frontier_schedule` spends budget on them).

    Adds four boolean columns plus the disjunction ``is_trap``:

    * ``repeated_segment`` — some path segment occurs >=
      ``repeat_threshold`` times (``/a/b/a/b/a`` — symlink loops,
      self-referencing relative links);
    * ``deep_path``        — more than ``max_path_depth`` segments
      (runaway recursion even without repetition);
    * ``session_param``    — a session-id query parameter
      (sid/sessionid/phpsessid/jsessionid/sess…) or any 32+-hex-char
      opaque token value: each fetch mints a fresh alias of the same
      page, an unbounded URL space;
    * ``calendar_loop``    — two or more ``/YYYY/MM`` segments in one
      path: infinite-calendar navigation (every "next month" link
      resolves, forever).

    Pure whole-stage-codegen projection — regexes plus array
    higher-order functions over the split path; no shuffle, no UDF.
    The segment-repetition check is ``exists(distinct segs, s ->
    count(segs == s) >= k)`` — quadratic only in one URL's segment
    count, which ``deep_path`` itself bounds in practice.
    """
    if repeat_threshold < 2:
        raise ValueError(f"repeat_threshold must be >= 2, got {repeat_threshold}")
    u = F.col(url_col)
    parts = url_parts(u)
    segs = F.filter(F.split(parts["path"], "/"), lambda x: x != "")
    repeated = F.exists(
        F.array_distinct(segs),
        lambda s: F.size(F.filter(segs, lambda x: x == s))
        >= F.lit(repeat_threshold),
    )
    deep = F.size(segs) > F.lit(max_path_depth)
    q = parts["query"]
    session = q.rlike(_SESSION_PARAM_RE) | q.rlike(_OPAQUE_TOKEN_RE)
    calendar = (
        F.size(F.regexp_extract_all(parts["path"], F.lit(_CALENDAR_SEG_RE), 0))
        >= 2
    )
    return df.select(
        "*",
        F.coalesce(repeated, F.lit(False)).alias("repeated_segment"),
        F.coalesce(deep, F.lit(False)).alias("deep_path"),
        F.coalesce(session, F.lit(False)).alias("session_param"),
        F.coalesce(calendar, F.lit(False)).alias("calendar_loop"),
        F.coalesce(
            repeated | deep | session | calendar, F.lit(False)
        ).alias("is_trap"),
    )


# --------------------------------------------- recrawl scheduling


def recrawl_priority(
    history: DataFrame,
    now_ts: int,
    default_rate_e6: int = 500_000,
) -> DataFrame:
    """(url, host, n_fetches, n_changes, lambda_e6, rate_e6_per_day,
    age_s, priority, cold) — freshness-driven recrawl prioritization
    from a fetch history: estimate each URL's change rate from observed
    content changes, then rank URLs by expected staleness.

    This is the revisit-policy half of a crawler that
    ``frontier_schedule`` leaves open: WHICH urls most deserve a slot
    in the next wave. The estimator is the published Cho &
    Garcia-Molina one (ToIT 2003, "Estimating Frequency of Change" —
    the bias-corrected MLE for a Poisson change process sampled at n
    intervals with X observed changes):

        lambda_hat * mean_interval = -ln((n - X + 0.5)/(n + 0.5))
                                   = ln((2n + 1)/(2(n - X) + 1))

    Pinned integer contract (the repo-wide engine-boundary rule — same
    L(x) = floor(1e6*ln(x)) the BM25 weights use, so a SQL twin replays
    every row bit-for-bit):

    * fetches of one url order by (ts ASC, digest ASC); a change is
      ``digest != lag(digest)`` (n = n_fetches - 1 intervals,
      X = n_changes);
    * ``lambda_e6 = L(2n + 1) - L(2(n - X) + 1)`` — change probability
      per MEAN INTERVAL in micro-nats; X == n (always changed)
      degrades gracefully (denominator ln 1 = 0, no infinity);
    * ``rate_e6_per_day = (lambda_e6 * n * 86400) div span_s`` where
      ``span_s = last_ts - first_ts`` (mean interval = span/n);
    * ``age_s = greatest(0, now_ts - last_ts)``;
    * ``priority = rate_e6_per_day * age_s div 86400`` — expected
      changes since the last fetch in micro-units; monotone in the
      true staleness probability 1 - exp(-lambda*age), so ordering by
      it IS ordering by staleness, without a transcendental in the
      ranking path;
    * a url fetched once (n = 0) has no estimate: ``lambda_e6`` is
      NULL, ``rate_e6_per_day = default_rate_e6`` (the cold prior —
      0.5 expected changes/day by default) and ``cold = true``.

    Scale shape: ONE hash shuffle on url (the lag window), and the
    per-url aggregate reuses that partitioning (exchange reuse — no
    second shuffle); host extraction and every formula afterwards are
    whole-stage-codegen projections. No corpus-sized broadcast, no
    global sort — ranking/top-k composes downstream per host or via
    TakeOrderedAndProject.

    Reference parity: none — the reference re-syncs its whole folder
    every poll (`/root/reference/src/DropboxSynchronizer/
    DropboxSynchronizer.class.js:125-156`: every file, every pass);
    rate-estimated revisit is what replaces that at web scale.
    """
    if default_rate_e6 < 0:
        raise ValueError(
            f"default_rate_e6 must be >= 0, got {default_rate_e6}"
        )
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy(
        F.col("fetch_ts").asc(), F.col("digest").asc()
    )
    marked = history.select(
        "url",
        F.col("fetch_ts").cast("long").alias("fetch_ts"),
        "digest",
        F.when(
            F.lag("digest").over(w).isNotNull()
            & (F.col("digest") != F.lag("digest").over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_chg"),
    )
    agg = marked.groupBy("url").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum("_chg").cast("long").alias("n_changes"),
        F.min("fetch_ts").alias("_first_ts"),
        F.max("fetch_ts").alias("_last_ts"),
    )
    n = F.col("n_fetches") - F.lit(1)
    x = F.col("n_changes")
    l6 = lambda c: F.floor(  # noqa: E731 — the pinned micro-ln contract
        F.lit(1_000_000.0) * F.log(c.cast("double"))
    ).cast("long")
    lam = F.when(n > 0, l6(2 * n + 1) - l6(2 * (n - x) + 1))
    span = (F.col("_last_ts") - F.col("_first_ts")).cast("long")
    staged = agg.select(
        "url",
        "n_fetches",
        "n_changes",
        lam.alias("lambda_e6"),
        span.alias("_span_s"),
        F.greatest(F.lit(0), F.lit(int(now_ts)) - F.col("_last_ts"))
        .cast("long")
        .alias("age_s"),
    )
    # span_s == 0 with n > 0 means duplicate-timestamp fetches — a
    # degenerate history; the NULL from div-by-zero falls through to
    # the cold prior rather than inventing an infinite rate.
    rate = F.when(
        F.col("lambda_e6").isNotNull() & (F.col("_span_s") > 0),
        F.expr("(lambda_e6 * (n_fetches - 1) * 86400) div _span_s"),
    )
    out = staged.select(
        "url",
        "n_fetches",
        "n_changes",
        "lambda_e6",
        F.coalesce(rate, F.lit(int(default_rate_e6)))
        .cast("long")
        .alias("rate_e6_per_day"),
        "age_s",
        rate.isNull().alias("cold"),
    )
    return out.select(
        "url",
        host_col(F.col("url")).alias("host"),
        "n_fetches",
        "n_changes",
        "lambda_e6",
        "rate_e6_per_day",
        "age_s",
        F.expr("(rate_e6_per_day * age_s) div 86400")
        .cast("long")
        .alias("priority"),
        "cold",
    )


# ------------------------------------- DUST: insignificant URL params


def dust_params(
    pages: DataFrame,
    url_col: str = "url",
    fp_col: str = "content_fp",
    min_values: int = 2,
    min_bases: int = 2,
) -> DataFrame:
    """(host, param, bases_tested, bases_uniform, share_e6,
    insignificant) — mine the query parameters that DON'T change page
    content, per host: the "Do not crawl in the DUST" signal
    (Bar-Yossef, Keidar & Schonfeld, WWW'07 — Different URLs with
    Similar Text), restricted to the query-parameter rule family,
    which covers the overwhelmingly common aliases (session ids,
    tracking tags, affiliate refs).

    Input: one row per FETCHED page — ``url_col`` (feed CANONICAL urls,
    :func:`canonicalize_urls` output: sorted ``k=v`` query tokens) and
    ``fp_col``, a content fingerprint (any deterministic hash of the
    extracted content). Evidence grain:

    * for each URL and each distinct parameter key ``k`` it carries,
      the BASE is the url with every ``k=…`` token removed (other
      params kept in canonical order) and the VALUE is the joined
      ``k=…`` token group;
    * a (host, k, base) group is TESTED when ≥ ``min_values`` distinct
      values were observed against the same base, and UNIFORM when,
      additionally, all its rows carry ONE distinct fingerprint —
      varying ``k`` provably never changed the content;
    * per (host, k): ``insignificant`` iff at least ``min_bases``
      bases were tested and EVERY tested base was uniform (one
      counterexample kills the rule — content-determining params must
      never be stripped). ``share_e6 = bases_uniform * 1e6 div
      bases_tested`` (NULL when nothing was tested) reports the
      evidence strength either way.

    A crawler folds the verdicts back into canonicalization (strip
    insignificant params before frontier dedup), collapsing the
    unbounded alias space that session/tracking params mint —
    detect_url_traps flags the URL SHAPE; this learns host-specific
    rules from observed content.

    Scale shape: one explode bounded by per-URL param count, then two
    hash aggregates keyed (host, param, base) → (host, param) — both
    finer than host grain, so no host-level skew concentrates; no
    self-join, no pair blowup (the classic DUST rule-mining is
    pairwise over urls; the param-grain restriction is what makes it
    one aggregation pass). Keys are matched by ``k=`` PREFIX on the
    canonical token, exact under the canonical-url contract.
    """
    if min_values < 2:
        raise ValueError(f"min_values must be >= 2, got {min_values}")
    if min_bases < 1:
        raise ValueError(f"min_bases must be >= 1, got {min_bases}")
    u = F.col(url_col)
    parts = url_parts(u)
    ps = F.split(parts["query"], "&")
    rows = (
        pages.where(parts["query"] != "")
        .select(
            host_col(u).alias("host"),
            parts["path"].alias("_path"),
            ps.alias("_ps"),
            F.col(fp_col).alias("_fp"),
        )
        .select(
            "*",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.col("_ps"),
                        lambda x: F.element_at(F.split(x, "=", 2), 1),
                    )
                )
            ).alias("param"),
        )
    )
    others = F.filter(
        F.col("_ps"), lambda x: ~x.startswith(F.concat(F.col("param"), F.lit("=")))
    )
    mine = F.filter(
        F.col("_ps"), lambda x: x.startswith(F.concat(F.col("param"), F.lit("=")))
    )
    keyed = rows.select(
        "host",
        "param",
        F.concat(
            F.col("host"),
            F.col("_path"),
            F.when(F.size(others) > 0, F.concat(F.lit("?"), F.array_join(others, "&"))).otherwise(F.lit("")),
        ).alias("base"),
        F.array_join(mine, "&").alias("val"),
        F.col("_fp").alias("fp"),
    )
    g1 = keyed.groupBy("host", "param", "base").agg(
        F.countDistinct("val").alias("n_values"),
        F.countDistinct("fp").alias("n_fps"),
    )
    tested = (F.col("n_values") >= min_values).cast("long")
    uniform = ((F.col("n_values") >= min_values) & (F.col("n_fps") == 1)).cast(
        "long"
    )
    g2 = g1.groupBy("host", "param").agg(
        F.sum(tested).alias("bases_tested"),
        F.sum(uniform).alias("bases_uniform"),
    )
    return g2.select(
        "host",
        "param",
        "bases_tested",
        "bases_uniform",
        F.when(
            F.col("bases_tested") > 0,
            F.expr("bases_uniform * 1000000 div bases_tested"),
        ).alias("share_e6"),
        (
            (F.col("bases_tested") >= min_bases)
            & (F.col("bases_uniform") == F.col("bases_tested"))
        ).alias("insignificant"),
    )


def parse_sitemap_any(df: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """Sitemap-protocol dispatch: classify each fetched XML as a
    ``<sitemapindex>`` (kind ``sitemap``: one row per child sitemap —
    the NEXT fetch wave) or a ``<urlset>`` (kind ``url``: one row per
    page entry), emitting (…, kind, loc, lastmod; lastmod '' when
    absent). Real site maps nest — sitemap.org caps one file at 50k
    URLs, so large sites MUST publish an index of child sitemaps — and
    the crawler iterates fetch→parse generations; this operator
    handles one generation set-orientedly (:func:`parse_sitemap` is
    the urlset-only special case, kept for callers that pre-filter).

    Pinned classification: a document containing ``<sitemapindex`` is
    an index (its entries split on ``</sitemap>``); anything else
    parses as a urlset (split on ``</url>``). Same columnar
    split/transform/explode shape as parse_sitemap — no UDF, no
    shuffle."""
    x = F.col(xml_col)
    is_idx = x.contains("<sitemapindex")

    def entries(closer: str, kind: str):
        return F.filter(
            F.transform(
                F.split(x, closer),
                lambda b: F.struct(
                    F.lit(kind).alias("kind"),
                    F.regexp_extract(b, "<loc>([^<]*)</loc>", 1).alias("loc"),
                    F.regexp_extract(
                        b, "<lastmod>([^<]*)</lastmod>", 1
                    ).alias("lastmod"),
                ),
            ),
            lambda s: s["loc"] != "",
        )

    entry = F.explode(
        F.when(is_idx, entries("</sitemap>", "sitemap")).otherwise(
            entries("</url>", "url")
        )
    ).alias("_e")
    return (
        df.select("*", entry)
        .select(
            *[c for c in df.columns],
            F.col("_e.kind").alias("kind"),
            F.col("_e.loc").alias("loc"),
            F.col("_e.lastmod").alias("lastmod"),
        )
        .drop(xml_col)
    )


# ------------------------------------------- rendezvous fetcher shards


def fetcher_shards(
    hosts: DataFrame,
    n_shards: int,
    host_col: str = "host",
    salt: str = "hrw",
) -> DataFrame:
    """(host, shard, weight) — assign every host to a fetcher shard by
    RENDEZVOUS (highest-random-weight) hashing (Thaler & Ravishankar
    1998): shard = argmax over s of h60(host ':' s ':' salt). The
    property a crawler fleet needs and mod-N lacks: when the fleet
    grows K→K+1, ONLY the hosts whose new shard wins move (≈ 1/(K+1)
    of them) — every other host keeps its fetcher, so per-host
    politeness state (robots cache, connection pools, crawl-delay
    clocks) survives resizes. Deterministic (pure h60), no
    coordination, no ring metadata.

    Argmax ties are impossible in practice (distinct 60-bit draws);
    the pinned order is (weight DESC, shard ASC) so even a collision
    is a total order. One projection over the host table: the shard
    draws explode from a literal sequence (plan-time n_shards), the
    argmax folds in-row — no shuffle, no join.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from ..training.hashing import h60

    h = F.col(host_col)
    draws = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.struct(
            h60(
                F.concat(h, F.lit(":"), s.cast("string"), F.lit(":" + salt))
            ).alias("w"),
            s.cast("long").alias("s"),
        ),
    )
    best = F.aggregate(
        draws,
        F.struct(
            F.lit(-1).cast("long").alias("w"), F.lit(-1).cast("long").alias("s")
        ),
        lambda acc, d: F.when(
            (d["w"] > acc["w"])
            | ((d["w"] == acc["w"]) & (d["s"] < acc["s"])),
            d,
        ).otherwise(acc),
    )
    return hosts.select(
        h.alias("host"),
        best["s"].alias("shard"),
        best["w"].alias("weight"),
    )


def revalidation_plan(
    history: DataFrame,
    now_ts: int,
    threshold_e6: int = 500_000,
    default_rate_e6: int = 500_000,
) -> DataFrame:
    """(url, n_fetches, rate_e6_per_day, age_s, expected_changes_e6,
    revalidatable, predicted_unchanged, saved_bytes) — the conditional-
    GET planning table: which recrawls can be issued as revalidations
    (``If-None-Match`` when the last response carried an ETag,
    ``If-Modified-Since`` for a Last-Modified) and which of those are
    PREDICTED to come back 304 (expected changes since the last fetch
    — :func:`recrawl_priority`'s Cho & Garcia-Molina estimate,
    ``rate · age div 86400`` in e6 — below ``threshold_e6``), with the
    body bytes a 304 would save. Summing ``saved_bytes`` per host is
    the recrawl-bandwidth budget case for validator-aware scheduling
    (RFC 9111 semantics; the crawler-side plan, not the cache).

    ``history`` rows: (url, fetch_ts, digest, etag, last_modified,
    content_length) — header fields '' when absent, latest row per
    url wins (fetch_ts DESC, digest DESC pinned tie-break). Exact
    integer arithmetic end to end; the change-rate half is exactly
    recrawl_priority's (same estimator, same cold-start default).

    Scale shape: recrawl_priority's one url-keyed aggregate + one
    url-keyed latest-row window + one join — all keyed by url.
    """
    pr = recrawl_priority(
        history.select("url", "fetch_ts", "digest"), now_ts, default_rate_e6
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("url").orderBy(
        F.desc("fetch_ts"), F.desc("digest")
    )
    last = (
        history.select(
            "url", "fetch_ts", "digest", "etag", "last_modified",
            F.col("content_length").cast("long").alias("content_length"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("url", "etag", "last_modified", "content_length")
    )
    j = pr.join(last, "url")
    reval = (F.col("etag") != "") | (F.col("last_modified") != "")
    unchanged = F.col("priority") < F.lit(int(threshold_e6))
    return j.select(
        "url",
        "n_fetches",
        "rate_e6_per_day",
        "age_s",
        F.col("priority").alias("expected_changes_e6"),
        reval.alias("revalidatable"),
        unchanged.alias("predicted_unchanged"),
        F.when(reval & unchanged, F.col("content_length"))
        .otherwise(F.lit(0).cast("long"))
        .alias("saved_bytes"),
    )


# ------------------------------------- crawl-budget apportionment


def apportion_budget(
    weights: DataFrame,
    budget: int,
    key_col: str = "host",
    weight_col: str = "w",
) -> DataFrame:
    """(key, w, alloc) — divide an INTEGER global crawl budget across
    hosts proportionally to weight, summing to the budget EXACTLY:
    Hamilton's largest-remainder method (the quota apportionment used
    from seat allocation to shard capacity planning).

        base_i = budget·w_i div W        rem_i = (budget·w_i) mod W
        extra  = budget − Σ base          (< #hosts seats left over)
        alloc_i = base_i + 1 for the ``extra`` largest remainders
                  (ties broken by key ASC — total, deterministic)

    Guarantees, both tested: **Σ alloc == budget** (no fetch slot lost
    or invented — the property ``mixture_token_plan`` deliberately
    does NOT provide, leaving its remainder unallocated), and the
    QUOTA property |alloc_i − budget·w_i/W| < 1 (no host over- or
    under-served by a whole slot). Hamilton is the only divisor-free
    quota method; its known paradoxes (Alabama) concern budget
    CHANGES, not one allocation, and determinism across runs is what
    the pipeline needs.

    A zero-weight host gets exactly 0 (rem = 0 rows can never win a
    seat: extra = Σrem/W < #positive-remainder rows). Negative weights
    fail loudly in-plan. Scale shape: two scalar aggregates broadcast
    back, one row_number window over the HOST dimension (≪ corpus; a
    single sort of |hosts| rows — the same class as the vocabulary
    rank in jaccard_prefix_pairs).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    from pyspark.sql import Window as W

    w = F.expr(
        f"if({weight_col} < 0, "
        f"cast(raise_error('{weight_col} must be non-negative') as bigint), "
        f"cast({weight_col} as bigint))"
    )
    base = weights.select(F.col(key_col).alias("key"), w.alias("w"))
    tot = base.agg(F.sum("w").cast("long").alias("_tw"))
    b = base.crossJoin(F.broadcast(tot)).select(
        "key",
        "w",
        F.expr(f"{budget} * w div _tw").alias("_base"),
        F.expr(f"({budget} * w) % _tw").alias("_rem"),
    )
    extra = b.agg((F.lit(budget) - F.sum("_base")).cast("long").alias("_extra"))
    ranked = b.withColumn(
        "_rk", F.row_number().over(W.orderBy(F.desc("_rem"), F.asc("key")))
    )
    return ranked.crossJoin(F.broadcast(extra)).select(
        F.col("key").alias(key_col),
        "w",
        (F.col("_base") + F.when(F.col("_rk") <= F.col("_extra"), 1).otherwise(0))
        .cast("long")
        .alias("alloc"),
    )


# --------------------------------------------- AIMD crawl-rate control


def aimd_rates(
    log: DataFrame,
    host_col: str = "host",
    t_col: str = "t",
    ok_col: str = "ok",
    max_rate: int = 16,
    init_rate_col: str | None = "init_rate",
) -> DataFrame:
    """(host, n_ok, n_fail, rate) — per-host crawl-rate control by
    AIMD, TCP congestion control's additive-increase /
    multiplicative-decrease rule (RFC 5681 semantics) applied to
    politeness: every successful fetch raises the host's request rate
    by 1 (capped at ``max_rate``), every failure (429/503/timeouts)
    halves it (floor 1). AIMD is the provably fair/stable control law
    — exactly what a fetcher fleet needs against servers whose
    capacity it cannot observe directly.

    The recursion has no algebraic closed form (halving is not
    prefix-summable), so it ships as a per-host FOLD over the
    time-ordered outcome sequence (SCALE.md rule 15's bounded-fold
    arm): one collect per host per control WAVE — the sequence length
    is bounded by the wave's per-host fetch count, never by history
    (the resulting rate is the carried state for the next wave via
    ``init_rate_col`` when that column is present — pass ``None`` to
    never seed). ``t_col`` must be unique per host (a non-total order
    would make the fold nondeterministic). Conflicting non-null seeds
    for one host raise at execution time rather than silently picking
    the max.
    """
    if max_rate < 1:
        raise ValueError(f"max_rate must be >= 1, got {max_rate}")
    aggs = [
        F.expr(
            f"transform(array_sort(collect_list(struct({t_col} AS t, "
            f"{ok_col} AS ok))), x -> bigint(x.ok))"
        ).alias("_outs"),
        F.sum(F.col(ok_col).cast("long")).cast("long").alias("n_ok"),
        F.sum(1 - F.col(ok_col).cast("long")).cast("long").alias("n_fail"),
    ]
    # carried state between control waves: the explicit init_rate_col,
    # when present, seeds the fold (clamped to [1, max_rate]); absent
    # or null hosts start cold at 1. min<>max on non-null seeds for a
    # host means two control waves disagree about the carried state —
    # raise loudly instead of letting max() pick a winner.
    if init_rate_col is not None and init_rate_col in log.columns:
        aggs.append(
            F.expr(
                f"if(min({init_rate_col}) <> max({init_rate_col}), "
                f"raise_error(concat('aimd_rates: conflicting "
                f"{init_rate_col} seeds for host ', "
                f"first({host_col}))), "
                f"greatest(cast(1 as bigint), least(cast({max_rate} as "
                f"bigint), coalesce(max({init_rate_col}), "
                f"cast(1 as bigint)))))"
            ).alias("_seed")
        )
        zero = "_seed"
    else:
        zero = "cast(1 as bigint)"
    per = log.groupBy(F.col(host_col).alias("host")).agg(*aggs)
    fold = (
        f"aggregate(_outs, {zero}, (r, o) -> "
        f"if(o = 1, least(r + 1, cast({max_rate} as bigint)), "
        f"greatest(cast(1 as bigint), r div 2)))"
    )
    return per.select(
        "host", "n_ok", "n_fail", F.expr(fold).alias("rate")
    )
