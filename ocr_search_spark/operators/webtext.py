"""Web-text normalization: HTML entity decoding, mojibake repair,
control stripping — the ftfy-style cleanup stage between raw crawl/HTML
extraction and tokenization.

The north rule's "HTML boilerplate strip … DOM heuristics" implies text
that has been THROUGH an HTML pipeline, and such text arrives with three
systematic defects a 100 TB corpus cannot hand-fix:

* **entities** — ``&amp; &lt; &#39;`` survive naive tag stripping (the
  reference pipes ``pdftotext`` output straight into the tokenizer,
  PdfUtil.class.js:113 — no decode step exists to mirror, so this is
  the added lakehouse-tier hygiene);
* **mojibake** — UTF-8 bytes decoded as cp1252 once upstream
  (``Ã©`` for ``é``, ``â€™`` for ``’``): the single most common crawl
  corruption, repairable with a PINNED longest-first replacement chain
  because the corrupted sequences are unambiguous two/three-char marks;
* **controls** — C0 chars (minus ``\\n``/``\\t``) and ``\\r\\n`` litter
  copy-pasted and OCR'd text and poison downstream shingling.

Everything is a chain of literal ``replace`` + RE2-safe regexps + one
array transform (for decimal numeric entities) — whole-stage codegen,
no UDFs, and a DuckDB oracle replays it bit-for-bit. RE2 constraint
matters: the numeric-entity split uses a literal ``&#`` delimiter and
re-prefixes non-matching pieces, NOT a lookahead (DuckDB's RE2 has no
lookahead; keeping both engines on the same mechanism is what makes the
oracle exact).

Decoding is ONE simultaneous pass (html.unescape semantics on this
subset): the text splits on ``&`` and each piece decodes at most one
leading entity, so ``&amp;lt;`` — and its numeric twin ``&#38;lt;`` —
decode to the literal text ``&lt;`` (one level), never to ``<``.

Numeric entities are decoded for printable ASCII (32-126) only: Spark's
``char()`` wraps at 256 (`chr(n % 256)`) while DuckDB's ``chr`` is full
Unicode, so beyond ASCII the two engines would legitimately diverge —
the guard pins the common cases (``&#39;`` ``&#34;``) and leaves rare
high code points literal rather than wrong.

Scale shape: pure narrow projection — no shuffle, no state; applied
per-span or per-doc it composes with extract_density / strip_page_chrome
in the clean-extraction pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ENTITY_MAP",
    "MOJIBAKE_MAP",
    "decode_entities_col",
    "fix_mojibake_col",
    "strip_controls_col",
    "normalize_web_text",
    "html_tables",
    "html_table_markdown",
    "html_metadata",
    "publish_date",
]

# named entities, decode order = list order (amp LAST — single-pass rule)
ENTITY_MAP: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&ndash;", "–"),
    ("&mdash;", "—"),
    ("&hellip;", "…"),
    ("&lsquo;", "‘"),
    ("&rsquo;", "’"),
    ("&ldquo;", "“"),
    ("&rdquo;", "”"),
    ("&copy;", "©"),
    ("&deg;", "°"),
    ("&amp;", "&"),
]

# UTF-8-read-as-cp1252 marks, longest first (pinned order: a longer
# corrupted sequence can contain a shorter one as a suffix)
MOJIBAKE_MAP: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> ’
    ("â€˜", "‘"),  # â€˜ -> ‘
    ("â€œ", "“"),  # â€œ -> “
    ("â€“", "–"),  # â€“ -> –
    ("â€”", "—"),  # â€” -> —
    ("â€¦", "…"),  # â€¦ -> …
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Â°", "°"),  # Â° -> °
    ("Â£", "£"),  # Â£ -> £
    ("Â©", "©"),  # Â© -> ©
    ("Â»", "»"),  # Â» -> »
]


def decode_entities_col(text: Column) -> Column:
    """ONE simultaneous pass over every entity form — named
    (ENTITY_MAP), decimal ``&#39;`` and hex ``&#x27;`` numerics (the
    latter two guarded to printable ASCII 32..126; see module
    docstring). Mechanism: split on the literal ``&``; every piece
    after the first originally started with ``&`` — decode exactly one
    leading entity body (named, or a numeric whose code is in range),
    else restore the ``&``. A decoded character lands in the OUTPUT
    and is never rescanned, so ``&amp;lt;`` and its numeric twin
    ``&#38;lt;`` BOTH yield the literal text ``&lt;``, exactly
    html.unescape's single-pass semantics on this entity subset."""
    parts = F.split(text, "&", -1)

    def piece(p: Column) -> Column:
        num = F.regexp_extract(p, r"^#([0-9]{1,7});", 1)
        hexa = F.regexp_extract(p, r"^#[xX]([0-9a-fA-F]{1,6});", 1)
        code = (
            F.when(num != "", num.cast("int"))
            .when(hexa != "", F.conv(hexa, 16, 10).cast("int"))
            .otherwise(F.lit(None))
        )
        num_ok = code.isNotNull() & (code >= 32) & (code <= 126)
        num_decoded = F.concat(
            F.char(code),
            F.regexp_replace(p, r"^#([0-9]{1,7}|[xX][0-9a-fA-F]{1,6});", ""),
        )
        out = F.when(num_ok, num_decoded)
        for src, dst in ENTITY_MAP:
            body = src[1:]  # e.g. "amp;"
            out = out.when(
                F.startswith(p, F.lit(body)),
                F.concat(F.lit(dst), F.substr(p, F.lit(len(body) + 1))),
            )
        return out.otherwise(F.concat(F.lit("&"), p))

    return F.concat(
        F.element_at(parts, 1),
        F.array_join(
            F.transform(
                F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
                piece,
            ),
            "",
        ),
    )


def fix_mojibake_col(text: Column) -> Column:
    """Pinned longest-first literal replacement of the MOJIBAKE_MAP
    cp1252-mojibake marks."""
    out = text
    for src, dst in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def strip_controls_col(text: Column) -> Column:
    """CRLF/CR → LF, then drop C0 controls except tab/newline."""
    out = F.regexp_replace(text, "\r\n?", "\n")
    return F.regexp_replace(
        out, "[\x00-\x08\x0B-\x1F\x7F]", ""
    )


def normalize_web_text(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, text, n_entities, n_mojibake): the composed cleanup —
    controls → mojibake → entities (entities last, so mojibake repair
    cannot fabricate entity heads) — plus exact defect counts taken on
    the INPUT (regexp count for entity heads; per-mark occurrence sum
    for mojibake, computed from length deltas in one projection)."""
    t = F.col(text_col)
    n_ent = F.size(
        F.regexp_extract_all(t, F.lit(r"&(lt|gt|quot|apos|nbsp|ndash|mdash|hellip|lsquo|rsquo|ldquo|rdquo|copy|deg|amp|#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6});"), 0)
    )
    n_moj = F.lit(0).cast("long")
    for src, _dst in MOJIBAKE_MAP:
        # occurrences = length delta / pattern length, exact for literals
        n_moj = n_moj + (
            (F.length(t) - F.length(F.replace(t, F.lit(src)))) / F.lit(len(src))
        ).cast("long")
    cleaned = decode_entities_col(
        fix_mojibake_col(strip_controls_col(t))
    )
    return docs.select(
        F.col(id_col).alias("id"),
        cleaned.alias("text"),
        n_ent.cast("long").alias("n_entities"),
        n_moj.alias("n_mojibake"),
    )


# --------------------------------------------------- HTML main content

# raw-text / non-content subtrees removed wholesale (jusText/Boilerpipe
# pre-pass): script+style are CDATA-ish (tag soup inside breaks naive
# stripping), head is metadata, nav/header/footer/aside are the chrome
# the north rule's "DOM heuristics" names
_BOILERPLATE_SUBTREES = (
    "script", "style", "head", "nav", "header", "footer", "aside",
)
_BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article"
    r"|blockquote|pre|br)\b[^>]*>"
)


_IMG_SRC_RE = r"""(?i)<img\b[^>]*\bsrc\s*=\s*['"]([^'"]+)['"]"""


def _block_structs(html: Column) -> Column:
    """Shared block pass: strip boilerplate subtrees + comments, split
    on block tags, score each block — struct(txt, links, words, imgs).
    The imgs list carries <img src> references for the span emitter;
    the text/links/words triple feeds the boilerplate classifier."""
    t = html
    for tag in _BOILERPLATE_SUBTREES:
        t = F.regexp_replace(t, f"(?is)<{tag}\\b[^>]*>.*?</{tag}>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")

    def scored(b):
        stripped = F.regexp_replace(b, r"<[^>]*>", " ")
        txt = F.trim(F.regexp_replace(stripped, r"\s+", " "))
        return F.struct(
            txt.alias("txt"),
            (F.size(F.split(b, r"(?i)<a\b", -1)) - 1).alias("links"),
            F.size(
                F.filter(F.split(txt, " "), lambda w: w != "")
            ).alias("words"),
            F.regexp_extract_all(b, F.lit(_IMG_SRC_RE), 1).alias("imgs"),
        )

    return F.transform(F.split(t, _BLOCK_TAG_RE), scored)


def html_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "id",
    min_words: int = 5,
    max_link_pct: int = 12,
) -> DataFrame:
    """Main-content extraction from raw HTML — the "HTML boilerplate
    strip + DOM heuristics" stage of the north rule, as a pure columnar
    plan (regex + array lambdas; whole-stage codegen, no UDF):

    1. remove non-content SUBTREES wholesale (script/style/head plus
       the nav/header/footer/aside chrome) and comments;
    2. segment on block-level tags — each block is a candidate content
       unit (the DOM-free equivalent of Boilerpipe's text blocks);
    3. classify each block by the two classic signals, both pinned to
       integer arithmetic: word count (``< min_words`` → boilerplate;
       dateline/copyright crumbs) and link density (``links·100 >
       words·max_link_pct`` → boilerplate; menus and link farms are
       short text with many anchors);
    4. re-emit surviving blocks in document order, newline-joined.

    Entity decoding / mojibake repair intentionally stay OUT of this
    operator — compose with :func:`normalize_web_text` (pipeline
    stages, reference: the conversion chain in
    /root/reference/src/sh/pdf_to_png.sh keeps stages single-purpose).

    Returns (id, text, n_blocks, n_kept) where n_blocks counts
    nonempty candidate blocks. Scale shape: one projection — no
    shuffle, no Python; every step is a string/array expression.
    """
    sc = _block_structs(F.col(html_col))
    nonempty = F.filter(sc, lambda s: s["words"] > 0)
    kept = F.filter(
        nonempty,
        lambda s: (s["words"] >= min_words)
        & (s["links"] * 100 <= s["words"] * max_link_pct),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(
            F.transform(kept, lambda s: s["txt"]), "\n"
        ).alias("text"),
        F.size(nonempty).alias("n_blocks"),
        F.size(kept).alias("n_kept"),
    )


def html_to_spans(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_link_pct: int = 12,
) -> DataFrame:
    """HTML → the engine's interleaved span model (schemas.SPAN:
    array<struct<kind, text, media_ref, offset>>) — the north rule's
    "re-emit normalized (kind, text, media_ref, offset) span arrays"
    applied to a crawl source. The output feeds
    :func:`operators.extract.extract_spans` unchanged, so an HTML
    corpus rides the SAME extraction → postings → search pipeline as
    the PDF/PPTX one.

    Span emission, fully pinned:

    * a block passing the :func:`html_main_content` classifier
      (``words >= min_words`` and link density within bound) emits one
      ``text`` span, followed by one ``media`` span per ``<img src>``
      it contains (reading order: a figure's caption-side text precedes
      its image within the block);
    * a PURE figure block (no words, no anchors, ≥1 image) emits its
      media spans even though it has no text — dropping it with the
      boilerplate would lose every standalone ``<div><img></div>``
      figure;
    * boilerplate blocks (link farms, crumbs) drop their images too —
      chrome icons are noise, exactly like their text.

    Offsets are the final array positions (0-based, dense). One
    projection, no shuffle, no UDF.
    """
    sc = _block_structs(F.col(html_col))
    kept_cond = lambda s: (s["words"] >= min_words) & (
        s["links"] * 100 <= s["words"] * max_link_pct
    )
    figure_cond = lambda s: (s["words"] == 0) & (s["links"] == 0)

    def span(kind, text, ref):
        return F.struct(
            kind.alias("kind"), text.alias("text"), ref.alias("media_ref")
        )

    def block_spans(s):
        text_one = F.array(span(F.lit("text"), s["txt"], F.lit("")))
        text_part = F.when(kept_cond(s), text_one).otherwise(
            F.slice(text_one, 1, 0)
        )
        media_all = F.transform(
            s["imgs"], lambda m: span(F.lit("media"), F.lit(""), m)
        )
        media_part = F.when(
            kept_cond(s) | figure_cond(s), media_all
        ).otherwise(F.slice(media_all, 1, 0))
        return F.concat(text_part, media_part)

    flat = F.flatten(F.transform(sc, block_spans))
    spans = F.transform(
        flat,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return df.select(F.col(id_col).alias("doc_id"), spans.alias("spans"))


_META_NOINDEX_RE = (
    "(?i)<meta\\b(?:[^>]*\\bname\\s*=\\s*[\"']robots[\"'][^>]*"
    "\\bcontent\\s*=\\s*[\"'][^\"']*noindex"
    "|[^>]*\\bcontent\\s*=\\s*[\"'][^\"']*noindex[^\"']*[\"'][^>]*"
    "\\bname\\s*=\\s*[\"']robots[\"'])"
)
_CANON_HREF_RE = (
    "(?i)<link\\b[^>]*\\brel\\s*=\\s*[\"']canonical[\"'][^>]*"
    "\\bhref\\s*=\\s*[\"']([^\"']+)[\"']"
)
_CANON_HREF_RE_REV = (
    "(?i)<link\\b[^>]*\\bhref\\s*=\\s*[\"']([^\"']+)[\"'][^>]*"
    "\\brel\\s*=\\s*[\"']canonical[\"']"
)


def html_meta_policy(df, html_col: str = "html"):
    """Page-level indexing policy from the document head: ``noindex``
    (a ``<meta name=robots>`` whose content lists noindex — either
    attribute order) and the ``rel=canonical`` link target (either
    attribute order; empty string when absent). A crawl curation pass
    drops noindex pages and keys dedup on the declared canonical.
    Pure regex projection — no UDF, no shuffle."""
    from pyspark.sql import functions as F

    h = F.col(html_col)
    canon = F.coalesce(
        F.nullif(F.regexp_extract(h, _CANON_HREF_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(h, _CANON_HREF_RE_REV, 1), F.lit("")),
        F.lit(""),
    )
    return df.withColumns(
        {"noindex": h.rlike(_META_NOINDEX_RE), "canonical_href": canon}
    )


# --------------------------------------------------- HTML tables

# An explicit <table> element is the ONE structure main-content
# extraction must not flatten into prose: a row read left-to-right
# interleaves unrelated columns. The reference renders pages to flat
# text via pdftotext (PdfUtil.class.js:113) and loses every table; a
# training-data pipeline wants the cells with their grid coordinates
# (then table_markdown-style rendering, or column-wise serialization).
#
# Parsing rules, pinned for determinism on tag soup:
#   * a table is <table ...> up to the FIRST subsequent </table>
#     (non-greedy) — a nested inner table therefore TRUNCATES its
#     outer table at the inner closer; the outer remainder's cells are
#     lost. Wrong for nested layouts, but deterministic, linear-time,
#     and nested data tables are rare in the wild (nested TABLES were
#     a 1990s layout idiom; layout chrome is dropped upstream anyway);
#   * only explicitly closed rows (<tr ...> … </tr>) and cells
#     (<td|th ...> … </td|th>) count — closers omitted by sloppy HTML
#     drop the row/cell rather than guessing a boundary;
#   * cell text = inner markup with tags stripped and whitespace
#     collapsed (same normalization as the block classifier).

_TABLE_RE = r"(?is)<table\b[^>]*>(.*?)</table>"
_TR_RE = r"(?is)<tr\b[^>]*>(.*?)</tr>"
_CELL_RE = r"(?is)<(t[dh])\b[^>]*>(.*?)</t[dh]>"


def html_tables(
    df: DataFrame, html_col: str = "html", id_col: str = "id"
) -> DataFrame:
    """Extract every ``<table>`` in every document into cell rows
    ``(id, table_idx, row_idx, col_idx, tag, cell)`` — tag is ``th`` or
    ``td`` (lowercased), indices are 0-based positions in document /
    table / row order. Documents without tables emit no rows.

    Mechanism: three nested index-carrying ``transform``s over
    ``regexp_extract_all`` matches; the cell tag and cell body come
    from TWO group passes over ONE pattern zipped positionally
    (same pattern → same match sequence → exact alignment, the
    extract_anchors trick). Pure explode + projection inside
    whole-stage codegen — no UDF, no shuffle; scale cost is linear in
    HTML bytes per partition."""
    h = F.col(html_col)
    tables = F.regexp_extract_all(h, F.lit(_TABLE_RE), 1)

    def row_cells(row):
        tags = F.regexp_extract_all(row, F.lit(_CELL_RE), 1)
        bodies = F.regexp_extract_all(row, F.lit(_CELL_RE), 2)
        return F.zip_with(
            tags,
            bodies,
            lambda tg, b: F.struct(
                F.lower(tg).alias("tag"),
                F.trim(
                    F.regexp_replace(
                        F.regexp_replace(b, "<[^>]*>", " "), r"\s+", " "
                    )
                ).alias("cell"),
            ),
        )

    nested = F.transform(
        tables,
        lambda tbl, ti: F.transform(
            F.regexp_extract_all(tbl, F.lit(_TR_RE), 1),
            lambda row, ri: F.transform(
                row_cells(row),
                lambda c, ci: F.struct(
                    ti.cast("int").alias("table_idx"),
                    ri.cast("int").alias("row_idx"),
                    ci.cast("int").alias("col_idx"),
                    c["tag"].alias("tag"),
                    c["cell"].alias("cell"),
                ),
            ),
        ),
    )
    cell = F.explode(F.flatten(F.flatten(nested))).alias("_c")
    return df.select(F.col(id_col).alias("id"), cell).select(
        "id",
        F.col("_c.table_idx").alias("table_idx"),
        F.col("_c.row_idx").alias("row_idx"),
        F.col("_c.col_idx").alias("col_idx"),
        F.col("_c.tag").alias("tag"),
        F.col("_c.cell").alias("cell"),
    )


# --------------------------------------------------- page metadata

# <meta property=…> / <meta name=…> attribute order is author's choice;
# every extractor below matches BOTH orders (the same double-regex
# coalesce html_meta_policy pins for rel=canonical). Values are taken
# verbatim from the content attribute (no entity decode — compose with
# decode_entities_col downstream if needed).


def _meta_attr_col(h: Column, attr: str, value: str) -> Column:
    fwd = F.regexp_extract(
        h,
        f"(?is)<meta\\b[^>]*\\b{attr}\\s*=\\s*[\"']{value}[\"'][^>]*"
        f"\\bcontent\\s*=\\s*[\"']([^\"']*)[\"']",
        1,
    )
    rev = F.regexp_extract(
        h,
        f"(?is)<meta\\b[^>]*\\bcontent\\s*=\\s*[\"']([^\"']*)[\"'][^>]*"
        f"\\b{attr}\\s*=\\s*[\"']{value}[\"']",
        1,
    )
    return F.coalesce(
        F.nullif(fwd, F.lit("")), F.nullif(rev, F.lit("")), F.lit("")
    )


def html_metadata(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Structured page metadata: ``title`` (inner text of the first
    ``<title>``, whitespace-collapsed), OpenGraph ``og_title`` /
    ``og_type`` / ``og_image`` (``<meta property=…>``, either attribute
    order), ``meta_description`` (``<meta name=description>``) and the
    ``<html lang=…>`` attribute (lowercased). Absent fields are ``''``.
    One regex projection — no UDF, no shuffle; this is the curation
    signal set (titles for retrieval display, og:type for page-kind
    filtering, description as a quality prior, lang as a cheap
    language-ID prior ahead of the n-gram classifier)."""
    h = F.col(html_col)
    title = F.trim(
        F.regexp_replace(
            F.regexp_extract(h, r"(?is)<title\b[^>]*>(.*?)</title>", 1),
            r"\s+",
            " ",
        )
    )
    lang = F.lower(
        F.regexp_extract(
            h, "(?is)<html\\b[^>]*\\blang\\s*=\\s*[\"']([A-Za-z-]+)[\"']", 1
        )
    )
    return df.withColumns(
        {
            "title": title,
            "og_title": _meta_attr_col(h, "property", "og:title"),
            "og_type": _meta_attr_col(h, "property", "og:type"),
            "og_image": _meta_attr_col(h, "property", "og:image"),
            "meta_description": _meta_attr_col(h, "name", "description"),
            "lang_attr": lang,
        }
    )


# A date is plausible when it parses as YYYY-MM-DD with a sane calendar
# shape and a year in [1990, 2030] — outside that window a "date" is
# almost always a serial number, a version string, or vandalized
# markup. Pinned (inclusive) so both engines agree bit-for-bit.
_DATE_OK_RE = r"^(199\d|20[0-2]\d|2030)-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$"


def publish_date(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Publication-date extraction with a pinned source-priority rule
    (the trafilatura/htmldate heuristic reduced to its deterministic
    core): (1) ``<meta property="article:published_time">`` — the
    explicit editorial statement; (2) the first ``<time datetime=…>``
    element; (3) a ``/YYYY/MM/`` segment pair in the URL path (day
    pinned to 01). Each candidate must pass the plausibility window
    (YYYY-MM-DD, year 1990-2030) or the chain falls through; no source
    yields ``('', '')``. Adds ``publish_date`` and ``date_source``
    (``meta`` / ``time`` / ``url`` / ``''``). Pure projection."""
    h = F.col(html_col)
    meta_d = F.regexp_extract(
        _meta_attr_col(h, "property", "article:published_time"),
        r"^(\d{4}-\d{2}-\d{2})",
        1,
    )
    time_d = F.regexp_extract(
        F.regexp_extract(
            h, "(?is)<time\\b[^>]*\\bdatetime\\s*=\\s*[\"']([^\"']+)[\"']", 1
        ),
        r"^(\d{4}-\d{2}-\d{2})",
        1,
    )
    u = F.col(url_col)
    url_y = F.regexp_extract(u, r"/((?:19|20)\d{2})/(\d{2})/", 1)
    url_m = F.regexp_extract(u, r"/((?:19|20)\d{2})/(\d{2})/", 2)
    url_d = F.when(
        url_y != "", F.concat(url_y, F.lit("-"), url_m, F.lit("-01"))
    ).otherwise(F.lit(""))

    def ok(c: Column) -> Column:
        return c.rlike(_DATE_OK_RE)

    picked = (
        F.when(ok(meta_d), F.struct(meta_d.alias("d"), F.lit("meta").alias("s")))
        .when(ok(time_d), F.struct(time_d.alias("d"), F.lit("time").alias("s")))
        .when(ok(url_d), F.struct(url_d.alias("d"), F.lit("url").alias("s")))
        .otherwise(F.struct(F.lit("").alias("d"), F.lit("").alias("s")))
    )
    return df.withColumns(
        {"publish_date": picked["d"], "date_source": picked["s"]}
    )


def html_table_markdown(
    df: DataFrame, html_col: str = "html", id_col: str = "id"
) -> DataFrame:
    """GitHub pipe-table rendering of every ``<table>`` per document —
    the table-to-text form a training pipeline feeds an LM. Pure
    composition: :func:`html_tables` produces the cell grid and the
    optical-layout tier's renderer (:func:`pagelayout.table_markdown`)
    serializes it, keyed (id, table_idx) instead of (doc, page) — ONE
    renderer for both table sources, so the pinned dense-render rules
    (ragged rows pad to the table's max column, ``|`` escapes, grid
    order via array_sort) are shared, not duplicated.

    Returns (id, table_idx, n_rows, n_cols, markdown). Scale shape:
    html_tables' zero-shuffle explode, then table_markdown's two
    (id, table_idx)-keyed aggs — per-key cardinality is one table's
    cell count."""
    from .pagelayout import table_markdown

    cells = html_tables(df, html_col=html_col, id_col=id_col).select(
        "id",
        "table_idx",
        F.col("row_idx").alias("row"),
        F.col("col_idx").alias("col"),
        F.col("cell").alias("text"),
    )
    return table_markdown(cells, doc_col="id", page_col="table_idx")


# --------------------------------------------------- homoglyph folding

# Pinned confusable subset (Unicode TR39 confusables, the high-traffic
# Cyrillic/Greek lookalikes of Latin lowercase). The RULE is the
# operator; a deployment swaps in the full confusables table as data —
# the same contract as urlnorm's public-suffix subset.
HOMOGLYPHS: dict[str, str] = {
    "а": "a",  # CYRILLIC SMALL A
    "е": "e",  # CYRILLIC SMALL IE
    "о": "o",  # CYRILLIC SMALL O
    "р": "p",  # CYRILLIC SMALL ER
    "с": "c",  # CYRILLIC SMALL ES
    "х": "x",  # CYRILLIC SMALL HA
    "у": "y",  # CYRILLIC SMALL U
    "і": "i",  # CYRILLIC SMALL BYELORUSSIAN-UKRAINIAN I
    "ѕ": "s",  # CYRILLIC SMALL DZE
    "ο": "o",  # GREEK SMALL OMICRON
    "α": "a",  # GREEK SMALL ALPHA
    "ν": "v",  # GREEK SMALL NU
}
_HG_SRC = "".join(HOMOGLYPHS)
_HG_DST = "".join(HOMOGLYPHS.values())
_HG_CLASS = "[" + _HG_SRC + "]"
# a token is a SPOOF candidate when it mixes plain Latin letters with
# confusable lookalikes — the IDN-homograph shape ("pаypal": Latin
# p,y,l + Cyrillic а) — pure ASCII and pure foreign-script tokens are
# both legitimate
_HG_MIXED_RE = f"([a-z]{_HG_CLASS}|{_HG_CLASS}[a-z])"


def fold_homoglyphs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, folded, n_confusables, n_spoof_tokens) — fold the pinned
    Latin-lookalike confusables (TR39 subset) to their Latin targets
    and measure the damage: total confusable codepoints, and the count
    of MIXED-SCRIPT tokens (Latin letters and lookalikes in one token
    — the IDN-homograph spoof shape; pure-Cyrillic words are fine and
    pure-ASCII obviously so). Search keys, dedup shingles and URL
    hosts must fold BEFORE hashing or the spoof and its target live in
    different buckets forever — which is also why this is a separate
    operator from webtext_normalize (mojibake is encoding DAMAGE,
    homoglyphs are content that is deliberately wrong).

    Pure codegen projection: one translate + two regexp counts, no
    shuffle, no UDF."""
    t = F.col(text_col)
    toks = F.filter(F.split(F.lower(t), r"\s+"), lambda w: w != "")
    return docs.select(
        F.col(id_col).alias("id"),
        F.translate(t, _HG_SRC, _HG_DST).alias("folded"),
        F.size(
            F.regexp_extract_all(t, F.lit(_HG_CLASS), 0)
        ).cast("long").alias("n_confusables"),
        F.size(F.filter(toks, lambda w: w.rlike(_HG_MIXED_RE)))
        .cast("long")
        .alias("n_spoof_tokens"),
    )


# --------------------------------------------------- acronym mining

# generous candidate window: 2-6 words immediately before "(SHORT)";
# the columnar verifier then keeps exactly |short| of them and checks
# initials — the regex only has to over-capture, never to count
ACRONYM_RE = (
    r"((?:[A-Za-z][A-Za-z-]* ){2,6})\(([A-Z]{2,6})\)"
)


def acronym_pairs(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(short, long, n_docs) — mine acronym/definition pairs with the
    INITIALISM special case of Schwartz & Hearst (PSB 2003): a 2-6
    letter uppercase token in parentheses whose letters are exactly
    the initials (case-insensitive) of the |short| words immediately
    preceding the parenthesis. The curation/knowledge primitive for
    glossary building and for expanding search queries over technical
    corpora — and deliberately the PINNED-RULE subset (the full S&H
    inner-letter alignment is a per-pair DP; the initials rule covers
    the dominant pattern and stays whole-stage-codegen).

    One regex scan per doc (non-overlapping matches, the engine-native
    scan order), per-match verification as array ops, then a
    (short, long)-keyed count of supporting docs. No UDF, no
    self-join; the explode is bounded by matches-per-doc.
    """
    t = F.col(text_col)
    m = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(t, F.lit(ACRONYM_RE), 0)
        ).alias("_m"),
    ).select(
        "id",
        F.regexp_extract("_m", ACRONYM_RE, 2).alias("short"),
        F.filter(
            F.split(F.trim(F.regexp_extract("_m", ACRONYM_RE, 1)), " "),
            lambda w: w != "",
        ).alias("_win"),
    )
    n = F.length("short")
    cand = m.where(F.size("_win") >= n).select(
        "id",
        "short",
        F.array_join(
            F.slice("_win", F.size("_win") - n + 1, n), " "
        ).alias("long"),
        F.slice("_win", F.size("_win") - n + 1, n).alias("_lw"),
    )
    # index-based compare (split-on-empty-pattern edge behaviors differ
    # across engines; substr(i, 1) is pinned everywhere)
    ok = F.forall(
        F.sequence(F.lit(1), F.length("short")),
        lambda i: F.lower(F.col("short").substr(i, F.lit(1)))
        == F.lower(F.element_at("_lw", i).substr(F.lit(1), F.lit(1))),
    )
    verified = cand.where(ok)
    return verified.groupBy("short", "long").agg(
        F.countDistinct("id").cast("long").alias("n_docs")
    )
