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
