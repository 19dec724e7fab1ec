"""Code-aware corpus curation: fenced-code extraction, heuristic
programming-language ID, license detection, and Unicode-script
profiling.

Large-scale code/web corpora (The Stack, StarCoder, RefinedWeb) gate
documents on exactly these signals before training: how much of a page
is code, what language that code is, whether a recognizable license
governs it, and which writing system dominates the prose. The reference
engine has no notion of these (its pipeline is OCR text only —
``/root/reference/src/PdfUtil/PdfUtil.class.js`` stops at raw page
text); they are part of this engine's training-pipeline surface, like
``textstats``/``dedup``.

Every operator here is a pure columnar projection (regex + higher-order
array functions inside whole-stage codegen): zero UDFs, zero shuffles,
zero joins — the 100 TB cost is one pass over the text column with the
scan's own parallelism.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Markdown fence: ```lang\n body ``` — the info string is a single
# identifier token (GitHub-flavored markdown's common case); an opening
# fence not followed by a newline-terminated info string (e.g. a bare
# ``` mid-sentence) is NOT a block, and an unclosed fence matches
# nothing. (?s) lets the body cross lines; RE2 (DuckDB) and java.util
# .regex (Spark) agree on this subset — no backrefs, no lookaround.
FENCE_RE = r"(?s)```([A-Za-z0-9_+-]*)\n(.*?)```"


def fenced_code_blocks(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document fenced-code inventory: block count, total code
    characters, distinct (non-empty, lowercased) fence languages, and
    the code-to-text ratio.

    Two ``regexp_extract_all`` passes (group 1 = info string, group 2 =
    body) stay positionally aligned because both run the same pattern —
    the same zip discipline as ``urlnorm.extract_anchors``."""
    ext = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_len"),
        F.expr(f"regexp_extract_all({text_col}, '{FENCE_RE}', 1)").alias("_langs"),
        F.expr(f"regexp_extract_all({text_col}, '{FENCE_RE}', 2)").alias("_bodies"),
    )
    code_chars = F.aggregate(
        F.col("_bodies"), F.lit(0).cast("long"), lambda acc, b: acc + F.length(b)
    )
    return ext.select(
        F.col(id_col),
        F.size("_bodies").cast("int").alias("n_blocks"),
        code_chars.alias("code_chars"),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.filter(
                        F.transform(F.col("_langs"), F.lower), lambda x: x != ""
                    )
                )
            ),
            ",",
        ).alias("langs"),
        (code_chars / F.greatest(F.col("_len"), F.lit(1))).alias("code_ratio"),
    )


def code_language_heuristic(body: Column) -> Column:
    """First-match keyword heuristic over a code-block body — the
    classic cheap language ID used to bucket unlabeled blocks before a
    real classifier. Priority order is fixed and documented; ties are
    impossible by construction (first match wins)."""
    return (
        F.when(body.contains("def ") & body.contains(":"), "python")
        .when(body.contains("#include"), "c")
        .when(body.contains("fn ") & body.contains("->"), "rust")
        .when(body.contains("public static"), "java")
        .when(body.contains("=>") | body.contains("function "), "javascript")
        .when(body.rlike(r"SELECT .* FROM"), "sql")
        .otherwise("unknown")
    )


def classify_code_blocks(
    blocks: DataFrame, body_col: str = "body", id_col: str = "doc_id"
) -> DataFrame:
    """Attach the heuristic language to each unlabeled block row."""
    return blocks.select(
        F.col(id_col),
        code_language_heuristic(F.col(body_col)).alias("language"),
    )


# SPDX id → lowercase phrases that must ALL appear in the text. Phrase
# sets follow the license headers' own boilerplate (public SPDX corpus);
# matching is containment on the lowercased document, so layout and
# wrapping don't matter.
LICENSE_PATTERNS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("Apache-2.0", ("apache license", "version 2.0")),
    ("MIT", ("permission is hereby granted, free of charge",)),
    ("MIT", ("mit license",)),
    ("GPL-3.0", ("gnu general public license", "version 3")),
    ("GPL-2.0", ("gnu general public license", "version 2")),
    ("BSD-3-Clause", ("bsd 3-clause",)),
    ("BSD-3-Clause", ("redistribution and use in source and binary forms",)),
    ("MPL-2.0", ("mozilla public license",)),
)

PERMISSIVE = frozenset({"MIT", "Apache-2.0", "BSD-3-Clause"})


def detect_licenses(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document license scan: sorted distinct SPDX ids (comma
    joined) plus a ``permissive`` flag (at least one license found and
    every found license is MIT/Apache-2.0/BSD-3-Clause).

    One lowercase projection feeds |patterns| containment tests inside
    a single codegen stage — the array of matched ids never leaves the
    row."""
    low = F.lower(F.col(text_col))
    hits = F.array(
        *[
            F.when(
                functools.reduce(
                    lambda a, b: a & b, [low.contains(p) for p in phrases]
                ),
                spdx,
            )
            for spdx, phrases in LICENSE_PATTERNS
        ]
    )
    found = F.array_sort(
        F.array_distinct(F.filter(hits, lambda x: x.isNotNull()))
    )
    return docs.select(
        F.col(id_col),
        F.array_join(found, ",").alias("licenses"),
        (
            (F.size(found) > 0)
            & (
                F.size(
                    F.filter(
                        found, lambda x: ~x.isin(*sorted(PERMISSIVE))
                    )
                )
                == 0
            )
        ).alias("permissive"),
    )


# Unicode script ranges (BMP core blocks — the dominant-prose signal;
# supplementary planes would extend the classes, not the plan shape).
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "A-Za-z"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("cjk", "一-鿿"),
    ("arabic", "؀-ۿ"),
)


def script_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document writing-system histogram + dominant script (first
    script in the fixed order whose count equals the max — 'latin' wins
    exact ties). Counts are codepoints in each script's core block;
    `length - length(strip)` keeps the whole computation in codegen."""
    c = F.col(text_col)
    counts = {
        name: (F.length(c) - F.length(F.regexp_replace(c, f"[{rng}]", "")))
        .cast("long")
        .alias(f"{name}_chars")
        for name, rng in SCRIPT_RANGES
    }
    out = docs.select(F.col(id_col), *counts.values())
    mx = F.greatest(*[F.col(f"{n}_chars") for n, _ in SCRIPT_RANGES])
    expr = None
    for name, _ in SCRIPT_RANGES:
        cond = F.col(f"{name}_chars") == mx
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return out.withColumn("dominant", expr)
