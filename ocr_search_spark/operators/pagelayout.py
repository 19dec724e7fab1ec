"""Page-layout analysis: reading order for OCR word boxes.

The north-star extraction pipeline names "PDF/PPTX layout parsing" as a
stage (reference analog: the page-image conversion chain in
/root/reference/src/sh/*.sh renders pages whose OCR output arrives as
positioned word boxes, not a text stream). Before text can join the
span stream it needs a reading ORDER. This module implements the
classic single-cut XY heuristic (the first level of recursive XY-cut,
Nagy et al.): find the widest vertical whitespace gap on each page;
if it is wide enough, the page is two columns read left-to-right, else
one column — then order boxes by (column, y, x).

Everything is integer arithmetic on milli-unit coordinates (e3) and
window functions — no floats, no UDFs, so a DuckDB oracle replays it
bit-for-bit and the plan is two window passes per page partition:

1. boxes sorted by x0; running max of x1 over earlier boxes; the
   candidate gap before box b is ``x0(b) − max_prev_x1`` when positive
   (whitespace the full page height crosses — boxes never straddle it,
   because every earlier box ends before it and b starts after it).
2. the widest gap ≥ ``min_gap`` wins (ties: smallest x0 — pinned);
   the cut is its midpoint, carried as ``split_x2 = x0 + max_prev_x1``
   so column assignment compares ``2·x0 ≥ split_x2`` without division.
3. reading order = row_number over (col, y0, x0, box_id).

Scale shape: both windows partition by (doc, page) — thousands of
boxes each, never corpus-wide; the per-page split frame is one row per
page, joined back page-keyed. At 10^12 docs this is one shuffle on the
page key, then narrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["reading_order", "reading_order_xy", "strip_page_chrome", "table_structure", "table_cells", "table_markdown", "figure_captions"]


def reading_order(
    boxes: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
    min_gap: int = 80,
) -> DataFrame:
    """(doc, page, box_id, col, rank) reading order for word boxes.

    ``boxes`` columns: doc_col, page_col, box_id, x0, y0, x1, y1 —
    integer milli-units, x0 < x1. ``min_gap`` is the narrowest
    whitespace channel accepted as a column separator (e3 units).
    """
    keys = [doc_col, page_col]
    wx = W.partitionBy(*keys).orderBy("x0", "x1", "box_id")
    prev_max = F.max("x1").over(wx.rowsBetween(W.unboundedPreceding, -1))
    g = boxes.withColumn(
        "_gap",
        F.when(
            prev_max.isNotNull() & (F.col("x0") > prev_max),
            F.col("x0") - prev_max,
        ).otherwise(F.lit(0)),
    ).withColumn("_split_x2", F.col("x0") + prev_max)
    wg = W.partitionBy(*keys).orderBy(F.desc("_gap"), "x0", "box_id")
    best = (
        g.withColumn("_rn", F.row_number().over(wg))
        .where((F.col("_rn") == 1) & (F.col("_gap") >= min_gap))
        .select(*keys, F.col("_split_x2").alias("_cut_x2"))
    )
    cut = g.drop("_gap", "_split_x2").join(best, keys, "left")
    col: Column = F.when(
        F.col("_cut_x2").isNotNull() & (F.col("x0") * 2 >= F.col("_cut_x2")),
        F.lit(1),
    ).otherwise(F.lit(0))
    wr = W.partitionBy(*keys).orderBy(col, F.col("y0"), F.col("x0"), F.col("box_id"))
    return cut.select(
        *keys,
        "box_id",
        col.cast("int").alias("col"),
        F.row_number().over(wr).cast("int").alias("rank"),
    )


def _attach_best_cut(
    g: DataFrame, part: list, axis: str, min_gap: int
) -> DataFrame:
    """Attach each region's widest whitespace channel on one axis as
    columns ``_{axis}best`` / ``_{axis}cut2`` (both NULL when the best
    channel is narrower than ``min_gap``).

    ``axis`` is 'x' or 'y'. Join-free: the scan pass (order by the
    axis' low edge; a channel before box b is ``lo(b) − max_prev_hi``
    when positive — whitespace the region's full extent crosses) and
    the winner pick are BOTH windows over the same partitioning, so
    the winner is an argmax ``max(struct(gap, −lo, −box_id, split2))``
    over the region — the pinned (gap DESC, lo ASC, box_id ASC)
    tiebreak as struct order — and each level costs one exchange
    instead of two window shuffles plus a join-back. The split point
    is carried doubled (division-free)."""
    lo, hi = (f"{axis}0", f"{axis}1")
    wx = W.partitionBy(*part).orderBy(lo, hi, "box_id")
    prev_max = F.max(hi).over(wx.rowsBetween(W.unboundedPreceding, -1))
    g = g.withColumn(
        "_gap",
        F.when(
            prev_max.isNotNull() & (F.col(lo) > prev_max),
            F.col(lo) - prev_max,
        ).otherwise(F.lit(0)),
    ).withColumn("_split2", F.col(lo) + prev_max)
    wr = W.partitionBy(*part).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    # box_id is unique per page, so struct order never reaches _split2
    # (whose NULL on the scan's first row must not take part in ties)
    best = F.max(
        F.struct(
            F.col("_gap").alias("g"),
            (-F.col(lo)).alias("_nl"),
            (-F.col("box_id")).alias("_nb"),
            F.col("_split2").alias("sp"),
        )
    ).over(wr)
    keep = best.getField("g") >= F.lit(min_gap)
    return (
        g.withColumn(f"_{axis}best", F.when(keep, best.getField("g")))
        .withColumn(f"_{axis}cut2", F.when(keep, best.getField("sp")))
        .drop("_gap", "_split2")
    )


def reading_order_xy(
    boxes: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
    min_gap: int = 80,
    depth: int = 3,
) -> DataFrame:
    """Recursive XY-cut reading order (Nagy et al.), ``depth`` levels.

    :func:`reading_order` performs the first level only and on one axis
    only, which single-cut two-column pages need — but a full-width
    title band above two columns defeats it (the band's x-extent
    destroys every full-height vertical channel), and a three-column
    page needs a second cut. This is the classic recursion, unrolled a
    fixed ``depth`` so it stays a static DataFrame plan: at each level,
    WITHIN each current region, find the widest whitespace channel on
    each axis; if the best is ≥ ``min_gap``, cut there — the wider axis
    wins, HORIZONTAL preferred on exact ties (pinned; top-to-bottom
    bands are read before columns). Boxes take side 0 (top/left) or 1
    (bottom/right) of their region's cut; uncut regions keep side 0.
    Reading order = row_number over (side₁ … side_d, y0, x0, box_id):
    lexicographic region paths ARE the recursion's visit order, because
    side 0 reads before side 1 on both axes.

    ``boxes`` columns: doc_col, page_col, box_id, x0, y0, x1, y1 —
    integers, lo < hi; box_id unique per page. Scale shape: per level,
    two scan windows and two argmax windows, ALL partitioned by (doc,
    page, sides-so-far) and join-free — one exchange per level, so the
    whole plan is exactly depth + 1 shuffles (a static function of the
    ``depth`` literal, never of the data; the final rank window adds
    the + 1), each keyed by the page, never corpus-wide. depth is a
    small constant (3 handles title-over-columns and four-column
    spreads)."""
    if min_gap < 1:
        raise ValueError(f"min_gap must be >= 1, got {min_gap}")
    keys = [doc_col, page_col]
    cur = boxes
    sides: list[str] = []
    for lvl in range(depth):
        part = keys + sides
        cur = _attach_best_cut(cur, part, "x", min_gap)
        cur = _attach_best_cut(cur, part, "y", min_gap)
        use_h = F.col("_ybest").isNotNull() & (
            F.col("_xbest").isNull() | (F.col("_ybest") >= F.col("_xbest"))
        )
        side = (
            F.when(use_h, (F.col("y0") * 2 >= F.col("_ycut2")).cast("int"))
            .when(
                F.col("_xbest").isNotNull(),
                (F.col("x0") * 2 >= F.col("_xcut2")).cast("int"),
            )
            .otherwise(F.lit(0))
        )
        s = f"_s{lvl}"
        cur = cur.withColumn(s, side).drop(
            "_xcut2", "_xbest", "_ycut2", "_ybest"
        )
        sides.append(s)
    wr = W.partitionBy(*keys).orderBy(
        *sides, F.col("y0"), F.col("x0"), F.col("box_id")
    )
    return cur.select(
        *keys,
        "box_id",
        F.concat_ws("", *sides).alias("region"),
        F.row_number().over(wr).cast("int").alias("rank"),
    )


def strip_page_chrome(
    pages: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
    text_col: str = "text",
    edge_k: int = 1,
    min_pages: int = 2,
    min_frac_e6: int = 500_000,
) -> DataFrame:
    """Drop repeated header/footer lines from per-page text — the
    cross-page-repetition chrome detector the north-star "layout parse +
    boilerplate strip" stage needs AFTER reading order (reference analog:
    ocr_search OCRs each rendered page independently and keeps whatever
    Tesseract returns, page furniture included — src/sh/*.sh; this is the
    corpus-statistics fix a regex list can't express).

    A line is chrome iff ALL of:

      1. it sits in an EDGE position of its page — the first ``edge_k``
         or last ``edge_k`` lines (0-based positions ``pos < edge_k`` or
         ``pos >= n_lines - edge_k``);
      2. its normal form — ``lower(trim(line))`` with every digit run
         collapsed to ``#`` (so "Page 3 of 10" == "Page 7 of 10") — is
         non-empty;
      3. that normal form occupies an edge position on at least
         ``min_pages`` distinct pages of the SAME doc, and on at least
         ``min_frac_e6``/1e6 of the doc's pages (exact integer test:
         ``n_hit * 1e6 >= min_frac_e6 * n_pages`` — no float ratio).

    Kept lines are reassembled in original order (E6 discipline:
    array_sort over (pos, line) structs, positions unique per page).
    Pages whose every line is chrome stay in the output with text "".

    Returns (doc, page, text, n_dropped int).

    Scale shape: one explode, then every shuffle is keyed by the doc
    (groupBy (doc, norm), join back on (doc, norm), groupBy (doc,
    page)) — per-key cardinality is bounded by pages-per-doc × edge_k,
    never corpus-wide; at 10^12 docs nothing aggregates across docs.
    """
    d, p = F.col(doc_col), F.col(page_col)
    lines = pages.select(
        d.alias("_doc"),
        p.alias("_page"),
        F.split(F.col(text_col), "\n").alias("_lines"),
    ).select(
        "_doc",
        "_page",
        F.size("_lines").alias("_n_lines"),
        F.posexplode("_lines").alias("_pos", "_line"),
    )
    norm = F.regexp_replace(F.lower(F.trim(F.col("_line"))), "[0-9]+", "#")
    edge = (F.col("_pos") < F.lit(edge_k)) | (
        F.col("_pos") >= F.col("_n_lines") - F.lit(edge_k)
    )
    lines = lines.withColumn("_norm", norm).withColumn("_edge", edge)

    hits = (
        lines.where(F.col("_edge") & (F.col("_norm") != ""))
        .groupBy("_doc", "_norm")
        .agg(F.count_distinct("_page").alias("_n_hit"))
    )
    n_pages = pages.groupBy(d.alias("_doc")).agg(
        F.count_distinct(p).alias("_n_pages")
    )
    j = (
        lines.join(hits, ["_doc", "_norm"], "left")
        .join(n_pages, ["_doc"])
        .withColumn(
            # coalesce: a line whose norm never hits (left-join miss,
            # _n_hit NULL) must be KEPT, not null-propagated into the
            # when() below and silently dropped from the reassembly
            "_chrome",
            F.coalesce(
                F.col("_edge")
                & (F.col("_norm") != "")
                & (F.col("_n_hit") >= F.lit(min_pages))
                & (
                    F.col("_n_hit") * F.lit(1_000_000)
                    >= F.lit(min_frac_e6) * F.col("_n_pages")
                ),
                F.lit(False),
            ),
        )
    )
    kept = F.when(~F.col("_chrome"), F.struct("_pos", "_line"))
    return (
        j.groupBy("_doc", "_page")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["_line"]
                ),
                "\n",
            ).alias(text_col),
            F.sum(F.col("_chrome").cast("int")).cast("int").alias("n_dropped"),
        )
        .select(
            F.col("_doc").alias(doc_col),
            F.col("_page").alias(page_col),
            text_col,
            "n_dropped",
        )
    )


def table_structure(
    boxes: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
    row_gap: int = 1,
    col_gap: int = 100,
) -> DataFrame:
    """Stream-mode table detection: assign every word box a (row, col)
    cell coordinate by 1-D whitespace segmentation on each axis — the
    lattice-free table recovery used by pdfplumber/Camelot "stream"
    mode, and the natural next stage after :func:`reading_order` for
    the north rule's "PDF/PPTX layout parsing" (the reference renders
    pages to images whose OCR yields positioned words with no cell
    structure — src/sh/convert_*.sh → PdfUtil.class.js:146).

    Axis segmentation is the same pinned primitive as reading_order's
    column cut, applied cumulatively instead of best-gap-only:

    * order boxes by (y0, y1, box_id); a new ROW starts where
      ``y0 − max(previous y1) ≥ row_gap`` (a horizontal whitespace band
      the whole page width crosses — every earlier box ends above it);
      row id = running count of such breaks;
    * independently order by (x0, x1, box_id); a new COLUMN segment
      starts where ``x0 − max(previous x1) ≥ col_gap``; intra-cell word
      gaps stay below ``col_gap``, inter-column gutters exceed it, so
      the column id is shared by every row — which is what makes the
      output a grid rather than per-row runs.

    Integer milli-unit arithmetic, two window passes over one
    (doc, page) shuffle — a DuckDB oracle replays it bit-for-bit.
    Scale shape: both windows partition by (doc, page) (thousands of
    boxes), never corpus-wide; at 10^12 docs this is one page-keyed
    shuffle then narrow.

    Returns (doc_col, page_col, box_id, row, col), ints, one row per
    input box.
    """
    return _grid(boxes, [doc_col, page_col], row_gap, col_gap, keep=())


def _grid(
    boxes: DataFrame,
    keys: list[str],
    row_gap: int,
    col_gap: int,
    keep: tuple[str, ...],
) -> DataFrame:
    """Shared grid pass: (keys, box_id, row, col) + any ``keep`` columns
    carried through so downstream consumers (table_cells) need no join
    back to the boxes — the whole computation stays inside the single
    (doc, page) shuffle."""
    wy = W.partitionBy(*keys).orderBy("y0", "y1", "box_id")
    prev_y1 = F.max("y1").over(wy.rowsBetween(W.unboundedPreceding, -1))
    wx = W.partitionBy(*keys).orderBy("x0", "x1", "box_id")
    prev_x1 = F.max("x1").over(wx.rowsBetween(W.unboundedPreceding, -1))
    flagged = boxes.select(
        *keys,
        "box_id",
        F.when(
            prev_y1.isNotNull() & (F.col("y0") - prev_y1 >= row_gap), 1
        ).otherwise(0).alias("_rb"),
        F.when(
            prev_x1.isNotNull() & (F.col("x0") - prev_x1 >= col_gap), 1
        ).otherwise(0).alias("_cb"),
        "y0", "y1", "x0", "x1",
        *keep,
    )
    row_id = F.sum("_rb").over(
        W.partitionBy(*keys).orderBy("y0", "y1", "box_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    col_id = F.sum("_cb").over(
        W.partitionBy(*keys).orderBy("x0", "x1", "box_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    extra = ["y0", "y1", "x0", "x1", *keep] if keep else []
    return flagged.select(
        *keys,
        "box_id",
        row_id.cast("int").alias("row"),
        col_id.cast("int").alias("col"),
        *extra,
    )


def table_cells(
    boxes: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
    text_col: str = "text",
    row_gap: int = 1,
    col_gap: int = 100,
) -> DataFrame:
    """Cell-level table extraction: :func:`table_structure` grid + text
    reassembly per cell. ``boxes`` needs the geometry columns plus
    ``text_col``. Cell text concatenates the cell's words in (x0,
    box_id) order — pinned via ``array_sort`` over collected structs,
    so the aggregate is deterministic at any parallelism (the E6
    order-preserving reassembly discipline, extract.py:243).

    Returns (doc, page, row, col, text, x0, y0, x1, y1) — one row per
    cell with its bounding box. Group cardinality = words per cell, so
    the collect_list is bounded and page-local.

    Plan shape: ONE exchange total. The grid pass carries ``text_col``
    through its windows (no join back to the boxes), and the final
    groupBy's keys extend the window partition keys, so the page-hash
    partitioning is reused and the aggregate adds no shuffle.
    """
    keys = [doc_col, page_col]
    j = _grid(boxes, keys, row_gap, col_gap, keep=(text_col,))
    words = F.array_sort(
        F.collect_list(F.struct(F.col("x0"), F.col("box_id"), F.col(text_col)))
    )
    return j.groupBy(*keys, "row", "col").agg(
        F.array_join(
            F.transform(words, lambda s: s[text_col]), " "
        ).alias("text"),
        F.min("x0").alias("x0"),
        F.min("y0").alias("y0"),
        F.max("x1").alias("x1"),
        F.max("y1").alias("y1"),
    )


def table_markdown(
    cells: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
) -> DataFrame:
    """Render :func:`table_cells` output as a GitHub-style pipe table
    per (doc, page) — the table-to-text form a training pipeline feeds
    an LM (structure preserved, layout discarded). Missing cells render
    empty; rows and columns keep their grid order (pinned array_sort
    reassembly at both levels — same E6 discipline as the cell text).

    Returns (doc, page, n_rows, n_cols, markdown).

    Scale shape: two (doc, page)-keyed aggs (row assembly, then table
    assembly); per-key cardinality = the table's cell count. The column
    count is taken per table (max col + 1) so ragged tables pad, not
    truncate.
    """
    keys = [doc_col, page_col]
    n_cols = F.max("col").over(W.partitionBy(*keys)) + 1
    # '|' inside cell text would corrupt the pipe-table structure for
    # downstream parsers — escape it the markdown way
    esc = F.replace(F.col("text"), F.lit("|"), F.lit("\\|"))
    c = cells.withColumn("_nc", n_cols).withColumn("_esc", esc)
    row_line = (
        c.groupBy(*keys, "row", "_nc")
        .agg(
            # one map per row, materialized once (col ids are unique per
            # (doc, page, row) by table_structure's construction)
            F.map_from_entries(
                F.collect_list(F.struct(F.col("col"), F.col("_esc")))
            ).alias("_bycol")
        )
        .withColumn(
            # dense render over 0.._nc-1: absent cells become ""
            "_line",
            F.concat(
                F.lit("| "),
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0), F.col("_nc") - 1),
                        lambda i: F.coalesce(
                            F.element_at(F.col("_bycol"), i), F.lit("")
                        ),
                    ),
                    " | ",
                ),
                F.lit(" |"),
            ),
        )
    )
    return (
        row_line.groupBy(*keys)
        .agg(
            (F.max("row") + 1).cast("int").alias("n_rows"),
            F.max("_nc").cast("int").alias("n_cols"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("row", "_line"))),
                    lambda s: s["_line"],
                ),
                chr(10),
            ).alias("markdown"),
        )
    )


def figure_captions(
    blocks: DataFrame,
    doc_col: str = "doc_id",
    page_col: str = "page",
) -> DataFrame:
    """Associate every caption block with one figure on its page — the
    figure/caption pairing stage of layout parsing (PDFFigures2-style
    proximity heuristic; the reference's page-render chain stops at
    whole-page OCR, so this stage exists only here).

    ``blocks`` columns: doc_col, page_col, block_id, kind, x0, y0, x1,
    y1 — integer milli-units, kind ∈ {'figure', 'caption', …} (other
    kinds are ignored). Matching rule, fully pinned:

    * candidate set = figures on the SAME (doc, page);
    * gap = L1 whitespace between the two rectangles
      (``max(0, x-gap) + max(0, y-gap)``; 0 when they touch/overlap);
    * a figure wholly ABOVE the caption (``fig.y1 <= cap.y0``) beats
      any non-above figure regardless of gap (print convention:
      captions sit under their figures);
    * remaining ties: smaller gap, then smaller figure block_id.

    Returns (doc, page, caption_id, figure_id, gap, above). Captions on
    figure-less pages are dropped (inner join semantics — the caller
    can anti-join to find orphans).

    Scale shape: the join is keyed on (doc, page) — one shuffle; the
    fanout per caption is the page's figure count (single digits in
    real layouts), then a per-caption window picks rank 1. Nothing is
    corpus-wide.
    """
    keys = [doc_col, page_col]
    figs = blocks.where(F.col("kind") == "figure").select(
        *keys,
        F.col("block_id").alias("figure_id"),
        F.col("x0").alias("fx0"),
        F.col("y0").alias("fy0"),
        F.col("x1").alias("fx1"),
        F.col("y1").alias("fy1"),
    )
    caps = blocks.where(F.col("kind") == "caption").select(
        *keys,
        F.col("block_id").alias("caption_id"),
        F.col("x0").alias("cx0"),
        F.col("y0").alias("cy0"),
        F.col("x1").alias("cx1"),
        F.col("y1").alias("cy1"),
    )
    j = caps.join(figs, keys)
    dx = F.greatest(
        F.lit(0),
        F.greatest(F.col("fx0"), F.col("cx0"))
        - F.least(F.col("fx1"), F.col("cx1")),
    )
    dy = F.greatest(
        F.lit(0),
        F.greatest(F.col("fy0"), F.col("cy0"))
        - F.least(F.col("fy1"), F.col("cy1")),
    )
    scored = j.withColumn("gap", (dx + dy).cast("long")).withColumn(
        "above", F.col("fy1") <= F.col("cy0")
    )
    wr = W.partitionBy(*keys, "caption_id").orderBy(
        F.col("above").desc(), F.col("gap"), F.col("figure_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") == 1)
        .select(*keys, "caption_id", "figure_id", "gap", "above")
    )
