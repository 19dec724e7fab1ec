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

__all__ = ["reading_order"]


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
