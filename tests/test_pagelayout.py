"""Reading-order layout analysis (operators/pagelayout.py)."""

from __future__ import annotations

from ocr_search_spark.operators.pagelayout import reading_order


def _boxes(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, page int, box_id int, x0 long, y0 long, x1 long, y1 long"
    )


def test_two_column_page_reads_left_then_right(spark):
    # left column: boxes 0,2 stacked; right column: boxes 1,3 stacked;
    # box 3 sits HIGHER than box 2 — y order alone would interleave them
    rows = [
        (1, 1, 0, 100, 100, 220, 140),
        (1, 1, 1, 600, 100, 720, 140),
        (1, 1, 2, 100, 400, 220, 440),
        (1, 1, 3, 600, 160, 720, 200),
    ]
    out = {r["box_id"]: r for r in reading_order(_boxes(spark, rows)).collect()}
    assert [out[i]["col"] for i in range(4)] == [0, 1, 0, 1]
    order = sorted(range(4), key=lambda i: out[i]["rank"])
    assert order == [0, 2, 1, 3]  # whole left column before any right box


def test_single_column_when_gap_below_threshold(spark):
    rows = [
        (2, 1, 0, 100, 100, 220, 140),
        (2, 1, 1, 250, 100, 370, 140),  # gap 30 < min_gap 80
        (2, 1, 2, 100, 200, 220, 240),
    ]
    out = {r["box_id"]: r for r in reading_order(_boxes(spark, rows)).collect()}
    assert all(out[i]["col"] == 0 for i in range(3))
    order = sorted(range(3), key=lambda i: out[i]["rank"])
    assert order == [0, 1, 2]  # pure (y, x) order


def test_pages_are_independent(spark):
    # page 1 two-column, page 2 one-column, same doc
    rows = [
        (3, 1, 0, 100, 100, 220, 140),
        (3, 1, 1, 600, 100, 720, 140),
        (3, 2, 0, 100, 100, 220, 140),
        (3, 2, 1, 250, 100, 370, 140),
    ]
    out = {
        (r["page"], r["box_id"]): r
        for r in reading_order(_boxes(spark, rows)).collect()
    }
    assert out[(1, 1)]["col"] == 1 and out[(2, 1)]["col"] == 0
