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


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, page int, text string")


def test_chrome_repeated_header_footer_dropped(spark):
    from ocr_search_spark.operators.pagelayout import strip_page_chrome

    pages = _pages(
        spark,
        [
            (1, 1, "ACME Corp\nbody one\nPage 1 of 3"),
            (1, 2, "ACME Corp\nbody two\nPage 2 of 3"),
            (1, 3, "ACME Corp\nbody three\nPage 3 of 3"),
        ],
    )
    out = {r["page"]: r for r in strip_page_chrome(pages).collect()}
    assert out[1]["text"] == "body one" and out[1]["n_dropped"] == 2
    assert out[3]["text"] == "body three"  # digit runs normalized to '#'


def test_chrome_one_off_header_kept(spark):
    from ocr_search_spark.operators.pagelayout import strip_page_chrome

    pages = _pages(
        spark,
        [
            (2, 1, "Chapter Intro\nalpha\nbeta"),
            (2, 2, "something else\ngamma\ndelta"),
            (2, 3, "another start\nepsilon\nzeta"),
        ],
    )
    out = {r["page"]: r for r in strip_page_chrome(pages).collect()}
    assert out[1]["text"] == "Chapter Intro\nalpha\nbeta"
    assert all(r["n_dropped"] == 0 for r in out.values())


def test_chrome_body_repetition_not_dropped(spark):
    from ocr_search_spark.operators.pagelayout import strip_page_chrome

    # 'refrain' repeats on every page but in a MIDDLE position
    pages = _pages(
        spark,
        [
            (3, 1, "h one\nrefrain\nt one"),
            (3, 2, "h two\nrefrain\nt two"),
        ],
    )
    out = {r["page"]: r for r in strip_page_chrome(pages).collect()}
    assert "refrain" in out[1]["text"] and "refrain" in out[2]["text"]


def test_chrome_blank_lines_and_all_chrome_page(spark):
    from ocr_search_spark.operators.pagelayout import strip_page_chrome

    # blank edge lines never count as chrome; a page that is ONLY
    # chrome survives as an empty-text row
    pages = _pages(
        spark,
        [
            (4, 1, "FOOTER\n\nbody\nFOOTER"),
            (4, 2, "FOOTER\n\nmore\nFOOTER"),
            (5, 1, "SAME\nSAME"),
            (5, 2, "SAME\nSAME"),
        ],
    )
    out = {(r["doc_id"], r["page"]): r for r in strip_page_chrome(pages).collect()}
    assert out[(4, 1)]["text"] == "\nbody" and out[(4, 1)]["n_dropped"] == 2
    assert out[(5, 1)]["text"] == "" and out[(5, 1)]["n_dropped"] == 2


def test_chrome_min_frac_threshold(spark):
    from ocr_search_spark.operators.pagelayout import strip_page_chrome

    # header on 2 of 5 pages: min_pages=2 satisfied but 2/5 < 50%
    pages = _pages(
        spark,
        [(6, i, ("HDR\nbody %d" % i) if i <= 2 else ("x%d\nbody %d" % (i, i)))
         for i in range(1, 6)],
    )
    out = {r["page"]: r for r in strip_page_chrome(pages).collect()}
    assert out[1]["text"].startswith("HDR")
