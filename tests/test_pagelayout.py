"""Reading-order layout analysis (operators/pagelayout.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

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


# ------------------------------------------------------------ tables


def _grid_boxes(spark, n_rows=3, n_cols=3, words=2, jitter=None):
    """Deterministic table grid: cell (r, c) holds `words` word boxes.
    Intra-cell word gap ~30 (< col_gap), inter-column gutter ~230
    (>= col_gap), row gap 40 (>= row_gap)."""
    rows = []
    for r in range(n_rows):
        for c in range(n_cols):
            for k in range(words):
                bid = r * 100 + c * 10 + k
                jx = jitter(bid) if jitter else 0
                x0 = 100 + c * 500 + k * 150 + jx
                y0 = 100 + r * 80 + (jitter(bid + 7) if jitter else 0)
                rows.append(("d1", 1, bid, x0, y0, x0 + 120, y0 + 40,
                             f"w{r}{c}{k}"))
    return spark.createDataFrame(
        rows,
        "doc_id string, page int, box_id int, x0 long, y0 long, "
        "x1 long, y1 long, text string",
    )


def test_table_structure_recovers_grid(spark):
    from ocr_search_spark.operators.pagelayout import table_structure

    df = _grid_boxes(spark, jitter=lambda b: (b * 37) % 10)
    got = {r["box_id"]: (r["row"], r["col"]) for r in table_structure(df).collect()}
    for r in range(3):
        for c in range(3):
            for k in range(2):
                assert got[r * 100 + c * 10 + k] == (r, c)


def test_table_structure_column_shared_across_rows(spark):
    from ocr_search_spark.operators.pagelayout import table_structure

    # a sparse table: row 1 has no entry in column 1 — column ids must
    # still be globally consistent because segmentation is page-global
    df = _grid_boxes(spark, n_rows=2, n_cols=3)
    df = df.where("box_id < 110 or box_id >= 120")
    got = {r["box_id"]: (r["row"], r["col"]) for r in table_structure(df).collect()}
    assert got[120] == (1, 2)  # NOT (1, 1): col 1's gutter still counted
    assert got[10] == (0, 1)


def test_table_structure_single_cell_and_gap_thresholds(spark):
    from ocr_search_spark.operators.pagelayout import table_structure

    df = _grid_boxes(spark, n_rows=1, n_cols=1, words=3)
    got = table_structure(df).collect()
    assert {(r["row"], r["col"]) for r in got} == {(0, 0)}
    # with col_gap below the word gap every word becomes its own column
    got2 = table_structure(df, col_gap=10).collect()
    assert {(r["row"], r["col"]) for r in got2} == {(0, 0), (0, 1), (0, 2)}


def test_table_cells_text_order_and_bbox(spark):
    from ocr_search_spark.operators.pagelayout import table_cells

    df = _grid_boxes(spark, jitter=lambda b: (b * 13) % 10)
    cells = {(r["row"], r["col"]): r for r in table_cells(df).collect()}
    assert len(cells) == 9
    for r in range(3):
        for c in range(3):
            cell = cells[(r, c)]
            assert cell["text"] == f"w{r}{c}0 w{r}{c}1"
            assert cell["x0"] <= cell["x1"] and cell["y0"] <= cell["y1"]


def test_table_structure_partition_invariance(spark):
    from ocr_search_spark.operators.pagelayout import table_structure

    df = _grid_boxes(spark, jitter=lambda b: (b * 7) % 10)
    a = sorted(map(tuple, table_structure(df.coalesce(1)).collect()))
    b = sorted(map(tuple, table_structure(df.repartition(7)).collect()))
    assert a == b


def test_table_markdown_render_and_ragged_padding(spark):
    from ocr_search_spark.operators.pagelayout import table_cells, table_markdown

    df = _grid_boxes(spark, n_rows=2, n_cols=3)
    df = df.where("box_id < 110 or box_id >= 120")  # row 1 missing col 1
    md = table_markdown(table_cells(df)).collect()[0]
    assert (md["n_rows"], md["n_cols"]) == (2, 3)
    lines = md["markdown"].split("\n")
    assert lines[0] == "| w000 w001 | w010 w011 | w020 w021 |"
    assert lines[1] == "| w100 w101 |  | w120 w121 |"  # dense empty cell
    # pipe characters in cell text are escaped, preserving the structure
    piped = df.withColumn(
        "text", F.when(F.col("box_id") == 0, F.lit("a|b")).otherwise(F.col("text"))
    )
    md2 = table_markdown(table_cells(piped)).collect()[0]
    row0 = md2["markdown"].split("\n")[0]
    assert row0.startswith("| a\\|b w001 | ")
    assert all(len(ln.split(" | ")) == 3 for ln in md2["markdown"].split("\n"))


# ---------------------------------------------------- figure_captions


def _blocks(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id long, page int, block_id int, kind string, "
        "x0 long, y0 long, x1 long, y1 long",
    )


def test_caption_pairs_with_figure_directly_above(spark):
    from ocr_search_spark.operators.pagelayout import figure_captions

    rows = [
        (1, 1, 0, "figure", 100, 100, 400, 350),
        (1, 1, 1, "figure", 600, 100, 900, 350),
        (1, 1, 10, "caption", 120, 360, 380, 390),   # under figure 0
        (1, 1, 11, "caption", 620, 360, 880, 390),   # under figure 1
        (1, 1, 20, "text", 100, 400, 900, 700),      # must be ignored
    ]
    out = {r["caption_id"]: r for r in figure_captions(_blocks(spark, rows)).collect()}
    assert out[10]["figure_id"] == 0 and out[10]["above"] and out[10]["gap"] == 10
    assert out[11]["figure_id"] == 1 and out[11]["above"] and out[11]["gap"] == 10


def test_above_figure_beats_closer_side_figure(spark):
    from ocr_search_spark.operators.pagelayout import figure_captions

    # fig 0 is ABOVE the caption with a big 300 gap; fig 1 sits right
    # next to it (gap 20) but not above — print convention wins
    rows = [
        (2, 1, 0, "figure", 100, 100, 400, 300),
        (2, 1, 1, "figure", 600, 600, 900, 800),
        (2, 1, 10, "caption", 120, 600, 380, 640),
    ]
    (r,) = figure_captions(_blocks(spark, rows)).collect()
    assert r["figure_id"] == 0 and r["above"]


def test_tie_broken_by_gap_then_figure_id(spark):
    from ocr_search_spark.operators.pagelayout import figure_captions

    # both figures above and x-overlapping; equal gaps -> smaller id
    rows = [
        (3, 1, 0, "figure", 100, 100, 400, 350),
        (3, 1, 1, "figure", 600, 100, 900, 350),
        (3, 1, 12, "caption", 300, 700, 700, 750),
    ]
    (r,) = figure_captions(_blocks(spark, rows)).collect()
    assert r["figure_id"] == 0 and r["gap"] == 350
    # now figure 1 is nearer vertically -> gap decides
    rows[1] = (3, 1, 1, "figure", 600, 150, 900, 400)
    (r,) = figure_captions(_blocks(spark, rows)).collect()
    assert r["figure_id"] == 1 and r["gap"] == 300


def test_figureless_page_drops_caption_and_pages_do_not_mix(spark):
    from ocr_search_spark.operators.pagelayout import figure_captions

    rows = [
        (4, 1, 0, "figure", 100, 100, 400, 350),
        (4, 2, 10, "caption", 120, 360, 380, 390),  # page 2: no figure
    ]
    assert figure_captions(_blocks(spark, rows)).count() == 0


def _xy_ranks(df, **kw):
    from ocr_search_spark.operators.pagelayout import reading_order_xy

    out = reading_order_xy(df, **kw).collect()
    return [r["box_id"] for r in sorted(out, key=lambda r: r["rank"])]


def test_xycut_title_band_over_two_columns(spark):
    # full-width title destroys every vertical channel; the recursive
    # cut goes horizontal first (wider gap), then vertical inside the
    # body — title, left column, right column. The single-cut
    # reading_order provably cannot do this (no column detected).
    rows = [
        (1, 0, 0, 0, 0, 500, 12),      # title spans both columns
        (1, 0, 1, 0, 100, 180, 112),   # left r0
        (1, 0, 2, 300, 100, 480, 112), # right r0
        (1, 0, 3, 0, 120, 180, 132),   # left r1
        (1, 0, 4, 300, 120, 480, 132), # right r1
    ]
    df = _boxes(spark, rows)
    assert _xy_ranks(df, min_gap=50, depth=3) == [0, 1, 3, 2, 4]
    single = reading_order(df, min_gap=50).collect()
    assert [r["box_id"] for r in sorted(single, key=lambda r: r["rank"])] == [
        0, 1, 2, 3, 4,
    ]  # interleaved = wrong — documents why reading_order_xy exists


def test_xycut_three_columns_column_major(spark):
    rows = [
        (1, 0, r * 3 + c, c * 200, r * 20, c * 200 + 150, r * 20 + 12)
        for r in range(2)
        for c in range(3)
    ]
    assert _xy_ranks(_boxes(spark, rows), min_gap=30, depth=3) == [
        0, 3, 1, 4, 2, 5,
    ]


def test_xycut_wider_gap_wins_and_tie_prefers_horizontal(spark):
    # vertical channel 40 wide, horizontal channel 60 wide → horizontal
    # cut first: top band fully before bottom band
    rows = [
        (1, 0, 0, 0, 0, 100, 10),
        (1, 0, 1, 140, 0, 240, 10),
        (1, 0, 2, 0, 70, 100, 80),
        (1, 0, 3, 140, 70, 240, 80),
    ]
    assert _xy_ranks(_boxes(spark, rows), min_gap=30, depth=1) == [0, 1, 2, 3]
    # exact tie (both 40): horizontal pinned
    rows_tie = [
        (1, 0, 0, 0, 0, 100, 10),
        (1, 0, 1, 140, 0, 240, 10),
        (1, 0, 2, 0, 50, 100, 60),
        (1, 0, 3, 140, 50, 240, 60),
    ]
    assert _xy_ranks(_boxes(spark, rows_tie), min_gap=30, depth=1) == [0, 1, 2, 3]


def test_xycut_no_gap_falls_back_to_scan_order(spark):
    rows = [
        (1, 0, 0, 0, 0, 100, 10),
        (1, 0, 1, 105, 0, 200, 10),
        (1, 0, 2, 0, 14, 100, 24),
    ]
    assert _xy_ranks(_boxes(spark, rows), min_gap=50, depth=3) == [0, 1, 2]


def test_xycut_random_pages_vs_python_replica(spark):
    """Randomized pin of the join-free argmax restructure: a pure-Python
    replica of the pinned recursion (per region: widest whitespace
    channel per axis via the scan rule, gap DESC / lo ASC / box_id ASC
    winner, horizontal preferred on exact ties, depth levels, final
    (sides…, y0, x0, box_id) order) must agree with the Spark plan on
    random multi-page box sets — one Spark job for all pages."""
    import random

    from ocr_search_spark.operators.pagelayout import reading_order_xy

    MIN_GAP, DEPTH = 30, 3

    def best_cut(boxes, axis):
        lo_i, hi_i = (3, 5) if axis == "x" else (4, 6)
        srt = sorted(boxes, key=lambda b: (b[lo_i], b[hi_i], b[2]))
        prev_max = None
        cands = []  # (gap, lo, box_id, split2)
        for b in srt:
            gap = (
                b[lo_i] - prev_max
                if prev_max is not None and b[lo_i] > prev_max
                else 0
            )
            cands.append((gap, b[lo_i], b[2],
                          b[lo_i] + prev_max if prev_max is not None else None))
            prev_max = b[hi_i] if prev_max is None else max(prev_max, b[hi_i])
        g, lo, bid, sp = max(cands, key=lambda c: (c[0], -c[1], -c[2]))
        return (g, sp) if g >= MIN_GAP else (None, None)

    def replica(boxes):
        sides = {b[2]: [] for b in boxes}
        regions = [list(boxes)]
        for _ in range(DEPTH):
            nxt = []
            for reg in regions:
                xb, xc = best_cut(reg, "x")
                yb, yc = best_cut(reg, "y")
                use_h = yb is not None and (xb is None or yb >= xb)
                s0, s1 = [], []
                for b in reg:
                    if use_h:
                        side = int(b[4] * 2 >= yc)
                    elif xb is not None:
                        side = int(b[3] * 2 >= xc)
                    else:
                        side = 0
                    sides[b[2]].append(side)
                    (s1 if side else s0).append(b)
                nxt += [r for r in (s0, s1) if r]
            regions = nxt
        order = sorted(boxes, key=lambda b: (*sides[b[2]], b[4], b[3], b[2]))
        return [b[2] for b in order]

    rng = random.Random(99)
    rows, want = [], {}
    for page in range(30):
        boxes = []
        for bid in range(rng.randint(1, 12)):
            x0 = rng.randrange(0, 900, 10)
            y0 = rng.randrange(0, 900, 10)
            boxes.append((7, page, bid, x0, y0,
                          x0 + rng.randrange(10, 260, 10),
                          y0 + rng.randrange(10, 60, 10)))
        rows += boxes
        want[page] = replica(boxes)
    df = _boxes(spark, rows)
    out = reading_order_xy(df, min_gap=MIN_GAP, depth=DEPTH).collect()
    got = {}
    for r in sorted(out, key=lambda r: (r["page"], r["rank"])):
        got.setdefault(r["page"], []).append(r["box_id"])
    assert got == want
