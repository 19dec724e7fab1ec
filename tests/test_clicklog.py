"""COEC click model: hand-computed priors/expectations and the
self-normalization property."""

from __future__ import annotations

from ocr_search_spark.operators.clicklog import coec, position_priors


def test_coec_hand_case(spark):
    # pos 1: 4 imps 2 clicks (ctr 0.5); pos 2: 4 imps 1 click (0.25)
    rows = [
        ("a", 1, 1), ("a", 1, 1), ("b", 1, 0), ("b", 1, 0),
        ("a", 2, 1), ("a", 2, 0), ("b", 2, 0), ("b", 2, 0),
    ]
    df = spark.createDataFrame(rows, "doc string, pos int, clicked int")
    pri = {r["pos"]: (r["n_imp"], r["n_click"], r["ctr_e6"])
           for r in position_priors(df).collect()}
    assert pri == {1: (4, 2, 500000), 2: (4, 1, 250000)}
    got = {r["doc"]: r for r in coec(df).collect()}
    # a: expected = 2*2e6//4 + 2*1e6//4 = 1_500_000; clicks 3 -> coec 2.0
    assert got["a"]["expected_e6"] == 1_500_000
    assert got["a"]["coec_e6"] == 2_000_000
    # b: same expected, 0 clicks -> coec 0
    assert got["b"]["expected_e6"] == 1_500_000
    assert got["b"]["coec_e6"] == 0


def test_coec_average_doc_is_one(spark):
    """A doc whose per-position click behavior equals the global prior
    gets COEC exactly 1e6; zero-expectation docs get NULL."""
    rows = []
    for d in ("x", "y"):  # identical behavior at every position
        for p in (1, 2, 3):
            rows += [(d, p, 1), (d, p, 0)]
    rows.append(("ghost", 9, 0))  # position 9 never clicked
    df = spark.createDataFrame(rows, "doc string, pos int, clicked int")
    got = {r["doc"]: r["coec_e6"] for r in coec(df).collect()}
    assert got["x"] == 1_000_000 and got["y"] == 1_000_000
    assert got["ghost"] is None
