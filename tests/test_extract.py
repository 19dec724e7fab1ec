"""Golden-fixture extraction tests — the authoritative invariant:
span-sequence equality (kind, text, media_ref, order) per doc_id
(BASELINE.json north_rule), for every extraction implementation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_search_spark.operators import extract


def _spans_of(df):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in df.select("doc_id", "spans").collect()
    }


def _expected(golden_extracted):
    return {
        d: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for d, spans in golden_extracted.items()
    }


@pytest.mark.parametrize("impl", ["columnar", "pandas", "arrow", "exploded", "combined"])
def test_extract_golden_equality(impl, corpus_df, golden_extracted):
    docs = corpus_df.select("doc_id", "spans")
    if impl == "columnar":
        out = extract.extract_spans_columnar(docs)
    elif impl == "pandas":
        out = extract.extract_spans_pandas(docs)
    elif impl == "arrow":
        out = extract.extract_spans_arrow(docs)
    elif impl == "exploded":
        out = extract.extract_spans_exploded(docs)
    else:
        out = extract.extract_spans(docs, impl="pandas", skew_threshold=64, num_partitions=8)
    got = _spans_of(out)
    exp = _expected(golden_extracted)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == exp[d], f"span mismatch for {d}"


def test_extract_handles_unordered_spans(spark, corpus_df, golden_extracted):
    """Input spans shuffled within each doc → output must still be in
    offset order (offset is the only order authority, SURVEY §7.2)."""
    docs = corpus_df.select(
        "doc_id",
        F.expr(
            "array_sort(spans, (a, b) -> "
            "CASE WHEN xxhash64(a.offset) < xxhash64(b.offset) THEN -1 ELSE 1 END)"
        ).alias("spans"),
    )
    impls = {
        "pandas": extract.extract_spans_pandas,
        "arrow": extract.extract_spans_arrow,
        "exploded": extract.extract_spans_exploded,
    }
    for impl, fn in impls.items():
        got = _spans_of(fn(docs))
        exp = _expected(golden_extracted)
        for d in exp:
            assert got[d] == exp[d], (impl, d)


def test_extract_error_column_contract(spark):
    """X2/X3: a degraded batch records its error instead of dropping rows.

    The extraction never raises for weird-but-typed input; nulls inside
    text spans are treated as empty strings."""
    rows = [
        ("d1", [{"kind": "text", "text": None, "media_ref": "", "offset": 0}]),
        ("d2", []),
    ]
    from ocr_search_spark.schemas import DOCUMENTS

    df = spark.createDataFrame(rows, DOCUMENTS)
    out = extract.extract_spans_pandas(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["d1"]["error"] is None
    assert by_id["d1"]["spans"][0]["text"] == ""
    assert by_id["d2"]["spans"] == []


def test_skew_tail_present(corpus_df):
    """The pinned corpus must actually contain mega-docs so the skew path
    is exercised, and the combined path must route them to the exploded
    branch (threshold 64)."""
    sizes = [r["n"] for r in corpus_df.select(F.size("spans").alias("n")).collect()]
    assert max(sizes) > 64, "no mega-doc in corpus — skew path untested"
    assert min(sizes) >= 2


def test_coalesce_spans_normalizes(spark):
    """Sort by offset, drop whitespace-only text spans, merge adjacent
    text runs, keep media as boundaries, renumber densely."""
    from ocr_search_spark.operators.extract import coalesce_spans

    rows = [
        (
            "d1",
            [
                ("text", "Hello world", "", 0),
                ("text", "again", "", 1),
                ("text", "  ", "", 2),
                ("media", "", "img/1", 3),
                ("text", "", "", 4),
                ("text", "TAIL", "", 5),
            ],
        ),
        # out-of-order input: sort must precede the fold
        ("d2", [("text", "solo", "", 2), ("media", "", "img/2", 0), ("media", "", "img/3", 1)]),
        # all spans dropped -> empty normalized array
        ("d3", [("text", "   ", "", 0)]),
    ]
    schema = (
        "doc_id string, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    out = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in coalesce_spans(spark.createDataFrame(rows, schema)).collect()
    }
    assert out["d1"] == [
        ("text", "Hello world again", "", 0),
        ("media", "", "img/1", 1),
        ("text", "TAIL", "", 2),
    ]
    assert out["d2"] == [
        ("media", "", "img/2", 0),
        ("media", "", "img/3", 1),
        ("text", "solo", "", 2),
    ]
    assert out["d3"] == []
