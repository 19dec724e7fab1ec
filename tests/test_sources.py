"""Multi-format source round-trips: parquet/json/csv all yield the same
DOCUMENTS shape, extraction output is identical regardless of source
format, and malformed CSV span JSON degrades to null spans (recorded,
not crashed)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_search_spark import sources
from ocr_search_spark.operators.extract import extract_spans_columnar


def _flat(df):
    return df.select("doc_id", F.posexplode("spans").alias("p", "s")).select(
        "doc_id", "p", "s.*"
    )


def test_roundtrip_all_formats(spark, corpus_df, tmp_path):
    docs = corpus_df.select("doc_id", "spans").limit(40).cache()
    base = sorted(tuple(r) for r in _flat(docs).collect())
    for fmt in ("parquet", "json", "csv"):
        path = str(tmp_path / fmt)
        sources.write_documents(docs, path, fmt)
        back = sources.read_documents(spark, path, fmt)
        assert back.schema["spans"].dataType.elementType.fieldNames() == [
            "kind", "text", "media_ref", "offset"
        ]
        got = sorted(tuple(r) for r in _flat(back).collect())
        assert got == base, fmt
        # extraction is source-format-agnostic
        ext = sorted(
            tuple(r)
            for r in _flat(extract_spans_columnar(back).select("doc_id", "spans")).collect()
        )
        if fmt == "parquet":
            expect_ext = ext
        else:
            assert ext == expect_ext, fmt


def test_csv_malformed_spans_degrade(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.createDataFrame(
        [("d1", '[{"kind":"text","text":"ok","media_ref":"","offset":0}]'),
         ("d2", "NOT JSON AT ALL")],
        "doc_id string, spans string",
    ).write.option("header", "true").option("escape", '"').csv(p)
    back = sources.read_documents(spark, p, "csv")
    rows = {r["doc_id"]: r["spans"] for r in back.collect()}
    assert rows["d1"][0]["text"] == "ok"
    assert rows["d2"] is None  # degraded, not crashed


def test_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    from ocr_search_spark.sources import read_jsonl_quarantine

    p = tmp_path / "docs.jsonl"
    lines = [
        '{"doc_id": "a", "spans": [{"kind": "text", "text": "hi", "media_ref": "", "offset": 0}]}',
        "{this is not json",
        '{"doc_id": null, "spans": [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}]}',
        '{"doc_id": "b", "spans": [{"kind": "media", "text": "", "media_ref": "m.png", "offset": 1}]}',
        '{"doc_id": "c"}',
    ]
    p.write_text("\n".join(lines))
    good, bad = read_jsonl_quarantine(spark, str(p))
    g = {r["doc_id"]: r for r in good.collect()}
    assert set(g) == {"a", "b"}
    assert g["b"]["spans"][0]["media_ref"] == "m.png"
    b = sorted((r["reason"], r["raw"] is not None) for r in bad.collect())
    assert [x[0] for x in b] == [
        "malformed_json", "missing_required_field", "missing_required_field"
    ]
    assert all(x[1] for x in b)
