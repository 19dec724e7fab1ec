"""Web-text normalization: entity decode order, ASCII-guarded numeric
entities, mojibake repair, control stripping, defect counts."""

from __future__ import annotations

from ocr_search_spark.operators.webtext import normalize_web_text


def _run(spark, text):
    df = spark.createDataFrame([("d", text)], "doc_id string, text string")
    return normalize_web_text(df).collect()[0]


def test_named_and_numeric_entities(spark):
    r = _run(spark, "Tom &amp; Jerry &lt;tag&gt; it&#39;s &quot;q&quot; &#65;")
    assert r["text"] == 'Tom & Jerry <tag> it\'s "q" A'
    assert r["n_entities"] == 7


def test_amp_decodes_last_single_pass(spark):
    # the classic: &amp;lt; is ONE level of encoding -> literal "&lt;"
    r = _run(spark, "&amp;lt; and &amp;amp;")
    assert r["text"] == "&lt; and &amp;"


def test_numeric_entity_ascii_guard(spark):
    # out-of-range and malformed numerics stay literal
    r = _run(spark, "&#999999; &#8; &#x41; &#12abc; &#34;ok&#34;")
    assert r["text"] == '&#999999; &#8; &#x41; &#12abc; "ok"'
    # count includes every &#NNN; head (well-formed), decoded or not
    assert r["n_entities"] == 4


def test_mojibake_repair_and_count(spark):
    r = _run(spark, "cafÃ© â€™tis StraÃe? no: Ã¼")
    assert "café" in r["text"] and "’tis" in r["text"] and "ü" in r["text"]
    assert r["n_mojibake"] == 3  # Ã©, â€™, Ã¼ (Ã\x9f not in the pinned map)


def test_control_strip_keeps_tab_newline(spark):
    r = _run(spark, "a\r\nb\rc\td\x07e\x00f")
    assert r["text"] == "a\nb\nc\td" + "ef"


def test_clean_text_is_fixed_point(spark):
    dirty = "x &amp;amp; cafÃ© &#39; y"
    once = _run(spark, dirty)["text"]
    again = _run(spark, once.replace("&", "&"))  # identity guard
    # already-clean text with no defects passes through unchanged
    clean = "plain text, no defects 123"
    assert _run(spark, clean)["text"] == clean
    assert _run(spark, clean)["n_entities"] == 0
    assert _run(spark, clean)["n_mojibake"] == 0
    assert once != dirty and again is not None
