"""span_diff — the north-rule acceptance invariant as a distributed op.

Covers the cases the gate fixture can't: null fields inside spans
(concat_ws null-skipping trap), null-vs-empty collisions, empty span
arrays, divergence at position 0, and the plan shape (no explode, no
Python UDF)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ocr_search_spark.operators.spandiff import span_diff

_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _sp(kind, text, ref, off):
    return (kind, text, ref, off)


def _run(spark, ref_rows, cand_rows):
    out = span_diff(_df(spark, ref_rows), _df(spark, cand_rows))
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_equal_and_statuses(spark):
    ref = [
        ("a", [_sp("text", "hello", "", 0), _sp("media", "", "img-1", 1)]),
        ("b", [_sp("text", "x", "", 0)]),
        ("only-ref", [_sp("text", "z", "", 0)]),
    ]
    cand = [
        ("a", [_sp("text", "hello", "", 0), _sp("media", "", "img-1", 1)]),
        ("b", [_sp("text", "CHANGED", "", 0)]),
        ("only-cand", [_sp("text", "z", "", 0)]),
    ]
    got = _run(spark, ref, cand)
    assert got["a"]["status"] == "equal" and got["a"]["first_divergence"] == -1
    assert got["b"]["status"] == "differs" and got["b"]["first_divergence"] == 0
    assert got["only-ref"]["status"] == "missing_in_candidate"
    assert got["only-ref"]["cand_len"] == -1
    assert got["only-cand"]["status"] == "missing_in_reference"
    assert got["only-cand"]["ref_len"] == -1


def test_length_mismatch_diverges_at_shorter_end(spark):
    spans3 = [_sp("text", "a", "", 0), _sp("text", "b", "", 1), _sp("text", "c", "", 2)]
    got = _run(spark, [("d", spans3)], [("d", spans3[:2])])
    assert got["d"]["status"] == "differs"
    assert got["d"]["first_divergence"] == 2
    assert (got["d"]["ref_len"], got["d"]["cand_len"]) == (3, 2)
    # symmetric: candidate longer
    got = _run(spark, [("d", spans3[:1])], [("d", spans3)])
    assert got["d"]["status"] == "differs"
    assert got["d"]["first_divergence"] == 1


def test_null_fields_do_not_collide(spark):
    # concat_ws skips nulls: (null,'a') vs ('a',null) must NOT collide
    ref = [("n", [_sp(None, "a", "", 0)])]
    cand = [("n", [_sp("a", None, "", 0)])]
    got = _run(spark, ref, cand)
    assert got["n"]["status"] == "differs" and got["n"]["first_divergence"] == 0
    # identical null patterns ARE equal
    got = _run(spark, ref, [("n", [_sp(None, "a", "", 0)])])
    assert got["n"]["status"] == "equal"


def test_missing_tail_not_equal_to_empty_span(spark):
    # a null-struct zip_with extension must not equal an all-null span
    ref = [("e", [_sp("t", "x", "", 0), _sp(None, None, None, None)])]
    cand = [("e", [_sp("t", "x", "", 0)])]
    got = _run(spark, ref, cand)
    assert got["e"]["status"] == "differs"
    assert got["e"]["first_divergence"] == 1


def test_empty_arrays(spark):
    got = _run(spark, [("z", [])], [("z", [])])
    assert got["z"]["status"] == "equal"
    assert (got["z"]["ref_len"], got["z"]["cand_len"]) == (0, 0)
    got = _run(spark, [("z", [])], [("z", [_sp("text", "a", "", 0)])])
    assert got["z"]["status"] == "differs"
    assert got["z"]["first_divergence"] == 0


def test_plan_no_explode_no_udf(spark):
    ref = _df(spark, [("a", [_sp("text", "x", "", 0)])])
    cand = _df(spark, [("a", [_sp("text", "x", "", 0)])])
    plan = (
        span_diff(ref, cand)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "Generate" not in plan  # no explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_custom_column_names(spark):
    ref = _df(spark, [("a", [_sp("text", "x", "", 0)])]).withColumnsRenamed(
        {"doc_id": "id", "spans": "body"}
    )
    cand = _df(spark, [("a", [_sp("text", "y", "", 0)])]).withColumnsRenamed(
        {"doc_id": "id", "spans": "body"}
    )
    out = span_diff(ref, cand, id_col="id", spans_col="body")
    row = out.collect()[0]
    assert row["status"] == "differs" and row["first_divergence"] == 0


def test_repair_reaches_equality_touching_only_divergent_docs(spark):
    from ocr_search_spark.operators.spandiff import span_repair

    ref = _df(
        spark,
        [
            ("keep", [_sp("text", "same", "", 0)]),
            ("fix", [_sp("text", "truth", "", 0)]),
            ("fill", [_sp("media", "", "img-9", 0)]),
        ],
    )
    # candidate: keep is equal, fix differs, fill missing, extra is spurious
    cand = _df(
        spark,
        [
            ("keep", [_sp("text", "same", "", 0)]),
            ("fix", [_sp("text", "LIES", "", 0)]),
            ("extra", [_sp("text", "ghost", "", 0)]),
        ],
    )
    rep = span_repair(ref, cand)
    got = {r["doc_id"]: r["spans"] for r in rep.collect()}
    assert set(got) == {"keep", "fix", "fill"}
    assert got["fix"][0]["text"] == "truth"
    assert got["fill"][0]["media_ref"] == "img-9"
    # post-condition: re-audit is all-equal
    residue = span_diff(ref, rep).where(F.col("status") != "equal").count()
    assert residue == 0


def test_repair_identity_on_equal_inputs(spark):
    from ocr_search_spark.operators.spandiff import span_repair

    ref = _df(spark, [("a", [_sp("text", "x", "", 0)]), ("b", [])])
    rep = span_repair(ref, ref)
    assert sorted(r["doc_id"] for r in rep.collect()) == ["a", "b"]
    assert span_diff(ref, rep).where(F.col("status") != "equal").count() == 0
