"""Multi-format document sources with schema enforcement.

The engine's canonical storage is parquet (columnar, pushdown-friendly);
real ingest pipelines also receive JSONL exports and CSV dumps. This
module reads the interleaved ``(doc_id, spans)`` shape from any of the
three with ONE pinned schema, so everything downstream is
format-agnostic:

* parquet — native nested read;
* json (JSONL) — nested spans parsed directly against DOCUMENTS;
* csv — flat files cannot nest, so the ``spans`` column carries the
  span array as a JSON string, parsed with ``from_json`` (schema
  enforced, malformed rows → null spans for the caller's X2 error
  handling, never a crash).

Writers for json/csv round-trips are provided for export paths and
tests. At scale: JSON/CSV scans have no column pruning or predicate
pushdown — ingest converts to parquet once (`convert_to_parquet`) and
every downstream read stays columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import DOCUMENTS, SPAN

_SPANS_JSON_SCHEMA = DOCUMENTS["spans"].dataType


def read_documents(spark: SparkSession, path: str, format: str = "parquet") -> DataFrame:
    """Read the interleaved documents table from ``path`` in the given
    format, always returning the pinned DOCUMENTS shape."""
    if format == "parquet":
        # already nested; nullability metadata differs per writer, so no
        # cast (Spark refuses casts that would ADD non-null constraints)
        return spark.read.parquet(path).select("doc_id", "spans")
    if format == "json":
        df = spark.read.schema(DOCUMENTS).json(path)
        return df.select("doc_id", "spans")
    if format == "csv":
        raw = spark.read.option("header", "true").option("escape", '"').csv(path)
        return raw.select(
            F.col("doc_id"),
            F.from_json(F.col("spans"), _SPANS_JSON_SCHEMA).alias("spans"),
        )
    raise ValueError(f"unsupported format {format!r} (parquet|json|csv)")


def write_documents(docs: DataFrame, path: str, format: str = "parquet") -> None:
    """Write the DOCUMENTS shape out in the given format (spans as a JSON
    string for csv)."""
    if format == "parquet":
        docs.write.mode("overwrite").parquet(path)
    elif format == "json":
        docs.write.mode("overwrite").json(path)
    elif format == "csv":
        docs.select(
            "doc_id", F.to_json("spans").alias("spans")
        ).write.mode("overwrite").option("header", "true").option("escape", '"').csv(path)
    else:
        raise ValueError(f"unsupported format {format!r} (parquet|json|csv)")


def convert_to_parquet(
    spark: SparkSession, src_path: str, src_format: str, out_path: str
) -> None:
    """One-shot ingest normalization: any supported format → parquet, so
    every downstream scan gets pruning + pushdown."""
    read_documents(spark, src_path, src_format).write.mode("overwrite").parquet(out_path)


__all__ = ["read_documents", "write_documents", "convert_to_parquet", "SPAN"]


def read_jsonl_quarantine(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """JSONL ingest with a QUARANTINE channel instead of silent nulls:
    returns (good, bad) — ``good`` in the pinned DOCUMENTS shape,
    ``bad`` as (raw, reason) rows for the dead-letter table a 100 TB
    ingest keeps next to its lineage (X2/X3 discipline: record errors,
    never drop silently, never crash the job).

    A row is quarantined when it is not valid JSON for the schema
    (PERMISSIVE mode's corrupt-record column is set) OR when required
    fields are missing (doc_id/spans null after a structurally-valid
    parse). The split is one scan, two filters — the stream stays
    columnar and the quarantine table is failure-sized.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        list(DOCUMENTS.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # corrupt-record capture requires materializing the parsed row
        # before filtering on the corrupt column (Spark's documented
        # from-file caveat) — cache keeps it one scan for both outputs
        .cache()
    )
    corrupt = F.col("_corrupt_record").isNotNull()
    incomplete = F.col("doc_id").isNull() | F.col("spans").isNull()
    good = raw.where(~corrupt & ~incomplete).select("doc_id", "spans")
    bad = raw.where(corrupt | incomplete).select(
        F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct("doc_id", "spans")))
        .alias("raw"),
        F.when(corrupt, F.lit("malformed_json"))
        .otherwise(F.lit("missing_required_field"))
        .alias("reason"),
    )
    return good, bad
