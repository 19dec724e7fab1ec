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
