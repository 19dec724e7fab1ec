"""Incremental LM maintenance from an append-only document stream.

The Kneser-Ney base table (training/textstats.py:kn_bigram_counts) is a
SUM — like the CMS and unlike HLL/Bloom, replaying a micro-batch would
double-count. The exactly-once shape is therefore the batch-keyed
PARTIALS table from sketch_maintain.py: each micro-batch
``replace_group``s its own (batch_id, u, w, c) partial — an idempotent
overwrite under foreachBatch replay — and the live counts are the sum
over partials at read time, folded periodically by compaction.

Unlike a sketch, the partial here is vocab-sized rather than fixed-size
(a batch's distinct bigrams), so compaction matters sooner: call
:func:`compact_kn_partials` between runs to fold history into the
single base partial. Derived KN statistics come from
``kn_stats_from_counts(current_kn_counts(table))`` — the stored table
IS the maintainable object, exactly the contract the batch-side
``kn_counts_upsert`` maintains for changed-doc deltas.

Scale: each micro-batch writes its own batch_id bucket (partition
pruned); the read-side sum shuffles vocab-sized data only. Reference
parity: none — the reference re-tokenizes whole files on every sync
pass (DropboxSynchronizer.class.js:125-156); this is the streaming
composition its architecture could not express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage import BucketedTable
from ..training.textstats import kn_bigram_counts
from .sketch_maintain import BASE_BATCH_ID

__all__ = [
    "kn_partials_table",
    "merge_kn_batch",
    "current_kn_counts",
    "compact_kn_partials",
    "stream_maintain_kn",
]


def kn_partials_table(
    spark: SparkSession, table_path: str, n_buckets: int = 8
) -> BucketedTable:
    """(batch_id, u, w, c) per-batch partial bigram counts, bucketed by
    batch_id so one micro-batch rewrites exactly one storage bucket."""
    return BucketedTable(
        spark,
        table_path,
        keys=["batch_id", "u", "w"],
        n_buckets=n_buckets,
        bucket_keys=["batch_id"],
    )


def merge_kn_batch(table: BucketedTable, docs: DataFrame, batch_id: int) -> None:
    """Write one micro-batch's partial counts idempotently: a replayed
    batch_id replaces its own rows and nothing else."""
    spark = docs.sparkSession
    partial = kn_bigram_counts(docs).select(
        F.lit(int(batch_id)).cast("long").alias("batch_id"),
        "u",
        "w",
        F.col("c_uw").alias("c"),
    )
    groups = spark.createDataFrame([(int(batch_id),)], "batch_id long")
    if not table.exists():
        table.init(partial)
    else:
        table.replace_group(partial, group_keys=["batch_id"], groups=groups)


def current_kn_counts(table: BucketedTable) -> DataFrame:
    """The live base table: (u, w, c_uw) summed over all partials —
    identical to kn_bigram_counts over everything ingested so far."""
    return (
        table.read()
        .groupBy("u", "w")
        .agg(F.sum("c").cast("long").alias("c_uw"))
    )


def compact_kn_partials(table: BucketedTable) -> None:
    """Fold all partials into the single BASE_BATCH_ID partial. Only
    between streaming runs (same contract as compact_cms_partials: a
    batch replayed after folding would double-count)."""
    spark = table.spark
    base = current_kn_counts(table).select(
        F.lit(BASE_BATCH_ID).cast("long").alias("batch_id"),
        "u",
        "w",
        F.col("c_uw").alias("c"),
    )
    all_groups = table.read().select("batch_id").distinct().unionByName(
        spark.createDataFrame([(BASE_BATCH_ID,)], "batch_id long")
    )
    # materialize before replace_group drops the rows it reads from —
    # via an eager localCheckpoint, NOT collect(): KN bigram counts are
    # vocab²-scale, and driver state must stay bounded by choice
    # (SCALE.md rule 3); the checkpoint pins the rows executor-side
    base = base.localCheckpoint(eager=True)
    table.replace_group(base, group_keys=["batch_id"], groups=all_groups)


def stream_maintain_kn(
    spark: SparkSession,
    input_path: str,
    table_path: str,
    checkpoint_path: str,
    n_buckets: int = 8,
    await_termination: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Maintain the KN bigram base table from a parquet file stream of
    append-only documents (Trigger.AvailableNow; exactly-once = stream
    checkpoint × idempotent per-batch replace_group)."""
    table = kn_partials_table(spark, table_path, n_buckets)
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)
    q = (
        src.writeStream.foreachBatch(
            lambda df, batch_id: merge_kn_batch(table, df, batch_id)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
