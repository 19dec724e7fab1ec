"""Incremental sketch maintenance from a document stream.

Sketches are the natural streaming aggregate — fixed-size state,
mergeable — but exactly-once composition with foreachBatch depends on
the merge's algebra:

* **HLL / Bloom** merges (max / or) are IDEMPOTENT: replaying a batch
  re-applies the same maxima/bits and the state is unchanged. They can
  merge straight into stored state.
* **CMS** merge is a SUM — replaying a batch double-counts. The
  exactly-once shape is therefore a PARTIALS table keyed by
  ``batch_id``: each micro-batch ``replace_group``s its own partial
  sketch (idempotent overwrite — a replayed batch rewrites the identical
  rows), and the current sketch is the sum over partials at read time.
  State is (batches x depth x width) until :func:`compact_cms_partials`
  folds history into a single base partial — the same
  bounded-log + compaction pattern every incremental-view store uses.

At 10^12-doc scale each micro-batch writes <= depth*width rows into its
own bucket; the read-side sum touches sketch-sized data only. Cost is
independent of corpus size — that is the whole point of sketch state.

Reference parity: the reference engine has no streaming or sketch tier
(its sync loop re-processes whole files — DropboxSynchronizer
.class.js:125-156); this composes the engine's own streaming checkpoint
(S5) and MERGE storage (I1/I2) primitives with the sketch operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..storage import BucketedTable
from ..training.sketches import cms_build

BASE_BATCH_ID = -1  # compaction folds history into this pseudo-batch


def cms_partials_table(
    spark: SparkSession, table_path: str, n_buckets: int = 8
) -> BucketedTable:
    """(batch_id, row, bucket, cnt) partial sketches, bucketed by
    batch_id so one micro-batch rewrites exactly one storage bucket."""
    return BucketedTable(
        spark,
        table_path,
        keys=["batch_id", "row", "bucket"],
        n_buckets=n_buckets,
        bucket_keys=["batch_id"],
    )


def merge_cms_batch(
    table: BucketedTable,
    items: DataFrame,
    batch_id: int,
    col: str,
    depth: int = 4,
    width: int = 512,
) -> None:
    """Write one micro-batch's partial sketch, idempotently: a replayed
    batch_id replaces its own rows and nothing else (the foreachBatch
    exactly-once contract)."""
    spark = items.sparkSession
    partial = cms_build(items, col, depth, width).select(
        F.lit(int(batch_id)).cast("long").alias("batch_id"), "row", "bucket", "cnt"
    )
    groups = spark.createDataFrame([(int(batch_id),)], "batch_id long")
    if not table.exists():
        table.init(partial)
    else:
        table.replace_group(partial, group_keys=["batch_id"], groups=groups)


def current_cms(table: BucketedTable) -> DataFrame:
    """The live sketch: cell-wise sum over all stored partials —
    identical to a single-pass build over everything ingested so far
    (cms_merge semantics; tested)."""
    return (
        table.read()
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact_cms_partials(table: BucketedTable) -> None:
    """Fold all partials into the single BASE_BATCH_ID partial. Call
    between streaming runs (never concurrently with one): a batch
    replayed AFTER its partial was folded into the base would
    double-count, so compaction must only cover committed batches —
    running it while the query is stopped guarantees that."""
    spark = table.spark
    base = current_cms(table).select(
        F.lit(BASE_BATCH_ID).cast("long").alias("batch_id"), "row", "bucket", "cnt"
    )
    # Replace EVERY stored batch group with the single base partial —
    # sketch-sized rewrite (the whole table is <= batches x depth x width).
    all_groups = table.read().select("batch_id").distinct().unionByName(
        spark.createDataFrame([(BASE_BATCH_ID,)], "batch_id long")
    )
    # base must be materialized BEFORE replace_group starts dropping the
    # rows it reads from; localCheckpoint keeps even this (sketch-sized)
    # state executor-side — no collect()-materialization anywhere.
    base = base.localCheckpoint(eager=True)
    table.replace_group(base, group_keys=["batch_id"], groups=all_groups)


def stream_maintain_cms(
    spark: SparkSession,
    input_path: str,
    table_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 512,
    n_buckets: int = 8,
    await_termination: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Maintain a corpus word-frequency CMS from a parquet file stream of
    documents (whitespace words of lower(text), the corpus convention)."""
    table = cms_partials_table(spark, table_path, n_buckets)
    # Subset schema: parquet file streams prune to the listed columns.
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)

    def sink(df: DataFrame, batch_id: int) -> None:
        words = df.select(
            F.explode(F.split(F.lower(text_col), r"\s+")).alias("w")
        ).filter(F.col("w") != "")
        merge_cms_batch(table, words, batch_id, "w", depth, width)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


# ------------------------------------------------------------ KMV / theta
# The OTHER exactly-once algebra: KMV union-merge (k smallest of the
# distinct hash union) is IDEMPOTENT like HLL/Bloom — replaying a
# micro-batch re-merges the same hashes and the state is unchanged — so
# the stream merges straight into stored state, no batch-id partials
# ledger needed. State is <= k ROWS per group ((group, h) pairs), and a
# micro-batch rewrites only the storage groups its rows touch.


def kmv_state_table(
    spark: SparkSession, table_path: str, n_buckets: int = 8
) -> BucketedTable:
    """(g, h) bottom-k hash rows per group, bucketed by group so one
    micro-batch rewrites only its touched groups' buckets."""
    return BucketedTable(
        spark,
        table_path,
        keys=["g", "h"],
        n_buckets=n_buckets,
        bucket_keys=["g"],
    )


def merge_kmv_batch(
    table: BucketedTable,
    items: DataFrame,
    col: str,
    group_col: str,
    k: int = 64,
) -> None:
    """Merge one micro-batch into the KMV state: union the batch's
    distinct hashes with the stored rows of the TOUCHED groups, keep
    the k smallest per group, replace those groups. Idempotent: a
    replayed batch unions the same hashes — exactly-once without a
    partials ledger."""
    from pyspark.sql import Window as W

    from ..training.hashing import h60

    batch = items.select(
        F.col(group_col).alias("g"),
        h60(F.col(col).cast("string")).alias("h"),
    ).distinct()
    w = W.partitionBy("g").orderBy("h")
    if not table.exists():
        top = batch.withColumn("rn", F.row_number().over(w)).where(
            F.col("rn") <= k
        )
        table.init(top.select("g", "h"))
        return
    groups = batch.select("g").distinct()
    stored = table.read().join(F.broadcast(groups), "g", "leftsemi")
    merged = (
        stored.unionByName(batch)
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("g", "h")
    )
    table.replace_group(merged, group_keys=["g"], groups=groups)


def current_kmv(table: BucketedTable, k: int = 64) -> DataFrame:
    """The live sketch in kmv_build's frame: (g, sketch, theta) —
    identical to a single-pass build over everything ingested so far
    (union-merge algebra; tested)."""
    from ..training.sketches import KMV_H

    return (
        table.read()
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
        .withColumn(
            "theta",
            F.when(F.size("sketch") < k, F.lit(KMV_H)).otherwise(
                F.element_at("sketch", k)
            ),
        )
    )


def stream_maintain_kmv(
    spark: SparkSession,
    input_path: str,
    table_path: str,
    checkpoint_path: str,
    value_col: str = "user_id",
    group_col: str = "event_type",
    k: int = 64,
    n_buckets: int = 8,
    await_termination: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Maintain per-group KMV distinct sketches from a parquet file
    stream of events."""
    table = kmv_state_table(spark, table_path, n_buckets)
    reader = spark.readStream.schema(
        f"{value_col} long, {group_col} string"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)

    def sink(df: DataFrame, batch_id: int) -> None:
        merge_kmv_batch(table, df, value_col, group_col, k)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


# ------------------------------------------------------------ CUSUM
# Streaming changepoint monitoring. The CUSUM recursion is NOT
# idempotent (replay would re-apply increments, like the CMS sum), so
# it takes the partials-ledger shape — but with a twist that makes it
# exact: the per-batch effect of the recursion is the TRANSFER
# FUNCTION s_out = max(D, C + s_in) with C = the batch's increment sum
# and D = C − min(0, min-prefix-of-C), and these functions COMPOSE
# associatively (f2∘f1 has C' = C1+C2, D' = max(D2, C2+D1)). Each
# micro-batch therefore stores one idempotent (batch_id, key, C, D)
# row per side, and the live statistic folds the ledger in batch order
# as a WINDOW: s = max_k(D_k + Σ_{i>k} C_i) — closed form again, no
# recursion at read time either. Contract: batch arrival order must
# align with per-key event-time order (pair with an ordered file
# stream / watermarked source); a replayed batch rewrites identical
# rows.


def cusum_partials_table(
    spark: SparkSession, table_path: str, n_buckets: int = 8
) -> BucketedTable:
    """(batch_id, k, c_up, d_up, c_dn, d_dn) transfer-function ledger,
    bucketed by batch_id so one micro-batch rewrites one bucket."""
    return BucketedTable(
        spark,
        table_path,
        keys=["batch_id", "k"],
        n_buckets=n_buckets,
        bucket_keys=["batch_id"],
    )


def merge_cusum_batch(
    table: BucketedTable,
    series: DataFrame,
    batch_id: int,
    key_col: str,
    t_col: str,
    x_col: str,
    mu: int,
    slack: int,
) -> None:
    """Reduce one micro-batch to per-key transfer functions and write
    them idempotently under ``batch_id``."""
    from pyspark.sql import Window as W

    spark = series.sparkSession
    w = (
        W.partitionBy(key_col)
        .orderBy(t_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    up = (F.col(x_col) - F.lit(mu) - F.lit(slack)).cast("long")
    dn = (F.lit(mu) - F.col(x_col) - F.lit(slack)).cast("long")
    pref = series.select(
        F.col(key_col).alias("k"),
        up.alias("_up"),
        dn.alias("_dn"),
        F.sum(up).over(w).alias("_cu"),
        F.sum(dn).over(w).alias("_cd"),
    )
    part = pref.groupBy("k").agg(
        F.sum("_up").cast("long").alias("c_up"),  # = final prefix sum
        F.least(F.lit(0).cast("long"), F.min("_cu")).alias("_mu"),
        F.sum("_dn").cast("long").alias("c_dn"),
        F.least(F.lit(0).cast("long"), F.min("_cd")).alias("_md"),
    )
    part = part.select(
        F.lit(int(batch_id)).cast("long").alias("batch_id"),
        "k",
        F.col("c_up").cast("long"),
        (F.col("c_up") - F.col("_mu")).cast("long").alias("d_up"),
        F.col("c_dn").cast("long"),
        (F.col("c_dn") - F.col("_md")).cast("long").alias("d_dn"),
    )
    groups = spark.createDataFrame([(int(batch_id),)], "batch_id long")
    if not table.exists():
        table.init(part)
    else:
        table.replace_group(part, group_keys=["batch_id"], groups=groups)


def current_cusum(table: BucketedTable, threshold: int) -> DataFrame:
    """(k, s_up, s_down, alarm_up, alarm_down) — the live statistic:
    fold the ledger in batch order via the suffix-sum closed form
    ``s = max_k(D_k + Σ_{i>k} C_i)`` (batches where a key is absent are
    the identity transfer and simply have no row). Window runs over the
    LEDGER (batches × keys), never event grain."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("k")
        .orderBy("batch_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    folded = (
        table.read()
        .withColumn("_su", F.coalesce(F.sum("c_up").over(w), F.lit(0)))
        .withColumn("_sd", F.coalesce(F.sum("c_dn").over(w), F.lit(0)))
        .groupBy("k")
        .agg(
            F.max(F.col("d_up") + F.col("_su")).cast("long").alias("s_up"),
            F.max(F.col("d_dn") + F.col("_sd")).cast("long").alias("s_down"),
        )
    )
    return folded.select(
        "k",
        "s_up",
        "s_down",
        (F.col("s_up") >= threshold).alias("alarm_up"),
        (F.col("s_down") >= threshold).alias("alarm_down"),
    )


def stream_maintain_cusum(
    spark: SparkSession,
    input_path: str,
    table_path: str,
    checkpoint_path: str,
    key_col: str = "event_type",
    t_col: str = "t",
    x_col: str = "x",
    mu: int = 10,
    slack: int = 2,
    n_buckets: int = 8,
    await_termination: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Maintain per-key CUSUM transfer partials from a parquet file
    stream of (key, t, x) series rows."""
    table = cusum_partials_table(spark, table_path, n_buckets)
    reader = spark.readStream.schema(
        f"{key_col} string, {t_col} long, {x_col} long"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)

    def sink(df: DataFrame, batch_id: int) -> None:
        merge_cusum_batch(table, df, batch_id, key_col, t_col, x_col, mu, slack)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
