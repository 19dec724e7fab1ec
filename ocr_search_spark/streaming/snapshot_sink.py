"""Exactly-once streaming append into a SnapshotTable.

Structured Streaming's `foreachBatch` contract is AT-LEAST-ONCE: after a
crash between the sink's write and the checkpoint commit, the same
micro-batch replays. A plain `table.append` in the sink would then
duplicate rows — the classic streaming-into-a-lakehouse bug. The fix is
Iceberg's: fence on the batch id. Every append commit records its
`batch_id` in the manifest (`info`), and a replayed batch whose id is
already at-or-below the table's high-water mark becomes a no-op.

Why the fence is sound: micro-batches commit IN ORDER (batch N+1 never
starts until N's checkpoint commit), so "the most recent batch_id in the
manifest chain ≥ incoming id" is exactly "this batch already landed".
Maintenance commits (compact, materialize-deletes) interleave freely —
the scan walks past manifests without a batch_id.

This is the streaming twin of ``streaming/index_maintain`` (which fences
BucketedTable merges by replace_group idempotence); here the snapshot
log itself is the ledger, so resume needs no side state at all. At
10^12 rows the sink commits O(batch) files per trigger and the
compaction cadence (`SnapshotTable.compact`) bounds the file count.

Reference parity: the reference's sync loop re-lists the whole remote
tree and upserts per file (DropboxSynchronizer.class.js:64-110) with no
replay protection; crash mid-sync re-converts files. Part of the
lakehouse tier this engine adds.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..schemas import DOCUMENTS
from ..storage_snapshots import SnapshotTable


def last_committed_batch(
    table: SnapshotTable, channel: str = "default"
) -> int | None:
    """Newest ``batch_id`` recorded on ``channel`` in the manifest
    chain, or None. Channels namespace the fences so independent
    streams (an append ingest and a retraction feed, each with its own
    checkpoint and thus its own batch numbering) can share one table
    without absorbing each other's batches. Fences propagate forward
    in every manifest ("fences" map), so this is one O(1) read that
    survives snapshot expiry; pre-fences histories fall back to the
    chain walk."""
    v = table.current_version()
    if v is None:
        return None
    try:
        man = table._manifest(v)
    except ValueError:
        return None
    if "fences" in man:  # forward-propagated map: O(1), expiry-proof
        bid = (man["fences"] or {}).get(channel)
        return int(bid) if bid is not None else None
    # legacy manifests: walk (pre-fences history)
    seen: set[int] = set()
    while v is not None and v not in seen:
        seen.add(v)
        try:
            man = table._manifest(v)
        except ValueError:
            return None  # expired tail
        info = man.get("info") or {}
        bid = info.get("batch_id")
        if bid is not None and info.get("channel", "default") == channel:
            return int(bid)
        v = man["parent"]
    return None


def append_batch(
    table: SnapshotTable,
    df: DataFrame,
    batch_id: int,
    channel: str = "default",
) -> bool:
    """Idempotent sink body: append ``df`` unless ``batch_id`` already
    landed. Returns True iff a commit happened. First batch creates the
    table.

    Operational sharp edge: on a table a live stream checkpoint drives,
    never append with a MANUALLY chosen batch_id — ids at or above the
    fence make the stream's matching future batch look like a replay
    and its rows are (correctly, from the fence's view) dropped. Out-of-
    band writes to a streamed table belong in plain ``table.append``
    (no info fence), which the fence walk skips past."""
    last = last_committed_batch(table, channel)
    if last is not None and last >= batch_id:
        return False  # replay of an already-committed batch
    fence = {"batch_id": int(batch_id), "channel": channel}
    if table.current_version() is None:
        table.create(df, info=fence)
    else:
        table.append(df, info=fence)
    return True


def delete_batch(
    table: SnapshotTable,
    keys: DataFrame,
    batch_id: int,
    channel: str = "retract",
) -> bool:
    """Idempotent retraction-sink body: merge-on-read delete of ``keys``
    unless this channel's ``batch_id`` already landed. O(batch) commit,
    no files rewritten; pair with ``SnapshotTable.maintain`` to fold
    accumulated delete files back to copy-on-write."""
    last = last_committed_batch(table, channel)
    if last is not None and last >= batch_id:
        return False
    table.delete_mor(
        keys, info={"batch_id": int(batch_id), "channel": channel}
    )
    return True


def stream_delete_snapshot(
    spark: SparkSession,
    input_path: str,
    table: SnapshotTable,
    checkpoint_path: str,
    key_schema: str,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
):
    """Retraction feed → exactly-once merge-on-read deletes (the GDPR
    erasure stream): each micro-batch of key rows becomes ONE O(batch)
    delete-mor commit, fenced on the ``retract`` channel so replays are
    no-ops and a concurrent append stream on the ``default`` channel is
    never disturbed. ``key_schema`` is the DDL of the key parquet files
    (columns must be a subset of the table schema)."""
    reader = spark.readStream.schema(key_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)

    def sink(df: DataFrame, batch_id: int) -> None:
        delete_batch(table, df, batch_id)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_append_snapshot(
    spark: SparkSession,
    input_path: str,
    table: SnapshotTable,
    checkpoint_path: str,
    schema=DOCUMENTS,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
):
    """File-source stream → (optional transform) → exactly-once
    SnapshotTable appends, ``Trigger.AvailableNow`` (each invocation
    drains the backlog since the last checkpointed offset, then stops).

    ``max_files_per_trigger`` splits the backlog into many micro-batches
    — the kill-and-resume chaos lever, and the bounded commit unit at
    scale."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(input_path)
    if transform is not None:
        src = transform(src)

    def sink(df: DataFrame, batch_id: int) -> None:
        append_batch(table, df, batch_id)

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
