"""Streaming CDC source over the SnapshotTable manifest log — a Spark 4
Python Data Source (``pyspark.sql.datasource``), so the lakehouse tier's
changelog is consumable as

    spark.readStream.format("snapshot_cdc").option("path", root).load()

i.e. Iceberg's *incremental append scan* as a first-class streaming
source, not a batch helper. Offsets ARE snapshot versions: each
micro-batch covers the manifest versions committed since the last
checkpointed offset, and its input partitions are exactly the data
FILES those commits added — no listing diffs, no modification-time
heuristics, no state beyond the checkpoint's version number. Exactly-
once falls out of the log's structure: a file belongs to precisely one
commit, and a version range is read at most once.

Delivery semantics (Iceberg append-scan parity, pinned):

* ``append`` / ``create`` commits: their added files are delivered.
* rewrite commits (``compact``, ``optimize-zorder``,
  ``materialize-deletes``, ``delete``, ``merge``, ``overwrite``,
  ``rollback``): SKIPPED — their new files re-house rows that earlier
  offsets already delivered; replaying them would double-deliver.
  Consequently updates/deletes are not re-emitted (an append-driven
  feed; consumers needing retraction rows use
  ``SnapshotTable.diff_versions``).
* ``delete-mor`` / ``evolve`` commits add no data files — naturally
  empty batches.

Executor-side reads use pyarrow directly (the data source API's
RecordBatch path — Arrow-vectorized, no Python row loop), with columns
pruned to the query schema. Scale shape: the driver touches only
manifest JSON (O(n_files) per commit); each partition is one parquet
file; a 10^12-row table streams at whatever parallelism its commit
cadence produced — and the bin-pack compactor keeps that healthy
without ever re-entering the feed.

The manifest walk reads ``meta/`` via plain file IO: this source
targets the same posix/file:// roots the rest of the engine's tests
use; an object-store build would swap in fsspec here and change
nothing else.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "snapshot_cdc"

# commits whose added files are NEW rows (everything else re-houses
# already-delivered rows and must be skipped)
_DELIVER_OPS = {"append", "create"}


def _local_root(path: str) -> str:
    return path[7:] if path.startswith("file://") else path


def _read_manifest(root: str, version: int) -> dict | None:
    p = os.path.join(_local_root(root), "meta", f"v{version}.json")
    try:
        with open(p, "r", encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _current_version(root: str) -> int | None:
    p = os.path.join(_local_root(root), "meta", "_current")
    try:
        with open(p, "r", encoding="utf-8") as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return None


class SnapshotFilePartition(InputPartition):
    def __init__(self, abs_path: str, commit_version: int):
        self.abs_path = abs_path
        self.commit_version = commit_version


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.root = options["path"]
        self.schema = schema
        self.columns = [f.name for f in schema.fields]

    # offsets are {"version": N}; version 0 = before genesis
    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        v = _current_version(self.root)
        return {"version": int(v or 0)}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[SnapshotFilePartition]:
        lo, hi = int(start["version"]), int(end["version"])
        out: list[SnapshotFilePartition] = []
        for v in range(lo + 1, hi + 1):
            man = _read_manifest(self.root, v)
            if man is None:
                # expired mid-range: a gap here means the checkpoint fell
                # behind the retention window — refuse rather than skip
                raise ValueError(
                    f"snapshot v{v} expired before the stream read it — "
                    "raise expire_snapshots retention above the stream lag"
                )
            if man["operation"] not in _DELIVER_OPS:
                continue
            parent_files = (
                set()
                if man["parent"] is None
                else set((_read_manifest(self.root, man["parent"]) or {}).get("files", []))
            )
            for rel in man["files"]:
                if rel not in parent_files:
                    out.append(
                        SnapshotFilePartition(
                            os.path.join(_local_root(self.root), rel), v
                        )
                    )
        return out

    def read(self, partition: SnapshotFilePartition) -> Iterator:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.abs_path, columns=self.columns)
        # field order must match the declared schema exactly
        table = table.select(self.columns)
        for batch in table.to_batches():
            yield batch

    def commit(self, end: dict) -> None:
        pass  # the checkpoint IS the state; nothing engine-side to ack


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        root = self.options["path"]
        v = _current_version(root)
        if v is None:
            raise ValueError(f"snapshot table {root} does not exist")
        man = _read_manifest(root, v)
        return T.StructType.fromJson(man["schema"])

    def streamReader(self, schema: T.StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(schema, dict(self.options))


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(SnapshotDataSource)
