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

Reference parity: the reference's only change feed is the 15-minute
poll loop re-listing the entire remote tree and diffing it by hand
(/root/reference/src/DropboxSynchronizer/DropboxSynchronizer.class.js:64-110,
interval at config/AppConfig.const.js:26); this source replaces that
with exact manifest deltas and checkpointed offsets.

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
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
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


def _file_batches(abs_path: str, schema: T.StructType, columns: list):
    """Arrow batches of one parquet file projected to ``columns`` in
    order, null-filling columns the file predates (additive schema
    evolution: old files simply lack the new fields)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_type

    pf = pq.ParquetFile(abs_path)
    avail = set(pf.schema_arrow.names)
    present = [c for c in columns if c in avail]
    table = pq.read_table(abs_path, columns=present)
    for f in schema.fields:
        if f.name not in avail:
            table = table.append_column(
                f.name, pa.nulls(table.num_rows, type=to_arrow_type(f.dataType))
            )
    table = table.select(columns)
    # cast to the DECLARED schema: files written before a type-widening
    # evolution (or by writers with narrower literal types) must arrive
    # as the manifest's types, nullable — Arrow accessors are strict
    by_name = {f.name: f for f in schema.fields}
    target = pa.schema(
        [pa.field(c, to_arrow_type(by_name[c].dataType), nullable=True)
         for c in columns]
    )
    return table.cast(target).to_batches()


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
        yield from _file_batches(partition.abs_path, self.schema, self.columns)

    def commit(self, end: dict) -> None:
        pass  # the checkpoint IS the state; nothing engine-side to ack


class SnapshotBatchReader(DataSourceReader):
    """Batch twin: scan one snapshot version (option ``version``,
    default current) through the same per-file partitions + Arrow
    executor reads — time travel via ``spark.read.format(...)``.
    Pending MOR deletes are NOT applied on this path (the reader is
    schema+files only); tables with pending deletes refuse rather than
    silently resurrect rows — materialize first or read through
    ``SnapshotTable.read``."""

    def __init__(self, schema: T.StructType, options: dict):
        self.root = options["path"]
        self.schema = schema
        self.version = int(options["version"]) if "version" in options else None
        self.columns = [f.name for f in schema.fields]

    def partitions(self) -> Sequence[SnapshotFilePartition]:
        v = self.version
        if v is None:
            v = _current_version(self.root)
            if v is None:
                raise ValueError(f"snapshot table {self.root} does not exist")
        man = _read_manifest(self.root, v)
        if man is None:
            raise ValueError(f"snapshot v{v} does not exist (expired?)")
        if man.get("delete_files"):
            raise ValueError(
                "table has pending merge-on-read deletes — the batch "
                "reader cannot apply them; materialize_deletes() first "
                "or use SnapshotTable.read()"
            )
        return [
            SnapshotFilePartition(
                os.path.join(_local_root(self.root), rel), v
            )
            for rel in man["files"]
        ]

    def read(self, partition: SnapshotFilePartition) -> Iterator:
        yield from _file_batches(partition.abs_path, self.schema, self.columns)


class SnapshotDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        root = self.options["path"]
        if "version" in self.options:
            v = int(self.options["version"])
        else:
            v = _current_version(root)
            if v is None:
                raise ValueError(f"snapshot table {root} does not exist")
        man = _read_manifest(root, v)
        if man is None:
            raise ValueError(f"snapshot v{v} does not exist (expired?)")
        return T.StructType.fromJson(man["schema"])

    def reader(self, schema: T.StructType) -> SnapshotBatchReader:
        return SnapshotBatchReader(schema, dict(self.options))

    def streamReader(self, schema: T.StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(schema, dict(self.options))

    def writer(self, schema: T.StructType, overwrite: bool):
        return SnapshotWriter(schema, dict(self.options), overwrite)


def register(spark) -> None:
    """Idempotent format registration for the current session."""
    spark.dataSource.register(SnapshotDataSource)


# ------------------------------------------------------------ write path
# Spark-native writes: df.write.format("snapshot_cdc").mode("append"/
# "overwrite").save(path) — the DSv2 symmetry to the batch/stream
# readers above. Scope, guarded explicitly: plain tables only. A table
# with CHECK constraints, a partition spec, bloom columns or pending
# merge-on-read deletes refuses the writer and names the API to use
# instead (SnapshotTable.append runs those features' validation/layout
# jobs on the JVM; silently skipping them here would be a correctness
# hole, not a convenience). Same local-FS scope as the readers.
#
# Protocol mapping (the part worth reading): each task writes ONE
# parquet file into a hidden data/.staging-<uuid>/ dir and returns its
# name + per-file stats (min/max/null/#rows computed with
# pyarrow.compute on the already-cast table — the in-task twin of
# _collect_stats' read-back aggregate, so writer files prune and
# metadata-count exactly like API-written ones). commit() renames the
# staging dir to data/c<version>/ (one atomic dir rename), then writes
# the manifest CARRYING the parent's fences / spec registry / checks —
# a lost fence would re-admit replayed micro-batches, so the carry is
# load-bearing, not bookkeeping. abort() removes the staging dir;
# leftover staging files from a crash are invisible to readers
# (manifest-listed files only) and reclaimed by expire_snapshots.


class _SnapWriteMessage(WriterCommitMessage):
    def __init__(self, fname, stats):
        self.fname = fname
        self.stats = stats


class SnapshotWriter(DataSourceWriter):
    def __init__(self, schema: T.StructType, options: dict, overwrite: bool):
        import uuid

        self.root = _local_root(options["path"])
        self.overwrite = overwrite
        cur = _current_version(self.root)
        if cur is None:
            raise ValueError(
                f"snapshot table {self.root} does not exist — create it "
                "with SnapshotTable.create first (the DSv2 writer appends"
                "/overwrites existing plain tables)"
            )
        man = _read_manifest(self.root, cur)
        for feature, key in (
            ("a partition spec", "partition_spec"),
            ("CHECK constraints", "checks"),
            ("bloom columns", "bloom_cols"),
            ("pending merge-on-read deletes", "delete_files"),
        ):
            if man.get(key):
                raise ValueError(
                    f"table declares {feature} — use SnapshotTable."
                    f"{'overwrite' if overwrite else 'append'} (the JVM "
                    "path runs its validation/layout jobs; the DSv2 "
                    "writer will not silently skip them)"
                )
        declared = T.StructType.fromJson(man["schema"])
        if [f.name for f in schema.fields] != [f.name for f in declared.fields]:
            raise ValueError(
                f"write schema {schema.fieldNames()} does not match table "
                f"schema {declared.fieldNames()}"
            )
        self.declared_json = man["schema"]
        self.man = man
        self.parent = cur
        self.staging = os.path.join(
            self.root, "data", f".staging-{uuid.uuid4().hex}"
        )

    # -------------------------------------------------- executor side
    def write(self, iterator) -> _SnapWriteMessage:
        import uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext
        from pyspark.sql.pandas.types import to_arrow_type

        declared = T.StructType.fromJson(self.declared_json)
        names = [f.name for f in declared.fields]
        cols: dict = {n: [] for n in names}
        n = 0
        for row in iterator:
            for name, v in zip(names, row):
                cols[name].append(v)
            n += 1
        if n == 0:
            return _SnapWriteMessage(None, None)
        target = pa.schema(
            [pa.field(f.name, to_arrow_type(f.dataType), nullable=True)
             for f in declared.fields]
        )
        table = pa.table({k: cols[k] for k in names}).cast(target)
        os.makedirs(self.staging, exist_ok=True)
        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}-{uuid.uuid4().hex}.parquet"
        pq.write_table(table, os.path.join(self.staging, fname))
        stats: dict = {"#rows": n}
        for c in self.man.get("stats_cols") or []:
            col = table.column(c)
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            iso = lambda v: (
                v.isoformat() if hasattr(v, "isoformat") else v
            )
            stats[c] = [iso(lo), iso(hi)]
            stats[f"#nulls:{c}"] = col.null_count
        return _SnapWriteMessage(fname, stats)

    # ---------------------------------------------------- driver side
    def commit(self, messages) -> None:
        version = self.parent + 1
        meta_dir = os.path.join(self.root, "meta")
        vpath = os.path.join(meta_dir, f"v{version}.json")
        if os.path.exists(vpath) or _current_version(self.root) != self.parent:
            self.abort(messages)
            raise ValueError(
                f"snapshot v{version} already exists — a concurrent "
                "writer won; re-run the write against the new current"
            )
        cdir = os.path.join(self.root, "data", f"c{version}")
        new_rel, new_stats = [], {}
        live = [m for m in messages if m is not None and m.fname]
        if live:
            os.rename(self.staging, cdir)
            for m in live:
                rel = f"data/c{version}/{m.fname}"
                new_rel.append(rel)
                new_stats[rel] = m.stats
        man = self.man
        kept = [] if self.overwrite else list(man["files"])
        stats = (
            {} if self.overwrite
            else {f: s for f, s in (man.get("stats") or {}).items()
                  if f in set(kept)}
        )
        stats.update(new_stats)
        parts = (
            {} if self.overwrite
            else {f: v for f, v in (man.get("partitions") or {}).items()
                  if f in set(kept)}
        )
        fsids = (
            {} if self.overwrite
            else {f: v for f, v in (man.get("file_spec_ids") or {}).items()
                  if f in set(kept)}
        )
        out = {
            "version": version,
            "parent": self.parent,
            "operation": "overwrite" if self.overwrite else "append",
            "files": kept + new_rel,
            "schema": man["schema"],
            "stats_cols": man.get("stats_cols") or [],
            "stats": stats,
            "delete_files": [],
            "info": {"writer": "python-datasource"},
            # fences MUST travel forward — a dropped fence re-admits a
            # replayed streaming micro-batch after the next restart
            "fences": man.get("fences") or {},
            "partition_spec": man.get("partition_spec") or [],
            "partitions": parts,
            "spec_registry": man.get("spec_registry") or [],
            "file_spec_ids": fsids,
            "checks": man.get("checks") or {},
            "bloom_cols": man.get("bloom_cols") or [],
        }
        tmp = vpath + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(out, fh)
        os.replace(tmp, vpath)
        cur = os.path.join(meta_dir, "_current")
        with open(cur + ".tmp", "w", encoding="utf-8") as fh:
            fh.write(str(version))
        os.replace(cur + ".tmp", cur)
        # the JVM side writes through Hadoop's ChecksumFileSystem, which
        # keeps a ._current.crc sidecar; a plain-python rewrite makes it
        # stale and every later Hadoop read would fail ChecksumException
        # — drop it (Hadoop reads fine without one and recreates it on
        # its next write)
        for side in ("._current.crc", f".v{version}.json.crc"):
            try:
                os.unlink(os.path.join(meta_dir, side))
            except FileNotFoundError:
                pass

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)
