"""Iceberg-style snapshot log on plain parquet: time travel, rollback,
copy-on-write deletes, snapshot expiry.

The north rule frames the corpus as Iceberg tables. Without the Iceberg
runtime jars, this module reproduces the *semantics* that matter to a
resumable 10^12-row pipeline on plain parquet + a JSON manifest log:

* data files are IMMUTABLE — every commit writes its new files into a
  fresh ``data/c<version>/`` directory and never touches earlier files;
* a snapshot is a manifest (``meta/v<version>.json``) listing the exact
  file set of that version plus the persisted schema; ``meta/_current``
  is an atomically-renamed pointer to the latest version;
* ``read(version=...)`` plans a scan over exactly that manifest's files
  — time travel is free (no data movement), and predicate pushdown /
  column pruning apply unchanged because the scan is an ordinary
  parquet read of an explicit file list;
* ``delete_where`` is file-granularity copy-on-write, like Iceberg's
  COW mode: only files that actually CONTAIN matching rows are
  rewritten (discovered set-orientedly via ``input_file_name()``, one
  aggregate — never a row-by-row driver loop); untouched files are
  carried into the new manifest by reference;
* ``rollback(v)`` commits a NEW snapshot whose file set is version v's
  (history is append-only — Iceberg's rollback contract), and
  ``expire_snapshots(keep_last)`` drops old manifests plus any data
  file no retained manifest references (the GC that bounds storage).

Scale notes (100 TB): manifests are O(n_files) JSON, the only
driver-side state; commits append files (no read-modify-write of
existing data); every read is a parquet scan with full Catalyst
pushdown. Complements :class:`ocr_search_spark.storage.BucketedTable`
(bucket-pruned MERGE): that trades history for in-place bucket
rewrites; this trades in-place mutation for history.

Reference parity: the reference stores mutable Mongo collections with
no versioning (DbInterface.class.js:236-251) — snapshots are part of
the lakehouse tier this engine adds.
"""

from __future__ import annotations

import json
import posixpath
from urllib.parse import urlparse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CURRENT_PTR = "_current"


class SnapshotTable:
    """Versioned parquet table with an append-only snapshot log."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.meta_dir = f"{self.path}/meta"
        self.data_dir = f"{self.path}/data"

    # ------------------------------------------------------------ fs utils
    def _jpath(self, p: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self):
        return self._jpath(self.path).getFileSystem(
            self.spark._jsc.hadoopConfiguration()
        )

    def _write_text(self, path: str, text: str) -> None:
        """Atomic text write: temp file + rename (same FS primitive the
        parquet committer uses)."""
        fs = self._fs()
        tmp = self._jpath(path + ".tmp")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dst = self._jpath(path)
        if fs.exists(dst):
            fs.delete(dst, False)
        if not fs.rename(tmp, dst):
            raise IOError(f"atomic rename failed for {path}")

    def _read_text(self, path: str) -> str | None:
        fs = self._fs()
        jp = self._jpath(path)
        if not fs.exists(jp):
            return None
        # the copy must run JVM-side: py4j passes byte[] by value, so
        # java.io-style read(buf) calls can never fill a Python buffer
        jvm = self.spark._jvm
        stream = fs.open(jp)
        try:
            baos = jvm.java.io.ByteArrayOutputStream()
            jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 65536, False)
            return baos.toString("UTF-8")
        finally:
            stream.close()

    def _list_parquet(self, directory: str) -> list[str]:
        """Data files under ``directory``, as table-relative paths."""
        fs = self._fs()
        it = fs.listFiles(self._jpath(directory), True)
        out = []
        while it.hasNext():
            f = it.next()
            name = f.getPath().getName()
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                uri = f.getPath().toUri()
                out.append(self._relativize(uri.getPath()))
        return sorted(out)

    def _relativize(self, abs_path: str) -> str:
        root = urlparse(self.path).path or self.path
        if not abs_path.startswith(root.rstrip("/") + "/"):
            raise ValueError(f"{abs_path} is outside table root {root}")
        return abs_path[len(root.rstrip("/")) + 1 :]

    def _absolute(self, rel: str) -> str:
        return posixpath.join(self.path, rel)

    # ------------------------------------------------------------ manifests
    def current_version(self) -> int | None:
        txt = self._read_text(f"{self.meta_dir}/{CURRENT_PTR}")
        return int(txt) if txt is not None else None

    def _manifest(self, version: int) -> dict:
        txt = self._read_text(f"{self.meta_dir}/v{version}.json")
        if txt is None:
            raise ValueError(
                f"snapshot v{version} does not exist (expired or never written)"
            )
        return json.loads(txt)

    def _commit(self, operation: str, files: list[str], schema: T.StructType,
                parent: int | None) -> int:
        version = (parent or 0) + 1
        man = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "files": files,
            "schema": schema.jsonValue(),
        }
        self._write_text(f"{self.meta_dir}/v{version}.json", json.dumps(man))
        # the pointer flip is the commit point; a crash before it leaves
        # an unreferenced manifest + files (cleaned by expire_snapshots),
        # never a torn table
        self._write_text(f"{self.meta_dir}/{CURRENT_PTR}", str(version))
        return version

    def _write_commit_files(self, df: DataFrame, version: int) -> list[str]:
        cdir = f"{self.data_dir}/c{version}"
        df.write.mode("error").parquet(cdir)
        return self._list_parquet(cdir)

    # ------------------------------------------------------------ public
    def create(self, df: DataFrame) -> int:
        """Initial snapshot (v1). Fails if the table already exists."""
        if self.current_version() is not None:
            raise ValueError(f"table {self.path} already exists")
        files = self._write_commit_files(df, 1)
        return self._commit("create", files, df.schema, None)

    def append(self, df: DataFrame) -> int:
        """New snapshot = parent's files + the appended files. No
        existing file is read or rewritten — O(new data) cost."""
        parent = self._require_current()
        man = self._manifest(parent)
        self._check_schema(df, man)
        version = parent + 1
        new_files = self._write_commit_files(df, version)
        return self._commit("append", man["files"] + new_files, df.schema, parent)

    def overwrite(self, df: DataFrame) -> int:
        """Full logical replace; prior files stay on disk for time
        travel until expired."""
        parent = self._require_current()
        version = parent + 1
        files = self._write_commit_files(df, version)
        return self._commit("overwrite", files, df.schema, parent)

    def delete_where(self, cond: Column) -> int:
        """Copy-on-write delete: rewrite ONLY the files containing rows
        matching ``cond``; every other file is carried by reference.

        The touched-file set is one distinct-aggregate over the matching
        rows' ``input_file_name()`` — cost ∝ matching files, and with a
        partition/sort layout aligned to the predicate (e.g.
        ``zorder_write`` on the filter columns) parquet row-group stats
        keep even the discovery scan pruned."""
        parent = self._require_current()
        man = self._manifest(parent)
        current = self._read_manifest_files(man)
        tagged = current.withColumn("_file", F.input_file_name())
        touched_abs = {
            urlparse(r["_file"]).path
            for r in tagged.where(cond).select("_file").distinct().collect()
        }
        touched = {self._relativize(p) for p in touched_abs}
        if not touched:
            # nothing matched: still commit a snapshot so the operation
            # is observable + idempotent in the history
            return self._commit("delete", man["files"], current.schema, parent)
        version = parent + 1
        survivors = (
            self._read_files(sorted(touched), man)
            .where(~cond)
        )
        new_files = self._write_commit_files(survivors, version)
        kept = [f for f in man["files"] if f not in touched]
        return self._commit("delete", kept + new_files, current.schema, parent)

    def read(self, version: int | None = None) -> DataFrame:
        """Scan snapshot ``version`` (default: current). An ordinary
        parquet read of the manifest's file list — pushdown and column
        pruning apply as on any parquet scan."""
        v = version if version is not None else self._require_current()
        man = self._manifest(v)
        return self._read_manifest_files(man)

    def rollback(self, version: int) -> int:
        """Append-only rollback: commit a NEW snapshot whose file set
        (and schema) is ``version``'s. History is never rewritten."""
        parent = self._require_current()
        man = self._manifest(version)
        return self._commit(
            "rollback",
            man["files"],
            T.StructType.fromJson(man["schema"]),
            parent,
        )

    def history(self) -> list[dict]:
        """Newest-first [{version, parent, operation, n_files}] for every
        retained snapshot."""
        out = []
        v = self.current_version()
        seen = set()
        while v is not None and v not in seen:
            seen.add(v)
            try:
                man = self._manifest(v)
            except ValueError:
                break  # expired tail
            out.append(
                {
                    "version": man["version"],
                    "parent": man["parent"],
                    "operation": man["operation"],
                    "n_files": len(man["files"]),
                }
            )
            v = man["parent"]
        return out

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshots' manifests and
        physically delete every data file no retained manifest
        references. Returns {"manifests": n, "files": n} removed."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        current = self._require_current()
        chain = [h["version"] for h in self.history()]
        keep = set(chain[:keep_last])
        keep.add(current)
        live: set[str] = set()
        for v in keep:
            live.update(self._manifest(v)["files"])
        fs = self._fs()
        n_manifests = n_files = 0
        # drop unreferenced manifests (both pre-keep chain and any
        # orphans from crashed commits)
        it = fs.listStatus(self._jpath(self.meta_dir))
        for st in it:
            name = st.getPath().getName()
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            v = int(name[1:-5])
            if v not in keep:
                fs.delete(st.getPath(), False)
                n_manifests += 1
        for rel in self._list_parquet(self.data_dir):
            if rel not in live:
                fs.delete(self._jpath(self._absolute(rel)), False)
                n_files += 1
        return {"manifests": n_manifests, "files": n_files}

    def diff_versions(
        self, v_old: int, v_new: int, key_cols: list[str]
    ) -> DataFrame:
        """Change-data-capture between two snapshots: one full-outer
        join on ``key_cols`` comparing a non-key row digest. Output:
        the key columns + ``op`` ∈ {insert, delete, update} (unchanged
        rows are absent). Mirrors Iceberg's changelog read, derived
        purely from the two manifests' file sets — files shared by both
        snapshots COULD be skipped entirely (their rows can only
        compare equal); kept simple here since the join already prunes
        to key+digest columns.

        Key uniqueness per snapshot is the caller's contract (validate
        with ``operators.profile.validate_table(unique=...)``); under
        duplicate keys a full-outer join would fan out."""
        old_df, new_df = self.read(v_old), self.read(v_new)
        val_cols = [c for c in new_df.columns if c not in key_cols]
        if [c for c in old_df.columns] != [c for c in new_df.columns]:
            raise ValueError("diff_versions requires matching schemas")

        def digested(df: DataFrame, tag: str) -> DataFrame:
            dg = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in val_cols]))
            return df.select(*key_cols, dg.alias(f"_dg_{tag}"))

        j = digested(old_df, "o").join(
            digested(new_df, "n"), list(key_cols), "full_outer"
        )
        op = (
            F.when(F.col("_dg_o").isNull(), F.lit("insert"))
            .when(F.col("_dg_n").isNull(), F.lit("delete"))
            .when(F.col("_dg_o") != F.col("_dg_n"), F.lit("update"))
        )
        return (
            j.select(*key_cols, op.alias("op"))
            .where(F.col("op").isNotNull())
        )

    # ------------------------------------------------------------ helpers
    def _require_current(self) -> int:
        v = self.current_version()
        if v is None:
            raise ValueError(f"table {self.path} does not exist (create first)")
        return v

    def _check_schema(self, df: DataFrame, man: dict) -> None:
        stored = T.StructType.fromJson(man["schema"])
        if [f.name for f in df.schema.fields] != [f.name for f in stored.fields]:
            raise ValueError(
                f"append schema {df.schema.fieldNames()} does not match "
                f"table schema {stored.fieldNames()}"
            )

    def _read_manifest_files(self, man: dict) -> DataFrame:
        return self._read_files(man["files"], man)

    def _read_files(self, files: list[str], man: dict) -> DataFrame:
        schema = T.StructType.fromJson(man["schema"])
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(
            *[self._absolute(f) for f in files]
        )
