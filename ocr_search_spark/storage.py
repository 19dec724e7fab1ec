"""Table-level MERGE emulation with partition-pruned rewrites.

`operators.maintenance.upsert_by_key` / `delete_by_key` are pure plans —
applied naively to a stored table they rewrite the WHOLE table, which at
100 TB rewrites the world for a 1-row upsert. The production answer is a
table format with MERGE INTO (Iceberg/Delta); without those jars this
module provides the same contract on plain parquet:

* the table is partitioned by ``bucket = pmod(xxhash64(key cols), n)``
  — deterministic from the merge key, so an updated row always lands in
  the same bucket as the row it replaces;
* ``upsert``/``delete`` first compute the distinct buckets touched by
  the updates (bounded driver-side list, ≤ n_buckets ints), read ONLY
  those partitions (partition pruning on the bucket column), merge, and
  dynamic-partition-overwrite ONLY those partitions;
* untouched partitions' files are never opened, let alone rewritten —
  byte-identity is asserted in tests/test_storage.py.

Reference: the Mongo per-row upserts of DbInterface.class.js:236-251 /
:366-381 give per-document update cost; this gives per-bucket cost with
set-oriented execution, the scalable analogue.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.maintenance import delete_by_key, upsert_by_key

BUCKET_COL = "_mbucket"
META_FILE = "_bucketed_table_meta.json"


class BucketedTable:
    """A parquet table bucketed by merge key for partition-pruned MERGE."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        n_buckets: int = 64,
        bucket_keys: list[str] | None = None,
    ):
        """``keys`` = the MERGE key (row identity). ``bucket_keys``
        (default: keys) = the partition-pruning key; must be a subset of
        ``keys`` so an updated row always lands in its old row's bucket.
        Bucketing postings by ``doc_id`` alone while merging on
        ``(term, doc_id)`` colocates each document's rows — a doc-level
        replace then touches only that doc's bucket."""
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.bucket_keys = list(bucket_keys) if bucket_keys is not None else list(keys)
        if not set(self.bucket_keys) <= set(self.keys):
            raise ValueError(
                f"bucket_keys {self.bucket_keys} must be a subset of keys {self.keys}"
            )
        self.n_buckets = n_buckets

    # ------------------------------------------------------------ helpers
    def _bucket(self) -> F.Column:
        return F.pmod(F.xxhash64(*self.bucket_keys), F.lit(self.n_buckets)).cast("int")

    def _touched_buckets(self, updates: DataFrame) -> list[int]:
        """Distinct buckets of the update keys — bounded by n_buckets, so
        the collect ships at most n_buckets ints to the driver (this is
        partition *pruning* metadata, not data)."""
        rows = (
            updates.select(self._bucket().alias(BUCKET_COL)).distinct().collect()
        )
        return sorted(r[BUCKET_COL] for r in rows)

    def _overwrite_buckets(self, df: DataFrame) -> None:
        mode = self.spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(self.path)
        finally:
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", mode)

    # ------------------------------------------------------------ public
    def init(self, df: DataFrame) -> None:
        """Full initial load (the only whole-table write); persists the
        bucket-layout metadata the mutation guard verifies."""
        self._overwrite_buckets(df.withColumn(BUCKET_COL, self._bucket()))
        self._write_meta()

    def read(self) -> DataFrame:
        raw = self.spark.read.parquet(self.path)
        return raw.select([c for c in raw.columns if c != BUCKET_COL])

    def upsert(self, updates: DataFrame, version_col: str | None = None) -> list[int]:
        """MERGE: last-writer-wins upsert of ``updates`` on the table
        keys, rewriting only the buckets the update keys hash into.
        Returns the list of rewritten buckets."""
        self._check_meta()
        touched = self._touched_buckets(updates)
        if not touched:
            return []
        raw = self.spark.read.parquet(self.path)
        cols = [c for c in raw.columns if c != BUCKET_COL]
        current = raw.where(F.col(BUCKET_COL).isin(touched)).select(cols)
        merged = upsert_by_key(current, updates.select(cols), self.keys, version_col)
        self._overwrite_buckets(merged.withColumn(BUCKET_COL, self._bucket()))
        return touched

    def exists(self) -> bool:
        jvm = self.spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(self.path)
        return p.getFileSystem(self.spark._jsc.hadoopConfiguration()).exists(p)

    # --------------------------------------------------------- meta guard
    # The bucket layout is a durable property of the TABLE, not of the
    # handle: reopening with a different n_buckets/keys and merging would
    # scatter new row versions into buckets their old versions don't live
    # in — silent corruption. init() persists the layout; every mutation
    # verifies it.
    def _meta_path(self):
        jvm = self.spark._jvm
        return jvm.org.apache.hadoop.fs.Path(f"{self.path}/{META_FILE}")

    def _write_meta(self) -> None:
        p = self._meta_path()
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        out = fs.create(p, True)
        out.write(
            json.dumps(
                {
                    "keys": self.keys,
                    "bucket_keys": self.bucket_keys,
                    "n_buckets": self.n_buckets,
                }
            ).encode("utf-8")
        )
        out.close()

    def _check_meta(self) -> None:
        p = self._meta_path()
        fs = p.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if not fs.exists(p):
            return  # pre-guard table (or external layout): trust the caller
        stream = fs.open(p)
        try:
            raw = bytes(
                self.spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
            )
        finally:
            stream.close()
        meta = json.loads(raw.decode("utf-8"))
        mine = {
            "keys": self.keys,
            "bucket_keys": self.bucket_keys,
            "n_buckets": self.n_buckets,
        }
        if meta != mine:
            raise ValueError(
                f"bucket layout mismatch for {self.path}: table was created "
                f"with {meta}, handle configured with {mine} — merging would "
                "scatter rows across incompatible buckets"
            )

    def replace_group(self, updates: DataFrame, group_keys: list[str]) -> list[int]:
        """Group-level replace: every group (e.g. a doc_id) present in
        ``updates`` has ALL its existing rows dropped and the update rows
        inserted — the MERGE shape of re-processing a changed document,
        whose new token set need not overlap its old one. Requires
        ``bucket_keys ⊆ group_keys`` so a group lives entirely inside its
        buckets; rewrites only those buckets. Idempotent: re-applying the
        same updates (e.g. a replayed foreachBatch) reproduces the same
        table state. The table must exist (``init`` first — see
        ``exists()``; streaming callers guard on it)."""
        self._check_meta()
        if not set(self.bucket_keys) <= set(group_keys):
            raise ValueError(
                f"group_keys {group_keys} must contain bucket_keys "
                f"{self.bucket_keys} (a group must not span buckets)"
            )
        touched = self._touched_buckets(updates)
        if not touched:
            return []
        raw = self.spark.read.parquet(self.path)
        cols = [c for c in raw.columns if c != BUCKET_COL]
        current = raw.where(F.col(BUCKET_COL).isin(touched)).select(cols)
        groups = updates.select(*group_keys).distinct()
        remaining = current.join(groups, group_keys, "left_anti").select(cols)
        merged = remaining.unionByName(updates.select(cols))
        self._overwrite_buckets(merged.withColumn(BUCKET_COL, self._bucket()))
        return touched

    def delete(self, doomed_keys: DataFrame) -> list[int]:
        """MERGE … WHEN MATCHED DELETE, partition-pruned the same way.

        A bucket whose every row is deleted needs special care: dynamic
        partition overwrite only replaces partitions PRESENT in the
        written data, so an empty bucket would silently keep its stale
        files — those partitions are dropped through the Hadoop FS API
        instead (works on any FileSystem implementation)."""
        self._check_meta()
        touched = self._touched_buckets(doomed_keys.select(*self.keys))
        if not touched:
            return []
        raw = self.spark.read.parquet(self.path)
        cols = [c for c in raw.columns if c != BUCKET_COL]
        current = raw.where(F.col(BUCKET_COL).isin(touched)).select(cols)
        remaining = delete_by_key(current, doomed_keys, self.keys).withColumn(
            BUCKET_COL, self._bucket()
        )
        nonempty = {
            r[BUCKET_COL]
            for r in remaining.select(BUCKET_COL).distinct().collect()
        }
        if nonempty:
            self._overwrite_buckets(remaining.where(F.col(BUCKET_COL).isin(sorted(nonempty))))
        jvm = self.spark._jvm
        hconf = self.spark._jsc.hadoopConfiguration()
        for b in sorted(set(touched) - nonempty):
            p = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{BUCKET_COL}={b}")
            p.getFileSystem(hconf).delete(p, True)
        return touched
