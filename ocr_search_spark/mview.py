"""Incrementally-maintained materialized GROUP BY views over the
snapshot log.

A training-data pipeline keeps running aggregates over a corpus that
grows by append commits (per-source doc counts, token totals, quality
histograms). Recomputing them per refresh scans the whole table;
maintaining them by hand invites drift. This module gives the standard
lakehouse answer (incremental view maintenance over the table's own
changelog):

* the VIEW is itself a :class:`~ocr_search_spark.storage_snapshots.
  SnapshotTable` holding (keys..., n, sum_<col>...) rows;
* ``refresh()`` reads ONLY the source commits since the last refresh
  (``incremental_scan`` — the manifest file-set delta, cost ∝ new
  data), aggregates the delta, joins it against the CURRENT state of
  just the changed keys, and MERGEs the new totals — count/sum are
  abelian, so delta-merge equals a full recompute EXACTLY (DECIMAL
  sums, long counts, no floats);
* the source-version watermark rides INSIDE the view's commit
  (``info.source_version``), so refresh is crash-atomic: either the
  merge and the watermark both land (the pointer flip) or neither —
  a re-run can never double-apply a delta;
* a source range containing non-append commits (delete/overwrite/
  merge/replace) cannot be expressed as a row delta by the file-set
  changelog — refresh detects it and falls back to a FULL recompute,
  recorded as ``info.mode = "full"`` (explicit, never silent).

At 10^12 rows: a refresh after an append wave costs one scan of the
NEW files plus a COW merge of the view's touched files (state is
O(distinct keys), orders of magnitude smaller than data). The view's
own history gives time-travel over the aggregate for free.

Reference parity: the reference keeps no aggregates at all (every
count is a live Mongo query, DbInterface.class.js); materialized views
are part of the lakehouse tier this engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .storage_snapshots import SnapshotTable

_DEC_SUM = "decimal(28,6)"  # exact, JSON-safe once cast to string output


class MaterializedAggregate:
    """(keys..., n, sum_<col>...) view of ``source``, refreshed
    incrementally from the snapshot changelog."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        source: SnapshotTable,
        keys: list[str],
        sum_cols: list[str] | None = None,
    ):
        if not keys:
            raise ValueError("at least one group key is required")
        self.spark = spark
        self.view = SnapshotTable(spark, path)
        self.source = source
        self.keys = list(keys)
        self.sum_cols = list(sum_cols or [])

    # ------------------------------------------------------------ state
    def _agg(self, df: DataFrame) -> DataFrame:
        aggs = [F.count("*").cast("long").alias("n")] + [
            # sum() widens decimal precision; pin the state schema so
            # full-recompute and incremental commits agree exactly
            F.sum(F.col(c).cast(_DEC_SUM)).cast(_DEC_SUM).alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        return df.groupBy(*self.keys).agg(*aggs)

    def last_source_version(self) -> int | None:
        v = self.view.current_version()
        if v is None:
            return None
        info = self.view._manifest(v).get("info") or {}
        sv = info.get("source_version")
        if sv is None:
            raise ValueError(
                f"{self.view.path} exists but carries no source_version "
                "watermark — not a MaterializedAggregate state table"
            )
        return int(sv)

    def read(self) -> DataFrame:
        return self.view.read()

    # ---------------------------------------------------------- refresh
    def refresh(self) -> int:
        """Bring the view up to the source's current version; returns
        the view version (unchanged if already current)."""
        cur = self.source.current_version()
        if cur is None:
            raise ValueError(f"source table {self.source.path} is empty")
        last = self.last_source_version()
        if last == cur:
            return self.view.current_version()
        info = {"source_version": cur}
        if last is None:
            state = self._agg(self.source.read())
            return self.view.create(state, info={**info, "mode": "full"})
        try:
            delta = self.source.incremental_scan(last, cur).drop(
                "_commit_version"
            )
        except ValueError:
            # non-append commits in range: a file-set changelog cannot
            # express them as a row delta — recompute, explicitly
            state = self._agg(self.source.read())
            return self.view.overwrite(state, info={**info, "mode": "full"})
        d = self._agg(delta)
        old = self.view.read().select(
            *self.keys,
            F.col("n").alias("_n_old"),
            *[F.col(f"sum_{c}").alias(f"_s_old_{c}") for c in self.sum_cols],
        )
        totals = d.join(old, self.keys, "left").select(
            *self.keys,
            (F.col("n") + F.coalesce(F.col("_n_old"), F.lit(0))).alias("n"),
            *[
                (
                    F.col(f"sum_{c}").cast(_DEC_SUM)
                    + F.coalesce(
                        F.col(f"_s_old_{c}"), F.lit(0).cast(_DEC_SUM)
                    )
                ).cast(_DEC_SUM).alias(f"sum_{c}")
                for c in self.sum_cols
            ],
        )
        return self.view.merge(
            totals, self.keys, info={**info, "mode": "incremental"}
        )
