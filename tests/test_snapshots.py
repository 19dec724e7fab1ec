"""SnapshotTable: time travel, COW delete file-granularity, rollback,
expiry GC — with byte-identity assertions on untouched files."""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from ocr_search_spark.storage_snapshots import SnapshotTable


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.lit(tag).alias("tag"),
    )


def _file_digests(root):
    out = {}
    for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True):
        with open(p, "rb") as fh:
            out[os.path.relpath(p, root)] = hashlib.sha256(fh.read()).hexdigest()
    return out


@pytest.fixture()
def table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "snap"))
    t.create(_df(spark, 0, 100, "base").repartition(4))
    return t


def test_create_append_time_travel(spark, table):
    v2 = table.append(_df(spark, 100, 150, "extra"))
    assert v2 == 2
    assert table.read().count() == 150
    assert table.read(version=1).count() == 100  # time travel
    assert table.read(version=1).where("tag = 'extra'").count() == 0
    hist = table.history()
    assert [h["version"] for h in hist] == [2, 1]
    assert hist[0]["operation"] == "append"


def test_append_never_rewrites_existing_files(spark, table, tmp_path):
    before = _file_digests(str(tmp_path / "snap"))
    table.append(_df(spark, 100, 120, "extra"))
    after = _file_digests(str(tmp_path / "snap"))
    for rel, digest in before.items():
        assert after[rel] == digest  # immutable data files


def test_overwrite_keeps_history(spark, table):
    table.overwrite(_df(spark, 0, 10, "new"))
    assert table.read().count() == 10
    assert table.read(version=1).count() == 100


def test_delete_where_is_file_granular(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "snap"))
    # k controls the file: repartition on a range so files partition k-space
    df = _df(spark, 0, 100, "base").repartitionByRange(4, "k")
    t.create(df)
    before = _file_digests(str(tmp_path / "snap"))
    t.delete_where(F.col("k") < 5)  # hits exactly one range file
    out = t.read()
    assert out.count() == 95
    assert out.where("k < 5").count() == 0
    assert t.read(version=1).count() == 100
    # v1 files are immutable: every one is still on disk byte-identical
    # (the touched one is retained for time travel, just de-referenced)
    after = _file_digests(str(tmp_path / "snap"))
    assert all(after.get(r) == d for r, d in before.items())
    # exactly 3 of the 4 range files are carried by reference into v2;
    # the k<5 file is replaced by rewritten c2 files
    man_files = set(t._manifest(2)["files"])
    carried = man_files & set(before)
    assert len(carried) == 3
    assert any(f.startswith("data/c2/") for f in man_files)


def test_delete_where_no_match_commits_noop_snapshot(spark, table):
    v = table.delete_where(F.col("k") > 10_000)
    assert v == 2
    assert table.read().count() == 100
    assert table.history()[0]["operation"] == "delete"


def test_rollback_is_append_only(spark, table):
    table.overwrite(_df(spark, 0, 5, "new"))
    v3 = table.rollback(1)
    assert v3 == 3
    assert table.read().count() == 100
    assert [h["version"] for h in table.history()] == [3, 2, 1]


def test_expire_snapshots_gc(spark, table, tmp_path):
    table.overwrite(_df(spark, 0, 10, "new"))
    table.append(_df(spark, 10, 20, "more"))
    removed = table.expire_snapshots(keep_last=1)
    assert removed["manifests"] == 2
    assert removed["files"] > 0  # v1's 4 files are unreferenced now
    assert table.read().count() == 20  # current still intact
    with pytest.raises(ValueError):
        table.read(version=1)
    # expiry never breaks any retained version
    assert table.history()[0]["version"] == 3


def test_create_twice_and_missing_read_raise(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "snap"))
    with pytest.raises(ValueError):
        t.read()
    t.create(_df(spark, 0, 5, "x"))
    with pytest.raises(ValueError):
        t.create(_df(spark, 0, 5, "x"))


def test_append_schema_mismatch_raises(spark, table):
    bad = spark.range(5).select(F.col("id").alias("other"))
    with pytest.raises(ValueError):
        table.append(bad)


def test_diff_versions_cdc(spark, table):
    # v2: delete k<10 (10 deletes), then v3: append 100..120 (inserts)
    # and overwrite is avoided so untouched rows stay identical
    table.delete_where(F.col("k") < 10)
    v2 = table.current_version()
    table.append(_df(spark, 100, 120, "extra"))
    v3 = table.current_version()
    d12 = {(r["k"], r["op"]) for r in table.diff_versions(1, v2, ["k"]).collect()}
    assert d12 == {(k, "delete") for k in range(10)}
    d23 = {(r["k"], r["op"]) for r in table.diff_versions(v2, v3, ["k"]).collect()}
    assert d23 == {(k, "insert") for k in range(100, 120)}
    # update detection: rewrite the table with one changed value
    cur = table.read()
    mod = cur.withColumn(
        "v", F.when(F.col("k") == 50, F.lit(-1)).otherwise(F.col("v"))
    )
    table.overwrite(mod)
    v4 = table.current_version()
    d34 = {(r["k"], r["op"]) for r in table.diff_versions(v3, v4, ["k"]).collect()}
    assert d34 == {(50, "update")}
    # symmetric sanity: empty diff of a version with itself
    assert table.diff_versions(v4, v4, ["k"]).count() == 0
