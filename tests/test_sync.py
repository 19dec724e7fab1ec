"""sync_once: the poll-diff-process loop end-to-end — add, modify,
delete, idempotence (byte-identical tables on a no-change poll)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_search_spark import corpus, sync
from ocr_search_spark.operators.extract import extract_spans_columnar
from ocr_search_spark.operators.tokenize import term_postings
from tests.test_storage import _file_state


def _write_file(docs, path):
    docs.repartition(1).write.mode("overwrite").parquet(path + ".tmp")
    import glob
    import shutil

    part = glob.glob(path + ".tmp/part-*.parquet")[0]
    shutil.move(part, path)
    shutil.rmtree(path + ".tmp")


def test_sync_add_modify_delete_idempotent(spark, tmp_path):
    source = str(tmp_path / "source")
    wh = str(tmp_path / "wh")
    os.makedirs(source)
    all_docs = corpus.documents_table(spark, 60, skew=False).cache()
    ids = sorted(r["doc_id"] for r in all_docs.select("doc_id").collect())
    third = len(ids) // 3
    f1 = all_docs.where(F.col("doc_id").isin(ids[:third]))
    f2 = all_docs.where(F.col("doc_id").isin(ids[third : 2 * third]))
    f3 = all_docs.where(F.col("doc_id").isin(ids[2 * third :]))
    _write_file(f1, f"{source}/f1.parquet")
    _write_file(f2, f"{source}/f2.parquet")

    out = sync.sync_once(spark, source, wh)
    assert out == {"added": 2, "modified": 0, "deleted": 0}
    posts = sync.postings_table(spark, f"{wh}/postings", 32)

    def expect(docs):
        return term_postings(
            extract_spans_columnar(docs.select("doc_id", "spans"))
        )

    got = posts.read()
    want = expect(f1.unionByName(f2))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # no-change poll: zero work, every table file byte-identical
    before = _file_state(wh)
    assert sync.sync_once(spark, source, wh) == {
        "added": 0, "modified": 0, "deleted": 0,
    }
    assert _file_state(wh) == before

    # modify f1 (new doc versions), add f3, delete f2
    f1b = f1.withColumn(
        "spans",
        F.concat(
            F.array(
                F.struct(
                    F.lit("text").alias("kind"),
                    F.lit("resynced fresh content").alias("text"),
                    F.lit("").alias("media_ref"),
                    F.lit(0).cast("int").alias("offset"),
                )
            ),
            F.transform(
                "spans",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    (s["offset"] + 1).cast("int").alias("offset"),
                ),
            ),
        ),
    )
    _write_file(f1b, f"{source}/f1.parquet")
    os.utime(f"{source}/f1.parquet", (2_000_000_000, 2_000_000_000))
    _write_file(f3, f"{source}/f3.parquet")
    os.remove(f"{source}/f2.parquet")

    out = sync.sync_once(spark, source, wh)
    assert out == {"added": 1, "modified": 1, "deleted": 1}
    got = posts.read()
    want = expect(f1b.unionByName(f3))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # f2's docs are fully gone
    f2_ids = [r["doc_id"] for r in f2.select("doc_id").collect()]
    assert got.where(F.col("doc_id").isin(f2_ids)).count() == 0


def test_cli_tokenizer_train_both_algos(spark, tmp_path, capsys, monkeypatch):
    import json

    import ocr_search_spark.jobs as jobs
    import ocr_search_spark.session as session

    monkeypatch.setattr(session, "get_spark", lambda *a, **k: spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    rc = jobs.main(["tokenizer-train", "--input", src,
                    "--out", str(tmp_path / "uni"), "--vocab-size", "30",
                    "--iters", "1"])
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out1["algo"] == "unigram" and out1["pieces"] > 0
    assert spark.read.parquet(str(tmp_path / "uni")).columns == ["piece", "cnt", "score_e6"]

    rc = jobs.main(["tokenizer-train", "--input", src,
                    "--out", str(tmp_path / "bpe"), "--algo", "bpe",
                    "--vocab-size", "5"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out2["algo"] == "bpe" and out2["merges"] > 0


def test_sync_bulk_scan_path_equals_per_file(spark, tmp_path, monkeypatch):
    """Cold-start syncs past _SMALL_POLL_FILES take the one-scan +
    semi-join ingest (no driver path lists); forcing that path on a
    small source must produce tables identical to the per-file route,
    including a subdirectory and a space-bearing file name (the
    input_file_name URL-encoding hazard)."""
    monkeypatch.setattr(sync, "_SMALL_POLL_FILES", 0)
    source = str(tmp_path / "source")
    wh = str(tmp_path / "wh")
    os.makedirs(f"{source}/nested")
    all_docs = corpus.documents_table(spark, 30, skew=False).cache()
    ids = sorted(r["doc_id"] for r in all_docs.select("doc_id").collect())
    half = len(ids) // 2
    f1 = all_docs.where(F.col("doc_id").isin(ids[:half]))
    f2 = all_docs.where(F.col("doc_id").isin(ids[half:]))
    _write_file(f1, f"{source}/nested/f one.parquet")
    _write_file(f2, f"{source}/f2.parquet")

    out = sync.sync_once(spark, source, wh)
    assert out == {"added": 2, "modified": 0, "deleted": 0}
    posts = sync.postings_table(spark, f"{wh}/postings", 32)
    got = posts.read()
    want = term_postings(
        extract_spans_columnar(all_docs.select("doc_id", "spans"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # membership carries the decoded RELATIVE path for every file
    mem = sync.membership_table(spark, f"{wh}/membership")
    paths = {r["path"] for r in mem.read().select("path").distinct().collect()}
    assert paths == {"nested/f one.parquet", "f2.parquet"}
    # deletion driven off the DataFrame diff: drop one file, docs cascade
    os.remove(f"{source}/f2.parquet")
    out = sync.sync_once(spark, source, wh)
    assert out == {"added": 0, "modified": 0, "deleted": 1}
    f2_ids = [r["doc_id"] for r in f2.select("doc_id").collect()]
    assert posts.read().where(F.col("doc_id").isin(f2_ids)).count() == 0


def test_sync_bulk_plus_in_filename_not_dropped(spark, tmp_path, monkeypatch):
    """A literal '+' in a file name survives the bulk-scan path decode.
    input_file_name() leaves '+' unescaped while url_decode treats it
    as an encoded space — without the %2B shield the file's docs were
    silently dropped from postings/membership while the filelib still
    recorded its mtime (permanent data loss on every later poll)."""
    monkeypatch.setattr(sync, "_SMALL_POLL_FILES", 0)
    source = str(tmp_path / "source")
    wh = str(tmp_path / "wh")
    os.makedirs(source)
    all_docs = corpus.documents_table(spark, 20, skew=False).cache()
    ids = sorted(r["doc_id"] for r in all_docs.select("doc_id").collect())
    half = len(ids) // 2
    f1 = all_docs.where(F.col("doc_id").isin(ids[:half]))
    f2 = all_docs.where(F.col("doc_id").isin(ids[half:]))
    _write_file(f1, f"{source}/a+b.parquet")
    _write_file(f2, f"{source}/c %41+d.parquet")

    out = sync.sync_once(spark, source, wh)
    assert out == {"added": 2, "modified": 0, "deleted": 0}
    posts = sync.postings_table(spark, f"{wh}/postings", 32)
    got = posts.read()
    want = term_postings(
        extract_spans_columnar(all_docs.select("doc_id", "spans"))
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    mem = sync.membership_table(spark, f"{wh}/membership")
    paths = {r["path"] for r in mem.read().select("path").distinct().collect()}
    assert paths == {"a+b.parquet", "c %41+d.parquet"}


def test_sync_bulk_driver_collects_stay_bounded(spark, tmp_path, monkeypatch):
    """SCALE.md rule 3 as a regression test: a bulk sync over N files
    must never materialize a path list on the driver — every collect()
    during the poll returns a row count bounded by configuration
    (status classes, bucket ids), independent of N (=40 here)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Spark 4: the concrete class (pyspark.sql.classic) overrides the
    # public DataFrame ABC — patch the class whose collect actually runs
    from pyspark.sql.classic.dataframe import DataFrame

    monkeypatch.setattr(sync, "_SMALL_POLL_FILES", 0)
    source = str(tmp_path / "source")
    os.makedirs(source)
    span_t = pa.list_(pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ]))
    n_files = 40
    for i in range(n_files):
        tbl = pa.table({
            "doc_id": pa.array([i * 10 + j for j in range(3)], pa.int64()),
            "spans": pa.array(
                [[{"kind": "text", "text": f"alpha beta doc{i} row{j}",
                   "media_ref": "", "offset": 0}] for j in range(3)],
                span_t),
        })
        pq.write_table(tbl, f"{source}/f{i:03d}.parquet")

    sizes = []
    orig = DataFrame.collect

    def counting_collect(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    out = sync.sync_once(spark, source, str(tmp_path / "wh"))
    assert out == {"added": n_files, "modified": 0, "deleted": 0}
    assert sizes, "expected at least the status-count collect"
    # every driver materialization is config-bounded: 3 status classes /
    # 32 bucket ids — never the 40-path change set
    assert max(sizes) < n_files, sizes
