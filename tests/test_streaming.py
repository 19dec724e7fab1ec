"""Structured Streaming ingest tests: incremental extraction exactly-once
across restarts (the S5 poll-loop replacement) and watermarked windowed
aggregation equivalence with the batch twin."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ocr_search_spark import corpus
from ocr_search_spark.streaming import ingest


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    yield d
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_stream_extract_incremental(spark, dirs):
    docs1 = corpus.documents_table(spark, 80, skew=False)
    docs1.write.mode("append").parquet(dirs["in"])
    ingest.stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out1 = spark.read.parquet(dirs["out"])
    assert out1.count() == 80

    # new files arrive; a restarted AvailableNow run processes ONLY them
    docs2 = corpus.documents_table(spark, 120, skew=False).where(
        ~F.col("doc_id").isin([r["doc_id"] for r in docs1.select("doc_id").collect()])
    )
    n_new = docs2.count()
    docs2.write.mode("append").parquet(dirs["in"])
    ingest.stream_extract(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == 80 + n_new
    # exactly-once: no doc extracted twice
    assert out2.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    # output matches the batch extraction of the same input
    from ocr_search_spark.operators.extract import extract_spans_columnar

    batch = extract_spans_columnar(spark.read.parquet(dirs["in"]))
    flat = lambda df: df.select(  # noqa: E731
        "doc_id", F.posexplode("spans").alias("p", "s")
    ).select("doc_id", "p", "s.*")
    assert flat(batch).exceptAll(flat(out2)).count() == 0


def test_stream_extract_kill_and_resume(spark, dirs):
    """Exactly-once across a MID-RUN kill: the backlog is split into many
    micro-batches (maxFilesPerTrigger=1), the query is stopped after the
    first commit, and a restarted run with the same checkpoint must end
    with every doc extracted exactly once, equal to the batch twin —
    regardless of where the kill landed."""
    import shutil
    import time

    docs = corpus.documents_table(spark, 200, skew=False)
    # many single-file micro-batches → the stop lands mid-backlog with
    # overwhelming probability; retried (fresh state) if a fast idle host
    # still commits everything before the stop takes effect (q.stop() is
    # not instantaneous — see ADVICE r2)
    docs.repartition(32).write.mode("append").parquet(dirs["in"])

    partial = 200
    for _attempt in range(3):
        shutil.rmtree(dirs["out"], ignore_errors=True)
        shutil.rmtree(dirs["ckpt"], ignore_errors=True)
        q = ingest.stream_extract(
            spark,
            dirs["in"],
            dirs["out"],
            dirs["ckpt"],
            await_termination=False,
            max_files_per_trigger=1,
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p is not None and p["numInputRows"] > 0:
                break
            time.sleep(0.05)
        q.stop()  # kill with part of the backlog committed, part not
        q.awaitTermination()
        try:
            partial = spark.read.parquet(dirs["out"]).count()
        except Exception:
            partial = 0
        if partial < 200:
            break
    assert partial < 200, "kill landed after full completion on 3 attempts"

    # resume from the same checkpoint: processes exactly the remainder
    ingest.stream_extract(
        spark, dirs["in"], dirs["out"], dirs["ckpt"], max_files_per_trigger=1
    )
    out = spark.read.parquet(dirs["out"])
    assert out.count() == 200
    assert out.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0

    from ocr_search_spark.operators.extract import extract_spans_columnar

    batch = extract_spans_columnar(spark.read.parquet(dirs["in"]))
    flat = lambda df: df.select(  # noqa: E731
        "doc_id", F.posexplode("spans").alias("p", "s")
    ).select("doc_id", "p", "s.*")
    assert flat(batch).exceptAll(flat(out)).count() == 0
    assert flat(out).exceptAll(flat(batch)).count() == 0


def test_stream_hourly_counts_vs_batch(spark, dirs):
    events = spark.read.schema(ingest.EVENTS_DDL).parquet(
        "/root/testdata/sf0.001/events.parquet"
    )
    events.write.mode("overwrite").parquet(dirs["in"])
    ingest.stream_hourly_event_counts(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    stream_rows = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    assert len(stream_rows) > 0
    batch_rows = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in ingest.batch_hourly_event_counts(events).collect()
    }
    # append mode emits only watermark-finalized windows → subset, and
    # every emitted window's count matches the batch twin exactly
    for key, n in stream_rows.items():
        assert batch_rows[key] == n
    # everything older than max_ts - (watermark + window) must be emitted
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=4)
    must_emit = [k for k in batch_rows if k[0] < cutoff]
    for key in must_emit:
        assert key in stream_rows


def test_stateful_sessionize_vs_batch(spark, dirs):
    from ocr_search_spark.streaming import sessionize

    events = spark.read.schema(ingest.EVENTS_DDL).parquet(
        "/root/testdata/sf0.001/events.parquet"
    )
    events.write.mode("overwrite").parquet(dirs["in"])
    sessionize.stream_sessionize(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    stream = {
        (r["user_id"], r["session_start"]): r
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    assert len(stream) > 0
    batch = {
        (r["user_id"], r["session_start"]): r
        for r in sessionize.batch_sessionize(events).collect()
    }
    # every emitted (closed) session matches the batch twin exactly
    for key, sr in stream.items():
        br = batch[key]
        assert sr["session_end"] == br["session_end"]
        assert sr["n_events"] == br["n_events"]
        assert abs(sr["sum_value"] - br["sum_value"]) < 1e-6
    # all sessions that closed well before end-of-stream must be emitted
    import datetime

    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = (max_ts - datetime.timedelta(hours=2)).timestamp()
    must = [k for k, v in batch.items() if v["session_end"] < cutoff]
    for k in must:
        assert k in stream, f"closed session {k} not emitted"


def test_stream_maintain_postings(spark, dirs, tmp_path):
    """Doc-level incremental index maintenance: a stream of document
    versions MERGEs into a standing BucketedTable; final state equals a
    batch rebuild over the latest corpus, and buckets holding only
    untouched docs stay byte-identical across the second run."""
    from tests.test_storage import _by_bucket, _file_state

    from ocr_search_spark.operators.extract import extract_spans_columnar
    from ocr_search_spark.operators.tokenize import term_postings
    from ocr_search_spark.streaming import index_maintain as IM

    table_path = str(tmp_path / "postings_tbl")
    n_buckets = 32

    docs_v1 = corpus.documents_table(spark, 100, skew=False).cache()
    docs_v1.write.mode("append").parquet(dirs["in"])
    IM.stream_maintain_postings(
        spark, dirs["in"], table_path, dirs["ckpt"], n_buckets=n_buckets
    )
    table = IM.postings_table(spark, table_path, n_buckets)
    expect1 = term_postings(extract_spans_columnar(docs_v1).select("doc_id", "spans"))
    got1 = table.read()
    assert got1.exceptAll(expect1).count() == 0
    assert expect1.exceptAll(got1).count() == 0

    # v2: 10 docs get a prepended span (new version), 30 brand-new docs
    ids = sorted(r["doc_id"] for r in docs_v1.select("doc_id").collect())
    modified = set(ids[:10])
    new_span = F.struct(
        F.lit("text").alias("kind"),
        F.lit("brand new incremental content").alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    bumped = F.transform(
        "spans",
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            (s["offset"] + 1).cast("int").alias("offset"),
        ),
    )
    docs_mod = docs_v1.where(F.col("doc_id").isin(*modified)).withColumn(
        "spans", F.concat(F.array(new_span), bumped)
    )
    extra = (
        corpus.documents_table(spark, 130, skew=False)
        .join(docs_v1.select("doc_id"), "doc_id", "left_anti")
        .cache()
    )
    assert extra.count() == 30
    updates = docs_mod.unionByName(extra)
    updates.write.mode("append").parquet(dirs["in"])

    before = _by_bucket(_file_state(table_path))
    IM.stream_maintain_postings(
        spark, dirs["in"], table_path, dirs["ckpt"], n_buckets=n_buckets
    )
    after = _by_bucket(_file_state(table_path))

    latest = (
        docs_v1.where(~F.col("doc_id").isin(*modified))
        .unionByName(docs_mod)
        .unionByName(extra)
    )
    expect2 = term_postings(extract_spans_columnar(latest).select("doc_id", "spans"))
    got2 = table.read()
    assert got2.exceptAll(expect2).count() == 0
    assert expect2.exceptAll(got2).count() == 0

    # buckets containing no updated doc must be byte-identical
    from ocr_search_spark.storage import BUCKET_COL

    touched = {
        r[BUCKET_COL]
        for r in updates.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int").alias(BUCKET_COL)
        )
        .distinct()
        .collect()
    }
    untouched = set(before) - touched
    assert untouched, "fixture should leave at least one bucket untouched"
    for b in untouched:
        assert after[b] == before[b], f"untouched bucket {b} was rewritten"


def _protobuf_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="transformWithStateInPandas needs google.protobuf (its state "
    "server speaks protobuf to the JVM); not installed in this container",
)
def test_transform_with_state_sessionize_vs_batch(spark, dirs):
    """The transformWithStateInPandas sessionizer (modern stateful API)
    must agree with the batch twin on every emitted (closed) session and
    emit everything that closed well before end-of-stream — the same
    contract as the applyInPandasWithState twin."""
    import datetime

    from ocr_search_spark.streaming import sessionize, sessionize_tws

    events = spark.read.schema(ingest.EVENTS_DDL).parquet(
        "/root/testdata/sf0.001/events.parquet"
    )
    events.write.mode("overwrite").parquet(dirs["in"])
    sessionize_tws.stream_sessionize_tws(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    stream = {
        (r["user_id"], r["session_start"]): r
        for r in spark.read.parquet(dirs["out"]).collect()
    }
    assert len(stream) > 0
    batch = {
        (r["user_id"], r["session_start"]): r
        for r in sessionize.batch_sessionize(events).collect()
    }
    for key, sr in stream.items():
        br = batch[key]
        assert sr["session_end"] == br["session_end"]
        assert sr["n_events"] == br["n_events"]
        assert abs(sr["sum_value"] - br["sum_value"]) < 1e-6
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = (max_ts - datetime.timedelta(hours=2)).timestamp()
    must = [k for k, v in batch.items() if v["session_end"] < cutoff]
    for k in must:
        assert k in stream, f"closed session {k} not emitted"


def test_stream_maintain_zero_term_doc_version(spark, dirs, tmp_path):
    """A document re-arriving with NO tokenizable content (media-only
    spans) must lose its old postings — the doc-replace contract even
    when the new version contributes zero posting rows."""
    from ocr_search_spark.streaming import index_maintain as IM

    table_path = str(tmp_path / "ptbl")
    docs_v1 = corpus.documents_table(spark, 40, skew=False).cache()
    docs_v1.write.mode("append").parquet(dirs["in"])
    IM.stream_maintain_postings(spark, dirs["in"], table_path, dirs["ckpt"], n_buckets=8)
    table = IM.postings_table(spark, table_path, 8)
    vid = sorted(r["doc_id"] for r in docs_v1.select("doc_id").collect())[0]
    assert table.read().where(F.col("doc_id") == vid).count() > 0

    # v2 of that doc: an empty span array → zero terms (media spans
    # would still produce OCR-sim terms)
    empty_doc = spark.createDataFrame([(vid,)], "doc_id string").select(
        "doc_id", F.array().cast(docs_v1.schema["spans"].dataType).alias("spans")
    )
    empty_doc.write.mode("append").parquet(dirs["in"])
    IM.stream_maintain_postings(spark, dirs["in"], table_path, dirs["ckpt"], n_buckets=8)
    assert table.read().where(F.col("doc_id") == vid).count() == 0


def test_stream_maintain_correlations_ivm(spark, dirs, tmp_path):
    """Streaming correlation IVM: after each micro-batch the standing
    correlation table equals a from-scratch term_correlations over the
    final postings, AND buckets holding only carried pairs stay
    byte-identical across a batch that doesn't affect them."""
    from tests.test_storage import _by_bucket, _file_state

    from ocr_search_spark.operators.correlate import term_correlations
    from ocr_search_spark.streaming import index_maintain as IM

    post_path = str(tmp_path / "post_tbl")
    corr_path = str(tmp_path / "corr_tbl")
    n_buckets = 16

    def doc(i, text):
        return (f"doc{i}", [("text", text, "", 0)])

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    # two disjoint vocabulary islands: A-pairs must be carried untouched
    # when only B-docs change
    # each term's df stays ≤ 3 (guard keeps everything at 0.3·12 = 3.6)
    batch1 = [doc(i, f"anch{i} anch{(i + 1) % 6} apple{i % 2}") for i in range(6)]
    batch1 += [
        doc(i, f"zeb{i - 6} zeb{(i - 5) % 6} zulu{i % 2}") for i in range(6, 12)
    ]
    spark.createDataFrame(batch1, schema).repartition(1).write.mode("append").parquet(
        dirs["in"]
    )
    IM.stream_maintain_postings_and_correlations(
        spark, dirs["in"], post_path, corr_path, dirs["ckpt"], n_buckets=n_buckets
    )
    post_t = IM.postings_table(spark, post_path, n_buckets)
    corr_t = IM.correlations_table(spark, corr_path, n_buckets)
    full1 = term_correlations(post_t.read(), max_df_ratio=0.3)
    got1 = corr_t.read()
    assert got1.exceptAll(full1).count() == 0
    assert full1.exceptAll(got1).count() == 0
    assert got1.count() > 0

    # batch 2: new versions for two B-island docs only
    batch2 = [doc(8, "zeb2 zulu0 zulu0 fresh"), doc(9, "zeb3 fresh")]
    spark.createDataFrame(batch2, schema).repartition(1).write.mode("append").parquet(
        dirs["in"]
    )
    before = _by_bucket(_file_state(corr_path))
    IM.stream_maintain_postings_and_correlations(
        spark, dirs["in"], post_path, corr_path, dirs["ckpt"], n_buckets=n_buckets
    )
    after = _by_bucket(_file_state(corr_path))

    full2 = term_correlations(post_t.read(), max_df_ratio=0.3)
    got2 = corr_t.read()
    assert got2.exceptAll(full2).count() == 0
    assert full2.exceptAll(got2).count() == 0

    # the A island (anchor*/apple pairs) is unaffected: its term1 buckets
    # must be byte-identical — prove at least one bucket carried over
    carried_buckets = [b for b in before if before[b] == after.get(b)]
    assert carried_buckets, (before.keys(), after.keys())


def test_session_window_exact_gap_boundary(spark):
    """Spark's session_window MERGES two events exactly gapDuration
    apart (an event starting at the previous window's end extends it);
    the events_session_window DuckDB oracle replays that with a
    strictly-greater new-session flag. Pin both on a synthetic
    exact-1800s-gap user so the boundary semantic can never silently
    drift (VERDICT r2 §wrong item 4 — resolved: the engines agree, the
    old doc note had the Spark semantic backwards)."""
    import datetime

    import duckdb
    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: gaps of exactly 1800s → ONE merged session
        (1, base),
        (1, base + datetime.timedelta(seconds=1800)),
        (1, base + datetime.timedelta(seconds=3600)),
        # user 2: gap 1799s → one merged session
        (2, base),
        (2, base + datetime.timedelta(seconds=1799)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"))
    )
    sessions = {r["user_id"]: r["n_sessions"] for r in got.collect()}
    assert sessions == {1: 1, 2: 1}

    # the oracle's >= flag reproduces the same counts
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({u}, TIMESTAMP '{t.isoformat(sep=' ')}')" for u, t in rows
        )
        + ") t(user_id, ts)"
    )
    oracle = con.execute(
        """WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
)
SELECT user_id, sum(is_new) AS n_sessions FROM flagged GROUP BY user_id"""
    ).fetchall()
    assert {u: int(n) for u, n in oracle} == sessions


def test_stream_dedup_exact_across_batches_and_restarts(spark, dirs):
    """The streaming dedup gate suppresses span-payload duplicates
    across micro-batches AND across restarted runs (state lives in the
    checkpoint); doc_id differences do not defeat the digest."""
    docs1 = corpus.documents_table(spark, 60, skew=False).cache()
    docs1.write.mode("append").parquet(dirs["in"])
    ingest.stream_dedup_exact(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out1 = spark.read.parquet(dirs["out"])
    n1 = out1.count()
    assert n1 <= 60
    assert out1.select("digest").distinct().count() == n1

    # second wave: re-send 60 ALREADY-SEEN docs under fresh doc_ids plus
    # genuinely new ones — only the new payloads may pass the gate
    resent = docs1.withColumn(
        "doc_id", F.concat(F.lit("resent-"), F.col("doc_id"))
    )
    fresh = corpus.documents_table(spark, 100, skew=False).where(
        ~F.md5(F.to_json(F.col("spans"))).isin(
            [r["digest"] for r in out1.select("digest").collect()]
        )
    ).cache()
    n_fresh_payloads = (
        fresh.select(F.md5(F.to_json(F.col("spans"))).alias("d"))
        .distinct()
        .count()
    )
    resent.unionByName(fresh).write.mode("append").parquet(dirs["in"])
    ingest.stream_dedup_exact(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == n1 + n_fresh_payloads
    # the global invariant: one output row per distinct payload ever seen
    assert out2.groupBy("digest").count().where(F.col("count") > 1).count() == 0
    # and no resent doc_id slipped through
    assert out2.where(F.col("doc_id").startswith("resent-")).count() == 0


def test_watermark_drops_late_events(spark, dirs):
    """An event arriving BEHIND the checkpointed watermark must be
    dropped: the already-finalized window is neither re-emitted nor
    updated (append mode), and no duplicate window row appears."""
    import datetime

    def ev(eid, hh, mm):
        return (
            eid,
            datetime.datetime(2024, 1, 1, hh, mm, 0),
            eid,
            "click",
            1.0,
            "{}",
        )

    mk = lambda rows: spark.createDataFrame(rows, ingest.EVENTS_DDL)  # noqa: E731

    # Run 1: 00:30 plus 12:00 -> watermark after run = 10:00 (2h wm),
    # so the 00:00 window is finalized and emitted with n=1.
    mk([ev(1, 0, 30), ev(2, 12, 0)]).write.mode("append").parquet(dirs["in"])
    ingest.stream_hourly_event_counts(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    first = {
        (r["window_start"], r["n"]) for r in spark.read.parquet(dirs["out"]).collect()
    }
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    assert (t0, 1) in first, f"00:00 window not finalized: {first}"

    # Run 2 (same checkpoint): a LATE event inside the closed 00:00
    # window plus a fresh 23:00 event that closes the 12:00 window.
    mk([ev(3, 0, 45), ev(4, 23, 0)]).write.mode("append").parquet(dirs["in"])
    ingest.stream_hourly_event_counts(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    rows = spark.read.parquet(dirs["out"]).collect()
    per_window = {}
    for r in rows:
        per_window.setdefault(r["window_start"], []).append(r["n"])
    # late event dropped: 00:00 window still exactly one row with n=1
    assert per_window[t0] == [1], f"late event leaked: {per_window[t0]}"
    # the 12:00 window was closed by the new watermark and emitted once
    t12 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    assert per_window[t12] == [1]


def test_stream_maintain_cms_exactness_and_replay(spark, dirs, tmp_path):
    """Streaming CMS maintenance == single-pass batch build, batch
    replay is a no-op (exactly-once via batch-keyed partials), and
    compaction folds history without changing the live sketch."""
    from ocr_search_spark.streaming import sketch_maintain as SM
    from ocr_search_spark.training.sketches import cms_build

    def mk_docs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha beta doc"),
                F.lit(" w"), (F.col("id") % 13).cast("string"),
                F.lit(" w"), (F.col("id") % 7).cast("string"),
            ).alias("text"),
        )

    mk_docs(0, 60).write.mode("append").parquet(dirs["in"])
    mk_docs(60, 160).write.mode("append").parquet(dirs["in"])

    table_path = str(tmp_path / "cms_table")
    SM.stream_maintain_cms(
        spark, dirs["in"], table_path, dirs["ckpt"], max_files_per_trigger=1
    )
    table = SM.cms_partials_table(spark, table_path)

    def words(df):
        return df.select(
            F.explode(F.split(F.lower("text"), r"\s+")).alias("w")
        ).filter(F.col("w") != "")

    expect = sorted(
        tuple(r)
        for r in cms_build(words(spark.read.parquet(dirs["in"])), "w").collect()
    )
    live = lambda: sorted(tuple(r) for r in SM.current_cms(table).collect())  # noqa: E731
    assert live() == expect

    # sink idempotence (the foreachBatch replay contract): applying the
    # SAME batch content under the same batch_id twice is a no-op
    replay = spark.createDataFrame([(888888, "aa bb aa")], "doc_id long, text string")
    SM.merge_cms_batch(table, words(replay), 500, "w")
    after_once = live()
    SM.merge_cms_batch(table, words(replay), 500, "w")
    assert live() == after_once, "batch replay changed CMS state"
    expect = after_once  # carry the extra batch into later comparisons

    # compaction folds partials into the base without changing the sketch
    SM.compact_cms_partials(table)
    bids = {r.batch_id for r in table.read().select("batch_id").distinct().collect()}
    assert bids == {SM.BASE_BATCH_ID}
    assert live() == expect

    # a post-compaction batch keeps merging correctly
    extra = spark.createDataFrame([(999999, "zz zz zz")], "doc_id long, text string")
    SM.merge_cms_batch(table, words(extra), 1000, "w")
    expect2 = sorted(
        tuple(r)
        for r in cms_build(
            words(
                spark.read.parquet(dirs["in"]).unionByName(replay).unionByName(extra)
            ),
            "w",
        ).collect()
    )
    assert live() == expect2


def test_stream_dedup_watermarked_state_ages_out(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics, end to end across three
    AvailableNow runs sharing one checkpoint: (1) in-horizon duplicates
    are suppressed within AND across runs; (2) once the watermark passes
    a key's ts + delay the state is evicted and a re-publication of the
    same digest is ADMITTED again (bounded state, by design)."""
    import datetime as dt

    src, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def feed(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)
        ingest.stream_dedup_watermarked(
            spark, src, out, ckpt, delay="1 hour"
        )

    # run 1: an in-batch duplicate pair + a singleton
    feed(
        [
            (1, "alpha", t0),
            (2, "alpha", t0 + dt.timedelta(minutes=5)),  # dup, in horizon
            (3, "beta", t0),
        ]
    )
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 3 in got and len(got & {1, 2}) == 1  # exactly one alpha

    # run 2: cross-run duplicate while state is live -> suppressed; a
    # fresh far-future row advances the watermark to t0+3h-1h > t0+1h,
    # evicting alpha's state at the end of this run
    feed(
        [
            (4, "alpha", t0 + dt.timedelta(minutes=30)),  # dup, suppressed
            (5, "gamma", t0 + dt.timedelta(hours=3)),  # watermark mover
        ]
    )
    got2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 4 not in got2 and 5 in got2

    # run 3: alpha re-published AFTER eviction -> admitted again
    feed([(6, "alpha", t0 + dt.timedelta(hours=3, minutes=5))])
    got3 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 6 in got3


def test_stream_stream_interval_join_vs_batch(spark, tmp_path):
    """Stream-stream watermarked interval join == the batch join, and a
    second incremental run joins NEW clicks against views it buffered
    in a PREVIOUS run (cross-batch state, the point of a stream join).
    The arrival split is BY EVENT TIME (wave 2 = the later half), so no
    input is late w.r.t. the watermark and the batch equality is exact —
    state eviction only drops views no future click can reach."""
    from ocr_search_spark.streaming import joins as SJ

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    views = ev.where(F.col("event_type") == "view")
    clicks = ev.where(F.col("event_type") == "click")
    d = {k: str(tmp_path / k) for k in ("v", "c", "out", "ckpt")}

    # 1-day window: ~100 pairs at sf0.001 (600 s matches a single pair —
    # too thin to exercise the state store)
    win = 86400
    mid = ev.agg(F.expr("percentile_approx(ts, 0.5)").alias("m")).collect()[0]["m"]
    early = F.col("ts") <= F.lit(mid)

    views.where(early).write.mode("append").parquet(d["v"])
    clicks.where(early).write.mode("append").parquet(d["c"])
    SJ.stream_attribute_clicks(spark, d["v"], d["c"], d["out"], d["ckpt"], window_s=win)
    got1 = spark.read.parquet(d["out"])
    exp1 = SJ.batch_attribute_clicks(views.where(early), clicks.where(early), window_s=win)
    n1 = got1.count()
    assert n1 == exp1.count() and n1 >= 10

    # wave 2: the later half of BOTH streams arrives; its clicks must
    # also match wave-1 views still inside the attribution window
    views.where(~early).write.mode("append").parquet(d["v"])
    clicks.where(~early).write.mode("append").parquet(d["c"])
    SJ.stream_attribute_clicks(spark, d["v"], d["c"], d["out"], d["ckpt"], window_s=win)
    got = spark.read.parquet(d["out"])
    exp = SJ.batch_attribute_clicks(views, clicks, window_s=win)
    assert got.count() == exp.count()
    key = lambda df: sorted(  # noqa: E731
        (r["click_id"], r["view_id"]) for r in df.select("click_id", "view_id").collect()
    )
    assert key(got) == key(exp)
    # cross-batch state: some pair spans the waves (wave-2 click, wave-1 view)
    spanning = got.join(
        views.where(early).select(F.col("event_id").alias("view_id")), "view_id"
    ).join(
        clicks.where(~early).select(F.col("event_id").alias("click_id")), "click_id"
    )
    assert spanning.count() >= 1
    # exactly-once across the restart: no attributed pair duplicated
    assert (
        got.groupBy("click_id", "view_id").count().where(F.col("count") > 1).count()
        == 0
    )


def test_stream_maintain_kn_exactness_replay_compaction(spark, dirs, tmp_path):
    """Streaming KN maintenance == batch kn_bigram_counts over all
    ingested docs; per-batch replay is a no-op; compaction folds
    partials without changing the live counts; derived stats compose."""
    from ocr_search_spark.streaming import lm_maintain as LM
    from ocr_search_spark.training import textstats as TS

    def mk_docs(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("alpha beta"),
                F.lit(" w"), (F.col("id") % 5).cast("string"),
                F.lit(" beta gamma"),
            ).alias("text"),
        )

    mk_docs(0, 40).write.mode("append").parquet(dirs["in"])
    mk_docs(40, 90).write.mode("append").parquet(dirs["in"])

    table_path = str(tmp_path / "kn_table")
    LM.stream_maintain_kn(
        spark, dirs["in"], table_path, dirs["ckpt"], max_files_per_trigger=1
    )
    table = LM.kn_partials_table(spark, table_path)

    live = lambda: sorted(  # noqa: E731
        tuple(r) for r in LM.current_kn_counts(table).collect()
    )
    expect = sorted(
        tuple(r)
        for r in TS.kn_bigram_counts(spark.read.parquet(dirs["in"])).collect()
    )
    assert live() == expect

    # replay idempotence
    replay = spark.createDataFrame([(888888, "aa bb aa bb")], "doc_id long, text string")
    LM.merge_kn_batch(table, replay, 500)
    once = live()
    LM.merge_kn_batch(table, replay, 500)
    assert live() == once, "batch replay changed KN counts"

    # compaction preserves the live table and leaves only the base batch
    LM.compact_kn_partials(table)
    bids = {r.batch_id for r in table.read().select("batch_id").distinct().collect()}
    assert bids == {LM.BASE_BATCH_ID}
    assert live() == once

    # derived stats compose from the maintained table
    stats = TS.kn_stats_from_counts(LM.current_kn_counts(table))
    row = {(r["u"], r["w"]): r for r in stats.collect()}[("aa", "bb")]
    assert row["c_uw"] == 2 and row["bb"] > 0


def test_stream_maintain_kn_kill_and_resume(spark, dirs, tmp_path):
    """Exactly-once across a mid-run kill for the KN partials sink: stop
    the query once the first micro-batch committed, resume from the same
    checkpoint, and the summed counts must equal the batch recount —
    whether or not the kill landed mid-backlog (the batch-keyed
    replace_group makes replays no-ops either way)."""
    import time

    from ocr_search_spark.streaming import lm_maintain as LM
    from ocr_search_spark.training import textstats as TS

    docs = spark.range(0, 120).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("kilo lima"),
            F.lit(" k"), (F.col("id") % 11).cast("string"),
            F.lit(" lima mike"),
        ).alias("text"),
    )
    docs.repartition(16).write.mode("append").parquet(dirs["in"])

    table_path = str(tmp_path / "kn_kr")
    q = LM.stream_maintain_kn(
        spark, dirs["in"], table_path, dirs["ckpt"],
        await_termination=False, max_files_per_trigger=1,
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["numInputRows"] > 0:
            break
        time.sleep(0.05)
    q.stop()
    q.awaitTermination()

    # resume: remainder only; final state equals the batch twin exactly
    LM.stream_maintain_kn(
        spark, dirs["in"], table_path, dirs["ckpt"], max_files_per_trigger=1
    )
    table = LM.kn_partials_table(spark, table_path)
    got = sorted(map(tuple, LM.current_kn_counts(table).collect()))
    want = sorted(
        tuple(r)
        for r in TS.kn_bigram_counts(spark.read.parquet(dirs["in"])).collect()
    )
    assert got == want


# ------------------------------------------------------------ snapshot sink


def test_stream_append_snapshot_exactly_once_and_replay(spark, dirs, tmp_path):
    from ocr_search_spark.storage_snapshots import SnapshotTable
    from ocr_search_spark.streaming import snapshot_sink

    docs = corpus.documents_table(spark, 60, skew=False)
    docs.repartition(4).write.mode("append").parquet(dirs["in"])
    t = SnapshotTable(spark, str(tmp_path / "snap_tbl"))
    snapshot_sink.stream_append_snapshot(
        spark, dirs["in"], t, dirs["ckpt"], max_files_per_trigger=1
    )
    out = t.read()
    assert out.count() == 60
    assert out.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    # every commit carries its fence
    assert snapshot_sink.last_committed_batch(t) is not None

    # manual replay of an already-committed batch id is a no-op
    v_before = t.current_version()
    did = snapshot_sink.append_batch(t, docs.limit(5), batch_id=0)
    assert did is False and t.current_version() == v_before

    # maintenance commits between batches don't break the fence walk
    # (NOTE: never advance the fence manually on a stream-driven table —
    # the stream's next checkpointed batch id would be absorbed as a
    # replay and its rows dropped; that is the fence doing its job)
    t.compact(small_bytes=1 << 30, target_bytes=1 << 40)
    assert snapshot_sink.last_committed_batch(t) is not None
    t2 = SnapshotTable(spark, str(tmp_path / "manual_tbl"))
    assert snapshot_sink.append_batch(t2, docs.limit(5), batch_id=0) is True
    t2.compact(small_bytes=1, target_bytes=1 << 40)  # no batch fence
    assert snapshot_sink.last_committed_batch(t2) == 0
    assert snapshot_sink.append_batch(t2, docs.limit(3), batch_id=1) is True
    assert snapshot_sink.last_committed_batch(t2) == 1

    # second wave: only the new files are appended
    more = corpus.documents_table(spark, 90, skew=False).where(
        ~F.col("doc_id").isin([r["doc_id"] for r in docs.select("doc_id").collect()])
    )
    n_new = more.count()
    more.write.mode("append").parquet(dirs["in"])
    snapshot_sink.stream_append_snapshot(
        spark, dirs["in"], t, dirs["ckpt"], max_files_per_trigger=1
    )
    assert t.read().count() == 60 + n_new


def test_stream_append_snapshot_kill_and_resume(spark, dirs, tmp_path):
    """Mid-backlog kill: resume must land every doc exactly once in the
    snapshot table — the foreachBatch replay is absorbed by the
    batch-id fence, with the manifest log as the only ledger."""
    import shutil
    import time

    from ocr_search_spark.storage_snapshots import SnapshotTable
    from ocr_search_spark.streaming import snapshot_sink

    docs = corpus.documents_table(spark, 120, skew=False)
    docs.repartition(24).write.mode("append").parquet(dirs["in"])

    partial = 120
    for attempt in range(3):
        shutil.rmtree(dirs["ckpt"], ignore_errors=True)
        shutil.rmtree(str(tmp_path / f"kill_tbl{attempt - 1}"), ignore_errors=True)
        t = SnapshotTable(spark, str(tmp_path / f"kill_tbl{attempt}"))
        q = snapshot_sink.stream_append_snapshot(
            spark, dirs["in"], t, dirs["ckpt"],
            max_files_per_trigger=1, await_termination=False,
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p is not None and p["numInputRows"] > 0:
                break
            time.sleep(0.05)
        q.stop()
        q.awaitTermination()
        partial = t.read().count() if t.current_version() is not None else 0
        if partial < 120:
            break
    assert partial < 120, "kill landed after full completion on 3 attempts"

    snapshot_sink.stream_append_snapshot(
        spark, dirs["in"], t, dirs["ckpt"], max_files_per_trigger=1
    )
    out = t.read()
    assert out.count() == 120
    assert out.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    # and the table's history is all appends with monotonically
    # increasing batch fences
    bids = []
    v = t.current_version()
    while v is not None:
        man = t._manifest(v)
        bid = (man.get("info") or {}).get("batch_id")
        if bid is not None:
            bids.append(bid)
        v = man["parent"]
    assert bids == sorted(bids, reverse=True)


def test_stream_retraction_feed_exactly_once(spark, dirs, tmp_path):
    """Append stream (default channel) + retraction stream (retract
    channel) share one table: deletes land exactly once as O(batch)
    MOR commits, replays are absorbed per-channel, and the two fences
    never collide even though both streams number batches from 0."""
    from ocr_search_spark.storage_snapshots import SnapshotTable
    from ocr_search_spark.streaming import snapshot_sink

    docs = corpus.documents_table(spark, 80, skew=False)
    docs.repartition(4).write.mode("append").parquet(dirs["in"])
    t = SnapshotTable(spark, str(tmp_path / "rt_tbl"))
    snapshot_sink.stream_append_snapshot(
        spark, dirs["in"], t, dirs["ckpt"], max_files_per_trigger=1
    )
    assert t.read().count() == 80

    # retraction feed: delete docs whose id starts 0-3, two key files
    is_doomed = F.substring("doc_id", 1, 1).isin(list("0123"))
    doomed = docs.where(is_doomed).select("doc_id")
    n_doomed = doomed.count()
    key_dir = str(tmp_path / "retract_in")
    doomed.repartition(2).write.parquet(key_dir)
    rt_ckpt = str(tmp_path / "retract_ckpt")
    snapshot_sink.stream_delete_snapshot(
        spark, key_dir, t, rt_ckpt, key_schema="doc_id string",
        max_files_per_trigger=1,
    )
    out = t.read()
    assert out.count() == 80 - n_doomed and n_doomed > 0
    assert out.where(F.substring("doc_id", 1, 1).isin(list("0123"))).count() == 0
    # channel isolation: the retract fence is set, the append fence
    # unchanged, and a manual replay on either channel is a no-op
    assert snapshot_sink.last_committed_batch(t, "retract") is not None
    a_fence = snapshot_sink.last_committed_batch(t, "default")
    assert a_fence is not None
    assert snapshot_sink.delete_batch(t, doomed.limit(1), batch_id=0) is False
    assert snapshot_sink.append_batch(t, docs.limit(1), batch_id=a_fence) is False
    # re-running the drained streams changes nothing
    snapshot_sink.stream_delete_snapshot(
        spark, key_dir, t, rt_ckpt, key_schema="doc_id string",
        max_files_per_trigger=1,
    )
    assert t.read().count() == 80 - n_doomed
    # maintenance folds the delete files away; content unchanged
    t.maintain(small_bytes=1, max_delete_files=0, keep_snapshots=50)
    assert t.read().count() == 80 - n_doomed
    assert not t._manifest(t.current_version()).get("delete_files")


def test_fences_survive_snapshot_expiry(spark, tmp_path):
    """maintain()/expire must never lose a channel's high-water mark —
    fences ride forward in every manifest, so GC'ing the manifest that
    recorded a batch cannot resurrect that batch on replay."""
    from ocr_search_spark.storage_snapshots import SnapshotTable
    from ocr_search_spark.streaming import snapshot_sink

    docs = corpus.documents_table(spark, 30, skew=False)
    t = SnapshotTable(spark, str(tmp_path / "fence_tbl"))
    assert snapshot_sink.append_batch(t, docs.limit(10), batch_id=0)
    assert snapshot_sink.append_batch(t, docs.limit(0), batch_id=1)
    # maintenance churn pushes the fence-carrying manifests out of history
    t.compact(small_bytes=1 << 30, target_bytes=1 << 40)
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError):
        t._manifest(1)  # the batch-0 manifest is really gone
    # ...but the fence survived in the current manifest
    assert snapshot_sink.last_committed_batch(t) == 1
    assert snapshot_sink.append_batch(t, docs.limit(5), batch_id=1) is False
    assert snapshot_sink.append_batch(t, docs.limit(5), batch_id=2) is True
    # retract-channel fences propagate independently
    assert snapshot_sink.delete_batch(
        t, docs.limit(1).select("doc_id"), batch_id=0
    ) is True
    t.materialize_deletes()
    t.expire_snapshots(keep_last=1)
    assert snapshot_sink.last_committed_batch(t, "retract") == 0
    assert snapshot_sink.last_committed_batch(t) == 2


def test_stream_maintain_kmv_exactness_and_replay(spark, dirs, tmp_path):
    """Streaming KMV maintenance == single-pass batch kmv_build, and a
    replayed micro-batch is a no-op through union-merge IDEMPOTENCE
    (the other exactly-once algebra: no partials ledger needed)."""
    from ocr_search_spark.streaming import sketch_maintain as SM
    from ocr_search_spark.training.sketches import kmv_build

    def mk_events(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 97).alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
                "event_type"
            ),
        )

    mk_events(0, 300).write.mode("append").parquet(dirs["in"])
    mk_events(300, 700).write.mode("append").parquet(dirs["in"])

    table_path = str(tmp_path / "kmv_table")
    SM.stream_maintain_kmv(
        spark, dirs["in"], table_path, dirs["ckpt"], k=16,
        max_files_per_trigger=1,
    )
    table = SM.kmv_state_table(spark, table_path)

    def batch_state():
        return sorted(
            (r["g"], tuple(r["sketch"]), r["theta"])
            for r in kmv_build(
                spark.read.parquet(dirs["in"]).withColumnRenamed(
                    "event_type", "g"
                ),
                "user_id",
                ("g",),
                k=16,
            ).collect()
        )

    def live():
        return sorted(
            (r["g"], tuple(r["sketch"]), r["theta"])
            for r in SM.current_kmv(table, k=16).collect()
        )

    assert live() == batch_state()

    # replay idempotence: merging the SAME batch again is a no-op
    replay = mk_events(0, 300)
    before = live()
    SM.merge_kmv_batch(table, replay, "user_id", "event_type", k=16)
    assert live() == before, "replayed batch changed KMV state"

    # a new batch with a NEW group inserts without touching old groups
    extra = spark.range(5).select(
        (F.col("id") + 5000).alias("user_id"), F.lit("t9").alias("event_type")
    )
    SM.merge_kmv_batch(table, extra, "user_id", "event_type", k=16)
    got = dict((g, s) for g, s, _ in live())
    assert "t9" in got and len(got["t9"]) == 5
    assert {g for g, _, _ in before} == set(got) - {"t9"}


def test_stream_convert_binary_incremental(spark, tmp_path):
    """binaryFile-source streaming conversion: first AvailableNow run
    converts the initial files, a second run converts ONLY the new file
    (checkpoint = fileLib diff state), errors are rows not crashes."""
    import os

    from ocr_search_spark.streaming.ingest import stream_convert_binary
    from ocr_search_spark.training.pdfmini import encode_pdf
    from ocr_search_spark.training.pptxmini import encode_pptx

    src = tmp_path / "inbox"
    os.makedirs(src)
    (src / "a.pdf").write_bytes(encode_pdf(["first doc words"]))
    (src / "b.pptx").write_bytes(encode_pptx([["second doc words"]]))
    (src / "c.bin").write_bytes(b"junk payload")
    out = str(tmp_path / "spans_out")
    cp = str(tmp_path / "cp_conv")

    stream_convert_binary(spark, str(src), out, cp)
    first = spark.read.parquet(out)
    assert first.count() == 3
    got = {r["doc_id"]: r for r in first.collect()}
    assert [s["text"] for s in got["a"]["spans"] if s["kind"] == "text"] == [
        "first doc words"
    ]
    assert got["b"]["error"] is None and got["c"]["error"] is not None

    (src / "d.pdf").write_bytes(encode_pdf(["late arrival words"]))
    stream_convert_binary(spark, str(src), out, cp)
    second = spark.read.parquet(out)
    assert second.count() == 4  # only d was appended — a/b/c not redone
    d = second.where("doc_id = 'd'").collect()[0]
    assert [s["text"] for s in d["spans"] if s["kind"] == "text"] == [
        "late arrival words"
    ]


def test_stream_warc_archives_incremental(spark, tmp_path):
    """Streaming crawl tail: first AvailableNow run ingests the initial
    archives, a second run ingests ONLY the newly landed archive; a
    misframed archive appends an error row; doc keys match the batch
    envelope's sha2(url) rule."""
    import hashlib
    import os

    from ocr_search_spark.streaming.ingest import stream_warc_archives
    from ocr_search_spark.training.warcmini import encode_warc_file

    def _arc(a):
        return encode_warc_file(
            [
                {
                    "record_id": a,
                    "url": f"http://w{a}.com/p",
                    "status": 200,
                    "reason": "OK",
                    "content_type": "text/html; charset=utf-8",
                    "body": (
                        f"<html><body><p>archive {a} carries plenty of plain "
                        f"ordinary words right here</p></body></html>"
                    ).encode(),
                },
                {  # policy-dropped capture: 404
                    "record_id": f"{a}-x",
                    "url": f"http://w{a}.com/gone",
                    "status": 404,
                    "reason": "Not Found",
                    "content_type": "text/plain; charset=utf-8",
                    "body": b"not found",
                },
            ]
        )

    src = tmp_path / "crawl"
    os.makedirs(src)
    (src / "a0.warc").write_bytes(_arc(0))
    (src / "a1.warc").write_bytes(_arc(1))
    (src / "bad.warc").write_bytes(_arc(9)[:-9])
    out = str(tmp_path / "crawl_spans")
    cp = str(tmp_path / "cp_crawl")

    stream_warc_archives(spark, str(src), out, cp)
    first = spark.read.parquet(out)
    assert first.count() == 3  # 2 pages + 1 archive error
    err = first.where(first.error.isNotNull()).collect()
    assert [e.doc_id for e in err] == ["archive-error-bad"]
    want = hashlib.sha256(b"http://w0.com/p").hexdigest()
    row = first.where(first.doc_id == want).collect()[0]
    texts = [s["text"] for s in row["spans"] if s["kind"] == "text"]
    assert texts == ["archive 0 carries plenty of plain ordinary words right here"]

    (src / "a2.warc").write_bytes(_arc(2))
    stream_warc_archives(spark, str(src), out, cp)
    second = spark.read.parquet(out)
    assert second.count() == 4  # only the new archive appended


# ------------------------------------------------------------ CUSUM


def test_stream_cusum_equals_batch_and_replay(spark, tmp_path):
    """Transfer-function ledger folded in batch order == the batch
    closed form over the full series; replaying a batch_id is a no-op
    (exactly-once); a second wave advances the statistic."""
    from pyspark.sql import functions as F  # noqa: F401

    from ocr_search_spark.operators.profile import cusum_series
    from ocr_search_spark.streaming.sketch_maintain import (
        cusum_partials_table,
        current_cusum,
        merge_cusum_batch,
        stream_maintain_cusum,
    )

    rows = []
    for key in ("a", "b"):
        for t in range(40):
            x = 10 if key == "b" or t < 25 else 24
            rows.append((key, t, x))
    # three time-ordered waves as separate parquet files
    src = tmp_path / "src"
    for i, lo in enumerate((0, 14, 28)):
        spark.createDataFrame(
            [r for r in rows if lo <= r[1] < lo + 14],
            "event_type string, t long, x long",
        ).coalesce(1).write.parquet(str(src / f"wave{i}.parquet"))
    stream_maintain_cusum(
        spark, str(src / "*"), str(tmp_path / "tbl"), str(tmp_path / "ck"),
        mu=10, slack=2, max_files_per_trigger=1,
    )
    table = cusum_partials_table(spark, str(tmp_path / "tbl"))
    got = {r["k"]: (r["s_up"], r["alarm_up"], r["s_down"])
           for r in current_cusum(table, threshold=60).collect()}
    batch = spark.createDataFrame(rows, "k string, t long, x long")
    want_rows = cusum_series(batch, ["k"], "t", "x", mu=10, slack=2,
                             threshold=60).collect()
    last = {}
    for r in sorted(want_rows, key=lambda r: r["t"]):
        last[r["k"]] = (r["s_up"], r["alarm_up"], r["s_down"])
    assert got == last
    assert got["a"][1] and not got["b"][1]
    # replay: rewrite batch 1 from the same wave -> state unchanged
    wave1 = spark.read.parquet(str(src / "wave1.parquet"))
    merge_cusum_batch(table, wave1, 1, "event_type", "t", "x", 10, 2)
    again = {r["k"]: (r["s_up"], r["alarm_up"], r["s_down"])
             for r in current_cusum(table, threshold=60).collect()}
    assert again == got
