"""WARC crawl-archive ingestion: one binary WARC file column → one row
per HTTP response capture.

The reference's ingestion loop lists a remote folder and downloads one
file per document (DropboxSynchronizer.class.js:125-156, 249-273). At
web scale the unit of storage is a crawl archive instead: a WARC file
(ISO 28500) holding millions of interleaved request/response records.
This operator is the bridge from that format into the engine's
pipeline: an Arrow-batched ``mapInPandas`` stage that explodes each
archive blob into response rows (url, status, content type, decoded
body text), after which the existing stack — webtext.html_main_content
→ html_to_spans → extract/postings/search — runs UNCHANGED.

Failure semantics (X2, ProcessDirector.class.js:171-178):
* a misframed archive (truncated block, missing separator) records ONE
  error row for the file — framing loss is not recoverable past the
  break point, so pretending to resync would silently drop records;
* a per-record body problem (unknown charset, undecodable bytes, bad
  HTTP status line) records that record's error and the scan continues
  — one hostile capture must not take out its archive.

Scale: archives parse independently at partition parallelism; nothing
is collected, no subprocess runs, and the output is a plain DataFrame
so filters on status/content_type push into the scan of the next
stage.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RESPONSE_SCHEMA = (
    "warc_id string, url string, status int, "
    "content_type string, text string, error string"
)


def _rows_for_file(warc_id: str, payload: bytes) -> list[tuple]:
    from ocr_search_spark.training.warcmini import decode_warc

    try:
        records = decode_warc(payload)
    except Exception as exc:
        return [(warc_id, None, None, None, None, f"archive: {exc}")]
    rows: list[tuple] = []
    for rec in records:
        if rec["rec_type"] != "response":
            continue
        rows.append(
            (
                warc_id,
                rec["url"],
                rec.get("status"),
                rec.get("http_content_type"),
                rec.get("text"),
                rec.get("error"),
            )
        )
    return rows


def _warc_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["warc_id", "url", "status", "content_type", "text", "error"]
    for batch in batches:
        rows: list[tuple] = []
        for warc_id, payload in zip(batch["warc_id"], batch["payload"]):
            rows.extend(_rows_for_file(warc_id, bytes(payload)))
        yield pd.DataFrame(rows, columns=cols)


def warc_responses(archives: DataFrame) -> DataFrame:
    """(warc_id, payload=WARC bytes) → one row per ``response`` record:
    (warc_id, url, status, content_type, text, error). Request and
    warcinfo records are skipped; body text follows warcmini's pinned
    BOM > charset-param > UTF-8 rule."""
    return archives.select("warc_id", "payload").mapInPandas(
        _warc_iter, schema=RESPONSE_SCHEMA
    )


WET_TEXT_SCHEMA = (
    "warc_id string, url string, refers_to string, text string, error string"
)


def texts_to_wet_archives(
    df: DataFrame,
    group_col: str = "wet_group",
    url_col: str = "url",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The SINK direction: (group, url, text) rows → one WET-style
    archive blob per group (warc_id = 'wet-<group>'), records ordered
    by ``id_col`` so the bytes are deterministic for any partitioning.
    One groupBy-applyInPandas — each archive builds where its rows
    live; nothing is collected."""
    import pandas as pd  # noqa: F811

    from ocr_search_spark.training.warcmini import encode_wet_file

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = pdf.sort_values(id_col)
        g = rows[group_col].iloc[0]
        recs = [
            {
                "record_id": rid,
                "url": url,
                "text": text,
                "refers_to": f"<urn:uuid:resp-{rid}>",
            }
            for rid, url, text in zip(rows[id_col], rows[url_col], rows[text_col])
        ]
        return pd.DataFrame(
            {
                "warc_id": [f"wet-{g}"],
                "payload": [encode_wet_file(recs, filename=f"wet-{g}.warc")],
            }
        )

    return df.groupBy(group_col).applyInPandas(
        build, schema="warc_id string, payload binary"
    )


def _wet_rows_for_file(warc_id: str, payload: bytes) -> list[tuple]:
    from ocr_search_spark.training.warcmini import decode_warc

    try:
        records = decode_warc(payload)
    except Exception as exc:
        return [(warc_id, None, None, None, f"archive: {exc}")]
    return [
        (
            warc_id,
            rec["url"],
            rec.get("refers_to", ""),
            rec.get("text"),
            rec.get("error"),
        )
        for rec in records
        if rec["rec_type"] == "conversion"
    ]


def _wet_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["warc_id", "url", "refers_to", "text", "error"]
    for batch in batches:
        rows: list[tuple] = []
        for warc_id, payload in zip(batch["warc_id"], batch["payload"]):
            rows.extend(_wet_rows_for_file(warc_id, bytes(payload)))
        yield pd.DataFrame(rows, columns=cols)


def wet_texts(archives: DataFrame) -> DataFrame:
    """(warc_id, payload=WET bytes) → one row per ``conversion``
    record: (warc_id, url, refers_to, text, error) — the read side of
    texts_to_wet_archives."""
    return archives.select("warc_id", "payload").mapInPandas(
        _wet_iter, schema=WET_TEXT_SCHEMA
    )
