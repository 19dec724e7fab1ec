"""Minimal, dependency-free WARC/1.0 codec (ISO 28500 subset).

The reference ingests its corpus from a Dropbox folder listing
(``DropboxSynchronizer.class.js:125-156``) — one file per document. A
web-scale extraction tier ingests crawl archives instead: WARC, the
ISO 28500 container every public crawl (e.g. Common Crawl) ships, where
one file interleaves millions of capture records. This module gives the
engine that source format without any external library:

* ``encode_warc_file``  — a list of capture dicts → one WARC file's
  bytes: a leading ``warcinfo`` record, then per capture a ``request``
  record followed by its ``response`` record (the classic crawl pair).
  Response blocks are real HTTP/1.1 messages (status line, headers,
  CRLF-CRLF, body bytes). Deterministic bytes: callers pass the
  record ids and dates, nothing is sampled.
* ``decode_warc``  — WARC bytes → ordered list of record dicts. Record
  framing is Content-Length based (the only framing ISO 28500 allows):
  version line, header lines to the first blank line, exactly
  ``Content-Length`` block bytes, then the mandatory CRLF CRLF record
  separator. ``response`` records additionally carry the parsed HTTP
  status, headers, and decoded body text.

Body text decoding (pinned rule, applied in this order):
  1. a byte-order mark wins: UTF-8 / UTF-16LE / UTF-16BE BOMs are
     honored and stripped regardless of what the headers claim;
  2. else the ``charset=`` parameter of the HTTP ``Content-Type``;
  3. else UTF-8.
Unknown charsets and undecodable bytes raise ValueError (strict
decode) — the Spark operator (operators/warc.py) records these
per-record instead of failing the partition (X2 semantics,
ProcessDirector.class.js:171-178).

Scale note: one WARC file is one binary cell; parsing is pure
bytes→rows inside Arrow-batched ``mapInPandas``, so a crawl of 10^12
captures costs one linear scan per file at partition parallelism —
no driver involvement, no subprocess fan-out.
"""

from __future__ import annotations

import re

CRLF = b"\r\n"
_VERSION = b"WARC/1.0"

# charsets the strict decoder admits (lowercased, aliases folded)
_CHARSETS = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)


def _headers_block(headers: list[tuple[str, str]]) -> bytes:
    return b"".join(f"{k}: {v}\r\n".encode("ascii") for k, v in headers)


def _record(warc_headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = [(k, v) for (k, v) in warc_headers if k != "Content-Length"]
    head.append(("Content-Length", str(len(block))))
    return _VERSION + CRLF + _headers_block(head) + CRLF + block + CRLF + CRLF


def http_response_block(
    status: int,
    reason: str,
    headers: list[tuple[str, str]],
    body: bytes,
) -> bytes:
    """A real HTTP/1.1 response message (the payload of a WARC
    ``response`` record)."""
    line = f"HTTP/1.1 {status} {reason}\r\n".encode("ascii")
    hs = [(k, v) for (k, v) in headers if k.lower() != "content-length"]
    hs.append(("Content-Length", str(len(body))))
    return line + _headers_block(hs) + CRLF + body


def encode_warc_file(captures: list[dict], filename: str = "crawl.warc") -> bytes:
    """``captures``: dicts with keys url, status, reason, content_type,
    body (bytes), record_id, date — one request+response pair each.
    The file opens with a warcinfo record naming ``filename``."""
    out: list[bytes] = []
    info = b"software: ocr-search-spark-warcmini/1.0\r\nformat: WARC File Format 1.0\r\n"
    out.append(
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", "<urn:uuid:warcinfo-0>"),
                ("WARC-Date", "2026-01-01T00:00:00Z"),
                ("WARC-Filename", filename),
                ("Content-Type", "application/warc-fields"),
            ],
            info,
        )
    )
    for cap in captures:
        rid = cap["record_id"]
        date = cap.get("date", "2026-01-01T00:00:00Z")
        req_block = (
            f"GET {cap['url']} HTTP/1.1\r\nHost: crawl\r\n\r\n".encode("ascii")
        )
        out.append(
            _record(
                [
                    ("WARC-Type", "request"),
                    ("WARC-Record-ID", f"<urn:uuid:req-{rid}>"),
                    ("WARC-Date", date),
                    ("WARC-Target-URI", cap["url"]),
                    ("Content-Type", "application/http;msgtype=request"),
                ],
                req_block,
            )
        )
        resp_block = http_response_block(
            cap["status"],
            cap.get("reason", "OK"),
            [("Content-Type", cap["content_type"])],
            cap["body"],
        )
        out.append(
            _record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", f"<urn:uuid:resp-{rid}>"),
                    ("WARC-Date", date),
                    ("WARC-Target-URI", cap["url"]),
                    ("WARC-Concurrent-To", f"<urn:uuid:req-{rid}>"),
                    ("Content-Type", "application/http;msgtype=response"),
                ],
                resp_block,
            )
        )
    return b"".join(out)


def encode_wet_file(records: list[dict], filename: str = "crawl.wet") -> bytes:
    """WET-style extracted-text archive: a warcinfo record followed by
    one ``conversion`` record per input dict (keys url, text,
    record_id; optional refers_to, date). Payloads are UTF-8 text/plain
    blocks — the public shape of a post-extraction text corpus."""
    out: list[bytes] = []
    out.append(
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", "<urn:uuid:wetinfo-0>"),
                ("WARC-Date", "2026-01-01T00:00:00Z"),
                ("WARC-Filename", filename),
                ("Content-Type", "application/warc-fields"),
            ],
            b"software: ocr-search-spark-warcmini/1.0\r\n"
            b"format: WARC File Format 1.0\r\n",
        )
    )
    for rec in records:
        headers = [
            ("WARC-Type", "conversion"),
            ("WARC-Record-ID", f"<urn:uuid:conv-{rec['record_id']}>"),
            ("WARC-Date", rec.get("date", "2026-01-01T00:00:00Z")),
            ("WARC-Target-URI", rec["url"]),
            ("Content-Type", "text/plain; charset=utf-8"),
        ]
        if rec.get("refers_to"):
            headers.insert(4, ("WARC-Refers-To", rec["refers_to"]))
        out.append(_record(headers, rec["text"].encode("utf-8")))
    return b"".join(out)


def _parse_headers(text: bytes, what: str) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in text.split(CRLF):
        if not line:
            continue
        if b":" not in line:
            raise ValueError(f"malformed {what} header line {line!r}")
        k, v = line.split(b":", 1)
        headers[k.decode("ascii").strip().lower()] = v.decode(
            "ascii", "replace"
        ).strip()
    return headers


def charset_of(content_type: str) -> str | None:
    """The charset= parameter of a Content-Type value, lowercased, or
    None when absent."""
    m = re.search(r"charset=\"?([A-Za-z0-9_\-]+)\"?", content_type, re.I)
    return m.group(1).lower() if m else None


def decode_body_text(body: bytes, content_type: str) -> str:
    """The pinned BOM > charset param > UTF-8 decode rule (strict)."""
    for bom, enc in _BOMS:
        if body.startswith(bom):
            return body[len(bom):].decode(enc)
    cs = charset_of(content_type)
    if cs is not None:
        if cs not in _CHARSETS:
            raise ValueError(f"unsupported charset {cs!r}")
        return body.decode(_CHARSETS[cs])
    return body.decode("utf-8")


def decode_warc(data: bytes) -> list[dict]:
    """WARC bytes → ordered record dicts with keys: rec_type, url,
    record_id, date, block (bytes); ``response`` records add status,
    http_content_type, body (bytes), text (decoded per the pinned
    rule) and error (None, or the per-record body/HTTP failure — the
    scan continues past it). Truncated or misframed files raise
    ValueError: framing loss is unrecoverable past the break."""
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + len(_VERSION)] != _VERSION:
            raise ValueError(f"expected WARC version line at byte {pos}")
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC record header")
        headers = _parse_headers(
            data[pos + len(_VERSION) + 2 : head_end], "WARC"
        )
        if "content-length" not in headers:
            raise ValueError("WARC record without Content-Length")
        clen = int(headers["content-length"])
        block_start = head_end + 4
        block = data[block_start : block_start + clen]
        if len(block) < clen:
            raise ValueError(
                f"truncated WARC block (declared {clen}, got {len(block)})"
            )
        sep = data[block_start + clen : block_start + clen + 4]
        if sep != CRLF + CRLF:
            raise ValueError("missing CRLFCRLF record separator")
        pos = block_start + clen + 4
        rec = {
            "rec_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "record_id": headers.get("warc-record-id", ""),
            "date": headers.get("warc-date", ""),
            "block": block,
        }
        if rec["rec_type"] == "conversion":
            # WET-style extracted-text record: the block IS the payload
            # (no HTTP framing); same pinned charset rule
            rec["refers_to"] = headers.get("warc-refers-to", "")
            try:
                rec["text"] = decode_body_text(
                    block, headers.get("content-type", "")
                )
                rec["error"] = None
            except (ValueError, UnicodeDecodeError) as exc:
                rec["text"] = None
                rec["error"] = str(exc)
        elif rec["rec_type"] == "response":
            try:
                rec.update(_parse_http_response(block))
                rec["error"] = None
            except (ValueError, UnicodeDecodeError) as exc:
                # per-record failure: the archive framing is intact, so
                # the scan continues; only this capture is lost (X2)
                rec.update(
                    {
                        "status": None,
                        "http_content_type": None,
                        "body": None,
                        "text": None,
                        "error": str(exc),
                    }
                )
        records.append(rec)
    return records


def _parse_http_response(block: bytes) -> dict:
    head_end = block.find(CRLF + CRLF)
    if head_end < 0:
        raise ValueError("HTTP response without header terminator")
    head = block[:head_end]
    line_end = head.find(CRLF)
    status_line = head if line_end < 0 else head[:line_end]
    m = re.match(rb"HTTP/1\.[01] (\d{3}) ?(.*)", status_line)
    if m is None:
        raise ValueError(f"malformed HTTP status line {status_line!r}")
    headers = _parse_headers(head[line_end + 2 :] if line_end >= 0 else b"", "HTTP")
    body = block[head_end + 4 :]
    if "content-length" in headers:
        declared = int(headers["content-length"])
        if declared != len(body):
            raise ValueError(
                f"HTTP body length mismatch (declared {declared}, got {len(body)})"
            )
    ctype = headers.get("content-type", "")
    return {
        "status": int(m.group(1)),
        "http_content_type": ctype,
        "body": body,
        "text": decode_body_text(body, ctype),
    }
