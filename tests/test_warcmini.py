"""warcmini codec + warc_responses operator tests.

Covers the ISO 28500 subset contract: Content-Length framing, the
warcinfo/request/response record family, the pinned BOM > charset-param
> UTF-8 body decode rule, and the two failure tiers (archive-fatal
framing errors vs per-record recoverable body errors)."""

import pytest

from ocr_search_spark.training.warcmini import (
    charset_of,
    decode_body_text,
    decode_warc,
    encode_warc_file,
    http_response_block,
)


def _cap(rid, url="http://x/1", status=200, ctype="text/html; charset=utf-8",
         body=b"<p>hi</p>"):
    return {
        "record_id": rid,
        "url": url,
        "status": status,
        "reason": "OK" if status == 200 else "Not Found",
        "content_type": ctype,
        "body": body,
    }


def test_roundtrip_single_capture():
    data = encode_warc_file([_cap(1)])
    recs = decode_warc(data)
    assert [r["rec_type"] for r in recs] == ["warcinfo", "request", "response"]
    resp = recs[2]
    assert resp["url"] == "http://x/1"
    assert resp["status"] == 200
    assert resp["http_content_type"] == "text/html; charset=utf-8"
    assert resp["text"] == "<p>hi</p>"
    assert resp["error"] is None


def test_roundtrip_many_preserves_order():
    caps = [_cap(i, url=f"http://x/{i}", body=f"<p>{i}</p>".encode()) for i in range(20)]
    recs = [r for r in decode_warc(encode_warc_file(caps)) if r["rec_type"] == "response"]
    assert [r["url"] for r in recs] == [f"http://x/{i}" for i in range(20)]
    assert [r["text"] for r in recs] == [f"<p>{i}</p>" for i in range(20)]


def test_charset_param_latin1():
    body = "caf\xe9 M\xfcnchen".encode("latin-1")
    recs = decode_warc(
        encode_warc_file([_cap(1, ctype="text/html; charset=iso-8859-1", body=body)])
    )
    assert recs[2]["text"] == "caf\xe9 M\xfcnchen"


def test_bom_overrides_wrong_header_charset():
    # header claims latin-1 but the bytes open with a UTF-16LE BOM;
    # the pinned rule says the BOM wins
    body = b"\xff\xfe" + "caf\xe9".encode("utf-16-le")
    recs = decode_warc(
        encode_warc_file([_cap(1, ctype="text/html; charset=iso-8859-1", body=body)])
    )
    assert recs[2]["text"] == "caf\xe9"


def test_utf8_bom_stripped():
    body = b"\xef\xbb\xbf" + "na\xefve".encode("utf-8")
    recs = decode_warc(encode_warc_file([_cap(1, ctype="text/html", body=body)]))
    assert recs[2]["text"] == "na\xefve"


def test_default_utf8_when_no_charset():
    body = "élève".encode("utf-8")
    recs = decode_warc(encode_warc_file([_cap(1, ctype="text/html", body=body)]))
    assert recs[2]["text"] == "élève"


def test_unknown_charset_is_per_record_error():
    caps = [
        _cap(1, ctype="text/html; charset=klingon"),
        _cap(2, url="http://x/2", body=b"<p>ok</p>"),
    ]
    recs = [r for r in decode_warc(encode_warc_file(caps)) if r["rec_type"] == "response"]
    assert recs[0]["text"] is None and "charset" in recs[0]["error"]
    assert recs[1]["text"] == "<p>ok</p>" and recs[1]["error"] is None


def test_undecodable_utf8_is_per_record_error():
    recs = decode_warc(
        encode_warc_file([_cap(1, ctype="text/html; charset=utf-8", body=b"\xff\xfe\xfd")])
    )
    # \xff\xfe is the UTF-16LE BOM — avoid it: use a lone continuation byte
    recs = decode_warc(
        encode_warc_file([_cap(1, ctype="text/html; charset=utf-8", body=b"abc\x80def")])
    )
    assert recs[2]["text"] is None and recs[2]["error"]


def test_truncated_block_raises():
    data = encode_warc_file([_cap(1)])
    with pytest.raises(ValueError, match="truncated|separator"):
        decode_warc(data[:-10])


def test_missing_separator_raises():
    data = encode_warc_file([_cap(1)])
    assert data.endswith(b"\r\n\r\n")
    with pytest.raises(ValueError, match="separator"):
        decode_warc(data[:-4] + b"XXXX")


def test_garbage_prefix_raises():
    with pytest.raises(ValueError, match="version"):
        decode_warc(b"HTTP/1.1 200 OK\r\n\r\n")


def test_http_length_mismatch_is_per_record_error():
    # hand-frame a response whose HTTP Content-Length lies about the body
    bad_http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: 99\r\n\r\n<p>short</p>")
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/bad\r\n"
           + f"Content-Length: {len(bad_http)}\r\n\r\n".encode()
           + bad_http + b"\r\n\r\n")
    recs = decode_warc(rec)
    assert recs[0]["error"] and "mismatch" in recs[0]["error"]


def test_bad_status_line_is_per_record_error():
    block = b"NOT-HTTP nonsense\r\n\r\nbody"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           + f"Content-Length: {len(block)}\r\n\r\n".encode()
           + block + b"\r\n\r\n")
    recs = decode_warc(rec)
    assert recs[0]["error"] and "status line" in recs[0]["error"]


def test_charset_of():
    assert charset_of("text/html; charset=UTF-8") == "utf-8"
    assert charset_of('text/html; charset="ISO-8859-1"') == "iso-8859-1"
    assert charset_of("text/html") is None


def test_http_response_block_frames_content_length():
    block = http_response_block(200, "OK", [("Content-Type", "text/plain")], b"12345")
    assert b"Content-Length: 5\r\n" in block
    assert block.endswith(b"\r\n\r\n12345")


def test_decode_body_text_strict():
    with pytest.raises(ValueError):
        decode_body_text(b"x", "text/html; charset=ebcdic")


def test_operator_explodes_and_records_errors(spark):
    import pandas as pd

    from ocr_search_spark.operators.warc import warc_responses

    good = encode_warc_file([_cap(i, url=f"http://x/{i}") for i in range(3)])
    broken = good[: len(good) - 7]  # framing cut mid-separator
    archives = spark.createDataFrame(
        pd.DataFrame({"warc_id": ["a", "b"], "payload": [good, broken]})
    )
    rows = warc_responses(archives).orderBy("warc_id", "url").collect()
    a = [r for r in rows if r.warc_id == "a"]
    b = [r for r in rows if r.warc_id == "b"]
    assert len(a) == 3 and all(r.error is None for r in a)
    assert [r.url for r in a] == [f"http://x/{i}" for i in range(3)]
    assert len(b) == 1 and b[0].error.startswith("archive:")
    assert b[0].url is None


def test_wet_roundtrip_codec():
    from ocr_search_spark.training.warcmini import decode_warc, encode_wet_file

    data = encode_wet_file(
        [
            {"record_id": 7, "url": "http://x/7", "text": "héllo wörld",
             "refers_to": "<urn:uuid:resp-7>"},
            {"record_id": 8, "url": "http://x/8", "text": ""},
        ]
    )
    recs = decode_warc(data)
    assert [r["rec_type"] for r in recs] == ["warcinfo", "conversion", "conversion"]
    assert recs[1]["text"] == "héllo wörld"
    assert recs[1]["refers_to"] == "<urn:uuid:resp-7>"
    assert recs[2]["text"] == "" and recs[2]["refers_to"] == ""


def test_wet_sink_and_source_operators(spark):
    import pandas as pd

    from ocr_search_spark.operators.warc import texts_to_wet_archives, wet_texts

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [3, 1, 2, 10],
                "wet_group": [0, 0, 1, 1],
                "url": [f"http://x/{i}" for i in (3, 1, 2, 10)],
                "text": ["c", "a", "b", "d"],
            }
        )
    )
    archives = texts_to_wet_archives(df)
    assert archives.count() == 2
    rows = wet_texts(archives).orderBy("url").collect()
    assert all(r.error is None for r in rows)
    assert {r.url: r.text for r in rows} == {
        "http://x/1": "a", "http://x/2": "b", "http://x/3": "c", "http://x/10": "d"
    }
    # determinism: rebuilding under a different partitioning yields
    # byte-identical archives (records ordered by doc_id inside)
    a1 = {r.warc_id: bytes(r.payload) for r in archives.collect()}
    a2 = {
        r.warc_id: bytes(r.payload)
        for r in texts_to_wet_archives(df.repartition(7)).collect()
    }
    assert a1 == a2
