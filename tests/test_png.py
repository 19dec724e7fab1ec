"""Real PNG decode path (training/png.py + multimodal.decode_image_real):
codec roundtrip across every channel count and filter type, Spark-side
pixel-feature parity vs direct numpy, and recorded (not thrown) errors
for undecodable payloads."""

from __future__ import annotations

import numpy as np

from ocr_search_spark.training import multimodal
from ocr_search_spark.training.png import decode_png, encode_png


def test_codec_roundtrip_all_filters_and_channels():
    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        for ft in range(5):
            arr = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(arr, ft)), arr), (ch, ft)
    grad = np.tile(np.arange(64, dtype=np.uint8), (64, 1))
    assert np.array_equal(decode_png(encode_png(grad, 1)), grad[:, :, None])


def test_codec_rejects_malformed():
    import struct

    import pytest

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    ok = encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(ok[:8] + ok[20:])  # IHDR stripped
    # every malformation raises ValueError (never struct/zlib errors)
    with pytest.raises(ValueError, match="truncated"):
        decode_png(ok[:14])  # mid-chunk-header truncation
    with pytest.raises(ValueError, match="truncated"):
        decode_png(ok[:30])  # truncated IHDR body
    idat_at = ok.index(b"IDAT") - 4
    corrupt = bytearray(ok)
    corrupt[idat_at + 8 : idat_at + 12] = b"\xff\xff\xff\xff"  # smash zlib header
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(bytes(corrupt))
    bad_comp = bytearray(ok)
    bad_comp[8 + 8 + 10] = 9  # IHDR compression-method byte
    bad_comp[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(
        ">I", __import__("zlib").crc32(bytes(bad_comp[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    )
    with pytest.raises(ValueError, match="compression/filter"):
        decode_png(bytes(bad_comp))


def test_decode_image_real_features(spark):
    rng = np.random.default_rng(3)
    rows = []
    expected = {}
    for i, (shape, ft) in enumerate([((16, 12, 3), 0), ((9, 7, 1), 2), ((20, 5, 4), 4)]):
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ref = f"img{i}.png"
        rows.append((ref, bytearray(encode_png(arr, ft))))
        px = arr.astype(np.float64)
        expected[ref] = (
            shape[1], shape[0], shape[2],
            round(float(px.mean()), 6),
            round(float(px.std()), 6),
            multimodal.average_hash(px.mean(axis=2)),
        )
    rows.append(("garbage.bin", bytearray(b"definitely not a png")))
    media = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {r["media_ref"]: r for r in multimodal.decode_image_real(media).collect()}

    for ref, (w, h, ch, m, s, ah) in expected.items():
        r = got[ref]
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert abs(r["px_mean"] - m) < 1e-9
        assert abs(r["px_std"] - s) < 1e-9
        assert r["ahash"] == ah
        assert r["error"] is None
    g = got["garbage.bin"]
    assert g["error"] is not None and g["width"] is None


def test_real_decode_end_to_end(spark, corpus_df):
    """Full pipeline: extraction → media refs → real PNG payloads →
    real decode. Every row decodes (no recorded errors), dims/channels
    stay in the generator's envelope, and the run is deterministic."""
    from ocr_search_spark.deploy import ensure_shipped
    from ocr_search_spark.operators.extract import extract_spans_columnar

    ensure_shipped(spark)
    ext = extract_spans_columnar(corpus_df.select("doc_id", "spans"))
    media = multimodal.media_table_png(ext.select("doc_id", "spans")).limit(40)
    feats = multimodal.decode_image_real(media).collect()
    assert feats
    for r in feats:
        assert r["error"] is None, r
        assert 8 <= r["width"] <= 24 and 8 <= r["height"] <= 24
        assert r["channels"] in (1, 3, 4)
        assert 0.0 <= r["px_mean"] <= 255.0
    again = {
        r["media_ref"]: r["ahash"]
        for r in multimodal.decode_image_real(media).collect()
    }
    for r in feats:
        assert again[r["media_ref"]] == r["ahash"]


def test_resize_nearest_exact_grid():
    # 4x4 -> 2x2 with the pinned map src = (dst*4)//2 = [0, 2]
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = multimodal.resize_nearest(arr, 2, 2)
    assert out.tolist() == [[0, 2], [8, 10]]
    # upscale 2x2 -> 4x4: src = (dst*2)//4 = [0,0,1,1]
    up = multimodal.resize_nearest(np.array([[1, 2], [3, 4]], dtype=np.uint8), 4, 4)
    assert up.tolist() == [
        [1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]
    ]


def test_resize_image_real_roundtrip(spark):
    """decode(resize_stage(encode(img))) == hand nearest-sample, and the
    re-encoded BYTES are deterministic across partitionings."""
    rng = np.random.default_rng(11)
    rows = []
    expected = {}
    for i, shape in enumerate([(16, 12, 3), (9, 7, 1)]):
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        ref = f"img{i}.png"
        rows.append((ref, bytearray(encode_png(arr, 0))))
        expected[ref] = multimodal.resize_nearest(arr, 8, 8)
    rows.append(("garbage.bin", bytearray(b"nope")))
    media = spark.createDataFrame(rows, "media_ref string, payload binary")
    out = {
        r["media_ref"]: r
        for r in multimodal.resize_image_real(media, 8, 8).collect()
    }
    for ref, want in expected.items():
        r = out[ref]
        assert (r["width"], r["height"]) == (8, 8) and r["error"] is None
        got = decode_png(bytes(r["payload"]))
        want3 = want if want.ndim == 3 else want[:, :, None]
        assert np.array_equal(got, want3)
    assert out["garbage.bin"]["error"] is not None
    # byte determinism across partitioning
    b1 = {
        r["media_ref"]: bytes(r["payload"]) if r["payload"] is not None else None
        for r in multimodal.resize_image_real(media.repartition(4), 8, 8).collect()
    }
    assert all(
        b1[ref] == bytes(out[ref]["payload"]) for ref in expected
    )
