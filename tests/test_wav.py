"""Real WAV decode path (training/wav.py + multimodal.decode_audio_real):
codec roundtrips, Spark-side feature parity vs direct numpy, recorded
errors for undecodable payloads."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ocr_search_spark.training import multimodal
from ocr_search_spark.training.wav import decode_wav, encode_wav


def test_codec_roundtrip():
    rng = np.random.default_rng(11)
    for n_ch in (1, 2):
        for bits in (8, 16):
            s = rng.uniform(-0.9, 0.9, size=(240, n_ch))
            rate = 8000 * (1 + n_ch)
            r2, back = decode_wav(encode_wav(s, rate, bits))
            assert r2 == rate
            assert back.shape == (240, n_ch)
            tol = 1.0 / (128 if bits == 8 else 32768) + 1e-9
            assert np.abs(back - s).max() <= tol, (n_ch, bits)


def test_codec_rejects_malformed():
    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"MP3 garbage not riff")
    ok = encode_wav(np.zeros((10, 1)), 8000)
    with pytest.raises(ValueError, match="missing fmt"):
        decode_wav(ok[:12])  # chunks stripped
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(ok[:-6])  # data chunk shorter than its declared length
    import struct

    extra = ok + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="multiple data"):
        # second data chunk appended (RIFF size patched to cover it)
        decode_wav(extra[:4] + struct.pack("<I", len(extra) - 8) + extra[8:])


def test_decode_audio_real_features(spark):
    rng = np.random.default_rng(5)
    rows, expected = [], {}
    for i, (rate, n_ch, n_frames) in enumerate([(8000, 1, 400), (16000, 2, 333)]):
        s = rng.uniform(-0.8, 0.8, size=(n_frames, n_ch))
        payload = encode_wav(s, rate, 16)
        ref = f"a{i}.wav"
        rows.append((ref, bytearray(payload)))
        _, dec = decode_wav(payload)  # quantized ground truth
        mono = dec.mean(axis=1)
        expected[ref] = (
            rate, n_frames, n_ch,
            round(n_frames * 1000.0 / rate, 6),
            round(math.sqrt(float((mono * mono).sum()) / len(mono)), 6),
            int(((mono[:-1] >= 0) != (mono[1:] >= 0)).sum()),
        )
    rows.append(("bad.bin", bytearray(b"not audio")))
    media = spark.createDataFrame(rows, "media_ref string, payload binary")
    got = {r["media_ref"]: r for r in multimodal.decode_audio_real(media).collect()}
    for ref, (rate, nf, nc, dur, rms, zc) in expected.items():
        r = got[ref]
        assert (r["sample_rate"], r["n_frames"], r["n_channels"]) == (rate, nf, nc)
        assert abs(r["duration_ms"] - dur) < 1e-9
        assert abs(r["rms"] - rms) < 1e-9
        assert r["zero_crossings"] == zc
        assert r["error"] is None
    assert got["bad.bin"]["error"] is not None
