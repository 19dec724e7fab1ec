"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched stages.

The Spark-side contract is real and tested — schema, batching,
partition behavior, vectorized UDF signatures. Two decode tiers:

* ``decode_image_features`` — deterministic byte-level features
  (clearly marked as the cross-engine-verifiable fake; the DuckDB
  oracle replays it exactly);
* ``decode_image_real`` — an ACTUAL PNG decode path built on the
  dependency-free codec in ``png.py`` (stdlib zlib + numpy; this
  container has no PIL/libvips): pixels → dimensions, channel stats,
  64-bit average-hash. Undecodable payloads record their error per row
  (X2) instead of failing the stage. Verified in tests/test_png.py
  against numpy ground truth on self-encoded fixtures.

Audio/video decode slots follow the same pattern further down.

Reference anchor: the per-page PNG render of
``/root/reference/src/TypeConverter/TypeConverter.class.js:124-191`` is
the reference's only media handling; here media are first-class column
values, not files.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("format", T.StringType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_entropy_bucket", T.IntegerType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def media_table(extracted: DataFrame) -> DataFrame:
    """Materialize the media-span table (media_ref, payload, width,
    height, format) from extracted spans. Payload is a deterministic
    stand-in blob (sha512 bytes of the ref — a real pipeline reads the
    blob store here via spark.read.format('binaryFile') or a ref-keyed
    join); metadata is derived deterministically so tests can pin it."""
    spans = extracted.select(F.explode("spans").alias("s")).where(
        F.col("s.kind") == "media"
    )
    ref = F.col("s.media_ref")
    h = F.sha2(ref, 256)
    hex_at = lambda i: F.conv(F.substring(h, i, 2), 16, 10).cast("int")  # noqa: E731
    return spans.select(
        ref.alias("media_ref"),
        F.to_binary(h, F.lit("hex")).alias("payload"),
        (F.lit(64) + hex_at(1) * 4).alias("width"),
        (F.lit(64) + hex_at(3) * 4).alias("height"),
        F.lit("png").alias("format"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """DETERMINISTIC-FAKE image feature extraction for one Arrow batch.

    Vectorized over the batch: byte stats straight from the payload
    bytes. A real implementation decodes pixels (PIL/libvips) and
    computes the same-shaped features — swap this function only."""
    import numpy as np

    payloads = pdf["payload"]
    n_bytes = payloads.map(len).astype("int64")
    arrs = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
    means = pd.Series([float(a.mean()) if len(a) else 0.0 for a in arrs]).round(6)
    ent_bucket = pd.Series(
        [int(len(np.unique(a)) // 16) for a in arrs], dtype="int32"
    )
    phash = pd.Series(
        [int.from_bytes(p[:7], "big") if len(p) >= 7 else 0 for p in payloads],
        dtype="int64",
    )
    return pd.DataFrame(
        {
            "media_ref": pdf["media_ref"],
            "n_bytes": n_bytes,
            "byte_mean": means,
            "byte_entropy_bucket": ent_bucket,
            "phash": phash,
        }
    )


def _decode_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield _decode_batch(pdf)


def decode_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    The pipeline shape is production-real (mapInPandas over binary
    payloads, bounded Arrow batches); the decode itself is the
    deterministic fake above."""
    return media.select("media_ref", "payload").mapInPandas(
        _decode_iter, schema=FEATURE_SCHEMA
    )


def media_table_png(extracted: DataFrame, seed_tag: str = "png") -> DataFrame:
    """Media table whose payloads are REAL PNG bytes: per media_ref a
    deterministic sha-seeded image (8-24 px sides, PCG64-seeded pixels,
    sha-chosen scanline filter) encoded by the dependency-free codec —
    end-to-end food for :func:`decode_image_real`. In production this
    select is replaced by the blob-store read; everything downstream is
    identical."""
    import hashlib

    refs = (
        extracted.select(F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .png import encode_png

        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                dig = hashlib.sha256((seed_tag + ":" + ref).encode()).digest()
                h = 8 + dig[0] % 17
                w = 8 + dig[1] % 17
                ch = (1, 3, 4)[dig[2] % 3]
                rng = np.random.default_rng(int.from_bytes(dig[3:11], "big"))
                arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
                rows.append((ref, encode_png(arr, filter_type=dig[11] % 5)))
            yield pd.DataFrame(rows, columns=["media_ref", "payload"])

    return refs.mapInPandas(
        gen,
        schema=T.StructType(
            [
                T.StructField("media_ref", T.StringType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )


# ------------------------------------------------------------ audio/video
# Same plumbing contract for the other modalities (task list: "decode /
# feature-extract / resize / frame-sample as Pandas UDFs"): typed
# metadata derived deterministically from the payload, features computed
# byte-level (int8-sample interpretation for audio, 4-byte frame windows
# for video) so they are exact cross-engine — a real codec slots into
# the same batch function.

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
        T.StructField("duration_ms", T.DoubleType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_hash", T.LongType(), False),
    ]
)


def _audio_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import math

    import numpy as np

    for pdf in batches:
        rows = []
        for ref, p in zip(pdf["media_ref"], pdf["payload"]):
            a = np.frombuffer(p, dtype=np.uint8)
            s = a.astype(np.int8).astype(np.float64)
            n = len(s)
            rms = round(math.sqrt(float((s * s).sum()) / n), 6) if n else 0.0
            zc = int(((s[:-1] >= 0) != (s[1:] >= 0)).sum()) if n > 1 else 0
            rate = 8000 * (1 + int(a[0]) % 4) if n else 8000
            rows.append((ref, n, rms, zc, round(n * 1000.0 / rate, 6)))
        yield pd.DataFrame(
            rows,
            columns=["media_ref", "n_samples", "rms", "zero_crossings", "duration_ms"],
        )


def decode_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched audio feature extraction: payload bytes as int8
    samples → RMS, zero crossings, duration from the byte-derived sample
    rate. Same mapInPandas shape a real resampler/codec would use."""
    return media.select("media_ref", "payload").mapInPandas(
        _audio_iter, schema=AUDIO_FEATURE_SCHEMA
    )


def _frame_iter(every_n: int):
    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for ref, p in zip(pdf["media_ref"], pdf["payload"]):
                a = np.frombuffer(p, dtype=np.uint8)
                n_frames = 4 + int(a[1]) % 5 if len(a) > 1 else 0
                for idx in range(0, n_frames, every_n):
                    w = (idx % 8) * 4
                    rows.append(
                        (ref, idx, int.from_bytes(bytes(a[w : w + 4]), "big"))
                    )
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "frame_hash"])

    return it


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: every ``every_n``-th frame of the byte-derived
    frame count, each hashed from its 4-byte payload window — the
    mapInPandas slot where a real demuxer (pyav/ffmpeg) plugs in. One
    input row fans out to ~n_frames/every_n output rows; Arrow batch
    sizes stay bounded because frames-per-doc is metadata-bounded (at
    scale: repartition upstream on media_ref for fan-out skew)."""
    return media.select("media_ref", "payload").mapInPandas(
        _frame_iter(every_n), schema=FRAME_SCHEMA
    )


# ------------------------------------------------------------ real decode
# training/png.py is a dependency-free PNG codec (stdlib zlib + numpy),
# so the "real decoder" slot no longer needs PIL: payloads that are
# actual PNG bytes are decoded to pixels and featurized for real.

REAL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("px_mean", T.DoubleType(), True),
        T.StructField("px_std", T.DoubleType(), True),
        T.StructField("ahash", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def average_hash(gray: "np.ndarray") -> int:  # noqa: F821
    """64-bit average hash: 8×8 block means thresholded at their mean —
    the classic perceptual near-dup signature, pure numpy."""
    import numpy as np

    h, w = gray.shape
    if h < 8 or w < 8:
        # tiny image: block slicing would produce EMPTY slices (NaN means
        # → ahash silently 0); nearest-sample an 8×8 grid instead
        blocks = gray[(np.arange(8) * h) // 8][:, (np.arange(8) * w) // 8].astype(
            np.float64
        )
    else:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        blocks = np.empty((8, 8), dtype=np.float64)
        for i in range(8):
            for j in range(8):
                blocks[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # two's-complement int64 (Arrow/Spark LongType) — standard for hashes
    return out - (1 << 64) if out >= (1 << 63) else out


def _decode_real_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from .png import decode_png

    for pdf in batches:
        rows = []
        for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
            try:
                arr = decode_png(bytes(payload))
                h, w, ch = arr.shape
                px = arr.astype(np.float64)
                gray = px.mean(axis=2)
                rows.append(
                    (
                        ref, w, h, ch,
                        round(float(px.mean()), 6),
                        round(float(px.std()), 6),
                        average_hash(gray),
                        None,
                    )
                )
            except Exception as exc:  # X2: recorded, not silent
                rows.append((ref, None, None, None, None, None, None, str(exc)))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_ref", "width", "height", "channels",
                "px_mean", "px_std", "ahash", "error",
            ],
        )


AUDIO_REAL_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def _decode_audio_real_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import math

    import numpy as np

    from .wav import decode_wav

    for pdf in batches:
        rows = []
        for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
            try:
                rate, s = decode_wav(bytes(payload))
                n_frames, n_ch = s.shape
                mono = s.mean(axis=1)
                rms = (
                    round(math.sqrt(float((mono * mono).sum()) / len(mono)), 6)
                    if len(mono)
                    else 0.0
                )
                zc = (
                    int(((mono[:-1] >= 0) != (mono[1:] >= 0)).sum())
                    if len(mono) > 1
                    else 0
                )
                rows.append(
                    (
                        ref, rate, n_frames, n_ch,
                        round(n_frames * 1000.0 / rate, 6), rms, zc, None,
                    )
                )
            except Exception as exc:
                rows.append((ref, None, None, None, None, None, None, str(exc)))
        yield pd.DataFrame(
            rows,
            columns=[
                "media_ref", "sample_rate", "n_frames", "n_channels",
                "duration_ms", "rms", "zero_crossings", "error",
            ],
        )


def decode_audio_real(media: DataFrame) -> DataFrame:
    """REAL audio decode: WAV/PCM payloads → header-true sample rate,
    frame counts, duration, per-sample RMS and zero crossings on the
    decoded waveform (wav.py, stdlib struct — no audio lib needed).
    Undecodable payloads record their error per row (X2)."""
    return media.select("media_ref", "payload").mapInPandas(
        _decode_audio_real_iter, schema=AUDIO_REAL_SCHEMA
    )


def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode over the payload column: PNG bytes → pixels →
    (dimensions, channel count, pixel mean/std, 64-bit average hash).
    Same Arrow-batched mapInPandas slot as the byte-stat fake; rows whose
    payload is not a decodable PNG carry the error instead of failing
    the stage (X2 recorded degradation)."""
    return media.select("media_ref", "payload").mapInPandas(
        _decode_real_iter, schema=REAL_FEATURE_SCHEMA
    )


AUDIO_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("in_rate", T.IntegerType(), True),
        T.StructField("out_rate", T.IntegerType(), True),
        T.StructField("n_frames_in", T.LongType(), True),
        T.StructField("n_frames_out", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def _resample_audio_iter(out_rate: int):
    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .wav import decode_wav, encode_wav

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                try:
                    rate, s = decode_wav(bytes(payload))
                    n_in = s.shape[0]
                    n_out = (n_in * out_rate) // rate
                    idx = (np.arange(n_out, dtype=np.int64) * rate) // out_rate
                    out = s[idx] if n_out else s[:0]
                    rows.append(
                        (
                            ref, rate, out_rate, n_in, n_out,
                            encode_wav(out, out_rate, bits=16), None,
                        )
                    )
                except Exception as exc:
                    rows.append((ref, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "in_rate", "out_rate", "n_frames_in",
                    "n_frames_out", "payload", "error",
                ],
            )

    return it


def resample_audio(media: DataFrame, out_rate: int) -> DataFrame:
    """Task-list audio RESAMPLE, real and byte-deterministic: WAV bytes
    → decode (wav.py) → nearest-frame resample on the PINNED integer
    grid ``src = (dst · in_rate) // out_rate`` (the audio twin of
    :func:`resize_nearest`'s pixel grid — pure integer floor, no
    interpolation, no floats) → RE-ENCODE as 16-bit PCM at ``out_rate``
    (8-bit inputs promote losslessly: every 8-bit level sits exactly on
    the 16-bit grid). The normalize-to-16kHz stage every ASR/audio
    training pipeline runs before feature extraction, in the same
    Arrow-batched mapInPandas slot as the decoders; undecodable
    payloads carry their error per row (X2).

    Output frame count is the floor ratio ``(n_in · out_rate) //
    in_rate`` — exact, and output BYTES are identical on every
    executor/platform (pytest asserts the round trip)."""
    if out_rate < 1:
        raise ValueError(f"out_rate must be >= 1, got {out_rate}")
    return media.select("media_ref", "payload").mapInPandas(
        _resample_audio_iter(out_rate), schema=AUDIO_RESAMPLE_SCHEMA
    )


VAD_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("seg_idx", T.IntegerType(), True),
        T.StructField("start_frame", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("peak_e6", T.LongType(), True),
        T.StructField("mean_e6", T.LongType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def _energy_segments_iter(frame_len: int, threshold_e6: int):
    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .wav import decode_wav

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                try:
                    _rate, s = decode_wav(bytes(payload))
                    # exact int reconstruction: every decoded sample is
                    # k/32768 (16-bit) or 256·k/32768 (8-bit) — one
                    # uniform scale covers both depths losslessly
                    ints = np.rint(s * 32768.0).astype(np.int64)
                    n_ch = ints.shape[1] if ints.ndim == 2 else 1
                    mono = ints.sum(axis=1) if ints.ndim == 2 else ints
                    scale2 = (n_ch * 32768) ** 2
                    energies = []
                    for f0 in range(0, len(mono), frame_len):
                        seg = mono[f0 : f0 + frame_len]
                        # Σ seg² ≤ frame_len·(ch·2^15)² — int64-safe for
                        # any sane frame_len; the 1e6 scale promotes to
                        # Python arbitrary precision
                        energies.append(
                            (1_000_000 * int(np.dot(seg, seg)))
                            // (len(seg) * scale2)
                        )
                    seg_idx = 0
                    i = 0
                    while i < len(energies):
                        if energies[i] >= threshold_e6:
                            j = i
                            while (
                                j < len(energies)
                                and energies[j] >= threshold_e6
                            ):
                                j += 1
                            run = energies[i:j]
                            rows.append(
                                (
                                    ref,
                                    seg_idx,
                                    i,
                                    j - i,
                                    max(run),
                                    sum(run) // len(run),
                                    None,
                                )
                            )
                            seg_idx += 1
                            i = j
                        else:
                            i += 1
                except Exception as exc:
                    rows.append((ref, None, None, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "seg_idx", "start_frame", "n_frames",
                    "peak_e6", "mean_e6", "error",
                ],
            )

    return it


def energy_segments(
    media: DataFrame, frame_len: int = 160, threshold_e6: int = 10_000
) -> DataFrame:
    """VAD-style ACTIVITY SEGMENTATION over real WAV payloads: decode →
    frame the channel-summed waveform into ``frame_len``-sample frames
    (tail partial frame keeps its own length) → per-frame energy in
    exact integer micros of mean-square amplitude → maximal runs of
    frames at or above ``threshold_e6`` become segments. One row per
    segment: (media_ref, seg_idx, start_frame, n_frames, peak_e6,
    mean_e6); silent clips emit nothing; undecodable payloads carry
    their error per row (X2) instead of failing the stage.

    This is the voice-activity pre-filter an ASR/training pipeline runs
    before transcription — cutting silence keeps GPU-hours ∝ speech,
    not ∝ recording length. Energy arithmetic is pinned integer
    throughout (Σ sample² over the PCM grid, floor-div by
    frame·(ch·2¹⁵)²), so segments are bit-identical at any
    parallelism/platform — no float accumulation anywhere.

    Scale shape: one Arrow-batched mapInPandas pass, codec-adjacent
    Python only (the sanctioned slot, SCALE.md rule 6); per-clip state
    is the frame-energy list — bounded by clip length, never corpus."""
    if frame_len < 1:
        raise ValueError(f"frame_len must be >= 1, got {frame_len}")
    if threshold_e6 < 0:
        raise ValueError(f"threshold_e6 must be >= 0, got {threshold_e6}")
    return media.select("media_ref", "payload").mapInPandas(
        _energy_segments_iter(frame_len, threshold_e6), schema=VAD_SCHEMA
    )


def resize_nearest(arr: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":  # noqa: F821
    """Nearest-neighbor resize with the PINNED index map
    ``src = (dst * src_len) // dst_len`` (pure integer floor — the same
    grid :func:`average_hash` samples, so both stages quantize
    identically). No interpolation, no floats: byte-exact on any
    platform."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def resize_image_real(media: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Task-list "resize" stage, REAL and byte-deterministic: PNG bytes →
    decode (hand-written codec) → nearest-neighbor integer-grid resize →
    RE-ENCODE to PNG (fixed filter 0, fixed zlib level) → (media_ref,
    width, height, payload, error). The full decode→transform→re-encode
    loop a multimodal training pipeline runs before feature extraction,
    in the same Arrow-batched mapInPandas slot as the decoders; bad
    payloads carry the error instead of failing the stage (X2).

    Determinism: the codec pair is dependency-free (training/png.py) and
    the resize grid is integer floor arithmetic, so output BYTES are
    identical on every executor/platform — asserted round-trip in
    pytest."""
    import numpy as np  # noqa: F401

    from .png import decode_png, encode_png

    def it(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                try:
                    arr = decode_png(bytes(payload))
                    small = resize_nearest(arr, out_h, out_w)
                    rows.append(
                        (ref, out_w, out_h, encode_png(small, filter_type=0), None)
                    )
                except Exception as exc:  # X2: recorded, not silent
                    rows.append((ref, None, None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=["media_ref", "width", "height", "payload", "error"]
            )

    return media.select("media_ref", "payload").mapInPandas(
        it, schema=RESIZE_SCHEMA
    )


def canonical_media(
    media_spans: DataFrame,
    digest_col: str = "digest",
    ref_col: str = "media_ref",
) -> DataFrame:
    """Cross-doc media deduplication mapping: one row per distinct
    content digest with its pinned canonical ref and copy count.

    Web corpora repeat the same image/audio bytes across millions of
    pages (logos, icons, stock media); a training pipeline stores ONE
    copy and rewrites references (reference analog: ocr_search renders
    and stores every page PNG per doc with no content addressing —
    ProcessDirector.class.js:119-141). The canonical ref is pinned as
    the MINIMUM media_ref per digest (a total order, partition
    invariant).

    Plan: one hash aggregate keyed by digest — output cardinality =
    distinct contents, broadcastable back over the corpus. In
    production the digest is sha256(payload) computed in the decode
    stage; callers pass whatever digest column they carry.
    """
    return media_spans.groupBy(F.col(digest_col).alias("digest")).agg(
        F.min(ref_col).alias("canonical_ref"),
        F.count("*").cast("long").alias("n_copies"),
    )


def rewrite_media_refs(
    media_spans: DataFrame,
    mapping: DataFrame,
    digest_col: str = "digest",
    ref_col: str = "media_ref",
) -> DataFrame:
    """Rewrite every media span's ref to its canonical copy (broadcast
    join — the mapping is distinct-content-sized). Adds
    ``canonical_ref`` and ``is_duplicate`` (true on every non-canonical
    copy: the storage layer drops those payloads)."""
    j = media_spans.join(
        F.broadcast(mapping.select(F.col("digest").alias(digest_col), "canonical_ref")),
        digest_col,
    )
    return j.withColumn(
        "is_duplicate", F.col(ref_col) != F.col("canonical_ref")
    )
