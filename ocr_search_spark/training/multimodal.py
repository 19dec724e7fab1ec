"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched stages.

The Spark-side contract is real and tested — schema, batching,
partition behavior, vectorized UDF signatures. The actual media
*decoding* is stubbed: this container has no image/audio libraries, so
``decode_image_features`` computes deterministic pseudo-features from
the bytes (clearly marked), and ``decode_image_real`` raises
``NotImplementedError`` unless PIL is importable. A real decoder slots
into the same ``mapInPandas`` batch function without touching the
pipeline.

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


def decode_image_real(media: DataFrame) -> DataFrame:  # pragma: no cover
    """Real decoder slot — requires PIL, which this container lacks."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decoding needs PIL/libvips; use "
            "decode_image_features (deterministic fake) in this sandbox"
        ) from exc
    raise NotImplementedError("wire PIL decode into _decode_batch")
