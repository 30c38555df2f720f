"""Multimodal (image/audio/video) column plumbing.

North-star extension.  Media are opaque ``binary`` columns plus typed
metadata; everything Spark-side (schema, partition shape, Arrow batch
flow, UDF signatures) is real and tested.  The actual codec work
(image decode, resample, frame extraction) requires libraries absent
from this container, so each decode kernel is STUBBED: a deterministic
fake clearly marked, behind the exact interface a real kernel would use
(``mapInPandas`` over Arrow record batches — the only sane shape for
multi-MB blobs: no per-row Python calls, no driver materialization).

Scale notes:
- blobs stay in executor memory one Arrow batch at a time
  (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch bytes);
- metadata extraction is pure expressions (length/hash) and never
  touches Python;
- feature vectors come back as ``array<float>``, ready for the
  similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media-row schema: blob + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),  # image/video; null otherwise
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),  # audio/video; null otherwise
    ]
)


def media_from_text(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Test-fixture adapter: wrap a text column as a binary blob with the
    canonical media schema (the container has no real media files)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("bigint").alias("width"),
        F.lit(None).cast("bigint").alias("height"),
        F.lit(None).cast("bigint").alias("duration_ms"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Pure-expression metadata: byte size + content hash.  This is the
    cheap pass that runs before any decode at 100 TB (dedup by hash,
    size filters) so the expensive kernels see a pruned set."""
    return df.select(
        "media_id",
        "kind",
        F.octet_length("content").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        "mime",
    )


_FEATURE_DIM = 8


def _fake_feature_vector(blob: bytes) -> list[float]:
    """Deterministic stand-in for a real encoder: 8 floats derived from
    byte statistics.  STUB — replace with a real model/codec kernel."""
    if blob is None or len(blob) == 0:
        return [0.0] * _FEATURE_DIM
    n = len(blob)
    return [
        float(n % 997),
        float(blob[0]),
        float(blob[-1]),
        float(sum(blob[:64]) % 1009),
        float(min(blob)),
        float(max(blob)),
        float(n % 31),
        float((blob[n // 2]) if n else 0),
    ]


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Feature extraction over Arrow batches via ``mapInPandas``.

    The iterator-of-batches signature is the real production shape:
    model/codec state loads once per partition, blobs stream through
    without materializing the partition.  Decode itself is stubbed
    (``_fake_feature_vector``).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # real impl: load codec/model ONCE here, per partition
        for batch in batches:
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"],
                    "features": [_fake_feature_vector(b) for b in batch["content"]],
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, schema=FEATURES_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode (PIL/opencv) — NOT AVAILABLE in this container.

    Kept as an explicit stub so the API surface is complete; calling it
    raises rather than silently faking pixel data.
    """
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment; "
        "use extract_features() for the deterministic-stub pipeline"
    )


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Stub — see decode_image."""
    raise NotImplementedError("image resize requires a codec library; stubbed by design")


def sample_video_frames(df: DataFrame, every_ms: int) -> DataFrame:
    """Stub — see decode_image."""
    raise NotImplementedError("video frame sampling requires a codec library; stubbed by design")
