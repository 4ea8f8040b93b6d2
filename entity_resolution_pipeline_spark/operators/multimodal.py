"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``binary`` columns + a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched functions over ``mapInPandas`` so one task streams batches
without materializing a partition of decoded media in memory.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked STUB (`_decode_stub`): deterministic pseudo-decode from
the byte content.  The Spark-side plumbing — schema, batch iteration,
partition sizing, UDF signatures — is real and tested; swapping in a
real codec (PIL/ffmpeg) on a production image changes only the kernel
body.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a media record: payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

REAL_CODECS_AVAILABLE = False  # no PIL/ffmpeg in this container


def _decode_stub(payload: bytes, kind: str) -> tuple[int, int, np.ndarray]:
    """STUB decode: deterministic pseudo-dimensions + 8-dim feature from
    the raw bytes.  Replace with PIL.Image.open / soundfile / ffmpeg on a
    production image; everything downstream is codec-agnostic.
    """
    if payload is None:
        return 0, 0, np.zeros(8, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    width = int(64 + (int(arr[:4].sum()) % 192)) if arr.size else 0
    height = int(64 + (int(arr[-4:].sum()) % 192)) if arr.size else 0
    # 8-bucket byte histogram, L1-normalized — a stand-in embedding.
    hist = np.histogram(arr, bins=8, range=(0, 256))[0].astype(np.float32)
    total = hist.sum()
    feat = hist / total if total else hist
    return width, height, feat


def real_decode(payload: bytes, kind: str):  # pragma: no cover - stub
    """Production decode hook. Not available in this container."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not installed in this environment; "
        "_decode_stub provides the deterministic test double"
    )


def extract_media_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """media(MEDIA_SCHEMA) → FEATURE_SCHEMA via ``mapInPandas``.

    Streams Arrow batches through one Python worker per task; payload
    bytes never transit the driver.  Kernel is vectorized per batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "feature": [d[2].tolist() for d in decoded],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index.  Frame *extraction* is the stubbed decode; frame *selection*
    (which indices to keep) is pure Spark — posexplode of the index
    sequence — so the shuffle/fan-out shape is the production one.
    """
    frames = F.sequence(
        F.lit(0),
        F.least(
            F.lit((max_frames - 1) * every_n),
            (F.col("n_bytes") / 1000).cast("int") * every_n,
        ),
        F.lit(every_n),
    )
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.posexplode(frames).alias("frame_pos", "frame_index"),
        "payload",
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (no codecs needed):
    payload = repeated md5-derived bytes; kind cycles image/audio/video."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(kinds, (F.pmod(F.col("id"), 3) + 1).cast("int")).alias("kind"),
        F.encode(
            F.repeat(F.md5(F.col("id").cast("string")), 32), "UTF-8"
        ).alias("payload"),
    )
    return df.select(
        "media_id",
        "kind",
        "payload",
        F.concat(F.lit("application/x-"), F.col("kind")).alias("mime"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
