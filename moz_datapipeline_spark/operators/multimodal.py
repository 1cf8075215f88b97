"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode/resize/frame-sample run as Arrow-batched pandas UDFs via
``mapInPandas``. The decode step itself is STUBBED (no image/audio libs
in this container — see ``DecodeUnavailable``); the Spark-side contract
(schema, batch shape, partitioning) is real and tested with a
deterministic fake decoder.

Schema convention:

    media: struct<
        payload: binary,
        mime: string,
        width: int, height: int,          -- images/video
        sample_rate: int, channels: int,  -- audio
        duration_ms: long                 -- audio/video
    >
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DecodeUnavailable(NotImplementedError):
    """Raised by the real decode path: codec libraries not installed."""


MEDIA_SCHEMA = (
    "payload binary, mime string, width int, height int, "
    "sample_rate int, channels int, duration_ms long"
)


def _fake_decode_image(payload: bytes, width: int, height: int) -> list[float]:
    """Deterministic fake decoder: 8 'pixel statistics' from the bytes.

    Stands in for a real (PIL/cv2) decode so the batch plumbing,
    schema, and partitioning are exercised end-to-end.
    """
    if not payload:
        return [0.0] * 8
    n = len(payload)
    s = sum(payload)
    return [
        float(n),
        float(width or 0),
        float(height or 0),
        s / n,
        float(payload[0]),
        float(payload[-1]),
        float(min(payload)),
        float(max(payload)),
    ]


def extract_image_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    use_real_decoder: bool = False,
) -> DataFrame:
    """binary media column → fixed-width feature vector per row.

    ``mapInPandas`` streams Arrow batches; each batch is decoded in
    Python and returns (id, features array<double>). Partition count is
    preserved — at 100 TB, repartition upstream so each task holds
    ~128 MB of payloads.
    """
    out_schema = f"{id_col} long, features array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                raise DecodeUnavailable(
                    "image codec libraries are not installed in this environment"
                )
            feats = [
                _fake_decode_image(
                    row[f"{media_col}_payload"],
                    row[f"{media_col}_width"],
                    row[f"{media_col}_height"],
                )
                for _, row in pdf.iterrows()
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias(f"{media_col}_payload"),
        F.col(f"{media_col}.width").alias(f"{media_col}_width"),
        F.col(f"{media_col}.height").alias(f"{media_col}_height"),
    )
    return flat.mapInPandas(kernel, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp.

    Timestamps are derived columnar-side (sequence over duration); the
    actual frame decode is the stubbed kernel above. This keeps the
    expensive fan-out (rows × frames) inside Catalyst where AQE can
    rebalance it.
    """
    ts = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col(f"{media_col}.duration_ms") - 1, F.lit(0)),
            F.lit(every_ms),
        )
    ).alias("frame_ms")
    return df.select(F.col(id_col), F.col(media_col), ts)
