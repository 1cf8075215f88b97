"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct; decode/resize/frame-sample run as Arrow-batched pandas UDFs via
``mapInPandas``.  Real decode is available WITHOUT external codec
libraries for PNG images and WAV audio via the pure stdlib+numpy
decoders in ``sources.media``; PIL is used instead when importable
(broader format support).  Formats neither path covers (JPEG, video)
raise ``DecodeUnavailable``.  A deterministic fake decoder remains the
default so the plumbing (schema, batch shape, partitioning) is
testable independent of payload contents.

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


def _real_decode_image(payload: bytes) -> list[float]:
    """Real decode → ``sources.media.image_features`` statistics.

    PIL when importable; else the pure PNG decoder, then the pure JPEG
    decoder (baseline + progressive, ``sources.jpeg``).  Raises
    ``DecodeUnavailable`` for formats no path can parse.
    """
    import numpy as np

    from moz_datapipeline_spark.sources.media import (
        PNG_MAGIC,
        decode_png,
        image_features,
    )

    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        Image = None
    if Image is not None:
        import io

        try:
            arr = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
            return image_features(arr)
        except Exception:
            # corrupt/unsupported payload with PIL present: fall through
            # to the pure decoders so the DecodeUnavailable contract
            # holds instead of leaking UnidentifiedImageError
            pass
    if payload[:8] == PNG_MAGIC:
        img = decode_png(payload)
        if img.dtype != np.uint8:
            img = (img // 257).astype("u1")  # 16-bit → 8-bit stats space
        return image_features(img)
    if payload[:2] == b"\xff\xd8":
        from moz_datapipeline_spark.sources.jpeg import (
            JpegUnsupported,
            decode_jpeg,
        )

        try:
            return image_features(decode_jpeg(payload))
        except JpegUnsupported as e:
            raise DecodeUnavailable(f"JPEG coding process not covered: {e}")
    raise DecodeUnavailable(
        "payload is not PNG/JPEG and no image codec library is installed"
    )


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

    ``use_real_decoder=True`` decodes actual pixels (PIL, or the pure
    PNG decoder when PIL is absent) and emits the
    ``sources.media.image_features`` statistics contract.
    """
    out_schema = f"{id_col} long, features array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                feats = [
                    _real_decode_image(bytes(p))
                    for p in pdf[f"{media_col}_payload"]
                ]
            else:
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


def extract_audio_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
) -> DataFrame:
    """binary WAV column → 8-stat feature vector per row
    (``sources.media.audio_features``): sample_rate, channels,
    n_samples, duration_ms, rms, peak, zero-crossing rate, DC offset.

    Same Arrow-batched ``mapInPandas`` shape as the image path; WAV
    decodes with the pure stdlib parser, so this path has no codec
    gate at all.
    """
    from moz_datapipeline_spark.sources.media import (
        audio_features,
        decode_wav,
    )

    out_schema = f"{id_col} long, features array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[f"{media_col}_payload"]:
                x, rate = decode_wav(bytes(p))
                feats.append(audio_features(x, rate))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    flat = df.select(
        F.col(id_col),
        F.col(f"{media_col}.payload").alias(f"{media_col}_payload"),
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
