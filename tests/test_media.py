"""Pure PNG/WAV decoders and the de-gated multimodal real-decode path.
Encoders here are written independently with struct/zlib — never the
library under test."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from moz_datapipeline_spark.sources.media import (
    audio_features,
    decode_png,
    decode_wav,
    image_features,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _encode_png(img: np.ndarray, filters=None, palette=None) -> bytes:
    """Independent minimal PNG encoder: 8-bit, per-row filter choice."""
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch] if palette is None else 3
    raw = bytearray()
    bpp = ch
    prev = np.zeros(w * ch, dtype="i4")
    for y in range(h):
        line = img[y].reshape(-1).astype("i4")
        f = 0 if filters is None else filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, dtype="i4"), line[:-bpp]])
            enc = (line - left) & 0xFF
        elif f == 2:  # Up
            enc = (line - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, dtype="i4"), line[:-bpp]])
            enc = (line - (left + prev) // 2) & 0xFF
        else:  # Paeth
            enc = np.empty_like(line)
            for i in range(len(line)):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (line[i] - pred) & 0xFF
        raw.extend(int(v) & 0xFF for v in enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype("u1").tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _chunk(b"IEND", b"")
    return out


def _encode_wav(x: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Independent minimal PCM WAV encoder (int16)."""
    assert bits == 16
    pcm = np.clip(x * 32768.0, -32768, 32767).astype("<i2").tobytes()
    ch = x.shape[1]
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_roundtrip_all_filters(filters):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    got = decode_png(_encode_png(img.astype("i4"), filters=filters))
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("ch", [1, 2, 4])
def test_png_gray_and_alpha_channels(ch):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 11, ch), dtype=np.uint8)
    got = decode_png(_encode_png(img.astype("i4"), filters=[4]))
    np.testing.assert_array_equal(got, img)


def test_png_palette_expands_to_rgb():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype="u1")
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)[..., None]
    got = decode_png(
        _encode_png(idx.astype("i4"), filters=[0], palette=palette)
    )
    np.testing.assert_array_equal(got, palette[idx[..., 0]])


def test_wav_roundtrip_stereo():
    t = np.arange(800) / 8000.0
    x = np.stack(
        [np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 220 * t)],
        axis=1,
    )
    got, rate = decode_wav(_encode_wav(x, 8000))
    assert rate == 8000
    assert got.shape == (800, 2)
    np.testing.assert_allclose(got, x, atol=1.0 / 32768)


def test_feature_contracts():
    img = np.zeros((4, 5, 3), dtype="u1")
    img[..., 0] = 200  # pure red
    f = image_features(img)
    assert f[:3] == [5.0, 4.0, 3.0]
    assert f[7] == pytest.approx(0.299 * 200)
    x = np.ones((8000, 1)) * 0.25
    a = audio_features(x, 8000)
    assert a[0] == 8000.0 and a[3] == pytest.approx(1000.0)
    assert a[4] == pytest.approx(0.25) and a[6] == 0.0


def test_extract_image_features_real_decoder(spark):
    """The de-gated multimodal path: real pixel statistics from PNG
    payloads through the Arrow-batched kernel (no PIL here)."""
    from moz_datapipeline_spark.operators.multimodal import (
        extract_image_features,
    )

    img1 = np.full((4, 4, 3), 10, dtype=np.uint8)
    img2 = np.full((2, 8, 3), 250, dtype=np.uint8)
    rows = [
        (1, (_encode_png(img1.astype("i4")), "image/png", 4, 4, None, None, None)),
        (2, (_encode_png(img2.astype("i4")), "image/png", 8, 2, None, None, None)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, media struct<payload:binary,mime:string,width:int,"
        "height:int,sample_rate:int,channels:int,duration_ms:long>",
    )
    out = {
        r["doc_id"]: r["features"]
        for r in extract_image_features(df, use_real_decoder=True).collect()
    }
    assert out[1][:3] == [4.0, 4.0, 3.0] and out[1][3] == pytest.approx(10.0)
    assert out[2][:3] == [8.0, 2.0, 3.0] and out[2][3] == pytest.approx(250.0)


def test_extract_image_features_rejects_non_png(spark):
    from moz_datapipeline_spark.operators.multimodal import (
        extract_image_features,
    )

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present — non-PNG payloads would decode")
    except ImportError:
        pass
    df = spark.createDataFrame(
        [(1, (b"GIF89a not-a-raster-we-parse", "image/gif", 1, 1, None, None, None))],
        "doc_id long, media struct<payload:binary,mime:string,width:int,"
        "height:int,sample_rate:int,channels:int,duration_ms:long>",
    )
    with pytest.raises(Exception, match="not PNG/JPEG"):
        extract_image_features(df, use_real_decoder=True).collect()
    # corrupt-but-JPEG-magic payloads surface the parse error loudly
    # (a data problem, not a capability boundary)
    bad = spark.createDataFrame(
        [(1, (b"\xff\xd8\xff jpeg-ish", "image/jpeg", 1, 1, None, None, None))],
        "doc_id long, media struct<payload:binary,mime:string,width:int,"
        "height:int,sample_rate:int,channels:int,duration_ms:long>",
    )
    with pytest.raises(Exception, match="marker|JPEG|frame"):
        extract_image_features(bad, use_real_decoder=True).collect()


def test_extract_audio_features_distributed(spark):
    from moz_datapipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    t = np.arange(1600) / 16000.0
    wav = _encode_wav(np.sin(2 * np.pi * 440 * t)[:, None], 16000)
    df = spark.createDataFrame(
        [(7, (wav, "audio/wav", None, None, 16000, 1, 100))],
        "doc_id long, media struct<payload:binary,mime:string,width:int,"
        "height:int,sample_rate:int,channels:int,duration_ms:long>",
    )
    out = extract_audio_features(df).collect()
    assert len(out) == 1
    f = out[0]["features"]
    assert f[0] == 16000.0 and f[1] == 1.0 and f[2] == 1600.0
    assert f[3] == pytest.approx(100.0)
    assert f[4] == pytest.approx(np.sqrt(0.5), rel=1e-2)  # sine RMS


def test_dhash_and_image_near_dup(spark):
    import numpy as np

    from moz_datapipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        dhash64,
        image_near_dup,
    )
    from moz_datapipeline_spark.sources.avi import gradient_frame
    from moz_datapipeline_spark.sources.jpeg import encode_jpeg_baseline

    base = np.array(gradient_frame(0, 12, 18))
    tweaked = base.copy()
    tweaked[3, 5, 0] ^= 3                 # near-dup: one-pixel change
    inverted = np.ascontiguousarray(255 - base)  # far: every bit flips

    # pure-function pins: determinism, signed-long range, inversion
    h_base = dhash64(base)
    assert h_base == dhash64(base)
    assert -(1 << 63) <= h_base < (1 << 63)
    xa = h_base & (2**64 - 1)
    xb = dhash64(inverted) & (2**64 - 1)
    assert bin(xa ^ xb).count("1") > 32

    def media_row(i, frame):
        return (
            i,
            {
                "payload": encode_jpeg_baseline(frame, quality=90),
                "mime": "image/jpeg",
                "width": 18,
                "height": 12,
                "sample_rate": None,
                "channels": None,
                "duration_ms": None,
            },
        )

    df = spark.createDataFrame(
        [media_row(0, base), media_row(1, tweaked), media_row(2, inverted)],
        f"doc_id long, media struct<{MEDIA_SCHEMA}>",
    )
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in image_near_dup(df, max_hamming=6).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 6
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_ahash_and_audio_near_dup(spark):
    import numpy as np
    import pytest

    from moz_datapipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        ahash64,
        audio_near_dup,
    )
    from moz_datapipeline_spark.sources.media import encode_wav_pcm16

    t = np.arange(4000) / 8000.0
    u = t / t[-1]
    rising = 0.8 * u * np.sin(2 * np.pi * 440 * t)
    noisy = rising + np.random.default_rng(1).normal(0, 1e-3, t.shape)
    falling = 0.8 * (1 - u) * np.sin(2 * np.pi * 440 * t)

    # pure pins: determinism, gain invariance, rising vs falling far
    h = ahash64(rising)
    assert h == ahash64(rising) == ahash64(rising * 0.5)
    far = (h & (2**64 - 1)) ^ (ahash64(falling) & (2**64 - 1))
    assert bin(far).count("1") > 32
    with pytest.raises(ValueError, match=">= 65 samples"):
        ahash64(np.ones(10))

    def row(i, sig):
        return (
            i,
            {
                "payload": encode_wav_pcm16(
                    np.clip(sig, -1, 1)[:, None], 8000
                ),
                "mime": "audio/wav",
                "width": None,
                "height": None,
                "sample_rate": 8000,
                "channels": 1,
                "duration_ms": 500,
            },
        )

    df = spark.createDataFrame(
        [row(0, rising), row(1, noisy), row(2, falling)],
        f"doc_id long, media struct<{MEDIA_SCHEMA}>",
    )
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in audio_near_dup(df, max_hamming=6).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] <= 6
    assert (0, 2) not in pairs and (1, 2) not in pairs
