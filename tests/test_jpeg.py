"""Pure JPEG codec tests: encoder↔decoder round-trips at bounded
quantization error, the progressive path on the reference's real
fixture, restart-marker resync, and the multimodal dispatch."""

from __future__ import annotations

import os

import numpy as np
import pytest

from moz_datapipeline_spark.sources.jpeg import (
    JpegError,
    JpegUnsupported,
    decode_jpeg,
    encode_jpeg_baseline,
)

REF_PROGRESSIVE = "/root/reference/tests/fixtures/roadnetwork-diagram.jpg"


def _gradient(h: int, w: int) -> np.ndarray:
    gx, gy = np.meshgrid(np.linspace(0, 255, w), np.linspace(0, 255, h))
    b = np.full((h, w), 64.0)
    return np.stack([gx, gy, b], axis=-1).astype(np.uint8)


def test_uniform_gray_roundtrip_exact():
    """A constant image is DC-only — must survive losslessly."""
    img = np.full((16, 24), 130, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert dec.shape == (16, 24, 1)
    assert int(np.abs(dec[..., 0].astype(int) - 130).max()) == 0


def test_color_gradient_roundtrip_within_quant_error():
    img = _gradient(24, 40)
    dec = decode_jpeg(encode_jpeg_baseline(img, quality=95))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8, err.max()
    assert err.mean() < 2.0


def test_odd_dimensions_crop_back():
    """Non-multiple-of-8 (and -16 under 4:2:0) sizes pad internally and
    crop back to the declared frame size."""
    img = _gradient(17, 29)
    for subsample in (False, True):
        dec = decode_jpeg(encode_jpeg_baseline(img, subsample=subsample))
        assert dec.shape == (17, 29, 3)


def test_420_subsampling_roundtrip():
    img = _gradient(32, 48)
    dec = decode_jpeg(encode_jpeg_baseline(img, quality=95, subsample=True))
    err = np.abs(dec.astype(int) - img.astype(int))
    # chroma carries the box-average loss; luma stays tight
    luma = lambda a: (  # noqa: E731
        0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    )
    assert np.abs(luma(dec.astype(float)) - luma(img.astype(float))).mean() < 2.0
    assert err.mean() < 8.0


def test_noise_roundtrip_bounded_by_quant_tables():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_baseline(img, quality=100))
    # quality 100 → all-ones luma table early coefficients; errors stay
    # small even for white noise
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 6.0, err.mean()


def test_restart_markers_resync():
    img = _gradient(40, 64)
    plain = decode_jpeg(encode_jpeg_baseline(img, quality=92))
    rst = decode_jpeg(encode_jpeg_baseline(img, quality=92, restart_interval=3))
    # restart markers change the byte stream but not the pixels
    assert np.array_equal(plain, rst)


def test_grayscale_3d_input_matches_2d():
    img2 = np.tile(np.arange(0, 240, 10, dtype=np.uint8), (16, 1))
    a = decode_jpeg(encode_jpeg_baseline(img2))
    b = decode_jpeg(encode_jpeg_baseline(img2[..., None]))
    assert np.array_equal(a, b)


@pytest.mark.skipif(
    not os.path.exists(REF_PROGRESSIVE), reason="reference fixture absent"
)
def test_reference_progressive_fixture_decodes():
    """The reference repo's only JPEG is progressive (SOF2): decode it
    end-to-end and sanity-check the frame against its SOF header."""
    data = open(REF_PROGRESSIVE, "rb").read()
    dec = decode_jpeg(data)
    assert dec.shape == (184, 352, 3)
    # a diagram on white background: bright mean, full dynamic range
    assert dec.mean() > 200
    assert dec.min() == 0 and dec.max() == 255
    # progressive self-consistency: re-encode baseline, decode again —
    # the two decodes must agree within quantization error
    again = decode_jpeg(encode_jpeg_baseline(dec, quality=97))
    assert np.abs(again.astype(int) - dec.astype(int)).mean() < 3.0


def test_truncated_and_foreign_bytes_raise():
    with pytest.raises(JpegError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    img = _gradient(16, 16)
    payload = encode_jpeg_baseline(img)
    with pytest.raises((JpegError, ValueError, IndexError)):
        decode_jpeg(payload[:20])


def test_unsupported_sof_raises_loudly():
    # splice an SOF3 (lossless) marker into a minimal stream
    bad = b"\xff\xd8" + b"\xff\xc3" + (17).to_bytes(2, "big") + bytes(15)
    with pytest.raises(JpegUnsupported):
        decode_jpeg(bad + b"\xff\xd9")


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pil_available(), reason="PIL present: dispatch prefers libjpeg decode"
)
def test_multimodal_dispatch_decodes_jpeg_payload():
    from moz_datapipeline_spark.operators.multimodal import _real_decode_image
    from moz_datapipeline_spark.sources.media import image_features

    img = _gradient(16, 16)
    payload = encode_jpeg_baseline(img, quality=95)
    feats = _real_decode_image(payload)
    dec = decode_jpeg(payload)
    assert feats == image_features(dec)
    assert feats[0] == 16.0 and feats[1] == 16.0 and feats[2] == 3.0
