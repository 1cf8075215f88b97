"""AVI/MJPEG container codec and the real video/resize operators.

The AVI fixtures are built with ``encode_avi_mjpeg`` but every header
field the decoder consumes is independently re-read here with
struct.unpack against the public RIFF layout, and frame payloads are
compared byte-for-byte against the JPEG inputs — so a symmetric
encoder/decoder bug cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moz_datapipeline_spark.sources.avi import (
    AviError,
    AviUnsupported,
    decode_avi,
    encode_avi_mjpeg,
    frame_at,
    video_features,
)
from moz_datapipeline_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg_baseline,
)
from moz_datapipeline_spark.sources.media import resize_bilinear


def _gradient_frame(seed: int, h: int = 16, w: int = 24) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + seed * 31) % 256
    g = (y * 11 + seed * 17) % 256
    b = (x + y + seed) % 256
    return np.stack([r, g, b], axis=-1).astype("u1")


def _fixture_avi(n_frames: int = 5, fps: float = 4.0, seed: int = 0):
    jpegs = [
        encode_jpeg_baseline(_gradient_frame(seed + i), quality=90)
        for i in range(n_frames)
    ]
    return jpegs, encode_avi_mjpeg(jpegs, 24, 16, fps=fps)


class TestContainer:
    def test_round_trip_frames_bytes_identical(self):
        jpegs, avi = _fixture_avi()
        frames, meta = decode_avi(avi)
        assert frames == jpegs
        assert meta["usec_per_frame"] == 250000
        assert (meta["width"], meta["height"]) == (24, 16)
        assert meta["n_frames"] == 5
        assert meta["handler"] == "MJPG"

    def test_header_fields_against_independent_struct_read(self):
        _, avi = _fixture_avi(n_frames=3, fps=10.0)
        # independent walk: RIFF size, then find 'avih' by scan
        assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
        (riff_size,) = struct.unpack_from("<I", avi, 4)
        assert riff_size == len(avi) - 8
        i = avi.index(b"avih")
        usec, _, _, _, total = struct.unpack_from("<5I", avi, i + 8)
        assert usec == 100000 and total == 3

    def test_odd_sized_frames_word_aligned(self):
        # JPEG payloads with odd lengths force the RIFF pad-byte path
        jpegs = [b"\xff\xd8" + bytes([i]) * (2 * i + 1) for i in range(4)]
        avi = encode_avi_mjpeg(jpegs, 8, 8, fps=1.0)
        frames, _ = decode_avi(avi)
        assert frames == jpegs

    def test_non_riff_and_wrong_form_raise(self):
        with pytest.raises(AviUnsupported):
            decode_avi(b"\x89PNG\r\n\x1a\nxxxxxx")
        with pytest.raises(AviUnsupported):
            decode_avi(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    def test_truncated_chunk_raises(self):
        _, avi = _fixture_avi(n_frames=2)
        with pytest.raises((AviError, AviUnsupported)):
            decode_avi(avi[:40])

    def test_frame_at_floor_and_clamp(self):
        frames = [b"a", b"b", b"c"]
        assert frame_at(frames, 250000, 0) == 0
        assert frame_at(frames, 250000, 249) == 0
        assert frame_at(frames, 250000, 250) == 1
        assert frame_at(frames, 250000, 10_000_000) == 2

    def test_video_features_motion_zero_on_static(self):
        f = _gradient_frame(1).astype("f8")
        vf = video_features([f, f, f])
        assert vf[0] == 3.0 and vf[1] == 0.0

    def test_empty_features(self):
        assert video_features([]) == [0.0, 0.0, 0.0, 0.0]


class TestResize:
    def test_identity(self):
        img = _gradient_frame(3)
        assert (resize_bilinear(img, 24, 16) == img).all()

    def test_downscale_2x_matches_box_centers(self):
        # constant image stays constant under any resize
        img = np.full((8, 8, 3), 77, dtype="u1")
        assert (resize_bilinear(img, 3, 5) == 77).all()

    def test_known_1d_interpolation(self):
        # row [0, 100]: 4-wide output samples at src x = -0.25, .25, .75, 1.25
        img = np.array([[[0], [100]]], dtype="u1")
        out = resize_bilinear(img, 4, 1)
        assert out[0, :, 0].tolist() == [0, 25, 75, 100]

    def test_grayscale_input_and_bad_size(self):
        g = np.arange(16, dtype="u1").reshape(4, 4)
        assert resize_bilinear(g, 2, 2).shape == (2, 2, 1)
        with pytest.raises(ValueError):
            resize_bilinear(g, 0, 2)


@pytest.fixture(scope="module")
def media_df(spark):
    jpegs, avi = _fixture_avi(n_frames=6, fps=5.0, seed=2)
    _, avi2 = _fixture_avi(n_frames=2, fps=1.0, seed=9)
    png_like = encode_jpeg_baseline(_gradient_frame(4, 8, 8), quality=95)
    rows = [
        (1, (avi, "video/x-msvideo", 24, 16, None, None, 1200)),
        (2, (avi2, "video/x-msvideo", 24, 16, None, None, 2000)),
        (3, (png_like, "image/jpeg", 8, 8, None, None, None)),
    ]
    schema = (
        "doc_id long, media struct<payload binary, mime string, width int,"
        " height int, sample_rate int, channels int, duration_ms long>"
    )
    return spark.createDataFrame(rows, schema)


class TestOperators:
    def test_extract_video_frames(self, spark, media_df):
        from moz_datapipeline_spark.operators.multimodal import (
            extract_video_frames,
        )

        vids = media_df.filter("doc_id <= 2")
        out = extract_video_frames(vids, every_ms=400).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.doc_id, []).append(r)
        # doc 1: 6 frames at 5fps = 1200 ms → samples at 0,400,800
        assert sorted(r.frame_ms for r in by_id[1]) == [0, 400, 800]
        # doc 2: 2 frames at 1fps = 2000 ms → 0,400,...,1600
        assert sorted(r.frame_ms for r in by_id[2]) == [0, 400, 800, 1200, 1600]
        # features follow the image_features contract (w, h first)
        for r in out:
            assert r.features[0] == 24.0 and r.features[1] == 16.0

    def test_video_frame_features_match_driver_side_decode(self, media_df):
        from moz_datapipeline_spark.operators.multimodal import (
            extract_video_frames,
        )
        from moz_datapipeline_spark.sources.media import image_features

        jpegs, _ = _fixture_avi(n_frames=6, fps=5.0, seed=2)
        want0 = image_features(np.atleast_3d(decode_jpeg(jpegs[0])))
        row0 = (
            extract_video_frames(media_df.filter("doc_id = 1"), every_ms=400)
            .filter("frame_ms = 0")
            .collect()[0]
        )
        assert row0.features == pytest.approx(want0)

    def test_video_summary(self, media_df):
        from moz_datapipeline_spark.operators.multimodal import video_summary

        out = {
            r.doc_id: r.features
            for r in video_summary(media_df.filter("doc_id <= 2")).collect()
        }
        assert out[1][0] == 6.0 and out[2][0] == 2.0
        assert out[1][1] > 0  # gradient frames differ → nonzero motion

    def test_resize_images_jpeg_payload(self, media_df):
        from moz_datapipeline_spark.operators.multimodal import resize_images

        out = resize_images(
            media_df.filter("doc_id = 3"), out_w=4, out_h=4
        ).collect()[0]
        m = out.media
        assert (m.width, m.height, m.mime) == (4, 4, "image/raw-rgb")
        assert len(m.payload) == 4 * 4 * 3
        # kernel output equals driver-side decode+resize of the same bytes
        src = decode_jpeg(
            media_df.filter("doc_id = 3").collect()[0].media.payload
        )
        want = resize_bilinear(np.atleast_3d(src), 4, 4).tobytes()
        assert bytes(m.payload) == want

    def test_resize_images_rejects_unknown_payload(self, spark):
        from moz_datapipeline_spark.operators.multimodal import (
            DecodeUnavailable,
            resize_images,
        )
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PythonException

        df = spark.createDataFrame(
            [(1, (b"not an image", "application/octet-stream", 1, 1, None, None, None))],
            "doc_id long, media struct<payload binary, mime string, width int,"
            " height int, sample_rate int, channels int, duration_ms long>",
        )
        with pytest.raises((PythonException, Py4JJavaError, DecodeUnavailable)):
            resize_images(df, 2, 2).collect()


class TestReviewRegressions:
    def test_audio_first_avi_video_stream_one(self):
        """Video chunks of an audio-first AVI are '01dc'; the decoder
        must key frames off the vids strh position, not stream 0."""
        import struct as _s

        jpegs, avi = _fixture_avi(n_frames=3)
        # rebuild the container with an auds strl before the vids strl
        # and 01dc movi chunks (independent construction, not the encoder)
        def chunk(fourcc, body):
            pad = b"\x00" if len(body) & 1 else b""
            return fourcc + _s.pack("<I", len(body)) + body + pad

        def lst(t, body):
            return chunk(b"LIST", t + body)

        avih = _s.pack("<14I", 250000, 0, 0, 0, 3, 0, 2, 0, 24, 16, 0, 0, 0, 0)
        auds_strh = b"auds" + b"\x00" * 52
        vids_strh = b"vids" + b"MJPG" + b"\x00" * 48
        hdrl = lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", auds_strh))
            + lst(b"strl", chunk(b"strh", vids_strh)),
        )
        movi = lst(b"movi", b"".join(chunk(b"01dc", f) for f in jpegs))
        body = b"AVI " + hdrl + movi
        payload = b"RIFF" + _s.pack("<I", len(body)) + body
        frames, meta = decode_avi(payload)
        assert frames == jpegs
        assert meta["handler"] == "MJPG"

    def test_jpeg_fill_bytes_before_markers(self):
        """T.81 B.1.1.2 fill bytes (extra 0xFF before a marker) must be
        consumed, both in the marker loop and before RSTn."""
        img = _gradient_frame(5)
        plain = encode_jpeg_baseline(img, quality=90)
        want = decode_jpeg(plain)
        # fill byte before the EOI marker and before the first DQT
        soi, rest = plain[:2], plain[2:]
        padded = soi + b"\xff" + rest[:-2] + b"\xff" + rest[-2:]
        got = decode_jpeg(padded)
        assert (got == want).all()
        # fill byte ahead of every RST marker in a restart-interval scan
        ri = encode_jpeg_baseline(img, quality=90, restart_interval=1)
        want_ri = decode_jpeg(ri)
        out = bytearray()
        i = 0
        while i < len(ri):
            if ri[i] == 0xFF and i + 1 < len(ri) and 0xD0 <= ri[i + 1] <= 0xD7:
                out += b"\xff"  # fill byte directly before FF Dn
            out.append(ri[i])
            i += 1
        got_ri = decode_jpeg(bytes(out))
        assert (got_ri == want_ri).all()

    def test_decode_unavailable_names_pil_failure_when_present(self):
        from moz_datapipeline_spark.operators.multimodal import (
            DecodeUnavailable,
            _decode_pixels,
        )

        try:
            import PIL  # noqa: F401

            has_pil = True
        except ImportError:
            has_pil = False
        with pytest.raises(DecodeUnavailable) as ei:
            _decode_pixels(b"GIF89a but truncated garbage")
        msg = str(ei.value)
        assert ("PIL tried and failed" in msg) == has_pil

    def test_video_features_mixed_shapes_raise(self):
        from moz_datapipeline_spark.sources.avi import AviError

        with pytest.raises(AviError):
            video_features(
                [np.zeros((4, 4, 3)), np.zeros((8, 4, 3))]
            )
