"""Pure-Python AVI (RIFF) container codec for MJPEG video columns.

Implements the subset of the public AVI 1.0 container spec (Microsoft
"AVI RIFF File Reference"; RIFF itself is the 1991 IBM/Microsoft
Multimedia Programming Interface spec) needed to treat video as a
first-class binary column: walk the RIFF chunk tree, read the main AVI
header for timing/dimensions, and yield the per-frame compressed
payloads from the ``movi`` list.  Frames are Motion-JPEG — each ``00dc``
chunk is a standalone JPEG image — so the existing dependency-free
baseline/progressive JPEG decoder (``sources.jpeg``) turns them into
pixels with no codec library.

An encoder (``encode_avi_mjpeg``) exists so tests and fixtures can
round-trip real containers; like the PNG/WAV/JPEG twins in
``sources.media`` / ``sources.jpeg`` it is test infrastructure, not a
production sink.

Scope boundaries are loud: non-RIFF payloads, OpenDML ``AVIX`` extension
segments, and non-MJPEG streams raise ``AviUnsupported`` (front of the
same ``DecodeUnavailable`` contract the image path uses) rather than
returning garbage.

Reference parity: the reference pipeline has no video path at all
(media handling stops at raster imagery, scripts/imgstats); this module
is part of the training-data extension surface (multimodal columns).
"""
from __future__ import annotations

import struct
from typing import Iterator

import numpy as np


class AviError(ValueError):
    """Payload claims to be AVI but violates the container spec."""


class AviUnsupported(NotImplementedError):
    """Valid RIFF/AVI, but a feature outside the implemented subset."""


def _chunks(data: bytes, pos: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """Yield ``(fourcc, payload_start, payload_size)`` for each chunk in
    ``data[pos:end]``; chunk payloads are word-aligned per RIFF."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise AviError(
                f"chunk {fourcc!r} at {pos} overruns its parent "
                f"({body + size} > {end})"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)  # odd sizes carry a pad byte


def decode_avi(payload: bytes) -> tuple[list[bytes], dict]:
    """Parse an AVI container; return ``(frames, meta)``.

    ``frames`` is the ordered list of compressed video-frame payloads
    (``00dc``/``00db`` chunks of stream 0).  ``meta`` carries
    ``usec_per_frame``, ``width``, ``height``, ``n_frames`` (from the
    ``avih`` header) and ``handler`` (the ``strh`` fccHandler, e.g.
    ``'MJPG'``).  The index (``idx1``) is deliberately ignored: the
    ``movi`` list is authoritative and sequential parsing is what a
    splittable reader would do per file anyway.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise AviUnsupported("payload is not a RIFF container")
    if payload[8:12] == b"AVIX":
        raise AviUnsupported("OpenDML AVIX extension segments")
    if payload[8:12] != b"AVI ":
        raise AviUnsupported(f"RIFF form {payload[8:12]!r} is not 'AVI '")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))

    meta: dict = {"handler": None}
    frames: list[bytes] = []
    stream_counter = [0]  # strh order defines stream ids per the spec
    vid_prefix = [None]  # b"00", b"01", ... of the FIRST vids stream

    def walk(pos: int, stop: int, in_movi: bool) -> None:
        for fourcc, body, size in _chunks(payload, pos, stop):
            if fourcc == b"LIST":
                list_type = payload[body : body + 4]
                walk(body + 4, body + size, in_movi or list_type == b"movi")
            elif fourcc == b"avih":
                (
                    meta["usec_per_frame"],
                    _max_bps,
                    _pad,
                    _flags,
                    meta["n_frames"],
                    _initial,
                    meta["n_streams"],
                    _bufsize,
                    meta["width"],
                    meta["height"],
                ) = struct.unpack_from("<10I", payload, body)
            elif fourcc == b"strh":
                fcc_type = payload[body : body + 4]
                if fcc_type == b"vids" and vid_prefix[0] is None:
                    meta["handler"] = payload[body + 4 : body + 8].decode(
                        "ascii", "replace"
                    )
                    # movi chunk ids are '%02d'-encoded stream indices —
                    # the video stream is NOT always stream 0 (an
                    # audio-first AVI declares 'auds' strh first and its
                    # video chunks are '01dc')
                    vid_prefix[0] = b"%02d" % stream_counter[0]
                stream_counter[0] += 1
            elif in_movi and fourcc[2:4] in (b"dc", b"db"):
                if fourcc[:2] == vid_prefix[0]:
                    frames.append(payload[body : body + size])

    walk(12, end, False)
    if "usec_per_frame" not in meta:
        raise AviError("missing avih main header")
    if meta["handler"] not in ("MJPG", "mjpg"):
        raise AviUnsupported(
            f"video stream handler {meta['handler']!r}; only MJPG frames "
            "can be decoded without a codec library"
        )
    meta["n_frames"] = len(frames)  # movi is authoritative over avih
    return frames, meta


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: float = 10.0
) -> bytes:
    """Build a minimal spec-conformant MJPEG AVI from JPEG payloads.

    Layout: RIFF('AVI ') → LIST hdrl(avih, LIST strl(strh, strf)) →
    LIST movi(00dc…) → idx1.  Rate is encoded as rate/scale =
    round(fps*1000)/1000 so fractional rates survive.
    """
    usec = int(round(1_000_000 / fps))

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I",
        usec, 0, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I4H", 0, 0, 0, 1000, int(round(fps * 1000)),
                      0, len(frames), 0, 0xFFFFFFFF, 0, 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H6I", 40, width, height, 1, 24,
        struct.unpack("<I", b"MJPG")[0],
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the 00dc fourcc in movi
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", movi_body)

    idx = b"".join(
        b"00dc" + struct.pack("<3I", 0x10, off, len(f))
        for off, f in zip(offsets, frames)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def frame_at(frames: list[bytes], usec_per_frame: int, ms: int) -> int:
    """Index of the frame covering timestamp ``ms`` (floor sampling)."""
    if usec_per_frame <= 0:
        raise AviError(f"non-positive usec_per_frame {usec_per_frame}")
    idx = (ms * 1000) // usec_per_frame
    return min(int(idx), len(frames) - 1)


def video_features(frames: list[np.ndarray]) -> list[float]:
    """Summary statistics over decoded frames: count, per-channel motion
    (mean |Δ| between consecutive frames), global brightness mean/std.

    Mirrors ``sources.media.image_features``'s role: a deterministic,
    numpy-only feature vector standing in for a real embedding model.
    """
    if not frames:
        return [0.0, 0.0, 0.0, 0.0]
    shapes = {f.shape for f in frames}
    if len(shapes) > 1:
        raise AviError(
            f"frames disagree on shape ({sorted(shapes)}); mid-stream "
            "resolution changes are outside the MJPEG subset"
        )
    stack = np.stack([f.astype("f8") for f in frames])
    motion = (
        float(np.mean(np.abs(np.diff(stack, axis=0)))) if len(frames) > 1 else 0.0
    )
    return [
        float(len(frames)),
        motion,
        float(stack.mean()),
        float(stack.std()),
    ]


def gradient_frame(seed: int, h: int = 16, w: int = 24) -> np.ndarray:
    """Deterministic RGB test pattern: three phase-shifted ramps keyed
    by ``seed``.  Shared by the query fixtures and their driver-side
    oracle twins so both paths synthesize bit-identical payloads."""
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 7 + seed * 31) % 256
    g = (y * 11 + seed * 17) % 256
    b = (x + y + seed) % 256
    return np.stack([r, g, b], axis=-1).astype("u1")


def synthetic_mjpeg(
    seed: int, n_frames: int, fps: float = 5.0, w: int = 24, h: int = 16
) -> bytes:
    """Deterministic MJPEG-AVI payload: ``n_frames`` gradient frames
    (seeded ``seed + i``) baseline-JPEG-encoded at quality 90."""
    from moz_datapipeline_spark.sources.jpeg import encode_jpeg_baseline

    jpegs = [
        encode_jpeg_baseline(gradient_frame(seed + i, h, w), quality=90)
        for i in range(n_frames)
    ]
    return encode_avi_mjpeg(jpegs, w, h, fps=fps)
