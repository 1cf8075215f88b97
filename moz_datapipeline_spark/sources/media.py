"""Dependency-free media decoding: PNG images and RIFF/WAV audio —
pure stdlib ``struct``/``zlib`` + numpy.

De-gates the multimodal decode path (operators/multimodal.py) for the
two formats whose containers are fully public and simple enough to
parse exactly: PNG (RFC 2083: chunked container, zlib-compressed
filter-prefixed scanlines) and WAV (RIFF chunks, PCM or IEEE-float
samples).  JPEG/video stay behind ``DecodeUnavailable`` — their codecs
genuinely need external libraries.

Both decoders return numpy arrays, so the Arrow-batched feature
kernels stay vectorized after the per-row decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8/uint16 array.

    Supports bit depth 8 and 16, color types 0/2/3/4/6 (palette rows
    expand to RGB), filters 0-4, no interlace (Adam7 raises — the
    training-corpus rasters this path serves are never interlaced).
    """
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype="u1").reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color}")
    if depth not in (8, 16):
        raise NotImplementedError(f"PNG bit depth {depth}")
    ch = _PNG_CHANNELS[color]
    bpp = ch * depth // 8  # filter unit: bytes per pixel
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype="u1")
    prev = np.zeros(stride, dtype="u1")
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype="u1", count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left pixel
            line = _unfilter_serial(ftype, line, prev, bpp)
        else:
            raise ValueError(f"PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    if depth == 16:
        arr = out.reshape(h, w, ch, 2).astype("u2")
        img = (arr[..., 0] << 8) | arr[..., 1]
    else:
        img = out.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        img = palette[img[..., 0]]
    return img


def _unfilter_serial(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Sub/Average/Paeth defiltering — sequential in the left pixel, so
    done per byte-lane with a python loop over pixels (scanlines are
    short; the hot loop is numpy over the lane)."""
    n = len(line)
    out = line.astype("i4")
    pr = prev.astype("i4")
    for i in range(n):
        a = out[i - bpp] if i >= bpp else 0
        b = pr[i]
        c = pr[i - bpp] if i >= bpp else 0
        if ftype == 1:
            out[i] = (out[i] + a) & 0xFF
        elif ftype == 3:
            out[i] = (out[i] + (a + b) // 2) & 0xFF
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (out[i] + pred) & 0xFF
    return out.astype("u1")


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_samples, channels) float64 array in [-1, 1],
    sample_rate).  PCM 8/16/32-bit and IEEE float32/64."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos: pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8: pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _bps, _align, bits = fmt
    if audio_fmt == 0xFFFE and len(data) >= 0:  # WAVE_FORMAT_EXTENSIBLE
        raise NotImplementedError("WAVE_FORMAT_EXTENSIBLE")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:  # unsigned
            x = np.frombuffer(data, dtype="u1").astype("f8")
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype("f8") / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype("f8") / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bits {bits}")
    elif audio_fmt == 3:  # IEEE float
        x = np.frombuffer(data, dtype="<f4" if bits == 32 else "<f8").astype(
            "f8"
        )
    else:
        raise NotImplementedError(f"WAV format {audio_fmt}")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels)
    else:
        x = x.reshape(-1, 1)
    return x, int(rate)


def image_features(img: np.ndarray) -> list[float]:
    """8 deterministic pixel statistics from a decoded image array:
    [width, height, channels, mean, std, min, max, luma_mean] — the
    real-decoder contract of ``extract_image_features``."""
    h, w, ch = img.shape
    f = img.astype("f8")
    if ch >= 3:
        luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    else:
        luma = f[..., 0]
    return [
        float(w), float(h), float(ch),
        float(f.mean()), float(f.std()),
        float(f.min()), float(f.max()),
        float(luma.mean()),
    ]


def audio_features(x: np.ndarray, rate: int) -> list[float]:
    """8 deterministic statistics from decoded audio:
    [sample_rate, channels, n_samples, duration_ms, rms, peak,
    zero_crossing_rate, dc_offset]."""
    n, ch = x.shape
    mono = x.mean(axis=1)
    zc = (
        float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        / max(1, n - 1)
    )
    return [
        float(rate), float(ch), float(n),
        float(n) / rate * 1000.0 if rate else 0.0,
        float(np.sqrt(np.mean(mono**2))) if n else 0.0,
        float(np.abs(x).max()) if n else 0.0,
        zc,
        float(mono.mean()) if n else 0.0,
    ]


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic bilinear resize of an (H, W, C) uint8 image.

    Half-pixel-center sampling (the OpenCV/PIL convention:
    src = (dst + 0.5) * scale - 0.5, clamped to the border), separable
    gather with numpy fancy indexing — no Python pixel loops, so it is
    fast enough to sit inside an Arrow batch kernel.  Rounding is
    floor(x + 0.5) so ties break identically on every platform.
    """
    if img.ndim == 2:
        img = img[..., None]
    h, w, _ = img.shape
    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"non-positive output size {out_w}x{out_h}")
    sx = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    sy = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(sx - x0, 0.0, 1.0)[None, :, None]
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None, None]
    f = img.astype("f8")
    top = f[y0[:, None], x0[None, :]] * (1 - fx) + f[y0[:, None], x1[None, :]] * fx
    bot = f[y1[:, None], x0[None, :]] * (1 - fx) + f[y1[:, None], x1[None, :]] * fx
    out = top * (1 - fy) + bot * fy
    return np.floor(out + 0.5).clip(0, 255).astype("u1")


def encode_wav_pcm16(x: np.ndarray, rate: int) -> bytes:
    """Minimal PCM int16 WAV encoder (the inverse of ``decode_wav``'s
    common case): (n_samples, channels) float in [-1, 1] → RIFF bytes.
    Deterministic — query fixtures and oracle twins synthesize
    identical payloads from it on any host."""
    import struct

    pcm = np.clip(x * 32768.0, -32768, 32767).astype("<i2").tobytes()
    ch = x.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body
