"""Pure stdlib+numpy JPEG codec: huffman-coded DCT per ITU-T T.81.

Decoder: baseline sequential (SOF0), extended sequential (SOF1) and
progressive (SOF2) frames — huffman entropy coding, restart markers,
integral chroma subsampling (4:4:4 / 4:2:2 / 4:2:0), grayscale and
JFIF YCbCr color.  Arithmetic coding (T.81 Annex G), hierarchical and
lossless frames raise ``JpegUnsupported`` loudly — they front the same
capability-boundary contract as the PNG decoder's Adam7 path.

Encoder: baseline only (gray or color, optional 4:2:0), with the
public Annex K quantization/huffman tables — enough to round-trip the
decoder in tests without any image library, and to serve as the
multimodal sink twin of ``decode_jpeg``.

Everything here implements the PUBLIC spec (ITU-T T.81 / ISO 10918-1,
JFIF 1.02); the progressive AC-refinement control flow follows the
algorithm published in the spec's successive-approximation annex.
Reference parity: the reference repo ships a progressive JPEG test
fixture (tests/fixtures/roadnetwork-diagram.jpg) that this decoder
decodes end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    """Malformed JPEG stream."""


class JpegUnsupported(NotImplementedError):
    """Valid JPEG using a coding process this decoder does not cover."""


#: zigzag scan order: index k in the scan -> natural (row-major) position
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis C; block = C.T @ coef @ C."""
    c = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return c


_C = _dct_basis()


# ---------------------------------------------------------------------------
# bit I/O over entropy-coded segments (0xFF00 stuffing, marker detection)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _next_byte(self) -> int | None:
        if self.marker is not None:
            return None
        if self.p >= len(self.d):
            self.marker = 0xD9
            return None
        b = self.d[self.p]
        while b == 0xFF:
            nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else 0xD9
            if nxt == 0x00:
                self.p += 2
                return 0xFF
            if nxt == 0xFF:  # T.81 B.1.1.2: fill byte before a marker
                self.p += 1
                continue
            self.marker = nxt  # leave p at the (last) 0xFF
            return None
        self.p += 1
        return b

    def bit(self) -> int:
        if self.n == 0:
            b = self._next_byte()
            if b is None:
                return 0  # T.81: pad past the marker with defined bits
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, c: int) -> int:
        v = 0
        for _ in range(c):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker and byte-align."""
        # drain to the marker if the decoder hasn't hit it yet
        while self.marker is None:
            self._next_byte()
        if not (0xD0 <= self.marker <= 0xD7):
            raise JpegError(f"expected RST marker, found {self.marker:#x}")
        self.p += 2  # consume FF Dn
        self.marker = None
        self.acc = 0
        self.n = 0


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int) -> None:
        for i in reversed(range(nbits)):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)


# ---------------------------------------------------------------------------
# huffman tables
# ---------------------------------------------------------------------------


class _Huffman:
    """Canonical huffman table from the DHT (BITS, HUFFVAL) spec form."""

    def __init__(self, bits: list[int], vals: list[int]):
        if sum(bits) != len(vals):
            raise JpegError("DHT counts do not match value list")
        self.lut: dict[tuple[int, int], int] = {}
        self.enc: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                self.enc[vals[k]] = (code, ln)
                k += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            v = self.lut.get((ln, code))
            if v is not None:
                return v
        raise JpegError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s-bit magnitude to a signed value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Component:
    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.dc_tbl = 0
        self.ac_tbl = 0
        self.blocks_w = 0  # true block dims (non-interleaved scans)
        self.blocks_h = 0
        self.coefs: np.ndarray | None = None  # (pad_h, pad_w, 64) int32


class _Frame:
    def __init__(self, seg: bytes, progressive: bool):
        precision, h, w, n = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
        if precision != 8:
            raise JpegUnsupported(f"{precision}-bit precision")
        if h == 0:
            raise JpegUnsupported("DNL-deferred height")
        self.h, self.w = h, w
        self.progressive = progressive
        self.comps: list[_Component] = []
        for i in range(n):
            cid, samp, tq = seg[6 + 3 * i: 9 + 3 * i]
            self.comps.append(_Component(cid, samp >> 4, samp & 15, tq))
        self.hmax = max(c.h for c in self.comps)
        self.vmax = max(c.v for c in self.comps)
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        for c in self.comps:
            c.blocks_w = -(-(w * c.h) // (self.hmax * 8))
            c.blocks_h = -(-(h * c.v) // (self.vmax * 8))
            c.coefs = np.zeros(
                (self.mcus_y * c.v, self.mcus_x * c.h, 64), dtype=np.int32
            )


def _decode_baseline_block(br, block, dc, ac, pred):
    t = dc.decode(br)
    pred += _extend(br.bits(t), t)
    block[0] = pred
    k = 1
    while k <= 63:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past end of block")
        block[ZIGZAG[k]] = _extend(br.bits(s), s)
        k += 1
    return pred


def _decode_scan(frame: _Frame, seg: bytes, data: bytes, pos: int,
                 hdc: dict, hac: dict, ri: int) -> int:
    """Decode one entropy-coded scan; returns the stream position of the
    terminating marker's 0xFF byte."""
    ns = seg[0]
    scomps: list[_Component] = []
    for i in range(ns):
        cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
        comp = next((c for c in frame.comps if c.cid == cs), None)
        if comp is None:
            raise JpegError(f"scan references unknown component {cs}")
        comp.dc_tbl, comp.ac_tbl = tables >> 4, tables & 15
        scomps.append(comp)
    ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = a >> 4, a & 15
    if not frame.progressive:
        ss, se, ah, al = 0, 63, 0, 0
    br = _BitReader(data, pos)
    preds = {c.cid: 0 for c in scomps}
    state = {"eobrun": 0}

    def check_restart(unit_idx: int) -> None:
        if ri and unit_idx and unit_idx % ri == 0:
            br.restart()
            for cid in preds:
                preds[cid] = 0
            state["eobrun"] = 0

    def decode_block(comp: _Component, by: int, bx: int) -> None:
        block = comp.coefs[by, bx]
        if not frame.progressive:
            preds[comp.cid] = _decode_baseline_block(
                br, block, hdc[comp.dc_tbl], hac[comp.ac_tbl], preds[comp.cid]
            )
        elif ss == 0 and ah == 0:  # DC first
            t = hdc[comp.dc_tbl].decode(br)
            preds[comp.cid] += _extend(br.bits(t), t)
            block[0] = preds[comp.cid] << al
        elif ss == 0:  # DC refine
            if br.bit():
                block[0] = int(block[0]) | (1 << al)
        elif ah == 0:  # AC first
            _ac_first(br, block, hac[comp.ac_tbl], ss, se, al, state)
        else:  # AC refine
            _ac_refine(br, block, hac[comp.ac_tbl], ss, se, al, state)

    if ns > 1:
        if frame.progressive and ss != 0:
            raise JpegError("progressive AC scan must be non-interleaved")
        for mcu in range(frame.mcus_x * frame.mcus_y):
            check_restart(mcu)
            my, mx = divmod(mcu, frame.mcus_x)
            for comp in scomps:
                for v in range(comp.v):
                    for hh in range(comp.h):
                        decode_block(comp, my * comp.v + v, mx * comp.h + hh)
    else:
        comp = scomps[0]
        for i in range(comp.blocks_w * comp.blocks_h):
            check_restart(i)
            by, bx = divmod(i, comp.blocks_w)
            decode_block(comp, by, bx)
    # align to the terminating marker (RST consumed by the NEXT scan's
    # reader never appears here: each scan ends on a non-RST marker)
    while br.marker is None:
        br._next_byte()
    return br.p


def _ac_first(br, block, ac, ss, se, al, state) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = ac.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.bits(r)
                break
            k += 16
            continue
        k += r
        if k > se:
            raise JpegError("AC run past spectral band")
        block[ZIGZAG[k]] = _extend(br.bits(s), s) << al
        k += 1


def _ac_refine(br, block, ac, ss, se, al, state) -> None:
    """Successive-approximation AC refinement (T.81 G.1.2.3 control
    flow, as implemented by every huffman progressive decoder)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = ac.decode(br)
            r, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.bits(r)
                    break
                # r == 15: skip over 16 zero-history coefficients
            else:
                val = p1 if br.bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if block[z] != 0:
                    if br.bit() and (block[z] & p1) == 0:
                        block[z] += p1 if block[z] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                block[ZIGZAG[k]] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = ZIGZAG[k]
            if block[z] != 0 and br.bit() and (block[z] & p1) == 0:
                block[z] += p1 if block[z] >= 0 else m1
            k += 1
        state["eobrun"] -= 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes → (height, width, channels) uint8 array (channels 3
    for color, 1 for grayscale)."""
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, _Huffman] = {}
    hac: dict[int, _Huffman] = {}
    ri = 0
    frame: _Frame | None = None
    p = 2
    n = len(payload)
    while p < n:
        if payload[p] != 0xFF:
            raise JpegError(f"marker expected at offset {p}")
        m = payload[p + 1]
        if m == 0xFF:  # T.81 B.1.1.2: fill byte preceding a marker
            p += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD8:  # TEM / RSTn / stray SOI
            p += 2
            continue
        ln = struct.unpack(">H", payload[p + 2: p + 4])[0]
        seg = payload[p + 4: p + 2 + ln]
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i: i + 128], dtype=">u2")
                    i += 128
                else:
                    vals = np.frombuffer(seg[i: i + 64], dtype="u1")
                    i += 64
                qt[tq] = vals.astype(np.int32)
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1: i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17: i + 17 + cnt])
                (hdc if tc == 0 else hac)[th] = _Huffman(bits, vals)
                i += 17 + cnt
        elif m == 0xDD:  # DRI
            ri = struct.unpack(">H", seg[:2])[0]
        elif m in (0xC0, 0xC1):
            frame = _Frame(seg, progressive=False)
        elif m == 0xC2:
            frame = _Frame(seg, progressive=True)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegUnsupported(
                f"SOF{m - 0xC0}: lossless/hierarchical/arithmetic coding"
            )
        elif m == 0xDA:  # SOS + entropy-coded data
            if frame is None:
                raise JpegError("SOS before SOF")
            p = _decode_scan(frame, seg, payload, p + 2 + ln, hdc, hac, ri)
            continue
        # APPn / COM / others: skip
        p += 2 + ln
    if frame is None:
        raise JpegError("no frame in stream")
    return _reconstruct(frame, qt)


def _reconstruct(frame: _Frame, qt: dict[int, np.ndarray]) -> np.ndarray:
    planes = []
    for comp in frame.comps:
        if comp.tq not in qt:
            raise JpegError(f"missing quantization table {comp.tq}")
        q_nat = np.zeros(64, dtype=np.int32)
        q_nat[ZIGZAG] = qt[comp.tq]  # DQT stores zigzag order
        coefs = comp.coefs.astype(np.float64) * q_nat
        by, bx = coefs.shape[:2]
        blocks = coefs.reshape(by, bx, 8, 8)
        # inverse DCT per block: C.T @ B @ C, vectorized over all blocks
        pix = np.einsum("iu,yxuv,vj->yxij", _C.T, blocks, _C, optimize=True)
        pix = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        comp_h = -(-frame.h * comp.v // frame.vmax)
        comp_w = -(-frame.w * comp.h // frame.hmax)
        pix = pix[:comp_h, :comp_w]
        fy, fx = frame.vmax // comp.v, frame.hmax // comp.h
        if frame.vmax % comp.v or frame.hmax % comp.h:
            raise JpegUnsupported("non-integral sampling ratio")
        if fy > 1:
            pix = np.repeat(pix, fy, axis=0)
        if fx > 1:
            pix = np.repeat(pix, fx, axis=1)
        planes.append(pix[: frame.h, : frame.w])
    if len(planes) == 1:
        out = planes[0][..., None]
    elif len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=-1)
    else:
        raise JpegUnsupported(f"{len(planes)}-component color (CMYK?)")
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# baseline encoder (Annex K tables) — the round-trip twin for tests
# ---------------------------------------------------------------------------

_Q_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _scaled_quant(base: list[int], quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (np.array(base, dtype=np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc: _Huffman, ac: _Huffman) -> int:
    diff = int(zz[0]) - pred
    s = _cat(diff)
    code, ln = dc.enc[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.enc[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _cat(v)
        code, ln = ac.enc[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac.enc[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _forward_blocks(plane: np.ndarray, q_nat: np.ndarray) -> np.ndarray:
    """(H, W) float plane → (by, bx, 64) quantized coefs, zigzag order."""
    h, w = plane.shape
    by, bx = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coefs = np.einsum("iu,yxuv,jv->yxij", _C, blocks, _C, optimize=True)
    quant = np.rint(coefs.reshape(by, bx, 64) / q_nat).astype(np.int32)
    return quant[..., ZIGZAG]


def encode_jpeg_baseline(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 image (H, W), (H, W, 1) or (H, W, 3) → baseline JFIF bytes.

    Color uses 4:4:4 by default; ``subsample=True`` writes 4:2:0 with
    2×2 box-averaged chroma.  Annex K quantization tables scaled by the
    usual quality formula; Annex K huffman tables.
    ``restart_interval=N`` writes a DRI segment and an RSTn marker every
    N MCUs (exercises the decoder's resync path).
    """
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    f = img.astype(np.float64)
    if ch == 3:
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
        cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
        planes = [y, cb, cr]
    elif ch == 1:
        planes = [f[..., 0]]
    else:
        raise ValueError(f"unsupported channel count {ch}")

    ql = _scaled_quant(_Q_LUMA, quality)
    qc = _scaled_quant(_Q_CHROMA, quality)
    # _forward_blocks divides NATURAL-order coefs, so pass natural tables
    ql_nat = np.zeros(64)
    ql_nat[ZIGZAG] = ql
    qc_nat = np.zeros(64)
    qc_nat[ZIGZAG] = qc
    dcl, acl = _Huffman(_DC_L_BITS, _DC_L_VALS), _Huffman(_AC_L_BITS, _AC_L_VALS)
    dcc, acc = _Huffman(_DC_C_BITS, _DC_C_VALS), _Huffman(_AC_C_BITS, _AC_C_VALS)

    color = len(planes) == 3
    sub = 2 if (color and subsample) else 1
    if color and sub == 2:
        ph = -(-h // 16) * 16
        pw = -(-w // 16) * 16
        planes = [
            np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
        ]
        chroma = [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            for p in planes[1:]
        ]
        comp_blocks = [_forward_blocks(planes[0], ql_nat)]
        comp_blocks += [_forward_blocks(c, qc_nat) for c in chroma]
    else:
        comp_blocks = [_forward_blocks(planes[0], ql_nat)]
        comp_blocks += [_forward_blocks(p, qc_nat) for p in planes[1:]]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, tbl: np.ndarray) -> bytes:
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(int(x) for x in tbl)

    out += dqt(0, ql)
    if color:
        out += dqt(1, qc)

    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for i in range(len(planes)):
        samp = (sub << 4) | sub if i == 0 and sub == 2 else 0x11
        sof += bytes([i + 1, samp, 0 if i == 0 else (1 if color else 0)])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _DC_L_BITS, _DC_L_VALS) + dht(1, 0, _AC_L_BITS, _AC_L_VALS)
    if color:
        out += dht(0, 1, _DC_C_BITS, _DC_C_VALS) + dht(1, 1, _AC_C_BITS, _AC_C_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([len(planes)])
    for i in range(len(planes)):
        t = 0 if i == 0 else (0x11 if color else 0)
        sos += bytes([i + 1, t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * len(planes)
    tbls = [(dcl, acl)] + [(dcc, acc)] * (len(planes) - 1)
    y_blocks = comp_blocks[0]
    rst_state = {"mcu": 0, "next": 0}

    def maybe_restart() -> None:
        i = rst_state["mcu"]
        if restart_interval and i and i % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst_state["next"]])
            rst_state["next"] = (rst_state["next"] + 1) % 8
            for j in range(len(preds)):
                preds[j] = 0
        rst_state["mcu"] = i + 1

    if color and sub == 2:
        mby, mbx = y_blocks.shape[0] // 2, y_blocks.shape[1] // 2
        for my in range(mby):
            for mx in range(mbx):
                maybe_restart()
                for v in range(2):
                    for hh in range(2):
                        preds[0] = _encode_block(
                            bw, y_blocks[my * 2 + v, mx * 2 + hh],
                            preds[0], dcl, acl,
                        )
                for ci in (1, 2):
                    preds[ci] = _encode_block(
                        bw, comp_blocks[ci][my, mx], preds[ci], dcc, acc
                    )
    else:
        by, bx = y_blocks.shape[:2]
        for yy in range(by):
            for xx in range(bx):
                maybe_restart()
                for ci, blocks in enumerate(comp_blocks):
                    dc_t, ac_t = tbls[ci]
                    preds[ci] = _encode_block(
                        bw, blocks[yy, xx], preds[ci], dc_t, ac_t
                    )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
