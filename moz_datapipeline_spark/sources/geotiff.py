"""Dependency-free GeoTIFF window reading: classic TIFF container,
strip or tile layout, uncompressed or deflate, horizontal predictor —
pure stdlib ``struct``/``zlib`` + numpy.

De-gates S11 (the reference's flood zonal stats,
scripts/imgstats/img-stats.py:60-105) in environments without
rasterio/GDAL.  The TIFF 6.0 container and the GeoTIFF georeferencing
tags (ModelPixelScale 33550, ModelTiepoint 33922, GeoKeyDirectory
34735) are public specifications; only the subset the flood rasters
need is implemented, and anything else raises loudly rather than
misreading pixels.

Window reads decompress only the strips/tiles intersecting the
requested pixel rectangle — the executor-side cost per way geometry is
proportional to its bbox, not the raster.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d"}

_DTYPES = {
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}


class GeoTIFF:
    """Single-band classic GeoTIFF opened from bytes.

    Exposes ``width``, ``height``, ``dtype``, the affine geotransform
    pieces (``x0, y0`` = outer corner of pixel (0, 0); ``sx, sy`` =
    positive pixel sizes, y decreasing with row), and
    ``read_window(row0, row1, col0, col1)`` (half-open pixel ranges).
    """

    def __init__(self, data: bytes):
        self._data = data
        if data[:2] == b"II":
            self._e = "<"
        elif data[:2] == b"MM":
            self._e = ">"
        else:
            raise ValueError("not a TIFF: bad byte-order mark")
        (magic,) = struct.unpack_from(self._e + "H", data, 2)
        if magic != 42:
            raise NotImplementedError(f"unsupported TIFF magic {magic}")
        (ifd_off,) = struct.unpack_from(self._e + "I", data, 4)
        self._tags = self._read_ifd(ifd_off)
        t = self._tags
        self.width = int(t[256][0])
        self.height = int(t[257][0])
        bits = int(t.get(258, [8])[0])
        fmt = int(t.get(339, [1])[0])
        spp = int(t.get(277, [1])[0])
        if spp != 1:
            raise NotImplementedError(f"{spp} samples/pixel; single band only")
        self.compression = int(t.get(259, [1])[0])
        if self.compression not in (1, 8, 32946):
            raise NotImplementedError(
                f"compression {self.compression}; only none/deflate"
            )
        self.predictor = int(t.get(317, [1])[0])
        if self.predictor not in (1, 2):
            raise NotImplementedError(f"predictor {self.predictor}")
        key = (fmt, bits)
        if key not in _DTYPES:
            raise NotImplementedError(f"sample format/bits {key}")
        self.dtype = np.dtype(self._e + _DTYPES[key])
        # georeferencing: raster-space (0,0) tiepoint + pixel scale
        scale = t.get(33550)
        tie = t.get(33922)
        if scale is None or tie is None:
            raise NotImplementedError(
                "need ModelPixelScale + ModelTiepoint (ModelTransformation "
                "unsupported)"
            )
        self.sx, self.sy = float(scale[0]), float(scale[1])
        i, j, _k, x, y = (float(v) for v in tie[:5])
        self.x0 = x - i * self.sx
        self.y0 = y + j * self.sy
        self._check_geographic()

    def _check_geographic(self):
        """GeoKeyDirectory: accept geographic WGS84 (or absent = assume
        it); refuse projected CRS — reprojection belongs to the caller."""
        gk = self._tags.get(34735)
        if gk is None:
            return
        keys = {}
        for n in range(int(gk[3])):
            kid, loc, cnt, val = (int(v) for v in gk[4 + 4 * n: 8 + 4 * n])
            if loc == 0:
                keys[kid] = val
        model = keys.get(1024, 2)
        if model == 1:  # projected
            epsg = keys.get(3072, 0)
            raise NotImplementedError(
                f"projected GeoTIFF (EPSG:{epsg}); reproject to 4326 first"
            )
        geog = keys.get(2048)
        if geog is not None and geog not in (4326, 4030, 32767):
            raise NotImplementedError(f"geographic CRS {geog}; expected 4326")

    def _read_ifd(self, off: int) -> dict[int, np.ndarray]:
        e, data = self._e, self._data
        (n,) = struct.unpack_from(e + "H", data, off)
        tags: dict[int, np.ndarray] = {}
        for i in range(n):
            base = off + 2 + 12 * i
            tag, typ, cnt = struct.unpack_from(e + "HHI", data, base)
            size = _TYPE_SIZE.get(typ, 1) * cnt
            voff = base + 8 if size <= 4 else struct.unpack_from(
                e + "I", data, base + 8
            )[0]
            if typ in _TYPE_FMT:
                tags[tag] = np.frombuffer(
                    data, dtype=e + _TYPE_FMT[typ], count=cnt, offset=voff
                )
            elif typ == 5:  # RATIONAL
                raw = np.frombuffer(
                    data, dtype=e + "I", count=2 * cnt, offset=voff
                ).astype("f8")
                tags[tag] = raw[0::2] / raw[1::2]
        return tags

    # -- pixel access -----------------------------------------------------

    def _decode(self, off: int, nbytes: int, rows: int, cols: int) -> np.ndarray:
        raw = self._data[off: off + nbytes]
        if self.compression in (8, 32946):
            raw = zlib.decompress(raw)
        arr = np.frombuffer(raw, dtype=self.dtype, count=rows * cols).reshape(
            rows, cols
        )
        if self.predictor == 2:
            arr = np.cumsum(arr, axis=1, dtype=arr.dtype)
        return arr

    def read_window(
        self, row0: int, row1: int, col0: int, col1: int
    ) -> np.ndarray:
        """Pixels [row0:row1, col0:col1] (clamped); only intersecting
        strips/tiles are decompressed."""
        row0, row1 = max(0, row0), min(self.height, row1)
        col0, col1 = max(0, col0), min(self.width, col1)
        if row1 <= row0 or col1 <= col0:
            return np.empty((0, 0), dtype=self.dtype)
        t = self._tags
        out = np.zeros((row1 - row0, col1 - col0), dtype=self.dtype)
        if 322 in t:  # tiled
            tw, th = int(t[322][0]), int(t[323][0])
            offs, cnts = t[324], t[325]
            tiles_across = (self.width + tw - 1) // tw
            for trow in range(row0 // th, (row1 - 1) // th + 1):
                for tcol in range(col0 // tw, (col1 - 1) // tw + 1):
                    idx = trow * tiles_across + tcol
                    tile = self._decode(int(offs[idx]), int(cnts[idx]), th, tw)
                    r_lo = max(row0, trow * th)
                    r_hi = min(row1, trow * th + th)
                    c_lo = max(col0, tcol * tw)
                    c_hi = min(col1, tcol * tw + tw)
                    out[r_lo - row0: r_hi - row0, c_lo - col0: c_hi - col0] = (
                        tile[
                            r_lo - trow * th: r_hi - trow * th,
                            c_lo - tcol * tw: c_hi - tcol * tw,
                        ]
                    )
        else:  # stripped
            rps = int(t.get(278, [self.height])[0])
            offs, cnts = t[273], t[279]
            for s in range(row0 // rps, (row1 - 1) // rps + 1):
                s_rows = min(rps, self.height - s * rps)
                strip = self._decode(
                    int(offs[s]), int(cnts[s]), s_rows, self.width
                )
                r_lo = max(row0, s * rps)
                r_hi = min(row1, s * rps + s_rows)
                out[r_lo - row0: r_hi - row0, :] = strip[
                    r_lo - s * rps: r_hi - s * rps, col0:col1
                ]
        return out

    # -- geometry helpers -------------------------------------------------

    def world_to_pixel(self, x: float, y: float) -> tuple[float, float]:
        """World coords → fractional (row, col)."""
        return (self.y0 - y) / self.sy, (x - self.x0) / self.sx

    def window_for_bbox(
        self, minx: float, miny: float, maxx: float, maxy: float
    ) -> tuple[int, int, int, int]:
        r0, c0 = self.world_to_pixel(minx, maxy)
        r1, c1 = self.world_to_pixel(maxx, miny)
        return (
            int(np.floor(r0)), int(np.ceil(r1)),
            int(np.floor(c0)), int(np.ceil(c1)),
        )


# ---------------------------------------------------------------------------
# geometry rasterization (rasterio.features.geometry_mask parity for the
# shapes the pipeline feeds it: polygon center-containment, line traversal)
# ---------------------------------------------------------------------------


def geometry_mask_pure(
    geom: dict, row0: int, col0: int, shape: tuple[int, int],
    x0: float, y0: float, sx: float, sy: float,
) -> np.ndarray:
    """True where the pixel belongs to ``geom``, for a window whose
    top-left pixel is (row0, col0) of the full raster.

    Polygons: even-odd test of pixel CENTERS (GDAL's default
    all_touched=False).  Lines: every cell the segment passes through
    (grid traversal).  Points: the containing cell.
    """
    rows, cols = shape
    gtype = geom["type"]
    if gtype in ("Polygon", "MultiPolygon"):
        polys = (
            geom["coordinates"]
            if gtype == "MultiPolygon"
            else [geom["coordinates"]]
        )
        cx = x0 + (np.arange(cols) + col0 + 0.5) * sx
        cy = y0 - (np.arange(rows) + row0 + 0.5) * sy
        gx, gy = np.meshgrid(cx, cy)
        inside = np.zeros(shape, dtype=bool)
        for rings in polys:
            poly_in = np.zeros(shape, dtype=bool)
            for ring in rings:
                arr = np.asarray(ring, dtype="f8")
                xs, ys = arr[:-1, 0], arr[:-1, 1]
                xe, ye = arr[1:, 0], arr[1:, 1]
                for x1, y1, x2, y2 in zip(xs, ys, xe, ye):
                    if y1 == y2:
                        continue
                    crosses = (gy >= min(y1, y2)) & (gy < max(y1, y2))
                    xint = x1 + (gy - y1) / (y2 - y1) * (x2 - x1)
                    poly_in ^= crosses & (gx < xint)
            inside |= poly_in
        return inside
    if gtype in ("LineString", "MultiLineString"):
        lines = (
            geom["coordinates"]
            if gtype == "MultiLineString"
            else [geom["coordinates"]]
        )
        mask = np.zeros(shape, dtype=bool)
        for line in lines:
            pts = np.asarray(line, dtype="f8")
            # supercover traversal: sample each segment densely relative
            # to the pixel size (bounded by segment length in pixels)
            for (x1, y1), (x2, y2) in zip(pts[:-1], pts[1:]):
                n = int(
                    max(abs(x2 - x1) / sx, abs(y2 - y1) / sy) * 2
                ) + 2
                ts = np.linspace(0.0, 1.0, n)
                px = x1 + ts * (x2 - x1)
                py = y1 + ts * (y2 - y1)
                rr = np.floor((y0 - py) / sy).astype(int) - row0
                cc = np.floor((px - x0) / sx).astype(int) - col0
                ok = (rr >= 0) & (rr < rows) & (cc >= 0) & (cc < cols)
                mask[rr[ok], cc[ok]] = True
        return mask
    if gtype == "Point":
        x, y = geom["coordinates"]
        rr = int(np.floor((y0 - y) / sy)) - row0
        cc = int(np.floor((x - x0) / sx)) - col0
        mask = np.zeros(shape, dtype=bool)
        if 0 <= rr < rows and 0 <= cc < cols:
            mask[rr, cc] = True
        return mask
    raise NotImplementedError(f"geometry type {gtype}")


def _geom_bounds(geom: dict) -> tuple[float, float, float, float]:
    def walk(c):
        if isinstance(c[0], (int, float)):
            yield c
        else:
            for sub in c:
                yield from walk(sub)

    pts = np.asarray(list(walk(geom["coordinates"])), dtype="f8")
    return (
        float(pts[:, 0].min()), float(pts[:, 1].min()),
        float(pts[:, 0].max()), float(pts[:, 1].max()),
    )


def zonal_values(tif: GeoTIFF, geom: dict) -> np.ndarray:
    """All pixel values under ``geom`` — window-read + mask, float64.

    Mirrors img-stats.py:96-98 (geometry_window → read → geometry_mask)
    with the pure reader.
    """
    minx, miny, maxx, maxy = _geom_bounds(geom)
    r0, r1, c0, c1 = tif.window_for_bbox(minx, miny, maxx, maxy)
    arr = tif.read_window(r0, r1, c0, c1)
    if arr.size == 0:
        return np.array([], dtype="f8")
    r0c, c0c = max(0, r0), max(0, c0)
    mask = geometry_mask_pure(
        geom, r0c, c0c, arr.shape, tif.x0, tif.y0, tif.sx, tif.sy
    )
    return arr.astype("f8")[mask]
