"""S11 pure GeoTIFF reader, un-gated: files are written by an
independent struct-based writer in this test (not the library under
test), then read back through ``sources.geotiff`` and the full
``zonal_flood_stats`` real-backend path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from moz_datapipeline_spark.sources.geotiff import (
    GeoTIFF,
    geometry_mask_pure,
    zonal_values,
)

_FMT_BITS = {"u2": (1, 16), "i4": (2, 32), "f4": (3, 32), "f8": (3, 64)}


def _write_tiff(
    path, arr, *, tile=None, compression=1, predictor=1,
    scale=(1.0, 1.0), origin=(0.0, 10.0), geokeys=None,
):
    """Minimal classic little-endian GeoTIFF writer (independent of the
    reader): strips (one whole-image strip) or square tiles, optional
    deflate + horizontal predictor, PixelScale/Tiepoint georeferencing."""
    h, w = arr.shape
    fmt, bits = _FMT_BITS[arr.dtype.str[1:]]

    def encode(chunk):
        if predictor == 2:
            chunk = np.concatenate(
                [chunk[:, :1], np.diff(chunk, axis=1)], axis=1
            ).astype(chunk.dtype)
        raw = chunk.astype("<" + arr.dtype.str[1:]).tobytes()
        return zlib.compress(raw) if compression in (8, 32946) else raw

    chunks, chunk_tags = [], []
    if tile is None:
        chunks = [encode(arr)]
    else:
        th = tw = tile
        for trow in range(0, h, th):
            for tcol in range(0, w, tw):
                block = np.zeros((th, tw), dtype=arr.dtype)
                sub = arr[trow: trow + th, tcol: tcol + tw]
                block[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(encode(block))

    out = bytearray(struct.pack("<2sHI", b"II", 42, 0))
    chunk_offs = []
    for c in chunks:
        chunk_offs.append(len(out))
        out += c

    extra: list[tuple[int, int, list]] = []  # (tag, type, values)
    sx, sy = scale
    ox, oy = origin
    extra.append((33550, 12, [sx, sy, 0.0]))
    extra.append((33922, 12, [0.0, 0.0, 0.0, ox, oy, 0.0]))
    if geokeys is not None:
        gk = [1, 1, 0, len(geokeys)]
        for k in geokeys:
            gk.extend(k)
        extra.append((34735, 3, gk))

    entries = {
        256: (3, [w]), 257: (3, [h]), 258: (3, [bits]),
        259: (3, [compression]), 262: (3, [1]), 277: (3, [1]),
        339: (3, [fmt]),
    }
    if predictor == 2:
        entries[317] = (3, [2])
    if tile is None:
        entries[273] = (4, chunk_offs)
        entries[278] = (3, [h])
        entries[279] = (4, [len(c) for c in chunks])
    else:
        entries[322] = (3, [tile])
        entries[323] = (3, [tile])
        entries[324] = (4, chunk_offs)
        entries[325] = (4, [len(c) for c in chunks])
    for tag, typ, vals in extra:
        entries[tag] = (typ, vals)

    sizes = {3: ("H", 2), 4: ("I", 4), 12: ("d", 8)}
    # out-of-line values
    val_bytes = {}
    for tag, (typ, vals) in entries.items():
        code, size = sizes[typ]
        payload = struct.pack(f"<{len(vals)}{code}", *vals)
        if len(payload) > 4:
            val_bytes[tag] = len(out)
            out += payload
    ifd_off = len(out)
    out += struct.pack("<H", len(entries))
    for tag in sorted(entries):
        typ, vals = entries[tag]
        code, size = sizes[typ]
        payload = struct.pack(f"<{len(vals)}{code}", *vals)
        if len(payload) <= 4:
            out += struct.pack("<HHI", tag, typ, len(vals)) + payload.ljust(
                4, b"\x00"
            )
        else:
            out += struct.pack("<HHII", tag, typ, len(vals), val_bytes[tag])
    out += struct.pack("<I", 0)
    struct.pack_into("<I", out, 4, ifd_off)
    with open(path, "wb") as fh:
        fh.write(bytes(out))


def test_striped_float_window(tmp_path):
    arr = np.arange(100, dtype="f8").reshape(10, 10)
    p = str(tmp_path / "a.tif")
    _write_tiff(p, arr)
    tif = GeoTIFF(open(p, "rb").read())
    assert (tif.width, tif.height) == (10, 10)
    assert (tif.x0, tif.y0, tif.sx, tif.sy) == (0.0, 10.0, 1.0, 1.0)
    np.testing.assert_array_equal(
        tif.read_window(2, 5, 3, 7), arr[2:5, 3:7]
    )
    # clamping
    np.testing.assert_array_equal(
        tif.read_window(-2, 3, 8, 14), arr[0:3, 8:10]
    )


def test_tiled_deflate_predictor_window(tmp_path):
    arr = (np.arange(144, dtype="u2") * 7 % 501).reshape(12, 12)
    p = str(tmp_path / "t.tif")
    _write_tiff(p, arr, tile=16, compression=8, predictor=2)
    tif = GeoTIFF(open(p, "rb").read())
    np.testing.assert_array_equal(tif.read_window(0, 12, 0, 12), arr)
    p2 = str(tmp_path / "t4.tif")
    _write_tiff(p2, arr, tile=4, compression=8, predictor=2)
    tif2 = GeoTIFF(open(p2, "rb").read())
    # window crossing tile boundaries
    np.testing.assert_array_equal(
        tif2.read_window(3, 9, 2, 11), arr[3:9, 2:11]
    )


def test_geokeys_projected_refused(tmp_path):
    arr = np.ones((4, 4), dtype="f4")
    p = str(tmp_path / "proj.tif")
    _write_tiff(
        p, arr, geokeys=[(1024, 0, 1, 1), (3072, 0, 1, 32736)]
    )
    with pytest.raises(NotImplementedError, match="projected"):
        GeoTIFF(open(p, "rb").read())
    p2 = str(tmp_path / "geo.tif")
    _write_tiff(
        p2, arr, geokeys=[(1024, 0, 1, 2), (2048, 0, 1, 4326)]
    )
    GeoTIFF(open(p2, "rb").read())  # accepted


def test_polygon_mask_center_containment():
    # 4x4 window at raster origin, 1-degree pixels from (0, 10)
    geom = {
        "type": "Polygon",
        "coordinates": [[[0, 10], [2, 10], [2, 8], [0, 8], [0, 10]]],
    }
    mask = geometry_mask_pure(geom, 0, 0, (4, 4), 0.0, 10.0, 1.0, 1.0)
    want = np.zeros((4, 4), dtype=bool)
    want[0:2, 0:2] = True
    np.testing.assert_array_equal(mask, want)


def test_linestring_mask_traversal():
    geom = {"type": "LineString", "coordinates": [[0.5, 9.5], [3.5, 6.5]]}
    mask = geometry_mask_pure(geom, 0, 0, (4, 4), 0.0, 10.0, 1.0, 1.0)
    # diagonal from pixel (0,0) to (3,3)
    assert mask[0, 0] and mask[3, 3]
    assert mask.sum() >= 4


def test_zonal_flood_stats_pure_backend_matches_sentinel_rules(
    spark, tmp_path
):
    """The exact scenario of the rasterio-gated test, now runnable here:
    10x10 raster, polygon over the top-left 2x2 block, sentinel rules
    of img-stats.py:99-105."""
    try:
        import rasterio  # noqa: F401

        pytest.skip("rasterio present — exercises the other backend")
    except ImportError:
        pass
    from moz_datapipeline_spark.operators.raster import zonal_flood_stats

    arr = np.tile(np.arange(10.0)[:, None], (1, 10))
    arr[0, 0] = 999.0
    arr[1, 1] = -1.0
    p = str(tmp_path / "p10.tif")
    _write_tiff(p, arr, origin=(0.0, 10.0))
    poly = (
        '{"type": "Polygon", "coordinates":'
        ' [[[0, 10], [2, 10], [2, 8], [0, 8], [0, 10]]]}'
    )
    ways = spark.createDataFrame([("w1", poly)], "NAME string, geometry string")
    out = zonal_flood_stats(
        ways, use_real_backend=True, raster_paths={10: p}
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["count"] == 4
    assert r["min"] == pytest.approx(-1.0)
    assert r["max"] == pytest.approx(1.0)
    assert r["mean"] == pytest.approx(0.0)
    assert r["pct_flooded"] == pytest.approx(4 / 3 * 100.0)


def test_zonal_values_no_overlap(tmp_path):
    arr = np.ones((5, 5), dtype="f8")
    p = str(tmp_path / "z.tif")
    _write_tiff(p, arr)
    tif = GeoTIFF(open(p, "rb").read())
    far = {
        "type": "Polygon",
        "coordinates": [[[50, 50], [51, 50], [51, 51], [50, 51], [50, 50]]],
    }
    assert zonal_values(tif, far).size == 0
