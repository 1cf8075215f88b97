"""S1 shapefile scan, un-gated: the pure stdlib+numpy parser against
hand-built synthetic files (written with independent struct code in
this test, not the library under test) and the reference's real .shp
fixtures, plus the Albers inverse against Snyder's published example."""

from __future__ import annotations

import json
import math
import struct

import numpy as np
import pytest

from moz_datapipeline_spark.sources import shapefile as shp
from moz_datapipeline_spark.sources.readers import read_shapefile

OD_SHP = "/root/reference/source/od-pairs/OD_all_MZ_v1.shp"
AG_SHP = (
    "/root/reference/source/agriculture/spam2005v2r0_production_barl_maiz_"
    "pmil_rice_smil_sorg_whea_ocer_ofib_sugc_MOZ.shp"
)


# ---------------------------------------------------------------------------
# independent writers (deliberately NOT using the library)
# ---------------------------------------------------------------------------


def _write_shp(path, shapes, global_type):
    recs = b""
    for i, (stype, parts) in enumerate(shapes, 1):
        if stype == 0:
            content = struct.pack("<i", 0)
        elif stype == 1:
            content = struct.pack("<i2d", 1, *parts[0][0])
        else:  # 3 polyline / 5 polygon
            pts = np.vstack(parts)
            offs, o = [], 0
            for p in parts:
                offs.append(o)
                o += len(p)
            content = struct.pack(
                "<i4d2i",
                stype,
                pts[:, 0].min(), pts[:, 1].min(),
                pts[:, 0].max(), pts[:, 1].max(),
                len(parts), len(pts),
            )
            content += struct.pack(f"<{len(parts)}i", *offs)
            content += pts.astype("<f8").tobytes()
        recs += struct.pack(">2i", i, len(content) // 2) + content
    header = (
        struct.pack(">6i", 9994, 0, 0, 0, 0, 0)
        + struct.pack(">i", (100 + len(recs)) // 2)
        + struct.pack("<2i", 1000, global_type)
        + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    )
    with open(path, "wb") as fh:
        fh.write(header + recs)


def _write_dbf(path, fields, rows):
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(f[2] for f in fields)
    head = struct.pack("<4B I 2H 20x", 3, 95, 7, 26, len(rows), hdr_size, rec_size)
    for name, ftype, flen, fdec in fields:
        head += (
            name.encode().ljust(11, b"\x00")
            + ftype.encode()
            + b"\x00" * 4
            + bytes([flen, fdec])
            + b"\x00" * 14
        )
    head += b"\x0d"
    body = b""
    for row in rows:
        body += b" "
        for (name, ftype, flen, fdec), v in zip(fields, row):
            s = "" if v is None else str(v)
            body += (s.rjust(flen) if ftype == "N" else s.ljust(flen)).encode(
                "latin-1"
            )[:flen]
    with open(path, "wb") as fh:
        fh.write(head + body + b"\x1a")


def _albers_forward(lon, lat, a, e2, lat1, lat2, lat0, lon0):
    """Snyder 14-1..14-4 forward, written independently of the library's
    inverse so errors cannot cancel."""
    e = math.sqrt(e2)
    d2r = math.pi / 180.0

    def m(phi):
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1 - e2 * s * s)

    def q(phi):
        s = math.sin(phi)
        return (1 - e2) * (
            s / (1 - e2 * s * s)
            - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
        )

    p1, p2, p0 = lat1 * d2r, lat2 * d2r, lat0 * d2r
    n = (m(p1) ** 2 - m(p2) ** 2) / (q(p2) - q(p1))
    C = m(p1) ** 2 + n * q(p1)
    rho0 = a * math.sqrt(C - n * q(p0)) / n
    theta = n * (lon - lon0) * d2r
    rho = a * math.sqrt(C - n * q(lat * d2r)) / n
    return rho * math.sin(theta), rho0 - rho * math.cos(theta)


ALBERS_MOZ_WKT = (
    'PROJCS["Africa_Albers_Equal_Area_Conic",GEOGCS["GCS_WGS_1984",'
    'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Albers"],PARAMETER["False_Easting",0.0],'
    'PARAMETER["False_Northing",0.0],PARAMETER["Central_Meridian",25.0],'
    'PARAMETER["Standard_Parallel_1",20.0],'
    'PARAMETER["Standard_Parallel_2",-23.0],'
    'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]'
)


# ---------------------------------------------------------------------------
# projection math
# ---------------------------------------------------------------------------


def test_albers_inverse_snyder_example():
    """USGS PP 1395 p. 292: Clarke 1866, SPs 29.5/45.5, origin (23, -96);
    (x, y) = (1885472.7, 1535925.0) must invert to (35N, 75W)."""
    inv = shp._albers_inverse(
        6378206.4, 0.00676866,
        lat1=29.5, lat2=45.5, lat0=23.0, lon0=-96.0, fe=0.0, fn=0.0,
    )
    lon, lat = inv(np.array([1885472.7]), np.array([1535925.0]))
    assert abs(lon[0] - (-75.0)) < 1e-4
    assert abs(lat[0] - 35.0) < 1e-4


def test_albers_roundtrip_mozambique_grid():
    """forward (test-local) then inverse (library) over the Mozambique
    extent of the reference's Africa Albers CRS: sub-micrometre error."""
    tr = shp.make_transform(ALBERS_MOZ_WKT)
    lons = np.arange(30.0, 41.0, 1.7)
    lats = np.arange(-26.0, -10.0, 2.3)
    for lon in lons:
        for lat in lats:
            x, y = _albers_forward(
                lon, lat, 6378137.0, 0.0066943799901413165,
                lat1=20.0, lat2=-23.0, lat0=0.0, lon0=25.0,
            )
            rlon, rlat = tr(np.array([x]), np.array([y]))
            assert abs(rlon[0] - lon) < 1e-9
            assert abs(rlat[0] - lat) < 1e-9


def test_geogcs_is_identity():
    tr = shp.make_transform('GEOGCS["GCS_WGS_1984",...]')
    x, y = tr(np.array([33.5]), np.array([-19.0]))
    assert x[0] == 33.5 and y[0] == -19.0


def test_unknown_projection_raises():
    with pytest.raises(NotImplementedError):
        shp.make_transform(
            'PROJCS["x",GEOGCS["g",DATUM["d",SPHEROID["s",6378137.0,'
            '298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.017]],'
            'PROJECTION["Mercator"],UNIT["Meter",1.0]]'
        )


def test_unknown_projection_error_names_family_and_alternatives():
    """The loud failure must tell the user WHAT family was rejected and
    WHICH families (or reprojection route) are available — README
    §'Shapefile CRS support' is the contract."""
    with pytest.raises(NotImplementedError) as exc:
        shp.make_transform(
            'PROJCS["x",GEOGCS["g",DATUM["d",SPHEROID["s",6378137.0,'
            '298.257223563]],PRIMEM["Greenwich",0.0],UNIT["Degree",0.017]],'
            'PROJECTION["Krovak"],UNIT["Meter",1.0]]'
        )
    msg = str(exc.value)
    assert "'krovak'" in msg
    assert "albers" in msg and "transverse_mercator" in msg
    assert "ogr2ogr" in msg
    # the documented list is the single source of truth
    for fam in shp.SUPPORTED_PROJECTIONS:
        assert fam in msg


def _tmerc_forward(lon, lat, a, e2, lat0, lon0, k0, fe=0.0, fn=0.0):
    """Snyder 8-9..8-13 forward TM, written independently of the
    library's inverse so errors cannot cancel."""
    d2r = math.pi / 180.0
    ep2 = e2 / (1 - e2)
    phi = lat * d2r

    def M(p):
        e4, e6 = e2 * e2, e2 ** 3
        return a * (
            (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * p
            - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * p)
            + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * p)
            - (35 * e6 / 3072) * math.sin(6 * p)
        )

    N = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    T = math.tan(phi) ** 2
    C = ep2 * math.cos(phi) ** 2
    A = (lon - lon0) * d2r * math.cos(phi)
    x = k0 * N * (
        A
        + (1 - T + C) * A ** 3 / 6
        + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A ** 5 / 120
    ) + fe
    y = k0 * (
        M(phi) - M(lat0 * d2r)
        + N * math.tan(phi) * (
            A * A / 2
            + (5 - T + 9 * C + 4 * C * C) * A ** 4 / 24
            + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A ** 6 / 720
        )
    ) + fn
    return x, y


UTM36S_WKT = (
    'PROJCS["WGS_1984_UTM_Zone_36S",GEOGCS["GCS_WGS_1984",'
    'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],'
    'PARAMETER["False_Northing",10000000.0],'
    'PARAMETER["Central_Meridian",33.0],PARAMETER["Scale_Factor",0.9996],'
    'PARAMETER["Latitude_Of_Origin",0.0],UNIT["Meter",1.0]]'
)


def test_tmerc_inverse_snyder_example():
    """USGS PP 1395 p. 269-270: Clarke 1866, k0=0.9996, origin (0, -75W);
    (x, y) = (127106.5, 4484124.4) must invert to (40.5N, 73.5W)."""
    inv = shp._tmerc_inverse(
        6378206.4, 0.00676866, lat0=0.0, lon0=-75.0, k0=0.9996,
        fe=0.0, fn=0.0,
    )
    lon, lat = inv(np.array([127106.5]), np.array([4484124.4]))
    assert abs(lon[0] - (-73.5)) < 1e-5
    assert abs(lat[0] - 40.5) < 1e-5


def test_tmerc_roundtrip_utm36s_grid():
    """forward (test-local) then inverse (library) over UTM zone 36S's
    Mozambique extent (±3° of the central meridian): both directions
    are truncated series so they disagree by up to ~2e-9° (0.2 mm) —
    assert sub-millimetre."""
    tr = shp.make_transform(UTM36S_WKT)
    for lon in np.arange(30.1, 36.0, 0.9):
        for lat in np.arange(-26.0, -10.0, 2.3):
            x, y = _tmerc_forward(
                lon, lat, 6378137.0, 0.0066943799901413165,
                lat0=0.0, lon0=33.0, k0=0.9996, fe=500000.0, fn=1e7,
            )
            rlon, rlat = tr(np.array([x]), np.array([y]))
            assert abs(rlon[0] - lon) < 1e-8
            assert abs(rlat[0] - lat) < 1e-8


def _lcc_forward(lon, lat, a, e2, lat1, lat2, lat0, lon0, fe=0.0, fn=0.0):
    """Snyder 15-1..15-7 forward LCC, independent of the library."""
    e = math.sqrt(e2)
    d2r = math.pi / 180.0

    def t_of(phi):
        es = e * math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / (
            ((1 - es) / (1 + es)) ** (e / 2)
        )

    def m_of(phi):
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1 - e2 * s * s)

    p1, p2, p0 = lat1 * d2r, lat2 * d2r, lat0 * d2r
    if lat1 != lat2:
        n = (math.log(m_of(p1)) - math.log(m_of(p2))) / (
            math.log(t_of(p1)) - math.log(t_of(p2))
        )
    else:
        n = math.sin(p1)
    F = m_of(p1) / (n * t_of(p1) ** n)
    rho0 = a * F * t_of(p0) ** n
    rho = a * F * t_of(lat * d2r) ** n
    theta = n * (lon - lon0) * d2r
    return rho * math.sin(theta) + fe, rho0 - rho * math.cos(theta) + fn


def test_lcc_inverse_snyder_example():
    """USGS PP 1395 p. 296-297: Clarke 1866, SPs 33/45, origin (23, -96);
    (x, y) = (1894410.9, 1564649.5) must invert to (35N, 75W)."""
    inv = shp._lcc_inverse(
        6378206.4, 0.00676866,
        lat1=33.0, lat2=45.0, lat0=23.0, lon0=-96.0, fe=0.0, fn=0.0,
    )
    lon, lat = inv(np.array([1894410.9]), np.array([1564649.5]))
    assert abs(lon[0] - (-75.0)) < 1e-5
    assert abs(lat[0] - 35.0) < 1e-5


def test_lcc_roundtrip_conus_grid():
    wkt = (
        'PROJCS["NAD_1983_Lambert_Conformal_Conic",GEOGCS["GCS_NAD_1983",'
        'DATUM["D_NAD_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Lambert_Conformal_Conic"],'
        'PARAMETER["False_Easting",2000000.0],'
        'PARAMETER["False_Northing",500000.0],'
        'PARAMETER["Central_Meridian",-120.0],'
        'PARAMETER["Standard_Parallel_1",34.0],'
        'PARAMETER["Standard_Parallel_2",40.5],'
        'PARAMETER["Latitude_Of_Origin",32.0],UNIT["Meter",1.0]]'
    )
    tr = shp.make_transform(wkt)
    e2 = 0.006694380022900787  # GRS 1980
    for lon in np.arange(-125.0, -113.0, 2.1):
        for lat in np.arange(32.0, 42.0, 1.7):
            x, y = _lcc_forward(
                lon, lat, 6378137.0, e2,
                lat1=34.0, lat2=40.5, lat0=32.0, lon0=-120.0,
                fe=2000000.0, fn=500000.0,
            )
            rlon, rlat = tr(np.array([x]), np.array([y]))
            assert abs(rlon[0] - lon) < 1e-9
            assert abs(rlat[0] - lat) < 1e-9


def test_web_mercator_roundtrip():
    wkt = (
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Mercator_Auxiliary_Sphere"],'
        'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",0.0],'
        'PARAMETER["Auxiliary_Sphere_Type",0.0],UNIT["Meter",1.0]]'
    )
    tr = shp.make_transform(wkt)
    R = 6378137.0
    d2r = math.pi / 180.0
    for lon, lat in [(-73.5, 40.5), (33.0, -18.9), (179.0, 84.0), (0.0, 0.0)]:
        x = R * lon * d2r
        y = R * math.log(math.tan(math.pi / 4 + lat * d2r / 2))
        rlon, rlat = tr(np.array([x]), np.array([y]))
        assert abs(rlon[0] - lon) < 1e-12
        assert abs(rlat[0] - lat) < 1e-12


def test_tmerc_northern_hemisphere_zone():
    """UTM north (fn=0) and a non-zero latitude_of_origin both flow
    through m0 — check a Gauss–Krüger-style grid (k0=1, lat0=38)."""
    inv = shp._tmerc_inverse(
        6378137.0, 0.0066943799901413165,
        lat0=38.0, lon0=127.0, k0=1.0, fe=200000.0, fn=600000.0,
    )
    for lon, lat in [(126.2, 36.1), (127.9, 40.0), (127.0, 38.0)]:
        x, y = _tmerc_forward(
            lon, lat, 6378137.0, 0.0066943799901413165,
            lat0=38.0, lon0=127.0, k0=1.0, fe=200000.0, fn=600000.0,
        )
        rlon, rlat = inv(np.array([x]), np.array([y]))
        assert abs(rlon[0] - lon) < 1e-9
        assert abs(rlat[0] - lat) < 1e-9


# ---------------------------------------------------------------------------
# synthetic round-trips (independent writer → library reader)
# ---------------------------------------------------------------------------


def test_polyline_dbf_roundtrip(spark, tmp_path):
    parts_a = [np.array([[30.0, -15.0], [30.5, -15.5], [31.0, -15.0]])]
    parts_b = [
        np.array([[32.0, -16.0], [32.5, -16.5]]),
        np.array([[33.0, -17.0], [33.5, -17.5]]),
    ]
    p = str(tmp_path / "ways.shp")
    _write_shp(p, [(3, parts_a), (3, parts_b), (0, [])], 3)
    _write_dbf(
        str(tmp_path / "ways.dbf"),
        [("NAME", "C", 10, 0), ("RUC", "N", 8, 2), ("LANES", "N", 4, 0)],
        [("N1-a", "12.50", "2"), ("Praça", "0.75", "1"), (None, None, None)],
    )
    out = (
        read_shapefile(spark, p)
        .toPandas()
        .sort_values("geometry_json", na_position="last")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    by_name = {
        (r["properties"] or {}).get("NAME"): r for _, r in out.iterrows()
    }
    a = by_name["N1-a"]
    assert a["geom_type"] == "LineString"
    assert [(c["lon"], c["lat"]) for c in a["coordinates"]] == [
        (30.0, -15.0), (30.5, -15.5), (31.0, -15.0)
    ]
    assert a["properties"]["RUC"] == "12.5"  # N-with-decimals canonicalized
    assert a["properties"]["LANES"] == "2"
    b = by_name["Praça"]  # latin-1 default decode
    assert b["geom_type"] == "MultiLineString"
    gj = json.loads(b["geometry_json"])
    assert gj["coordinates"] == [
        [[32.0, -16.0], [32.5, -16.5]], [[33.0, -17.0], [33.5, -17.5]]
    ]
    assert b["coordinates"] is None  # only single LineStrings surface coords
    null_row = by_name[None]
    assert null_row["geom_type"] is None and null_row["geometry_json"] is None


def test_polygon_hole_assignment(spark, tmp_path):
    # outer ring clockwise (shapefile convention), hole counter-clockwise
    outer = np.array(
        [[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]]
    )
    hole = np.array(
        [[2.0, 2.0], [4.0, 2.0], [4.0, 4.0], [2.0, 4.0], [2.0, 2.0]]
    )
    island = np.array(
        [[20.0, 0.0], [20.0, 5.0], [25.0, 5.0], [25.0, 0.0], [20.0, 0.0]]
    )
    p = str(tmp_path / "poly.shp")
    _write_shp(p, [(5, [outer, hole, island])], 5)
    out = read_shapefile(spark, p).toPandas()
    gj = json.loads(out.iloc[0]["geometry_json"])
    assert gj["type"] == "MultiPolygon"
    assert len(gj["coordinates"]) == 2  # two shells
    shells_with_holes = [len(poly) for poly in gj["coordinates"]]
    assert sorted(shells_with_holes) == [1, 2]  # hole attached to big shell
    big = next(poly for poly in gj["coordinates"] if len(poly) == 2)
    assert big[1][0] == [2.0, 2.0]


def test_reprojection_through_prj_sidecar(spark, tmp_path):
    wgs = [(31.0, -18.0), (31.2, -18.1), (31.4, -18.3)]
    proj = [
        _albers_forward(
            lon, lat, 6378137.0, 0.0066943799901413165,
            lat1=20.0, lat2=-23.0, lat0=0.0, lon0=25.0,
        )
        for lon, lat in wgs
    ]
    p = str(tmp_path / "road.shp")
    _write_shp(p, [(3, [np.array(proj)])], 3)
    (tmp_path / "road.prj").write_text(ALBERS_MOZ_WKT)
    out = read_shapefile(spark, p).toPandas()
    got = [(c["lon"], c["lat"]) for c in out.iloc[0]["coordinates"]]
    for (glon, glat), (wlon, wlat) in zip(got, wgs):
        assert abs(glon - wlon) < 1e-9
        assert abs(glat - wlat) < 1e-9


def test_reprojection_through_utm_prj_sidecar(spark, tmp_path):
    """A UTM 36S shapefile (the most common projected CRS family) must
    come back in WGS84 lon/lat through the .prj front door."""
    wgs = [(31.0, -18.0), (33.0, -19.5), (35.5, -16.2)]
    proj = [
        _tmerc_forward(
            lon, lat, 6378137.0, 0.0066943799901413165,
            lat0=0.0, lon0=33.0, k0=0.9996, fe=500000.0, fn=1e7,
        )
        for lon, lat in wgs
    ]
    p = str(tmp_path / "utm_road.shp")
    _write_shp(p, [(3, [np.array(proj)])], 3)
    (tmp_path / "utm_road.prj").write_text(UTM36S_WKT)
    out = read_shapefile(spark, p).toPandas()
    got = [(c["lon"], c["lat"]) for c in out.iloc[0]["coordinates"]]
    for (glon, glat), (wlon, wlat) in zip(got, wgs):
        assert abs(glon - wlon) < 1e-9
        assert abs(glat - wlat) < 1e-9


def test_plan_is_distributed_map_in_pandas(spark, tmp_path):
    p = str(tmp_path / "one.shp")
    _write_shp(p, [(1, [np.array([[30.0, -15.0]])])], 1)
    df = read_shapefile(spark, p)
    assert "MapInPandas" in df._jdf.queryExecution().toString()


# ---------------------------------------------------------------------------
# the reference's real files
# ---------------------------------------------------------------------------


def _shx_record_count(shp_path: str) -> int:
    """Record count read INDEPENDENTLY from the .shx index sidecar
    (header file length minus 100-byte header, 8 bytes per record)."""
    with open(shp_path[:-4] + ".shx", "rb") as fh:
        head = fh.read(28)
    (file_len_16,) = struct.unpack(">i", head[24:28])
    return (file_len_16 * 2 - 100) // 8


def test_reference_od_points(spark):
    out = read_shapefile(spark, OD_SHP).toPandas()
    assert len(out) == _shx_record_count(OD_SHP)
    assert set(out["geom_type"]) == {"Point"}
    pts = np.array(
        [json.loads(g)["coordinates"] for g in out["geometry_json"]]
    )
    # GEOGCS file: coordinates must already be Mozambique lon/lat
    assert pts[:, 0].min() > 29 and pts[:, 0].max() < 42
    assert pts[:, 1].min() > -28 and pts[:, 1].max() < -9
    # .dbf attributes present and aligned on every row
    assert all(isinstance(p, dict) and p for p in out["properties"])


def test_reference_agriculture_polygons(spark):
    out = read_shapefile(spark, AG_SHP).toPandas()
    assert len(out) == _shx_record_count(AG_SHP)
    assert set(out["geom_type"]) <= {"Polygon", "MultiPolygon"}
    ring0 = json.loads(out.iloc[0]["geometry_json"])
    first = (
        ring0["coordinates"][0][0]
        if ring0["type"] == "Polygon"
        else ring0["coordinates"][0][0][0]
    )
    assert 29 < first[0] < 42 and -28 < first[1] < -9


# --------------------------------------------------------------------------
# polar stereographic + sinusoidal (round 7 CRS additions)
# --------------------------------------------------------------------------

def _polar_stereo_forward(lon, lat, a, e2, south, lon0, lat_ts):
    """Snyder 21-30..21-34 forward (variant B), independent of the
    library: x = rho sin(lam), y = ±rho cos(lam)."""
    e = math.sqrt(e2)

    def t_of(phi):
        s = math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            (1.0 - e * s) / (1.0 + e * s)
        ) ** (e / 2.0)

    d2r = math.pi / 180.0
    phic = abs(lat_ts) * d2r
    s = math.sin(phic)
    mc = math.cos(phic) / math.sqrt(1.0 - e2 * s * s)
    phi = (-lat if south else lat) * d2r
    lam = (lon - lon0) * d2r
    if south:
        lam = -lam  # the south aspect mirrors the azimuth sense
    rho = a * mc * t_of(phi) / t_of(phic)
    x = rho * math.sin(lam)
    y = -rho * math.cos(lam)
    if south:
        x, y = -x, -y
    return x, y


def test_polar_stereographic_snyder_example():
    """USGS PP 1395 p. 315: International 1924, std parallel 71S,
    lon0 = -100; (x, y) = (-1540033.6, -560526.4) must invert to
    (75S, 150E)."""
    inv = shp._polar_stereo_inverse(
        6378388.0, 0.00672267, south=True, lon0=-100.0, lat_ts=-71.0
    )
    lon, lat = inv(np.array([-1540033.6]), np.array([-560526.4]))
    assert abs(lat[0] - (-75.0)) < 1e-6
    assert abs(lon[0] - 150.0) < 1e-5


def test_polar_stereographic_roundtrip_both_poles():
    """forward (test-local, Snyder 21-30..34) then inverse (library)
    over Antarctic (EPSG:3031-style) and Arctic grids."""
    a, e2 = 6378137.0, 0.0066943799901413165
    for south, lat_ts, lon0, lats in (
        (True, -71.0, 0.0, np.arange(-88.0, -60.0, 3.7)),
        (False, 70.0, -45.0, np.arange(62.0, 89.0, 3.3)),
    ):
        inv = shp._polar_stereo_inverse(
            a, e2, south=south, lon0=lon0, lat_ts=lat_ts
        )
        for lon in np.arange(-170.0, 180.0, 47.0):
            for lat in lats:
                x, y = _polar_stereo_forward(
                    lon, lat, a, e2, south, lon0, lat_ts
                )
                rlon, rlat = inv(np.array([x]), np.array([y]))
                assert abs(rlat[0] - lat) < 1e-9, (south, lon, lat)
                assert abs(rlon[0] - lon) < 1e-9, (south, lon, lat)


def test_polar_stereographic_axis_conventions():
    """EPSG:3031 (south, lon0=0): grid +y points toward Greenwich,
    +x toward 90E.  EPSG-style north aspect: +y points AWAY from
    lon0's meridian."""
    a, e2 = 6378137.0, 0.0066943799901413165
    inv_s = shp._polar_stereo_inverse(a, e2, south=True, lon0=0.0,
                                      lat_ts=-71.0)
    lon, lat = inv_s(np.array([0.0]), np.array([2_000_000.0]))
    assert abs(lon[0]) < 1e-9 and -90 < lat[0] < -60
    lon, lat = inv_s(np.array([2_000_000.0]), np.array([0.0]))
    assert abs(lon[0] - 90.0) < 1e-9
    inv_n = shp._polar_stereo_inverse(a, e2, south=False, lon0=0.0,
                                      lat_ts=70.0)
    lon, lat = inv_n(np.array([0.0]), np.array([-2_000_000.0]))
    assert abs(lon[0]) < 1e-9 and 60 < lat[0] < 90


def _sinusoidal_forward(lon, lat, a, e2, lon0):
    """Snyder 30-8/30-9 forward, independent series for M(phi)."""
    d2r = math.pi / 180.0
    phi = lat * d2r
    e4, e6 = e2 * e2, e2 * e2 * e2
    m = a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi)
    )
    s = math.sin(phi)
    x = a * (lon - lon0) * d2r * math.cos(phi) / math.sqrt(1 - e2 * s * s)
    return x, m


def test_sinusoidal_roundtrip_grid():
    """MODIS-style sinusoidal (WGS84, lon0=0): forward (test-local)
    then inverse (library) across four hemisphere quadrants."""
    a, e2 = 6378137.0, 0.0066943799901413165
    inv = shp._sinusoidal_inverse(a, e2, lon0=0.0)
    for lon in np.arange(-160.0, 180.0, 38.5):
        for lat in np.arange(-80.0, 85.0, 16.3):
            x, y = _sinusoidal_forward(lon, lat, a, e2, 0.0)
            rlon, rlat = inv(np.array([x]), np.array([y]))
            # the rectifying series truncates at e^8: ~1e-8 deg (~1 mm)
            assert abs(rlat[0] - lat) < 1e-7, (lon, lat)
            assert abs(rlon[0] - lon) < 1e-7, (lon, lat)


def test_polar_and_sinusoidal_wkt_dispatch():
    """make_transform routes the new WKT projection names."""
    gcs = (
        'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
        "6378137.0,298.257223563]],PRIMEM[\"Greenwich\",0.0],"
        'UNIT["Degree",0.0174532925199433]]'
    )
    wkt_s = (
        f'PROJCS["antarctic",{gcs},PROJECTION["Stereographic_South_Pole"],'
        'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",-71.0],UNIT["Meter",1.0]]'
    )
    tr = shp.make_transform(wkt_s)
    lon, lat = tr(np.array([0.0]), np.array([2_000_000.0]))
    assert abs(lon[0]) < 1e-9 and -90 < lat[0] < -60
    wkt_sin = (
        f'PROJCS["modis",{gcs},PROJECTION["Sinusoidal"],'
        'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],UNIT["Meter",1.0]]'
    )
    tr2 = shp.make_transform(wkt_sin)
    x, y = _sinusoidal_forward(33.5, -19.0, 6378137.0,
                               0.0066943799901413165, 0.0)
    lon, lat = tr2(np.array([x]), np.array([y]))
    assert abs(lon[0] - 33.5) < 1e-8 and abs(lat[0] - (-19.0)) < 1e-9
    with pytest.raises(NotImplementedError, match="oblique"):
        shp.make_transform(
            f'PROJCS["obl",{gcs},PROJECTION["Stereographic"],'
            'PARAMETER["Central_Meridian",10.0],'
            'PARAMETER["Latitude_Of_Origin",45.0],'
            'PARAMETER["Scale_Factor",1.0],UNIT["Meter",1.0]]'
        )


def _laea_forward(lon, lat, a, e2, lat0, lon0, fe=0.0, fn=0.0):
    """Test-local Snyder 24-19..24-21 oblique ellipsoidal LAEA forward."""
    import math

    e = math.sqrt(e2)

    def q_of(s):
        return (1.0 - e2) * (
            s / (1.0 - e2 * s * s)
            - (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s))
        )

    d2r = math.pi / 180.0
    phi, lam = lat * d2r, lon * d2r
    phi0, lam0 = lat0 * d2r, lon0 * d2r
    qp = q_of(1.0)
    beta = math.asin(q_of(math.sin(phi)) / qp)
    beta0 = math.asin(q_of(math.sin(phi0)) / qp)
    rq = a * math.sqrt(qp / 2.0)
    m0 = math.cos(phi0) / math.sqrt(1.0 - e2 * math.sin(phi0) ** 2)
    d = a * m0 / (rq * math.cos(beta0))
    b = rq * math.sqrt(
        2.0
        / (
            1.0
            + math.sin(beta0) * math.sin(beta)
            + math.cos(beta0) * math.cos(beta) * math.cos(lam - lam0)
        )
    )
    x = b * d * math.cos(beta) * math.sin(lam - lam0) + fe
    y = (b / d) * (
        math.cos(beta0) * math.sin(beta)
        - math.sin(beta0) * math.cos(beta) * math.cos(lam - lam0)
    ) + fn
    return x, y


def test_laea_epsg_guidance_note_example():
    """ETRS89 / LAEA Europe (EPSG:3035): the EPSG Guidance Note 7-2
    worked example — 50°N 5°E <-> E 3962799.45, N 2999718.85 — an
    independent published pin, not a round-trip."""
    a, f = 6378137.0, 1.0 / 298.257222101  # GRS80
    e2 = 2 * f - f * f
    inv = shp._laea_inverse(
        a, e2, lat0=52.0, lon0=10.0, fe=4321000.0, fn=3210000.0
    )
    lon, lat = inv(np.array([3962799.45]), np.array([2999718.85]))
    assert abs(lon[0] - 5.0) < 1e-7
    assert abs(lat[0] - 50.0) < 1e-7


def test_laea_roundtrip_grid():
    a, f = 6378137.0, 1.0 / 298.257222101
    e2 = 2 * f - f * f
    inv = shp._laea_inverse(a, e2, lat0=52.0, lon0=10.0)
    for lon in (-25.0, -8.0, 10.0, 31.5, 44.0):
        for lat in (34.0, 44.2, 52.0, 60.0, 71.0):
            x, y = _laea_forward(lon, lat, a, e2, 52.0, 10.0)
            rlon, rlat = inv(np.array([x]), np.array([y]))
            assert abs(rlon[0] - lon) < 1e-8, (lon, lat)
            assert abs(rlat[0] - lat) < 1e-8, (lon, lat)
    # exact origin: rho = 0 must not divide by zero
    rlon, rlat = inv(np.array([0.0]), np.array([0.0]))
    assert abs(rlon[0] - 10.0) < 1e-12 and abs(rlat[0] - 52.0) < 1e-12


def test_equidistant_cylindrical_roundtrip():
    import math

    a, e2 = 6378137.0, 0.0066943799901413165
    lat_ts = 30.0
    inv = shp._eqc_inverse(a, e2, lat_ts=lat_ts, lon0=0.0)
    s1 = math.sin(lat_ts * math.pi / 180.0)
    nu1cos = (
        a
        * math.cos(lat_ts * math.pi / 180.0)
        / math.sqrt(1.0 - e2 * s1 * s1)
    )
    for lon, lat in [(10.0, 55.0), (-73.5, -33.2), (179.0, 80.0)]:
        x = nu1cos * lon * math.pi / 180.0
        y = float(
            shp._meridian_arc(np.float64(lat * math.pi / 180.0), a, e2)
        )
        rlon, rlat = inv(np.array([x]), np.array([y]))
        assert abs(rlon[0] - lon) < 1e-8
        assert abs(rlat[0] - lat) < 1e-7


def test_laea_and_eqc_wkt_dispatch():
    gcs = (
        'GEOGCS["GCS_ETRS_1989",DATUM["D_ETRS_1989",SPHEROID["GRS_1980",'
        "6378137.0,298.257222101]],PRIMEM[\"Greenwich\",0.0],"
        'UNIT["Degree",0.0174532925199433]]'
    )
    wkt = (
        f'PROJCS["ETRS89_LAEA",{gcs},'
        'PROJECTION["Lambert_Azimuthal_Equal_Area"],'
        'PARAMETER["False_Easting",4321000.0],'
        'PARAMETER["False_Northing",3210000.0],'
        'PARAMETER["Central_Meridian",10.0],'
        'PARAMETER["Latitude_Of_Origin",52.0],UNIT["Meter",1.0]]'
    )
    tr = shp.make_transform(wkt)
    lon, lat = tr(np.array([3962799.45]), np.array([2999718.85]))
    assert abs(lon[0] - 5.0) < 1e-7 and abs(lat[0] - 50.0) < 1e-7
    wkt2 = (
        f'PROJCS["WGS84_PlateCarree",{gcs},PROJECTION["Equirectangular"],'
        'PARAMETER["False_Easting",0.0],PARAMETER["False_Northing",0.0],'
        'PARAMETER["Central_Meridian",0.0],'
        'PARAMETER["Standard_Parallel_1",0.0],UNIT["Meter",1.0]]'
    )
    tr2 = shp.make_transform(wkt2)
    lon, lat = tr2(np.array([0.0]), np.array([0.0]))
    assert abs(lon[0]) < 1e-12 and abs(lat[0]) < 1e-12


def test_register_projection_inverse_hatch():
    """An unsupported family with a registered factory must resolve
    through the registry (and receive the .prj's spheroid + params);
    unregistered it must raise naming ALL THREE escape hatches."""
    gcs = (
        'GEOGCS["g",DATUM["d",SPHEROID["s",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]]'
    )
    wkt = (
        f'PROJCS["cz",{gcs},PROJECTION["Krovak"],'
        'PARAMETER["False_Easting",0.0],'
        'PARAMETER["Latitude_Of_Center",49.5],UNIT["Meter",1.0]]'
    )
    with pytest.raises(NotImplementedError) as exc:
        shp.make_transform(wkt)
    msg = str(exc.value)
    assert "register_projection_inverse" in msg
    assert "pyproj" in msg and "ogr2ogr" in msg

    seen = {}

    def factory(a, e2, params):
        seen["a"], seen["e2"], seen["params"] = a, e2, params
        return lambda x, y: (x / 1000.0, y / 1000.0)

    shp.register_projection_inverse("Krovak", factory)
    try:
        tr = shp.make_transform(wkt)
        lon, lat = tr(np.array([12500.0]), np.array([49800.0]))
        assert lon[0] == 12.5 and lat[0] == 49.8
        assert seen["a"] == 6378137.0
        assert abs(seen["e2"] - 0.0066943799901413165) < 1e-12
        assert seen["params"]["latitude_of_center"] == 49.5
    finally:
        shp._EXTRA_INVERSES.pop("krovak", None)
