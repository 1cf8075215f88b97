"""Dependency-free ESRI shapefile parsing: .shp geometry, .dbf
attributes, .prj-driven reprojection — pure stdlib ``struct`` + numpy.

This de-gates S1 (the reference ingests every dataset through
``ogr2ogr`` shapefile scans — scripts/base-network.sh:98-99,
scripts/preparation.sh:130-131) without a geopandas/GDAL dependency:
the format is a simple public binary layout (ESRI Shapefile Technical
Description, 1998) and the reprojections are closed-form public math
(Snyder, *Map Projections — A Working Manual*, USGS PP 1395): the
reference's own Albers Equal-Area Conic → WGS84 (eqs. 14-1..14-11,
3-16) plus ellipsoidal Transverse Mercator → WGS84 (eqs. 8-12..8-25,
3-26) so every UTM zone — the most common projected CRS a user feeds
``ogr2ogr -t_srs EPSG:4326`` in the reference — works here too; plus
Lambert Conformal Conic (15-1..15-11), Web Mercator, Polar
Stereographic both aspects/variants (21-30..21-40), and Sinusoidal
(30-6..30-11, the MODIS grid).

Everything here runs executor-side inside ``readers.read_shapefile``'s
``mapInPandas`` kernel — the driver never sees feature rows.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------------------
# .prj — WKT coordinate systems (GEOGCS passthrough, Albers inverse)
# ---------------------------------------------------------------------------


def _wkt_params(wkt: str) -> dict[str, float]:
    """PARAMETER["name", value] pairs from an ESRI WKT string."""
    out: dict[str, float] = {}
    rest = wkt
    while 'PARAMETER["' in rest:
        rest = rest.split('PARAMETER["', 1)[1]
        name, rest = rest.split('"', 1)
        val = rest.split(",", 1)[1].split("]", 1)[0]
        out[name.lower()] = float(val)
    return out


def _wkt_spheroid(wkt: str) -> tuple[float, float]:
    """(semi-major axis a, eccentricity-squared e2) from SPHEROID[...]."""
    body = wkt.split('SPHEROID["', 1)[1].split("]", 1)[0]
    _, a_s, invf_s = body.rsplit(",", 2)
    a = float(a_s)
    inv_f = float(invf_s)
    f = 0.0 if inv_f == 0 else 1.0 / inv_f
    e2 = f * (2.0 - f)
    return a, e2


#: PROJECTION["..."] names (lowercased) with a Snyder closed-form
#: inverse here — the families every reference .prj uses, plus the
#: common global grids.  Documented in README §"Shapefile CRS support".
SUPPORTED_PROJECTIONS = (
    "albers",
    "transverse_mercator",
    "lambert_conformal_conic",
    "mercator_auxiliary_sphere",
    "stereographic (polar aspects only)",
    "polar_stereographic",
    "stereographic_north_pole",
    "stereographic_south_pole",
    "sinusoidal",
    "lambert_azimuthal_equal_area",
    "equirectangular / equidistant_cylindrical / plate_carree",
)

#: user-registered inverse factories for families without a built-in
#: Snyder inverse: ``name (lowercased PROJECTION[".."]) -> factory(a,
#: e2, params) -> inverse(x, y)``.  The graceful-degradation hatch for
#: exotic national grids — see ``register_projection_inverse``.
_EXTRA_INVERSES: dict = {}


def register_projection_inverse(name: str, factory) -> None:
    """Register an inverse for a PROJCS family ``make_transform`` does
    not cover: ``factory(a, e2, params)`` receives the WKT's spheroid
    (semi-major axis, eccentricity squared) and its
    ``PARAMETER["name", value]`` dict (lowercased keys) and must
    return a vectorized ``(x, y) -> (lon, lat)`` degrees function.
    Registered names take effect for every subsequent shapefile scan
    in the process (executors re-resolve through the same module)."""
    _EXTRA_INVERSES[name.strip().lower()] = factory


def _pyproj_transform(prj_wkt: str):
    """Optional escape hatch: if ``pyproj`` is importable (it is NOT a
    dependency of this package), let PROJ handle any CRS the built-in
    Snyder inverses don't.  Returns None when pyproj is absent."""
    try:
        from pyproj import Transformer
    except ImportError:
        return None
    tr = Transformer.from_crs(prj_wkt, "EPSG:4326", always_xy=True)

    def inverse(x, y):
        return tr.transform(x, y)

    return inverse


def make_transform(prj_wkt: str | None):
    """WKT → vectorized (x, y) -> (lon, lat) degrees transform.

    GEOGCS (already geographic) → identity.  PROJCS coverage:
    Albers, Transverse Mercator (every UTM zone plus national TM
    grids), Lambert Conformal Conic, Web Mercator, Polar
    Stereographic (ESRI ``Stereographic_*_Pole``, pole-origin
    variant A, and EPSG variant B via ``Polar_Stereographic``),
    Sinusoidal, Lambert Azimuthal Equal-Area (the ETRS89-LAEA /
    US National Atlas family), and Equidistant Cylindrical /
    Equirectangular — each an ellipsoidal Snyder closed-form
    inverse.  Anything else falls through, in order, to (1) a
    user-registered inverse (``register_projection_inverse``),
    (2) pyproj when importable (NOT a dependency), then (3) raises
    loudly rather than silently mis-locate geometry.
    """
    if prj_wkt is None or prj_wkt.lstrip().startswith("GEOGCS"):
        return lambda x, y: (x, y)
    if not prj_wkt.lstrip().startswith("PROJCS"):
        raise NotImplementedError(f"unsupported CRS WKT: {prj_wkt[:60]}...")
    proj = prj_wkt.split('PROJECTION["', 1)[1].split('"', 1)[0].lower()
    p = _wkt_params(prj_wkt)
    a, e2 = _wkt_spheroid(prj_wkt)
    if proj == "albers":
        return _albers_inverse(
            a,
            e2,
            lat1=p["standard_parallel_1"],
            lat2=p["standard_parallel_2"],
            lat0=p["latitude_of_origin"],
            lon0=p["central_meridian"],
            fe=p.get("false_easting", 0.0),
            fn=p.get("false_northing", 0.0),
        )
    if proj == "transverse_mercator":
        return _tmerc_inverse(
            a,
            e2,
            lat0=p.get("latitude_of_origin", 0.0),
            lon0=p["central_meridian"],
            k0=p.get("scale_factor", 1.0),
            fe=p.get("false_easting", 0.0),
            fn=p.get("false_northing", 0.0),
        )
    if proj == "lambert_conformal_conic":
        return _lcc_inverse(
            a,
            e2,
            lat1=p["standard_parallel_1"],
            lat2=p.get("standard_parallel_2", p["standard_parallel_1"]),
            lat0=p["latitude_of_origin"],
            lon0=p["central_meridian"],
            fe=p.get("false_easting", 0.0),
            fn=p.get("false_northing", 0.0),
        )
    if proj == "mercator_auxiliary_sphere":
        # Web Mercator (EPSG:3857): spherical formulas on the WGS84
        # semi-major axis regardless of the datum's ellipsoid — that IS
        # the projection's definition, not an approximation here
        return _webmerc_inverse(a, lon0=p.get("central_meridian", 0.0))
    if proj in (
        "stereographic",
        "polar_stereographic",
        "stereographic_north_pole",
        "stereographic_south_pole",
    ):
        lon0 = p.get("central_meridian", p.get("longitude_of_origin", 0.0))
        fe = p.get("false_easting", 0.0)
        fn = p.get("false_northing", 0.0)
        lat0 = p.get("latitude_of_origin", 0.0)
        if proj.endswith("_pole"):
            # ESRI polar forms: pole from the name, scale from the
            # standard parallel
            south = proj.endswith("south_pole")
            lat_ts = p.get("standard_parallel_1", lat0)
            return _polar_stereo_inverse(
                a, e2, south, lon0, lat_ts=lat_ts, fe=fe, fn=fn
            )
        if abs(abs(lat0) - 90.0) < 1e-9:
            # pole origin: variant A (scale factor at the pole)
            return _polar_stereo_inverse(
                a, e2, lat0 < 0, lon0,
                k0=p.get("scale_factor", 1.0), fe=fe, fn=fn,
            )
        if proj == "polar_stereographic" and abs(lat0) > 1e-9:
            # EPSG variant B: latitude_of_origin IS the standard parallel
            return _polar_stereo_inverse(
                a, e2, lat0 < 0, lon0, lat_ts=lat0, fe=fe, fn=fn
            )
        raise NotImplementedError(
            "oblique/equatorial Stereographic is not supported (only the "
            "polar aspects); reproject the source or add the oblique "
            "inverse"
        )
    if proj == "sinusoidal":
        return _sinusoidal_inverse(
            a,
            e2,
            lon0=p.get("central_meridian", p.get("longitude_of_center", 0.0)),
            fe=p.get("false_easting", 0.0),
            fn=p.get("false_northing", 0.0),
        )
    if proj == "lambert_azimuthal_equal_area":
        return _laea_inverse(
            a,
            e2,
            lat0=p.get("latitude_of_origin", p.get("latitude_of_center", 0.0)),
            lon0=p.get("central_meridian", p.get("longitude_of_center", 0.0)),
            fe=p.get("false_easting", 0.0),
            fn=p.get("false_northing", 0.0),
        )
    if proj in ("equirectangular", "equidistant_cylindrical", "plate_carree"):
        return _eqc_inverse(
            a,
            e2,
            lat_ts=p.get("standard_parallel_1", p.get("latitude_of_origin", 0.0)),
            lon0=p.get("central_meridian", 0.0),
            fe=p.get("false_easting", 0.0),
            fn=p.get("false_northing", 0.0),
        )
    if proj in _EXTRA_INVERSES:
        return _EXTRA_INVERSES[proj](a, e2, p)
    hatch = _pyproj_transform(prj_wkt)
    if hatch is not None:
        return hatch
    raise NotImplementedError(
        f"unsupported projection family {proj!r}; supported families: "
        + ", ".join(SUPPORTED_PROJECTIONS)
        + ". Escape hatches, in preference order: (1) reproject the "
        "source to one of these or to WGS84 (ogr2ogr -t_srs EPSG:4326) "
        "— the reference pipeline does the same in scripts/"
        "base-network.sh:98-99; (2) pip install pyproj — when "
        "importable it is used automatically for any CRS; (3) "
        "register_projection_inverse(name, factory) with your own "
        "(x, y) -> (lon, lat) inverse for this family."
    )


def _q_of(sin_phi, e, e2):
    """Snyder eq. 3-12: authalic q."""
    esp = e * sin_phi
    return (1.0 - e2) * (
        sin_phi / (1.0 - e2 * sin_phi * sin_phi)
        - (1.0 / (2.0 * e)) * np.log((1.0 - esp) / (1.0 + esp))
    )


def _albers_inverse(a, e2, lat1, lat2, lat0, lon0, fe, fn):
    """Ellipsoidal Albers equal-area conic inverse (Snyder 14-1..14-11).

    The latitude series uses Newton iteration of eq. 3-16; three rounds
    converge below 1e-12 rad for any |lat| < 89.5°.
    """
    e = math.sqrt(e2)
    d2r = math.pi / 180.0
    phi1, phi2, phi0 = lat1 * d2r, lat2 * d2r, lat0 * d2r

    def m_of(phi):
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1.0 - e2 * s * s)

    m1, m2 = m_of(phi1), m_of(phi2)
    q0 = float(_q_of(np.float64(math.sin(phi0)), e, e2))
    q1 = float(_q_of(np.float64(math.sin(phi1)), e, e2))
    q2 = float(_q_of(np.float64(math.sin(phi2)), e, e2))
    n = (m1 * m1 - m2 * m2) / (q2 - q1) if phi1 != phi2 else math.sin(phi1)
    C = m1 * m1 + n * q1
    rho0 = a * math.sqrt(C - n * q0) / n

    def inverse(x, y):
        x = np.asarray(x, dtype=np.float64) - fe
        y = np.asarray(y, dtype=np.float64) - fn
        sgn = -1.0 if n < 0 else 1.0
        rho = np.hypot(sgn * x, sgn * (rho0 - y))
        theta = np.arctan2(sgn * x, sgn * (rho0 - y))
        q = (C - (rho * n / a) ** 2) / n
        # start value (spherical approximation, Snyder 14-6 footnote)
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(4):
            s = np.sin(phi)
            one = 1.0 - e2 * s * s
            phi = phi + (one * one / (2.0 * np.cos(phi))) * (
                q / (1.0 - e2)
                - s / one
                + (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
            )
        lon = lon0 + theta / n / d2r
        return lon, phi / d2r

    return inverse


def _lcc_inverse(a, e2, lat1, lat2, lat0, lon0, fe, fn):
    """Ellipsoidal Lambert Conformal Conic inverse (Snyder 15-1..15-11,
    7-9).  The latitude comes from fixed-point iteration of eq. 7-9
    (conformal latitude inverse); five rounds converge below 1e-12 rad.
    """
    e = math.sqrt(e2)
    d2r = math.pi / 180.0
    phi1, phi2, phi0 = lat1 * d2r, lat2 * d2r, lat0 * d2r

    def t_of(phi):
        es = e * math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
        )

    def m_of(phi):
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1.0 - e2 * s * s)

    t0_, t1_, t2_ = t_of(phi0), t_of(phi1), t_of(phi2)
    if phi1 != phi2:
        n = (math.log(m_of(phi1)) - math.log(m_of(phi2))) / (
            math.log(t1_) - math.log(t2_)
        )
    else:
        n = math.sin(phi1)
    big_f = m_of(phi1) / (n * t1_ ** n)
    rho0 = a * big_f * t0_ ** n

    def inverse(x, y):
        x = np.asarray(x, dtype=np.float64) - fe
        y = np.asarray(y, dtype=np.float64) - fn
        sgn = -1.0 if n < 0 else 1.0
        rho = sgn * np.hypot(x, rho0 - y)
        theta = np.arctan2(sgn * x, sgn * (rho0 - y))
        t = (rho / (a * big_f)) ** (1.0 / n)
        phi = math.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(5):
            es = e * np.sin(phi)
            phi = math.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
            )
        return lon0 + theta / n / d2r, phi / d2r

    return inverse


def _webmerc_inverse(a, lon0=0.0):
    """Spherical (Web) Mercator inverse on radius ``a`` (Snyder 7-4/7-5
    with R = the ellipsoid's semi-major axis — EPSG:3857's definition)."""
    d2r = math.pi / 180.0

    def inverse(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lon = lon0 + x / a / d2r
        lat = (2.0 * np.arctan(np.exp(y / a)) - math.pi / 2.0) / d2r
        return lon, lat

    return inverse


def _meridian_arc(phi, a, e2):
    """Snyder eq. 3-21: meridian distance from the equator to phi."""
    e4 = e2 * e2
    e6 = e4 * e2
    return a * (
        (1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi
        - (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0)
        * np.sin(2.0 * phi)
        + (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * np.sin(4.0 * phi)
        - (35.0 * e6 / 3072.0) * np.sin(6.0 * phi)
    )


def _tmerc_inverse(a, e2, lat0, lon0, k0, fe, fn):
    """Ellipsoidal Transverse Mercator inverse (Snyder 8-12..8-25).

    Latitude comes from the footpoint latitude phi1 via the rectifying
    series (Snyder eq. 3-26), then the D-power corrections.  Accurate
    to sub-millimetre within a UTM zone's ±3° extent (the series error
    grows past ~4° from the central meridian, which no UTM dataset
    exceeds).
    """
    d2r = math.pi / 180.0
    ep2 = e2 / (1.0 - e2)  # e'^2, Snyder 8-12
    sqrt1e = math.sqrt(1.0 - e2)
    e1 = (1.0 - sqrt1e) / (1.0 + sqrt1e)  # Snyder 3-24
    m0 = float(_meridian_arc(np.float64(lat0 * d2r), a, e2))
    rect = a * (
        1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0 - 5.0 * e2 ** 3 / 256.0
    )

    def inverse(x, y):
        x = np.asarray(x, dtype=np.float64) - fe
        y = np.asarray(y, dtype=np.float64) - fn
        m = m0 + y / k0  # Snyder 8-20
        mu = m / rect  # Snyder 7-19
        phi1 = (  # footpoint latitude, Snyder 3-26
            mu
            + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
            + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0)
            * np.sin(4.0 * mu)
            + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
            + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu)
        )
        s1 = np.sin(phi1)
        c1 = np.cos(phi1)
        t1 = (s1 / c1) ** 2  # T1, Snyder 8-22
        cc1 = ep2 * c1 * c1  # C1, Snyder 8-21
        n1 = a / np.sqrt(1.0 - e2 * s1 * s1)  # Snyder 8-23
        r1 = a * (1.0 - e2) / (1.0 - e2 * s1 * s1) ** 1.5  # Snyder 8-24
        d = x / (n1 * k0)  # Snyder 8-25
        d2 = d * d
        phi = phi1 - (n1 * (s1 / c1) / r1) * (  # Snyder 8-17
            d2 / 2.0
            - (5.0 + 3.0 * t1 + 10.0 * cc1 - 4.0 * cc1 * cc1 - 9.0 * ep2)
            * d2 * d2 / 24.0
            + (
                61.0 + 90.0 * t1 + 298.0 * cc1 + 45.0 * t1 * t1
                - 252.0 * ep2 - 3.0 * cc1 * cc1
            )
            * d2 * d2 * d2 / 720.0
        )
        lam = (  # Snyder 8-18
            d
            - (1.0 + 2.0 * t1 + cc1) * d * d2 / 6.0
            + (
                5.0 - 2.0 * cc1 + 28.0 * t1 - 3.0 * cc1 * cc1
                + 8.0 * ep2 + 24.0 * t1 * t1
            )
            * d * d2 * d2 / 120.0
        ) / c1
        return lon0 + lam / d2r, phi / d2r

    return inverse


def _polar_stereo_inverse(a, e2, south, lon0, k0=None, lat_ts=None,
                          fe=0.0, fn=0.0):
    """Ellipsoidal Polar Stereographic inverse (Snyder 21-15..21-40,
    p. 161-162).  Scale is fixed either by ``k0`` at the pole
    (variant A, Snyder 21-33) or by a standard parallel ``lat_ts``
    (variant B, Snyder 21-34: rho = a * m_c * t / t_c).  Latitude comes
    from fixed-point iteration of Snyder 7-9 (same conformal-latitude
    inverse the LCC path uses); six rounds converge below 1e-12 rad.
    """
    e = math.sqrt(e2)
    d2r = math.pi / 180.0

    def t_of(phi):
        s = math.sin(phi)
        return math.tan(math.pi / 4.0 - phi / 2.0) / (
            (1.0 - e * s) / (1.0 + e * s)
        ) ** (e / 2.0)

    if lat_ts is not None:
        phic = abs(lat_ts) * d2r
        s = math.sin(phic)
        mc = math.cos(phic) / math.sqrt(1.0 - e2 * s * s)
        rho_factor = a * mc / t_of(phic)  # Snyder 21-34
    else:
        rho_factor = (
            2.0 * a * (k0 if k0 is not None else 1.0)
            / math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        )  # Snyder 21-33 (k0 defined at the pole)

    def inverse(x, y):
        x = np.asarray(x, dtype=np.float64) - fe
        y = np.asarray(y, dtype=np.float64) - fn
        rho = np.hypot(x, y)
        t = rho / rho_factor  # Snyder 21-39/21-40
        phi = math.pi / 2.0 - 2.0 * np.arctan(t)  # spherical start
        for _ in range(6):  # Snyder 7-9
            es = e * np.sin(phi)
            phi = math.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - es) / (1.0 + es)) ** (e / 2.0)
            )
        if south:
            lam = np.arctan2(x, y)  # Snyder 20-17 (south aspect)
            lat = -phi / d2r
        else:
            lam = np.arctan2(x, -y)  # Snyder 20-16 (north aspect)
            lat = phi / d2r
        # the azimuth around the pole can put lon0 + lam outside
        # (-180, 180] (e.g. lon0=-100, lam=-110) — wrap once
        lon = np.mod(lon0 + lam / d2r + 180.0, 360.0) - 180.0
        return lon, lat

    return inverse


def _sinusoidal_inverse(a, e2, lon0, fe=0.0, fn=0.0):
    """Ellipsoidal Sinusoidal (equal-area, pseudocylindrical) inverse
    (Snyder 30-6..30-11, p. 247-248): latitude from the rectifying
    series (Snyder 3-26) applied to y as a meridian distance, then
    longitude from eq. 30-11.  The series truncates at the e^8 term:
    ~1e-8 degrees (about a millimetre) on any geodetic ellipsoid."""
    d2r = math.pi / 180.0
    sqrt1e = math.sqrt(1.0 - e2)
    e1 = (1.0 - sqrt1e) / (1.0 + sqrt1e)  # Snyder 3-24
    rect = a * (
        1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0 - 5.0 * e2 ** 3 / 256.0
    )

    def inverse(x, y):
        x = np.asarray(x, dtype=np.float64) - fe
        y = np.asarray(y, dtype=np.float64) - fn
        mu = y / rect  # Snyder 7-19
        phi = (  # Snyder 3-26
            mu
            + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
            + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0)
            * np.sin(4.0 * mu)
            + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
            + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu)
        )
        s = np.sin(phi)
        c = np.cos(phi)
        # Snyder 30-11; at the poles (cos phi → 0) longitude is
        # indeterminate — define it as lon0, never divide by ~0
        lam = np.where(
            np.abs(c) < 1e-12,
            0.0,
            x * np.sqrt(1.0 - e2 * s * s) / (a * np.where(c == 0, 1.0, c)),
        )
        return lon0 + lam / d2r, phi / d2r

    return inverse


def _laea_inverse(a, e2, lat0, lon0, fe=0.0, fn=0.0):
    """Ellipsoidal Lambert Azimuthal Equal-Area inverse, oblique
    aspect (Snyder 24-26..24-34 + 3-16..3-18, p. 187-190) — the
    family behind the pan-European ETRS89-LAEA grid (EPSG:3035) and
    the US National Atlas grid.  Latitude comes from the authalic
    latitude by fixed-point iteration of Snyder 3-16 (converges below
    1e-12 rad in ≤6 rounds for any geodetic ellipsoid)."""
    e = math.sqrt(e2)
    d2r = math.pi / 180.0

    def q_of(s):
        # Snyder 3-12 (authalic q), vectorized-safe
        if e == 0.0:
            return 2.0 * s
        return (1.0 - e2) * (
            s / (1.0 - e2 * s * s)
            - (1.0 / (2.0 * e)) * np.log((1.0 - e * s) / (1.0 + e * s))
        )

    phi0 = lat0 * d2r
    qp = float(q_of(np.float64(1.0)))  # q at the pole
    q0 = float(q_of(np.float64(math.sin(phi0))))
    beta0 = math.asin(q0 / qp)  # authalic latitude of origin
    rq = a * math.sqrt(qp / 2.0)  # Snyder 3-13
    s0 = math.sin(phi0)
    m0 = math.cos(phi0) / math.sqrt(1.0 - e2 * s0 * s0)  # Snyder 14-15
    d = a * m0 / (rq * math.cos(beta0))  # Snyder 24-20
    sb0, cb0 = math.sin(beta0), math.cos(beta0)

    def inverse(x, y):
        x = np.asarray(x, dtype=np.float64) - fe
        y = np.asarray(y, dtype=np.float64) - fn
        rho = np.hypot(x / d, d * y)  # Snyder 24-28
        # rho = 0 is the projection origin: guard the divisions, the
        # sin/cos(ce) terms then reproduce (lat0, lon0) exactly
        safe = np.where(rho == 0.0, 1.0, rho)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
        sce, cce = np.sin(ce), np.cos(ce)
        q = qp * (cce * sb0 + d * y * sce * cb0 / safe)  # Snyder 24-27
        lam = np.arctan2(  # Snyder 24-26
            x * sce, d * safe * cb0 * cce - d * d * y * sb0 * sce
        )
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))  # spherical start
        if e > 0.0:
            for _ in range(6):  # Snyder 3-16
                s = np.sin(phi)
                phi = phi + (
                    (1.0 - e2 * s * s) ** 2 / (2.0 * np.cos(phi))
                ) * (
                    q / (1.0 - e2)
                    - s / (1.0 - e2 * s * s)
                    + (1.0 / (2.0 * e))
                    * np.log((1.0 - e * s) / (1.0 + e * s))
                )
        phi = np.where(rho == 0.0, phi0, phi)
        lam = np.where(rho == 0.0, 0.0, lam)
        lon = np.mod(lon0 + lam / d2r + 180.0, 360.0) - 180.0
        return lon, phi / d2r

    return inverse


def _eqc_inverse(a, e2, lat_ts, lon0, fe=0.0, fn=0.0):
    """Ellipsoidal Equidistant Cylindrical (Equirectangular / Plate
    Carrée) inverse, EPSG method 1028: ``x = FE + nu1*cos(lat_ts)*
    (lam-lam0)``, ``y = FN + M(phi)`` — latitude from the rectifying
    series (Snyder 3-26, the ``_sinusoidal_inverse`` machinery),
    longitude by dividing out the standard-parallel scale."""
    d2r = math.pi / 180.0
    phi1 = lat_ts * d2r
    s1 = math.sin(phi1)
    nu1_cos = a * math.cos(phi1) / math.sqrt(1.0 - e2 * s1 * s1)
    sqrt1e = math.sqrt(1.0 - e2)
    e1 = (1.0 - sqrt1e) / (1.0 + sqrt1e)  # Snyder 3-24
    rect = a * (
        1.0 - e2 / 4.0 - 3.0 * e2 * e2 / 64.0 - 5.0 * e2 ** 3 / 256.0
    )

    def inverse(x, y):
        x = np.asarray(x, dtype=np.float64) - fe
        y = np.asarray(y, dtype=np.float64) - fn
        mu = y / rect  # Snyder 7-19
        phi = (  # Snyder 3-26
            mu
            + (3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0) * np.sin(2.0 * mu)
            + (21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0)
            * np.sin(4.0 * mu)
            + (151.0 * e1 ** 3 / 96.0) * np.sin(6.0 * mu)
            + (1097.0 * e1 ** 4 / 512.0) * np.sin(8.0 * mu)
        )
        return lon0 + (x / nu1_cos) / d2r, phi / d2r

    return inverse


# ---------------------------------------------------------------------------
# .dbf — dBase III attribute table
# ---------------------------------------------------------------------------


def read_dbf(buf: bytes, encoding: str = "latin-1") -> list[dict[str, str]]:
    """All records as {field: string-or-None} dicts, positionally
    aligned with .shp records (deleted-flag rows are kept to preserve
    the pairing; their fields parse normally).

    Values are canonical strings: C stripped, N/F rendered by Python
    ``int``/``float`` (so "001.50" → "1.5"), L → "True"/"False",
    D kept as the raw YYYYMMDD digits.  Empty fields → None.
    """
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\x00", 1)[0].decode("ascii")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fdec = buf[off + 17]
        fields.append((name, ftype, flen, fdec))
        off += 32
    rows = []
    pos = hdr_size
    for _ in range(n_rec):
        rec = buf[pos : pos + rec_size]
        pos += rec_size
        if len(rec) < rec_size:
            break
        row: dict[str, str | None] = {}
        foff = 1  # skip deletion flag
        for name, ftype, flen, _fdec in fields:
            raw = rec[foff : foff + flen]
            foff += flen
            txt = raw.decode(encoding, errors="replace").strip()
            if not txt or txt == "*" * len(txt):
                row[name] = None
            elif ftype in ("N", "F"):
                try:
                    row[name] = (
                        str(int(txt))
                        if ("." not in txt and "e" not in txt.lower())
                        else str(float(txt))
                    )
                except ValueError:
                    row[name] = txt
            elif ftype == "L":
                row[name] = (
                    "True" if txt in "YyTt" else
                    "False" if txt in "NnFf" else None
                )
            else:
                row[name] = txt
        rows.append(row)
    return rows


# ---------------------------------------------------------------------------
# .shp — geometry records
# ---------------------------------------------------------------------------

#: shape-type code → base 2D kind (Z/M variants share record layout
#: with extra coordinate blocks AFTER the XY section, so XY parsing is
#: identical)
_KIND = {
    0: "null",
    1: "point", 11: "point", 21: "point",
    3: "polyline", 13: "polyline", 23: "polyline",
    5: "polygon", 15: "polygon", 25: "polygon",
    8: "multipoint", 18: "multipoint", 28: "multipoint",
}


def read_shp(buf: bytes) -> list[tuple[str, list[np.ndarray]]]:
    """.shp bytes → [(kind, [part arrays of shape (n, 2)])] per record.

    Null shapes yield ("null", []).  Points yield one (1, 2) part.
    Parsing is sequential over records (variable length) but each
    part's coordinates decode as one numpy frombuffer view — no
    per-vertex Python.
    """
    (file_len_16,) = struct.unpack_from(">i", buf, 24)
    end = min(len(buf), file_len_16 * 2)
    out = []
    pos = 100
    while pos + 8 <= end:
        (_recno, content_len) = struct.unpack_from(">ii", buf, pos)
        pos += 8
        rec_end = pos + content_len * 2
        (stype,) = struct.unpack_from("<i", buf, pos)
        kind = _KIND.get(stype)
        if kind is None:
            raise ValueError(f"unsupported shape type {stype}")
        if kind == "null":
            out.append(("null", []))
        elif kind == "point":
            x, y = struct.unpack_from("<2d", buf, pos + 4)
            out.append(("point", [np.array([[x, y]])]))
        elif kind == "multipoint":
            (n_pts,) = struct.unpack_from("<i", buf, pos + 36)
            pts = np.frombuffer(
                buf, dtype="<f8", count=n_pts * 2, offset=pos + 40
            ).reshape(-1, 2)
            out.append(("multipoint", [pts.copy()]))
        else:  # polyline / polygon
            n_parts, n_pts = struct.unpack_from("<2i", buf, pos + 36)
            parts_idx = np.frombuffer(
                buf, dtype="<i4", count=n_parts, offset=pos + 44
            )
            pts = np.frombuffer(
                buf, dtype="<f8", count=n_pts * 2, offset=pos + 44 + 4 * n_parts
            ).reshape(-1, 2)
            bounds = np.append(parts_idx, n_pts)
            parts = [
                pts[bounds[i] : bounds[i + 1]].copy()
                for i in range(n_parts)
            ]
            out.append((kind, parts))
        pos = rec_end
    return out


def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(
        np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    )


def _point_in_ring(pt: np.ndarray, ring: np.ndarray) -> bool:
    """Even-odd rule; used only to attach holes to outer rings."""
    x, y = pt
    xs, ys = ring[:, 0], ring[:, 1]
    xj, yj = np.roll(xs, 1), np.roll(ys, 1)
    cross = (ys > y) != (yj > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = xj + (y - yj) / (ys - yj) * (xs - xj)
    return bool(np.count_nonzero(cross & (x < xint)) % 2)


def polygon_geojson(parts: list[np.ndarray]) -> dict:
    """Shapefile polygon rings → GeoJSON Polygon/MultiPolygon.

    Shapefile outer rings wind clockwise (negative shoelace area in
    XY), holes counter-clockwise; vertex order is preserved.  Holes
    attach to the outer ring containing their first vertex (bbox
    pre-filter, even-odd point test) — matching GDAL's organization of
    multi-ring records.
    """
    outers: list[list[np.ndarray]] = []
    holes: list[np.ndarray] = []
    for ring in parts:
        if _ring_signed_area(ring) <= 0:
            outers.append([ring])
        else:
            holes.append(ring)
    if not outers:  # degenerate: treat every ring as an outer shell
        outers = [[r] for r in holes]
        holes = []
    for hole in holes:
        placed = False
        pt = hole[0]
        for shells in outers:
            shell = shells[0]
            if (
                shell[:, 0].min() <= pt[0] <= shell[:, 0].max()
                and shell[:, 1].min() <= pt[1] <= shell[:, 1].max()
                and _point_in_ring(pt, shell)
            ):
                shells.append(hole)
                placed = True
                break
        if not placed:
            outers[0].append(hole)
    polys = [
        [[[float(x), float(y)] for x, y in ring] for ring in shells]
        for shells in outers
    ]
    if len(polys) == 1:
        return {"type": "Polygon", "coordinates": polys[0]}
    return {"type": "MultiPolygon", "coordinates": polys}


def shape_geojson(kind: str, parts: list[np.ndarray]) -> dict | None:
    if kind == "null" or not parts:
        return None
    if kind == "point":
        x, y = parts[0][0]
        return {"type": "Point", "coordinates": [float(x), float(y)]}
    if kind == "multipoint":
        return {
            "type": "MultiPoint",
            "coordinates": [[float(x), float(y)] for x, y in parts[0]],
        }
    if kind == "polyline":
        lines = [[[float(x), float(y)] for x, y in p] for p in parts]
        if len(lines) == 1:
            return {"type": "LineString", "coordinates": lines[0]}
        return {"type": "MultiLineString", "coordinates": lines}
    return polygon_geojson(parts)
