"""Geometry math as pure Column expressions.

The reference uses turf.js geometry (spherical earth, R=6371008.8 m).
We keep geometries as plain coordinate columns/arrays (lon/lat doubles,
or array<struct<lon,lat>> for linestrings) instead of an opaque binary
type, so all measures stay inside Catalyst codegen:

- ``haversine_km``            — great-circle distance (turf-compatible
                                radius), cf. @turf/length used at
                                scripts/additional-props/additional-props.js:57-60
- ``linestring_length_km``    — sum of haversine over consecutive vertices
                                via the ``aggregate`` HOF (no UDF).
- ``point_to_segment_distance`` — planar point→segment distance used for
                                bridge snapping (scripts/prep-bridge/
                                prep-bridge.js:86-112). Planar is exact
                                enough at snapping scale; a spherical
                                variant can be swapped in without
                                changing the operator.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: turf.js earth radius (mean radius, meters)
EARTH_RADIUS_KM = 6371.0088


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def haversine_km(
    lon1: Column | str, lat1: Column | str, lon2: Column | str, lat2: Column | str
) -> Column:
    """Great-circle distance in km between two lon/lat points (degrees)."""
    lo1, la1, lo2, la2 = map(_c, (lon1, lat1, lon2, lat2))
    dlat = F.radians(la2 - la1)
    dlon = F.radians(lo2 - lo1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(la1)) * F.cos(F.radians(la2)) * F.pow(F.sin(dlon / 2), 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def linestring_length_km(coords: Column | str) -> Column:
    """Length (km) of an array<struct<lon:double,lat:double>> linestring.

    Uses zip_with over the array and its tail — stays JVM-side; at 100 TB
    this is a narrow map over the geometry column, no shuffle.
    """
    c = _c(coords)
    tail = F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0)))
    head = F.slice(c, 1, F.greatest(F.size(c) - 1, F.lit(0)))
    segs = F.zip_with(
        head,
        tail,
        lambda a, b: F.lit(2.0 * EARTH_RADIUS_KM)
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(b["lat"] - a["lat"]) / 2), 2)
                + F.cos(F.radians(a["lat"]))
                * F.cos(F.radians(b["lat"]))
                * F.pow(F.sin(F.radians(b["lon"] - a["lon"]) / 2), 2)
            )
        ),
    )
    return F.aggregate(segs, F.lit(0.0), lambda acc, x: acc + x)


def point_to_segment_distance(
    px: Column | str,
    py: Column | str,
    ax: Column | str,
    ay: Column | str,
    bx: Column | str,
    by: Column | str,
) -> Column:
    """Planar distance from point P to segment AB (same units as inputs).

    Pure column math (projection parameter t clamped to [0,1]) so the
    bridge-snap join needs no Python UDF.
    """
    pxc, pyc, axc, ayc, bxc, byc = map(_c, (px, py, ax, ay, bx, by))
    dx, dy = bxc - axc, byc - ayc
    len2 = dx * dx + dy * dy
    t_raw = F.when(len2 > 0, ((pxc - axc) * dx + (pyc - ayc) * dy) / len2).otherwise(
        F.lit(0.0)
    )
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    cx = axc + t * dx
    cy = ayc + t * dy
    return F.sqrt(F.pow(pxc - cx, 2) + F.pow(pyc - cy, 2))


def _ring_moments(xs: Column, ys: Column) -> Column:
    """Shoelace moments struct<a2,sx,sy> of one ring (open or closed).

    a2 = 2×signed area, sx/sy = 6A-weighted centroid numerators. Pure
    ``aggregate`` HOF over the vertex index — the wrap edge (i = n-1 →
    0) closes open rings and is degenerate (zero cross) on explicitly
    closed ones, so both conventions are accepted.
    """
    n = F.size(xs)

    def step(acc: Column, i: Column) -> Column:
        x0 = F.element_at(xs, i + 1)
        y0 = F.element_at(ys, i + 1)
        x1 = F.element_at(xs, (i + 1) % n + 1)
        y1 = F.element_at(ys, (i + 1) % n + 1)
        cr = x0 * y1 - x1 * y0
        return F.struct(
            (acc["a2"] + cr).alias("a2"),
            (acc["sx"] + (x0 + x1) * cr).alias("sx"),
            (acc["sy"] + (y0 + y1) * cr).alias("sy"),
        )

    return F.aggregate(
        F.sequence(F.lit(0), n - 1),
        F.struct(
            F.lit(0.0).alias("a2"), F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy")
        ),
        step,
    )


def polygon_moments(rings_x: Column | str, rings_y: Column | str) -> Column:
    """Shoelace moments summed over all rings of a (multi)polygon.

    ``rings_x``/``rings_y`` are array<array<double>>. Exterior rings
    wound CCW and holes CW contribute with opposite signs, so area and
    centroid come out exact for polygons with holes and multi-parts.
    Used by the dissolve/centroid path of preparation
    (scripts/preparation.sh:149-151,193-195).
    """
    rx, ry = _c(rings_x), _c(rings_y)

    def step(acc: Column, k: Column) -> Column:
        m = _ring_moments(F.element_at(rx, k + 1), F.element_at(ry, k + 1))
        return F.struct(
            (acc["a2"] + m["a2"]).alias("a2"),
            (acc["sx"] + m["sx"]).alias("sx"),
            (acc["sy"] + m["sy"]).alias("sy"),
        )

    return F.aggregate(
        F.sequence(F.lit(0), F.size(rx) - 1),
        F.struct(
            F.lit(0.0).alias("a2"), F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy")
        ),
        step,
    )


def polygon_area(rings_x: Column | str, rings_y: Column | str) -> Column:
    """Signed planar area (CCW positive, holes subtract)."""
    return polygon_moments(rings_x, rings_y)["a2"] / 2.0


def polygon_centroid(rings_x: Column | str, rings_y: Column | str) -> Column:
    """Area-weighted centroid struct<cx,cy> (district centroids,
    scripts/preparation.sh:193-195). Undefined for zero-area input."""
    m = polygon_moments(rings_x, rings_y)
    return F.struct(
        (m["sx"] / (m["a2"] * 3.0)).alias("cx"),
        (m["sy"] / (m["a2"] * 3.0)).alias("cy"),
    )


def polygon_perimeter(rings_x: Column | str, rings_y: Column | str) -> Column:
    """Total planar boundary length over all rings (open or closed)."""
    rx, ry = _c(rings_x), _c(rings_y)

    def ring_len(xs: Column, ys: Column) -> Column:
        n = F.size(xs)

        def step(acc: Column, i: Column) -> Column:
            dx = F.element_at(xs, (i + 1) % n + 1) - F.element_at(xs, i + 1)
            dy = F.element_at(ys, (i + 1) % n + 1) - F.element_at(ys, i + 1)
            return acc + F.sqrt(dx * dx + dy * dy)

        return F.aggregate(F.sequence(F.lit(0), n - 1), F.lit(0.0), step)

    def outer(acc: Column, k: Column) -> Column:
        return acc + ring_len(F.element_at(rx, k + 1), F.element_at(ry, k + 1))

    return F.aggregate(
        F.sequence(F.lit(0), F.size(rx) - 1), F.lit(0.0), outer
    )


def bbox(coords: Column | str) -> Column:
    """Bounding box struct<minx,miny,maxx,maxy> of a linestring coord array.

    Drives the bbox-prefilter spatial join (reference R-tree,
    scripts/utils/utils.js:83-98) as plain range predicates Catalyst can
    push and AQE can skew-split.
    """
    c = _c(coords)
    return F.struct(
        F.array_min(F.transform(c, lambda p: p["lon"])).alias("minx"),
        F.array_min(F.transform(c, lambda p: p["lat"])).alias("miny"),
        F.array_max(F.transform(c, lambda p: p["lon"])).alias("maxx"),
        F.array_max(F.transform(c, lambda p: p["lat"])).alias("maxy"),
    )
