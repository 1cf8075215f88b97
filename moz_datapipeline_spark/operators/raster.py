"""Raster zonal statistics (S11) — flood depth extraction per way.

Reference: scripts/imgstats/img-stats.py — rasterstats ``zonal_stats``
(count/mean/min/max) of flood GeoTIFFs under each way geometry, with
``percent_flooded = count/total_count*100`` and per-raster CRS
reprojection (img-stats.py:60-105).

Architecture here: a ``mapInPandas`` kernel over the ways table; each
task opens the (broadcast-pathed) rasters and reads only the window
under each geometry.  Two real backends: rasterio when installed, else
the dependency-free GeoTIFF reader in ``sources.geotiff`` (classic
TIFF, strips/tiles, deflate, WGS84) — so ``use_real_backend=True``
works in this container too.  ``RasterUnavailable`` now only fires for
rasters the pure reader cannot parse when rasterio is also absent.
The deterministic fake sampler remains the default for the oracle
queries (no raster inputs ship with the test data).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from moz_datapipeline_spark.functions.arrays import RETURN_PERIODS


class RasterUnavailable(NotImplementedError):
    """Raised when a real raster backend (rasterio) is requested but absent."""


OUT_SCHEMA = (
    "way_id string, return_period int, max_depth_m double, pct_flooded double"
)

#: real-backend output parity with img-stats.py stats dict
REAL_OUT_SCHEMA = (
    "way_id string, return_period int, count long, mean double, "
    "min double, max double, pct_flooded double"
)


def _have_rasterio() -> bool:
    try:
        import rasterio  # noqa: F401

        return True
    except ImportError:
        return False


def _require_rasterio():
    try:
        import rasterio  # noqa: F401

        return rasterio
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise RasterUnavailable(
            "rasterio is not installed in this environment"
        ) from e


def _sample(way_id: str, period: int) -> tuple[float, float]:
    # deterministic fake: md5-derived depth/pct, monotone in return period
    # (builtin hash() is per-process randomized for strings — never use it
    # for values that must agree across executors)
    import hashlib

    h = int(hashlib.md5(way_id.encode()).hexdigest()[:8], 16) % 1000 / 1000.0
    rank = RETURN_PERIODS.index(period)
    # no rounding: keep the arithmetic bit-identical across engines so the
    # stub is oracle-checkable (python round() is banker's, SQL's isn't)
    depth = h * rank * 0.5
    pct = min(100.0, h * rank * 12.5)
    return depth, pct


def _real_way_stats(
    way_id: str, geom: dict, raster_files: list[tuple[int, str]]
) -> list[dict]:
    """img-stats.py:76-105 semantics for ONE way over all period rasters.

    Per raster: reproject the 4326 geometry into the raster CRS
    (rasterio.warp.transform_geom replaces the reference's pyproj
    recursion), window-read just the geometry's bbox, then replicate
    the reference's three sentinel rules exactly:

    - total denominator = pixels != -1 under the FIRST raster
      (img-stats.py:99, ``nodata=-1``),
    - mean/min/max over pixels != 999 (``nodata=999``, :103),
    - flooded count = pixels != -9999 (``nodata=-9999``, :104),
    - percent_flooded = count/total*100 (:105).
    """
    rasterio = _require_rasterio()
    from rasterio.features import geometry_mask, geometry_window
    from rasterio.warp import transform_geom

    rows: list[dict] = []
    total_count: float | None = None
    for i, (period, path) in enumerate(raster_files):
        with rasterio.open(path) as src:
            g = transform_geom("EPSG:4326", src.crs, geom)
            try:
                win = geometry_window(src, [g])
                arr = src.read(1, window=win).astype("float64")
                inside = geometry_mask(
                    [g],
                    out_shape=arr.shape,
                    transform=src.window_transform(win),
                    invert=True,
                )
                vals = arr[inside]
            except (ValueError, rasterio.errors.WindowError):
                vals = np.array([], dtype="float64")  # no overlap
        if i == 0:
            total_count = float(np.sum(vals != -1.0))
        rows.append(_sentinel_stats(way_id, period, vals, total_count))
    return rows


def _sentinel_stats(
    way_id: str, period: int, vals: np.ndarray, total_count: float | None
) -> dict:
    """img-stats.py:99-105 sentinel rules shared by both real backends."""
    flood = vals[vals != 999.0]
    count = int(np.sum(vals != -9999.0))
    return {
        "way_id": way_id,
        "return_period": period,
        "count": count,
        "mean": float(flood.mean()) if flood.size else float("nan"),
        "min": float(flood.min()) if flood.size else float("nan"),
        "max": float(flood.max()) if flood.size else float("nan"),
        "pct_flooded": (
            count / total_count * 100.0 if total_count else 0.0
        ),
    }


def _pure_way_stats(
    way_id: str, geom: dict, raster_files: list[tuple[int, str]]
) -> list[dict]:
    """``_real_way_stats`` semantics on the dependency-free GeoTIFF
    reader (``sources.geotiff``): WGS84 rasters only — the reader
    refuses projected files, so there is no silent CRS drift relative
    to the rasterio path's transform_geom."""
    from moz_datapipeline_spark.sources.geotiff import GeoTIFF, zonal_values

    rows: list[dict] = []
    total_count: float | None = None
    for i, (period, path) in enumerate(raster_files):
        with open(path, "rb") as fh:
            tif = GeoTIFF(fh.read())
        vals = zonal_values(tif, geom)
        if i == 0:
            total_count = float(np.sum(vals != -1.0))
        rows.append(_sentinel_stats(way_id, period, vals, total_count))
    return rows


def zonal_flood_stats(
    ways: DataFrame,
    way_id: str = "NAME",
    use_real_backend: bool = False,
    geometry_col: str = "geometry",
    raster_paths: dict[int, str] | None = None,
) -> DataFrame:
    """ways → long flood-stats table via a mapInPandas raster kernel.

    With ``use_real_backend=True``, ``geometry_col`` must hold GeoJSON
    geometry strings (EPSG:4326) and ``raster_paths`` maps return
    period → GeoTIFF path (file paths must resolve on executors — a
    shared mount or pre-distributed cache); output schema is
    ``REAL_OUT_SCHEMA`` for parity with the reference's stats dict.
    Backend selection: rasterio when importable, else the pure
    ``sources.geotiff`` reader; in the pure case the first raster is
    opened at plan time so unsupported files fail fast on the driver,
    not per-task.

    Partitioning note: each task handles a batch of way geometries and
    reads raster windows for just their bboxes — at 100 TB of ways the
    rasters are side inputs (~GBs), mounted or cached per executor, so
    the scan parallelism follows the ways table, not the rasters.
    """
    if use_real_backend:
        if raster_paths is None:
            raise ValueError("raster_paths is required with use_real_backend")
        files = sorted(raster_paths.items())
        cols = ways.select(way_id, geometry_col)
        with_rasterio = _have_rasterio()
        if not with_rasterio:
            # fail fast on the driver if the pure reader can't parse the
            # first raster (unsupported compression / projected CRS)
            from moz_datapipeline_spark.sources.geotiff import GeoTIFF

            try:
                with open(files[0][1], "rb") as fh:
                    GeoTIFF(fh.read())
            except NotImplementedError as e:
                raise RasterUnavailable(
                    f"no rasterio and pure GeoTIFF reader refused "
                    f"{files[0][1]}: {e}"
                ) from e

        def kernel_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            stats = _real_way_stats if with_rasterio else _pure_way_stats
            for pdf in batches:
                out: list[dict] = []
                for w, gj in zip(pdf[way_id], pdf[geometry_col]):
                    geom = gj if isinstance(gj, dict) else json.loads(gj)
                    out.extend(stats(str(w), geom, files))
                yield pd.DataFrame(
                    out,
                    columns=[
                        "way_id", "return_period", "count", "mean",
                        "min", "max", "pct_flooded",
                    ],
                )

        return cols.mapInPandas(kernel_real, schema=REAL_OUT_SCHEMA)

    ids = ways.select(way_id)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for w in pdf[way_id]:
                for p in RETURN_PERIODS:
                    depth, pct = _sample(str(w), p)
                    out.append((str(w), p, depth, pct))
            yield pd.DataFrame(
                out, columns=["way_id", "return_period", "max_depth_m", "pct_flooded"]
            )

    return ids.mapInPandas(kernel, schema=OUT_SCHEMA)
