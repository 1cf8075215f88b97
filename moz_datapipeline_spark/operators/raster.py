"""Raster zonal statistics (S11) — flood depth extraction per way.

Reference: scripts/imgstats/img-stats.py — rasterstats ``zonal_stats``
(count/mean/min/max) of flood GeoTIFFs under each way geometry, with
``percent_flooded = count/total_count*100`` and per-raster CRS
reprojection.

Architecture here: a ``mapInPandas`` kernel over the ways table; each
task opens the (broadcast-pathed) rasters with rasterio and emits the
long table (way_id, return_period, max_depth_m, pct_flooded). rasterio
is NOT installed in this container, so the decode is stubbed behind
``RasterUnavailable`` and a deterministic fake sampler keeps the
plumbing (schema, batching, partitioning) real and tested — swap
``_sample`` for a rasterio window read in deployment.
"""

from __future__ import annotations

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


def _sample(way_id: str, period: int, use_real: bool) -> tuple[float, float]:
    if use_real:
        raise RasterUnavailable("rasterio is not installed in this environment")
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


def zonal_flood_stats(
    ways: DataFrame,
    way_id: str = "NAME",
    use_real_backend: bool = False,
) -> DataFrame:
    """ways → long flood-stats table via a mapInPandas raster kernel.

    Partitioning note: each task handles a batch of way geometries and
    reads raster windows for just their bboxes — at 100 TB of ways the
    rasters are side inputs (~GBs), mounted or cached per executor, so
    the scan parallelism follows the ways table, not the rasters.
    """
    ids = ways.select(way_id)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for w in pdf[way_id]:
                for p in RETURN_PERIODS:
                    depth, pct = _sample(str(w), p, use_real_backend)
                    out.append((str(w), p, depth, pct))
            yield pd.DataFrame(
                out, columns=["way_id", "return_period", "max_depth_m", "pct_flooded"]
            )

    return ids.mapInPandas(kernel, schema=OUT_SCHEMA)
