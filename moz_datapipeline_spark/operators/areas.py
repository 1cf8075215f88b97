"""Area-based indicators: spatial join + length-weighted average.

Reference: scripts/indicator-from-areas/indicator-from-areas.js.

J9 — the reference prefilters way×polygon pairs with an R-tree on
bboxes (scripts/utils/utils.js:83-98) then runs exact geometry tests.
Here the bbox prefilter is a plain range-predicate join (Catalyst
pushes, AQE skew-splits, the polygon side broadcasts when small); the
exact weighting runs only on surviving pairs.

A5 — per way: weight = overlap_length × indicator / way_length, summed
over intersecting polygons (indicator-from-areas.js:91-127). The
reference approximates membership by splitting the line and testing the
midpoint of the first segment of each piece; with axis-aligned cells we
compute the clipped length exactly in column space. For arbitrary
polygons the same operator accepts a pandas-UDF weighting kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bbox_join(
    ways: DataFrame,
    polygons: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Candidate pairs by bbox overlap.

    ``ways`` needs (minx, miny, maxx, maxy); ``polygons`` needs
    (pminx, pminy, pmaxx, pmaxy). Broadcasts the polygon side —
    boundary/zone tables are small relative to the network.
    """
    cond = (
        (F.col("minx") <= F.col("pmaxx"))
        & (F.col("maxx") >= F.col("pminx"))
        & (F.col("miny") <= F.col("pmaxy"))
        & (F.col("maxy") >= F.col("pminy"))
    )
    return ways.join(F.broadcast(polygons), cond, how)


def length_weighted_indicator(
    pairs: DataFrame,
    way_id: str = "way_id",
    overlap_len: str = "overlap_len",
    way_len: str = "way_len",
    indicator: str = "indicator",
) -> DataFrame:
    """A5 fold: sum(overlap·ind)/way_len per way → indicator contract rows.

    One groupBy(way_id) shuffle; zero-value polygons should be filtered
    upstream (reference prunes ind<=0, utils.js:86).
    """
    return (
        pairs.groupBy(F.col(way_id).alias("way_id"))
        .agg(
            (
                F.sum(F.col(overlap_len) * F.col(indicator)) / F.first(way_len)
            ).alias("value")
        )
    )


def clipped_segment_length(
    ax, ay, bx, by, cminx, cminy, cmaxx, cmaxy
):
    """Length of segment (a,b) clipped to an axis-aligned cell.

    Liang–Barsky in pure column expressions — exact for rectangular
    zones, fully codegen'd (no UDF). Returns a Column (same units as
    the coordinates).
    """
    ax, ay, bx, by = map(F.col, (ax, ay, bx, by)) if isinstance(ax, str) else (ax, ay, bx, by)
    dx = bx - ax
    dy = by - ay

    def axis_range(p0, d, lo, hi):
        # entering/leaving parameters for one axis (d==0 → full range if inside)
        t0 = F.when(d != 0, (lo - p0) / d).otherwise(F.lit(float("-inf")))
        t1 = F.when(d != 0, (hi - p0) / d).otherwise(F.lit(float("inf")))
        return F.least(t0, t1), F.greatest(t0, t1)

    tx0, tx1 = axis_range(ax, dx, F.col(cminx) if isinstance(cminx, str) else cminx,
                          F.col(cmaxx) if isinstance(cmaxx, str) else cmaxx)
    ty0, ty1 = axis_range(ay, dy, F.col(cminy) if isinstance(cminy, str) else cminy,
                          F.col(cmaxy) if isinstance(cmaxy, str) else cmaxy)
    t_in = F.greatest(tx0, ty0, F.lit(0.0))
    t_out = F.least(tx1, ty1, F.lit(1.0))
    frac = F.greatest(t_out - t_in, F.lit(0.0))
    seg_len = F.sqrt(dx * dx + dy * dy)
    # degenerate axis: if dx==0 require minx<=ax<=maxx (same for y)
    ok_x = (dx != 0) | (
        (ax >= (F.col(cminx) if isinstance(cminx, str) else cminx))
        & (ax <= (F.col(cmaxx) if isinstance(cmaxx, str) else cmaxx))
    )
    ok_y = (dy != 0) | (
        (ay >= (F.col(cminy) if isinstance(cminy, str) else cminy))
        & (ay <= (F.col(cmaxy) if isinstance(cmaxy, str) else cmaxy))
    )
    return F.when(ok_x & ok_y, seg_len * frac).otherwise(F.lit(0.0))


def _polygon_clip_lengths(ax, ay, bx, by, rings_x, rings_y):
    """Length of each planar segment (a,b) inside an arbitrary polygon.

    numpy-vectorized across segments (the per-polygon batch): collect the
    parametric crossings of every polygon edge, sort them into an
    interval grid on [0,1], test each interval MIDPOINT with even-odd
    ray casting, and sum the inside fractions — exactly the reference's
    lineSplit + midpoint-membership rule
    (scripts/indicator-from-areas/indicator-from-areas.js:91-127)
    applied per 2-vertex segment instead of per way, which yields the
    same totals for simple polygons while staying data-parallel.

    ``rings_x``/``rings_y`` are lists of rings (exterior + holes and/or
    multipolygon parts); even-odd parity across all rings handles holes
    with no extra logic. Rings may be open (first != last) — they are
    closed implicitly.
    """
    import numpy as np

    n = ax.shape[0]
    dx, dy = bx - ax, by - ay
    seg_len = np.sqrt(dx * dx + dy * dy)

    edges = []
    for rx, ry in zip(rings_x, rings_y):
        rx, ry = np.asarray(rx, dtype=np.float64), np.asarray(ry, dtype=np.float64)
        if len(rx) < 3:
            continue
        if rx[0] != rx[-1] or ry[0] != ry[-1]:
            rx, ry = np.append(rx, rx[0]), np.append(ry, ry[0])
        for j in range(len(rx) - 1):
            edges.append((rx[j], ry[j], rx[j + 1], ry[j + 1]))
    if not edges:
        return np.zeros(n)

    # crossing parameter t of each edge on each segment (invalid → 1.0:
    # a degenerate zero-length interval that adds nothing)
    ts = np.full((n, len(edges)), 1.0)
    for j, (x1, y1, x2, y2) in enumerate(edges):
        ex_, ey_ = x2 - x1, y2 - y1
        denom = dx * ey_ - dy * ex_
        wx, wy = x1 - ax, y1 - ay
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (wx * ey_ - wy * ex_) / denom
            u = (wx * dy - wy * dx) / denom
        valid = (denom != 0) & (t > 0) & (t < 1) & (u >= 0) & (u <= 1)
        ts[:, j] = np.where(valid, t, 1.0)

    grid = np.concatenate(
        [np.zeros((n, 1)), np.sort(ts, axis=1), np.ones((n, 1))], axis=1
    )
    mids = (grid[:, :-1] + grid[:, 1:]) / 2.0
    fracs = grid[:, 1:] - grid[:, :-1]
    mx = ax[:, None] + mids * dx[:, None]
    my = ay[:, None] + mids * dy[:, None]

    inside = np.zeros(mx.shape, dtype=bool)
    for x1, y1, x2, y2 in edges:
        if y1 == y2:
            continue
        cross = ((y1 > my) != (y2 > my)) & (
            mx < (x2 - x1) * (my - y1) / (y2 - y1) + x1
        )
        inside ^= cross
    return np.sum(np.where(inside, fracs, 0.0), axis=1) * seg_len


# Driver-side ring broadcast caps: admin/zone polygon sides are a few
# thousand rows; these bounds are ~100x that with room for dense rings,
# and turn the silent driver OOM of an oversized side into a clear error.
MAX_BROADCAST_POLYGONS = 500_000
MAX_BROADCAST_RING_BYTES = 256 * 1024 * 1024


def _grid_cells(
    minx, miny, maxx, maxy, cell_size: float, max_cells: int | None = None
):
    """All (cx, cy) grid cells a bbox overlaps, as an exploded-ready
    array<struct<cx,cy>> column (pure codegen).

    ``max_cells`` bounds the per-row explosion IN the plan (no extra
    job): a bbox spanning more than ``max_cells`` grid cells raises a
    clear sizing error naming the offending extent instead of letting
    ``F.sequence`` blow up mid-job with an opaque 'too many elements'
    — the fix is always a larger ``cell_size``."""
    cs = F.lit(float(cell_size))
    x0 = F.floor(minx / cs).cast("long")
    x1 = F.floor(maxx / cs).cast("long")
    y0 = F.floor(miny / cs).cast("long")
    y1 = F.floor(maxy / cs).cast("long")
    cells = F.flatten(
        F.transform(
            F.sequence(x0, x1),
            lambda cx: F.transform(
                F.sequence(y0, y1),
                lambda cy: F.struct(cx.alias("cx"), cy.alias("cy")),
            ),
        )
    )
    if max_cells is None:
        return cells
    n = (x1 - x0 + 1) * (y1 - y0 + 1)
    return F.when(
        n > F.lit(int(max_cells)),
        F.raise_error(
            F.concat(
                F.lit(
                    "polygon_clipped_pairs: a bbox spans "
                ),
                n.cast("string"),
                F.lit(
                    f" grid cells (> max_cells_per_bbox={int(max_cells)}) "
                    f"at cell_size={float(cell_size)}; increase cell_size "
                    "(or max_cells_per_bbox) so each bbox explodes to "
                    "O(1) cells"
                ),
            )
        ),
    ).otherwise(cells)


def polygon_clipped_pairs(
    way_segments: DataFrame,
    polygons: DataFrame,
    indicator: str = "indicator",
    rings_through_rows: bool = False,
    cell_size: float = 0.5,
    max_cells_per_bbox: int = 4096,
) -> DataFrame:
    """Candidate pairs with exact inside-length for ARBITRARY polygons.

    ``way_segments``: (way_id, ax, ay, bx, by, way_len) exploded 2-vertex
    pieces. ``polygons``: (area_id, rings_x array<array<double>>,
    rings_y, indicator) — exterior ring plus optional holes/parts.

    Plan: polygon bboxes derived from the rings, bbox join (polygon side
    broadcast — admin/zone tables are small), then an Arrow-batched
    numpy kernel (`mapInPandas`) computes the clipped length per pair,
    vectorized across all segments of each polygon in the batch.

    The rings themselves NEVER ride the join rows: only ``area_id``
    does, and the kernel resolves ``area_id → rings`` from an
    ``sc.broadcast`` dict (torrent-distributed once per executor).
    Candidate-pair width is therefore O(1) per row instead of
    O(vertices) — a 10k-vertex district overlapping 5k segments would
    otherwise ship 50M ring floats through the Arrow batches.

    ``rings_through_rows=True`` is the corpus-scale fallback for
    polygon sides ABOVE the broadcast caps: no driver collect, no
    broadcast at all.  Both sides explode onto a ``cell_size`` grid
    (each bbox → the cells it overlaps), pairs form by an EQUI join on
    the cell id (a plain hash shuffle — AQE-skew-splittable, never a
    nested-loop), a canonical-cell predicate (the cell holding the
    bbox-intersection's min corner) keeps each pair exactly once with
    no distinct, and the rings ride the polygon rows into the kernel.
    Same output, different physical plan; pick ``cell_size`` near the
    median polygon bbox edge so each bbox explodes to O(1) cells.
    """
    from pyspark.sql.types import StructField, StructType, DoubleType
    import numpy as np

    segs = (
        way_segments.withColumn("minx", F.least("ax", "bx"))
        .withColumn("maxx", F.greatest("ax", "bx"))
        .withColumn("miny", F.least("ay", "by"))
        .withColumn("maxy", F.greatest("ay", "by"))
    )
    polys = (
        polygons.filter(F.col(indicator) > 0)
        .withColumn("pminx", F.array_min(F.flatten("rings_x")))
        .withColumn("pmaxx", F.array_max(F.flatten("rings_x")))
        .withColumn("pminy", F.array_min(F.flatten("rings_y")))
        .withColumn("pmaxy", F.array_max(F.flatten("rings_y")))
    )
    if rings_through_rows:
        cs = F.lit(float(cell_size))
        seg_cells = segs.withColumn(
            "_cell",
            F.explode(
                _grid_cells(
                    F.col("minx"), F.col("miny"),
                    F.col("maxx"), F.col("maxy"), cell_size,
                    max_cells_per_bbox,
                )
            ),
        )
        poly_cells = polys.withColumn(
            "_cell",
            F.explode(
                _grid_cells(
                    F.col("pminx"), F.col("pminy"),
                    F.col("pmaxx"), F.col("pmaxy"), cell_size,
                    max_cells_per_bbox,
                )
            ),
        )
        overlap_bbox = (
            (F.col("minx") <= F.col("pmaxx"))
            & (F.col("maxx") >= F.col("pminx"))
            & (F.col("miny") <= F.col("pmaxy"))
            & (F.col("maxy") >= F.col("pminy"))
        )
        # a pair overlaps in possibly many cells; report it only in the
        # cell holding the bbox-intersection's min corner (both sides
        # provably generated that cell) — exactly-once with no distinct
        canonical = (
            F.col("_cell.cx")
            == F.floor(F.greatest("minx", "pminx") / cs).cast("long")
        ) & (
            F.col("_cell.cy")
            == F.floor(F.greatest("miny", "pminy") / cs).cast("long")
        )
        pairs = (
            seg_cells.join(poly_cells, ["_cell"])
            .filter(overlap_bbox & canonical)
            .drop(
                "_cell", "minx", "maxx", "miny", "maxy",
                "pminx", "pmaxx", "pminy", "pmaxy",
            )
        )
        out_schema = StructType(
            [
                f
                for f in pairs.schema.fields
                if f.name not in ("rings_x", "rings_y")
            ]
            + [StructField("overlap_len", DoubleType())]
        )
        out_cols = [f.name for f in out_schema.fields]

        def kernel_rows(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.assign(overlap_len=0.0)[out_cols]
                    continue
                overlap = np.zeros(len(pdf))
                grouped = pdf.groupby("area_id", sort=False).indices
                for _area_id, ilocs in grouped.items():
                    rows = pdf.iloc[ilocs]
                    overlap[ilocs] = _polygon_clip_lengths(
                        rows["ax"].to_numpy(np.float64),
                        rows["ay"].to_numpy(np.float64),
                        rows["bx"].to_numpy(np.float64),
                        rows["by"].to_numpy(np.float64),
                        rows["rings_x"].iloc[0],
                        rows["rings_y"].iloc[0],
                    )
                yield pdf.assign(overlap_len=overlap)[out_cols]

        return pairs.mapInPandas(kernel_rows, out_schema)
    # Ring geometry goes to executors once via sc.broadcast; the join
    # side keeps only area_id + bbox + indicator (narrow rows).  Guard
    # the driver collect first: one tiny agg over the (small) polygon
    # side bounds both row count and estimated ring bytes BEFORE any
    # rings reach the driver, so an oversized side fails loudly instead
    # of OOMing the driver mid-collect.
    stats = polys.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.flatten("rings_x"))).alias("verts"),
    ).collect()[0]
    est_bytes = (stats["verts"] or 0) * 16  # x + y doubles per vertex
    if stats["n"] > MAX_BROADCAST_POLYGONS or est_bytes > MAX_BROADCAST_RING_BYTES:
        raise ValueError(
            f"polygon side too large to broadcast rings to the driver: "
            f"{stats['n']} polygons, ~{est_bytes >> 20} MiB of ring "
            f"vertices (caps: {MAX_BROADCAST_POLYGONS} rows, "
            f"{MAX_BROADCAST_RING_BYTES >> 20} MiB). Pass "
            "rings_through_rows=True for the no-broadcast grid-join "
            "plan, or pre-aggregate/tile the polygon side"
        )
    rings_map = {
        r["area_id"]: (
            [list(x) for x in r["rings_x"]],
            [list(y) for y in r["rings_y"]],
        )
        for r in polys.select("area_id", "rings_x", "rings_y").collect()
    }
    bcast = way_segments.sparkSession.sparkContext.broadcast(rings_map)

    pairs = bbox_join(segs, polys.drop("rings_x", "rings_y")).drop(
        "minx", "maxx", "miny", "maxy", "pminx", "pmaxx", "pminy", "pmaxy"
    )
    out_schema = StructType(
        list(pairs.schema.fields) + [StructField("overlap_len", DoubleType())]
    )
    out_cols = [f.name for f in out_schema.fields]

    def kernel(batches):
        rings = bcast.value
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(overlap_len=0.0)[out_cols]
                continue
            overlap = np.zeros(len(pdf))
            for area_id, ilocs in pdf.groupby("area_id", sort=False).indices.items():
                rows = pdf.iloc[ilocs]
                rings_x, rings_y = rings[area_id]
                overlap[ilocs] = _polygon_clip_lengths(
                    rows["ax"].to_numpy(np.float64),
                    rows["ay"].to_numpy(np.float64),
                    rows["bx"].to_numpy(np.float64),
                    rows["by"].to_numpy(np.float64),
                    rings_x,
                    rings_y,
                )
            yield pdf.assign(overlap_len=overlap)[out_cols]

    return pairs.mapInPandas(kernel, out_schema)


def indicator_from_polygon_areas(
    way_segments: DataFrame,
    polygons: DataFrame,
    indicator: str = "indicator",
    rings_through_rows: bool = False,
    cell_size: float = 0.5,
    max_cells_per_bbox: int = 4096,
) -> DataFrame:
    """A5 for arbitrary polygons: bbox join → numpy clip kernel → fold.

    Same contract as ``indicator_from_areas`` but zones are true
    polygons, not axis-aligned cells. Route rectangular zones to the
    codegen fast path; everything else comes here.
    ``rings_through_rows=True`` selects the no-broadcast grid-join plan
    for polygon sides above the broadcast caps (see
    ``polygon_clipped_pairs``)."""
    clipped = polygon_clipped_pairs(
        way_segments, polygons, indicator,
        rings_through_rows=rings_through_rows, cell_size=cell_size,
        max_cells_per_bbox=max_cells_per_bbox,
    )
    clipped = clipped.filter(F.col("overlap_len") > 0)
    return clipped.groupBy("way_id").agg(
        (F.sum(F.col("overlap_len") * F.col(indicator)) / F.first("way_len")).alias(
            "value"
        )
    )


def indicator_from_areas(
    way_segments: DataFrame,
    cells: DataFrame,
    indicator: str = "indicator",
) -> DataFrame:
    """End-to-end area indicator for rectangular zones.

    ``way_segments``: (way_id, ax, ay, bx, by, way_len) — exploded
    2-vertex pieces. ``cells``: (pminx, pminy, pmaxx, pmaxy, indicator).
    Plan: bbox join (broadcast) → exact clipped length (codegen) →
    A5 fold. Zero-indicator cells pruned before the join.
    """
    segs = way_segments.withColumn(
        "minx", F.least("ax", "bx")
    ).withColumn("maxx", F.greatest("ax", "bx")).withColumn(
        "miny", F.least("ay", "by")
    ).withColumn("maxy", F.greatest("ay", "by"))
    live_cells = cells.filter(F.col(indicator) > 0)
    pairs = bbox_join(segs, live_cells)
    pairs = pairs.withColumn(
        "overlap_len",
        clipped_segment_length(
            "ax", "ay", "bx", "by", "pminx", "pminy", "pmaxx", "pmaxy"
        ),
    ).filter(F.col("overlap_len") > 0)
    return (
        pairs.groupBy("way_id")
        .agg(
            (F.sum(F.col("overlap_len") * F.col(indicator)) / F.first("way_len")).alias(
                "value"
            )
        )
    )
