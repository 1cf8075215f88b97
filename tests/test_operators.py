"""Unit tests for operator modules against hand-computed frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_clean_bridges_and_snap(spark):
    from moz_datapipeline_spark.operators.bridges import (
        clean_bridges,
        snap_to_nearest_way,
    )

    bridges = spark.createDataFrame(
        [
            (1, "N000201:0003.2", "CULV", "1,250", 0.0, 0.05),
            (2, "R085012:0001.0", "BRG", "0", 1.0, 1.02),
        ],
        "bridge_id int, Link_ID string, Des_Type string, Over_Length string, lon double, lat double",
    )
    cleaned = clean_bridges(bridges).toPandas().set_index("bridge_id")
    assert cleaned.loc[1, "roadID"] == "N2"
    assert cleaned.loc[1, "type"] == "culvert"
    assert cleaned.loc[1, "length"] == 1250.0
    assert cleaned.loc[2, "roadID"] == "R850"  # R085012 → R + 850 (strip leading 0)
    assert cleaned.loc[2, "type"] == "bridge"
    assert cleaned.loc[2, "length"] == 7.0  # 0 -> default

    segments = spark.createDataFrame(
        [
            ("N2-a", "N2", 0.0, 0.0, 1.0, 0.0),
            ("N2-b", "N2", 0.0, 1.0, 1.0, 1.0),
            ("R850-a", "R850", 0.0, 1.0, 2.0, 1.0),
        ],
        "NAME string, ROAD_ID string, ax double, ay double, bx double, by double",
    )
    snapped = snap_to_nearest_way(clean_bridges(bridges), segments).toPandas()
    by_bridge = snapped.set_index("bridge_id")["roadSegmentID"]
    assert by_bridge[1] == "N2-a"  # y=0.05 nearer the y=0 segment
    assert by_bridge[2] == "R850-a"


def test_traffic_unpivot_and_fold(spark):
    from moz_datapipeline_spark.operators.traffic import (
        od_pairs,
        pair_reverse_fold,
        unpivot_matrix,
    )

    wide = spark.createDataFrame(
        [(1, 0, 5, 7), (2, 3, 0, 0), (3, 9, 2, 0)],
        "`from` int, `1` int, `2` int, `3` int",
    )
    long = unpivot_matrix(wide).toPandas()
    assert len(long) == 9
    lookup = {(r.origin, r.destination): r.dailyODCount for r in long.itertuples()}
    assert lookup[(1, 2)] == 5 and lookup[(2, 1)] == 3

    folded = pair_reverse_fold(unpivot_matrix(wide)).toPandas()
    fk = {(r.origin, r.destination): (r.dailyODCount, r.reverseODCount)
          for r in folded.itertuples()}
    assert fk[(1, 2)] == (5, 3)
    assert fk[(1, 3)] == (7, 9)
    assert fk[(2, 3)] == (0, 2)
    assert len(folded) == 3  # no self pairs, upper triangle only

    pts = spark.createDataFrame([(i,) for i in range(5)], "INDEX_OD int")
    assert od_pairs(pts).count() == 10  # 5*4/2


def test_percentile_filter_exact(spark):
    from moz_datapipeline_spark.operators.indicators import percentile_filter

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "id int, v double"
    )
    # p80 over n=10: rank = round(0.8*9) = 7 → threshold = sorted[7] = 8.0
    kept = percentile_filter(df, "v", 80.0).toPandas()
    assert sorted(kept["v"]) == [8.0, 9.0, 10.0]


def test_normalize_indicator(spark):
    from moz_datapipeline_spark.operators.indicators import normalize_indicator

    df = spark.createDataFrame(
        [("a", 5.0), ("b", 10.0), ("c", None)], "id string, v double"
    )
    out = normalize_indicator(df, "v", id_col="id").toPandas().set_index("way_id")
    assert out.loc["a", "score"] == pytest.approx(50.0)
    assert out.loc["b", "score"] == pytest.approx(100.0)
    assert "c" not in out.index


def test_ead_trapezoid(spark):
    from moz_datapipeline_spark.functions.arrays import RETURN_PERIODS
    from moz_datapipeline_spark.operators.vulnerability import ead

    rows = [("w1", p, 0.0) for p in RETURN_PERIODS[:8]] + [
        ("w1", 500, 1000.0),
        ("w1", 1000, 2000.0),
    ]
    dmg = spark.createDataFrame(rows, "way_id string, return_period int, damage double")
    out = ead(dmg).toPandas()
    # ½[(1/250−1/500)(0+1000) + (1/500−1/1000)(1000+2000)] = ½(2+3) = 2.5
    assert out["ead"].iloc[0] == pytest.approx(2.5)


def test_indicator_from_areas_clipped(spark):
    from moz_datapipeline_spark.operators.areas import indicator_from_areas

    # one horizontal way of length 10 crossing two unit-height cells
    segs = spark.createDataFrame(
        [("w1", 0.0, 0.5, 10.0, 0.5, 10.0)],
        "way_id string, ax double, ay double, bx double, by double, way_len double",
    )
    cells = spark.createDataFrame(
        [
            (0.0, 0.0, 4.0, 1.0, 10.0),   # covers x∈[0,4) → overlap 4
            (4.0, 0.0, 10.0, 1.0, 20.0),  # covers x∈[4,10) → overlap 6
            (0.0, 5.0, 10.0, 6.0, 99.0),  # elsewhere
        ],
        "pminx double, pminy double, pmaxx double, pmaxy double, indicator double",
    )
    out = indicator_from_areas(segs, cells).toPandas()
    # (4·10 + 6·20) / 10 = 16
    assert out["value"].iloc[0] == pytest.approx(16.0)


def test_enrich_flood_arrays_and_bridges(spark):
    from moz_datapipeline_spark.operators.enrich import add_bridges, add_flood_arrays

    ways = spark.createDataFrame([("w1",), ("w2",)], "NAME string")
    stats = spark.createDataFrame(
        [("w1", 500, 2.0, 50.0), ("w1", 1000, 3.0, 100.0)],
        "way_id string, return_period int, max_depth_m double, pct_flooded double",
    )
    out = add_flood_arrays(ways, stats).toPandas().set_index("NAME")
    assert list(out.loc["w1", "flood_depths"]) == [0] * 8 + [2.0, 3.0]
    assert list(out.loc["w1", "flood_lengths"]) == [0] * 8 + [50.0, 100.0]
    assert out.loc["w2", "flood_depths"] is None  # no stats → left-join miss

    bridges = spark.createDataFrame(
        [("w1", "bridge", 96.4), ("w1", "culvert", 7.0)],
        "roadSegmentID string, type string, length double",
    )
    wb = add_bridges(ways, bridges).toPandas().set_index("NAME")
    assert len(wb.loc["w1", "bridges"]) == 2
    assert wb.loc["w2", "bridges"] is None


def test_linestring_length(spark):
    from moz_datapipeline_spark.functions.geo import linestring_length_km

    # ~0.008983 deg of longitude at the equator ≈ 1 km (fixture node spacing)
    df = spark.createDataFrame(
        [([{"lon": 0.0, "lat": 0.0}, {"lon": 0.008983158, "lat": 0.0}],)],
        "coordinates array<struct<lon:double,lat:double>>",
    )
    km = df.select(linestring_length_km("coordinates").alias("km")).first()["km"]
    assert km == pytest.approx(1.0, rel=2e-3)


def test_raster_stub_deterministic(spark):
    from moz_datapipeline_spark.operators.raster import zonal_flood_stats

    ways = spark.createDataFrame([("w1",), ("w2",)], "NAME string")
    a = zonal_flood_stats(ways).toPandas().sort_values(["way_id", "return_period"])
    b = zonal_flood_stats(ways).toPandas().sort_values(["way_id", "return_period"])
    assert len(a) == 20
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # monotone in return period per way
    for _, grp in a.groupby("way_id"):
        d = list(grp.sort_values("return_period")["max_depth_m"])
        assert d == sorted(d)


def test_multimodal_feature_plumbing(spark):
    from moz_datapipeline_spark.operators.multimodal import extract_image_features

    rows = [
        (1, (bytearray(b"\x01\x02\x03"), "image/png", 2, 2, None, None, None)),
        (2, (bytearray(b""), "image/png", 0, 0, None, None, None)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, media struct<payload:binary, mime:string, width:int, height:int, sample_rate:int, channels:int, duration_ms:long>",
    )
    out = extract_image_features(df).toPandas().set_index("doc_id")
    assert len(out.loc[1, "features"]) == 8
    assert out.loc[1, "features"][0] == 3.0  # payload length
    assert list(out.loc[2, "features"]) == [0.0] * 8


def test_multimodal_frame_sampling(spark):
    from moz_datapipeline_spark.operators.multimodal import sample_frames

    rows = [(1, (bytearray(b"xx"), "video/fake", None, None, None, None, 3500))]
    df = spark.createDataFrame(
        rows,
        "doc_id long, media struct<payload:binary, mime:string, width:int, height:int, sample_rate:int, channels:int, duration_ms:long>",
    )
    out = sample_frames(df, every_ms=1000).toPandas()
    # 3.5 s of video sampled every second → frames at 0,1000,2000,3000 ms
    assert sorted(out["frame_ms"]) == [0, 1000, 2000, 3000]


def test_streaming_hourly_rollup_batch(spark):
    from moz_datapipeline_spark.streaming.events import hourly_rollup

    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", "click", 1.0), ("2024-01-01 00:50:00", "click", 2.0),
         ("2024-01-01 01:10:00", "click", 4.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = hourly_rollup(df).toPandas().sort_values("window_start")
    assert list(out["n_events"]) == [2, 1]
    assert list(out["total_value"]) == [3.0, 4.0]


def test_pipeline_runner(spark, tmp_path):
    from moz_datapipeline_spark.plans.pipeline import Pipeline

    src = spark.createDataFrame([(i,) for i in range(10)], "x int")
    p = Pipeline(spark, checkpoint_dir=str(tmp_path))
    p.source("nums", src)
    p.stage("evens", lambda df: df.filter(F.col("x") % 2 == 0), ["nums"],
            materialize=True)
    p.stage("sum", lambda df: df.agg(F.sum("x").alias("s")), ["evens"])
    res = p.run()
    assert res["sum"].first()["s"] == 20
    # resume: checkpointed stage is skipped (reads parquet back)
    p2 = Pipeline(spark, checkpoint_dir=str(tmp_path))
    p2.source("nums", src)
    p2.stage("evens", lambda df: (_ for _ in ()).throw(AssertionError("must not run")),
             ["nums"], materialize=True)
    p2.stage("sum", lambda df: df.agg(F.sum("x").alias("s")), ["evens"])
    res2 = p2.run(resume=True)
    assert res2["sum"].first()["s"] == 20


def test_raster_real_backend_refuses_unsupported_tiff(spark, tmp_path):
    """Without rasterio, the pure reader must fail fast at plan time on
    a raster it cannot parse (LZW compression) — never mis-read it."""
    import struct as _struct

    from moz_datapipeline_spark.operators.raster import (
        RasterUnavailable,
        zonal_flood_stats,
    )

    try:
        import rasterio  # noqa: F401

        pytest.skip("rasterio present — pure-reader gate not applicable")
    except ImportError:
        pass
    # minimal classic TIFF claiming LZW (compression=5)
    ifd = b""
    for tag, typ, cnt, val in [
        (256, 3, 1, 4), (257, 3, 1, 4), (258, 3, 1, 64), (259, 3, 1, 5),
        (273, 4, 1, 8), (279, 4, 1, 128), (339, 3, 1, 3),
    ]:
        ifd += _struct.pack("<HHI4s", tag, typ, cnt,
                            _struct.pack("<I", val))
    buf = _struct.pack("<2sHI", b"II", 42, 16) + b"\x00" * 8
    buf += _struct.pack("<H", 7) + ifd + _struct.pack("<I", 0)
    p = tmp_path / "lzw.tif"
    p.write_bytes(buf)
    ways = spark.createDataFrame([("w1", "{}")], "NAME string, geometry string")
    with pytest.raises(RasterUnavailable, match="compression"):
        zonal_flood_stats(
            ways, use_real_backend=True, raster_paths={10: str(p)}
        )


def test_raster_real_backend_window_read(spark, tmp_path):
    """Real path (runs only where rasterio is installed): a 10×10 synthetic
    GeoTIFF with known values under a 4-pixel polygon must reproduce the
    reference's sentinel rules (img-stats.py:99-105)."""
    rasterio = pytest.importorskip("rasterio")
    import numpy as np
    from rasterio.transform import from_origin

    from moz_datapipeline_spark.operators.raster import zonal_flood_stats

    # 10×10 raster, 1° pixels anchored at (0,10): values = row index,
    # except one 999 (excluded from mean/min/max) and one -1 pixel
    arr = np.tile(np.arange(10.0)[:, None], (1, 10))
    arr[0, 0] = 999.0
    arr[1, 1] = -1.0
    path = str(tmp_path / "p10.tif")
    with rasterio.open(
        path, "w", driver="GTiff", height=10, width=10, count=1,
        dtype="float64", crs="EPSG:4326", transform=from_origin(0, 10, 1, 1),
    ) as dst:
        dst.write(arr, 1)

    # polygon over the top-left 2×2 pixel block: values {999, 0, 1(-1→excl), 1}
    poly = (
        '{"type": "Polygon", "coordinates":'
        ' [[[0, 10], [2, 10], [2, 8], [0, 8], [0, 10]]]}'
    )
    ways = spark.createDataFrame([("w1", poly)], "NAME string, geometry string")
    out = zonal_flood_stats(
        ways, use_real_backend=True, raster_paths={10: path}
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["count"] == 4                       # nodata=-9999 excludes nothing
    # mean/min/max over {0.0, 1.0, -1.0} (999 excluded)
    assert r["min"] == pytest.approx(-1.0)
    assert r["max"] == pytest.approx(1.0)
    assert r["mean"] == pytest.approx(0.0)
    # denominator: pixels != -1 → 3; pct = 4/3*100
    assert r["pct_flooded"] == pytest.approx(4 / 3 * 100.0)


def test_weighted_median_reference_and_edges(spark):
    from moz_datapipeline_spark.operators.indicators import weighted_median

    rows = [
        # group a: values 1..4 with weights 1,1,1,7 -> half of 10 is 5,
        # cum hits 5 only at value 4
        ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0), ("a", 4.0, 7.0),
        # group b: uniform weights, even count -> lower-middle value
        # (cum at 2.0 reaches exactly half -> smallest such value)
        ("b", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0), ("b", 4.0, 1.0),
        # group c: ties at the crossing + zero/NULL weights excluded
        ("c", 5.0, 2.0), ("c", 5.0, 2.0), ("c", 9.0, 1.0),
        ("c", 0.5, 0.0), ("c", 0.5, None),
    ]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = {
        r.g: (r.weighted_median, r.total_weight)
        for r in weighted_median(df, "g", "v", "w").collect()
    }
    assert out["a"] == (4.0, 10.0)
    assert out["b"] == (2.0, 4.0)
    assert out["c"] == (5.0, 5.0)
    # partition-layout independence
    out2 = {
        r.g: (r.weighted_median, r.total_weight)
        for r in weighted_median(df.repartition(7), "g", "v", "w").collect()
    }
    assert out2 == out
