"""Bucketed range join vs a plain inequality join (ground truth)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_range_join_matches_plain(spark):
    from moz_datapipeline_spark.operators.ranges import bucketed_range_join

    points = spark.range(0, 1000).select(
        (F.col("id") * 0.37).alias("p"), F.col("id").alias("pid")
    )
    intervals = spark.createDataFrame(
        [(i, i * 7.0, i * 7.0 + 11.0) for i in range(60)],
        "iid int, lo double, hi double",
    )
    got = bucketed_range_join(
        points, intervals, "p", "lo", "hi", bucket_width=5.0
    ).select("pid", "iid")
    want = points.join(
        intervals, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi"))
    ).select("pid", "iid")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bucketed_range_join_boundaries(spark):
    from moz_datapipeline_spark.operators.ranges import bucketed_range_join

    # hi is exclusive; points exactly on lo included, on hi excluded —
    # including when lo/hi sit exactly on bucket edges
    points = spark.createDataFrame(
        [(10.0, 1), (20.0, 2), (15.0, 3)], "p double, pid int"
    )
    intervals = spark.createDataFrame([(1, 10.0, 20.0)], "iid int, lo double, hi double")
    out = bucketed_range_join(points, intervals, "p", "lo", "hi", 10.0).toPandas()
    assert sorted(out["pid"]) == [1, 3]  # 20.0 excluded (hi), 10.0 included (lo)


def test_global_rank_matches_sorted_order(spark):
    from moz_datapipeline_spark.operators.ranges import global_rank

    rows = [(i, float((i * 37) % 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x double").repartition(13)
    out = global_rank(df, "x", ["id"]).collect()
    want = sorted(rows, key=lambda r: (r[1], r[0]))
    got = sorted(out, key=lambda r: r.rank)
    assert [(r.id, r.x) for r in got] == want
    assert [r.rank for r in got] == list(range(1, 501))
    # exact CDF endpoints
    assert got[0].percent_rank == 0.0 and got[-1].percent_rank == 1.0
    # ranks are partitioning-invariant
    out2 = global_rank(df.repartition(3), "x", ["id"]).collect()
    assert sorted((r.id, r.rank) for r in out2) == sorted(
        (r.id, r.rank) for r in out
    )


def test_global_rank_descending_and_single_row(spark):
    import pytest as _pytest

    from moz_datapipeline_spark.operators.ranges import global_rank

    df = spark.createDataFrame([(1, 5.0), (2, 9.0)], "id long, x double")
    out = {r.id: r.rank for r in global_rank(df, "x", ["id"], ascending=False).collect()}
    assert out == {2: 1, 1: 2}
    one = spark.createDataFrame([(1, 5.0)], "id long, x double")
    r = global_rank(one, "x", ["id"]).collect()[0]
    assert r.rank == 1 and r.percent_rank == 0.0
    with _pytest.raises(ValueError):
        global_rank(df, "x", [])


def test_peak_concurrency_sweep(spark):
    from moz_datapipeline_spark.operators.ranges import peak_concurrency

    iv = spark.createDataFrame(
        [
            ("a", 0, 10), ("a", 5, 15), ("a", 9, 12),   # peak 3 at t=9
            ("a", 20, 30), ("a", 30, 40),               # touching: never 2
            ("b", 0, 100),
        ],
        "g string, start long, end long",
    )
    out = {r.g: (r.peak_concurrency, r.peak_at)
           for r in peak_concurrency(iv, group_cols=["g"]).collect()}
    assert out["a"] == (3, 9)
    assert out["b"] == (1, 0)
    # partitioning invariance
    out2 = {r.g: (r.peak_concurrency, r.peak_at)
            for r in peak_concurrency(
                iv.repartition(7), group_cols=["g"]).collect()}
    assert out2 == out


def test_pareto_frontier_matches_bruteforce(spark):
    import random

    from moz_datapipeline_spark.operators.ranges import (
        pareto_frontier_2d,
    )

    random.seed(7)
    pts = [
        (i, float(random.randint(0, 30)), float(random.randint(0, 30)))
        for i in range(500)
    ]
    pts += [(1000, 0.0, 0.0), (1001, 0.0, 0.0)]  # identical dupes kept
    pts += [(1002, None, 1.0), (1003, 2.0, None)]  # NULLs excluded
    df = spark.createDataFrame(pts, "id long, x double, y double")

    vals = [(i, x, y) for i, x, y in pts if x is not None and y is not None]
    want = sorted(
        i
        for i, x, y in vals
        if not any(
            sx <= x and sy <= y and (sx < x or sy < y)
            for _, sx, sy in vals
        )
    )
    got = sorted(r.id for r in pareto_frontier_2d(df, "x", "y").collect())
    assert got == want
    assert {1000, 1001} <= set(got) and 1002 not in got
    # partition-layout independence
    got2 = sorted(
        r.id
        for r in pareto_frontier_2d(df.repartition(13), "x", "y").collect()
    )
    assert got2 == want


def test_pareto_frontier_single_chain(spark):
    from moz_datapipeline_spark.operators.ranges import (
        pareto_frontier_2d,
    )

    # strictly decreasing trade-off: every point is on the frontier
    df = spark.createDataFrame(
        [(i, float(i), float(100 - i)) for i in range(50)],
        "id long, x double, y double",
    )
    assert pareto_frontier_2d(df, "x", "y").count() == 50
    # strictly dominated chain: only the minimum survives
    df2 = spark.createDataFrame(
        [(i, float(i), float(i)) for i in range(50)],
        "id long, x double, y double",
    )
    rows = pareto_frontier_2d(df2, "x", "y").collect()
    assert [(r.id, r.x, r.y) for r in rows] == [(0, 0.0, 0.0)]


def test_interval_coverage_matches_stack_merge(spark):
    import collections
    import random

    from moz_datapipeline_spark.operators.ranges import interval_coverage

    random.seed(3)
    rows = []
    for g in ("a", "b"):
        for _ in range(300):
            s0 = random.randint(0, 1000)
            rows.append((g, s0, s0 + random.randint(0, 50)))
    # touching intervals merge; empty intervals add zero but never
    # bridge; exact duplicates are layout-safe
    rows += [("c", 5, 5), ("c", 5, 10), ("c", 10, 12), ("c", 20, 20)]
    rows += [("d", 0, 2), ("d", 5, 9), ("d", 5, 9)]
    df = spark.createDataFrame(rows, "g string, s long, e long")

    by = collections.defaultdict(list)
    for g, s, e in rows:
        by[g].append((s, e))
    want = {}
    for g, iv in by.items():
        iv.sort()
        segs = []
        for s, e in iv:
            if segs and s <= segs[-1][1]:
                segs[-1][1] = max(segs[-1][1], e)
            else:
                segs.append([s, e])
        want[g] = (
            len(iv),
            len(segs),
            sum(max(0, b - a) for a, b in segs),
        )

    for frame in (df, df.repartition(9)):
        got = {
            r.g: (r.n_intervals, r.n_segments, r.covered)
            for r in interval_coverage(frame, "g", "s", "e").collect()
        }
        assert got == want
    assert want["c"] == (4, 2, 7)
    assert want["d"] == (3, 2, 6)
