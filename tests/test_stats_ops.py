"""Round-8 statistics operators: grouped OLS and the two-sample KS
test (operators/analytics.grouped_ols, operators/validation.ks_test)."""

from __future__ import annotations

import math

import pytest

from moz_datapipeline_spark.operators.analytics import grouped_ols
from moz_datapipeline_spark.operators.validation import ks_test


def _ols_ref(pts):
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    cv = n * sxy - sx * sy
    slope = cv / dx if dx > 0 else None
    intercept = (sy - slope * sx) / n if dx > 0 else None
    r2 = (cv * cv) / (dx * dy) if dx > 0 and dy > 0 else None
    return slope, intercept, r2


def test_grouped_ols_matches_reference(spark):
    pts_a = [(float(i), 3.0 * i + 2.0 + ((i * 7) % 5 - 2.0)) for i in range(40)]
    pts_b = [(float(i), -0.5 * i + 10.0) for i in range(25)]
    rows = [("a", x, y) for x, y in pts_a] + [("b", x, y) for x, y in pts_b]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_ols(df, ["g"], "x", "y").collect()}

    for g, pts in (("a", pts_a), ("b", pts_b)):
        slope, intercept, r2 = _ols_ref(pts)
        assert got[g].n == len(pts)
        assert abs(got[g].slope - slope) < 1e-5
        assert abs(got[g].intercept - intercept) < 1e-5
        assert abs(got[g].r2 - r2) < 1e-5
    # a perfect line has r2 == 1
    assert abs(got["b"].r2 - 1.0) < 1e-9


def test_grouped_ols_degenerate_groups(spark):
    rows = (
        [("constx", 5.0, float(i)) for i in range(10)]
        + [("consty", float(i), 7.0) for i in range(10)]
        + [("nulls", None, 1.0), ("nulls", 1.0, None), ("nulls", 2.0, 3.0)]
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    # constant x: no slope at all
    assert got["constx"].slope is None
    assert got["constx"].intercept is None
    assert got["constx"].r2 is None
    # constant y: flat fit, no explained variance
    assert got["consty"].slope == 0.0
    assert got["consty"].intercept == 7.0
    assert got["consty"].r2 is None
    # pairwise deletion leaves one point -> dx = 0 -> all NULL
    assert got["nulls"].n == 1
    assert got["nulls"].slope is None
    with pytest.raises(ValueError, match="group column"):
        grouped_ols(df, [], "x", "y")


def _ks_ref(xs, ys):
    xs, ys = sorted(xs), sorted(ys)
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    d = 0.0
    ia = ib = 0
    for v in vals:
        while ia < na and xs[ia] <= v:
            ia += 1
        while ib < nb and ys[ib] <= v:
            ib += 1
        d = max(d, abs(ia / na - ib / nb))
    return d


def test_ks_identical_samples_is_zero(spark):
    vals = [float(i % 13) for i in range(300)]
    a = spark.createDataFrame([(v,) for v in vals], "x double")
    r = ks_test(a, a, "x").collect()[0]
    assert r.ks_stat == 0.0
    assert r.p_value == 1.0
    assert r.n_a == r.n_b == 300


def test_ks_matches_python_reference(spark):
    xs = [float((i * 37) % 101) for i in range(400)]
    ys = [float((i * 53) % 101) * 0.6 + 30.0 for i in range(250)]
    a = spark.createDataFrame([(v,) for v in xs] + [(None,)], "x double")
    b = spark.createDataFrame([(v,) for v in ys], "x double")
    r = ks_test(a, b, "x").collect()[0]
    want = _ks_ref(xs, ys)
    assert abs(r.ks_stat - round(want, 6)) < 1e-9
    assert r.n_a == 400 and r.n_b == 250

    # p-value reproduces the Numerical-Recipes asymptotic series
    ne = math.sqrt(400 * 250 / 650.0)
    lam = (ne + 0.12 + 0.11 / ne) * want
    q = 2.0 * sum(
        (-1.0) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        for k in range(1, 101)
    )
    assert abs(r.p_value - round(min(max(q, 0.0), 1.0), 6)) < 1e-9


def test_ks_disjoint_supports_is_one(spark):
    a = spark.createDataFrame([(float(i),) for i in range(50)], "x double")
    b = spark.createDataFrame(
        [(float(i + 1000),) for i in range(50)], "x double"
    )
    r = ks_test(a, b, "x").collect()[0]
    assert r.ks_stat == 1.0
    assert r.p_value < 1e-6


def test_ks_empty_side_yields_null(spark):
    a = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    b = spark.createDataFrame([], "x double")
    r = ks_test(a, b, "x").collect()[0]
    assert r.ks_stat is None and r.p_value is None
    assert r.n_a == 2 and r.n_b == 0


def test_ks_leaves_registry_clean(spark):
    base = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())
    a = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    b = spark.createDataFrame([(float(i) + 0.5,) for i in range(80)], "x double")
    ks_test(a, b, "x").collect()
    assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) == base
