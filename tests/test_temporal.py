"""As-of join edge semantics."""

from __future__ import annotations


def test_asof_backward_inclusive(spark):
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", 100, "a"), (2, "k", 200, "b"), (3, "k", 50, "c")],
        "id int, key string, ts long, payload string",
    )
    right = spark.createDataFrame(
        [("k", 100, 1.0), ("k", 150, 2.0), ("k", 999, 9.0)],
        "key string, ts long, v double",
    )
    out = (
        asof_join(left, right, key="key", ts="ts", right_value_cols=["v"])
        .toPandas()
        .set_index("id")
    )
    # ts=100 matches the right row AT 100 (inclusive)
    assert out.loc[1, "v_right"] == 1.0 and out.loc[1, "ts_right"] == 100
    # ts=200: latest at-or-before is 150
    assert out.loc[2, "v_right"] == 2.0
    # ts=50: nothing before → nulls
    assert out.loc[3, "v_right"] != out.loc[3, "v_right"] or out.loc[3, "v_right"] is None


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas.merge_asof (backward,
    inclusive) — the de-facto reference semantics."""
    import numpy as np
    import pandas as pd

    from moz_datapipeline_spark.operators.temporal import asof_join

    rng = np.random.RandomState(11)
    left_pd = pd.DataFrame(
        {
            "id": range(200),
            "key": [f"k{int(x)}" for x in rng.randint(0, 5, 200)],
            "ts": rng.randint(0, 10_000, 200).astype("int64"),
            "payload": ["p"] * 200,
        }
    )
    right_pd = pd.DataFrame(
        {
            "key": [f"k{int(x)}" for x in rng.randint(0, 5, 300)],
            "ts": rng.randint(0, 10_000, 300).astype("int64"),
            "v": rng.rand(300),
        }
    ).drop_duplicates(["key", "ts"])  # unique (key, ts): no tie ambiguity

    got = (
        asof_join(
            spark.createDataFrame(left_pd),
            spark.createDataFrame(right_pd),
            key="key",
            ts="ts",
            right_value_cols=["v"],
        )
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left_pd.sort_values("ts"),
        right_pd.sort_values("ts"),
        on="ts",
        by="key",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("id").reset_index(drop=True)
    a = got["v_right"].to_numpy()
    b = want["v"].to_numpy()
    both_nan = np.isnan(a) & np.isnan(b)
    assert bool(np.all(np.isclose(a, b) | both_nan))


def test_asof_null_in_matched_row_is_carried(spark):
    """If the MATCHED (latest) right row holds a NULL value, that NULL is
    carried — not an older non-null value (merge_asof semantics; carrying
    columns independently with ignorenulls would get this wrong)."""
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", 300, "x")], "id int, key string, ts long, payload string"
    )
    right = spark.createDataFrame(
        [("k", 100, 1.0), ("k", 200, None)], "key string, ts long, v double"
    )
    row = asof_join(
        left, right, key="key", ts="ts", right_value_cols=["v"]
    ).collect()[0]
    assert row["v_right"] is None          # the ts=200 row's NULL, not 1.0
    assert row["ts_right"] == 200          # ...and ts comes from the same row


def test_asof_duplicate_right_ts_deterministic(spark):
    """Duplicate right timestamps on a key resolve to the greatest carried
    struct — stable across partition layouts and repeated runs."""
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "k", 500, "x")], "id int, key string, ts long, payload string"
    )
    right = spark.createDataFrame(
        [("k", 100, 1.0), ("k", 100, 7.0), ("k", 100, 3.0)],
        "key string, ts long, v double",
    )
    vals = set()
    for _ in range(3):
        row = asof_join(
            left, right.repartition(8), key="key", ts="ts",
            right_value_cols=["v"],
        ).collect()[0]
        vals.add(row["v_right"])
    assert vals == {7.0}


def test_asof_keys_isolated(spark):
    from moz_datapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "a", 100, "x"), (2, "b", 100, "y")],
        "id int, key string, ts long, payload string",
    )
    right = spark.createDataFrame(
        [("a", 10, 5.0)], "key string, ts long, v double"
    )
    out = asof_join(left, right, key="key", ts="ts", right_value_cols=["v"])
    rows = {r["id"]: r["v_right"] for r in out.collect()}
    assert rows[1] == 5.0
    assert rows[2] is None  # other key never sees a's rows


def test_ewma_smooth_matches_recursion(spark):
    from datetime import datetime, timedelta

    import pytest as _pytest

    from moz_datapipeline_spark.operators.temporal import ewma_smooth

    base = datetime(2024, 3, 1)
    rows = [
        (i, base + timedelta(hours=i), "m", float(v))
        for i, v in enumerate([10.0, 20.0, 30.0, 40.0])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = sorted(ewma_smooth(df, alpha=0.5).collect(), key=lambda r: r.bucket_epoch)
    # s: 10, 15, 22.5, 31.25
    assert [r.ewma for r in out] == [10.0, 15.0, 22.5, 31.25]
    with _pytest.raises(ValueError):
        ewma_smooth(df, alpha=0.0)


def test_cusum_detects_level_shift(spark):
    from moz_datapipeline_spark.operators.temporal import (
        cusum_changepoints,
    )

    # hourly series: 30 buckets at 10, then 30 at 14 — a level shift
    rows = []
    for i in range(60):
        val = 10.0 if i < 30 else 14.0
        rows.append(("a", i * 3600 * 1_000_000_000, val))
    ev = spark.createDataFrame(rows, "event_type string, ts long, value double")
    out = (
        cusum_changepoints(ev, k_sigmas=0.5, h_sigmas=4.0)
        .orderBy("bucket_epoch")
        .collect()
    )
    assert len(out) == 60
    # reference recursion in plain python
    import statistics

    xs = [10.0] * 30 + [14.0] * 30
    mu = statistics.fmean(xs)
    sd = statistics.stdev(xs)
    k, h = 0.5 * sd, 4.0 * sd
    ap = an = 0.0
    first_flag = None
    for i, x in enumerate(xs):
        ap = max(0.0, ap + (x - mu - k))
        an = max(0.0, an + (mu - x - k))
        assert abs(out[i].s_pos - ap) < 1e-5
        assert abs(out[i].s_neg - an) < 1e-5
        if (ap > h or an > h) and first_flag is None:
            first_flag = i
        assert out[i].is_change == (ap > h or an > h)
    # retrospective CUSUM: both regimes sit k-sigma off the GLOBAL
    # mean, so the low regime trips s_neg early and the high regime
    # trips s_pos after the shift — both must flag
    assert first_flag is not None
    assert any(r.is_change and r.s_pos > r.s_neg for r in out[31:])
    assert any(r.is_change and r.s_neg > r.s_pos for r in out[:30])


def test_cusum_constant_series_never_flags(spark):
    from moz_datapipeline_spark.operators.temporal import (
        cusum_changepoints,
    )

    ev = spark.createDataFrame(
        [("a", i * 3600 * 1_000_000_000, 5.0) for i in range(10)]
        + [("b", 0, 1.0)],
        "event_type string, ts long, value double",
    )
    rows = cusum_changepoints(ev).collect()
    assert all(r.s_pos == 0.0 and r.s_neg == 0.0 for r in rows)
    assert not any(r.is_change for r in rows)


def test_seasonal_decompose_recovers_planted_cycle(spark):
    from moz_datapipeline_spark.operators.temporal import (
        seasonal_decompose,
    )

    # 10 full days of hourly data: flat base 100 + deterministic
    # 24-hour cycle; trend should be ~flat, seasonal should recover
    # the cycle, residual ~0 (away from the edges)
    cycle = [float((h * 7) % 24 - 11.5) for h in range(24)]
    rows = [
        ("a", (d * 24 + h) * 3600 * 1_000_000_000, 100.0 + cycle[h])
        for d in range(10)
        for h in range(24)
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts long, value double"
    )
    out = {
        (r.phase, r.bucket_epoch): r
        for r in seasonal_decompose(ev).collect()
    }
    assert len(out) == 240
    # identity holds exactly (up to rounding) at every bucket
    for r in out.values():
        assert abs(r.metric - (r.trend + r.seasonal + r.residual)) < 2e-6
    # interior buckets: residual ~ 0 and seasonal tracks the cycle
    # shape (zero-centred cycle here, so direct comparison works)
    interior = [
        r for (p, b) in out
        for r in [out[(p, b)]]
        if 24 * 3600 <= b <= (9 * 24 - 12) * 3600
    ]
    assert interior
    for r in interior:
        assert abs(r.residual) < 0.75
        assert abs(r.seasonal - cycle[r.phase]) < 0.75


def test_seasonal_decompose_rejects_bad_period(spark):
    import pytest as _pytest

    from moz_datapipeline_spark.operators.temporal import (
        seasonal_decompose,
    )

    ev = spark.createDataFrame(
        [("a", 0, 1.0)], "event_type string, ts long, value double"
    )
    with _pytest.raises(ValueError, match="period"):
        seasonal_decompose(ev, period=1)


def test_lag_features_no_leakage(spark):
    from moz_datapipeline_spark.operators.temporal import lag_features

    rows = [
        ("a", i * 3600 * 1_000_000_000, float(i + 1)) for i in range(8)
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts long, value double"
    )
    out = sorted(
        lag_features(ev, lags=(1, 2), rolling_window=3).collect(),
        key=lambda r: r.bucket_epoch,
    )
    xs = [float(i + 1) for i in range(8)]
    for i, r in enumerate(out):
        assert r.metric == xs[i]
        assert r.lag_1 == (xs[i - 1] if i >= 1 else None)
        assert r.lag_2 == (xs[i - 2] if i >= 2 else None)
        lo = max(0, i - 3)
        prev = xs[lo:i]
        assert r.rolling_n == len(prev)
        if prev:
            assert abs(r.rolling_mean - sum(prev) / len(prev)) < 1e-9
        else:
            assert r.rolling_mean is None
        # leakage check: no feature may equal the current metric by
        # construction of this strictly increasing series
        assert r.lag_1 != r.metric and r.rolling_mean != r.metric

    import pytest as _pytest

    with _pytest.raises(ValueError):
        lag_features(ev, lags=(0,))


def test_autocorrelation_alternating_and_constant(spark):
    from moz_datapipeline_spark.operators.temporal import autocorrelation

    rows = [
        ("alt", i * 3600 * 1_000_000_000, 1.0 if i % 2 else -1.0)
        for i in range(40)
    ] + [("const", i * 3600 * 1_000_000_000, 5.0) for i in range(10)]
    ev = spark.createDataFrame(
        rows, "event_type string, ts long, value double"
    )
    out = {r.event_type: r for r in autocorrelation(ev, max_lag=2).collect()}
    alt = out["alt"]
    # a perfect alternating series: acf_1 = -1, acf_2 = +1
    assert abs(alt.acf_1 + 1.0) < 1e-9
    assert abs(alt.acf_2 - 1.0) < 1e-9
    assert alt.n_buckets == 40
    # constant series has zero variance: corr undefined -> NULL
    assert out["const"].acf_1 is None


class TestGapFill:
    def _df(self, spark):
        rows = [
            ("a", 0, 10.0), ("a", 30, 40.0), ("a", 40, 50.0),
            ("b", 100, 1.0), ("b", 120, 5.0),
        ]
        return spark.createDataFrame(rows, "g string, t long, v double")

    def test_locf_and_grid(self, spark):
        from moz_datapipeline_spark.operators.temporal import gap_fill

        out = gap_fill(self._df(spark), "g", "t", "v", step=10, method="locf")
        got = {(r.g, r.t): (r.value, r.is_filled) for r in out.collect()}
        assert got[("a", 0)] == (10.0, False)
        assert got[("a", 10)] == (10.0, True)
        assert got[("a", 20)] == (10.0, True)
        assert got[("a", 30)] == (40.0, False)
        assert got[("a", 40)] == (50.0, False)
        assert got[("b", 110)] == (1.0, True)
        assert len([k for k in got if k[0] == "a"]) == 5
        assert len([k for k in got if k[0] == "b"]) == 3

    def test_linear_interpolation(self, spark):
        from moz_datapipeline_spark.operators.temporal import gap_fill

        out = gap_fill(
            self._df(spark), "g", "t", "v", step=10, method="linear"
        )
        got = {(r.g, r.t): r.value for r in out.collect()}
        assert got[("a", 10)] == 20.0  # 10 + (40-10)*(10-0)/(30-0)
        assert got[("a", 20)] == 30.0
        assert got[("b", 110)] == 3.0

    def test_zero_fill_and_snapping(self, spark):
        from moz_datapipeline_spark.operators.temporal import gap_fill

        df = spark.createDataFrame(
            [("a", 3, 7.0), ("a", 27, 9.0)], "g string, t long, v double"
        )
        out = gap_fill(df, "g", "t", "v", step=10, method="zero")
        got = {r.t: (r.value, r.is_filled) for r in out.collect()}
        # 3 -> bucket 0, 27 -> bucket 20
        assert got[0] == (7.0, False)
        assert got[10] == (0.0, True)
        assert got[20] == (9.0, False)

    def test_duplicate_bucket_fails_loud(self, spark):
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        from moz_datapipeline_spark.operators.temporal import gap_fill

        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, 2.0)], "g string, t long, v double"
        )
        with pytest.raises((Py4JJavaError, PySparkException), match="roll up first"):
            gap_fill(df, "g", "t", "v", step=10).collect()

    def test_validation(self, spark):
        import pytest

        from moz_datapipeline_spark.operators.temporal import gap_fill

        df = self._df(spark)
        with pytest.raises(ValueError, match="method"):
            gap_fill(df, "g", "t", "v", step=10, method="spline")
        with pytest.raises(ValueError, match="step"):
            gap_fill(df, "g", "t", "v", step=0)
