"""Round-12 operator tests: point-level DBSCAN, z-order layout,
Fellegi-Sunter record linkage."""

from __future__ import annotations

import pytest


def test_grid_dbscan_hand_computed(spark):
    """Two 3-point blobs 556 km apart at eps=200 km / min_pts=3: all
    six blob points are core (2 neighbors + self); (2.5, 0) is 167 km
    from blob A's edge but 222 km from its middle -> border, joins
    A's cluster; (10, 10) is noise.  Labels are the min core id."""
    from moz_datapipeline_spark.operators.geometry import grid_dbscan

    pts = [
        (1, 0.0, 0.0), (2, 0.5, 0.0), (3, 1.0, 0.0),
        (4, 2.5, 0.0),
        (5, 10.0, 10.0),
        (6, 0.0, 5.0), (7, 0.5, 5.0), (8, 1.0, 5.0),
    ]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    out = {
        r.id: r
        for r in grid_dbscan(df, eps_km=200.0, min_pts=3).collect()
    }
    assert len(out) == 8
    assert all(out[i].is_core for i in (1, 2, 3, 6, 7, 8))
    assert not out[4].is_core and not out[5].is_core
    assert out[1].cluster == out[2].cluster == out[3].cluster == 1
    assert out[4].cluster == 1
    assert out[5].cluster is None
    assert out[6].cluster == out[7].cluster == out[8].cluster == 6


def test_grid_dbscan_min_pts_one_isolated_cores(spark):
    """min_pts=1: every point is core; isolated cores become their own
    singleton cluster (no core-core edge, label = own id)."""
    from moz_datapipeline_spark.operators.geometry import grid_dbscan

    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 90.0, 40.0)], "id long, lon double, lat double"
    )
    out = {
        r.id: r for r in grid_dbscan(df, eps_km=10.0, min_pts=1).collect()
    }
    assert out[1].is_core and out[1].cluster == 1
    assert out[2].is_core and out[2].cluster == 2


def test_grid_dbscan_duplicate_positions_count(spark):
    """Coincident points are mutual 0-km neighbors: 3 points at one
    location with min_pts=3 are all core, one cluster."""
    from moz_datapipeline_spark.operators.geometry import grid_dbscan

    df = spark.createDataFrame(
        [(i, 5.0, 5.0) for i in range(1, 4)],
        "id long, lon double, lat double",
    )
    out = {
        r.id: r for r in grid_dbscan(df, eps_km=1.0, min_pts=3).collect()
    }
    assert all(out[i].is_core and out[i].cluster == 1 for i in (1, 2, 3))


def test_grid_dbscan_guards(spark):
    from moz_datapipeline_spark.operators.geometry import grid_dbscan

    df = spark.createDataFrame(
        [(1, 0.0, 0.0)], "id long, lon double, lat double"
    )
    with pytest.raises(ValueError, match="eps_km"):
        grid_dbscan(df, eps_km=0.0)
    with pytest.raises(ValueError, match="min_pts"):
        grid_dbscan(df, eps_km=1.0, min_pts=0)


def test_zorder_key_hand_interleave(spark):
    """bits=3, cols (x, y) with bounds making quantized = raw value:
    x=5 (101), y=3 (011) -> bit layout x0,y0,x1,y1,x2,y2 =
    1,1,0,1,1,0 -> 0b011011 = 27."""
    from moz_datapipeline_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(5.0, 3.0)], "x double, y double")
    # bounds [0, 8) with 3 bits => bin width 1 => identity quantize
    z = df.select(
        zorder_key({"x": (0.0, 8.0), "y": (0.0, 8.0)}, bits=3).alias("z")
    ).collect()[0]["z"]
    assert z == 27


def test_zorder_key_clamps_and_nulls(spark):
    from moz_datapipeline_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(-5.0, 99.0), (None, 0.0)], "x double, y double"
    )
    rows = df.select(
        zorder_key({"x": (0.0, 8.0), "y": (0.0, 8.0)}, bits=3).alias("z")
    ).collect()
    # x=-5 clamps to bin 0; y=99 clamps to bin 7 (111 at odd bits:
    # 2+8+32=42).  NULL x -> 0; y=0 -> 0.
    assert rows[0]["z"] == 42
    assert rows[1]["z"] == 0


def test_zorder_key_guards(spark):
    from moz_datapipeline_spark.operators.layout import zorder_key

    with pytest.raises(ValueError, match="column"):
        zorder_key({}, bits=4)
    with pytest.raises(ValueError, match="62"):
        zorder_key({"a": (0, 1), "b": (0, 1)}, bits=32)


def test_zorder_layout_locality(spark, tmp_path):
    """Write a 2-D grid z-ordered: per-file min/max ranges of BOTH
    columns must be tight — the one-column sort leaves the second
    column's per-file range at ~full width, z-order shrinks it."""
    from pyspark.sql import functions as F

    from moz_datapipeline_spark.operators.layout import zorder_layout

    n = 64
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("double").alias("x"),
            (F.col("id") / n).cast("long").cast("double").alias("y"),
        )
    )
    laid = zorder_layout(df, ["x", "y"], bits=6, num_partitions=16)
    assert "zorder_key" in laid.columns
    spans = (
        laid.groupBy(F.spark_partition_id().alias("p"))
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    )
    assert sum(r.cnt for r in spans) == n * n
    # 16 partitions over a 64x64 grid: a z-layout keeps BOTH spans
    # near sqrt(4096/16)=16; a linear sort on x gives sy = 63 in
    # every partition.  Allow generous slack for range-boundary
    # straddle.
    avg_sy = sum(r.sy for r in spans) / len(spans)
    assert avg_sy < 40, avg_sy
    avg_sx = sum(r.sx for r in spans) / len(spans)
    assert avg_sx < 40, avg_sx


def test_record_linkage_score_hand_computed(spark):
    """Textbook weights: name (m=.9, u=.1) -> agree +3.17, disagree
    -3.17; phone (m=.8, u=.2) -> +2, -2.  Pair agreeing on both:
    5.169925; agreeing on name only: 1.169925; NULL phone: 3.169925."""
    import math

    from moz_datapipeline_spark.operators.linkage import (
        record_linkage_score,
    )

    rows = [
        (1, True, True),
        (2, True, False),
        (3, True, None),
        (4, False, False),
    ]
    df = spark.createDataFrame(
        rows, "pid long, name_ok boolean, phone_ok boolean"
    )
    out = {
        r.pid: r
        for r in record_linkage_score(
            df,
            {"name_ok": (0.9, 0.1), "phone_ok": (0.8, 0.2)},
            upper=3.0,
            lower=0.0,
        ).collect()
    }
    w_name = math.log2(9.0)
    w_phone = math.log2(4.0)
    assert out[1].score == round(w_name + w_phone, 6)
    assert out[1].decision == "match"
    assert out[2].score == round(w_name - w_phone, 6)
    assert out[2].decision == "possible"
    assert out[3].score == round(w_name, 6)
    assert out[3].decision == "match"
    assert out[4].score == round(-w_name - w_phone, 6)
    assert out[4].decision == "non_match"


def test_record_linkage_guards(spark):
    from moz_datapipeline_spark.operators.linkage import (
        record_linkage_score,
    )

    df = spark.createDataFrame([(1, True)], "pid long, f boolean")
    with pytest.raises(ValueError, match="m <= u"):
        record_linkage_score(df, {"f": (0.2, 0.8)})
    with pytest.raises(ValueError, match="in \\(0, 1\\)"):
        record_linkage_score(df, {"f": (1.0, 0.1)})
    with pytest.raises(ValueError, match=">= 1 field"):
        record_linkage_score(df, {})


def test_estimate_m_u_hand_computed(spark):
    """4 matches (3 agree name, 1 null phone of which 2/3 agree) and
    4 non-matches (1 agrees name, 0 agree phone -> floor clamp)."""
    from moz_datapipeline_spark.operators.linkage import estimate_m_u

    rows = [
        (True, True, True),
        (True, True, True),
        (True, True, None),
        (True, False, False),
        (False, True, False),
        (False, False, False),
        (False, False, False),
        (False, False, None),
    ]
    df = spark.createDataFrame(
        rows, "is_match boolean, name_ok boolean, phone_ok boolean"
    )
    out = {
        r.field: r
        for r in estimate_m_u(df, ["name_ok", "phone_ok"]).collect()
    }
    assert out["name_ok"].m == 0.75 and out["name_ok"].u == 0.25
    assert out["phone_ok"].m == round(2 / 3, 6)
    assert out["phone_ok"].u == 0.001  # floor clamp, 0/3 agreements
    assert out["name_ok"].n_match == 4 and out["name_ok"].n_non_match == 4

    one_class = df.filter("is_match")
    with pytest.raises(ValueError, match="BOTH classes"):
        estimate_m_u(one_class, ["name_ok"])


def test_cox_ph_gehan_published_pin(spark):
    """Gehan (1965) 6-MP leukemia trial, control arm coded x=1: the
    PUBLISHED Breslow-ties Cox fit is beta = 1.509 (HR 4.52),
    SE = 0.410 — an independent literature pin, not a replay."""
    from moz_datapipeline_spark.operators.analytics import cox_ph

    control = [1, 1, 2, 2, 3, 4, 4, 5, 5, 8, 8, 8, 8,
               11, 11, 12, 12, 15, 17, 22, 23]
    treat = [(6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1),
             (10, 0), (11, 0), (13, 1), (16, 1), (17, 0), (19, 0),
             (20, 0), (22, 1), (23, 1), (25, 0), (32, 0), (32, 0),
             (34, 0), (35, 0)]
    rows = [(float(t), 1, 1.0) for t in control] + [
        (float(t), e, 0.0) for t, e in treat
    ]
    df = spark.createDataFrame(rows, "t double, e int, x double")
    r = cox_ph(df, "t", "e", "x").collect()[0]
    assert r.n == 42 and r.n_events == 30
    assert abs(r.beta - 1.5092) < 1e-3
    assert abs(r.se - 0.4096) < 1e-3
    assert abs(r.hazard_ratio - 4.523) < 1e-2
    assert r.significant is True


def test_cox_ph_null_effect_and_degenerates(spark):
    from moz_datapipeline_spark.operators.analytics import cox_ph

    # covariate independent of survival -> beta ~ 0, not significant
    rows = [(float(1 + i % 7), 1, float(i % 2)) for i in range(60)]
    df = spark.createDataFrame(rows, "t double, e int, x double")
    r = cox_ph(df, "t", "e", "x").collect()[0]
    assert abs(r.beta) < 0.2 and r.significant is False

    # constant covariate: information 0 -> NULL estimates
    const = spark.createDataFrame(
        [(float(i + 1), 1, 2.0) for i in range(10)],
        "t double, e int, x double",
    )
    r = cox_ph(const, "t", "e", "x").collect()[0]
    assert r.n == 10 and r.beta is None and r.p_value is None

    # zero events: NULL estimates
    cens = spark.createDataFrame(
        [(float(i + 1), 0, float(i % 2)) for i in range(10)],
        "t double, e int, x double",
    )
    r = cox_ph(cens, "t", "e", "x").collect()[0]
    assert r.n == 10 and r.n_events == 0 and r.beta is None

    with pytest.raises(ValueError, match="iterations"):
        cox_ph(df, "t", "e", "x", iterations=0)


def test_cox_ph_separation_raises(spark):
    """A covariate that perfectly orders the (all-event) times has a
    monotone likelihood: Newton runs away and must be refused."""
    from moz_datapipeline_spark.operators.analytics import cox_ph

    rows = [(float(i + 1), 1, float(i)) for i in range(12)]
    df = spark.createDataFrame(rows, "t double, e int, x double")
    with pytest.raises(ValueError, match="monotone"):
        cox_ph(df, "t", "e", "x", iterations=40)


def test_logit_fit_closed_form_binary_x(spark):
    """Binary covariate: the logistic MLE has a CLOSED FORM —
    intercept = log odds(x=0), beta = log OR, SE(beta) =
    sqrt(1/a+1/b+1/c+1/d).  2x2 table 30/70 vs 60/40."""
    import math

    from moz_datapipeline_spark.operators.analytics import logit_fit

    rows = ([(1.0, 0.0)] * 30 + [(0.0, 0.0)] * 70
            + [(1.0, 1.0)] * 60 + [(0.0, 1.0)] * 40)
    df = spark.createDataFrame(rows, "y double, x double")
    r = logit_fit(df, "y", "x").collect()[0]
    assert r.n == 200 and r.n_pos == 90
    assert r.intercept == round(math.log(3 / 7), 6)
    assert r.beta == round(math.log(3.5), 6)
    assert r.odds_ratio == 3.5
    assert r.se_beta == round(
        math.sqrt(1 / 30 + 1 / 70 + 1 / 60 + 1 / 40), 6
    )
    assert r.significant is True


def test_logit_fit_degenerates_and_guards(spark):
    from moz_datapipeline_spark.operators.analytics import logit_fit

    # single-class outcome: NULL estimates
    ones = spark.createDataFrame(
        [(1.0, float(i)) for i in range(10)], "y double, x double"
    )
    r = logit_fit(ones, "y", "x").collect()[0]
    assert r.n == 10 and r.n_pos == 10 and r.beta is None

    # constant covariate: singular Hessian -> NULL estimates
    const = spark.createDataFrame(
        [(float(i % 2), 3.0) for i in range(10)], "y double, x double"
    )
    r = logit_fit(const, "y", "x").collect()[0]
    assert r.beta is None

    # non-binary y refused
    bad = spark.createDataFrame([(2.0, 1.0)], "y double, x double")
    with pytest.raises(ValueError, match="0/1"):
        logit_fit(bad, "y", "x")

    # perfect separation refused
    sep = spark.createDataFrame(
        [(0.0, float(i)) for i in range(8)]
        + [(1.0, float(i + 8)) for i in range(8)],
        "y double, x double",
    )
    with pytest.raises(ValueError, match="separates"):
        logit_fit(sep, "y", "x", iterations=40)


def test_psm_att_hand_computed(spark):
    """Treated at scores .30/.52/.90 with outcomes 10/20/30; controls
    at .28(y=5), .33(y=7), .50(y=12), .95(y=99).  caliper=.05:
    t1(.30) -> nearest .28 (d=.02 beats .33's d=.03) -> diff 5;
    t2(.52) -> .50 -> diff 8; t3(.90) -> .95 is d=.05 <= caliper ->
    diff -69.  ATT = (5+8-69)/3."""
    from moz_datapipeline_spark.operators.analytics import psm_att

    rows = [
        (0.30, 1, 10.0), (0.52, 1, 20.0), (0.90, 1, 30.0),
        (0.28, 0, 5.0), (0.33, 0, 7.0), (0.50, 0, 12.0),
        (0.95, 0, 99.0),
    ]
    df = spark.createDataFrame(rows, "s double, tr int, y double")
    r = psm_att(df, "s", "tr", "y", caliper=0.05).collect()[0]
    assert r.n_treated == 3 and r.n_control == 4
    assert r.n_matched == 3 and r.n_unmatched == 0
    assert r.att == round((5.0 + 8.0 - 69.0) / 3.0, 6)

    # tighter caliper drops the .90 treated (nearest is .05 away)
    r = psm_att(df, "s", "tr", "y", caliper=0.04).collect()[0]
    assert r.n_matched == 2 and r.n_unmatched == 1
    assert r.att == round((5.0 + 8.0) / 2.0, 6)

    with pytest.raises(ValueError, match="caliper"):
        psm_att(df, "s", "tr", "y", caliper=0.0)


def test_psm_att_with_replacement_and_ties(spark):
    """Two treated share one nearest control (replacement); an exact
    distance tie breaks to the smaller control score."""
    from moz_datapipeline_spark.operators.analytics import psm_att

    rows = [
        (0.40, 1, 10.0), (0.42, 1, 20.0),  # both nearest to .41
        (0.41, 0, 4.0),
        (0.60, 1, 9.0),  # controls at .55 and .65: tie -> .55 (y=1)
        (0.55, 0, 1.0), (0.65, 0, 2.0),
    ]
    df = spark.createDataFrame(rows, "s double, tr int, y double")
    r = psm_att(df, "s", "tr", "y", caliper=0.1).collect()[0]
    assert r.n_matched == 3
    assert r.att == round((6.0 + 16.0 + 8.0) / 3.0, 6)


def test_shapley_attribution_hand_computed(spark):
    """Sets {a}x2 conv, {a,b}x1 conv, {a,b,c}x1 conv, {b}x1 no-conv:
    phi_a = 2 + 1/2 + 1/3; phi_b = 1/2 + 1/3; phi_c = 1/3.  Credit
    conserves: sum(phi) = total conversions = 4."""
    from moz_datapipeline_spark.operators.analytics import (
        shapley_attribution,
    )

    rows = [
        (["a"], 1), (["a"], 1),
        (["a", "b"], 1),
        (["c", "b", "a", "a"], 1),  # dup + order collapse
        (["b"], 0),
    ]
    df = spark.createDataFrame(rows, "chs array<string>, conv int")
    out = {
        r.channel: r
        for r in shapley_attribution(df, "chs", "conv").collect()
    }
    assert out["a"].shapley_credit == round(2 + 0.5 + 1 / 3, 6)
    assert out["b"].shapley_credit == round(0.5 + 1 / 3, 6)
    assert out["c"].shapley_credit == round(1 / 3, 6)
    total = sum(r.shapley_credit for r in out.values())
    assert abs(total - 4.0) < 1e-5
    assert out["b"].n_exposed == 3 and out["b"].n_coalitions == 2
    # channel only in non-converting sets still appears, credit 0
    rows2 = rows + [(["d"], 0)]
    df2 = spark.createDataFrame(rows2, "chs array<string>, conv int")
    out2 = {
        r.channel: r
        for r in shapley_attribution(df2, "chs", "conv").collect()
    }
    assert out2["d"].shapley_credit == 0.0 and out2["d"].n_exposed == 1


def test_markov_attribution_hand_computed(spark):
    """Chain: START->a (2/3), START->b (1/3); a->b (1/2), a->LOSS
    (1/2); b->CONV (1).  p_base = 2/3; removing a -> 1/3 (effect
    .5); removing b -> 0 (effect 1).  2 conversions split 2/3 : 4/3."""
    from moz_datapipeline_spark.operators.analytics import (
        markov_attribution,
    )

    rows = [
        (["a", "b"], 1),
        (["a"], 0),
        (["b"], 1),
    ]
    df = spark.createDataFrame(rows, "path array<string>, conv int")
    out = {
        r.channel: r
        for r in markov_attribution(df, "path", "conv").collect()
    }
    assert abs(out["a"].p_base - 2 / 3) < 1e-6
    assert abs(out["a"].p_removed - 1 / 3) < 1e-6
    assert abs(out["a"].removal_effect - 0.5) < 1e-6
    assert out["b"].p_removed == 0.0
    assert out["b"].removal_effect == 1.0
    assert abs(out["a"].attributed_conversions - 2 / 3) < 1e-5
    assert abs(out["b"].attributed_conversions - 4 / 3) < 1e-5

    # self-loops collapse: [a, a, b] behaves like [a, b]
    rows2 = [(["a", "a", "b"], 1), (["a"], 0), (["b"], 1)]
    df2 = spark.createDataFrame(rows2, "path array<string>, conv int")
    out2 = {
        r.channel: r
        for r in markov_attribution(df2, "path", "conv").collect()
    }
    assert abs(out2["a"].removal_effect - 0.5) < 1e-6

    # zero conversions: NULL effects, loudly typed
    none = spark.createDataFrame(
        [(["a"], 0)], "path array<string>, conv int"
    )
    r = markov_attribution(none, "path", "conv").collect()
    assert len(r) == 1 and r[0].p_removed is None

    with pytest.raises(ValueError, match="iterations"):
        markov_attribution(df, "path", "conv", iterations=0)


def test_ipw_ate_hand_computed(spark):
    """Confounded toy: stratum A (e=.8) treated y=10/control y=8;
    stratum B (e=.2) treated y=4/control y=2.  True effect +2 in
    both strata; the naive diff is biased, IPW recovers +2."""
    from moz_datapipeline_spark.operators.analytics import ipw_ate

    rows = []
    # stratum A: 8 treated, 2 control at e=0.8
    rows += [(1, 10.0, 0.8)] * 8 + [(0, 8.0, 0.8)] * 2
    # stratum B: 2 treated, 8 control at e=0.2
    rows += [(1, 4.0, 0.2)] * 2 + [(0, 2.0, 0.2)] * 8
    df = spark.createDataFrame(rows, "t int, y double, e double")
    r = ipw_ate(df, "t", "y", "e").collect()[0]
    # mu1 = (8*10/.8 + 2*4/.2) / (8/.8 + 2/.2) = 140/20 = 7
    # mu0 = (2*8/.2 + 8*2/.8) / (2/.2 + 8/.8) = 100/20 = 5
    assert r.mu_treated == 7.0 and r.mu_control == 5.0
    assert r.ate_ipw == 2.0
    # naive diff for contrast: (8*10+2*4)/10 - (2*8+8*2)/10 = 8.8-3.2
    assert r.n == 20 and r.n_treated == 10 and r.n_trimmed == 0

    # extreme scores trim
    rows2 = rows + [(1, 999.0, 0.001), (0, -999.0, 0.9999)]
    df2 = spark.createDataFrame(rows2, "t int, y double, e double")
    r2 = ipw_ate(df2, "t", "y", "e", trim=0.01).collect()[0]
    assert r2.n_trimmed == 2 and r2.ate_ipw == 2.0

    with pytest.raises(ValueError, match="trim"):
        ipw_ate(df, "t", "y", "e", trim=0.7)


def test_cuped_adjust_recovers_effect_and_shrinks_variance(spark):
    """y = x + effect*treat + tiny noise with a strong pre-period
    covariate: CUPED's theta ~ 1, the adjusted diff stays ~ the
    planted effect, and the variance reduction is large.  Numpy
    cross-check of theta and both diffs (exact, same moments)."""
    import numpy as np

    from moz_datapipeline_spark.operators.analytics import cuped_adjust

    rng = np.random.default_rng(7)
    n = 400
    x = rng.normal(100.0, 20.0, n).round(2)
    treat = np.array([i % 2 for i in range(n)])
    y = (x + 3.0 * treat + rng.normal(0, 1.0, n)).round(2)
    rows = [
        ("t" if t else "c", float(yy), float(xx))
        for t, yy, xx in zip(treat, y, x)
    ]
    df = spark.createDataFrame(rows, "g string, y double, x double")
    r = cuped_adjust(df, "g", "y", "x", "t", "c").collect()[0]

    theta = np.cov(y, x, bias=True)[0, 1] / np.var(x)
    adj = y - theta * (x - x.mean())
    exp_diff = adj[treat == 1].mean() - adj[treat == 0].mean()
    assert r.theta == pytest.approx(theta, abs=1e-6)
    assert r.diff_cuped == pytest.approx(exp_diff, abs=1e-6)
    assert r.diff_raw == pytest.approx(
        y[treat == 1].mean() - y[treat == 0].mean(), abs=1e-6
    )
    assert abs(r.diff_cuped - 3.0) < 0.3
    assert r.var_reduction > 0.95
    assert r.significant is True

    # constant covariate: theta 0, CUPED == raw
    const = spark.createDataFrame(
        [("t", 5.0, 1.0), ("t", 6.0, 1.0), ("c", 4.0, 1.0),
         ("c", 3.0, 1.0)],
        "g string, y double, x double",
    )
    rc = cuped_adjust(const, "g", "y", "x", "t", "c").collect()[0]
    assert rc.theta == 0.0 and rc.diff_cuped == rc.diff_raw


def test_conformal_intervals_hand_computed(spark):
    """9 calibration residuals |y-yhat| = 1..9, alpha=0.2:
    k = ceil(10*0.8) = 8 -> q = 8.  Intervals are yhat +/- 8."""
    from moz_datapipeline_spark.operators.mleval import (
        conformal_intervals,
    )

    cal = spark.createDataFrame(
        [(float(10 + i), 10.0) for i in range(1, 10)],
        "y double, yhat double",
    )
    pred = spark.createDataFrame(
        [(1, 100.0), (2, 50.5)], "id long, yhat double"
    )
    out = {
        r.id: r
        for r in conformal_intervals(
            cal, pred, "y", "yhat", alpha=0.2
        ).collect()
    }
    assert out[1].conformal_lo == 92.0 and out[1].conformal_hi == 108.0
    assert out[2].conformal_lo == 42.5 and out[2].conformal_hi == 58.5

    # guarantee-impossible: n=3, alpha=0.1 -> k=ceil(4*.9)=4 > 3
    small = spark.createDataFrame(
        [(1.0, 0.0), (2.0, 0.0), (3.0, 0.0)], "y double, yhat double"
    )
    with pytest.raises(ValueError, match="cannot support"):
        conformal_intervals(small, pred, "y", "yhat", alpha=0.1)
    with pytest.raises(ValueError, match="alpha"):
        conformal_intervals(cal, pred, "y", "yhat", alpha=1.5)


def test_regression_discontinuity_noise_free_jump(spark):
    """y = 2 + 0.5x below the cutoff, y = 7 + 1.5(x-10) at/above
    (cutoff 10): exact lines -> intercepts 7 (left limit 2+5) and 7?
    No: left line AT x=10 is 2+0.5*10 = 7; right intercept is 7 ->
    effect 0?  Use a real jump: right = 12 + 1.5(x-10) -> effect 5."""
    from moz_datapipeline_spark.operators.analytics import (
        regression_discontinuity,
    )

    rows = []
    for i in range(20):  # left: x in [5, 9.75]
        xv = 5.0 + i * 0.25
        rows.append((xv, 2.0 + 0.5 * xv))
    for i in range(20):  # right: x in [10, 14.75]
        xv = 10.0 + i * 0.25
        rows.append((xv, 12.0 + 1.5 * (xv - 10.0)))
    df = spark.createDataFrame(rows, "x double, y double")
    r = regression_discontinuity(
        df, "x", "y", cutoff=10.0, bandwidth=5.0
    ).collect()[0]
    assert r.n_left == 20 and r.n_right == 20
    # left intercept at the cutoff: 2 + 0.5*10 = 7; right: 12
    assert r.intercept_left == pytest.approx(7.0, abs=1e-6)
    assert r.intercept_right == pytest.approx(12.0, abs=1e-6)
    assert r.slope_left == pytest.approx(0.5, abs=1e-6)
    assert r.slope_right == pytest.approx(1.5, abs=1e-6)
    assert r.effect == pytest.approx(5.0, abs=1e-6)

    # bandwidth filters: only |x-10|<=2 -> 8+9 points, same lines
    r2 = regression_discontinuity(
        df, "x", "y", cutoff=10.0, bandwidth=2.0
    ).collect()[0]
    assert r2.n_left == 8 and r2.n_right == 9
    assert r2.effect == pytest.approx(5.0, abs=1e-6)

    with pytest.raises(ValueError, match="bandwidth"):
        regression_discontinuity(df, "x", "y", 10.0, 0.0)


def test_regression_discontinuity_se_vs_numpy(spark):
    """Noisy jump: cross-check intercepts/slopes/SEs against a
    dense-matrix OLS per side (conventional variance)."""
    import numpy as np

    from moz_datapipeline_spark.operators.analytics import (
        regression_discontinuity,
    )

    rng = np.random.default_rng(11)
    xl = rng.uniform(-5, 0, 150)
    xr = rng.uniform(0, 5, 140)
    yl = 1.0 + 0.3 * xl + rng.normal(0, 0.5, 150)
    yr = 4.0 + 0.8 * xr + rng.normal(0, 0.5, 140)
    rows = [(float(a), float(b)) for a, b in zip(xl, yl)] + [
        (float(a), float(b)) for a, b in zip(xr, yr)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    r = regression_discontinuity(
        df, "x", "y", cutoff=0.0, bandwidth=5.0
    ).collect()[0]

    def ols(x, y):
        n = len(x)
        X = np.stack([np.ones(n), x], axis=1)
        coef, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ coef
        sigma2 = (resid**2).sum() / (n - 2)
        cov = sigma2 * np.linalg.inv(X.T @ X)
        return coef, np.sqrt(cov[0, 0])

    (al, bl), sal = ols(xl, yl)
    (ar, br), sar = ols(xr, yr)
    assert r.intercept_left == pytest.approx(al, abs=1e-5)
    assert r.intercept_right == pytest.approx(ar, abs=1e-5)
    assert r.slope_left == pytest.approx(bl, abs=1e-5)
    assert r.slope_right == pytest.approx(br, abs=1e-5)
    assert r.effect == pytest.approx(ar - al, abs=1e-5)
    assert r.se == pytest.approx(
        float(np.sqrt(sal**2 + sar**2)), abs=1e-5
    )
    assert r.significant is True


def test_cumulative_incidence_hand_computed(spark):
    """5 subjects, two causes: t=1 cause a (n=5, S(1-)=1 -> CIF_a =
    .2); t=2 cause b (n=4, S(2-)=.8 -> CIF_b = .2); t=3 censored;
    t=4 cause a (n=2, S(4-)=.8*.75=.6 -> CIF_a = .2+.3=.5); t=5
    censored.  Identity: CIF_a + CIF_b = 1 - S."""
    from moz_datapipeline_spark.operators.analytics import (
        cumulative_incidence,
    )

    rows = [
        (1.0, "a"), (2.0, "b"), (3.0, "0"), (4.0, "a"), (5.0, "0"),
    ]
    df = spark.createDataFrame(rows, "t double, e string")
    out = {
        (r.duration, r.event_type): r
        for r in cumulative_incidence(df, "t", "e").collect()
    }
    r1 = out[(1.0, "a")]
    assert r1.n_at_risk == 5 and r1.cif == pytest.approx(0.2)
    r2 = out[(2.0, "b")]
    assert r2.n_at_risk == 4 and r2.cif == pytest.approx(0.2)
    r4 = out[(4.0, "a")]
    assert r4.n_at_risk == 2
    # S(4-) = (1-1/5)(1-1/4) = .6; inc = .6 * 1/2 = .3; CIF_a = .5
    assert r4.cif == pytest.approx(0.5)
    # decomposition identity at the horizon: .5 + .2 = 1 - S(4)
    # S(4) = .6 * (1 - 1/2) = .3 -> 1 - .3 = .7 = .5 + .2
    assert r4.cif + r2.cif == pytest.approx(0.7)


def test_cumulative_incidence_single_cause_equals_km(spark):
    """With ONE cause and no competition, CIF = 1 - KM exactly."""
    from moz_datapipeline_spark.operators.analytics import (
        cumulative_incidence,
        kaplan_meier,
    )

    from pyspark.sql import functions as F

    rows = [(float(t), e) for t, e in
            [(1, "x"), (2, "0"), (3, "x"), (3, "x"), (4, "0"),
             (5, "x"), (6, "0")]]
    df = spark.createDataFrame(rows, "t double, e string")
    cif = {
        r.duration: r.cif
        for r in cumulative_incidence(df, "t", "e").collect()
    }
    km_in = df.select(
        "t", (F.col("e") != "0").cast("int").alias("ev")
    )
    km = {
        r.duration: r.survival
        for r in kaplan_meier(km_in, "t", "ev").collect()
    }
    for t, c in cif.items():
        assert c == pytest.approx(1.0 - km[t], abs=2e-6), t


def test_poisson_fit_closed_form_binary_x(spark):
    """Binary covariate: the Poisson MLE has a closed form —
    intercept = log(mean rate | x=0), beta = log rate ratio,
    SE(beta) = sqrt(1/sum_y1 + 1/sum_y0)."""
    import math

    from moz_datapipeline_spark.operators.analytics import poisson_fit

    # x=0: 50 units, 100 events total (rate 2); x=1: 40 units,
    # 240 events (rate 6) -> RR 3
    rows = [(2.0, 0.0)] * 50 + [(6.0, 1.0)] * 40
    df = spark.createDataFrame(rows, "y double, x double")
    r = poisson_fit(df, "y", "x").collect()[0]
    assert r.n == 90 and r.total_events == 340
    assert r.intercept == round(math.log(2.0), 6)
    assert r.beta == round(math.log(3.0), 6)
    assert r.rate_ratio == 3.0
    assert r.se_beta == round(math.sqrt(1 / 240 + 1 / 100), 6)
    assert r.significant is True


def test_poisson_fit_degenerates(spark):
    from moz_datapipeline_spark.operators.analytics import poisson_fit

    zeros = spark.createDataFrame(
        [(0.0, float(i)) for i in range(10)], "y double, x double"
    )
    r = poisson_fit(zeros, "y", "x").collect()[0]
    assert r.n == 10 and r.beta is None

    neg = spark.createDataFrame([(-1.0, 1.0)], "y double, x double")
    with pytest.raises(ValueError, match="nonnegative"):
        poisson_fit(neg, "y", "x")

    const = spark.createDataFrame(
        [(float(i % 3), 2.0) for i in range(10)], "y double, x double"
    )
    r = poisson_fit(const, "y", "x").collect()[0]
    assert r.beta is None


def test_twfe_fit_recovers_effect_vs_numpy(spark):
    """Balanced 20x12 panel, y = 2.5x + unit FE + time FE + noise:
    the within estimator recovers beta; cross-checked against a
    dense dummy-variable OLS (the exact FE projection)."""
    import numpy as np

    from moz_datapipeline_spark.operators.analytics import twfe_fit

    rng = np.random.default_rng(3)
    nu, nt = 20, 12
    alpha = rng.normal(0, 5, nu)
    gamma = rng.normal(0, 3, nt)
    rows = []
    xs, ys, uu, tt = [], [], [], []
    for i in range(nu):
        for t in range(nt):
            xv = rng.normal(0, 1)
            yv = 2.5 * xv + alpha[i] + gamma[t] + rng.normal(0, 0.5)
            rows.append((f"u{i}", f"t{t}", float(xv), float(yv)))
            xs.append(xv); ys.append(yv); uu.append(i); tt.append(t)
    df = spark.createDataFrame(rows, "u string, t string, x double, y double")
    r = twfe_fit(df, "u", "t", "x", "y").collect()[0]
    assert r.n == nu * nt and r.n_units == nu and r.n_times == nt

    # dense dummy OLS (drop one dummy per factor + intercept)
    X = np.zeros((nu * nt, 1 + (nu - 1) + (nt - 1) + 1))
    X[:, 0] = 1.0
    X[:, 1] = xs
    for k, (i, t) in enumerate(zip(uu, tt)):
        if i > 0:
            X[k, 1 + i] = 1.0
        if t > 0:
            X[k, nu + 1 + t - 1] = 1.0
    yv = np.array(ys)
    coef, *_ = np.linalg.lstsq(X, yv, rcond=None)
    resid = yv - X @ coef
    dof = nu * nt - X.shape[1]
    cov = (resid**2).sum() / dof * np.linalg.inv(X.T @ X)
    assert r.beta == pytest.approx(coef[1], abs=1e-5)
    assert r.se == pytest.approx(float(np.sqrt(cov[1, 1])), abs=1e-5)
    assert abs(r.beta - 2.5) < 0.15
    assert r.significant is True


def test_twfe_fit_unbalanced_raises(spark):
    from moz_datapipeline_spark.operators.analytics import twfe_fit

    rows = [("a", "1", 1.0, 1.0), ("a", "2", 2.0, 2.0),
            ("b", "1", 3.0, 3.0)]  # b missing t=2
    df = spark.createDataFrame(rows, "u string, t string, x double, y double")
    with pytest.raises(ValueError, match="unbalanced"):
        twfe_fit(df, "u", "t", "x", "y")


def test_rake_weights_hits_both_margins(spark):
    """Counts [[30,10],[20,40]], row targets (60,40), col targets
    (50,50): after raking the weighted margins hit the targets to
    within the 6-dp rounding; numpy IPF cross-check agrees."""
    import numpy as np

    from moz_datapipeline_spark.operators.analytics import rake_weights

    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 20 + [("b", "y")] * 40)
    df = spark.createDataFrame(rows, "r string, c string")
    out = {
        (w.row_cat, w.col_cat): w
        for w in rake_weights(
            df, "r", "c", {"a": 60, "b": 40}, {"x": 50, "y": 50}
        ).collect()
    }
    # weighted margins
    ra = out[("a", "x")].weight * 30 + out[("a", "y")].weight * 10
    rb = out[("b", "x")].weight * 20 + out[("b", "y")].weight * 40
    cx = out[("a", "x")].weight * 30 + out[("b", "x")].weight * 20
    cy = out[("a", "y")].weight * 10 + out[("b", "y")].weight * 40
    assert ra == pytest.approx(60, abs=1e-3)
    assert rb == pytest.approx(40, abs=1e-3)
    assert cx == pytest.approx(50, abs=1e-3)
    assert cy == pytest.approx(50, abs=1e-3)

    # numpy IPF replay
    nmat = np.array([[30.0, 10.0], [20.0, 40.0]])
    w = np.ones((2, 2))
    rt = np.array([60.0, 40.0]); ct = np.array([50.0, 50.0])
    for _ in range(20):
        rs = (nmat * w).sum(axis=1)
        w *= (rt / rs)[:, None]
        cs = (nmat * w).sum(axis=0)
        w *= (ct / cs)[None, :]
    assert out[("a", "x")].weight == pytest.approx(w[0, 0], abs=1e-6)
    assert out[("b", "y")].weight == pytest.approx(w[1, 1], abs=1e-6)


def test_rake_weights_guards(spark):
    from moz_datapipeline_spark.operators.analytics import rake_weights

    df = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "r string, c string"
    )
    with pytest.raises(ValueError, match="must agree on the total"):
        rake_weights(df, "r", "c", {"a": 10, "b": 10}, {"x": 5, "y": 6})
    with pytest.raises(ValueError, match="missing from the\n"
                       ".*targets|missing from the targets"):
        rake_weights(df, "r", "c", {"a": 10}, {"x": 5, "y": 5})
    with pytest.raises(ValueError, match="unreachable"):
        rake_weights(
            df, "r", "c",
            {"a": 5, "b": 5, "z": 10}, {"x": 10, "y": 10},
        )
