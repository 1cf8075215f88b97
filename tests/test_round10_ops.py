"""Round-10 fixes and operators: NULL-group MAD fallback, floor-grid
bucket snapping for negative timestamps, exact-quantile recursion."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_mad_outliers_null_group_kept(spark):
    """A NULL group key is a group under GROUP BY semantics; the
    fallback path (exact-quantiles declines on NULL keys) must keep
    it via null-safe joins, not drop it through an inner equi-join."""
    from moz_datapipeline_spark.operators.analytics import mad_outliers

    rows = [
        ("a", 1.0), ("a", 2.0), ("a", 3.0),
        (None, 10.0), (None, 20.0), (None, 30.0), (None, 1000.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r.g: r for r in mad_outliers(df, "x", group_cols=["g"]).collect()}
    assert set(got) == {"a", None}
    assert got["a"].median == 2.0 and got["a"].mad == 1.0
    # NULL group: values 10,20,30,1000 -> median 25, deviations
    # 15,5,5,975 -> mad 10; robust z of 1000 = 975/(1.4826*10) = 65.8
    assert got[None].n == 4
    assert got[None].median == 25.0
    assert got[None].mad == 10.0
    assert got[None].n_outliers == 1


def test_ohlc_twap_gapfill_negative_timestamps(spark):
    """Bucket snapping floors toward -inf (t - pmod(t, step)), the
    DuckDB `//` convention — a pre-1970 timestamp lands in the bucket
    BELOW zero, not one bucket high via truncate-toward-zero."""
    from moz_datapipeline_spark.operators.temporal import (
        gap_fill,
        ohlc_bars,
        twap,
    )

    rows = [("a", -3, 5.0), ("a", -13, 1.0), ("a", 2, 7.0)]
    df = spark.createDataFrame(rows, "g string, t long, v double")

    bars = {r.bucket_start for r in ohlc_bars(df, "g", "t", "v", 10).collect()}
    assert bars == {-20, -10, 0}

    tw = {r.bucket_start for r in twap(df, "g", "t", "v", 10).collect()}
    assert tw == {-20, -10, 0}

    gf = gap_fill(df, "g", "t", "v", step=10, method="locf")
    grid = sorted(r.t for r in gf.collect())
    assert grid == [-20, -10, 0]


def test_holt_linear_group_size_guard(spark):
    """A pathological long series must fail LOUDLY in-kernel, not
    stall an executor materializing Python lists (mann_kendall's
    max_group_rows contract)."""
    import pytest

    from moz_datapipeline_spark.operators.temporal import holt_linear

    df = spark.range(100).select(
        F.lit("g").alias("g"),
        F.col("id").alias("t"),
        F.col("id").cast("double").alias("v"),
    )
    # under the cap: runs fine
    assert holt_linear(df, "g", "t", "v", max_group_rows=100).count() == 100
    # over the cap: loud error naming the group
    with pytest.raises(Exception) as ei:
        holt_linear(df, "g", "t", "v", max_group_rows=99).count()
    assert "max_group_rows" in str(ei.value)


def test_attribution_multi_microbatch_matches_batch(spark, tmp_path):
    """Stream-stream attribution with clicks ARRIVING ACROSS
    MICRO-BATCHES: view state must persist in the state store and join
    clicks from a later batch; the final emitted set equals the batch
    twin over the union of all rows (the ohlc_rollup twin-test
    convention, extended to multi-batch state carry)."""
    import json

    from moz_datapipeline_spark.streaming.events import (
        stream_stream_attribution,
    )

    vdir, cdir = tmp_path / "views", tmp_path / "clicks"
    vdir.mkdir()
    cdir.mkdir()
    chk = str(tmp_path / "attr_chk")

    views = [
        {"user_id": 1, "ts": "2024-01-01 00:00:00"},
        {"user_id": 2, "ts": "2024-01-01 00:02:00"},
    ]
    clicks_b1 = [
        {"user_id": 1, "click_id": 100, "ts": "2024-01-01 00:05:00"},
    ]
    # batch 2: a click landing within user 2's view window — joins
    # against state written in batch 1
    clicks_b2 = [
        {"user_id": 2, "click_id": 200, "ts": "2024-01-01 00:10:00"},
        {"user_id": 1, "click_id": 300, "ts": "2024-01-01 01:00:00"},
    ]

    def dump(path, rows):
        with open(path, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    dump(vdir / "v1.json", views)
    dump(cdir / "c1.json", clicks_b1)

    vschema = "user_id long, ts string"
    cschema = "user_id long, click_id long, ts string"

    def load(path, schema, stream):
        reader = (
            spark.readStream.schema(schema).json(str(path))
            if stream
            else spark.read.schema(schema).json(str(path))
        )
        return reader.withColumn("ts", F.to_timestamp("ts"))

    out = stream_stream_attribution(
        load(vdir, vschema, True), load(cdir, cschema, True)
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_mb_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        dump(cdir / "c2.json", clicks_b2)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.click_id, str(r.view_ts))
        for r in spark.table("attr_mb_out").collect()
    }
    batch = stream_stream_attribution(
        load(vdir, vschema, False),
        spark.createDataFrame(
            [
                (r["user_id"], r["click_id"], r["ts"])
                for r in clicks_b1 + clicks_b2
            ],
            cschema,
        ).withColumn("ts", F.to_timestamp("ts")),
    )
    want = {(r.click_id, str(r.view_ts)) for r in batch.collect()}
    assert got == want
    # click 200 joined across micro-batches; click 300 out of window
    assert {c for c, _ in got} == {100, 200}


def test_sessionize_streaming_matches_batch_twin(spark, tmp_path):
    """session_window (streaming) and the lag+running-sum batch twin
    must cut identical sessions on the same fixture: same per-user
    session count and same per-session event counts."""
    import json

    from moz_datapipeline_spark.streaming.events import (
        sessionize_batch,
        sessionize_streaming,
    )

    src = tmp_path / "sess_twin_in"
    src.mkdir()
    chk = str(tmp_path / "sess_twin_chk")
    rows = [
        {"ts": "2024-01-01 00:00:00", "user_id": 1},
        {"ts": "2024-01-01 00:20:00", "user_id": 1},  # same session
        {"ts": "2024-01-01 01:30:00", "user_id": 1},  # new session
        {"ts": "2024-01-01 00:05:00", "user_id": 2},
        {"ts": "2024-01-01 00:50:00", "user_id": 2},  # gap 45m > 30m
        # watermark driver closes every session above
        {"ts": "2024-01-01 09:00:00", "user_id": 99},
    ]
    with open(src / "b1.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("ts string, user_id long")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        sessionize_streaming(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_twin_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.user_id, r.n_events)
        for r in spark.table("sess_twin_out").collect()
        if r.user_id != 99
    )

    batch = spark.createDataFrame(
        [(r["user_id"], r["ts"]) for r in rows if r["user_id"] != 99],
        "user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = sorted(
        (r.user_id, r.n_events)
        for r in sessionize_batch(batch, gap_seconds=1800)
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    assert got == want


def _builtin_percentiles(spark, df, col, probs):
    arr = ", ".join(str(p) for p in probs)
    return list(
        df.agg(
            F.expr(f"percentile({col}, array({arr}))").alias("q")
        ).collect()[0]["q"]
    )


def test_exact_quantiles_heavy_ties_recursive(spark):
    """Heavy ties used to trip the candidate cap -> None -> builtin
    single-task sort.  Now the all-tied cell resolves from the
    histogram min==max with zero extra passes; a cap-tripping mixed
    cell recurses and still returns the builtin's exact values."""
    from moz_datapipeline_spark.operators.ranges import exact_quantiles

    # 50k copies of 7.0 + a spread tail; cap of 1000 forces recursion
    ties = spark.range(50_000).select(F.lit(7.0).alias("x"))
    tail = spark.range(5_000).select(
        (F.col("id").cast("double") / 100.0 + 8.0).alias("x")
    )
    low = spark.range(3_000).select(
        (F.col("id").cast("double") / 1000.0).alias("x")
    )
    df = ties.unionAll(tail).unionAll(low)
    probs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    got = exact_quantiles(df, "x", probs, candidate_cap=1000)
    assert got is not None
    want = _builtin_percentiles(spark, df, "x", probs)
    assert got == want  # bit-identical, not approx


def test_exact_quantiles_skew_recursive(spark):
    """Continuous but extremely skewed: 99.9% of rows in one histogram
    bucket.  The needed bucket exceeds the cap; refinement into its
    true min/max must isolate the order statistics exactly."""
    from moz_datapipeline_spark.operators.ranges import exact_quantiles

    # values: 100k in [0, 1e-6), one row at 1e9 -> bucket 0 holds all
    dense = spark.range(100_000).select(
        (F.col("id").cast("double") * 1e-11).alias("x")
    )
    spike = spark.range(1).select(F.lit(1e9).alias("x"))
    df = dense.unionAll(spike)
    probs = [0.1, 0.5, 0.9]
    got = exact_quantiles(df, "x", probs, candidate_cap=500)
    assert got is not None
    want = _builtin_percentiles(spark, df, "x", probs)
    assert got == want


def test_exact_quantiles_grouped_capped_recursive(spark):
    """Grouped variant: an over-cap group no longer declines the whole
    call; each group's cells recurse independently."""
    from moz_datapipeline_spark.operators.ranges import (
        exact_quantiles_grouped,
    )

    a = spark.range(40_000).select(
        F.lit("a").alias("g"), F.lit(3.0).alias("x")
    )
    b = spark.range(10_000).select(
        F.lit("b").alias("g"),
        (F.col("id").cast("double") / 7.0).alias("x"),
    )
    n = spark.range(2_000).select(
        F.lit(None).cast("string").alias("g"),
        (F.col("id").cast("double")).alias("x"),
    )
    df = a.unionAll(b).unionAll(n)
    probs = [0.25, 0.5, 0.75]
    got = exact_quantiles_grouped(df, "g", "x", probs, candidate_cap=800)
    assert got is not None and set(got) == {"a", "b", None}
    for g in ("a", "b", None):
        cond = F.col("g").isNull() if g is None else (F.col("g") == g)
        want = _builtin_percentiles(spark, df.filter(cond), "x", probs)
        assert got[g] == want, g


def test_spearman_corr_reference(spark):
    from moz_datapipeline_spark.operators.analytics import spearman_corr

    # perfectly monotone (nonlinear): rho = 1
    rows = [(float(i), float(i * i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.n == 10 and r.rho == 1.0

    # reversed: rho = -1
    rows2 = [(float(i), float(-i)) for i in range(1, 11)]
    r2 = spearman_corr(
        spark.createDataFrame(rows2, "x double, y double"), "x", "y"
    ).collect()[0]
    assert r2.rho == -1.0

    # ties: x = [1,2,2,3], y = [1,3,2,4] — average ranks
    # rx = [1, 2.5, 2.5, 4]; ry = [1, 3, 2, 4]
    import math

    rx = [1.0, 2.5, 2.5, 4.0]
    ry = [1.0, 3.0, 2.0, 4.0]
    n = 4
    mx = sum(rx) / n
    my = sum(ry) / n
    cov = sum(a * b for a, b in zip(rx, ry)) - n * mx * my
    vx = sum(a * a for a in rx) - n * mx * mx
    vy = sum(b * b for b in ry) - n * my * my
    want = round(cov / math.sqrt(vx * vy), 6)
    df3 = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0)],
        "x double, y double",
    )
    r3 = spearman_corr(df3, "x", "y").collect()[0]
    assert r3.rho == want

    # constant column: NULL rho
    dfc = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0)], "x double, y double"
    )
    assert spearman_corr(dfc, "x", "y").collect()[0].rho is None


def test_cramers_v_reference(spark):
    from moz_datapipeline_spark.operators.analytics import cramers_v

    # perfect association: a == b -> v = 1
    rows = [("x", "x")] * 5 + [("y", "y")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.v == 1.0 and r.n == 10

    # independence: uniform 2x2 -> chi2 = 0, v = 0
    rows2 = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 3
    r2 = cramers_v(
        spark.createDataFrame(rows2, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r2.chi2 == 0.0 and r2.v == 0.0

    # single level: NULL v (min dim - 1 = 0)
    rows3 = [("x", "p"), ("x", "q")]
    r3 = cramers_v(
        spark.createDataFrame(rows3, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r3.v is None


def test_anova_brown_forsythe_reference(spark):
    from moz_datapipeline_spark.operators.analytics import (
        anova_oneway,
        brown_forsythe,
    )

    # groups [1,2,3], [4,5,6]: means 2,5; grand 3.5
    # SSB = 3*(1.5^2)*2 = 13.5; SSW = 2+2 = 4; F = 13.5/(4/4) = 13.5
    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = anova_oneway(df, "g", "x").collect()[0]
    assert r.k == 2 and r.n == 6
    assert r.ss_between == 13.5 and r.ss_within == 4.0
    assert r.f_stat == 13.5
    assert r.eta_sq == round(13.5 / 17.5, 6)

    # brown-forsythe on equal-spread groups: deviations from medians
    # are identical -> F = 0
    bf = brown_forsythe(df, "g", "x").collect()[0]
    assert bf.f_stat == 0.0

    # unequal spread: [0,10] vs [5,5,5,5] — deviations 5,5 vs 0,0,0,0
    rows2 = [("a", 0.0), ("a", 10.0)] + [("b", 5.0)] * 4
    bf2 = brown_forsythe(
        spark.createDataFrame(rows2, "g string, x double"), "g", "x"
    ).collect()[0]
    assert bf2.f_stat is not None and bf2.f_stat > 1e6 or bf2.f_stat is None
    # deviations: group a = [5,5] (var 0), group b = [0]*4 (var 0)
    # SSW = 0 -> NULL f (degenerate), which the when() guards
    assert bf2.f_stat is None


def test_proportion_ztest_reference(spark):
    import math

    from moz_datapipeline_spark.operators.analytics import proportion_ztest

    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 20 + [
        ("b", 0)
    ] * 80
    df = spark.createDataFrame(rows, "g string, y int")
    r = proportion_ztest(df, "g", "y", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (100, 100, 30, 20)
    p = 50 / 200
    se = math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
    assert r.z == round((0.3 - 0.2) / se, 6)
    assert r.significant == 0  # z ~ 1.63 < 1.96

    # missing arm: NULL z, row still present
    only_a = spark.createDataFrame([("a", 1)], "g string, y int")
    r2 = proportion_ztest(only_a, "g", "y", "a", "b").collect()[0]
    assert r2.n_b == 0 and r2.z is None and r2.rate_b is None


def test_classification_report_reference(spark):
    from moz_datapipeline_spark.operators.mleval import (
        classification_report,
    )

    rows = [
        (0.9, 1), (0.8, 1), (0.7, 0),   # tp tp fp
        (0.4, 1), (0.2, 0), (0.1, 0),   # fn tn tn
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    r = classification_report(df, "s", "y", threshold=0.5).collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 1, 2)
    assert r.precision == round(2 / 3, 6)
    assert r.recall == round(2 / 3, 6)
    assert r.f1 == round(2 / 3, 6)
    assert r.accuracy == round(4 / 6, 6)

    # all-negative predictions: NULL precision, recall 0
    low = classification_report(df, "s", "y", threshold=2.0).collect()[0]
    assert low.precision is None and low.recall == 0.0


def test_calibration_curve_reference(spark):
    from moz_datapipeline_spark.operators.mleval import calibration_curve

    # two bins: scores 0.1 (label 0) x4 land on the bin-1 boundary
    # ([0.1, 0.2)); scores 0.9 (label 1) x3 + 0.95 (label 0) in bin 9
    # bin 1: rate 0, mean 0.1, gap 0.1
    # bin 9: mean (0.9*3+0.95)/4 = 0.9125, rate 0.75, gap 0.1625
    rows = [(0.1, 0)] * 4 + [(0.9, 1)] * 3 + [(0.95, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = {r.bin: r for r in calibration_curve(df, "s", "y").collect()}
    assert set(got) == {1, 9}
    assert got[1].pos_rate == 0.0 and got[1].abs_gap == 0.1
    assert got[9].mean_score == 0.9125 and got[9].pos_rate == 0.75
    ece = (4 * 0.1 + 4 * 0.1625) / 8
    assert got[1].ece == round(ece, 6) == got[9].ece
    brier = (4 * 0.1**2 + 3 * 0.1**2 + 0.95**2) / 8
    # 0.1215625 is an exact rounding tie: Spark rounds half-up,
    # Python half-even — compare at the tie tolerance
    assert abs(got[1].brier - brier) < 1e-6


def test_retrieval_eval_reference(spark):
    from moz_datapipeline_spark.operators.mleval import retrieval_eval

    run = spark.createDataFrame(
        [("q1", "d1", 0.9), ("q1", "d2", 0.8), ("q1", "d3", 0.7),
         ("q2", "d1", 0.9), ("q2", "d9", 0.5)],
        "query_id string, doc_id string, score double",
    )
    qrels = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d3", 2), ("q1", "d8", 1),
         ("q2", "d9", 1)],
        "query_id string, doc_id string, rel int",
    )
    import math

    got = {
        r.query_id: r
        for r in retrieval_eval(run, qrels, k=3).collect()
    }
    # q1: ranks d1(rel1) d2(0) d3(rel2); dcg = 1/log2(2) + 2/log2(4)
    dcg = 1.0 + 2.0 / 2.0
    # ideal: d3(2), d1(1), d8(1) -> 2/log2(2)+1/log2(3)+1/log2(4)
    idcg = 2.0 + 1.0 / math.log2(3.0) + 0.5
    assert got["q1"].ndcg_k == round(dcg / idcg, 6)
    assert got["q1"].precision_k == round(2 / 3, 6)
    assert got["q1"].recall_k == round(2 / 3, 6)
    assert got["q1"].mrr_k == 1.0
    assert got["q1"].n_rel == 3
    # q2: d1(0) rank1, d9(1) rank2 -> mrr 0.5, dcg = 1/log2(3)
    assert got["q2"].mrr_k == 0.5
    assert got["q2"].ndcg_k == round((1.0 / math.log2(3.0)) / 1.0, 6)


def test_graph_structure_reference(spark):
    from moz_datapipeline_spark.graph.structure import (
        degree_assortativity,
        reciprocity,
    )
    from moz_datapipeline_spark.graph.triangles import (
        clustering_coefficient,
    )

    # triangle + pendant: 1-2, 2-3, 1-3, 3-4
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    cc = {r.node: r for r in clustering_coefficient(edges).collect()}
    assert cc[1].coefficient == 1.0 and cc[2].coefficient == 1.0
    # node 3: degree 3, 1 triangle -> 2*1/(3*2) = 1/3
    assert cc[3].degree == 3 and cc[3].coefficient == round(1 / 3, 6)
    assert cc[4].coefficient is None and cc[4].triangles == 0

    # star graph: hub degree n, leaves degree 1 -> disassortative
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r.n_edges == 5 and r.assortativity == -1.0

    # reciprocity: 1->2, 2->1, 1->3
    d = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "src long, dst long"
    )
    rr = reciprocity(d).collect()[0]
    assert (rr.n_edges, rr.n_reciprocated) == (3, 2)
    assert rr.reciprocity == round(2 / 3, 6)


def test_zipf_fit_reference(spark):
    import math

    from moz_datapipeline_spark.operators.text import zipf_fit

    # construct exact zipf s=1: term t_r appears round(1200/r) times
    rows = []
    for r in range(1, 6):
        rows += [(f"t{r} " * (1200 // r)).strip(),] * 1
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    out = zipf_fit(df, "text", top_n=5).collect()[0]
    assert out.n_terms == 5
    # freqs 1200, 600, 400, 300, 240 — exactly 1200/r
    assert abs(out.exponent - 1.0) < 1e-6
    assert out.r2 == 1.0


def test_tukey_hsd_reference(spark):
    import math

    from moz_datapipeline_spark.operators.analytics import tukey_hsd

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 4.0), ("b", 5.0), ("b", 6.0),
            ("c", 7.0), ("c", 8.0), ("c", 9.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {
        (r.group_a, r.group_b): r for r in tukey_hsd(df, "g", "x").collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    # MSW: each group SS = 2, df = 9 - 3 = 6 -> 6/6 = 1
    se = math.sqrt(1.0 / 2.0 * (1 / 3 + 1 / 3))
    r = got[("a", "c")]
    assert r.mean_diff == -6.0
    assert r.se == round(se, 6)
    assert r.q_stat == round(6.0 / se, 6)


def test_cohens_d_reference(spark):
    import math

    from moz_datapipeline_spark.operators.analytics import cohens_d

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 5.0), ("b", 6.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = cohens_d(df, "g", "x", "a", "b").collect()[0]
    # sample vars both 1 -> pooled sd = 1; d = (2 - 6)/1 = -4
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.pooled_sd == 1.0 and r.d == -4.0

    # missing arm -> NULL d, row kept
    r2 = cohens_d(
        df.filter("g = 'a'"), "g", "x", "a", "b"
    ).collect()[0]
    assert r2.n_b == 0 and r2.d is None


def test_moments_profile_reference(spark):
    from moz_datapipeline_spark.operators.analytics import moments_profile

    # symmetric values: skewness 0; uniform-ish kurtosis < 0
    rows = [("g", v) for v in [1.0, 2.0, 3.0, 4.0, 5.0]]
    df = spark.createDataFrame(rows, "g string, x double")
    r = moments_profile(df, "g", "x").collect()[0]
    assert r.mean == 3.0
    assert r.stddev == round((2.0) ** 0.5, 6)  # population var = 2
    assert r.skewness == 0.0
    # m4 = (16+1+0+1+16)/5 = 6.8; kurt = 6.8/4 - 3 = -1.3
    assert r.kurtosis == -1.3

    # constant group: NULL shape stats
    rc = moments_profile(
        spark.createDataFrame([("g", 2.0)] * 3, "g string, x double"),
        "g",
        "x",
    ).collect()[0]
    assert rc.stddev is None and rc.skewness is None


def test_pythagorean_means_reference(spark):
    from moz_datapipeline_spark.operators.analytics import (
        pythagorean_means,
    )

    rows = [("g", 1.0), ("g", 2.0), ("g", 4.0), ("g", -9.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    r = pythagorean_means(df, "g", "x").collect()[0]
    assert r.n == 3  # negative excluded
    assert r.amean == round(7 / 3, 6)
    assert r.gmean == 2.0  # (1*2*4)^(1/3)
    assert r.hmean == round(3 / (1 + 0.5 + 0.25), 6)


def test_trimmed_mean_reference(spark):
    from moz_datapipeline_spark.operators.analytics import trimmed_mean

    vals = [float(v) for v in range(1, 11)] + [1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = trimmed_mean(df, "x", trim=0.1).collect()[0]
    # n=11; cuts at p10/p90: pos 0.1*10=1 -> 2.0; pos 0.9*10=9 -> 10.0
    assert r.n == 11 and r.lo_cut == 2.0 and r.hi_cut == 10.0
    assert r.n_used == 9
    assert r.trimmed_mean == round(sum(range(2, 11)) / 9, 6)


def test_log_loss_reference(spark):
    import math

    from moz_datapipeline_spark.operators.mleval import log_loss

    rows = [(0.9, 1), (0.1, 0), (0.8, 0), (1.0, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    r = log_loss(df, "s", "y").collect()[0]
    eps = 1e-15
    want = -(
        math.log(0.9) + math.log(0.9) + math.log(0.2)
        + math.log(1.0 - eps)
    ) / 4
    assert abs(r.log_loss - round(want, 6)) < 1e-9


def test_distribution_distance_reference(spark):
    import math

    from moz_datapipeline_spark.operators.validation import (
        distribution_distance,
    )

    a = spark.createDataFrame(
        [("x",)] * 5 + [("y",)] * 5, "c string"
    )
    b = spark.createDataFrame(
        [("x",)] * 5 + [("z",)] * 5, "c string"
    )
    r = distribution_distance(a, b, "c").collect()[0]
    assert r.n_categories == 3
    # p = (.5, .5, 0), q = (.5, 0, .5); tvd = (0 + .5 + .5)/2 = 0.5
    assert r.tvd == 0.5
    # hellinger = sqrt(((0)^2 + (sqrt.5)^2 + (sqrt.5)^2)/2) = sqrt(.5)
    assert r.hellinger == round(math.sqrt(0.5), 6)
    # jsd: x contributes 0; y: .5*log2(.5/.25)/... kl_pm = .5*1,
    # kl_qm(z) = .5*1 -> jsd = (0.5 + 0.5)/2 = 0.5
    assert r.jsd == 0.5

    # identical distributions -> all zero
    r2 = distribution_distance(a, a, "c").collect()[0]
    assert (r2.jsd, r2.hellinger, r2.tvd) == (0.0, 0.0, 0.0)


def test_pr_curve_reference(spark):
    from moz_datapipeline_spark.operators.mleval import pr_curve

    rows = [(0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0), (0.6, 1)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = {r.score: r for r in pr_curve(df, "s", "y").collect()}
    assert set(got) == {0.9, 0.8, 0.7, 0.6}
    # s >= 0.9: tp 1 fp 0 -> p 1, r 1/3
    assert got[0.9].precision == 1.0 and got[0.9].recall == round(1 / 3, 6)
    # s >= 0.7: tp 2 fp 1
    assert got[0.7].tp == 2 and got[0.7].fp == 1
    assert got[0.7].precision == round(2 / 3, 6)
    # s >= 0.6: tp 3 fp 2 -> recall 1
    assert got[0.6].recall == 1.0
    f1 = 2 * (3 / 5) * 1.0 / (3 / 5 + 1.0)
    assert got[0.6].f1 == round(f1, 6)


def test_rolling_features_reference(spark):
    from moz_datapipeline_spark.operators.temporal import rolling_features

    rows = [("g", t, float(v)) for t, v in enumerate([1, 2, 3, 10])]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    got = {r.t: r for r in rolling_features(df, "g", "t", "v", 3).collect()}
    assert got[0].roll_n == 1 and got[0].roll_mean == 1.0
    assert got[2].roll_mean == 2.0 and got[2].roll_min == 1.0
    # t=3: window [2,3,10] -> mean 5, std pop sqrt((4+9+100)/3-25)
    assert got[3].roll_mean == 5.0 and got[3].roll_max == 10.0
    var = (4 + 9 + 100) / 3 - 25
    assert got[3].roll_std == round(var**0.5, 6)
    assert got[3].roll_n == 3


def test_degree_distribution_reference(spark):
    import math

    from moz_datapipeline_spark.graph.structure import degree_distribution

    # star: hub degree 5, five leaves degree 1
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    got = {r.degree: r for r in degree_distribution(star).collect()}
    assert got[1].n_nodes == 5 and got[5].n_nodes == 1
    alpha = 1 + 6 / math.log(5.0)
    assert got[1].alpha == round(alpha, 6)


def test_iqr_outliers_reference(spark):
    from moz_datapipeline_spark.operators.analytics import iqr_outliers

    vals = [float(v) for v in range(1, 12)] + [100.0]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, x double")
    r = iqr_outliers(df, "x", group_cols=["g"]).collect()[0]
    # n=12: q1 at pos .25*11=2.75 -> 3.75; q3 at 8.25 -> 9.25
    assert r.q1 == 3.75 and r.q3 == 9.25
    assert r.iqr == 5.5
    assert r.lo_fence == 3.75 - 8.25 and r.hi_fence == 9.25 + 8.25
    assert r.n_outliers == 1  # only 100

    # NULL group key: fallback keeps the group (mad_outliers contract)
    dfn = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (None, 50.0)], "g string, x double"
    )
    rn = iqr_outliers(dfn, "x", group_cols=["g"]).collect()
    assert len(rn) == 1 and rn[0].n == 3


def test_theil_u_reference(spark):
    import math

    from moz_datapipeline_spark.operators.analytics import theil_u

    # A fully determined by B: U = 1
    rows = [("x", "p")] * 3 + [("y", "q")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = theil_u(df, "a", "b").collect()[0]
    assert r.u == 1.0 and r.h_a == round(math.log(2), 6)
    assert r.h_a_given_b == 0.0

    # independent: U = 0
    rows2 = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 2
    r2 = theil_u(
        spark.createDataFrame(rows2, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r2.u == 0.0

    # constant A: NULL u
    rows3 = [("x", "p"), ("x", "q")]
    r3 = theil_u(
        spark.createDataFrame(rows3, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r3.u is None


def test_nelson_aalen_reference(spark):
    from moz_datapipeline_spark.operators.analytics import nelson_aalen

    # durations 1(event),2(censor),3(event),4(event): n=4
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1)]
    df = spark.createDataFrame(rows, "t double, e int")
    got = {r.duration: r for r in nelson_aalen(df, "t", "e").collect()}
    assert got[1.0].n_at_risk == 4
    assert got[1.0].cum_hazard == 0.25
    # t=2: censor only; H unchanged 0.25, n_at_risk 3
    assert got[2.0].n_at_risk == 3 and got[2.0].cum_hazard == 0.25
    # t=3: H = 1/4 + 1/2
    assert got[3.0].cum_hazard == 0.75
    # t=4: H = 0.75 + 1/1
    assert got[4.0].cum_hazard == 1.75


def test_lorenz_curve_reference(spark):
    import pytest

    from moz_datapipeline_spark.operators.analytics import lorenz_curve

    # values 1..10, 5 tiles of 2: total 55
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 11)], "x double"
    )
    got = {r.tile: r for r in lorenz_curve(df, "x", n_points=5).collect()}
    assert got[1].cum_pop_share == 0.2
    assert got[1].cum_value_share == round(3 / 55, 6)
    assert got[5].cum_value_share == 1.0
    assert got[3].cum_value_share == round((1+2+3+4+5+6) / 55, 6)

    with pytest.raises(ValueError):
        lorenz_curve(
            spark.createDataFrame([(-1.0,)], "x double"), "x"
        ).collect()


def test_heatmap_bins_reference(spark):
    from moz_datapipeline_spark.operators.analytics import heatmap_bins

    rows = [(0.0, 0.0), (1.0, 1.0), (10.0, 10.0), (10.0, 0.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {
        (r.x_bin, r.y_bin): r.n
        for r in heatmap_bins(df, "x", "y", x_bins=10, y_bins=10).collect()
    }
    assert got[(0, 0)] == 1 and got[(1, 1)] == 1
    assert got[(9, 9)] == 1 and got[(9, 0)] == 1  # max clamps to last


def test_classification_report_mcc(spark):
    import math

    from moz_datapipeline_spark.operators.mleval import (
        classification_report,
    )

    rows = [
        (0.9, 1), (0.8, 1), (0.7, 0),
        (0.4, 1), (0.2, 0), (0.1, 0),
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    r = classification_report(df, "s", "y", threshold=0.5).collect()[0]
    # tp 2 fp 1 fn 1 tn 2
    mcc = (2 * 2 - 1 * 1) / math.sqrt(3 * 3 * 3 * 3)
    assert r.mcc == round(mcc, 6)
    assert r.balanced_accuracy == round((2 / 3 + 2 / 3) / 2, 6)


def test_stream_enrich_matches_batch(spark, tmp_path):
    """Stream-static broadcast enrichment: streaming micro-batches join
    the same dimension snapshot the batch twin does; no-match events
    survive with NULLs."""
    import json

    from moz_datapipeline_spark.streaming.events import stream_enrich

    src = tmp_path / "enrich_in"
    src.mkdir()
    chk = str(tmp_path / "enrich_chk")
    rows = [
        {"k": 1, "v": 10.0},
        {"k": 2, "v": 20.0},
        {"k": 9, "v": 90.0},  # no dim row
    ]
    with open(src / "b1.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    dim = spark.createDataFrame(
        [(1, "one"), (2, "two")], "k long, name string"
    )
    stream = spark.readStream.schema("k long, v double").json(str(src))
    q = (
        stream_enrich(stream, dim, "k")
        .writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.k, r.name) for r in spark.table("enrich_out").collect()
    }
    batch = spark.read.schema("k long, v double").json(str(src))
    want = {
        (r.k, r.name)
        for r in stream_enrich(batch, dim, "k").collect()
    }
    assert got == want
    assert (9, None) in got


def test_k_truss_reference(spark):
    from moz_datapipeline_spark.graph.truss import k_truss

    # K4 on {1,2,3,4} + a pendant triangle {4,5,6} + a dangling edge
    k4 = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    extra = [(4, 5), (4, 6), (5, 6), (6, 7)]
    edges = spark.createDataFrame(k4 + extra, "src long, dst long")

    # 3-truss: every edge in >= 1 triangle -> drops only (6,7)
    t3 = {(r.a, r.b) for r in k_truss(edges, k=3, rounds=4).collect()}
    assert (6, 7) not in t3 and len(t3) == 9

    # 4-truss: every edge in >= 2 triangles within the subgraph ->
    # exactly the K4 (each K4 edge sits in 2 triangles)
    t4 = {(r.a, r.b): r.support for r in k_truss(edges, k=4, rounds=4).collect()}
    assert set(t4) == set(k4)
    assert all(s >= 2 for s in t4.values())


def test_wilson_ci_reference(spark):
    import math

    from moz_datapipeline_spark.operators.analytics import wilson_ci

    rows = [("a", 1)] * 3 + [("a", 0)] * 7
    df = spark.createDataFrame(rows, "g string, y int")
    r = wilson_ci(df, "g", "y").collect()[0]
    z, n, p = 1.96, 10, 0.3
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z / denom * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    assert r.rate == 0.3
    assert r.ci_lo == round(center - half, 6)
    assert r.ci_hi == round(center + half, 6)
    assert 0.0 < r.ci_lo < 0.3 < r.ci_hi < 1.0


def test_dp_noisy_counts_reference(spark):
    from moz_datapipeline_spark.operators.analytics import dp_noisy_counts

    rows = [("a",)] * 100 + [("b",)] * 50
    df = spark.createDataFrame(rows, "g string")
    got = {r.g: r.noisy_count for r in dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    # deterministic: same call -> identical noise
    got2 = {r.g: r.noisy_count for r in dp_noisy_counts(df, "g", epsilon=1.0).collect()}
    assert got == got2
    # noise is bounded in probability; at eps=1 a 60-bit uniform can't
    # produce |noise| > ~42 (ln of the smallest representable tail)
    assert abs(got["a"] - 100) < 45 and abs(got["b"] - 50) < 45
    # different seed -> different draw (overwhelmingly)
    got3 = {
        r.g: r.noisy_count
        for r in dp_noisy_counts(df, "g", epsilon=1.0, seed="other").collect()
    }
    assert got3 != got


def test_asof_join_forward_reference(spark):
    from moz_datapipeline_spark.operators.temporal import asof_join_forward

    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (2, 5, "l3")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (1, 19, 190.0), (2, 1, 10.0)],
        "k long, ts long, v double",
    )
    out = {
        r.tag: (r.v_right, r.ts_right)
        for r in asof_join_forward(left, right, "k", "ts", ["v"]).collect()
    }
    # l1 at ts 10: inclusive match at 10
    assert out["l1"] == (100.0, 10)
    # l2 at ts 20: no right row at/after -> NULLs
    assert out["l2"] == (None, None)
    # l3 at ts 5: right row at 1 is BEFORE -> no forward match
    assert out["l3"] == (None, None)


def test_abc_analysis_reference(spark):
    from moz_datapipeline_spark.operators.analytics import abc_analysis

    rows = [("p1", 80.0), ("p2", 15.0), ("p3", 4.0), ("p4", 1.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r.k: r for r in abc_analysis(df, "k", "v").collect()}
    assert got["p1"].abc_class == "A" and got["p1"].cum_share == 0.8
    assert got["p2"].abc_class == "B" and got["p2"].cum_share == 0.95
    assert got["p3"].abc_class == "C"
    assert got["p4"].cum_share == 1.0


def test_anomaly_stream_state_across_batches(spark, tmp_path):
    """Welford state carries across micro-batches: 12 calm events in
    batch 1 warm the baseline; a wild value in batch 2 flags against
    state built in batch 1.  The flags equal a driver-side replay of
    the same fold (the batch twin)."""
    import json
    import math

    from moz_datapipeline_spark.streaming.stateful import anomaly_stream

    src = tmp_path / "anom_in"
    src.mkdir()
    chk = str(tmp_path / "anom_chk")
    calm = [
        {"event_type": "g", "ts": i, "value": 10.0 + (i % 3)}
        for i in range(12)
    ]
    wild = [
        {"event_type": "g", "ts": 100, "value": 500.0},
        {"event_type": "g", "ts": 101, "value": 10.5},
    ]

    def dump(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    dump("b1.json", calm)
    stream = spark.readStream.schema(
        "event_type string, ts long, value double"
    ).json(str(src))
    q = (
        anomaly_stream(stream, min_n=10)
        .writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        dump("b2.json", wild)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.ts: (r.zscore, r.is_anomaly)
        for r in spark.table("anom_out").collect()
    }
    assert len(got) == 14

    # driver-side replay (the batch twin)
    n, mean, m2 = 0, 0.0, 0.0
    want = {}
    for ts, v in sorted(
        (r["ts"], r["value"]) for r in calm + wild
    ):
        z, flag = None, False
        if n >= 10:
            var = m2 / (n - 1)
            if var > 0:
                z = round((v - mean) / math.sqrt(var), 6)
                flag = abs((v - mean) / math.sqrt(var)) > 3.0
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
        want[ts] = (z, flag)
    assert got == want
    assert got[100][1] is True and got[101][1] is False


def test_group_mode_reference(spark):
    from moz_datapipeline_spark.operators.analytics import group_mode

    rows = [("g", 3)] * 2 + [("g", 1)] * 2 + [("g", 2)]
    df = spark.createDataFrame(rows, "g string, v int")
    r = group_mode(df, "g", "v").collect()[0]
    # counts tie at 2 for values 1 and 3 -> smallest wins
    assert (r.mode, r.mode_count, r.n_distinct) == (1, 2, 3)


def test_log_rank_reference(spark):
    from moz_datapipeline_spark.operators.analytics import log_rank_test

    # identical curves -> chi2 ~ 0
    rows = [("a", float(t), 1) for t in (1, 2, 3)] + [
        ("b", float(t), 1) for t in (1, 2, 3)
    ]
    df = spark.createDataFrame(rows, "g string, t double, e int")
    r = log_rank_test(df, "t", "e", "g").collect()[0]
    assert r.n_a == 3 and r.n_b == 3
    assert r.chi2 == 0.0 and r.significant == 0

    # textbook: A events at 1,2 ; B events at 3,4 (A dies earlier)
    rows2 = [("a", 1.0, 1), ("a", 2.0, 1), ("b", 3.0, 1), ("b", 4.0, 1)]
    r2 = log_rank_test(
        spark.createDataFrame(rows2, "g string, t double, e int"),
        "t", "e", "g",
    ).collect()[0]
    # hand fold: t=1: d=1,n=4,na=2 -> e=.5, v=1*3*2*2/(16*3)=.25
    # t=2: d=1,n=3,na=1 -> e=1/3, v=1*2*1*2/(9*2)=2/9
    # t=3: d=1,n=2,na=0 -> e=0, v=0
    # t=4: n=1 -> v=0, e=0
    oa, ea = 2.0, 0.5 + 1 / 3
    v = 0.25 + 2 / 9
    assert r2.observed_a == 2
    assert r2.expected_a == round(ea, 6)
    assert r2.chi2 == round((oa - ea) ** 2 / v, 6)

    import pytest
    with pytest.raises(ValueError):
        log_rank_test(
            spark.createDataFrame(
                [("a", 1.0, 1), ("b", 1.0, 1), ("c", 1.0, 1)],
                "g string, t double, e int",
            ),
            "t", "e", "g",
        )


def test_diff_in_diff_reference(spark):
    from moz_datapipeline_spark.operators.analytics import diff_in_diff

    rows = [
        (0, 0, 10.0), (0, 0, 12.0),   # control pre: mean 11
        (0, 1, 14.0), (0, 1, 16.0),   # control post: mean 15 (+4)
        (1, 0, 20.0), (1, 0, 22.0),   # treated pre: mean 21
        (1, 1, 30.0), (1, 1, 32.0),   # treated post: mean 31 (+10)
    ]
    df = spark.createDataFrame(rows, "t int, p int, y double")
    r = diff_in_diff(df, "t", "p", "y").collect()[0]
    assert r.did == 6.0  # 10 - 4
    assert r.mean_c_pre == 11.0 and r.mean_t_post == 31.0

    # empty cell -> NULL did
    r2 = diff_in_diff(df.filter("NOT (t=1 AND p=1)"), "t", "p", "y").collect()[0]
    assert r2.did is None


def test_covariate_balance_reference(spark):
    import math

    from moz_datapipeline_spark.operators.analytics import (
        covariate_balance,
    )

    rows = [
        (1, 10.0, 5.0), (1, 12.0, 5.0),
        (0, 8.0, 5.0), (0, 6.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "t int, age double, score double")
    got = {r.covariate: r for r in covariate_balance(df, "t", ["age", "score"]).collect()}
    # age: mt 11 (var 2), mc 7 (var 2) -> smd = 4/sqrt(2) = 2.828
    assert got["age"].smd == round(4 / math.sqrt(2.0), 6)
    # score constant: zero pooled var -> NULL
    assert got["score"].smd is None and got["score"].mean_t == 5.0


def test_embedding_drift_reference(spark):
    import math

    from moz_datapipeline_spark.operators.embed import embedding_drift

    a = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], "id long, embedding array<double>"
    )
    b = spark.createDataFrame(
        [(3, [0.0, 2.0])], "id long, embedding array<double>"
    )
    r = embedding_drift(a, b).collect()[0]
    assert (r.n_a, r.n_b) == (2, 1)
    assert r.centroid_cosine == 0.0  # orthogonal centroids
    assert r.centroid_l2 == round(math.sqrt(1 + 4), 6)

    same = embedding_drift(a, a).collect()[0]
    assert same.centroid_cosine == 1.0 and same.centroid_l2 == 0.0

    empty = embedding_drift(a.limit(0), b).collect()[0]
    assert empty.n_a == 0 and empty.centroid_cosine is None


def test_rbo_overlap_reference(spark):
    from moz_datapipeline_spark.operators.mleval import rbo_overlap

    a = spark.createDataFrame(
        [("q", "d1", 3.0), ("q", "d2", 2.0), ("q", "d3", 1.0)],
        "query_id string, doc_id string, score double",
    )
    # identical rankings -> rbo = (1-p) sum p^(d-1) (truncated)
    r = rbo_overlap(a, a, k=3, p=0.9).collect()[0]
    want = 0.1 * (1 + 0.9 + 0.81)
    assert r.rbo == round(want, 6) and r.n_common == 3

    # disjoint -> 0
    b = spark.createDataFrame(
        [("q", "x1", 3.0), ("q", "x2", 2.0), ("q", "x3", 1.0)],
        "query_id string, doc_id string, score double",
    )
    r2 = rbo_overlap(a, b, k=3, p=0.9).collect()[0]
    assert r2.rbo == 0.0 and r2.n_common == 0

    # partial: b reverses a -> overlap(1)=0 (d1 vs d3), overlap(2)=0
    # ... d1 rank1/rank3, d3 rank3/rank1, d2 rank2/rank2
    rev = spark.createDataFrame(
        [("q", "d1", 1.0), ("q", "d2", 2.0), ("q", "d3", 3.0)],
        "query_id string, doc_id string, score double",
    )
    r3 = rbo_overlap(a, rev, k=3, p=0.9).collect()[0]
    # first depths: d1 max(1,3)=3, d2 max(2,2)=2, d3 max(3,1)=3
    want3 = 0.1 * (0.9 / 2 + 0.81 / 3) + 2 * (0.1 * 0.81 / 3)
    assert r3.n_common == 3
    assert abs(r3.rbo - want3) < 1e-6
