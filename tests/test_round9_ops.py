"""Round-9 operators: OHLC/TWAP/backtest rollups, robust stats, RFM,
readability, Dirichlet query-likelihood, per-dim standardization."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def test_ohlc_bars_reference(spark):
    from moz_datapipeline_spark.operators.temporal import ohlc_bars

    rows = [
        # group, t, v — bucket width 10
        ("a", 1, 5.0),
        ("a", 3, 9.0),
        ("a", 9, 2.0),
        ("a", 12, 7.0),   # second bucket
        ("b", 4, 1.0),
        ("b", 4, 3.0),    # duplicate t: value tiebreak -> open=1.0
    ]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    got = {
        (r.g, r.bucket_start): (r.open, r.high, r.low, r.close, r.n)
        for r in ohlc_bars(df, "g", "t", "v", step=10).collect()
    }
    assert got == {
        ("a", 0): (5.0, 9.0, 2.0, 2.0, 3),
        ("a", 10): (7.0, 7.0, 7.0, 7.0, 1),
        ("b", 0): (1.0, 3.0, 1.0, 3.0, 2),
    }


def test_twap_reference(spark):
    from moz_datapipeline_spark.operators.temporal import twap

    # bucket [0,10): v=2 holds t=0..4, v=10 holds t=4..10
    # twap = (2*4 + 10*6) / 10 = 6.8
    rows = [("a", 0, 2.0), ("a", 4, 10.0)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    got = {r.bucket_start: r.twap for r in twap(df, "g", "t", "v", 10).collect()}
    assert got == {0: 6.8}

    # an observation at the bucket's right edge... belongs to the NEXT
    # bucket and holds there; the prior value is clipped at its edge
    rows2 = [("a", 0, 2.0), ("a", 10, 4.0)]
    df2 = spark.createDataFrame(rows2, "g string, t long, v double")
    got2 = {
        r.bucket_start: r.twap
        for r in twap(df2, "g", "t", "v", 10).collect()
    }
    assert got2 == {0: 2.0, 10: 4.0}


def test_seasonal_naive_backtest_reference(spark):
    from moz_datapipeline_spark.operators.temporal import (
        seasonal_naive_backtest,
    )

    # lag 2: forecasts are v[t-2]; series 1,2,3,4 -> scored at t=2,3
    rows = [("a", t, float(t + 1)) for t in range(4)]
    df = spark.createDataFrame(rows, "g string, t long, v double")
    r = seasonal_naive_backtest(df, "g", "t", "v", season_lag=2).collect()[0]
    # errors: 3-1=2, 4-2=2 ; mape = (2/3 + 2/4)/2 ; bias = 2
    assert r.n_scored == 2
    assert abs(r.mape - round((2 / 3 + 2 / 4) / 2, 6)) < 1e-9
    assert r.bias == 2.0
    smape = (2 * 2 / (3 + 1) + 2 * 2 / (4 + 2)) / 2
    assert abs(r.smape - round(smape, 6)) < 1e-9


def test_mad_outliers_reference(spark):
    from moz_datapipeline_spark.operators.analytics import mad_outliers

    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, x double"
    )
    r = mad_outliers(df, "x", group_cols=["g"], k=3.0).collect()[0]
    assert r.median == 3.0
    # deviations: 2,1,0,1,97 -> median 1
    assert r.mad == 1.0
    assert abs(r.robust_sigma - 1.4826) < 1e-9
    # robust z of 100 = 97/1.4826 = 65.4 -> 1 outlier; others <= 1.35
    assert r.n_outliers == 1

    # constant group: MAD 0 -> NULL sigma, zero outliers
    const = spark.createDataFrame(
        [("g", 5.0)] * 4, "g string, x double"
    )
    rc = mad_outliers(const, "x", group_cols=["g"]).collect()[0]
    assert rc.mad == 0.0 and rc.robust_sigma is None and rc.n_outliers == 0


def test_rfm_segments_reference(spark):
    import datetime as dt

    from moz_datapipeline_spark.operators.analytics import rfm_segments

    base = dt.datetime(1996, 1, 1)
    rows = []
    # customer c has c orders of 100 each, last order day c (c=1..8)
    for c in range(1, 9):
        for i in range(c):
            rows.append((c, base + dt.timedelta(days=c - i), 100.0))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    got = {r.customer: r for r in rfm_segments(df, n_tiles=4).collect()}
    # recency: max date = day 8 (customer 8); recency_days = 8 - c
    assert got[8].recency_days == 0 and got[1].recency_days == 7
    # frequency rank desc: c=8 rank 1 -> tile 1 -> f = 4
    assert got[8].f == 4 and got[7].f == 4
    assert got[1].f == 1 and got[2].f == 1
    # monetary = 100*c, same ordering as frequency
    assert got[8].m == 4 and got[1].m == 1
    # recency asc: c=8 most recent -> r = 4
    assert got[8].r == 4 and got[1].r == 1
    assert got[8].segment == "444" and got[1].segment == "111"
    # 8 customers, 4 tiles: every tile holds exactly 2
    from collections import Counter

    assert Counter(r.r for r in got.values()) == {1: 2, 2: 2, 3: 2, 4: 2}


def test_readability_reference(spark):
    from moz_datapipeline_spark.operators.text import readability_scores

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "!!!")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in readability_scores(df).collect()}
    r1 = got[1]
    assert r1.n_words == 6 and r1.n_sentences == 2
    # vowel groups: e,a,a,e,o,a = 6
    assert r1.n_syllables == 6
    expect = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r1.flesch - round(expect, 6)) < 1e-9
    # no alphanumerics: zero sentences/words -> NULL flesch
    r2 = got[2]
    assert r2.n_words == 1 and r2.n_sentences == 0 and r2.flesch is None


def test_dirichlet_lm_reference(spark):
    from moz_datapipeline_spark.operators.retrieval import dirichlet_lm_topk

    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "durian durian durian durian"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    mu = 10.0
    out = {
        r.doc_id: (r.score, r.n_terms_matched)
        for r in dirichlet_lm_topk(
            df, ["apple", "cherry"], k=10, mu=mu
        ).collect()
    }
    # corpus: 9 tokens; cf(apple)=2, cf(cherry)=1
    c = 9.0
    p_a, p_c = 2 / c, 1 / c

    def score(tfs, dl):
        return sum(
            math.log((tf + mu * p) / (dl + mu))
            for tf, p in zip(tfs, [p_a, p_c])
        )

    assert set(out) == {1, 2}  # doc 3 matches no term -> unscored
    assert out[1][1] == 1 and out[2][1] == 1
    assert abs(out[1][0] - round(score([2, 0], 3), 6)) < 1e-9
    assert abs(out[2][0] - round(score([0, 1], 2), 6)) < 1e-9


def test_standardize_embeddings_reference(spark):
    from moz_datapipeline_spark.functions.scaling import (
        standardize_embeddings,
    )

    rows = [(1, [1.0, 5.0]), (2, [3.0, 5.0]), (3, [5.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: r.standardized
        for r in standardize_embeddings(df).collect()
    }
    # dim 0: mean 3, sample std 2 -> z = -1, 0, 1 ; dim 1 constant -> 0
    assert got[1] == [-1.0, 0.0]
    assert got[2] == [0.0, 0.0]
    assert got[3] == [1.0, 0.0]


def test_round9_plan_shapes(spark):
    """No Python evaluation and no global (unpartitioned) window sort
    in the round-9 rollup operators."""
    from moz_datapipeline_spark.operators.temporal import ohlc_bars, twap

    df = spark.createDataFrame(
        [("a", 1, 2.0)], "g string, t long, v double"
    )
    for out in (
        ohlc_bars(df, "g", "t", "v", 10),
        twap(df, "g", "t", "v", 10),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_target_encode_reference(spark):
    from moz_datapipeline_spark.operators.features import target_encode

    rows = [("a", 10.0), ("a", 20.0), ("b", 100.0), (None, 50.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r.c: r.c_te for r in target_encode(df, "c", "y", smoothing=2.0, out_col="c_te").collect()}
    prior = (10 + 20 + 100 + 50) / 4  # 45
    assert abs(out["a"] - (30 + 2 * prior) / 4) < 1e-9
    assert abs(out["b"] - (100 + 2 * prior) / 3) < 1e-9
    # NULL category is its own group (null-safe join), not dropped
    assert abs(out[None] - (50 + 2 * prior) / 3) < 1e-9


def test_hashed_features_properties(spark):
    from moz_datapipeline_spark.operators.features import hashed_features

    df = spark.createDataFrame(
        [(1, "x y x"), (2, "x")], "doc_id long, text string"
    )
    out = hashed_features(df, n_features=8, portable_hash=True).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.weight
    # same token hashes identically: doc 1's x-bucket weight is 2x doc 2's
    (xb, xw), = [i for i in by_doc[2].items()]
    assert abs(by_doc[1][xb]) == 2 * abs(xw)
    assert all(0 <= r.bucket < 8 for r in out)
    assert all(r.weight != 0 for r in out)


def test_neighbor_feature_aggregate_two_hop(spark):
    from moz_datapipeline_spark.graph.aggregate import (
        neighbor_feature_aggregate,
    )

    # path graph 1-2-3 with features 10, 20, 30
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    f = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "node long, feature double"
    )
    one = {
        r.node: (r.n_neighbors, r.mean_f)
        for r in neighbor_feature_aggregate(e, f, hops=1).collect()
    }
    assert one == {1: (1, 20.0), 2: (2, 20.0), 3: (1, 20.0)}
    # hop 2 aggregates the 1-hop means: node 1's neighbor is 2 (mean 20)
    two = {
        r.node: r.mean_f
        for r in neighbor_feature_aggregate(e, f, hops=2).collect()
    }
    assert two == {1: 20.0, 2: 20.0, 3: 20.0}

    # missing feature rows aggregate as NULL but still count as neighbors
    f2 = spark.createDataFrame([(2, 20.0)], "node long, feature double")
    got = {
        r.node: (r.n_neighbors, r.mean_f)
        for r in neighbor_feature_aggregate(e, f2, hops=1).collect()
    }
    assert got[2] == (2, None) and got[1] == (1, 20.0)


def test_rake_keyphrases_reference(spark):
    from moz_datapipeline_spark.operators.text import rake_keyphrases

    df = spark.createDataFrame(
        [
            (1, "deep learning, and deep learning systems."),
            (2, "systems of deep learning"),
        ],
        "doc_id long, text string",
    )
    out = {r.phrase: r for r in rake_keyphrases(df, k=10).collect()}
    # "deep learning" occurs twice as its own phrase (comma + 'and'
    # break the runs), once more inside "deep learning systems"
    assert "deep learning" in out and "deep learning systems" in out
    assert out["deep learning"].n_occurrences == 2
    # freq: deep 3, learning 3, systems 2
    # deg: deep = 2+2+3, learning = 2+2+3, systems = 3+1
    ws = {"deep": 7 / 3, "learning": 7 / 3, "systems": 4 / 2}
    assert abs(
        out["deep learning"].score - round(ws["deep"] + ws["learning"], 6)
    ) < 1e-9
    assert abs(
        out["deep learning systems"].score
        - round(ws["deep"] + ws["learning"] + ws["systems"], 6)
    ) < 1e-9
    # longer phrase outranks its sub-phrase
    assert out["deep learning systems"].score > out["deep learning"].score


def test_markov_transitions_reference(spark):
    from moz_datapipeline_spark.operators.analytics import (
        markov_transitions,
    )

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 1, "a"), (2, 2, "a"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in markov_transitions(df).collect()
    }
    # from 'a': a->b (u1), a->a (u2) ; from 'b': b->a (u1)
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "a"): (1, 0.5),
        ("b", "a"): (1, 1.0),
    }


def test_kaplan_meier_reference(spark):
    from moz_datapipeline_spark.operators.analytics import kaplan_meier

    # classic toy: events at t=1 (1 of 5), t=3 (1 of 3); censored at
    # t=2 (1), t=3 (1), t=4 (1)
    rows = [(1.0, 1), (2.0, 0), (3.0, 1), (3.0, 0), (4.0, 0)]
    df = spark.createDataFrame(rows, "t double, e int")
    got = {
        r.duration: (r.n_at_risk, r.n_events, r.n_censored, r.survival)
        for r in kaplan_meier(df, "t", "e").collect()
    }
    s1 = 1 - 1 / 5                # 0.8
    s3 = s1 * (1 - 1 / 3)         # 0.533333
    assert got[1.0] == (5, 1, 0, round(s1, 6))
    assert got[2.0] == (4, 0, 1, round(s1, 6))
    assert got[3.0] == (3, 1, 1, round(s3, 6))
    assert got[4.0] == (1, 0, 1, round(s3, 6))

    # extinction: everyone fails at t=2 -> survival exactly 0
    rows2 = [(1.0, 1), (2.0, 1), (2.0, 1)]
    df2 = spark.createDataFrame(rows2, "t double, e int")
    got2 = {
        r.duration: r.survival for r in kaplan_meier(df2, "t", "e").collect()
    }
    assert got2[2.0] == 0.0


def test_ctfidf_reference(spark):
    import math as _m

    from moz_datapipeline_spark.operators.corpus import ctfidf_terms

    df = spark.createDataFrame(
        [
            ("s1", "alpha alpha beta"),
            ("s2", "beta gamma gamma"),
        ],
        "source string, text string",
    )
    got = {
        (r.source, r.term): (r.tf, r.score)
        for r in ctfidf_terms(df, k=5).collect()
    }
    A = 3.0  # both classes have 3 tokens
    # f: alpha 2, beta 2, gamma 2 -> same damping everywhere
    s = lambda tf: round(tf * _m.log(1.0 + A / 2), 6)  # noqa: E731
    assert got[("s1", "alpha")] == (2, s(2))
    assert got[("s1", "beta")] == (1, s(1))
    assert got[("s2", "gamma")] == (2, s(2))
    # distinctive terms outrank shared ones within each class
    ranks = {
        (r.source, r.term): r.rank for r in ctfidf_terms(df, k=5).collect()
    }
    assert ranks[("s1", "alpha")] == 1 and ranks[("s2", "gamma")] == 1


def test_bipartite_projection_reference(spark):
    from moz_datapipeline_spark.graph.aggregate import bipartite_projection

    # left {1,2,3}, right {10,11,12}: 1-2 share {10,11}, 2-3 share {11}
    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (2, 12), (3, 11), (3, 12),
         (1, 10)],  # duplicate edge collapses
        "src long, dst long",
    )
    got = {
        (r.node_a, r.node_b): (r.weight, r.jaccard)
        for r in bipartite_projection(e, min_weight=1).collect()
    }
    # degrees: 1->2, 2->3, 3->2
    assert got[(1, 2)] == (2, round(2 / (2 + 3 - 2), 6))
    assert got[(2, 3)] == (2, round(2 / (3 + 2 - 2), 6))
    assert got[(1, 3)] == (1, round(1 / (2 + 2 - 1), 6))
    # min_weight prunes
    got2 = bipartite_projection(e, min_weight=2).collect()
    assert {(r.node_a, r.node_b) for r in got2} == {(1, 2), (2, 3)}

    # a mega-hub right node is dropped by DEFAULT; stats surfaces it
    hub = spark.createDataFrame(
        [(i, 999) for i in range(1200)] + [(1, 10), (2, 10)],
        "src long, dst long",
    )
    stats: dict = {}
    out = {
        (r.node_a, r.node_b)
        for r in bipartite_projection(hub, stats=stats).collect()
    }
    assert stats["dropped_right_nodes"] == 1
    assert out == {(1, 2)}  # only the non-hub co-occurrence survives


@pytest.mark.deep
def test_exact_quantiles_matches_builtin(spark):
    """exact_quantiles must reproduce the percentile builtin's values
    BIT-FOR-BIT — same bracketing order statistics, same interpolation
    form — including ties and tiny inputs."""
    import random

    from moz_datapipeline_spark.operators.ranges import exact_quantiles

    rng = random.Random(7)
    vals = [rng.uniform(-1000, 1000) for _ in range(5000)]
    vals += [vals[0]] * 500  # heavy ties
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    probs = [i / 100 for i in range(101)]
    got = exact_quantiles(df, "x", probs, bucket_count=256)
    pstr = ", ".join(repr(p) for p in probs)
    want = df.agg(
        F.expr(f"percentile(x, array({pstr}))").alias("b")
    ).collect()[0]["b"]
    assert got == list(want)

    # tiny input, exact-rank hits
    small = spark.createDataFrame([(float(i),) for i in range(5)], "x double")
    got_s = exact_quantiles(small, "x", [0.0, 0.25, 0.5, 1.0])
    assert got_s == [0.0, 1.0, 2.0, 4.0]

    # constant column and empty input
    const = spark.createDataFrame([(3.0,)] * 4, "x double")
    assert exact_quantiles(const, "x", [0.1, 0.9]) == [3.0, 3.0]
    assert exact_quantiles(const.filter("x > 99"), "x", [0.5]) is None

    # candidate cap trip RECURSES (round 10) — still exact, never None
    got_capped = exact_quantiles(
        df, "x", probs, bucket_count=16, candidate_cap=200
    )
    assert got_capped == list(want)


def test_exact_quantiles_grouped_matches_builtin(spark):
    import random

    from moz_datapipeline_spark.operators.ranges import (
        exact_quantiles_grouped,
    )

    rng = random.Random(11)
    rows = []
    for g in ["a", "b", "c"]:
        for _ in range(2000):
            rows.append((g, rng.uniform(-50, 50)))
    rows += [("const", 7.0)] * 20
    rows += [(None, rng.uniform(0, 1)) for _ in range(100)]
    df = spark.createDataFrame(rows, "g string, x double")
    probs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = exact_quantiles_grouped(df, "g", "x", probs, bucket_count=128)
    pstr = ", ".join(repr(p) for p in probs)
    want = {
        r["g"]: list(r["b"])
        for r in df.groupBy("g")
        .agg(F.expr(f"percentile(x, array({pstr}))").alias("b"))
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g] == want[g], g

    # too many groups -> None (loud fallback contract)
    many = spark.createDataFrame(
        [(str(i), float(i)) for i in range(500)], "g string, x double"
    )
    assert exact_quantiles_grouped(many, "g", "x", [0.5], max_groups=100) is None


def test_psi_categorical_reference(spark):
    import math as _m

    from moz_datapipeline_spark.operators.validation import psi_categorical

    ref = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50, "c string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 80 + [("b",)] * 10 + [("new",)] * 10, "c string"
    )
    r = psi_categorical(ref, cur, "c").collect()[0]
    assert r.n_categories == 3
    eps = 1e-6
    want = 0.0
    for pr, pc in [(0.5, 0.8), (0.5, 0.1), (eps, 0.1)]:
        want += (pc - pr) * _m.log(pc / pr)
    assert abs(r.psi - round(want, 6)) < 1e-9
    # identical distributions -> psi 0
    same = psi_categorical(ref, ref, "c").collect()[0]
    assert same.psi == 0.0


def test_time_to_convert_reference(spark):
    from moz_datapipeline_spark.operators.analytics import time_to_convert

    ns = 1_000_000_000
    rows = [
        (1, 10 * ns, "view"), (1, 25 * ns, "purchase"),
        (2, 40 * ns, "purchase"), (2, 50 * ns, "view"),  # converts never
        (3, 5 * ns, "view"), (3, 5 * ns, "purchase"),    # same instant: not after
        (4, 0 * ns, "view"), (4, 3 * ns, "purchase"), (4, 9 * ns, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {
        r.user_id: r.delta_seconds for r in time_to_convert(df).collect()
    }
    assert got == {1: 15, 4: 3}


def test_behavior_entropy_reference(spark):
    import math as _m

    from moz_datapipeline_spark.operators.analytics import behavior_entropy

    rows = (
        [(1, "a")] * 2 + [(1, "b")] * 2        # uniform over 2 -> ln 2
        + [(2, "a")] * 4                        # single type -> 0
        + [(3, "a")] * 3 + [(3, "b")]           # skewed
    )
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r.user_id: r for r in behavior_entropy(df).collect()}
    assert abs(got[1].entropy - round(_m.log(2), 6)) < 1e-9
    assert got[2].entropy == 0.0 and got[2].n_types == 1
    h3 = -(0.75 * _m.log(0.75) + 0.25 * _m.log(0.25))
    assert abs(got[3].entropy - round(h3, 6)) < 1e-9


def test_holt_linear_reference(spark):
    from moz_datapipeline_spark.operators.temporal import holt_linear

    xs = [10.0, 12.0, 15.0, 11.0]
    df = spark.createDataFrame(
        [("g", t, v) for t, v in enumerate(xs)],
        "g string, t long, v double",
    )
    a, b = 0.3, 0.1
    lvl, trd = xs[0], xs[1] - xs[0]
    want = [(round(lvl, 6), round(trd, 6))]
    for x in xs[1:]:
        prev = lvl
        lvl = a * x + (1 - a) * (lvl + trd)
        trd = b * (lvl - prev) + (1 - b) * trd
        want.append((round(lvl, 6), round(trd, 6)))
    got = {
        r.t: (r.level, r.trend, r.forecast)
        for r in holt_linear(df, "g", "t", "v", 0.3, 0.1, horizon=2).collect()
    }
    for t, (wl, wt) in enumerate(want):
        gl, gt, gf = got[t]
        assert abs(gl - wl) < 1e-9 and abs(gt - wt) < 1e-9
        assert abs(gf - round(wl + 2 * wt, 6)) < 2e-6

    # single-point series: level = x, trend 0
    one = holt_linear(
        spark.createDataFrame([("g", 0, 5.0)], "g string, t long, v double"),
        "g", "t", "v",
    ).collect()[0]
    assert one.level == 5.0 and one.trend == 0.0


def test_gini_concentration_reference(spark):
    from moz_datapipeline_spark.operators.analytics import (
        gini_concentration,
    )

    # perfectly uniform -> gini 0
    uni = spark.createDataFrame(
        [(i, 10.0) for i in range(8)], "k long, x double"
    )
    r = gini_concentration(uni, "k", "x").collect()[0]
    assert r.gini == 0.0 and r.n == 8 and r.total == 80.0

    # one key holds everything: G = (n-1)/n
    mono = spark.createDataFrame(
        [(0, 100.0)] + [(i, 0.0) for i in range(1, 5)], "k long, x double"
    )
    r2 = gini_concentration(mono, "k", "x").collect()[0]
    assert abs(r2.gini - round(4 / 5, 6)) < 1e-9

    # textbook: values 1..4 -> G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    t4 = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 5)], "k long, x double"
    )
    assert gini_concentration(t4, "k", "x").collect()[0].gini == 0.25

    # negative values -> NULL (undefined)
    neg = spark.createDataFrame(
        [(0, -1.0), (1, 5.0)], "k long, x double"
    )
    assert gini_concentration(neg, "k", "x").collect()[0].gini is None


def test_roc_auc_reference(spark):
    from moz_datapipeline_spark.operators.analytics import roc_auc

    # perfect separation -> 1.0 ; reversed -> 0.0 ; with a tie -> half
    rows = [(0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    assert roc_auc(df, "s", "y").collect()[0].auc == 1.0
    rev = spark.createDataFrame([(s, 1 - y) for s, y in rows], "s double, y int")
    assert roc_auc(rev, "s", "y").collect()[0].auc == 0.0

    # hand AUC with ties: pairs (pos, neg) comparisons
    rows2 = [(0.9, 1), (0.5, 1), (0.5, 0), (0.2, 0), (0.2, 1)]
    df2 = spark.createDataFrame(rows2, "s double, y int")
    # pos scores [0.9, 0.5, 0.2], neg [0.5, 0.2]
    # (0.9 vs 0.5)=1 (0.9 vs 0.2)=1 (0.5 vs 0.5)=.5 (0.5 vs 0.2)=1
    # (0.2 vs 0.5)=0 (0.2 vs 0.2)=.5  -> 4/6
    r = roc_auc(df2, "s", "y").collect()[0]
    assert r.n_pos == 3 and r.n_neg == 2
    assert abs(r.auc - round(4 / 6, 6)) < 1e-9

    # degenerate: no negatives -> NULL
    pos = spark.createDataFrame([(0.5, 1), (0.4, 1)], "s double, y int")
    assert roc_auc(pos, "s", "y").collect()[0].auc is None


def test_decile_lift_reference(spark):
    from moz_datapipeline_spark.operators.analytics import decile_lift

    # 20 rows, scores 20..1; positives exactly the top 5 scores
    rows = [(i, float(21 - i), 1 if i <= 5 else 0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "k long, s double, y int")
    got = {
        r.decile: r
        for r in decile_lift(df, "s", "y", ["k"], n_tiles=4).collect()
    }
    # tiles of 5: tile 1 = top5 = all positives
    assert got[1].n == 5 and got[1].n_pos == 5
    assert got[1].pos_rate == 1.0 and got[1].capture == 1.0
    assert got[1].cum_capture == 1.0
    # base rate 5/20 = 0.25 -> lift of tile 1 = 4
    assert got[1].lift == 4.0
    assert got[2].n_pos == 0 and got[2].lift == 0.0
    assert got[4].cum_capture == 1.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="tiebreak"):
        decile_lift(df, "s", "y", [])
