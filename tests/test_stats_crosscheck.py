"""Independent numeric cross-checks for the stats battery.

The DuckDB oracles replay the same arithmetic in SQL, so a shared
formula bug would pass both sides of the parity gate.  These tests
verify the STATISTICS against independent pure-numpy implementations
written from the textbook definitions (scipy is not in this
container) on randomized-but-seeded data — a genuinely different code
path: dense arrays and library primitives instead of relational
rollups.

p-values are asserted loosely (the operators use Wilson–Hilferty +
Abramowitz–Stegun approximations; W-H error peaks at ~3e-3 for small
chi2 at low dof); the test statistics themselves are asserted to the
outputs' 6-decimal rounding.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

def _rng(tag: int) -> np.random.Generator:
    """Per-test generator: data must not depend on test order."""
    return np.random.default_rng(20260816 + tag)


def _ranks(x: np.ndarray) -> np.ndarray:
    """Average ranks (1-based) with ties — textbook midrank."""
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=float)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_kruskal_wallis_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import kruskal_wallis

    rng = _rng(1)

    groups = {
        "a": rng.normal(0.0, 1.0, 40).round(1),
        "b": rng.normal(0.6, 1.0, 55).round(1),
        "c": rng.normal(0.1, 2.0, 35).round(1),
    }
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = kruskal_wallis(df, "v", "grp").collect()[0]

    x = np.concatenate(list(groups.values()))
    labels = np.concatenate(
        [[g] * len(vs) for g, vs in groups.items()]
    )
    n = len(x)
    rk = _ranks(x)
    h = 0.0
    for g in groups:
        rg = rk[labels == g]
        h += rg.sum() ** 2 / len(rg)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    # tie correction
    _, counts = np.unique(x, return_counts=True)
    tie = 1.0 - (counts**3 - counts).sum() / (n**3 - n)
    h_c = h / tie
    assert r.k_groups == 3 and r.n_rows == n
    assert r.h_stat == pytest.approx(h_c, abs=1e-6)
    assert r.p_value == pytest.approx(
        _chi2_sf(h_c, 2), abs=5e-3
    )


def _chi2_sf(x: float, k: int) -> float:
    """Exact-ish chi-square survival via series (independent of the
    operators' Wilson-Hilferty path): regularized upper gamma through
    the lower-incomplete power series, good to ~1e-10 here."""
    a = k / 2.0
    z = x / 2.0
    # lower regularized gamma P(a, z) by series
    term = 1.0 / a
    total = term
    i = 0
    while abs(term) > 1e-16 * abs(total) and i < 10_000:
        i += 1
        term *= z / (a + i)
        total += term
    p_lower = total * math.exp(-z + a * math.log(z) - math.lgamma(a))
    return 1.0 - p_lower


def test_friedman_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import friedman_test

    rng = _rng(2)

    n_blocks, treatments = 25, ["t1", "t2", "t3", "t4"]
    effect = {"t1": 0.0, "t2": 0.4, "t3": 0.0, "t4": -0.3}
    data = {
        (b, t): round(float(rng.normal(effect[t], 1.0)), 1)
        for b in range(n_blocks)
        for t in treatments
    }
    rows = [(str(b), t, v) for (b, t), v in data.items()]
    df = spark.createDataFrame(rows, "blk string, trt string, v double")
    r = friedman_test(df, "blk", "trt", "v").collect()[0]

    k = len(treatments)
    ranks = np.zeros((n_blocks, k))
    for b in range(n_blocks):
        vals = np.array([data[(b, t)] for t in treatments])
        ranks[b] = _ranks(vals)
    rj = ranks.sum(axis=0)
    # tie-robust form: chi2 = (k-1) * sum_j (R_j - n(k+1)/2)^2
    #                         / (sum r_ij^2 - n k (k+1)^2 / 4)
    num = (k - 1) * ((rj - n_blocks * (k + 1) / 2.0) ** 2).sum()
    den = (ranks**2).sum() - n_blocks * k * (k + 1) ** 2 / 4.0
    chi2 = num / den
    assert r.k_treatments == k and r.n_blocks == n_blocks
    assert r.chi2 == pytest.approx(chi2, abs=2e-6)
    assert r.p_value == pytest.approx(
        _chi2_sf(chi2, k - 1), abs=5e-3
    )


def test_cochran_q_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import cochran_q

    rng = _rng(3)

    n_blocks, treatments = 40, ["a", "b", "c"]
    p_t = {"a": 0.3, "b": 0.55, "c": 0.4}
    data = {
        (b, t): int(rng.random() < p_t[t])
        for b in range(n_blocks)
        for t in treatments
    }
    rows = [(str(b), t, v) for (b, t), v in data.items()]
    df = spark.createDataFrame(rows, "blk string, trt string, o int")
    r = cochran_q(df, "blk", "trt", "o").collect()[0]

    k = len(treatments)
    mat = np.array(
        [[data[(b, t)] for t in treatments] for b in range(n_blocks)]
    )
    cj = mat.sum(axis=0).astype(float)
    ri = mat.sum(axis=1).astype(float)
    t_tot = mat.sum()
    q = (
        k * (k - 1) * ((cj - t_tot / k) ** 2).sum()
        / (k * t_tot - (ri**2).sum())
    )
    assert r.k_treatments == k and r.n_blocks == n_blocks
    assert r.q_stat == pytest.approx(q, abs=1e-6)
    assert r.p_value == pytest.approx(
        _chi2_sf(q, k - 1), abs=5e-3
    )


def test_quantile_treatment_effect_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import (
        quantile_treatment_effect,
    )

    rng = _rng(4)

    a = rng.exponential(10.0, 400).round(2)
    b = rng.exponential(8.0, 300).round(2)
    dfa = spark.createDataFrame([(float(v),) for v in a], "x double")
    dfb = spark.createDataFrame([(float(v),) for v in b], "x double")
    probs = [0.1, 0.5, 0.9]
    out = {
        r.prob: r
        for r in quantile_treatment_effect(
            dfa, dfb, "x", probs
        ).collect()
    }
    for p in probs:
        qa = float(np.quantile(a, p, method="linear"))
        qb = float(np.quantile(b, p, method="linear"))
        assert out[p].q_treat == pytest.approx(qa, abs=1e-5)
        assert out[p].q_ctrl == pytest.approx(qb, abs=1e-5)
        assert out[p].qte == pytest.approx(qa - qb, abs=1e-5)


def test_wasserstein_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import wasserstein_1d

    rng = _rng(5)

    a = rng.normal(0.0, 1.0, 350).round(2)
    b = rng.normal(0.5, 1.5, 450).round(2)
    dfa = spark.createDataFrame([(float(v),) for v in a], "x double")
    dfb = spark.createDataFrame([(float(v),) for v in b], "x double")
    r = wasserstein_1d(dfa, dfb, "x").collect()[0]

    # independent path: mean |inverse-CDF difference| via sorted merge
    allv = np.sort(np.concatenate([a, b]))
    deltas = np.diff(allv)
    fa = np.searchsorted(np.sort(a), allv[:-1], side="right") / len(a)
    fb = np.searchsorted(np.sort(b), allv[:-1], side="right") / len(b)
    w1 = float((np.abs(fa - fb) * deltas).sum())
    assert r.n_a == len(a) and r.n_b == len(b)
    assert r.wasserstein == pytest.approx(w1, abs=1e-6)


def test_mahalanobis_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import (
        mahalanobis_outliers,
    )

    rng = _rng(6)

    n = 300
    x = rng.normal(0, 1, n)
    y = 0.7 * x + rng.normal(0, 0.5, n)
    rows = [(i, float(a), float(c)) for i, (a, c) in enumerate(zip(x, y))]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = {
        r.id: r.maha_d2
        for r in mahalanobis_outliers(df, "x", "y").collect()
    }

    pts = np.stack([x, y], axis=1)
    mu = pts.mean(axis=0)
    cov = np.cov(pts.T, bias=True)  # population covariance (avg moments)
    inv = np.linalg.inv(cov)
    d = pts - mu
    d2 = (d @ inv * d).sum(axis=1)
    for i in range(n):
        assert got[i] == pytest.approx(round(float(d2[i]), 6), abs=1e-4)


def test_mann_whitney_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import mann_whitney_u

    rng = _rng(7)

    a = rng.normal(0.0, 1.0, 80).round(1)
    b = rng.normal(0.5, 1.0, 60).round(1)
    dfa = spark.createDataFrame([(float(v),) for v in a], "x double")
    dfb = spark.createDataFrame([(float(v),) for v in b], "x double")
    r = mann_whitney_u(dfa, dfb, "x").collect()[0]

    na, nb = len(a), len(b)
    rk = _ranks(np.concatenate([a, b]))
    ra = rk[:na].sum()
    u_a = ra - na * (na + 1) / 2.0
    u_b = na * nb - u_a
    n = na + nb
    _, counts = np.unique(np.concatenate([a, b]), return_counts=True)
    tie = (counts**3 - counts).sum()
    var = na * nb / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_a - na * nb / 2.0) / math.sqrt(var)
    p = math.erfc(abs(z) / math.sqrt(2.0))
    assert r.u_a == pytest.approx(u_a, abs=1e-6)
    assert r.u_b == pytest.approx(u_b, abs=1e-6)
    assert r.z == pytest.approx(z, abs=1e-6)
    assert r.p_value == pytest.approx(p, abs=5e-3)


def test_anova_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import anova_oneway

    rng = _rng(8)

    groups = {
        "a": rng.normal(10.0, 2.0, 50),
        "b": rng.normal(11.0, 2.0, 70),
        "c": rng.normal(9.5, 3.0, 40),
    }
    rows = [(g, float(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = anova_oneway(df, "grp", "v").collect()[0]

    allv = np.concatenate(list(groups.values()))
    grand = allv.mean()
    ssb = sum(
        len(vs) * (vs.mean() - grand) ** 2 for vs in groups.values()
    )
    ssw = sum(((vs - vs.mean()) ** 2).sum() for vs in groups.values())
    k, n = 3, len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r.ss_between == pytest.approx(ssb, abs=1e-5, rel=1e-6)
    assert r.ss_within == pytest.approx(ssw, abs=1e-5, rel=1e-6)
    assert r.f_stat == pytest.approx(f, abs=1e-5, rel=1e-6)
    assert r.eta_sq == pytest.approx(ssb / (ssb + ssw), abs=1e-5)


def test_spearman_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import spearman_corr

    rng = _rng(9)

    x = rng.normal(0, 1, 200).round(1)
    y = (x**3 + rng.normal(0, 1, 200)).round(1)
    rows = [(float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = spearman_corr(df, "x", "y").collect()[0]

    rx, ry = _ranks(x), _ranks(y)
    rho = float(np.corrcoef(rx, ry)[0, 1])
    assert r.n == 200
    assert r.rho == pytest.approx(rho, abs=1e-6)


def test_cohens_d_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import cohens_d

    rng = _rng(10)

    a = rng.normal(5.0, 1.0, 90)
    b = rng.normal(5.6, 1.3, 110)
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    df = spark.createDataFrame(rows, "grp string, v double")
    r = cohens_d(df, "grp", "v", "a", "b").collect()[0]

    na, nb = len(a), len(b)
    sa2 = a.var(ddof=1)
    sb2 = b.var(ddof=1)
    pooled = math.sqrt(((na - 1) * sa2 + (nb - 1) * sb2) / (na + nb - 2))
    d = (a.mean() - b.mean()) / pooled
    assert r.pooled_sd == pytest.approx(pooled, abs=1e-6)
    assert r.d == pytest.approx(d, abs=1e-6)


def test_gini_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import (
        gini_concentration,
    )

    rng = _rng(11)

    vals = rng.pareto(1.5, 150) + 0.1
    rows = [(str(i), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, v double")
    r = gini_concentration(df, "k", "v").collect()[0]

    s = np.sort(vals)
    n = len(s)
    g = 2.0 * (np.arange(1, n + 1) * s).sum() / (n * s.sum()) - (
        n + 1
    ) / n
    assert r.n == n
    assert r.gini == pytest.approx(g, abs=1e-6)


def test_ks_test_vs_numpy(spark):
    from moz_datapipeline_spark.operators.validation import ks_test

    rng = _rng(12)

    a = rng.normal(0.0, 1.0, 250).round(2)
    b = rng.normal(0.3, 1.0, 200).round(2)
    dfa = spark.createDataFrame([(float(v),) for v in a], "x double")
    dfb = spark.createDataFrame([(float(v),) for v in b], "x double")
    r = ks_test(dfa, dfb, "x").collect()[0]

    allv = np.sort(np.unique(np.concatenate([a, b])))
    fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    d = float(np.abs(fa - fb).max())
    # Kolmogorov asymptotic p: 2 sum (-1)^{j-1} exp(-2 j^2 lam^2)
    en = math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    lam = (en + 0.12 + 0.11 / en) * d
    p = 2.0 * sum(
        (-1) ** (j - 1) * math.exp(-2.0 * j * j * lam * lam)
        for j in range(1, 101)
    )
    p = max(0.0, min(1.0, p))
    assert r.ks_stat == pytest.approx(d, abs=1e-6)
    assert r.p_value == pytest.approx(p, abs=5e-3)


def test_trimmed_mean_vs_numpy(spark):
    from moz_datapipeline_spark.operators.analytics import trimmed_mean

    rng = _rng(13)

    vals = np.concatenate(
        [rng.normal(50, 5, 180), np.array([500.0, -400.0])]
    ).round(2)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    r = trimmed_mean(df, "x", trim=0.1).collect()[0]

    lo = float(np.quantile(vals, 0.1, method="linear"))
    hi = float(np.quantile(vals, 0.9, method="linear"))
    kept = vals[(vals >= lo) & (vals <= hi)]
    assert r.lo_cut == pytest.approx(lo, abs=1e-6)
    assert r.hi_cut == pytest.approx(hi, abs=1e-6)
    assert r.trimmed_mean == pytest.approx(float(kept.mean()), abs=1e-6)
    assert r.n_used == len(kept)
