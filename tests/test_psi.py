"""PSI drift detection (operators/validation.psi_drift)."""

from __future__ import annotations

import math

import pytest

from moz_datapipeline_spark.operators.validation import psi_drift


def _ref_psi(ref_vals, cur_vals, nbins=10, eps=1e-6):
    ref_vals = [v for v in ref_vals if v is not None]
    cur_vals = [v for v in cur_vals if v is not None]
    lo, hi = min(ref_vals), max(ref_vals)
    width = (hi - lo) / nbins

    def bin_of(v):
        if hi == lo:
            return 0
        return max(min(int(math.floor((v - lo) / width)), nbins - 1), 0)

    rn = [0] * nbins
    cn = [0] * nbins
    for v in ref_vals:
        rn[bin_of(v)] += 1
    for v in cur_vals:
        cn[bin_of(v)] += 1
    tr, tc = float(sum(rn)), float(sum(cn))
    psi = 0.0
    for b in range(nbins):
        pr = max(rn[b] / tr, eps)
        pc = max(cn[b] / tc, eps)
        psi += (pc - pr) * math.log(pc / pr)
    return psi


def test_psi_identical_distribution_is_zero(spark):
    vals = [float(i % 10) for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = psi_drift(df, df, ["x"], nbins=10).collect()
    assert len(got) == 1 and abs(got[0].psi) < 1e-12


def test_psi_matches_reference_and_detects_shift(spark):
    ref_vals = [float(i % 100) for i in range(500)]
    cur_vals = [float(i % 100) * 0.3 + 70.0 for i in range(400)]
    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "x double")
    got = psi_drift(ref, cur, ["x"]).collect()[0].psi
    want = _ref_psi(ref_vals, cur_vals)
    assert abs(got - want) < 1e-9
    assert got > 0.2  # a hard shift must trip the action threshold


def test_psi_clamps_out_of_range_and_ignores_nulls(spark):
    ref = spark.createDataFrame(
        [(float(v),) for v in range(10)] + [(None,)], "x double"
    )
    cur = spark.createDataFrame(
        [(-5.0,), (99.0,), (None,)], "x double"
    )
    got = psi_drift(ref, cur, ["x"], nbins=5).collect()[0].psi
    want = _ref_psi(
        [float(v) for v in range(10)], [-5.0, 99.0], nbins=5
    )
    assert abs(got - want) < 1e-9


def test_psi_empty_side_yields_null(spark):
    ref = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    cur = spark.createDataFrame([], "x double")
    row = psi_drift(ref, cur, ["x"]).collect()[0]
    assert row.psi is None


def test_psi_multi_column_one_row_each(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 30.0)], "a double, b double"
    )
    rows = psi_drift(df, df, ["a", "b"]).collect()
    assert sorted(r.column for r in rows) == ["a", "b"]
    with pytest.raises(ValueError, match="column"):
        psi_drift(df, df, [])


def test_mutual_information_independent_vs_dependent(spark):
    import math

    from moz_datapipeline_spark.operators.validation import (
        mutual_information,
    )

    # perfectly dependent: y = x over a uniform grid -> MI = ln(nbins)
    rows = [(float(i % 100), float(i % 100)) for i in range(1000)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = mutual_information(df, "x", "y", nbins=10).collect()[0]
    assert abs(r.mi - math.log(10)) < 1e-9
    assert r.n_rows == 1000

    # independent: y cycles at a coprime stride -> MI ~ 0
    rows2 = [(float(i % 10), float((i * 7) % 9)) for i in range(900)]
    df2 = spark.createDataFrame(rows2, "x double, y double")
    r2 = mutual_information(df2, "x", "y", nbins=3).collect()[0]
    assert abs(r2.mi) < 0.02

    # constant column carries no information
    rows3 = [(1.0, float(i)) for i in range(50)]
    df3 = spark.createDataFrame(rows3, "x double, y double")
    r3 = mutual_information(df3, "x", "y").collect()[0]
    assert abs(r3.mi) < 1e-12


def test_benford_audit_digits_and_chi2(spark):
    import math

    from moz_datapipeline_spark.operators.validation import benford_audit

    # crafted values: digit of 1000.0 must be 1 (the log10 trap), 0.04
    # -> 4, negatives by magnitude, zero and NULL dropped
    vals = [1000.0, 0.04, -230.5, 1.0, 19.5, 0.0, None, 999.99]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r.digit: r for r in benford_audit(df, "x").collect()}
    assert set(rows) == set(range(1, 10))
    counts = {d: rows[d].n for d in rows if rows[d].n > 0}
    assert counts == {1: 3, 2: 1, 4: 1, 9: 1}
    total = 6.0
    chi2 = sum(
        (rows[d].n - total * math.log10(1 + 1 / d)) ** 2
        / (total * math.log10(1 + 1 / d))
        for d in range(1, 10)
    )
    assert abs(rows[1].chi2 - chi2) < 1e-6
    assert abs(sum(r.observed_p for r in rows.values()) - 1.0) < 1e-9


def test_chi_square_matches_scipy_style_reference(spark):
    from moz_datapipeline_spark.operators.validation import (
        chi_square_independence,
    )

    # 2x2 with a known dependent structure + an absent cell
    rows = (
        [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "y")] * 25
    )
    df = spark.createDataFrame(rows, "u string, v string")
    r = chi_square_independence(df, "u", "v").collect()[0]

    def ref(table):
        import itertools

        xs = sorted({x for x, _ in table})
        ys = sorted({y for _, y in table})
        n = {
            (x, y): sum(1 for a, b in table if (a, b) == (x, y))
            for x, y in itertools.product(xs, ys)
        }
        t = float(len(table))
        nx = {x: sum(n[(x, y)] for y in ys) for x in xs}
        ny = {y: sum(n[(x, y)] for x in xs) for y in ys}
        chi2 = sum(
            (n[(x, y)] - nx[x] * ny[y] / t) ** 2 / (nx[x] * ny[y] / t)
            for x in xs
            for y in ys
        )
        return chi2, (len(xs) - 1) * (len(ys) - 1), t

    chi2, dof, t = ref(rows)
    assert abs(r.chi2 - chi2) < 1e-9
    assert r.dof == dof and r.n_rows == int(t)
    assert abs(r.cramers_v - (chi2 / (t * 1)) ** 0.5) < 1e-9

    # independent table -> chi2 ~ 0; single-level column -> dof 0
    ind = spark.createDataFrame(
        [(x, y) for x in "ab" for y in "xy" for _ in range(10)],
        "u string, v string",
    )
    r2 = chi_square_independence(ind, "u", "v").collect()[0]
    assert abs(r2.chi2) < 1e-9 and r2.cramers_v is not None
    one = spark.createDataFrame(
        [("a", "x"), ("a", "y")], "u string, v string"
    )
    r3 = chi_square_independence(one, "u", "v").collect()[0]
    assert r3.dof == 0 and r3.chi2 == 0.0 and r3.cramers_v is None


def test_psi_survives_astronomical_out_of_range_value(spark):
    """ADVICE r7: a current value far outside the reference range — the
    exact event PSI monitors — must clamp into the edge bin, not
    overflow the int cast and kill the job under ANSI mode."""
    ref = spark.createDataFrame(
        [(float(v),) for v in range(10)], "x double"
    )
    cur = spark.createDataFrame(
        [(1e300,), (-1e300,), (5.0,)], "x double"
    )
    got = psi_drift(ref, cur, ["x"], nbins=5).collect()[0].psi
    want = _ref_psi(
        [float(v) for v in range(10)], [1e300, -1e300, 5.0], nbins=5
    )
    assert abs(got - want) < 1e-9


def test_benford_extreme_magnitudes(spark):
    """ADVICE r7: |x| < 1e-6 must keep its true first digit (not round
    into a decimal(38,6) scale) and |x| >= 1e32 must not overflow."""
    from moz_datapipeline_spark.operators.validation import benford_audit

    vals = [6e-7, 4e-7, 1e33, -2.5e40, 9.99e-20, 1000.0, 0.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = {r.digit: r for r in benford_audit(df, "x").collect()}
    counts = {d: rows[d].n for d in rows if rows[d].n > 0}
    assert counts == {6: 1, 4: 1, 1: 2, 2: 1, 9: 1}
