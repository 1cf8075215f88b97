"""ML featurization operators: target encoding and the hashing trick.

The training-data pipeline's last mile: turning curated rows into model
features without a driver-side fit step.  Both operators are pure
DataFrame plans with deterministic, engine-portable arithmetic (the
dedup family's md5 convention), so feature values replay bit-for-bit
across runs, partitionings, and engines.

Reference parity: extension surface (the reference has no ML
featurization); the hash conventions follow ``operators/dedup``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from moz_datapipeline_spark.operators.dedup import _token_hash


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: float = 10.0,
    out_col: str | None = None,
    broadcast_categories: bool = True,
) -> DataFrame:
    """Smoothed mean-target encoding (the empirical-Bayes shrinkage
    form):

        enc(c) = (Σ_c y + m·ȳ_global) / (n_c + m)

    — a rare category shrinks toward the global mean, a frequent one
    approaches its own mean; ``m`` (``smoothing``) is the pseudo-count
    where the two weigh equally.  NULL targets are excluded from the
    statistics; NULL categories encode to the global mean via the
    same formula over the NULL group (explicitly grouped, not
    dropped).  Adds ``out_col`` (default ``<category>_te``) plus
    nothing else; every input row survives.

    LEAKAGE NOTE: this is the fit-on-everything form — fit it on the
    TRAIN split and join onto val/test, or the target leaks.  The
    encoding table is returned joined; to materialize the table
    itself, aggregate the distinct (category, out_col) pairs.

    Plan: one hash aggregate for the category table + one 1-row
    global-mean aggregate broadcast into it; the encode is a single
    equi join — broadcast by default (category tables are almost
    always dimension-sized; pass ``broadcast_categories=False`` for
    ultra-high-cardinality keys and let AQE pick the strategy).
    """
    out_col = out_col or f"{category_col}_te"
    y = F.col(target_col).cast("double")
    per = (
        df.filter(y.isNotNull())
        .groupBy(F.col(category_col).alias("_cat"))
        .agg(F.sum(y).alias("_sy"), F.count(F.lit(1)).alias("_n"))
    )
    g = df.filter(y.isNotNull()).agg(F.avg(y).alias("_prior"))
    m = F.lit(float(smoothing))
    enc = per.crossJoin(F.broadcast(g)).select(
        "_cat",
        (
            (F.col("_sy") + m * F.col("_prior"))
            / (F.col("_n").cast("double") + m)
        ).alias(out_col),
    )
    if broadcast_categories:
        enc = F.broadcast(enc)
    return df.join(
        enc, df[category_col].eqNullSafe(enc["_cat"]), "left"
    ).drop("_cat")


def hashed_features(
    df: DataFrame,
    text_col: str = "text",
    n_features: int = 64,
    id_col: str = "doc_id",
    portable_hash: bool = True,
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): sparse bag-of-words
    features in a FIXED ``n_features``-dimensional space with no
    vocabulary pass — ``(id, bucket, weight)`` rows where ``bucket =
    h(token) mod n`` and each occurrence contributes ±1 by an
    independent sign hash (the signed construction keeps collision
    noise zero-mean).  Zero-weight buckets (signs cancelled) are
    dropped — the sparse contract.

    This is the scale answer to one-hot/vocab encoders: no global
    vocabulary shuffle, no OOV handling, memory O(n_features) per doc.
    Plan: explode → two integer hashes per token (md5-portable by
    default — the DuckDB oracle replays exactly; ``portable_hash=
    False`` swaps in xxhash64, the dedup family's fast path) → one
    map-side-combined hash aggregate on (id, bucket).
    """
    if n_features < 1:
        raise ValueError("hashed_features: n_features must be >= 1")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(toks).alias("_tok")
    )
    h_b = _token_hash(F.concat(F.lit("fh:"), F.col("_tok")), portable_hash)
    h_s = _token_hash(F.concat(F.lit("fs:"), F.col("_tok")), portable_hash)
    signed = base.select(
        id_col,
        F.pmod(h_b, F.lit(n_features)).cast("int").alias("bucket"),
        F.when(F.pmod(h_s, F.lit(2)) == 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("_sign"),
    )
    return (
        signed.groupBy(id_col, "bucket")
        .agg(F.sum("_sign").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def quantile_bin(
    df: DataFrame,
    column: str,
    k: int = 8,
    bin_col: str = "bin",
) -> DataFrame:
    """Equal-frequency discretization: adds ``bin_col`` ∈ [0, k)
    assigning each row to its quantile bucket of ``column`` — the
    featurization step behind monotone-binned features, decile
    reports, and per-bucket calibration (``decile_lift`` ranks
    per-row; this publishes the REUSABLE cut points, the train-time
    artifact a serving path can apply to new data without re-ranking).

    Breakpoints are the interpolated ``i/k`` quantiles (the
    ``percentile`` builtin's definition) computed DISTRIBUTED via
    ``ranges.exact_quantiles`` — never a global sort or single-task
    percentile buffer.  Binning is then a pure scalar fold:
    ``bin = Σ_i [value > b_i]`` over the ≤ k−1 DISTINCT breakpoints,
    broadcast as literals (heavy ties collapse equal breakpoints, so
    tied values land in one merged bin — deterministic, never
    partition-lottery).  NULL/NaN values get a NULL bin.

    Scale shape: the breakpoint pass is ``exact_quantiles``' three
    bounded passes (histogram exchange ≤ bucket_count rows); the
    assignment is one codegen expression on the scan — zero shuffles
    added to the consuming plan.

    Reference parity: extension operator (featurization family,
    ``features.target_encode``); the reference's percentile machinery
    is scripts/utils.js:171-186 (criticality score binning).
    """
    from moz_datapipeline_spark.operators.ranges import exact_quantiles

    if k < 2:
        raise ValueError("quantile_bin: k must be >= 2")
    probs = [i / k for i in range(1, k)]
    breaks = exact_quantiles(df, column, probs)
    v = F.col(column).cast("double")
    if breaks is None:
        return df.withColumn(
            bin_col, F.when(v.isNotNull(), F.lit(0)).cast("int")
        )
    distinct_breaks = sorted(set(breaks))
    expr = None
    for b in distinct_breaks:
        term = (v > F.lit(float(b))).cast("int")
        expr = term if expr is None else expr + term
    if expr is None:
        expr = F.lit(0)
    return df.withColumn(
        bin_col,
        F.when(v.isNotNull() & ~F.isnan(v), expr).cast("int"),
    )


def quantile_bin_grouped(
    df: DataFrame,
    group_col: str,
    column: str,
    k: int = 8,
    bin_col: str = "bin",
) -> DataFrame:
    """Per-group equal-frequency discretization: like ``quantile_bin``
    but with breakpoints computed WITHIN each ``group_col`` value —
    per-language length buckets, per-cohort spend deciles — so bin 3
    means the same relative position in every group.

    Breakpoints ride ``ranges.exact_quantiles_grouped`` (the same
    bounded histogram passes, per-group cells); assignment joins the
    ≤ |groups|·(k−1) breakpoint rows back BROADCAST and folds
    ``Σ[v > bᵢ]`` over the group's own distinct cut list — one
    codegen HOF, no window, no per-group shuffle.  Low-cardinality
    groupings only (the ``max_groups`` contract of the quantile
    kernel — it raises beyond that rather than degrade).  NULL/NaN
    values get a NULL bin.
    """
    from moz_datapipeline_spark.operators.ranges import (
        exact_quantiles_grouped,
    )

    if k < 2:
        raise ValueError("quantile_bin_grouped: k must be >= 2")
    probs = [i / k for i in range(1, k)]
    per_group = exact_quantiles_grouped(df, group_col, column, probs)
    if per_group is None:
        raise ValueError(
            "quantile_bin_grouped: grouping too wide or input empty "
            "(exact_quantiles_grouped declined)"
        )
    spark = df.sparkSession
    rows = [
        (g, sorted(set(bl)))
        for g, bl in per_group.items()
        if bl is not None
    ]
    gtype = df.schema[group_col].dataType
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    cuts = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("_g", gtype),
                StructField("_cuts", ArrayType(DoubleType())),
            ]
        ),
    )
    v = F.col(column).cast("double")
    joined = df.join(
        F.broadcast(cuts), df[group_col] == cuts["_g"], "left"
    ).drop("_g")
    nbin = F.size(
        F.filter("_cuts", lambda b: v > b)
    )
    return joined.withColumn(
        bin_col,
        F.when(
            v.isNotNull() & ~F.isnan(v) & F.col("_cuts").isNotNull(),
            nbin,
        ).cast("int"),
    ).drop("_cuts")


def collapse_rare(
    df: DataFrame,
    category_col: str,
    min_count: int = 10,
    other_label: str = "__other__",
    out_col: str | None = None,
) -> DataFrame:
    """Rare-label collapse: categories of ``category_col`` seen fewer
    than ``min_count`` times become ``other_label`` — the standard
    pre-encoding guard (target/one-hot/hashing encoders explode on
    million-label tails; serving hits labels training never saw).
    Writes to ``out_col`` (default: in place).

    Plan: one category-sized rollup, broadcast back as a keep-list
    semi structure (left join + conditional) — the data-sized pass is
    a broadcast join plus a codegen conditional, no shuffle of the
    input.  NULL categories stay NULL (they are their own signal, not
    a rare label).
    """
    if min_count < 1:
        raise ValueError("collapse_rare: min_count must be >= 1")
    out = out_col or category_col
    keep = (
        df.filter(F.col(category_col).isNotNull())
        .groupBy(F.col(category_col).alias("_cat"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= min_count)
        .select("_cat")
    )
    joined = df.join(
        F.broadcast(keep), df[category_col] == keep["_cat"], "left"
    )
    return joined.withColumn(
        out,
        F.when(F.col(category_col).isNull(), F.lit(None).cast("string"))
        .when(F.col("_cat").isNotNull(), F.col(category_col))
        .otherwise(F.lit(other_label)),
    ).drop("_cat")


def robust_scale(
    df: DataFrame,
    column: str,
    group_col: str | None = None,
    out_col: str = "robust_z",
) -> DataFrame:
    """Robust z-score featurization: adds ``out_col`` =
    ``(x − median) / (1.4826·MAD)`` (optionally per ``group_col``) —
    the outlier-proof sibling of mean/std standardization: a single
    fat-finger value shifts a mean-based z for EVERY row, but median
    and MAD have 50% breakdown.  The scaling constants are the
    train-time artifact (same philosophy as ``quantile_bin``'s cut
    points); ``mad_outliers`` reports the outlier COUNTS, this
    publishes the per-row feature.

    Median and MAD come from ``ranges.exact_quantiles[_grouped]``
    (distributed histogram selection) and inline as literals — the
    scaled column is a pure codegen expression on the scan, zero
    joins.  A zero-MAD slice (over half the values tied) yields a
    NULL feature (no meaningful scale exists); NULL/NaN inputs stay
    NULL.
    """
    from moz_datapipeline_spark.operators.ranges import (
        exact_quantiles,
        exact_quantiles_grouped,
    )

    x = F.col(column).cast("double")
    base = df.filter(x.isNotNull() & ~F.isnan(x))
    c = F.lit(1.4826)
    if group_col is None:
        med = exact_quantiles(base.select(x.alias("_x")), "_x", [0.5])
        if med is None:
            return df.withColumn(out_col, F.lit(None).cast("double"))
        m = float(med[0])
        mad = exact_quantiles(
            base.select(F.abs(x - F.lit(m)).alias("_d")), "_d", [0.5]
        )
        sigma = c * F.lit(float(mad[0])) if mad else F.lit(None)
        z = F.when(
            x.isNotNull() & ~F.isnan(x) & (F.lit(mad[0] if mad else 0.0) > 0),
            (x - F.lit(m)) / sigma,
        )
        return df.withColumn(out_col, F.round(z, 6))
    med = exact_quantiles_grouped(
        base.select(F.col(group_col).alias("_g"), x.alias("_x")),
        "_g",
        "_x",
        [0.5],
    )
    if med is None:
        raise ValueError(
            "robust_scale: grouping too wide or empty "
            "(exact_quantiles_grouped declined)"
        )
    g = F.col(group_col)
    med_m = F.create_map(
        *[cc for kk, v in med.items() for cc in (F.lit(kk), F.lit(v[0]))]
    )
    dev = base.select(
        F.col(group_col).alias("_g"),
        F.abs(x - F.element_at(med_m, g)).alias("_d"),
    )
    mad = exact_quantiles_grouped(dev, "_g", "_d", [0.5])
    if mad is None:
        raise ValueError("robust_scale: MAD pass declined")
    mad_m = F.create_map(
        *[cc for kk, v in mad.items() for cc in (F.lit(kk), F.lit(v[0]))]
    )
    m_g = F.element_at(med_m, g)
    mad_g = F.element_at(mad_m, g)
    z = F.when(
        x.isNotNull() & ~F.isnan(x) & (mad_g > 0),
        (x - m_g) / (c * mad_g),
    )
    return df.withColumn(out_col, F.round(z, 6))


def calendar_features(
    df: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Forecasting calendar features from a LONG epoch-ns timestamp:
    adds ``(epoch_day, day_of_week, is_weekend, hour_of_day, dow_sin,
    dow_cos, hour_sin, hour_cos)`` — the standard seasonal encoders
    for regression/boosting models (cyclic sin/cos so hour 23 sits
    next to hour 0, where a raw integer puts them farthest apart).

    ``day_of_week`` is 0=Monday..6=Sunday computed by PURE INTEGER
    arithmetic (``(epoch_day + 3) mod 7`` — 1970-01-01 was a
    Thursday), so it is timezone-free and engine-exact: the built-in
    ``dayofweek``/DuckDB ``dow`` disagree on numbering AND shift with
    session timezones, the exact bug class the ``_events`` ns
    contract exists to kill.  Pure projection — zero shuffles.
    """
    ns = F.col(ts_col).cast("long")
    eday = F.floor(ns / F.lit(86_400_000_000_000)).cast("long")
    dow = F.pmod(eday + F.lit(3), F.lit(7)).cast("int")
    hour = F.pmod(
        F.floor(ns / F.lit(3_600_000_000_000)).cast("long"), F.lit(24)
    ).cast("int")
    two_pi = 2.0 * math.pi
    return (
        df.withColumn("epoch_day", eday)
        .withColumn("day_of_week", dow)
        .withColumn("is_weekend", dow >= 5)
        .withColumn("hour_of_day", hour)
        .withColumn(
            "dow_sin",
            F.round(F.sin(dow.cast("double") * F.lit(two_pi / 7.0)), 6),
        )
        .withColumn(
            "dow_cos",
            F.round(F.cos(dow.cast("double") * F.lit(two_pi / 7.0)), 6),
        )
        .withColumn(
            "hour_sin",
            F.round(
                F.sin(hour.cast("double") * F.lit(two_pi / 24.0)), 6
            ),
        )
        .withColumn(
            "hour_cos",
            F.round(
                F.cos(hour.cast("double") * F.lit(two_pi / 24.0)), 6
            ),
        )
    )
