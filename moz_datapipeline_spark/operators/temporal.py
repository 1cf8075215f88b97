"""Temporal joins Spark lacks as built-ins: as-of join.

``asof_join`` attaches to each left row the most recent right row at or
before its timestamp, per key — the staple of event/state enrichment
(prices, sensor states, config versions).

Implementation is the union-and-carry trick, NOT a per-row lookup:
tag both sides, union, sort within key by (ts, side, right-row) and
carry the last non-null right-row STRUCT forward with an
unbounded-preceding window. One shuffle on the key; no range explosion;
skew follows the key distribution (salt upstream if a key dominates).

All carried fields are packed in one struct so they always come from the
SAME matched right row — including its genuine NULLs — matching
``pandas.merge_asof`` semantics (carrying each column independently with
``ignorenulls`` would mix fields from different right rows whenever the
latest row holds a NULL).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from moz_datapipeline_spark.localresult import literal_frame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` on the same key (inclusive).

    Right-side timestamps equal to the left timestamp match (the right
    row sorts first via the side tag). Left rows with no prior right row
    get nulls for every carried column.

    Duplicate right timestamps on a key are resolved deterministically:
    the greatest carried-struct value (field-wise comparison, matched
    ts first) wins, giving a total order independent of partition
    layout.
    """
    lcols = left.columns
    out_carried = [f"{c}{suffix}" for c in right_value_cols] + [f"{ts}{suffix}"]

    # One struct holding the matched right row. Field order puts the
    # right timestamp first so the dedup tiebreak is primarily temporal.
    r_struct = F.struct(
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key), F.col(ts), F.lit(0).alias("_side"), r_struct.alias("_r")
    )
    r_type = r_tagged.schema["_r"].dataType
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    # align schemas: left columns absent on the right become nulls
    for c in lcols:
        if c not in (key, ts):
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    # Tiebreak on the struct itself: duplicate right timestamps per key
    # order deterministically (left rows all have a NULL struct, and only
    # tie with other left rows, whose carried value is identical anyway).
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(ts).asc(),
            F.col("_side").asc(),
            F.col("_r").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = unioned.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return matched.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_r.{c}").alias(c) for c in out_carried],
    )


_BUCKET_NS = {
    "hour": 3_600_000_000_000,
    "day": 86_400_000_000_000,
}


def _bucket_epoch(df: DataFrame, ts_col: str, bucket: str):
    """Bucket start as LONG epoch-seconds, accepting either time
    layout the events table has shipped: long epoch-nanoseconds (the
    engine's normalized contract) or a parquet TIMESTAMP.  Exact
    integer math in ns — tz-independent, and robust to the layout
    changing under the driver (the ``_events()`` gotcha)."""
    if bucket not in _BUCKET_NS:
        raise ValueError(f"unsupported bucket {bucket!r}; use hour/day")
    step = _BUCKET_NS[bucket]
    dtype = df.schema[ts_col].dataType.typeName()
    if dtype.startswith("timestamp"):
        ns = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            f" cast({ts_col} as timestamp_ntz)) * 1000"
        )
    else:
        ns = F.col(ts_col).cast("long")
    return (F.floor(ns / F.lit(step)) * F.lit(step // 1_000_000_000)).cast(
        "long"
    )


def rolling_zscore_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    window: int = 24,
    threshold: float = 3.0,
) -> DataFrame:
    """Time-series anomaly flags: bucket events per group into
    ``bucket``-sized intervals, then z-score each bucket's metric
    against the TRAILING ``window`` buckets (exclusive of itself).

    Returns ``(group, bucket_epoch, metric, mean_prev, std_prev, zscore,
    is_anomaly)``; buckets with fewer than 2 trailing observations get
    ``zscore = NULL, is_anomaly = false`` (no basis to judge).

    Scale: one hash aggregate events→buckets (map-side combine crushes
    the volume to |groups|·|buckets| rows), then one window over that
    SMALL rollup — the expensive sort never touches raw events, so the
    plan holds at 100 TB of events as long as the rollup fits the
    cluster, which it does by construction.  Std uses the sample
    formula (Welford-equivalent via sum/sum²) to match
    ``stddev_samp``; z = (x − mean_prev)/std_prev.
    """
    b = _bucket_epoch(events, ts_col, bucket)
    rollup = (
        events.groupBy(F.col(group_col).alias("grp"), b.alias("bucket_epoch"))
        .agg(F.sum(value_col).alias("metric"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bucket_epoch")
        .rowsBetween(-window, -1)
    )
    mean_prev = F.avg("metric").over(w)
    std_prev = F.stddev_samp("metric").over(w)
    n_prev = F.count("metric").over(w)
    z = F.when(
        (n_prev >= 2) & (std_prev > 0),
        (F.col("metric") - mean_prev) / std_prev,
    )
    return rollup.select(
        F.col("grp").alias(group_col),
        "bucket_epoch",
        F.round("metric", 6).alias("metric"),
        F.round(mean_prev, 6).alias("mean_prev"),
        F.round(std_prev, 6).alias("std_prev"),
        F.round(z, 6).alias("zscore"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def ewma_smooth(
    events: DataFrame,
    alpha: float = 0.3,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Exponentially-weighted moving average per group over bucketed
    rollups: ``s_t = α·x_t + (1−α)·s_{t−1}`` (``s_1 = x_1``), the
    standard smoother for dashboards/alerting baselines.  Returns
    ``(group, bucket_epoch, metric, ewma)`` — bucket starts as LONG
    epoch-seconds (layout-robust, see ``_bucket_epoch``).

    Design note: EWMA is a RECURSIVE scan — no Spark window or array
    HOF expresses a running fold with per-element output — so this is
    one of the few legitimate Pandas-kernel operators
    (``applyInPandas`` per group, ``pandas .ewm(adjust=False)``, which
    computes exactly that recursion in float64).  The kernel runs on
    the ROLLUP (|groups|·|buckets| rows, built first with a map-side-
    combined hash aggregate), never raw events, so the Python surface
    is tiny at any corpus size; parallelism = |groups|, acceptable
    because the rollup is small by construction.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("ewma_smooth: need 0 < alpha <= 1")
    rollup = (
        events.groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("bucket_epoch"),
        )
        .agg(F.sum(value_col).alias("metric"))
    )

    a = float(alpha)

    def kernel(pdf):
        pdf = pdf.sort_values("bucket_epoch").reset_index(drop=True)
        pdf["ewma"] = (
            pdf["metric"].ewm(alpha=a, adjust=False).mean().round(6)
        )
        pdf["metric"] = pdf["metric"].round(6)
        return pdf

    schema = (
        "grp string, bucket_epoch long, metric double, ewma double"
    )
    out = rollup.groupBy("grp").applyInPandas(kernel, schema)
    return out.select(
        F.col("grp").alias(group_col), "bucket_epoch", "metric", "ewma"
    )


def cusum_changepoints(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    k_sigmas: float = 0.5,
    h_sigmas: float = 4.0,
) -> DataFrame:
    """Tabular CUSUM change-point statistics per group over bucketed
    rollups: the classic two-sided recursion

        s_pos_t = max(0, s_pos_{t-1} + (x_t - mu - k))
        s_neg_t = max(0, s_neg_{t-1} + (mu - x_t - k))

    with mu/sigma the group's retrospective series mean / sample
    stddev, slack ``k = k_sigmas * sigma`` and decision interval
    ``h = h_sigmas * sigma``.  Returns ``(group, bucket_epoch, metric,
    s_pos, s_neg, is_change)`` — ``is_change`` marks every bucket
    whose statistic exceeds ``h`` (no post-detection reset: the
    statistic is reported, the reset policy is the caller's).
    Groups with fewer than 2 buckets or zero variance have no scale
    for ``k``/``h``: their statistics are 0 and never flag.

    Like ``ewma_smooth``, the recursion's running max(0, ·) fold has
    per-element output no Spark window or array HOF expresses, so the
    kernel is ``applyInPandas`` — but only over the |groups|·|buckets|
    ROLLUP built first by a map-side-combined hash aggregate, never
    raw events, so the Python surface stays tiny at any corpus size.
    """
    rollup = (
        events.groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("bucket_epoch"),
        )
        .agg(F.sum(value_col).alias("metric"))
    )
    ks, hs = float(k_sigmas), float(h_sigmas)

    def kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values("bucket_epoch").reset_index(drop=True)
        x = pdf["metric"].astype("float64").to_numpy()
        n = len(x)
        sp = np.zeros(n)
        sn = np.zeros(n)
        flag = np.zeros(n, dtype=bool)
        sd = float(pdf["metric"].std(ddof=1)) if n >= 2 else 0.0
        if sd > 0.0:
            mu = float(pdf["metric"].mean())
            k = ks * sd
            h = hs * sd
            ap, an = 0.0, 0.0
            for i in range(n):
                ap = max(0.0, ap + (x[i] - mu - k))
                an = max(0.0, an + (mu - x[i] - k))
                sp[i], sn[i] = ap, an
                flag[i] = ap > h or an > h
        pdf["s_pos"] = np.round(sp, 6)
        pdf["s_neg"] = np.round(sn, 6)
        pdf["is_change"] = flag
        pdf["metric"] = pdf["metric"].round(6)
        return pdf

    schema = (
        "grp string, bucket_epoch long, metric double, "
        "s_pos double, s_neg double, is_change boolean"
    )
    out = rollup.groupBy("grp").applyInPandas(kernel, schema)
    return out.select(
        F.col("grp").alias(group_col),
        "bucket_epoch",
        "metric",
        "s_pos",
        "s_neg",
        "is_change",
    )


def seasonal_decompose(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    period: int = 24,
    trend_window: int = 12,
) -> DataFrame:
    """Classical additive seasonal decomposition per group over
    bucketed rollups: ``metric = trend + seasonal + residual`` with

    - ``trend``: centered moving average over ±``trend_window`` rows
      (computed over the rows available at the series edges — defined
      everywhere rather than NULL-trimmed, documented deviation from
      the textbook's full-window-only convention);
    - ``seasonal``: the per-(group, phase) mean of the detrended
      series — phase = (bucket index) mod ``period`` — recentred so
      each group's seasonal components sum to zero;
    - ``residual``: what's left.

    Returns ``(group, bucket_epoch, phase, metric, trend, seasonal,
    residual)``.

    Scale: the raw events collapse into a |groups|·|buckets| rollup
    via one map-side-combined hash aggregate FIRST; the window sort,
    the phase aggregate, and the recentring all run on that small
    rollup — the plan's cost is the rollup scan, regardless of event
    volume.  Everything is JVM expressions; no Python kernel (unlike
    the CUSUM/EWMA recursions, every term here is a plain window or
    group mean).
    """
    if period < 2:
        raise ValueError("seasonal_decompose: need period >= 2")
    step = _BUCKET_NS[bucket] // 1_000_000_000
    rollup = (
        events.groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("bucket_epoch"),
        )
        .agg(F.sum(value_col).alias("metric"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("bucket_epoch")
        .rowsBetween(-trend_window, trend_window)
    )
    with_trend = rollup.select(
        "grp",
        "bucket_epoch",
        "metric",
        F.pmod(
            F.floor(F.col("bucket_epoch") / step).cast("long"),
            F.lit(period),
        ).cast("int").alias("phase"),
        F.avg("metric").over(w).alias("trend"),
    )
    phase_mean = with_trend.groupBy("grp", "phase").agg(
        F.avg(F.col("metric") - F.col("trend")).alias("_s_raw")
    )
    grp_mean = phase_mean.groupBy("grp").agg(
        F.avg("_s_raw").alias("_s_bar")
    )
    seasonal = (
        phase_mean.join(grp_mean, "grp")
        .select(
            "grp",
            "phase",
            (F.col("_s_raw") - F.col("_s_bar")).alias("seasonal"),
        )
    )
    return (
        with_trend.join(seasonal, ["grp", "phase"])
        .select(
            F.col("grp").alias(group_col),
            "bucket_epoch",
            "phase",
            F.round("metric", 6).alias("metric"),
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round(
                F.col("metric") - F.col("trend") - F.col("seasonal"), 6
            ).alias("residual"),
        )
    )


def lag_features(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    lags: Sequence[int] = (1, 2, 3),
    rolling_window: int = 6,
) -> DataFrame:
    """Supervised-learning feature builder over bucketed rollups: per
    group and bucket emit the metric, its ``lag_k`` values (k buckets
    earlier in the SERIES order — gaps are not filled: a lag skips
    over missing buckets, the rollup's row order is the contract),
    and the trailing ``rolling_window``-row mean EXCLUDING the current
    row (no target leakage — the feature at time t sees only t-1 and
    earlier).

    Returns ``(group, bucket_epoch, metric, lag_1.., rolling_mean,
    rolling_n)`` — ``rolling_n`` counts the rows behind the mean so a
    training pipeline can gate on warm-up length.

    Scale: the expensive part is the events→rollup hash aggregate
    (map-side combined); the window runs per group over the SMALL
    rollup, hash-partitioned on the group — never a global sort.
    """
    lag_list = sorted(set(int(v) for v in lags))
    if not lag_list or lag_list[0] < 1:
        raise ValueError("lag_features: lags must be >= 1")
    if rolling_window < 1:
        raise ValueError("lag_features: rolling_window must be >= 1")
    rollup = (
        events.groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("bucket_epoch"),
        )
        .agg(F.sum(value_col).alias("metric"))
    )
    order = Window.partitionBy("grp").orderBy("bucket_epoch")
    trail = order.rowsBetween(-rolling_window, -1)
    cols = [
        F.col("grp").alias(group_col),
        "bucket_epoch",
        F.round("metric", 6).alias("metric"),
    ]
    for k in lag_list:
        cols.append(
            F.round(F.lag("metric", k).over(order), 6).alias(f"lag_{k}")
        )
    cols.append(
        F.round(F.avg("metric").over(trail), 6).alias("rolling_mean")
    )
    cols.append(
        F.count("metric").over(trail).cast("int").alias("rolling_n")
    )
    return rollup.select(*cols)


def autocorrelation(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    max_lag: int = 3,
) -> DataFrame:
    """Autocorrelation function per group over bucketed rollups:
    ``(group, n_buckets, acf_1 .. acf_max_lag)`` where ``acf_k`` is
    the sample Pearson correlation between the series and itself
    shifted k SERIES positions (gaps are not filled — the rollup's
    bucket order is the contract, as in ``lag_features``).  The quick
    seasonality / memory diagnostic a pipeline runs before choosing
    ``ewma_smooth`` vs ``seasonal_decompose``.  Groups too short (or
    constant over the overlap) yield NULL for that lag.

    One rollup hash aggregate, one per-group window building all the
    lag columns in a single pass, one |groups|-row aggregate of
    ``corr`` expressions.  Never touches raw events after the rollup.
    """
    if max_lag < 1:
        raise ValueError("autocorrelation: max_lag must be >= 1")
    rollup = (
        events.groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("bucket_epoch"),
        )
        .agg(F.sum(value_col).cast("double").alias("metric"))
    )
    order = Window.partitionBy("grp").orderBy("bucket_epoch")
    lagged = rollup.select(
        "grp",
        "metric",
        *[
            F.lag("metric", k).over(order).alias(f"_lag_{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    def _acf(k: int):
        # NOT F.corr: under ANSI mode its final division throws on a
        # zero-variance group instead of yielding NULL; the explicit
        # guarded ratio is the same Pearson value (the sample/population
        # normalization cancels) and returns NULL where undefined
        x, y = F.col("metric"), F.col(f"_lag_{k}")
        sx, sy = F.stddev_samp(
            F.when(y.isNotNull(), x)
        ), F.stddev_samp(F.when(x.isNotNull(), y))
        return F.round(
            F.when(
                (sx > 0) & (sy > 0), F.covar_samp(x, y) / (sx * sy)
            ),
            6,
        ).alias(f"acf_{k}")

    return lagged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        *[_acf(k) for k in range(1, max_lag + 1)],
    ).withColumnRenamed("grp", group_col)


def mann_kendall(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    max_group_rows: int | None = None,
) -> DataFrame:
    """Mann–Kendall trend test + Sen's slope per group:
    ``(group, n, s, var_s, z, trend, sen_slope)`` — the
    distribution-free "is this metric monotonically drifting?" test
    (no linearity assumption, unlike ``grouped_ols``; no bin choice,
    unlike ``psi_drift``).

    - ``s`` = Σ_{i<j} sign(v_j − v_i) over the time order;
    - ``var_s`` = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18 (tie-
      corrected);
    - ``z`` = (s∓1)/√var_s (continuity-corrected; NULL when var_s = 0
      — constant series or n < 2);
    - ``trend`` ∈ {increasing, decreasing, no_trend} at |z| > 1.96;
    - ``sen_slope`` = median over pairs of (v_j − v_i)/(t_j − t_i),
      the robust rate estimate (NULL when no pairs).

    INPUT CONTRACT: ``df`` is a per-group time SERIES — one row per
    (group, time), the shape every rollup here produces
    (``_bucket_epoch`` family).  Each group is collapsed to ONE
    sorted ``(t, v)`` array by a single hash aggregate; S, the tie
    correction and the Sen pair slopes are then computed
    EXCHANGE-LOCALLY with array lambdas — no within-group pair
    self-join, no second shuffle, no join at all (r12 verdict: the
    old plan shuffled Σn_g² pair rows through a SortMergeJoin and
    three aggregates).  Compute is still O(n_g²) per group — the
    same arithmetic the pair join did, minus the shuffle — and
    follows the group histogram, never the corpus.  Duplicate
    timestamps within a group are excluded from pairs (the strict
    ``<``) — roll up first.  NULL values drop out.

    MEMORY BOUND: the Sen pair-slope array holds ~n_g²/2 doubles per
    group (exactly what the old exact-``percentile`` buffer held) — a
    10k-row series is ~50M doubles (~400 MB), past any executor's
    comfort.  The guard is ON BY DEFAULT: groups longer than
    ``max_group_rows`` (default 10_000) fail loudly from inside the
    task (``raise_error`` naming the group — zero extra driver jobs)
    instead of OOMing.  Passing ``max_group_rows`` explicitly ALSO
    runs the eager driver-side pre-check that raises ``ValueError``
    with the longest offending group before any heavy work starts.
    """
    cap = int(max_group_rows) if max_group_rows is not None else 10_000
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(time_col).cast("double").alias("t"),
        F.col(value_col).cast("double").alias("v"),
    ).filter(F.col("v").isNotNull() & F.col("t").isNotNull())
    if max_group_rows is not None:
        over = (
            base.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > int(max_group_rows))
            .orderBy(F.desc("_n"))
            .limit(1)
            .collect()
        )
        if over:
            raise ValueError(
                f"mann_kendall: group {over[0]['grp']!r} has "
                f"{over[0]['_n']} rows (> max_group_rows="
                f"{max_group_rows}); sen_slope's exact pair-slope "
                "median buffers ~n^2/2 deltas per group — re-bucket "
                "or thin the series, or raise max_group_rows "
                "deliberately"
            )
    # ONE exchange: group -> sorted (t, v) array (+ n off the same agg)
    g = base.groupBy("grp").agg(
        F.sort_array(F.collect_list(F.struct("t", "v"))).alias("_a"),
        F.count(F.lit(1)).alias("n"),
    )

    arr = F.col("_a")
    nn = F.size(arr)

    def _el(j):
        # j is a 0-based index Column; element_at is 1-based
        return F.element_at(arr, j + F.lit(1))

    # in-task refusal: the Sen delta array is the memory hazard; fail
    # loudly (naming the group) before building it for an over-cap
    # group.  CaseWhen branches evaluate lazily, so compliant rows
    # never touch the raise_error.
    cap_err = F.raise_error(
        F.concat(
            F.lit("mann_kendall: group "),
            F.col("grp").cast("string"),
            F.lit(" has "),
            nn.cast("string"),
            F.lit(
                f" rows (> max_group_rows={cap}); sen_slope buffers "
                "~n^2/2 pair deltas per group — re-bucket or thin "
                "the series, or raise max_group_rows deliberately"
            ),
        )
    )

    zero_l = F.lit(0).cast("long")
    # S = sum over j of sum over i<j (t_i < t_j strictly) of
    # sign(v_j - v_i) — the array is t-sorted, so i<j implies
    # t_i <= t_j and only equal-timestamp pairs need excluding
    s_expr = F.when(nn < 2, zero_l).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), nn - 1),
            zero_l,
            lambda acc, j: acc
            + F.aggregate(
                F.sequence(F.lit(0), j - 1),
                zero_l,
                lambda acc2, i: acc2
                + F.when(
                    _el(i)["t"] < _el(j)["t"],
                    F.when(_el(j)["v"] > _el(i)["v"], 1)
                    .when(_el(j)["v"] < _el(i)["v"], -1)
                    .otherwise(0),
                )
                .otherwise(0)
                .cast("long"),
            ),
        )
    )
    # tie correction sum_t t(t-1)(2t+5): run-length over the sorted
    # values (one O(n) fold — same grouping-by-value the old
    # groupBy(grp, v) aggregate did, without its two extra exchanges)
    vs = F.array_sort(F.transform(arr, lambda x: x["v"]))

    def _tie_term(c):
        return c * (c - 1) * (2 * c + 5)

    tie_expr = F.when(nn < 2, zero_l).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), nn - 1),
            F.struct(
                F.lit(1).cast("long").alias("run"),
                zero_l.alias("tot"),
            ),
            lambda acc, j: F.struct(
                F.when(
                    F.element_at(F.col("_vs"), j + 1)
                    == F.element_at(F.col("_vs"), j),
                    acc["run"] + 1,
                )
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.when(
                    F.element_at(F.col("_vs"), j + 1)
                    == F.element_at(F.col("_vs"), j),
                    acc["tot"],
                )
                .otherwise(acc["tot"] + _tie_term(acc["run"]))
                .alias("tot"),
            ),
            lambda acc: acc["tot"] + _tie_term(acc["run"]),
        )
    )
    # Sen pair slopes, exchange-local; sorted once for the exact
    # median (identical linear interpolation to SQL percentile(x, .5))
    deltas = F.when(nn > cap, cap_err.cast("array<double>")).when(
        nn < 2, F.array().cast("array<double>")
    ).otherwise(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), nn - 1),
                lambda j: F.transform(
                    F.filter(
                        F.sequence(F.lit(0), j - 1),
                        lambda i: _el(i)["t"] < _el(j)["t"],
                    ),
                    lambda i: (_el(j)["v"] - _el(i)["v"])
                    / (_el(j)["t"] - _el(i)["t"]),
                ),
            )
        )
    )
    g = g.select("grp", "n", "_a", vs.alias("_vs")).select(
        "grp",
        "n",
        s_expr.alias("s"),
        tie_expr.alias("_tie"),
        F.array_sort(deltas).alias("_ds"),
    )
    m = F.size("_ds")
    md = (m.cast("double") - F.lit(1.0)) * F.lit(0.5)
    lo = F.floor(md).cast("int")
    hi = F.ceil(md).cast("int")
    sen = F.when(m == 0, F.lit(None).cast("double")).otherwise(
        F.element_at("_ds", lo + 1)
        + (md - lo)
        * (F.element_at("_ds", hi + 1) - F.element_at("_ds", lo + 1))
    )
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("_tie").cast("double")
    ) / F.lit(18.0)
    out = (
        g.withColumn("_sen", sen)
        .withColumn("var_s", var_s)
        .withColumn("s", F.coalesce(F.col("s"), F.lit(0)))
    )
    sq = F.sqrt(F.col("var_s"))
    z = F.when(
        (F.col("var_s") > 0) & (F.col("s") > 0),
        (F.col("s") - 1).cast("double") / sq,
    ).when(
        (F.col("var_s") > 0) & (F.col("s") < 0),
        (F.col("s") + 1).cast("double") / sq,
    ).when(F.col("var_s") > 0, F.lit(0.0))
    out = out.withColumn("z", z)
    trend = (
        F.when(F.col("z").isNull(), F.lit("no_trend"))
        .when(F.col("z") > 1.96, F.lit("increasing"))
        .when(F.col("z") < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
    )
    return out.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("long").alias("n"),
        "s",
        F.round("var_s", 6).alias("var_s"),
        F.round("z", 6).alias("z"),
        trend.alias("trend"),
        F.round("_sen", 6).alias("sen_slope"),
    )


def gap_fill(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    step: int,
    method: str = "locf",
) -> DataFrame:
    """Regularize a per-group time series onto a dense ``step`` grid:
    one row per bucket from each group's min to max time, observed
    values passed through, holes filled — ``(group, time, value,
    is_filled)``.  Every rollup consumer here (``ewma_smooth``,
    ``autocorrelation``, ``seasonal_decompose``, ``lag_features``)
    treats ROW ORDER as the series; gap_fill is the missing first
    step that makes that contract honest when buckets are sparse.

    ``method``:
    - ``locf``  — last observation carried forward (leading holes
      stay NULL: no value has been observed yet);
    - ``linear`` — interpolate between the previous and next observed
      points (time-weighted); holes before the first / after the last
      observation stay NULL (no extrapolation);
    - ``zero``  — absent means zero (count-like series).

    Plan: one per-group (min, max) hash aggregate, one ``sequence``
    explode building the grid arithmetically (row count = span/step,
    never a driver loop), a left join of observations onto the grid
    (hash on the group — reuses the aggregate's partitioning), and
    for locf/linear two ignore-nulls window passes per direction —
    all hash-partitioned by group, never global.  Input times are
    snapped DOWN to the ABSOLUTE grid (``floor(t/step)*step`` — epoch
    multiples of ``step``, not anchored at the group min, so bucket
    edges agree across groups and across incremental runs); duplicate
    rows landing on one bucket fail loud rather than silently
    averaging (use a rollup upstream).
    """
    if method not in ("locf", "linear", "zero"):
        raise ValueError(
            f"gap_fill: unknown method {method!r} "
            "(expected locf | linear | zero)"
        )
    if step < 1:
        raise ValueError("gap_fill: step must be >= 1")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(time_col).cast("long").alias("t"),
        F.col(value_col).cast("double").alias("v"),
    ).filter(F.col("t").isNotNull())
    # integral floor snap: t - pmod(t, step) stays exact for epoch-ns
    # magnitudes (~1e18 exceeds double's 2^53 exact range, so float
    # division could misplace a boundary timestamp) AND floors toward
    # -inf for pre-1970 timestamps — the same grid ohlc_bars/twap use
    snapped = base.withColumn(
        "t",
        (F.col("t") - F.pmod(F.col("t"), F.lit(int(step)))).cast("long"),
    )
    # loud duplicate-bucket guard, evaluated in-plan (no extra job):
    # raise_error fires only on offending rows
    per_bucket = snapped.groupBy("grp", "t").agg(
        F.count(F.lit(1)).alias("_c"), F.max("v").alias("v")
    )
    guarded = per_bucket.withColumn(
        "v",
        F.when(
            F.col("_c") > 1,
            F.raise_error(
                F.concat(
                    F.lit("gap_fill: multiple rows in one bucket for "
                          "group "),
                    F.col("grp").cast("string"),
                    F.lit(" at t="),
                    F.col("t").cast("string"),
                    F.lit(" — roll up first"),
                )
            ).cast("double"),
        ).otherwise(F.col("v")),
    ).drop("_c")
    bounds = guarded.groupBy("grp").agg(
        F.min("t").alias("_lo"), F.max("t").alias("_hi")
    )
    grid = bounds.select(
        "grp",
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.lit(int(step))
            )
        ).alias("t"),
    )
    joined = grid.join(guarded, ["grp", "t"], "left").withColumn(
        "is_filled", F.col("v").isNull()
    )
    if method == "zero":
        filled = joined.withColumn(
            "value", F.coalesce(F.col("v"), F.lit(0.0))
        )
    else:
        prev_w = (
            Window.partitionBy("grp")
            .orderBy("t")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pv = F.last("v", ignorenulls=True).over(prev_w)
        if method == "locf":
            filled = joined.withColumn("value", pv)
        else:  # linear
            pt = F.last(
                F.when(F.col("v").isNotNull(), F.col("t")),
                ignorenulls=True,
            ).over(prev_w)
            next_w = (
                Window.partitionBy("grp")
                .orderBy("t")
                .rowsBetween(0, Window.unboundedFollowing)
            )
            nv = F.first("v", ignorenulls=True).over(next_w)
            nt = F.first(
                F.when(F.col("v").isNotNull(), F.col("t")),
                ignorenulls=True,
            ).over(next_w)
            interp = F.when(F.col("v").isNotNull(), F.col("v")).when(
                pv.isNotNull() & nv.isNotNull(),
                pv
                + (nv - pv)
                * (F.col("t") - pt).cast("double")
                / (nt - pt).cast("double"),
            )
            filled = joined.withColumn("value", interp)
    return filled.select(
        F.col("grp").alias(group_col),
        F.col("t").alias(time_col),
        F.round("value", 6).alias("value"),
        "is_filled",
    )


def ohlc_bars(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    step: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Downsample an observation stream into per-group OHLC bars:
    ``(group, bucket_start, open, high, low, close, n)`` — the standard
    "compress ticks to bars" rollup (finance candles, metric
    downsampling, training-telemetry compaction).

    ``open``/``close`` are the first/last values under the total order
    (time, tiebreak) — the tiebreak (default: the value itself) makes
    bars deterministic when several observations share a timestamp.
    Buckets snap to the ABSOLUTE grid (``floor(t/step)*step``), the
    ``gap_fill`` convention, so bar edges agree across groups and
    incremental runs.  NULL values drop out (an empty bucket simply
    does not emit a bar).

    Plan: ONE hash aggregate — open/close are ``min/max(struct(t,
    tiebreak, v))`` argmin/argmax folds (partial-aggregating, never a
    window sort), high/low/n plain min/max/count; the only exchange
    carries one row per (group, bucket).  At 100 TB this is the
    map-side-combine ideal: reduction factor = bucket width.
    """
    tb = F.col(tiebreak_col) if tiebreak_col else F.col(value_col)
    v = F.col(value_col).cast("double")
    # integral floor snap: epoch-ns values (~1e18) exceed double's
    # 2^53 exact range, so float division could misplace a boundary
    # timestamp by one bucket (the cohort_retention rule); pmod (not
    # `div`, which truncates toward zero) keeps floor semantics for
    # pre-1970 timestamps, matching the `//` floor-division oracle
    base = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.expr(
            f"CAST({time_col} AS BIGINT)"
            f" - pmod(CAST({time_col} AS BIGINT), {int(step)})"
        )
        .cast("long")
        .alias("bucket_start"),
        F.col(time_col).cast("long").alias("_t"),
        tb.alias("_tb"),
        v.alias("_v"),
    )
    pick = F.struct(F.col("_t"), F.col("_tb"), F.col("_v"))
    return (
        base.groupBy("grp", "bucket_start")
        .agg(
            F.min(pick).alias("_first"),
            F.max(pick).alias("_last"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("grp").alias(group_col),
            "bucket_start",
            F.col("_first._v").alias("open"),
            "high",
            "low",
            F.col("_last._v").alias("close"),
            "n",
        )
    )


def twap(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    step: int,
) -> DataFrame:
    """Time-weighted average value per (group, bucket):
    ``(group, bucket_start, twap, n)`` — each observation holds until
    the NEXT observation in its group (or the bucket's right edge for
    the last one), and the average weights values by that holding
    time.  The honest summary for irregularly-sampled state (a price,
    a gauge, a config flag): a plain ``avg`` over-counts bursts of
    rapid updates; TWAP is burst-invariant.

    Weights come from ONE ``lead(t)`` window per group (hash-
    partitioned by group, ordered by time with the value as a
    deterministic tiebreak for duplicate timestamps; a duplicate
    contributes 0 weight and drops out).  Observations never span
    buckets: the holding interval is clipped at the bucket edge
    (values before a bucket's first observation contribute nothing —
    carry state in upstream with ``gap_fill``'s locf if you need
    cross-bucket holds).  A bucket whose observations all have zero
    holding time (all at the right edge) yields NULL.

    Plan: one window (group-partitioned — never the global-sort trap)
    + one hash aggregate; exchange reuse between the two (same key).
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(time_col).cast("long").alias("_t"),
        v.alias("_v"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("_t").asc(), F.col("_v").asc())
    stepped = (
        base.withColumn("_tn", F.lead("_t").over(w))
        .withColumn(
            # integral floor snap (epoch-ns exceeds double's exact
            # range; pmod keeps floor semantics for negative t)
            "bucket_start",
            (F.col("_t") - F.pmod(F.col("_t"), F.lit(int(step)))).cast(
                "long"
            ),
        )
        .withColumn("_edge", F.col("bucket_start") + F.lit(step))
        .withColumn(
            "_hold",
            F.least(F.coalesce(F.col("_tn"), F.col("_edge")), F.col("_edge"))
            - F.col("_t"),
        )
    )
    num = F.sum(F.col("_v") * F.col("_hold").cast("double"))
    den = F.sum(F.col("_hold").cast("double"))
    return (
        stepped.groupBy("grp", "bucket_start")
        .agg(
            F.when(den > 0, num / den).alias("twap"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.col("grp").alias(group_col),
            "bucket_start",
            F.round("twap", 6).alias("twap"),
            "n",
        )
    )


def seasonal_naive_backtest(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    season_lag: int,
) -> DataFrame:
    """One-step seasonal-naive forecast backtest per group:
    ``(group, n_scored, mape, smape, bias)`` — forecast(t) =
    value(t − season_lag), scored over every bucket whose seasonal
    ancestor exists.  The canonical forecasting BASELINE: any model
    that cannot beat this number is noise, so the pipeline publishes
    it next to every "real" forecast.

    INPUT CONTRACT: one row per (group, time) on a regular grid
    (``gap_fill`` first if sparse).  ``season_lag`` is in ROWS of that
    grid (24 for daily seasonality on hourly buckets).  Buckets with
    zero actuals are excluded from MAPE (undefined) but kept in sMAPE
    and bias; groups with no scoreable rows emit NULL metrics.

    Plan: one ``lag(value, season_lag)`` window per group + one hash
    aggregate — group-partitioned, no global sort, no self-join.
    """
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.col(time_col).cast("long").alias("_t"),
        v.alias("_v"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("_t").asc())
    scored = base.withColumn(
        "_f", F.lag("_v", season_lag).over(w)
    ).filter(F.col("_f").isNotNull())
    err = F.col("_v") - F.col("_f")
    ape = F.when(
        F.col("_v") != 0, F.abs(err) / F.abs(F.col("_v"))
    )
    sden = F.abs(F.col("_v")) + F.abs(F.col("_f"))
    sape = F.when(sden > 0, F.lit(2.0) * F.abs(err) / sden).otherwise(
        F.lit(0.0)
    )
    return (
        scored.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.round(F.avg(ape), 6).alias("mape"),
            F.round(F.avg(sape), 6).alias("smape"),
            F.round(F.avg(err), 6).alias("bias"),
        )
        .select(
            F.col("grp").alias(group_col), "n_scored", "mape", "smape",
            "bias",
        )
    )


def holt_linear(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 1,
    max_group_rows: int = 1_000_000,
) -> DataFrame:
    """Holt double-exponential (level + trend) smoothing per group:
    ``(group, time, value, level, trend, forecast)`` with

        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        forecast = l_t + horizon·b_t   (the h-step-ahead projection)

    initialized l_1 = x_1, b_1 = x_2 − x_1 (b_1 = 0 on a 1-point
    series) — the dashboard forecaster one notch above EWMA (which
    lags any trending series by construction).

    Design note: like ``ewma_smooth``/``cusum_changepoints`` this is a
    RECURSIVE scan — no window or array HOF yields a per-element
    running fold — so it is a legitimate pandas kernel
    (``applyInPandas`` per group).  INPUT CONTRACT: the rollup shape,
    one row per (group, time); the kernel runs over |group| rows, never
    raw events.  All recursion in float64, identical in any engine.

    MEMORY BOUND: the kernel materializes each group as Python lists
    — a pathological million-row group is an executor stall, not a
    slowdown.  ``max_group_rows`` (the ``mann_kendall`` guard) fails
    loudly IN-KERNEL (no extra pre-pass job) naming the offending
    group; re-bucket the series or raise it deliberately.
    """
    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0):
        raise ValueError("holt_linear: need 0 < alpha <= 1, 0 <= beta <= 1")
    import pandas as _pd  # noqa: F401

    a, b_, h = float(alpha), float(beta), int(horizon)
    cap = int(max_group_rows)

    base = df.select(
        F.col(group_col).cast("string").alias("grp"),
        F.col(time_col).cast("long").alias("t"),
        F.col(value_col).cast("double").alias("value"),
    ).filter(F.col("value").isNotNull())

    def kernel(pdf):
        if len(pdf) > cap:
            raise ValueError(
                f"holt_linear: group {pdf['grp'].iloc[0]!r} has "
                f"{len(pdf)} rows (> max_group_rows={cap}); the "
                "recursive kernel buffers the whole series per group "
                "— feed a rollup (one row per group, time bucket) or "
                "raise max_group_rows deliberately"
            )
        pdf = pdf.sort_values("t").reset_index(drop=True)
        xs = pdf["value"].tolist()
        lvl = xs[0]
        trd = (xs[1] - xs[0]) if len(xs) > 1 else 0.0
        levels, trends = [], []
        for i, x in enumerate(xs):
            if i == 0:
                pass  # l_1 = x_1, b_1 as initialized
            else:
                prev_l = lvl
                lvl = a * x + (1.0 - a) * (lvl + trd)
                trd = b_ * (lvl - prev_l) + (1.0 - b_) * trd
            levels.append(lvl)
            trends.append(trd)
        pdf["level"] = [round(v, 6) for v in levels]
        pdf["trend"] = [round(v, 6) for v in trends]
        pdf["forecast"] = [
            round(lv + h * tr, 6) for lv, tr in zip(levels, trends)
        ]
        pdf["value"] = pdf["value"].round(6)
        return pdf

    schema = (
        "grp string, t long, value double, level double, trend double,"
        " forecast double"
    )
    out = base.groupBy("grp").applyInPandas(kernel, schema)
    return out.select(
        F.col("grp").alias(group_col),
        F.col("t").alias(time_col),
        F.col("value").alias(value_col),
        "level",
        "trend",
        "forecast",
    )


def rolling_features(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    window: int = 24,
) -> DataFrame:
    """Trailing-window feature block per observation: ``(group, time,
    value, roll_mean, roll_std, roll_min, roll_max, roll_n)`` over the
    last ``window`` ROWS (inclusive of the current one) within each
    group's time order — the standard ML feature-engineering rollup
    (lag features give points, this gives local context).

    INPUT CONTRACT: one row per (group, time) — the rollup shape
    (``_bucket_epoch`` family); duplicate timestamps make the order
    non-total and the features partition-lottery.

    Plan: ONE group-partitioned bounded ROWS window carrying (Σx, Σx²,
    min, max, n) — hash-partitioned by group, never global; std is the
    population form from the two sums, floored at 0 before the sqrt
    (float cancellation can go epsilon-negative on near-constant
    windows, and NaN poisons downstream folds).
    """
    v = F.col(value_col).cast("double")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(time_col).cast("long").alias("t"),
        v.alias("value"),
    ).filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("t").asc())
        .rowsBetween(-(int(window) - 1), 0)
    )
    n = F.count(F.lit(1)).over(w).cast("double")
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    mean = s1 / n
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    return base.select(
        F.col("grp").alias(group_col),
        F.col("t").alias(time_col),
        F.col("value").alias(value_col),
        F.round(mean, 6).alias("roll_mean"),
        F.round(F.sqrt(var), 6).alias("roll_std"),
        F.round(F.min("value").over(w), 6).alias("roll_min"),
        F.round(F.max("value").over(w), 6).alias("roll_max"),
        n.cast("long").alias("roll_n"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row
    with ``right.ts >= left.ts`` on the same key (inclusive) — the
    mirror of ``asof_join``'s backward carry, for "what happened
    next" enrichment (next error after a click, next fill after an
    order).

    Same union-and-carry plan, reflected: right rows tag ``_side = 2``
    so at equal timestamps they sort AFTER the left row (still
    matching inclusively through the [current, following] frame), and
    the carried struct arrives via ``first(ignorenulls)`` over an
    unbounded-FOLLOWING window — one shuffle on the key, no range
    explosion.  Duplicate right timestamps resolve to the SMALLEST
    carried struct (earliest match wins, field-wise) — deterministic
    under any partition layout.
    """
    lcols = left.columns
    out_carried = [f"{c}{suffix}" for c in right_value_cols] + [
        f"{ts}{suffix}"
    ]
    r_struct = F.struct(
        F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key), F.col(ts), F.lit(2).alias("_side"), r_struct.alias("_r")
    )
    r_type = r_tagged.schema["_r"].dataType
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    for c in lcols:
        if c not in (key, ts):
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left.schema[c].dataType)
            )
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(ts).asc(),
            F.col("_side").asc(),
            F.col("_r").asc_nulls_last(),
        )
        .rowsBetween(0, Window.unboundedFollowing)
    )
    matched = unioned.withColumn(
        "_r", F.first("_r", ignorenulls=True).over(w)
    )
    return matched.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_r.{c}").alias(c) for c in out_carried],
    )


def state_durations(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gaps-and-islands run collapse: consecutive equal states per
    entity fold into one run — ``(entity, state, run_start, run_end,
    n_events, duration)`` with ``duration = run_end − run_start`` in
    ``ts_col`` units (0 for single-event runs; the next run's start
    is NOT borrowed — no lookahead semantics to argue about).  The
    state-log workhorse: device up/down spans, user mode dwell times,
    alert storm collapsing.

    The island id is the classic two-window identity — row_number
    over the entity minus row_number over (entity, state) is constant
    exactly within a run — then one (entity, state, island) rollup.
    Both windows and the rollup hash-partition by entity: two window
    passes over one exchange, never global.  Ordering ties break by
    ``tiebreak_col`` (pass an id when timestamps can repeat).
    """
    tb = F.col(tiebreak_col) if tiebreak_col else F.col(state_col)
    base = events.select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col).alias("_ts"),
        tb.alias("_tb"),
        F.col(state_col).alias("state"),
    )
    we = Window.partitionBy("entity").orderBy(
        F.col("_ts").asc(), F.col("_tb").asc()
    )
    ws = Window.partitionBy("entity", "state").orderBy(
        F.col("_ts").asc(), F.col("_tb").asc()
    )
    island = F.row_number().over(we) - F.row_number().over(ws)
    return (
        base.withColumn("_isl", island)
        .groupBy("entity", "state", "_isl")
        .agg(
            F.min("_ts").alias("run_start"),
            F.max("_ts").alias("run_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "entity",
            "state",
            "run_start",
            "run_end",
            "n_events",
            (F.col("run_end") - F.col("run_start")).alias("duration"),
        )
    )


def local_peaks(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    neighborhood: int = 2,
    min_prominence: float = 0.0,
) -> DataFrame:
    """Local-maximum detection on (small-cardinality-keyed) series:
    ``(group, ts, value, prominence)`` — points strictly greater than
    every neighbor within ``neighborhood`` steps on both sides, with
    ``prominence = value − max(neighborhood)`` ≥ ``min_prominence``.
    The monitoring readout between "threshold alert" (misses relative
    spikes) and full changepoint analysis (overkill for "what spiked
    Tuesday"): traffic bursts, error storms, sale-day peaks.

    Interior points only — the first/last ``neighborhood`` points of
    each series can't certify a full window and are never reported
    (documented edge bias, standard for peak pickers).  Strict
    inequality means plateaus yield NO peak (two equal tops mask each
    other — flat-top detection needs run collapse first:
    ``state_durations``).

    One group-partitioned ordered window computing the two-sided
    neighbor max via ``rowsBetween`` — a single exchange on the group
    key; built for ROLLUP series (hourly counts per type), where the
    window partition is bucket-sized, not raw-data-sized.
    """
    if neighborhood < 1:
        raise ValueError("local_peaks: neighborhood must be >= 1")
    w = Window.partitionBy(group_col).orderBy(F.col(ts_col).asc())
    before = F.max(F.col(value_col)).over(
        w.rowsBetween(-neighborhood, -1)
    )
    after = F.max(F.col(value_col)).over(w.rowsBetween(1, neighborhood))
    n_before = F.count(F.lit(1)).over(w.rowsBetween(-neighborhood, -1))
    n_after = F.count(F.lit(1)).over(w.rowsBetween(1, neighborhood))
    v = F.col(value_col).cast("double")
    neigh = F.greatest(before, after).cast("double")
    prom = v - neigh
    return (
        df.withColumn("_nb", n_before)
        .withColumn("_na", n_after)
        .withColumn("_neigh", neigh)
        .withColumn("_prom", prom)
        .filter(
            (F.col("_nb") == neighborhood)
            & (F.col("_na") == neighborhood)
            & (v > F.col("_neigh"))
            & (F.col("_prom") >= min_prominence)
        )
        .select(
            F.col(group_col).alias("group"),
            F.col(ts_col).alias("ts"),
            v.alias("value"),
            F.round("_prom", 6).alias("prominence"),
        )
    )


def inter_event_gaps(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
    probs: list[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Inter-event gap distribution: ``(prob, gap)`` plus an
    ``n_gaps`` column — exact quantiles of the within-entity
    successor gaps (``ts_col`` units).  THE empirical input for
    choosing a sessionization timeout (the idle threshold should sit
    in the valley past the p90–p99 within-session gap mass) and for
    bot detection (machine-regular gap spectra).

    One entity-partitioned lag window produces the gaps (single hash
    exchange); the quantiles ride ``ranges.exact_quantiles``'
    bounded histogram passes — never a global sort or single-task
    percentile buffer.  Entities with one event contribute no gap.
    """
    from moz_datapipeline_spark.operators.ranges import exact_quantiles

    plist = sorted(set(float(p) for p in probs))
    if not plist or not all(0.0 <= p <= 1.0 for p in plist):
        raise ValueError("inter_event_gaps: probs must be in [0, 1]")
    tb = F.col(tiebreak_col) if tiebreak_col else F.col(ts_col)
    w = Window.partitionBy("_e").orderBy(
        F.col("_ts").asc(), F.col("_tb").asc()
    )
    gaps = (
        events.select(
            F.col(entity_col).alias("_e"),
            F.col(ts_col).alias("_ts"),
            tb.alias("_tb"),
        )
        .withColumn("_gap", F.col("_ts") - F.lag("_ts").over(w))
        .filter(F.col("_gap").isNotNull())
        .select(F.col("_gap").cast("double").alias("_gap"))
    )
    n_gaps = gaps.count()
    qs = exact_quantiles(gaps, "_gap", plist) if n_gaps else None
    spark = events.sparkSession
    rows = [
        (
            p,
            float(qs[i]) if qs is not None else None,
            n_gaps,
        )
        for i, p in enumerate(plist)
    ]
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    return literal_frame(spark, 
        rows,
        StructType(
            [
                StructField("prob", DoubleType()),
                StructField("gap", DoubleType()),
                StructField("n_gaps", LongType()),
            ]
        ),
    )


def periodogram(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str | None = None,
    bucket: str = "hour",
    max_harmonic: int = 12,
) -> DataFrame:
    """Discrete-Fourier periodogram per group over bucketed rollups:
    ``(grp, k, n_buckets, period_buckets, power)`` for harmonics
    ``k = 1..max_harmonic`` — the frequency-domain seasonality
    detector (``autocorrelation`` answers "is there memory at lag
    k?"; this answers "at WHICH period does the series cycle?").
    ``power = 2/N · (C_k² + S_k²)`` with ``C_k = Σ x_t·cos(2πkt/N)``,
    ``S_k = Σ x_t·sin(2πkt/N)`` over the regular bucket grid
    ``t = 0..N−1`` anchored at the group's first bucket; empty
    buckets are zero demand (they contribute nothing to the sums, so
    they never need materializing).  Mean removal is FREE and exact:
    for integer ``1 ≤ k < N`` the cos/sin sums over a complete grid
    vanish, so the DC term cancels analytically — no centering pass.
    Harmonics with ``k ≥ N`` are aliases and are dropped.

    Plan: one data-sized rollup hash aggregate; a |groups|-row
    min/max fold broadcast back; explode × max_harmonic and ONE
    (grp, k) hash aggregate over rollup×K rows — no windows, no
    sorts, fully parallel at any group count.
    """
    if max_harmonic < 1:
        raise ValueError("periodogram: max_harmonic must be >= 1")
    metric = (
        F.count(F.lit(1)).cast("double")
        if value_col is None
        else F.sum(F.col(value_col).cast("double"))
    )
    rollup = events.groupBy(
        F.col(group_col).alias("grp"),
        _bucket_epoch(events, ts_col, bucket).alias("_b"),
    ).agg(metric.alias("_x"))
    step = _BUCKET_NS[bucket] // 1_000_000_000
    span = rollup.groupBy("grp").agg(
        F.min("_b").alias("_b0"),
        (
            (F.max("_b") - F.min("_b")) / F.lit(step) + F.lit(1)
        )
        .cast("long")
        .alias("n_buckets"),
    )
    expanded = (
        rollup.join(F.broadcast(span), "grp")
        .withColumn(
            "_t", ((F.col("_b") - F.col("_b0")) / F.lit(step)).cast("long")
        )
        .withColumn(
            "k", F.explode(F.sequence(F.lit(1), F.lit(max_harmonic)))
        )
        .filter(F.col("k") < F.col("n_buckets"))
    )
    ang = (
        F.lit(2.0)
        * F.lit(math.pi)
        * F.col("k").cast("double")
        * F.col("_t").cast("double")
        / F.col("n_buckets").cast("double")
    )
    out = expanded.groupBy("grp", "k", "n_buckets").agg(
        F.sum(F.col("_x") * F.cos(ang)).alias("_c"),
        F.sum(F.col("_x") * F.sin(ang)).alias("_s"),
    )
    power = (
        F.lit(2.0)
        / F.col("n_buckets").cast("double")
        * (
            F.col("_c") * F.col("_c")
            + F.col("_s") * F.col("_s")
        )
    )
    return out.select(
        "grp",
        F.col("k").cast("int").alias("k"),
        "n_buckets",
        F.round(
            F.col("n_buckets").cast("double") / F.col("k").cast("double"),
            6,
        ).alias("period_buckets"),
        F.round(power, 6).alias("power"),
    )


def croston(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "user_id",
    value_col: str = "value",
    bucket: str = "day",
    alpha: float = 0.1,
) -> DataFrame:
    """Croston's method for INTERMITTENT demand: per group, simple
    exponential smoothing applied separately to the nonzero demand
    sizes and to the inter-demand intervals, forecast = size-SES /
    interval-SES — the standard spare-parts/sparse-SKU forecaster
    where ``holt_linear`` (which sees the zeros) collapses to noise.
    Returns ``(grp, n_periods, demand_smooth, interval_smooth,
    croston_forecast)`` per group; groups with fewer than 2 demand
    periods have no interval history → NULL interval/forecast,
    loudly, with ``demand_smooth`` still reported.

    SES is evaluated in CLOSED FORM, not recursively: with demands
    ``z_1..z_m`` (bucket-ordered), ``S_m = (1−α)^{m−1}·z_1 +
    Σ_{j≥2} α·(1−α)^{m−j}·z_j``; intervals ``q_j = t_j − t_{j−1}``
    (bucket steps, j ≥ 2) smooth the same way seeded with ``q_2``.
    Old terms underflow to 0 in double — deterministic and identical
    in the DuckDB replay.

    Plan: one data-sized (grp, bucket) rollup; per-group ORDER comes
    from a window partitioned BY GROUP over the rollup (bounded by
    the group's bucket count, never a global sort); one power-weight
    projection and one |groups|-row fold.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError("croston: alpha must be in (0, 1]")
    rollup = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("_b"),
        )
        .agg(F.sum(F.col(value_col).cast("double")).alias("_z"))
        .filter(F.col("_z") != 0)
    )
    step = _BUCKET_NS[bucket] // 1_000_000_000
    w = Window.partitionBy("grp").orderBy("_b")
    seq = rollup.select(
        "grp",
        "_z",
        F.row_number().over(w).alias("_j"),
        F.count(F.lit(1)).over(
            Window.partitionBy("grp").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_m"),
        ((F.col("_b") - F.lag("_b").over(w)) / F.lit(step))
        .cast("double")
        .alias("_q"),
    )
    a = F.lit(float(alpha))
    one_m_a = F.lit(1.0 - float(alpha))
    zw = F.when(
        F.col("_j") == 1, F.pow(one_m_a, F.col("_m") - 1)
    ).otherwise(a * F.pow(one_m_a, F.col("_m") - F.col("_j")))
    qw = F.when(F.col("_j") == 2, F.pow(one_m_a, F.col("_m") - 2)).when(
        F.col("_j") > 2, a * F.pow(one_m_a, F.col("_m") - F.col("_j"))
    )
    folded = seq.groupBy("grp").agg(
        F.max("_m").cast("long").alias("n_periods"),
        F.sum(zw * F.col("_z")).alias("_s"),
        F.sum(qw * F.col("_q")).alias("_i"),
    )
    ok = F.col("n_periods") >= 2
    return folded.select(
        "grp",
        "n_periods",
        F.round(F.col("_s"), 6).alias("demand_smooth"),
        F.when(ok, F.round(F.col("_i"), 6)).alias("interval_smooth"),
        F.when(
            ok & (F.col("_i") > 0),
            F.round(F.col("_s") / F.col("_i"), 6),
        ).alias("croston_forecast"),
    )


def pettitt_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Pettitt single-changepoint test per group over bucketed
    rollups: ``(grp, n_buckets, change_bucket, k_stat, p_value,
    significant)`` — the rank-based (distribution-free) "did the
    level shift, and WHEN?" detector; the nonparametric complement
    to ``cusum_changepoints`` (which assumes a known in-control
    mean/σ).  Uses the rank identity ``U_t = 2·Σ_{i≤t} r_i −
    t·(n+1)`` with tie-averaged ranks, ``K = max_t |U_t|`` attained
    at the changepoint, and the standard approximation ``p ≈ 2·exp(
    −6K²/(n³+n²))`` (capped at 1).  Ties in |U| break to the EARLIEST
    bucket — deterministic, replayed by the oracle.  Groups with
    n < 2 report NULL stats.

    Plan: one data-sized rollup; ranks and the U_t running sum are
    GROUP-PARTITIONED windows over the rollup (bounded by each
    group's bucket count — the ``autocorrelation`` contract, never a
    global sort); the argmax is a per-group rank-1 filter.
    """
    rollup = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("bucket_epoch"),
        )
        .agg(F.sum(F.col(value_col).cast("double")).alias("_x"))
    )
    gw = Window.partitionBy("grp")
    rnk = F.rank().over(gw.orderBy("_x"))
    ties = F.count(F.lit(1)).over(Window.partitionBy("grp", "_x"))
    ranked = rollup.select(
        "grp",
        "bucket_epoch",
        (
            rnk.cast("double")
            + (ties.cast("double") - F.lit(1.0)) / F.lit(2.0)
        ).alias("_r"),
        F.count(F.lit(1)).over(gw).cast("double").alias("_n"),
    )
    tw = gw.orderBy("bucket_epoch").rowsBetween(
        Window.unboundedPreceding, 0
    )
    u = ranked.select(
        "grp",
        "bucket_epoch",
        "_n",
        (
            F.lit(2.0) * F.sum("_r").over(tw)
            - F.row_number().over(gw.orderBy("bucket_epoch")).cast(
                "double"
            )
            * (F.col("_n") + F.lit(1.0))
        ).alias("_u"),
    )
    pick = Window.partitionBy("grp").orderBy(
        F.abs(F.col("_u")).desc(), F.col("bucket_epoch").asc()
    )
    best = (
        u.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    n = F.col("_n")
    k = F.abs(F.col("_u"))
    ok = n >= 2
    p = F.when(
        ok,
        F.least(
            F.lit(1.0),
            F.lit(2.0)
            * F.exp(
                F.lit(-6.0) * k * k / (n * n * n + n * n)
            ),
        ),
    )
    return best.select(
        "grp",
        n.cast("long").alias("n_buckets"),
        F.when(ok, F.col("bucket_epoch")).alias("change_bucket"),
        F.when(ok, F.round(k, 6)).alias("k_stat"),
        F.round(p, 6).alias("p_value"),
        F.when(p.isNotNull(), p < F.lit(0.05)).alias("significant"),
    )


def hurst_exponent(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    scales: Sequence[int] = (8, 16, 32, 64),
) -> DataFrame:
    """Hurst exponent per group by rescaled-range (R/S) analysis
    over bucketed rollups: ``(grp, n_points, n_scales, hurst)`` —
    H ≈ 0.5 for a memoryless series, H > 0.5 for trending
    (persistent) series, H < 0.5 for mean-reverting ones; the
    long-memory diagnostic that ``autocorrelation`` (fixed small
    lags) and ``periodogram`` (pure cycles) both miss.

    For each scale s: split the group's series (bucket order) into
    complete s-sized blocks; per block compute the range of the
    cumulative mean-deviation series divided by the population σ;
    average R/S over blocks; then H is the d=1 least-squares slope
    of ln(R/S) on ln(s) (the ``ols_fit`` closed form, inlined).
    Zero-σ blocks are skipped; groups with fewer than 2 usable
    scales report NULL hurst.

    Plan: rollup → per-group row_number (group-bounded window) →
    explode scales → block windows keyed (grp, scale, block) —
    every window ≤ max(scales) rows by construction; the log-log
    fit is a |groups|-row fold.  Running block sums accumulate in
    bucket order, so float results replay bit-stably.
    """
    scales = [int(s) for s in scales]
    if len(scales) < 2 or any(s < 2 for s in scales):
        raise ValueError("hurst_exponent: need >= 2 scales, each >= 2")
    rollup = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("_b"),
        )
        .agg(F.sum(F.col(value_col).cast("double")).alias("_x"))
    )
    gw = Window.partitionBy("grp").orderBy("_b")
    seq = rollup.select(
        "grp",
        "_x",
        "_b",
        (F.row_number().over(gw) - 1).alias("_j"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("grp").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("_np"),
    )
    expl = seq.withColumn(
        "_s",
        F.explode(
            F.array(*[F.lit(s) for s in scales])
        ),
    ).withColumn("_blk", F.floor(F.col("_j") / F.col("_s")))
    # keep complete blocks only: block holds exactly s rows
    bw = Window.partitionBy("grp", "_s", "_blk")
    full = expl.withColumn("_bn", F.count(F.lit(1)).over(bw)).filter(
        F.col("_bn") == F.col("_s")
    )
    mean = F.avg("_x").over(bw)
    var = F.avg(F.col("_x") * F.col("_x")).over(bw) - mean * mean
    run = bw.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    idx_in_blk = F.row_number().over(bw.orderBy("_b")).cast("double")
    cumdev = F.sum("_x").over(run) - idx_in_blk * mean
    marked = full.select(
        "grp",
        "_s",
        "_blk",
        "_np",
        cumdev.alias("_cd"),
        var.alias("_var"),
    )
    per_blk = marked.groupBy("grp", "_s", "_blk", "_np").agg(
        (F.max("_cd") - F.min("_cd")).alias("_rng"),
        F.first("_var").alias("_v"),
    )
    rs = (
        per_blk.filter(F.col("_v") > 0)
        .select(
            "grp",
            "_s",
            "_np",
            (F.col("_rng") / F.sqrt(F.col("_v"))).alias("_rs"),
        )
        .groupBy("grp", "_s", "_np")
        .agg(F.avg("_rs").alias("_ars"))
        .filter(F.col("_ars") > 0)
    )
    pts = rs.select(
        "grp",
        "_np",
        F.log(F.col("_s").cast("double")).alias("_lx"),
        F.log("_ars").alias("_ly"),
    )
    mom = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("_k"),
        F.sum("_lx").alias("_sx"),
        F.sum("_ly").alias("_sy"),
        F.sum(F.col("_lx") * F.col("_lx")).alias("_sxx"),
        F.sum(F.col("_lx") * F.col("_ly")).alias("_sxy"),
    )
    # groups whose every block was zero-variance vanish from `pts`;
    # report them with n_scales = 0 / NULL hurst instead of dropping
    universe = rollup.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_points")
    )
    mom = universe.join(mom, "grp", "left")
    det = F.col("_k") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    slope = F.when(
        (F.col("_k") >= 2) & (F.abs(det) > 1e-12),
        (F.col("_k") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        / det,
    )
    return mom.select(
        "grp",
        "n_points",
        F.coalesce(F.col("_k"), F.lit(0.0))
        .cast("long")
        .alias("n_scales"),
        F.round(slope, 6).alias("hurst"),
    )


def runs_test(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Wald–Wolfowitz runs test per group over bucketed rollups:
    ``(grp, n_buckets, n_above, n_below, n_runs, z, p_value,
    significant)`` — "is the series RANDOM around its level, or does
    it cluster/alternate?"; too few runs = regime clustering (the
    ``hurst_exponent`` > 0.5 story), too many = over-alternation.
    The series is dichotomized against the group MEAN (strictly
    above vs not — ties side with "below", documented); a run is a
    maximal same-side stretch; ``z = (R − μ)/σ`` with
    ``μ = 2·n₁·n₂/n + 1``, ``σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1))``,
    two-sided p via the A&S erfc polynomial.  One-sided groups
    (never crossing their mean — includes constants) have σ = 0 →
    NULL stats, loudly.

    Plan: one data-sized rollup; the mean, the lag, and the run
    count are group-partitioned rollup windows (bounded by bucket
    cardinality); |groups|-row arithmetic after.
    """
    rollup = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("_b"),
        )
        .agg(F.sum(F.col(value_col).cast("double")).alias("_x"))
    )
    gw = Window.partitionBy("grp")
    above = (
        F.col("_x")
        > F.avg("_x").over(
            gw.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
    ).cast("int")
    ow = gw.orderBy("_b")
    marked = rollup.select(
        "grp",
        "_b",
        above.alias("_a"),
    ).select(
        "grp",
        "_a",
        F.when(
            F.lag("_a").over(ow).isNull()
            | (F.col("_a") != F.lag("_a").over(ow)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_new_run"),
    )
    folded = marked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("_a").cast("long").alias("n_above"),
        (F.count(F.lit(1)) - F.sum("_a")).cast("long").alias("n_below"),
        F.sum("_new_run").cast("long").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    n = n1 + n2
    two = F.lit(2.0) * n1 * n2
    mu = two / n + F.lit(1.0)
    var = (
        two
        * (two - n)
        / (n * n * (n - F.lit(1.0)))
    )
    ok = (n1 > 0) & (n2 > 0) & (n > 1) & (var > 0)
    z = F.when(ok, (F.col("n_runs").cast("double") - mu) / F.sqrt(var))
    az = F.abs(z) / F.sqrt(F.lit(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * az)
    poly = (
        F.lit(0.254829592) * t
        - F.lit(0.284496736) * (t**2)
        + F.lit(1.421413741) * (t**3)
        - F.lit(1.453152027) * (t**4)
        + F.lit(1.061405429) * (t**5)
    )
    p = F.when(z.isNotNull(), poly * F.exp(-az * az))
    return folded.select(
        "grp",
        "n_buckets",
        "n_above",
        "n_below",
        "n_runs",
        F.round(z, 6).alias("z"),
        F.round(p, 6).alias("p_value"),
        F.when(p.isNotNull(), p < F.lit(0.05)).alias("significant"),
    )


def decomposition_strength(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    period: int = 24,
    trend_window: int = 12,
) -> DataFrame:
    """Trend/seasonal strength per group, read off the
    ``seasonal_decompose`` components (Hyndman's FPP3 measures):
    ``(grp, n_buckets, trend_strength, seasonal_strength)`` with
    ``F_T = max(0, 1 − Var(resid)/Var(trend + resid))`` and
    ``F_S = max(0, 1 − Var(resid)/Var(seasonal + resid))`` — the
    one-number "how much of this series is structure vs noise?"
    readouts that decide whether ``holt_linear`` (trend) or a
    seasonal model is worth fitting.  Population variance; a
    zero-variance denominator yields NULL for that strength.

    Plan: the decomposition's rollup-sized output feeds ONE
    |groups|-row moment aggregate — no second data scan.
    """
    dec = seasonal_decompose(
        events,
        ts_col=ts_col,
        group_col=group_col,
        value_col=value_col,
        bucket=bucket,
        period=period,
        trend_window=trend_window,
    )
    r = F.col("residual")
    tr = F.col("trend") + r
    se = F.col("seasonal") + r
    mom = dec.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        (F.avg(r * r) - F.avg(r) * F.avg(r)).alias("_vr"),
        (F.avg(tr * tr) - F.avg(tr) * F.avg(tr)).alias("_vt"),
        (F.avg(se * se) - F.avg(se) * F.avg(se)).alias("_vs"),
    )
    ft = F.when(
        F.col("_vt") > 0,
        F.greatest(
            F.lit(0.0), F.lit(1.0) - F.col("_vr") / F.col("_vt")
        ),
    )
    fs = F.when(
        F.col("_vs") > 0,
        F.greatest(
            F.lit(0.0), F.lit(1.0) - F.col("_vr") / F.col("_vs")
        ),
    )
    return mom.select(
        "grp",
        "n_buckets",
        F.round(ft, 6).alias("trend_strength"),
        F.round(fs, 6).alias("seasonal_strength"),
    )


def adstock_transform(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "day",
    decay: float = 0.5,
    max_lag: int = 8,
) -> DataFrame:
    """Geometric adstock (carry-over) transform per group over
    bucketed rollups: ``(grp, bucket_epoch, raw, adstock)`` with
    ``adstock_t = Σ_{j=0..max_lag} decay^j · raw_{t−j}`` over the
    REGULAR bucket grid (missing buckets are zero spend and decay
    straight through — gaps are NOT compressed, unlike a row-lag
    window).  The standard marketing-mix preprocessing: media spend
    keeps working after the flight ends, so regressing conversions on
    raw spend underestimates long-decay channels.  Truncating at
    ``max_lag`` loses ``decay^(max_lag+1)`` of the tail (< 0.4% at
    the defaults, documented) but keeps the transform a FIXED
    expression — no recursion, no state.

    Plan: one data-sized rollup; the lag terms are ONE explode(0..L)
    + a self equi join on (grp, bucket − j·step) — linear in
    rollup×(L+1), no windows, no sort; rows with zero raw but live
    carry-over are materialized by the join's right side.
    """
    if not (0.0 < decay < 1.0):
        raise ValueError("adstock_transform: decay must be in (0, 1)")
    if max_lag < 1:
        raise ValueError("adstock_transform: max_lag must be >= 1")
    step = _BUCKET_NS[bucket] // 1_000_000_000
    rollup = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("_b"),
        )
        .agg(F.sum(F.col(value_col).cast("double")).alias("raw"))
    )
    # each spend row contributes decay^j at bucket b + j·step
    contrib = rollup.withColumn(
        "_j",
        F.explode(F.sequence(F.lit(0), F.lit(int(max_lag)))),
    ).select(
        "grp",
        (F.col("_b") + F.col("_j") * F.lit(step)).alias("bucket_epoch"),
        (
            F.pow(F.lit(float(decay)), F.col("_j")) * F.col("raw")
        ).alias("_c"),
        F.when(F.col("_j") == 0, F.col("raw"))
        .otherwise(F.lit(0.0))
        .alias("_raw"),
    )
    def _snap6(c):
        # half-up snap: Spark round() and DuckDB round() break .5
        # ties differently at the 6th decimal (the repo-wide gotcha)
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return (
        contrib.groupBy("grp", "bucket_epoch")
        .agg(
            F.sum("_raw").alias("_rawsum"),
            F.sum("_c").alias("_csum"),
        )
        .select(
            "grp",
            "bucket_epoch",
            _snap6(F.col("_rawsum")).alias("raw"),
            _snap6(F.col("_csum")).alias("adstock"),
        )
    )


def seasonal_mad_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    period: int = 24,
    threshold: float = 3.5,
) -> DataFrame:
    """Seasonality-aware robust anomaly flags: per (group, phase =
    bucket mod period) compute the median and MAD of the rollup
    metric, flag buckets with ``|x − median_phase| > threshold ·
    1.4826 · MAD_phase`` — the "3am Sunday is SUPPOSED to be quiet"
    detector: a global z-score (``rolling_zscore_anomalies``) flags
    every weekend as anomalous on weekday-heavy metrics; conditioning
    on phase removes the seasonal baseline first, and median/MAD
    survive the very outliers being hunted (50% breakdown).  Returns
    ``(grp, bucket_epoch, phase, metric, phase_median, phase_mad,
    robust_z, is_anomaly)``; zero-MAD phases (constant baseline)
    yield NULL z — a constant phase with one deviation still flags
    via the raw inequality, loudly documented as NULL-z/anomaly-NULL.

    Plan: one data-sized rollup; medians/MADs per (group, phase) via
    two RANGE-frame percentile windows over the rollup (each window
    is |buckets|/period rows); the flag is a projection.
    """
    step = _BUCKET_NS[bucket] // 1_000_000_000
    rollup = (
        events.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            _bucket_epoch(events, ts_col, bucket).alias("bucket_epoch"),
        )
        .agg(F.sum(F.col(value_col).cast("double")).alias("metric"))
        .withColumn(
            "phase",
            F.pmod(
                F.floor(F.col("bucket_epoch") / F.lit(step)).cast(
                    "long"
                ),
                F.lit(int(period)),
            ).cast("int"),
        )
    )
    pw = Window.partitionBy("grp", "phase")
    med = F.expr("percentile(metric, 0.5)").over(pw)
    marked = rollup.withColumn("_med", med)
    mad = F.expr("percentile(abs(metric - _med), 0.5)").over(
        Window.partitionBy("grp", "phase")
    )
    scored = marked.withColumn("_mad", mad)
    z = F.when(
        F.col("_mad") > 0,
        (F.col("metric") - F.col("_med"))
        / (F.lit(1.4826) * F.col("_mad")),
    )
    return scored.select(
        "grp",
        "bucket_epoch",
        "phase",
        F.round("metric", 6).alias("metric"),
        F.round("_med", 6).alias("phase_median"),
        F.round("_mad", 6).alias("phase_mad"),
        F.round(z, 6).alias("robust_z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(threshold))).alias(
            "is_anomaly"
        ),
    )
