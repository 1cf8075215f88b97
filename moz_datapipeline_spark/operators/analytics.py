"""Event-analytics operators: funnels, cohort retention, sketch counts.

The reference's event-shaped processing is the traffic OD pipeline
(``scripts/criticality.sh`` aggregating per-way scenario results); a
production analytics engine additionally needs user-journey shapes over
an event stream: ordered funnels, cohort retention grids, and
sketch-based distinct counting that stays cheap at 100 TB.

All operators are declarative DataFrame plans.  Timestamps arrive as
integer nanoseconds (the ``events`` table is ns-precision parquet read
with ``nanosAsLong``), so every time comparison is exact integer math —
no timezone or precision drift between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NS_PER_DAY = 86_400_000_000_000


def funnel_stages(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel user counts: users reaching stage *i* had a stage
    *i* event strictly after their earliest stage *i-1* arrival.

    One-pass plan: the event table is scanned ONCE and shuffled ONCE
    (on ``user_col``).  A single ``groupBy(user)`` collects one sorted
    timestamp array per stage (map-side partial ``collect_list``, so
    the shuffle carries per-user slices, not the raw table), then a
    higher-order-function fold walks the stages left to right —
    ``t_i = array_min(filter(a_i, x -> x > t_{i-1}))`` — entirely in
    JVM codegen.  Per-user state is that user's own event timestamps
    for the funnel's stages only, never global history.  The final
    per-stage counts reduce the per-user booleans in one tiny
    single-row aggregate, then explode to the (stage_idx, stage,
    n_users) grid.  Counts are exact integers; no float crosses the
    boundary.
    """
    per_user = (
        events.filter(F.col(type_col).isin(*stages))
        .groupBy(user_col)
        .agg(
            *[
                F.array_sort(
                    F.collect_list(
                        F.when(F.col(type_col) == s, F.col(ts_col))
                    )
                ).alias(f"_a{i}")
                for i, s in enumerate(stages)
            ]
        )
    )
    reach_cols = []
    prev = None
    for i in range(len(stages)):
        arr = F.col(f"_a{i}")
        if prev is None:
            cur = F.array_min(arr)
        else:
            # closure factory: PySpark HOF lambdas take positional
            # Columns only, so bind the threshold via an outer scope
            def _after(t):
                return lambda x: x > t

            cur = F.array_min(F.filter(arr, _after(prev)))
        reach_cols.append(cur.alias(f"_t{i}"))
        prev = cur
    reached = per_user.select(*reach_cols)
    one = reached.agg(
        *[F.count(f"_t{i}").alias(f"_n{i}") for i in range(len(stages))]
    )
    grid = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"_n{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return one.select(F.explode(grid).alias("_s")).select(
        "_s.stage_idx", "_s.stage", "_s.n_users"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort-retention grid: users bucketed by first-activity day,
    counted per day offset of subsequent activity.

    Plan shape: a per-user min aggregation for the cohort day, a
    distinct projection of (user, day) activity, and one join on the
    user key — three shuffles total, all on narrow keys.  Days are
    integer epoch-day numbers derived from the ns timestamp, so the
    grid is engine-exact.
    """
    # integral division: ts is ~1e18 ns, beyond double's 2^53 exact range,
    # so float division could misplace a boundary timestamp by one day
    day = F.expr(f"{ts_col} div {NS_PER_DAY}")
    first = events.groupBy(user_col).agg(F.min(day).alias("cohort_day"))
    active = events.select(user_col, day.alias("activity_day")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort_day",
            (F.col("activity_day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def distinct_within_tolerance(
    events: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
    rsd: float = 0.01,
    tolerance_pct: int = 5,
) -> DataFrame:
    """Exact vs HyperLogLog distinct counts with a bounded-error flag.

    At 100 TB an exact per-group distinct is a full shuffle of the key
    column; the HLL sketch aggregates in fixed memory with map-side
    partial merge and no key shuffle at all.  This operator computes
    both and emits ``sketch_ok`` — whether the sketch landed within
    ``tolerance_pct`` per cent of truth — so callers can certify the
    cheap path before switching to it.  The flag comparison is integer
    cross-multiplication (exact); at low cardinality the sketch is in
    sparse mode and exact by construction.
    """
    return (
        events.groupBy(group_col)
        .agg(
            F.countDistinct(key_col).alias("exact_distinct"),
            F.approx_count_distinct(key_col, rsd).alias("_approx"),
        )
        .select(
            group_col,
            "exact_distinct",
            (
                F.abs(F.col("_approx") - F.col("exact_distinct")) * 100
                <= F.col("exact_distinct") * tolerance_pct
            ).alias("sketch_ok"),
        )
    )


def percentile_within_tolerance(
    df: DataFrame,
    group_col: str = "l_returnflag",
    value_col: str = "l_extendedprice",
    p: float = 0.95,
    accuracy: int = 1000,
    tolerance_pct: int = 1,
) -> DataFrame:
    """Exact vs sketch percentile with a bounded-error flag — the
    quantile twin of ``distinct_within_tolerance``.

    At 100 TB an exact percentile sorts every group; the
    ``approx_percentile`` KLL-style sketch aggregates in fixed memory
    with map-side partial merge.  This computes both and emits
    ``sketch_ok`` (sketch within ``tolerance_pct`` per cent of truth)
    so callers can certify the cheap path per group before switching.
    """
    return (
        df.groupBy(group_col)
        .agg(
            F.expr(f"percentile({value_col}, {p})").alias("exact_p"),
            F.expr(
                f"approx_percentile({value_col}, {p}, {accuracy})"
            ).alias("_approx"),
        )
        .select(
            group_col,
            F.expr("floor(exact_p * 100 + 0.5) / 100").alias("exact_p"),
            (
                F.abs(F.col("_approx") - F.col("exact_p")) * 100
                <= F.col("exact_p") * tolerance_pct
            ).alias("sketch_ok"),
        )
    )


def attribute_clicks(
    events: DataFrame,
    view_type: str = "view",
    click_type: str = "click",
    window_ns: int = 900_000_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Last-touch attribution: for each click, the latest view by the
    same user within the preceding ``window_ns`` nanoseconds, plus the
    number of candidate views.

    Batch twin of ``streaming.events.stream_stream_attribution`` —
    the same equi-join on the user key with a two-sided time residual,
    so the shuffle is on ``user_col`` (a skewed power user is bounded
    by the window horizon, and AQE skew-split covers the batch side).
    All time math is integer nanoseconds.
    """
    v = events.filter(F.col(type_col) == view_type).select(
        F.col(user_col).alias("_vu"), F.col(ts_col).alias("view_ts")
    )
    c = events.filter(F.col(type_col) == click_type).select(
        id_col, user_col, ts_col
    )
    pairs = c.join(
        v,
        (c[user_col] == v["_vu"])
        & (v["view_ts"] <= c[ts_col])
        & (c[ts_col] - v["view_ts"] <= window_ns),
    )
    return (
        pairs.groupBy(id_col, user_col)
        .agg(
            F.max("view_ts").alias("attributed_view_ts"),
            F.count("*").alias("n_candidate_views"),
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 256,
    k: int = 10,
    portable: bool = True,
) -> DataFrame:
    """Count-min-sketch heavy hitters with EXACT certification.

    At 100 TB a per-key frequency table is a full shuffle on the key;
    the count-min sketch aggregates into ``depth × width`` counters
    with map-side combine — fixed memory, no key shuffle — and answers
    point queries with one-sided error (never underestimates, over-
    estimates by collisions bounded by ~2N/width with probability
    1-2^-depth).  This operator builds the sketch AS DATAFRAME STATE
    (the bucket-count table itself, so the construction is the real
    distributed plan, not a driver-side object), takes the exact
    top-``k`` keys, and reports exact vs estimated counts plus the
    ``never_underestimates`` certification column — the cheap path's
    admission test, same pattern as ``distinct_within_tolerance``.

    The bucket hash is the engine's portable md5 family per depth row
    (``portable=False`` switches to xxhash64 — cheaper per row, same
    structure), so the WHOLE sketch — construction, point queries,
    estimates — replays bit-for-bit in the DuckDB oracle: unlike the
    HLL/KLL certifications, the approximate values themselves are
    value-checked, not just flagged.
    """
    if depth < 1 or width < 2:
        raise ValueError("cms_heavy_hitters: need depth >= 1, width >= 2")
    from moz_datapipeline_spark.operators.dedup import _token_hash

    key = F.col(key_col).cast("string")

    def _bucket(d: int, col: Column) -> Column:
        return F.pmod(
            _token_hash(F.concat(F.lit(f"cms{d}:"), col), portable),
            F.lit(width),
        )

    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _bucket(d, key).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.bucket")
    sketch = rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))

    exact = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col(key_col).asc())
        .limit(k)
    )
    probes = exact.select(
        key_col,
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(d, F.col(key_col).cast("string")).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "exact_count", "p.d", "p.bucket")
    return (
        probes.join(sketch, ["d", "bucket"])
        .groupBy(key_col, "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            key_col,
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_count")).alias(
                "never_underestimates"
            ),
        )
    )


def top_event_paths(
    events: DataFrame,
    k: int = 20,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` most common within-session event sequences:
    ``(path, n_sessions)`` with ``path`` like ``"view > click >
    purchase"``, ranked by count desc then path asc.

    Funnel analysis's exploratory twin: funnels check a HYPOTHESIZED
    order, paths discover which orders actually happen.

    Plan: sessionize (lag + running sum per user — one shuffle on the
    user key), per-session ordered collect via ``sort_array`` of
    (ts, id, type) structs (the session's own events only — bounded by
    session length, never a global sort), hash-aggregate path counts
    with map-side combine, TakeOrderedAndProject top-k.  Tiebreak
    ``id_col`` makes the within-session order total, so paths are
    partitioning-stable.
    """
    from moz_datapipeline_spark.streaming.events import sessionize_batch

    # dual time layout (the _events() contract): a LONG ts column is
    # epoch-nanoseconds, so the gap threshold scales to ns; timestamps
    # pass through in seconds
    gap = gap_seconds
    if events.schema[ts_col].dataType.typeName() in ("long", "bigint"):
        gap = gap_seconds * 1_000_000_000
    sess = sessionize_batch(
        events, gap_seconds=gap, user_col=user_col, ts_col=ts_col
    )
    per_session = (
        sess.groupBy(user_col, "session_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        F.col(id_col).alias("eid"),
                        F.col(type_col).alias("tp"),
                    )
                )
            ).alias("_evs")
        )
        .select(
            F.array_join(
                F.transform(F.col("_evs"), lambda e: e["tp"]), " > "
            ).alias("path")
        )
    )
    return (
        per_session.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


def grouped_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares fit ``y = slope·x + intercept``:
    ``(*group_cols, n, slope, intercept, r2)`` — the one-pass trend
    summary behind "is this source's quality score drifting over
    time?" / "does document length predict perplexity per domain?"
    audits (fan-in shape: A3's per-way stats fold generalized to a
    regression).

    Everything derives from the five raw power sums (Σx, Σy, Σx²,
    Σy², Σxy) plus the count, so the whole fit is ONE map-side-combined
    hash aggregate regardless of group count — no second scan, no
    window, no per-group collect.  Degenerate groups are explicit:
    constant x (zero variance) has no defined slope → ``slope``,
    ``intercept``, ``r2`` all NULL; constant y fits perfectly but
    explains no variance → ``r2`` NULL (0/0), slope 0.  Rows with a
    NULL in either column are excluded (pairwise deletion).  All
    guards are ``when()`` branches, never double-division NaNs, so the
    output hashes identically across engines under ANSI mode.
    """
    if not group_cols:
        raise ValueError("grouped_ols: need at least one group column")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull())
    sums = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    n = F.col("_n")
    dx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    cv = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when(dx > 0, cv / dx)
    intercept = F.when(
        dx > 0, (F.col("_sy") - (cv / dx) * F.col("_sx")) / n
    )
    r2 = F.when((dx > 0) & (dy > 0), (cv * cv) / (dx * dy))
    return sums.select(
        *group_cols,
        n.cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def copurchase_lift(
    lineitem: DataFrame,
    min_pair_count: int = 2,
    k: int = 20,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
) -> DataFrame:
    """Market-basket pair mining: top-``k`` co-purchased item pairs by
    lift — ``(item_a, item_b, n_pairs, n_a, n_b, lift)`` with
    ``lift = P(ab)/(P(a)·P(b)) = n_pairs·N / (n_a·n_b)`` over N
    baskets, ``item_a < item_b``.

    Pair volume is Σ C(basket_size, 2) — bounded by the square of the
    LARGEST BASKET, not the catalog: the self-join is an equi join on
    the basket key, so a 100 TB order history fans out per order, never
    across orders.  Item marginals are a |catalog|-row aggregate,
    broadcast twice.  ``min_pair_count`` prunes noise pairs before the
    rank exchange; top-k is TakeOrderedAndProject (lift desc, pair asc).
    """
    baskets = lineitem.select(
        F.col(order_col).alias("oid"), F.col(item_col).alias("item")
    ).distinct()
    n_orders = baskets.select("oid").distinct().count()
    marg = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = baskets.select("oid", F.col("item").alias("item_a"))
    b = baskets.select("oid", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "oid")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") >= int(min_pair_count))
    )
    scored = (
        pairs.join(
            F.broadcast(marg.select(F.col("item").alias("item_a"),
                                    F.col("n_item").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("item").alias("item_b"),
                                    F.col("n_item").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a", "item_b", "n_pairs", "n_a", "n_b",
            F.round(
                F.col("n_pairs").cast("double") * F.lit(float(n_orders))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.desc("lift"), F.asc("item_a"), F.asc("item_b")
    ).limit(k)
