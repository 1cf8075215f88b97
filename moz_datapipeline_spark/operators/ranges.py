"""Range joins at scale.

``bbox_join`` (areas.py) broadcasts the interval side — right when zones
are small. When BOTH sides are large (point stream × million-interval
table), a broadcast nested-loop explodes; ``bucketed_range_join``
converts the range predicate into an equi join:

- points map to bucket ``floor(p / width)``
- intervals explode to every bucket they overlap
- equi join on the bucket co-locates candidates; an exact filter
  removes false positives from bucket granularity.

Shuffle volume is |points| + Σ interval spans/width — tunable via
``bucket_width`` (match the median interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """points ⨝ intervals ON lo <= p < hi, as a bucketed equi join."""
    p_bucketed = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    i_bucketed = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge doesn't
                # reach into the next bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bucket_width
                ).cast("long"),
            )
        ),
    )
    joined = p_bucketed.join(i_bucketed, "_bucket", how)
    return joined.filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    ).drop("_bucket")


def global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: list[str],
    ascending: bool = True,
    with_percent: bool = True,
    eager: bool = False,
) -> DataFrame:
    """Exact global rank (1-based ``row_number`` under the total order
    ``(order_col, *tiebreak_cols)`` asc) plus the exact CDF
    ``percent_rank = (rank − 1)/(n − 1)`` — WITHOUT the global-window
    single-partition trap.

    ``F.row_number().over(Window.orderBy(...))`` funnels the entire
    dataset through ONE task; at 100 TB that is the sort that never
    finishes.  This is the two-phase distributed prefix rank
    (``text.batch_by_length`` / ``pack_documents`` family): range-
    partition by the order key, per-partition local ranks, broadcast
    each partition's exclusive base count back, add.  Any range
    boundary sampling yields the same ranks because the final rank
    depends only on the total order.  One range exchange + one tiny
    window over |partitions| rows.

    ``tiebreak_cols`` must make the order total (unique) — ranks are
    otherwise partitioning-dependent for tied rows.

    Cache contract: the range-partitioned dataset must stay pinned so
    the counts branch and the final join observe the SAME sampled
    partitioning.  ``eager=False`` (default) leaves that cache live
    for the returned frame's lifetime; long-running drivers should
    pass ``eager=True``, which materializes the (persisted) result,
    releases the intermediate, and leaves AT MOST the returned frame
    cached — unpersist it when done (the ``graph.pagerank`` /
    ``graph.lpa`` contract, pinned by ``tests/test_cache_contract``).
    """
    from pyspark.sql import Window

    if not tiebreak_cols:
        raise ValueError("global_rank: tiebreak_cols must make the order total")
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    tb = [F.col(c).asc() for c in tiebreak_cols]
    ranged = df.repartitionByRange(oc, *tb).withColumn(
        "_pid", F.spark_partition_id()
    )
    lw = Window.partitionBy("_pid").orderBy(oc, *tb)
    # cache: the counts branch and the final join must observe the SAME
    # sampled range partitioning (same rule as batch_by_length)
    local = ranged.withColumn(
        "_lrank", F.row_number().over(lw).cast("long")
    ).cache()
    bases = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("_n", F.sum("_cnt").over(Window.partitionBy()))
        .select("_pid", "_base", "_n")
    )
    out = local.join(F.broadcast(bases), "_pid").withColumn(
        "rank", F.col("_base") + F.col("_lrank")
    )
    if with_percent:
        out = out.withColumn(
            "percent_rank",
            F.when(
                F.col("_n") > 1,
                F.round(
                    (F.col("rank") - 1).cast("double")
                    / (F.col("_n") - 1).cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
    result = out.drop("_pid", "_lrank", "_base", "_n")
    if eager:
        result = result.persist()
        result.count()
        local.unpersist()
    return result


def peak_concurrency(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    group_cols: list[str] | None = None,
    eager: bool = False,
) -> DataFrame:
    """Maximum number of simultaneously-open ``[start, end)`` intervals
    (per group when ``group_cols`` given): ``(*group_cols,
    peak_concurrency, peak_at)`` with ``peak_at`` the earliest instant
    the peak is reached.

    The sweep line: every interval contributes (+1 at start, −1 at
    end); concurrency at an instant is the running sum of deltas in
    time order.  The running sum is a GLOBAL prefix scan — the same
    single-partition trap as global rank — so it reuses the two-phase
    technique: range-partition boundary events by (time, delta),
    per-partition local cumulative sums, broadcast per-partition
    totals back as exclusive base offsets.  Ends sort BEFORE starts at
    the same instant (delta asc), so touching intervals
    ``[a,b),[b,c)`` never double-count.

    One explode (2 rows per interval), one range exchange, one window
    over |partitions| rows.  Holds at any interval count.

    Cache contract: same as ``global_rank`` — the pinned range
    partitioning is released under ``eager=True`` once the (persisted)
    result materializes; unpersist the returned frame when done.
    """
    group_cols = group_cols or []
    ev = intervals.select(
        *group_cols,
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("t"), F.lit(1).alias("d")
                ),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("_e"),
    ).select(*group_cols, F.col("_e.t").alias("t"), F.col("_e.d").alias("d"))

    from pyspark.sql import Window

    ranged = ev.repartitionByRange(
        *[F.col(c) for c in group_cols], F.col("t").asc(), F.col("d").asc()
    ).withColumn("_pid", F.spark_partition_id())
    lw = Window.partitionBy("_pid", *group_cols).orderBy(
        F.col("t").asc(), F.col("d").asc()
    )
    local = ranged.withColumn(
        "_lsum",
        F.sum("d").over(lw.rowsBetween(Window.unboundedPreceding, 0)),
    ).cache()
    bases = (
        local.groupBy("_pid", *group_cols)
        .agg(F.sum("d").alias("_tot"))
        .withColumn(
            "_base",
            F.coalesce(
                F.sum("_tot").over(
                    Window.partitionBy(*group_cols)
                    .orderBy("_pid")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", *group_cols, "_base")
    )
    running = local.join(F.broadcast(bases), ["_pid", *group_cols]).select(
        *group_cols,
        "t",
        "d",
        (F.col("_base") + F.col("_lsum")).alias("conc"),
    )
    # peak = max running concurrency; peak_at = earliest t attaining it
    # (only +1 events can attain a maximum, making peak_at well-defined)
    starts = running.filter(F.col("d") == 1)
    peaks = starts.groupBy(*group_cols).agg(
        F.max("conc").cast("long").alias("peak_concurrency")
    )
    firsts = (
        starts.groupBy(*group_cols, "conc")
        .agg(F.min("t").alias("peak_at"))
        .withColumn("peak_concurrency", F.col("conc").cast("long"))
        .drop("conc")
    )
    result = peaks.join(firsts, [*group_cols, "peak_concurrency"])
    if eager:
        result = result.persist()
        result.count()
        local.unpersist()
    return result


def pareto_frontier_2d(
    df: DataFrame, x_col: str, y_col: str, eager: bool = False
) -> DataFrame:
    """Exact 2-D Pareto frontier (skyline), minimizing BOTH columns:
    keep every row no other row strictly dominates (``s.x <= r.x``,
    ``s.y <= r.y``, at least one strict).  Rows with identical
    ``(x, y)`` do not dominate each other — all are kept.  NULL in
    either column excludes the row (no dominance order for it).

    The quadratic NOT-EXISTS encoding dies at scale; in 2-D dominance
    factorizes into two prefix tests over the DISTINCT-x group table
    (min y per x — usually orders of magnitude smaller than the
    input):

    - SAME-x domination: ``y > min_y(x)``;
    - STRICTLY-SMALLER-x domination: ``strict_prefix_min_y(x) <= y``,
      where the strict prefix min over the x order is computed on the
      group table WITHOUT a single-partition global window, via the
      two-phase scheme ``global_rank`` uses — range-partition by x
      (each x occurs once, so no boundary ties), per-partition
      ``rowsBetween(unbounded, -1)`` running min, then the broadcast
      exclusive running min of predecessor partitions.

    One hash aggregate + one range exchange over the group table +
    one equi join back: holds at any scale, unlike the textbook
    self-join.

    Cache contract: same as ``global_rank`` — the pinned group-table
    range partitioning is released under ``eager=True`` once the
    (persisted) result materializes; unpersist the returned frame
    when done.
    """
    from pyspark.sql import Window

    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    base = df.filter(x.isNotNull() & y.isNotNull())

    gx = base.groupBy(x.alias("_x")).agg(F.min(y).alias("_eq_min"))
    ranged = gx.repartitionByRange(F.col("_x").asc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    lw = (
        Window.partitionBy("_pid")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # cache: the bases branch and the join must observe the SAME
    # sampled range partitioning (the global_rank rule)
    local = ranged.withColumn(
        "_lmin", F.min("_eq_min").over(lw)
    ).cache()
    bases = (
        local.groupBy("_pid")
        .agg(F.min("_eq_min").alias("_pmin"))
        .withColumn(
            "_base",
            F.min("_pmin").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
        )
        .select("_pid", "_base")
    )
    inf = F.lit(float("inf"))
    strict = F.least(
        F.coalesce(F.col("_lmin"), inf), F.coalesce(F.col("_base"), inf)
    )
    marks = local.join(F.broadcast(bases), "_pid").select(
        "_x", "_eq_min", strict.alias("_strict_min")
    )
    result = (
        base.join(marks, x == F.col("_x"))
        .filter(~(y > F.col("_eq_min")) & ~(F.col("_strict_min") <= y))
        .drop("_x", "_eq_min", "_strict_min")
    )
    if eager:
        result = result.persist()
        result.count()
        local.unpersist()
    return result


def interval_coverage(
    intervals: DataFrame,
    group_col: str,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Union length of possibly-overlapping ``[start, end)`` intervals
    per group: ``(group, n_intervals, n_segments, covered)`` where
    ``covered`` is the total measure of the merged union and
    ``n_segments`` the number of disjoint runs after merging —
    "machine-busy seconds", "supplier days with stock in transit",
    "sessionized uptime", all in one shape.

    The classic stack-merge sweep is a per-group prefix scan: order a
    group's intervals by (start, end); an interval OPENS a new segment
    iff its start exceeds the running max end of every earlier
    interval.  That running max is one window (hash-partitioned on the
    group — never global), the segment id is a prefix sum of the open
    flags, and per-segment extent is a hash aggregate.  Degenerate
    ``end <= start`` rows contribute zero length and never bridge
    segments (the strict ``>`` test).

    Two shuffles: the group-window sort and the (group, segment)
    aggregate (which reuses the group hashing).  Per-group cost is the
    group's interval count — skew follows the group distribution, the
    same contract as ``sessionization``.
    """
    from pyspark.sql import Window

    # a stable per-row id makes the (start, end) order TOTAL, so the
    # two window passes below see the identical sequence — without it,
    # duplicate intervals could flip order between passes and attach a
    # segment-opening flag to the wrong prefix position
    base = intervals.select(
        F.col(group_col).alias("grp"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
    ).withColumn("_rid", F.monotonically_increasing_id())
    order = Window.partitionBy("grp").orderBy(
        F.col("_s").asc(), F.col("_e").asc(), F.col("_rid").asc()
    )
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    prev_max_end = F.max("_e").over(prev)
    is_new = F.when(
        prev_max_end.isNull() | (F.col("_s") > prev_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    # two selects: a window expression (the running max) cannot nest
    # inside another window aggregate in one projection
    flagged = base.select("grp", "_s", "_e", "_rid", is_new.alias("_new"))
    order2 = Window.partitionBy("grp").orderBy(
        F.col("_s").asc(), F.col("_e").asc(), F.col("_rid").asc()
    )
    segged = flagged.select(
        "grp",
        "_s",
        "_e",
        F.sum("_new")
        .over(order2.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_seg"),
    )
    per_seg = segged.groupBy("grp", "_seg").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_s").alias("_lo"),
        F.max("_e").alias("_hi"),
    )
    return per_seg.groupBy("grp").agg(
        F.sum("_n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum(
            F.greatest(F.col("_hi") - F.col("_lo"), F.lit(0))
        ).alias("covered"),
    ).withColumnRenamed("grp", group_col)
