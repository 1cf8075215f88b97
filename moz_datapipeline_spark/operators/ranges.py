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
    return out.drop("_pid", "_lrank", "_base", "_n")
