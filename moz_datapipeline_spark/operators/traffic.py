"""Traffic-matrix operators.

- ``unpivot_matrix``   (U1)  — wide OD matrix → long records
  (scripts/process-traffic/process-traffic.js:40-82).
- ``pair_reverse_fold`` (J12) — fold directed (o,d)/(d,o) records into one
  undirected record with forward + reverse counts
  (process-traffic.js:83-94); drops self-pairs (:95-96).
- ``od_pairs``         (A9)  — upper-triangle distinct pair generation
  (scripts/criticality/criticality.js:144-155, utils.js:310-342).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unpivot_matrix(
    wide: DataFrame, from_col: str = "from", value_name: str = "dailyODCount"
) -> DataFrame:
    """Wide matrix (one column per destination id) → long (origin, destination, count).

    Non-numeric destination columns are dropped, mirroring the reference's
    key filter. Uses the native ``unpivot`` (Spark 3.4+) so the expansion
    is a generator inside codegen, not a Python loop.
    """
    dest_cols = [c for c in wide.columns if c != from_col and c.isdigit()]
    long = wide.unpivot(
        ids=[from_col], values=dest_cols, variableColumnName="destination",
        valueColumnName=value_name,
    )
    return long.select(
        F.col(from_col).cast("long").alias("origin"),
        F.col("destination").cast("long").alias("destination"),
        F.col(value_name).cast("long").alias(value_name),
    )


def pair_reverse_fold(
    directed: DataFrame,
    origin: str = "origin",
    destination: str = "destination",
    count: str = "dailyODCount",
) -> DataFrame:
    """Directed (o,d,count) → undirected (o<d) with forward/reverse counts.

    One shuffle on the canonicalized pair key; no self-join needed —
    canonicalize then aggregate, which scales better than the reference's
    in-memory find() and better than a self-join (half the shuffle).
    """
    o, d, c = F.col(origin), F.col(destination), F.col(count)
    canon = directed.filter(o != d).select(
        F.least(o, d).alias("origin"),
        F.greatest(o, d).alias("destination"),
        F.when(o < d, c).otherwise(F.lit(0)).alias("_fwd"),
        F.when(o > d, c).otherwise(F.lit(0)).alias("_rev"),
    )
    return canon.groupBy("origin", "destination").agg(
        F.sum("_fwd").alias(count), F.sum("_rev").alias("reverseODCount")
    )


def od_pairs(points: DataFrame, idx_col: str = "INDEX_OD") -> DataFrame:
    """All unordered point pairs (i < j): n(n−1)/2 rows.

    The OD set is small (reference: 138 zones); broadcast one side so the
    cross join never shuffles the scenario fan-out it feeds.
    """
    a = points.select(F.col(idx_col).alias("o_idx"))
    b = points.select(F.col(idx_col).alias("d_idx"))
    return a.crossJoin(F.broadcast(b)).filter(F.col("o_idx") < F.col("d_idx"))
