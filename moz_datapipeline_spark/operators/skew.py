"""Skew-handling utilities for hot-key aggregations and joins.

AQE's skew-join splitting handles most cases
(``spark.sql.adaptive.skewJoin.enabled`` is on in the session factory);
these helpers cover what AQE can't: a skewed *aggregation* (one giant
group) and a broadcast-immune skewed join where both sides are large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame, keys: list[str], value_col: str, salt: int = 16
) -> DataFrame:
    """Two-phase sum for skewed groups: salt → partial agg → final agg.

    Phase 1 shuffles on (key, salt) spreading a hot key over ``salt``
    reducers; phase 2 combines the ``salt`` partials — its shuffle moves
    only |groups|·salt rows.

    Salt choice: ``F.rand(seed)``. A task retry may re-deal rows to
    different salt buckets, which is harmless HERE because a sum is
    commutative and reassociable — the per-key total is identical no
    matter how rows split across salts. That argument covers SUM-like
    aggregates only; for order- or identity-sensitive aggregates
    (first, collect_list, …) use a content-derived salt
    (``hash(stable_col) % salt``) so every retry deals identically.
    """
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(value_col).alias("_partial")
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(f"sum_{value_col}"))


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant inner equi join of a skewed fact side against a
    non-broadcastable dimension side.

    The skewed side gets a random salt ∈ [0, salt); the other side is
    replicated ``salt`` times (explode of a literal range) so every
    (key, salt) bucket finds its match. Costs ``salt``× duplication of
    the right side — use only when AQE's skew splitting isn't available
    (e.g. the skew is in a shuffle-hash join AQE didn't split).
    """
    left = skewed.withColumn("_salt", (F.rand(seed=7) * salt).cast("int"))
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = left.join(right, [key, "_salt"])
    return out.drop("_salt")
