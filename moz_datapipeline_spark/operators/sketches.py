"""Mergeable cardinality sketches as DataFrame state.

``analytics.distinct_within_tolerance`` certifies Spark's built-in
``approx_count_distinct`` against truth, but the built-in sketch is
opaque driver-side state: it cannot be persisted per shard, merged
across days, or replayed by another engine.  This module implements
HyperLogLog with the REGISTERS THEMSELVES as rows
``(group, bucket, max_rho)`` so the sketch

- builds with one hash aggregate (map-side partial combine — at
  100 TB the shuffle carries ≤ |groups|·m register rows, never the
  key column);
- merges across shards/epochs with a ``groupBy(...).agg(max)`` —
  the lattice join HLL is famous for, here literally a DataFrame
  union + aggregate (``hll_merge``);
- persists as plain parquet (a sketch store costs |groups|·m rows);
- replays BIT-FOR-BIT in the DuckDB oracle: the bucket/rho pipeline
  uses the engine's portable md5 hash family
  (``dedup._portable_hash``) and the estimator sums registers in
  EXACT integer arithmetic (Σ 2^(61−rho) as DECIMAL) so no
  float-addition-order nondeterminism leaks into the estimate.

Estimator: standard HLL (Flajolet et al. 2007) with the
linear-counting small-range correction; α_m = 0.7213/(1+1.079/m)
(valid for m ≥ 128, the enforced minimum).  The 60-bit hash makes the
large-range correction irrelevant at any realistic cardinality.

ρ here is trailing-zeros+1 of the bucket quotient (the
Flajolet–Martin lsb variant — identical guarantees, and exactly
replayable in SQL via ``rtrim(bin(q), '0')``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from moz_datapipeline_spark.operators.dedup import _portable_hash

#: ρ cap: the portable hash is 60 bits, so the quotient has < 61
#: trailing zeros; q == 0 gets the cap.
_RHO_CAP = 61


def _alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """HLL register rows ``(*group_cols, bucket, max_rho)`` for the
    distinct count of ``key_col`` per group; ``m = 2**p`` buckets.

    One projection + one hash aggregate.  Absent (bucket) rows mean an
    untouched register (ρ = 0) — the estimator accounts for them
    arithmetically, so the state stays sparse when cardinality ≪ m.
    """
    if p < 7:
        raise ValueError("hll_registers: need p >= 7 (alpha approximation)")
    group_cols = group_cols or []
    m = 1 << p
    h = _portable_hash(F.concat(F.lit("hll:"), F.col(key_col).cast("string")))
    bucket = F.pmod(h, F.lit(m)).cast("int")
    q = F.floor(h / F.lit(m)).cast("long")
    qbin = F.bin(q)
    trailing = F.length(qbin) - F.length(
        F.regexp_replace(qbin, "0+$", "")
    )
    rho = F.when(q == 0, F.lit(_RHO_CAP)).otherwise(trailing + 1)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge two register tables built with the SAME ``p``: union +
    per-bucket max.  Associative/commutative/idempotent — shard
    sketches merge in any order, re-merging is a no-op."""
    group_cols = group_cols or []
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """Cardinality estimate per group from register rows:
    ``(*group_cols, n_filled, est_distinct)``.

    The harmonic-mean denominator is computed EXACTLY: each register
    contributes 2^(61−ρ) as an integer, summed as DECIMAL(38,0) (no
    float addition order-dependence across partitions), and untouched
    registers contribute 2^61 each via ``(m − n_filled)``
    arithmetically — so the same registers give the same estimate on
    any engine, which is what lets the DuckDB oracle value-check the
    approximation itself, not just flag it.
    """
    group_cols = group_cols or []
    m = 1 << p
    alpha = _alpha(m)
    term = F.pow(F.lit(2.0), F.lit(_RHO_CAP) - F.col("max_rho")).cast(
        "decimal(38,0)"
    )
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("n_filled"),
        F.sum(term).alias("_sum_terms"),
    )
    # S = Σ_filled 2^-rho + (m - n_filled) · 1, scaled by 2^61
    scale = float(1 << _RHO_CAP)
    s = (
        F.col("_sum_terms").cast("double") / F.lit(scale)
        + (F.lit(m) - F.col("n_filled")).cast("double")
    )
    e_raw = F.lit(alpha) * F.lit(float(m) * float(m)) / s
    v = F.lit(m) - F.col("n_filled")  # untouched registers
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((e_raw <= 2.5 * m) & (v > 0), linear).otherwise(e_raw)
    return agg.select(
        *group_cols,
        "n_filled",
        F.round(est, 3).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 10,
) -> DataFrame:
    """Build + estimate in one call: ``(*group_cols, n_filled,
    est_distinct)``.  Sugar over ``hll_registers`` → ``hll_estimate``;
    long-lived pipelines should keep the register table and merge
    increments instead."""
    return hll_estimate(
        hll_registers(df, key_col, group_cols, p), group_cols, p
    )


def kmv_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """K-minimum-values sketch as DataFrame state: per group the ``k``
    smallest DISTINCT normalized portable hashes of ``key_col`` —
    ``(*group_cols, hs array<double> sorted asc)``.

    The KMV/bottom-k sketch is the other classic mergeable distinct
    estimator (Bar-Yossef et al. 2002): D ≈ (k−1)/h_k.  Where HLL
    wins on size, KMV wins on composability — bottom-k unions give
    set-operation estimates (intersection via inclusion–exclusion on
    the merged sketch), and the retained hashes double as a uniform
    sample of the key space (quantile estimation over any attached
    value).  Deterministic by construction (content-addressed md5
    hash, no RNG), so the whole sketch — construction, merge,
    estimate — replays exactly in the DuckDB oracle.

    Plan: distinct (group, hash) rows via hash aggregate, bounded
    bottom-k per group with the map-side partial top-k kernel (at
    most k rows per group per partition reach the exchange), final
    per-group sorted array.
    """
    if k < 2:
        raise ValueError("kmv_registers: need k >= 2")
    group_cols = group_cols or []
    h = (
        _portable_hash(
            F.concat(F.lit("kmv:"), F.col(key_col).cast("string"))
        ).cast("double")
        / F.lit(float(1 << 60))
    )
    distinct = (
        df.select(*group_cols, h.alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .select(*group_cols, "h")
    )
    if group_cols:
        from moz_datapipeline_spark.operators.similarity import (
            _partition_topk,
        )

        pruned = _partition_topk(
            distinct, list(group_cols), "h", "h", k, ascending=True
        )
    else:
        pruned = distinct.withColumn("_g", F.lit(1))
        from moz_datapipeline_spark.operators.similarity import (
            _partition_topk,
        )

        pruned = _partition_topk(
            pruned, ["_g"], "h", "h", k, ascending=True
        ).drop("_g")
    return (
        pruned.groupBy(*group_cols)
        .agg(
            F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("hs")
        )
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None, k: int = 256
) -> DataFrame:
    """Merge two KMV sketches built with the same hash family: union
    the retained hashes, dedup, keep the k smallest.  Associative,
    commutative, idempotent — same lattice-join contract as
    ``hll_merge``."""
    group_cols = group_cols or []
    both = a.unionByName(b)
    return (
        both.select(*group_cols, F.explode("hs").alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("hs"))
    )


def kmv_distinct(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Distinct-count estimate from KMV state: ``(*group_cols,
    n_retained, est_distinct)``.  Exact (= n_retained) while the
    sketch holds fewer than k hashes; (k−1)/h_k once full."""
    group_cols = group_cols or []
    n = F.size("hs")
    hk = F.element_at("hs", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / hk
    )
    return registers.select(
        *group_cols,
        n.alias("n_retained"),
        F.round(est, 3).alias("est_distinct"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Set-operation estimates from two KMV sketches (theta-sketch
    style): ``(*group_cols, est_a, est_b, est_union, est_intersection,
    jaccard, containment_a, containment_b)``.

    This is the reason KMV exists alongside HLL: HLL only unions,
    KMV's retained hashes are a UNIFORM SAMPLE of the merged key
    space, so intersections (corpus overlap, "how much of snapshot A
    survived into B", decontamination estimates) come from the same
    state with no second pass over data.

    Estimator: merge the two hash lists, take ``theta`` = the k-th
    smallest (1.0 when underfull — then everything is exact); the
    sample S is every merged hash < theta.  ``jaccard`` = fraction of
    S present in BOTH sketches, ``est_intersection = jaccard ·
    est_union``, containments divide by the per-side estimates.
    Pure array expressions over two ≤ k-element lists per group —
    driver-free, broadcast-join-sized, replays exactly in the DuckDB
    oracle (content-addressed hashes, no RNG).

    Groups present in only one input are dropped (inner join): an
    absent sketch is "no data", not an empty set.
    """
    group_cols = group_cols or []
    if k < 2:
        raise ValueError("kmv_set_ops: need k >= 2")
    aa = a.select(*group_cols, F.col("hs").alias("_ha"))
    bb = b.select(*group_cols, F.col("hs").alias("_hb"))
    if group_cols:
        j = aa.join(bb, list(group_cols))
    else:
        j = aa.crossJoin(bb)

    merged = F.array_sort(
        F.array_distinct(F.concat(F.col("_ha"), F.col("_hb")))
    )
    j = j.withColumn("_m", merged)
    full = F.size("_m") >= k
    theta = F.when(full, F.element_at("_m", k)).otherwise(F.lit(1.0))
    j = j.withColumn("_theta", theta)
    sample = F.when(
        full, F.slice("_m", 1, k - 1)
    ).otherwise(F.col("_m"))
    j = j.withColumn("_s", sample)
    inter_ab = F.array_intersect("_ha", "_hb")
    ni = F.size(F.array_intersect("_s", inter_ab))
    ns = F.size("_s")
    est_union = F.when(full, F.lit(float(k - 1)) / F.col("_theta")).otherwise(
        ns.cast("double")
    )

    def _side_est(col: str):
        n = F.size(col)
        return F.when(n < k, n.cast("double")).otherwise(
            F.lit(float(k - 1)) / F.element_at(col, k)
        )

    jac = F.when(ns > 0, ni.cast("double") / ns.cast("double")).otherwise(
        F.lit(0.0)
    )
    j = (
        j.withColumn("_ea", _side_est("_ha"))
        .withColumn("_eb", _side_est("_hb"))
        .withColumn("_eu", est_union)
        .withColumn("_jac", jac)
        .withColumn("_ei", F.col("_jac") * F.col("_eu"))
    )
    return j.select(
        *group_cols,
        F.round("_ea", 3).alias("est_a"),
        F.round("_eb", 3).alias("est_b"),
        F.round("_eu", 3).alias("est_union"),
        F.round("_ei", 3).alias("est_intersection"),
        F.round("_jac", 6).alias("jaccard"),
        F.round(
            F.when(F.col("_ea") > 0, F.col("_ei") / F.col("_ea")), 6
        ).alias("containment_a"),
        F.round(
            F.when(F.col("_eb") > 0, F.col("_ei") / F.col("_eb")), 6
        ).alias("containment_b"),
    )
