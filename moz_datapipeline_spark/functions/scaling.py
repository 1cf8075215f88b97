"""Numeric scaling helpers.

- ``linear_rescale`` — scripts/additional-props/additional-props.js:89-91
  (``RUC = 5.7762*RUC − 0.0334``)
- ``round_half_up``  — scripts/utils/utils.js:100-102 (JS ``Math.round``
  semantics; Spark ``round`` is HALF_UP which matches for positives)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def linear_rescale(col: Column | str, slope: float, intercept: float) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c * F.lit(slope) + F.lit(intercept)


def round_half_up(col: Column | str, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale)


def quantile_normalize(
    df,
    column: str,
    reference=None,
    q: int = 100,
    out_col: str | None = None,
):
    """Map each value to its position on a REFERENCE distribution's
    CDF: ``0.0`` at/below the reference minimum, ``1.0`` at/above its
    maximum, linear interpolation between the reference's ``q+1``
    exact percentile boundaries elsewhere.  The standard harmonizer
    when scores from different model versions / corpus snapshots must
    be comparable (``reference=None`` normalizes against the frame
    itself — a smooth exact-CDF transform).

    Plan: the boundary array comes from ``ranges.exact_quantiles`` —
    the DISTRIBUTED exact multi-quantile (histogram + candidate
    collect, bit-identical to the ``percentile`` builtin but never its
    single-task buffer sort; measured 4.3 s → ~0.6 s on 600k reference
    rows), materialized at plan-construction time and inlined as a
    LITERAL array, so the mapping is a pure JVM array-HOF projection
    (O(log q) bisection for count-of-boundaries-≤-x + interpolate) —
    no join at all, no window, no Python on the data path.  If the
    reference's value skew trips the candidate cap, the plan falls
    back to the builtin aggregate + broadcast join (loud trade in
    ``exact_quantiles``' contract, identical results).  Runs of EQUAL
    boundaries (heavily-tied data) resolve to the run's right edge
    (fraction 1), keeping the map monotone.  Scale note: same trade as
    ``equi_depth_histogram`` — swap in ``approx_percentile`` past ~1e8
    reference rows.
    """
    from pyspark.sql import DataFrame  # noqa: F401

    from moz_datapipeline_spark.operators.ranges import exact_quantiles

    if q < 1:
        raise ValueError("quantile_normalize: need q >= 1")
    out_col = out_col or f"{column}_qnorm"
    ref = reference if reference is not None else df
    vals = exact_quantiles(ref, column, [i / q for i in range(q + 1)])
    if vals is not None:
        bounds = None
        qb_lit = F.array(*[F.lit(float(v)) for v in vals])
    else:
        # empty reference (NULL boundaries → NULL output, unchanged
        # semantics) or a candidate-cap trip: the builtin still works
        probs = ", ".join(repr(i / q) for i in range(q + 1))
        bounds = ref.agg(
            F.expr(f"percentile({column}, array({probs}))").alias("_qb")
        )
        qb_lit = None
    import math

    x = F.col(column).cast("double")
    b = F.col("_qb")
    # boundary lookup is a BISECTION, not a linear array-filter: the
    # boundaries are sorted, so count-of-boundaries-≤-x is bisect_right
    # — ceil(log2(q+2)) fixed iterations of an aggregate() fold over a
    # constant sequence (7 comparisons at q=100 vs 101), identical
    # result including ties (rightmost index of a run) and NaN
    # (sorts above every double → count q+1 → position 1.0)
    n_b = q + 1
    bis_steps = max(1, math.ceil(math.log2(n_b + 1)))
    bisect = (
        f"aggregate(sequence(1, {bis_steps}), "
        f"named_struct('lo', 0, 'hi', {n_b}), "
        "(acc, i) -> IF(acc.lo >= acc.hi, acc, "
        "IF(element_at(_qb, CAST((acc.lo + acc.hi + 1) / 2 AS INT)) <= _qx, "
        "named_struct('lo', CAST((acc.lo + acc.hi + 1) / 2 AS INT), "
        "'hi', acc.hi), "
        "named_struct('lo', acc.lo, "
        "'hi', CAST((acc.lo + acc.hi + 1) / 2 AS INT) - 1))), "
        "acc -> acc.lo)"
    )
    # STAGED projections, not one expression tree: the boundary count
    # and the element_at lookups each appear once as a non-cheap
    # multi-use alias, which CollapseProject refuses to inline — in a
    # single tree the lookup is re-evaluated per USE (ANSI's lazy CASE
    # also blocks codegen subexpression elimination), which measured
    # ~2.5x slower end to end
    staged = (
        df.withColumn("_qb", qb_lit)
        if bounds is None
        else df.join(F.broadcast(bounds))
    )
    step = (
        staged.withColumn("_qx", x)
        .withColumn(
            "_qi",
            F.when(
                b.isNotNull() & F.col("_qx").isNotNull(), F.expr(bisect)
            ),
        )
        .withColumn(
            "_qlo",
            F.when(
                (F.col("_qi") >= 1) & (F.col("_qi") <= q),
                F.element_at(b, F.col("_qi")),
            ),
        )
        .withColumn(
            "_qhi",
            F.when(
                (F.col("_qi") >= 1) & (F.col("_qi") <= q),
                F.element_at(b, F.col("_qi") + 1),
            ),
        )
    )
    frac = F.when(F.col("_qhi") == F.col("_qlo"), F.lit(1.0)).otherwise(
        (x - F.col("_qlo")) / (F.col("_qhi") - F.col("_qlo"))
    )
    pos = (
        F.when(x.isNull(), F.lit(None).cast("double"))
        .when(F.col("_qi") == 0, F.lit(0.0))
        .when(F.col("_qi") >= q + 1, F.lit(1.0))
        .otherwise(((F.col("_qi") - 1) + frac) / q)
    )
    return step.withColumn(out_col, pos).drop(
        "_qb", "_qx", "_qi", "_qlo", "_qhi"
    )


def standardize_embeddings(
    df,
    vec_col: str = "embedding",
    out_col: str = "standardized",
):
    """Per-DIMENSION z-score normalization of an embedding column:
    ``out[j] = (v[j] − mean_j) / std_j`` (sample std; a zero-variance
    dimension maps to 0.0) — feature standardization before cosine/
    L2 retrieval or clustering, so no dimension dominates by scale.
    Elements round to 6 dp (the oracle-hash convention).

    Plan: ONE ``posexplode`` pass feeds a per-dimension hash aggregate
    — map-side combine folds each partition to ≤ dim partial rows, so
    the exchange carries |dims|·|partitions| rows no matter the corpus
    size; the dim-length mean/std ARRAYS assemble in a 1-row reduce
    and broadcast back; the projection is a pure JVM ``zip_with``
    chain (no join on data, no second shuffle, no re-assembly
    ``collect_list`` over N·dim rows — the naive shape that shuffles
    the whole corpus twice).
    """
    from pyspark.sql import DataFrame  # noqa: F401

    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.filter(F.col(vec_col).isNotNull())
    flat = base.select(
        F.posexplode(vec).alias("_pos", "_val")
    )
    stats = flat.groupBy("_pos").agg(
        F.avg("_val").alias("_m"),
        F.stddev_samp("_val").alias("_s"),
    )
    srow = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
            lambda s: s["_m"],
        ).alias("_means"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_s"))),
            lambda s: s["_s"],
        ).alias("_stds"),
    )
    centered = F.zip_with(vec, F.col("_means"), lambda v, m: v - m)
    z = F.zip_with(
        centered,
        F.col("_stds"),
        lambda d, s: F.when(
            s.isNotNull() & (s > 0), F.round(d / s, 6)
        ).otherwise(F.lit(0.0)),
    )
    return (
        base.crossJoin(F.broadcast(srow))
        .withColumn(out_col, z)
        .drop("_means", "_stds")
    )
