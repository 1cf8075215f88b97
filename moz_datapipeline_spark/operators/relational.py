"""Relational-algebra completeness operators.

The reference pipeline composes joins, aggregations, and anti-joins
(SURVEY §2 J/A families); the one classical operator that composition
never spells out is DIVISION — "keys related to ALL values of a
divisor set" (suppliers stocking every part in a kit, customers active
in every channel).  SQL has no DIVIDE keyword; the canonical encoding
is a double NOT EXISTS, which Catalyst turns into two anti-joins and
re-scans the dividend.  The count-matching form below is the
shuffle-minimal equivalent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def relational_division(
    dividend: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    divisor: DataFrame,
) -> DataFrame:
    """Keys of ``dividend`` related to EVERY row of ``divisor``:
    classic relational division, returned as the distinct ``key_cols``
    rows that cover the full divisor set.

    ``divisor`` must expose exactly ``value_cols`` (extra columns are
    projected away; rows are deduped, so multiplicity never matters).
    An EMPTY divisor returns every distinct key — the universal
    quantifier over an empty set is vacuously true, matching the
    double-NOT-EXISTS SQL encoding.

    Plan (count-matching, 2 shuffles + 1 broadcast):

    1. dedupe (key, value) pairs and semi-join them to the deduped
       divisor — off-divisor values exit BEFORE any per-key state;
    2. per-key hash-aggregate counts covered divisor values (map-side
       partials);
    3. compare against the divisor's 1-row distinct count, broadcast
       via cross join — no driver action, no window, no double
       anti-join re-scan of the dividend.

    Skew note: step 1's distinct shuffles on (key, value) — hot keys
    spread across their value spectrum, so the usual hot-key collapse
    onto one partition doesn't occur; step 2 receives at most
    |divisor| rows per key.
    """
    keys = list(key_cols)
    vals = list(value_cols)
    if not keys or not vals:
        raise ValueError(
            "relational_division: key_cols and value_cols must be "
            "non-empty"
        )
    div = divisor.select(*vals).distinct()
    need = div.agg(F.count(F.lit(1)).alias("_need"))
    covered = (
        dividend.select(*keys, *vals)
        .distinct()
        .join(div, vals, "left_semi")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_got"))
    )
    all_keys = dividend.select(*keys).distinct()
    matched = (
        covered.crossJoin(F.broadcast(need))
        .filter(F.col("_got") == F.col("_need"))
        .select(*keys)
    )
    # empty divisor: _need = 0 but no (key, value) survives the semi
    # join either, so `matched` is empty — union the vacuous-truth set
    # explicitly (keys with zero required values are all keys)
    vacuous = all_keys.crossJoin(F.broadcast(need)).filter(
        F.col("_need") == 0
    ).select(*keys)
    return matched.unionByName(vacuous)


def compaction_plan(
    files: DataFrame,
    path_col: str = "path",
    bytes_col: str = "bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction planner for lake maintenance: assign
    every input file to an output bin of ~``target_bytes`` — rows
    ``(path, bytes, bin, bin_bytes, n_files_in_bin)``.  The
    100 TB-lake hygiene op: a table written by 10k streaming
    micro-batches reads 100× slower than the same bytes in
    right-sized files; this emits the rewrite plan (group by ``bin``,
    coalesce, write).

    Packing is CUMULATIVE-QUOTIENT: files in deterministic
    (bytes DESC, path) order, ``bin = floor(running_bytes_before /
    target)`` — a one-window approximation of first-fit-decreasing
    whose bins overshoot by at most one file (exactly one file can
    straddle each boundary; oversized files get a bin of their own).
    Deterministic, engine-replayable, and — unlike true FFD — free of
    sequential state, so it stays a single range-partitioned scan.
    Files with NULL/negative size are rejected loudly.

    Plan: the listing is metadata-sized (one row per FILE, not per
    data row), so the global order is one range exchange +
    partition-local cumsums with broadcast bases (the two-phase
    scheme) — never a single-task window over a billion-file listing.
    """
    if target_bytes < 1:
        raise ValueError("compaction_plan: target_bytes must be >= 1")
    base = files.select(
        F.col(path_col).cast("string").alias("path"),
        F.col(bytes_col).cast("long").alias("bytes"),
    )
    bad = base.filter(
        F.col("bytes").isNull() | (F.col("bytes") < 0)
        | F.col("path").isNull()
    ).limit(1).count()
    if bad:
        raise ValueError(
            "compaction_plan: NULL path or NULL/negative size in the "
            "listing"
        )
    ranged = base.repartitionByRange(
        F.col("bytes").desc(), F.col("path").asc()
    ).withColumn("_pid", F.spark_partition_id())
    lw = (
        Window.partitionBy("_pid")
        .orderBy(F.col("bytes").desc(), F.col("path").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_lt", F.sum("bytes").over(lw))
    pw = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = (
        local.groupBy("_pid")
        .agg(F.sum("bytes").alias("_tt"))
        .withColumn("_bt", F.coalesce(F.sum("_tt").over(pw), F.lit(0)))
        .select("_pid", "_bt")
    )
    before = F.col("_bt") + F.col("_lt") - F.col("bytes")
    binned = local.join(F.broadcast(bases), "_pid").select(
        "path",
        "bytes",
        F.floor(before / F.lit(int(target_bytes)))
        .cast("long")
        .alias("bin"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("bytes").alias("bin_bytes"),
        F.count(F.lit(1)).cast("long").alias("n_files_in_bin"),
    )
    # no broadcast hint: |bins| grows with the listing (total/target)
    # — both sides are listing-sized, so let AQE pick the strategy
    return binned.join(per_bin, "bin").select(
        "path", "bytes", "bin", "bin_bytes", "n_files_in_bin"
    )


def frequent_itemsets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_size: int = 3,
    max_triple_candidates: int = 5_000_000,
) -> DataFrame:
    """Apriori frequent itemsets up to size 3: rows ``(itemset, size,
    support)`` with ``itemset`` the '|'-joined items in ascending
    order — the market-basket generalization of ``copurchase_lift``
    (which stops at pairs): "which item TRIPLES co-occur often enough
    to act on?".  ``min_support`` is an absolute basket count.

    Classic Apriori pruning, all relational:

    1. L1: one (item) hash aggregate, filter ≥ min_support;
    2. L2: basket self-join restricted to L1 items with ``a < b``
       (each pair once), aggregate, filter — the L1 semi-join is a
       broadcast (frequent items are few BY CONSTRUCTION: at most
       Σbaskets/min_support);
    3. L3: candidate triples from L2⨝L2 on the shared first item
       (``(a,b) ⋈ (a,c), b < c``) with DOWNWARD CLOSURE enforced
       ((b,c) must also be in L2) BEFORE any basket scan — the
       candidate set, not the data, bounds the final count join.

    Duplicate (basket, item) rows collapse first (set semantics).
    Items containing the '|' separator are rejected loudly rather
    than silently merging itemsets.

    DENSE-PAIR HAZARD: when most pairs are frequent (tiny catalog or
    low min_support), closure barely prunes and the triple count
    join multiplies |candidates| × per-item basket lists — the
    classic Apriori blow-up.  The candidate count is checked BEFORE
    that join and raises past ``max_triple_candidates`` (raise
    min_support, not the cap).
    """
    if min_support < 1:
        raise ValueError("frequent_itemsets: min_support must be >= 1")
    if not (1 <= max_size <= 3):
        raise ValueError("frequent_itemsets: max_size must be 1..3")
    base = (
        df.select(
            F.col(basket_col).cast("string").alias("_b"),
            F.col(item_col).cast("string").alias("_i"),
        )
        .filter(F.col("_b").isNotNull() & F.col("_i").isNotNull())
        .distinct()
    )
    bad = base.filter(F.col("_i").contains("|")).limit(1).count()
    if bad:
        raise ValueError(
            "frequent_itemsets: item values must not contain '|'"
        )
    l1 = (
        base.groupBy("_i")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    out = l1.select(
        F.col("_i").alias("itemset"),
        F.lit(1).alias("size"),
        "support",
    )
    if max_size == 1:
        return out
    kept = base.join(
        F.broadcast(l1.select("_i")), "_i"
    )  # only frequent items can appear in larger sets
    a = kept.select(F.col("_b"), F.col("_i").alias("_a"))
    b = kept.select(F.col("_b"), F.col("_i").alias("_c"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("_a") < F.col("_c"))
        .groupBy("_a", "_c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    out = out.unionByName(
        pairs.select(
            F.concat_ws("|", "_a", "_c").alias("itemset"),
            F.lit(2).alias("size"),
            "support",
        )
    )
    if max_size == 2:
        return out
    # candidate triples with downward closure, then ONE count join.
    # The full plan references the `pairs` subtree four times (size-2
    # branch + two closure probes + the candidate count); exchange
    # reuse would dedupe those, but AQE's stage-level re-planning
    # defeats it in this shape (measured: 22 s vs 8 s at sf0.1).  So:
    # persist `pairs`, materialize the result via checkpoint_sever,
    # and unpersist before returning — the returned frame reads its
    # own severed blocks and pins no cache (the `connected_components`
    # convention; blocks are reclaimed when the result is dropped).
    pairs = pairs.persist()
    p1 = pairs.select(
        F.col("_a").alias("x"), F.col("_c").alias("y")
    )
    cand = (
        p1.alias("ab")
        .join(p1.alias("ac"), F.col("ab.x") == F.col("ac.x"))
        .filter(F.col("ab.y") < F.col("ac.y"))
        .select(
            F.col("ab.x").alias("_t1"),
            F.col("ab.y").alias("_t2"),
            F.col("ac.y").alias("_t3"),
        )
        .join(
            p1.select(
                F.col("x").alias("_t2"), F.col("y").alias("_t3")
            ),
            ["_t2", "_t3"],
        )
    )
    n_cand = cand.count()
    if n_cand > max_triple_candidates:
        pairs.unpersist()
        raise ValueError(
            f"frequent_itemsets: {n_cand} triple candidates exceed "
            f"max_triple_candidates={max_triple_candidates} — the "
            "pair level is too dense; raise min_support"
        )
    c = kept.select(F.col("_b"), F.col("_i").alias("_e"))
    triples = (
        cand.join(
            a.select("_b", F.col("_a").alias("_t1")), "_t1"
        )
        .join(
            b.select("_b", F.col("_c").alias("_t2")), ["_b", "_t2"]
        )
        .join(c.select("_b", F.col("_e").alias("_t3")), ["_b", "_t3"])
        .groupBy("_t1", "_t2", "_t3")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    from ..iterate import checkpoint_sever

    res = checkpoint_sever(
        out.unionByName(
            triples.select(
                F.concat_ws("|", "_t1", "_t2", "_t3").alias("itemset"),
                F.lit(3).alias("size"),
                "support",
            )
        )
    )
    pairs.unpersist()
    return res
