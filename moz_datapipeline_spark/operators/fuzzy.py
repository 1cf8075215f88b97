"""Fuzzy (edit-distance) join for entity resolution.

Joining two tables on ALMOST-equal strings (vendor names, addresses,
product titles) is the classic record-linkage problem; the naive form
is an |L|·|R| cross join with a distance predicate — a scale killer.
This operator uses the engine's standard candidate-generation → verify
shape: strings sharing at least one character n-gram meet in an equi
join (near matches at edit distance d share plenty of n-grams — an
edit destroys at most ``gram`` of them), ultra-common n-grams are
dropped under a df cap (a stop-gram like ``'the'`` would otherwise
create a quadratic bucket — same hot-bucket treatment as
``prefix_bucket_candidates``), and survivors verify with the built-in
JVM ``levenshtein`` plus a length-difference pre-filter.

Guaranteed recall bound: a string of length ℓ has ℓ−gram+1 grams and
one edit removes ≤ gram of them, so any pair within ``max_distance``
edits still shares a gram whenever
``min(ℓₗ, ℓᵣ) ≥ gram·(max_distance+1) + gram − 1`` — shorter strings
fall back to a whole-string bucket, so exact short matches are never
lost (near-miss SHORT strings are the documented recall cut; at
``gram=3, d=2`` that means strings under 11 chars).

Everything is JVM column expressions (no UDF); the one heavy exchange
is the gram equi join, bounded by the df cap.

Reference parity: extension operator; public algorithm family:
q-gram filtering for string similarity joins (Gravano et al., VLDB
2001).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_join"]


def _norm(c):
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
    max_distance: int = 2,
    gram: int = 3,
    max_gram_df: int = 1000,
) -> DataFrame:
    """(left_id, right_id, left_val, right_val, distance) for every
    pair within ``max_distance`` edits whose strings share a surviving
    n-gram (see module docstring for the recall bound).  Matching is
    case/whitespace-insensitive; the returned values are the
    normalized forms the distance was computed on."""
    if max_distance < 0:
        raise ValueError("fuzzy_join: max_distance must be >= 0")
    if gram < 2:
        raise ValueError("fuzzy_join: gram must be >= 2")

    def explode_side(df, col, idc, alias):
        s = _norm(F.col(col))
        n = F.length(s)
        # whole-string fallback bucket below the recall bound's length
        grams = F.when(
            n >= gram,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), n - gram + 1),
                    lambda i: s.substr(i, F.lit(gram)),
                )
            ),
        ).otherwise(F.array(s))
        return df.select(
            F.col(idc).alias(f"{alias}_id"),
            s.alias(f"{alias}_val"),
            F.explode(grams).alias("_g"),
        )

    lg = explode_side(left, left_col, left_id, "left")
    rg = explode_side(right, right_col, right_id, "right")
    # df cap on the union of both sides: one aggregation, broadcast of
    # the (small by construction) stop-gram list
    df_counts = (
        lg.select("_g").unionByName(rg.select("_g"))
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_gram_df)
        .select("_g")
    )
    lg = lg.join(F.broadcast(df_counts), "_g", "left_anti")
    rg = rg.join(F.broadcast(df_counts), "_g", "left_anti")
    pairs = (
        lg.join(rg, "_g")
        .filter(
            F.abs(F.length("left_val") - F.length("right_val"))
            <= max_distance
        )
        .select("left_id", "right_id", "left_val", "right_val")
        .distinct()
    )
    return pairs.withColumn(
        "distance", F.levenshtein("left_val", "right_val")
    ).filter(F.col("distance") <= max_distance)
