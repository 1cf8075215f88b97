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

from pyspark.sql import DataFrame
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
