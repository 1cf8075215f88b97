"""Probabilistic record linkage (Fellegi–Sunter).

Entity resolution across datasets WITHOUT a shared key: block
candidate pairs cheaply (the dedup family's LSH/prefix buckets work
unchanged), compare fields, and score each pair with the classic
log-likelihood-ratio weights — ``log2(m/u)`` when a field agrees,
``log2((1−m)/(1−u))`` when it disagrees — where ``m = P(agree |
match)`` and ``u = P(agree | non-match)``.  Decisions follow the
two-threshold rule from Fellegi & Sunter (1969): link above the
upper, reject below the lower, clerical review between.

Complements the dedup operators: MinHash/SimHash find NEAR-IDENTICAL
text; this fuses STRUCTURED records (name + address + phone + dob)
where each field is noisy in its own way.

Scale: scoring is a pure projection over the blocked pair set (no
shuffle beyond what blocking already did); m/u estimation is ONE
conditional aggregate over labeled pairs.  No EM here — supply m/u
from ``estimate_m_u`` on a labeled sample or from domain priors
(documented; EM-fitted weights drift silently, a labeled estimate is
auditable).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from moz_datapipeline_spark.localresult import literal_frame


def _validate_m_u(field_weights: dict[str, tuple[float, float]]) -> None:
    if not field_weights:
        raise ValueError(
            "record_linkage_score: field_weights must name >= 1 field"
        )
    for f, (m, u) in field_weights.items():
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(
                f"record_linkage_score: field {f!r} needs m, u in "
                f"(0, 1), got m={m}, u={u} (clamp estimated "
                "probabilities away from 0/1 first)"
            )
        if m <= u:
            raise ValueError(
                f"record_linkage_score: field {f!r} has m <= u "
                f"(m={m}, u={u}) — agreement would count AGAINST a "
                "match; drop the field or fix the estimates"
            )


def record_linkage_score(
    pairs: DataFrame,
    field_weights: dict[str, tuple[float, float]],
    upper: float = 3.0,
    lower: float = 0.0,
) -> DataFrame:
    """Score blocked candidate pairs: adds ``score`` (sum of per-field
    log2 likelihood ratios, rounded to 6 dp) and ``decision``
    (``'match'`` / ``'possible'`` / ``'non_match'``).

    ``pairs`` carries one BOOLEAN agreement column per field in
    ``field_weights`` (build them in the blocking join — exact,
    normalized, or fuzzy-thresholded, the caller chooses what
    "agrees" means per field).  NULL agreement = field missing on a
    side, contributes 0 (the standard treatment).  ``field_weights``
    maps field column → ``(m, u)``; both must lie strictly in (0, 1)
    with m > u, else this raises loudly.

    Pure projection — zero additional shuffles over the blocked set.
    """
    _validate_m_u(field_weights)
    if upper < lower:
        raise ValueError(
            "record_linkage_score: upper threshold < lower"
        )
    score = F.lit(0.0)
    for f, (m, u) in field_weights.items():
        agree_w = math.log2(m / u)
        disagree_w = math.log2((1.0 - m) / (1.0 - u))
        score = score + F.when(
            F.col(f).isNull(), F.lit(0.0)
        ).when(F.col(f), F.lit(agree_w)).otherwise(F.lit(disagree_w))
    score = F.round(score, 6)
    return pairs.select(
        "*",
        score.alias("score"),
        F.when(score >= F.lit(float(upper)), F.lit("match"))
        .when(score < F.lit(float(lower)), F.lit("non_match"))
        .otherwise(F.lit("possible"))
        .alias("decision"),
    )


def estimate_m_u(
    labeled_pairs: DataFrame,
    fields: list[str],
    label_col: str = "is_match",
    floor: float = 0.001,
) -> DataFrame:
    """Estimate per-field (m, u) from LABELED pairs: one conditional
    aggregate — rows ``(field, m, u, n_match, n_non_match)`` with
    ``m = P(field agrees | is_match)``, ``u = P(agrees | not)``.
    NULL agreements are excluded from that field's denominator
    (missing ≠ disagree).  Estimates clamp to ``[floor, 1 − floor]``
    so downstream log-weights stay finite (rounded to 6 dp).  Raises
    if either class is empty — you cannot estimate conditional rates
    without both.
    """
    if not fields:
        raise ValueError("estimate_m_u: fields must be non-empty")
    lbl = F.col(label_col)
    aggs = []
    for f in fields:
        for is_m, tag in ((True, "m"), (False, "u")):
            cond = lbl if is_m else ~lbl
            aggs.append(
                F.sum(
                    F.when(cond & F.col(f).isNotNull(), 1).otherwise(0)
                ).alias(f"_n_{tag}_{f}")
            )
            aggs.append(
                F.sum(
                    F.when(cond & F.col(f), 1).otherwise(0)
                ).alias(f"_a_{tag}_{f}")
            )
    aggs.append(F.sum(F.when(lbl, 1).otherwise(0)).alias("_nm"))
    aggs.append(F.sum(F.when(~lbl, 1).otherwise(0)).alias("_nn"))
    row = labeled_pairs.agg(*aggs).collect()[0]
    if not row["_nm"] or not row["_nn"]:
        raise ValueError(
            "estimate_m_u: need labeled pairs of BOTH classes "
            f"(match={row['_nm']}, non_match={row['_nn']})"
        )

    def clamp(x: float) -> float:
        return round(min(max(x, floor), 1.0 - floor), 6)

    out = []
    for f in fields:
        m = clamp(
            (row[f"_a_m_{f}"] or 0) / row[f"_n_m_{f}"]
            if row[f"_n_m_{f}"]
            else floor
        )
        u = clamp(
            (row[f"_a_u_{f}"] or 0) / row[f"_n_u_{f}"]
            if row[f"_n_u_{f}"]
            else floor
        )
        out.append((f, m, u, int(row["_nm"]), int(row["_nn"])))
    return literal_frame(labeled_pairs.sparkSession, 
        out,
        "field string, m double, u double, "
        "n_match long, n_non_match long",
    )
