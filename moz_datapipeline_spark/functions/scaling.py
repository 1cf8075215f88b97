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
