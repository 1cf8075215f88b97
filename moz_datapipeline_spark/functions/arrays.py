"""Array higher-order-function helpers.

- ``trapezoid_ead`` — expected-annual-damage / expected-annual-user-loss
  integration over flood return periods:
  ``EAD = ½·Σᵢ (1/Tᵢ − 1/Tᵢ₊₁)(Dᵢ + Dᵢ₊₁)``
  (scripts/vulnerability/vulnerability.js:140-146,
  script-eaul/eaul.js:644-656). Implemented with the built-in
  ``aggregate`` HOF over aligned arrays — stays JVM-side, no shuffle
  beyond what produced the arrays.
- ``map_to_array`` — project a map column to a fixed-order array
  (scripts/additional-props/additional-props.js:83-87).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's fixed flood return periods (years), ascending.
RETURN_PERIODS: tuple[int, ...] = (5, 10, 20, 50, 75, 100, 200, 250, 500, 1000)


def trapezoid_ead(
    damages: Column | str, periods: Sequence[int] = RETURN_PERIODS
) -> Column:
    """Trapezoidal integral of damage over exceedance probability.

    ``damages`` is an ArrayType(Double) aligned to ``periods`` (ascending
    return period = descending exceedance probability ``1/T``).
    """
    d = F.col(damages) if isinstance(damages, str) else damages
    n = len(periods)
    terms = [
        (1.0 / periods[i] - 1.0 / periods[i + 1]) * 0.5 for i in range(n - 1)
    ]
    expr = None
    for i, w in enumerate(terms):
        t = F.lit(w) * (d.getItem(i) + d.getItem(i + 1))
        expr = t if expr is None else expr + t
    return expr


def map_to_array(m: Column | str, keys: Sequence[str]) -> Column:
    """Project map ``m`` to an array ordered by ``keys`` (missing → null)."""
    c = F.col(m) if isinstance(m, str) else m
    return F.array(*[c.getItem(k) for k in keys])
